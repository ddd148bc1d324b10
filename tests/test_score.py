"""Unit tests of the block classifier (extraction/score.py)."""

from __future__ import annotations

from manga_ocr_spark.extraction.dom import parse_blocks
from manga_ocr_spark.extraction.score import MAX_LINK_DENSITY, MIN_TEXT_LEN, score_blocks


def _scored(html: str):
    return score_blocks(parse_blocks(html))


def test_content_paragraph_kept() -> None:
    (b,) = _scored("<p>this is a real content paragraph with plenty of text.</p>")
    assert b.keep
    assert b.score > 0


def test_boilerplate_landmark_dropped() -> None:
    blocks = _scored("<nav><p>Home About Contact Terms and more</p></nav>")
    assert all(not b.keep for b in blocks)
    assert all(b.score <= 0 for b in blocks)


def test_link_farm_dropped() -> None:
    html = "<div><a href='/1'>all of this text is inside anchors entirely</a></div>"
    (b,) = _scored(html)
    assert b.link_density > MAX_LINK_DENSITY
    assert not b.keep


def test_low_link_density_kept() -> None:
    html = "<p>mostly prose with one <a href='/x'>link</a> inside a long sentence here.</p>"
    (b,) = _scored(html)
    assert b.link_density <= MAX_LINK_DENSITY
    assert b.keep


def test_short_crumb_dropped() -> None:
    (b,) = _scored("<p>(c) 2024</p>")
    assert b.text_len < MIN_TEXT_LEN
    assert not b.keep


def test_heading_kept_even_when_short() -> None:
    (b,) = _scored("<h1>Title</h1>")
    assert b.tag == "h1"
    assert b.keep  # headings bypass MIN_TEXT_LEN


def test_heading_with_links_dropped() -> None:
    (b,) = _scored("<h2><a href='/'>Site</a></h2>")
    assert not b.keep


def test_whitespace_only_yields_no_blocks() -> None:
    assert _scored("<p>   　  </p>") == []


def test_empty_after_normalization_dropped() -> None:
    # defensive path: a block whose text normalizes to empty is dropped
    from manga_ocr_spark.extraction.dom import Block

    b = Block(block_id=0, tag="p", depth=1, text=" 　 ",
              text_len=1, link_text_len=0, in_boilerplate=False)
    (scored,) = score_blocks([b])
    assert scored.text_len == 0 and not scored.keep and scored.score == 0.0


def test_score_is_density_weighted_length() -> None:
    (b,) = _scored("<p>twelve chars of pure prose text for scoring basis.</p>")
    assert b.keep
    assert abs(b.score - b.text_len * (1 - b.link_density)) < 1e-9


def test_text_is_normalized_in_place() -> None:
    (b,) = _scored("<p>ＡＢＣ  spaced   out…</p>")
    assert b.text == "ABC spaced out..."
