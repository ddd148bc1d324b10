"""End-to-end tests of the pure-Python extraction core (no Spark)."""

from __future__ import annotations

from manga_ocr_spark.extraction.core import extract
from manga_ocr_spark.fixtures.pages import generate_pages


def test_plain_article() -> None:
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<article><h1>A Real Title</h1>"
        "<p>first paragraph with enough honest content to keep around.</p>"
        "<p>second paragraph also has plenty of real words in it.</p>"
        "</article><footer>(c) 2024</footer></body></html>"
    ).encode()
    res = extract(html)
    assert res.text == (
        "A Real Title\n"
        "first paragraph with enough honest content to keep around.\n"
        "second paragraph also has plenty of real words in it."
    )
    assert res.n_blocks_kept == 3
    assert res.n_blocks_dropped >= 2  # nav + footer


def test_linkfarm_stripped() -> None:
    farm = "".join(f"<li><a href='/t/{i}'>topic {i}</a></li>" for i in range(10))
    html = (
        f"<body><aside><ul>{farm}</ul></aside>"
        "<div><p>the only genuine content paragraph on this page.</p></div>"
        f"<aside><ul>{farm}</ul></aside></body>"
    ).encode()
    res = extract(html)
    assert res.text == "the only genuine content paragraph on this page."


def test_hostile_inputs_never_raise() -> None:
    for payload in (
        None,
        b"",
        b"\x00\x01\xff\xfe",
        b"<div<><p>broken <b>page",
        ("<p>" + "x" * 50_000).encode(),
        b"<html><body></body></html>",
    ):
        res = extract(payload)  # must not raise
        assert res.n_blocks_kept >= 0


def test_size_cap_applies() -> None:
    big = (b"<p>" + b"word " * 1_000_000) * 2  # ~10 MB
    res = extract(big, max_bytes=1000)
    assert res.text is not None
    assert len(res.text) < 2000


def test_deterministic_across_calls() -> None:
    pages = generate_pages(21, seed=7)
    for r in pages.itertuples(index=False):
        a, b = extract(r.html), extract(r.html)
        assert a.text == b.text
        assert a.n_blocks_kept == b.n_blocks_kept


def test_fixture_families_behave() -> None:
    pages = generate_pages(70, seed=42)
    by_family: dict[str, list] = {}
    for r in pages.itertuples(index=False):
        by_family.setdefault(r.family, []).append(extract(r.html))
    # content families always extract something
    for fam in ("plain", "linkfarm", "multiblock", "ruby", "spans", "noise"):
        assert all(res.text for res in by_family[fam]), fam
    # linkfarm/nav/footer text never leaks into output
    for res in by_family["linkfarm"]:
        assert "Home" not in res.text
        assert "privacy" not in res.text
    # ruby annotation dropped, base kept
    for res in by_family["ruby"]:
        assert "かんじ" not in res.text
        assert "漢字" in res.text
    # noise family: entities + width-folding normalized
    for res in by_family["noise"]:
        assert "　" not in res.text
        assert "ＡＢＣ" not in res.text  # folded to ASCII
        assert "ABC" in res.text
    # hostile rows never raise; empty-body variant yields None
    assert any(res.text is None for res in by_family["hostile"])


def test_debug_blocks_side_output_matches_core(spark):
    # K6: the debug `blocks` column must carry every scored block with
    # the same features/keep decisions the core produced for that payload
    # (reference analogue: per-sample debug params dump,
    # run_generate.py:64-80).
    import datetime as dt

    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.jobs.extract import extract_pages

    html = (
        b"<html><body><nav><a href='/'>Home</a><a href='/x'>X</a></nav>"
        b"<h1>A headline here</h1>"
        b"<p>This is the main paragraph with plenty of useful content text.</p>"
        b"<p><a href='/y'>tiny</a></p></body></html>"
    )
    df = spark.createDataFrame(
        [("https://e/1", dt.datetime(2024, 1, 1), bytearray(html), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = extract_pages(df, debug_blocks=True).collect()[0]
    want = extract(html)
    assert row.extracted_text == want.text
    got = [b.asDict() for b in row.blocks]
    assert len(got) == len(want.blocks)
    for g, w in zip(got, want.blocks):
        assert g["block_id"] == w.block_id and g["tag"] == w.tag
        assert g["text"] == w.text and g["text_len"] == w.text_len
        assert g["link_text_len"] == w.link_text_len
        assert g["keep"] == w.keep and abs(g["score"] - w.score) < 1e-12
        assert abs(g["link_density"] - w.link_density) < 1e-12
        assert abs(g["text_density"] - w.text_len / max(1, len(w.text))) < 1e-12
    assert sum(1 for g in got if g["keep"]) >= row.n_blocks_kept > 0
