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
