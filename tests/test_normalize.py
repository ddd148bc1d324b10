"""Table-driven normalizer tests — same shape as the reference's
post_process table test (/root/reference/tests/test_ocr.py:44-66): each row
pins one rule or an interaction of rules, byte-exactly."""

from __future__ import annotations

import pytest

from manga_ocr_spark.extraction.normalize import (
    decode_html,
    fold_width,
    join_blocks,
    normalize_block,
)

CASES = [
    # identity
    ("plain words here.", "plain words here."),
    ("", ""),
    # rule 3: unicode whitespace collapse + strip
    ("  a \t b c \n d  ", "a b c d"),
    ("　full　width　", "full width"),
    # rule 2: full-width ASCII fold (U+FF01..FF5E -> ASCII)
    ("ＡＢＣ ｄｅｆ １２３！", "ABC def 123!"),
    ("ｈｅｌｌｏ，ｗｏｒｌｄ", "hello,world"),
    # rule 4: dot-run canonicalization, then U+2026
    ("wait.. what", "wait... what"),
    ("so・・many・・・dots", "so...many...dots"),
    ("ellipsis… here", "ellipsis... here"),
    # ordering interaction: … expands to ... first, then the run collapses
    ("mix.…end", "mix...end"),
    # rule 1: NFC composition (e + combining acute -> é)
    ("café", "café"),
    # combined: full-width dots fold to ASCII '.' then run-collapse
    ("．．．", "..."),
    # single dot untouched
    ("one. two", "one. two"),
    # CJK passthrough
    ("この文章は残る", "この文章は残る"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_block(raw: str, expected: str) -> None:
    assert normalize_block(raw) == expected


def test_normalize_idempotent() -> None:
    for raw, _ in CASES:
        once = normalize_block(raw)
        assert normalize_block(once) == once


def test_fold_width_table_is_exact() -> None:
    assert fold_width("！") == "!"
    assert fold_width("～") == "~"
    assert fold_width("　") == " "
    # half-width input untouched
    assert fold_width("plain") == "plain"


def test_join_blocks_drops_empties() -> None:
    assert join_blocks(["a", "", "b"]) == "a\nb"
    assert join_blocks([]) == ""
    assert join_blocks(["", ""]) == ""


def test_decode_html_tolerance() -> None:
    assert decode_html(None) == ""
    assert decode_html(b"") == ""
    assert decode_html(b"ok") == "ok"
    # undecodable bytes degrade per character, never raise (run.py:207-212
    # analogue): 0x81 is unmapped even in the cp1252 fallback
    assert "�" in decode_html(b"\x81\x8d<p>x</p>")
    # (b"\xff\xfe..." is now correctly read as a UTF-16-LE BOM — see
    # test_decode_html_charset_sniffing)
    # size cap truncates (X7)
    big = b"a" * 100
    assert decode_html(big, max_bytes=10) == "a" * 10
    # bytearray accepted
    assert decode_html(bytearray(b"abc")) == "abc"


def test_decode_html_charset_sniffing():
    from manga_ocr_spark.extraction.normalize import decode_html, sniff_charset

    # valid UTF-8 without declaration: byte-identical to the old behavior
    assert decode_html("héllo wörld".encode()) == "héllo wörld"
    # undeclared cp1252 bytes (the web default): no more U+FFFD mojibake
    assert decode_html(b"caf\xe9 \x93quoted\x94") == "café “quoted”"
    # declared shift_jis
    sjis = "<html><meta charset=shift_jis><p>日本語テスト</p>".encode("cp932")
    assert "日本語テスト" in decode_html(sjis)
    # WHATWG rule: latin-1 label means windows-1252
    latin = b"<meta charset='iso-8859-1'><p>a \x93b\x94 c</p>"
    assert "“b”" in decode_html(latin)
    # BOMs win over everything
    assert decode_html("bom text".encode("utf-8-sig")) == "bom text"
    assert decode_html("utf16 text".encode("utf-16-le"), 1000)[:5] != "\x00u"
    assert "utf16 text" in decode_html(b"\xff\xfe" + "utf16 text".encode("utf-16-le")[0:])
    # unknown label falls back to the utf-8 -> cp1252 chain
    assert decode_html(b"<meta charset=klingon-8>plain ascii") == "<meta charset=klingon-8>plain ascii"
    assert sniff_charset(b"<meta charset=klingon-8>") is None


def test_decode_html_truncation_mid_multibyte_keeps_utf8():
    from manga_ocr_spark.extraction.normalize import decode_html

    # the size cap can split a multibyte char; that must NOT flip the whole
    # (valid utf-8) document to cp1252
    body = ("ascii start " + "ü" * 50).encode()
    cut_at = len(body) - 1  # splits the final 2-byte ü
    out = decode_html(body, max_bytes=cut_at)
    assert out.startswith("ascii start ü")
    assert "\xfc" not in out.encode("ascii", "backslashreplace").decode()  # no cp1252 ü-run misread
    assert "Ã" not in out  # the classic utf8-as-cp1252 mojibake marker


def test_extract_end_to_end_cp1252_page():
    from manga_ocr_spark.extraction.core import extract

    page = b"<html><body><p>r\xe9sum\xe9 and \x93smart quotes\x94 here</p></body></html>"
    res = extract(page)
    assert res.text == "résumé and “smart quotes” here"


def test_decode_html_third_review_regressions():
    from manga_ocr_spark.extraction.normalize import decode_html

    # untruncated cp1252 page whose only non-ascii byte is near the end:
    # must decode via the cp1252 fallback, not be dropped as a
    # "truncation artifact"
    assert decode_html(b"hello caf\xe9") == "hello café"
    # utf-16 BOM must be CONSUMED, not leak U+FEFF into the document
    out = decode_html(b"\xff\xfe" + "ab".encode("utf-16-le"))
    assert out == "ab"
    out_be = decode_html(b"\xfe\xff" + "cd".encode("utf-16-be"))
    assert out_be == "cd"


def test_ascii_collapse_guard_exactness():
    # r5 fast path: " ".join(s.split()) must run EXACTLY when it would
    # change an ASCII string — enumerate every guard condition plus
    # already-collapsed forms the guard skips. Equivalence oracle: the
    # unguarded collapse itself.
    from manga_ocr_spark.extraction.normalize import normalize_block

    cases = [
        "", " ", "  ", "a", "a b", " a", "a ", "a  b", "a\tb", "a\nb",
        "a\rb", "a\x0bb", "a\x0cb", "\ta", "a\n", "a b c d", "a.b",
        "a .. b", "one  two\tthree \n", ". . ..", "..", "... .. .",
        "word " * 5, ("x y " * 100).strip(),
    ]
    for s in cases:
        want = " ".join(s.split())
        if ".." in want:
            import re
            want = re.sub(r"[・.]{2,}", "...", want)
        assert normalize_block(s) == want, repr(s)
        # idempotent (the repo-wide pinned property)
        assert normalize_block(normalize_block(s)) == normalize_block(s), repr(s)


def test_ascii_collapse_guard_covers_c0_separators():
    # str.split() whitespace includes \x1c-\x1f — the guard must fire
    from manga_ocr_spark.extraction.normalize import normalize_block

    for ch in ("\x1c", "\x1d", "\x1e", "\x1f"):
        assert normalize_block(ch) == ""
        assert normalize_block(f"a{ch}b") == "a b"


def test_split_ws_set_derived_from_cpython_behavior():
    # the shared whitespace set must equal EXACTLY the ASCII chars
    # CPython's str.split() treats as whitespace — derived, not assumed
    from manga_ocr_spark.extraction.normalize import SPLIT_WS_COMMON, SPLIT_WS_RARE

    actual = {c for c in map(chr, range(128)) if not c.split()}
    assert set(SPLIT_WS_COMMON) | set(SPLIT_WS_RARE) == actual
    assert not set(SPLIT_WS_COMMON) & set(SPLIT_WS_RARE)
