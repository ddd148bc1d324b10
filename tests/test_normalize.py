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
    # invalid utf-8 -> U+FFFD, never raises (run.py:207-212 analogue)
    assert "�" in decode_html(b"\xff\xfe<p>x</p>")
    # size cap truncates (X7)
    big = b"a" * 100
    assert decode_html(big, max_bytes=10) == "a" * 10
    # bytearray accepted
    assert decode_html(bytearray(b"abc")) == "abc"
