"""Byte-stable text normalization.

Plays the role of the reference's deterministic ``post_process``
(/root/reference/manga_ocr/ocr.py:136-156): every string leaving the engine
passes through exactly these rules, in exactly this order, so that golden
files are byte-reproducible across runs and environments. Only stdlib
(``unicodedata``, ``re``) is used — no third-party text libraries, so there
is no dependency-version drift to pin.

Rules (applied per text block, in order):

1. Unicode NFC composition.
2. Full-width ASCII fold: U+FF01..U+FF5E -> U+0021..U+007E and the
   ideographic space U+3000 -> U+0020. This is the engine's analogue of the
   reference's ``jaconv.h2z`` width canonicalization (ocr.py:155) — we fold
   *toward* ASCII because web text is Latin-dominant, and we implement it as
   an explicit table so behavior cannot drift with a library upgrade.
3. Whitespace collapse: ``" ".join(s.split())`` — any run of Unicode
   whitespace becomes one space, leading/trailing stripped. (Same operator
   family as ocr.py:152's ``"".join(text.split())``; we keep single spaces
   because web text is word-delimited.)
4. Ellipsis canonicalization: U+2026 HORIZONTAL ELLIPSIS becomes "...",
   then runs of 2+ of [. or katakana middle dot] become "..." (same two
   rules as ocr.py:153-154 but expand-then-collapse order, which makes the
   whole normalizer idempotent — ".…" -> "...." -> "..." in ONE pass, so
   re-normalizing any output is a no-op; idempotence is part of the
   byte-stability contract and is pinned by tests).

Blocks are joined with a single "\n" (decided semantics, SURVEY.md §7.4).
"""

from __future__ import annotations

import re
import unicodedata

# U+FF01..U+FF5E are the full-width forms of U+0021..U+007E (offset 0xFEE0).
_WIDTH_FOLD = {cp: cp - 0xFEE0 for cp in range(0xFF01, 0xFF5F)}
_WIDTH_FOLD[0x3000] = 0x20  # IDEOGRAPHIC SPACE -> SPACE

# 2+ run of ASCII period / KATAKANA MIDDLE DOT (U+30FB), cf. ocr.py:153.
_DOT_RUN = re.compile("[・.]{2,}")


def fold_width(s: str) -> str:
    """Fold full-width ASCII forms to their half-width equivalents."""
    return s.translate(_WIDTH_FOLD)


def normalize_block(s: str) -> str:
    """Normalize one text block; deterministic and idempotent."""
    if s.isascii():
        # byte-identical fast path: NFC, width-fold, and the U+2026/U+30FB
        # rules are all identity on pure-ASCII text (CPython's compact str
        # caches the ascii flag, so the check is O(1)); only the whitespace
        # collapse and the ASCII dot-run rule can change anything
        s = " ".join(s.split())
        if ".." in s:
            s = _DOT_RUN.sub("...", s)
        return s
    s = unicodedata.normalize("NFC", s)
    s = fold_width(s)
    s = " ".join(s.split())
    if "…" in s:
        s = s.replace("…", "...")
    if ".." in s or "・" in s:  # guard: the regex only fires on runs
        s = _DOT_RUN.sub("...", s)
    return s


def join_blocks(blocks: list[str]) -> str:
    """Join normalized block texts with newline, dropping empties."""
    return "\n".join(b for b in blocks if b)


def decode_html(payload: bytes | bytearray | None, max_bytes: int = 2_000_000) -> str:
    """Decode an html payload to str; never raises.

    - ``None``/empty -> "".
    - Payloads larger than ``max_bytes`` are truncated first (the engine's
      input-size cap — the analogue of the reference's per-render 30 s
      timeout, renderer.py:233-239; wall-clock timeouts don't compose with
      Arrow batches, size caps do. SURVEY.md §4 X7).
    - Invalid UTF-8 decodes with U+FFFD replacement (bad-row tolerance,
      run.py:207-212 analogue).
    """
    if not payload:
        return ""
    if len(payload) > max_bytes:
        payload = payload[:max_bytes]
    return bytes(payload).decode("utf-8", errors="replace")
