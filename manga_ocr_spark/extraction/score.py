"""Block classification: content vs boilerplate.

The engine's analogue of the text-region detection that lives implicitly in
the reference's encoder weights (SURVEY.md analogy table): a deterministic
Readability/Boilerpipe-style classifier over the per-block features computed
by dom.py. Thresholds are fixed constants — goldens pin the behavior, so the
constants are part of the engine's contract (change them -> regenerate
goldens, exactly like /root/reference/tests/generate_expected_results.py).

Rules, in order, per block (on *normalized* text lengths):

1. empty after normalization            -> drop
2. inside nav/header/footer/aside       -> drop (landmark prior; J5 analogue)
3. link_density > MAX_LINK_DENSITY      -> drop (link farm / menu)
4. headings (h1..h6) with links-free
   text of >= MIN_HEADING_LEN chars     -> keep (they head the content)
5. text_len < MIN_TEXT_LEN              -> drop (crumbs: "©2024", "prev/next")
6. otherwise                            -> keep

Rule 5 is the analogue of the reference's legibility filter (rendered text
height < 10px -> drop, composer.py:293-306); rule 3 of its contrast filter
(composer.py:308-357) — both reject regions whose signal-to-noise is too
low to be content.

score = text_len * (1 - link_density), negated for dropped blocks, feeds
the beam span-merge (merge.py).
"""

from __future__ import annotations

from manga_ocr_spark.extraction.dom import HEADING_TAGS, Block
from manga_ocr_spark.extraction.normalize import normalize_block

MAX_LINK_DENSITY = 0.33
MIN_TEXT_LEN = 10
MIN_HEADING_LEN = 3


def score_blocks(blocks: list[Block]) -> list[Block]:
    """Normalize text, compute link density, set keep/score in place."""
    out: list[Block] = []
    for b in blocks:
        b.text = normalize_block(b.text)
        # recompute exactly on the normalized text: after normalize_block,
        # the only whitespace left is single ASCII spaces, so ws-free length
        # is len - count(' ') (identical to sum(len(p) for p in split()))
        b.text_len = len(b.text) - b.text.count(" ")
        if b.text_len == 0:
            b.keep = False
            b.score = 0.0
            out.append(b)
            continue
        b.link_density = min(1.0, b.link_text_len / b.text_len)
        base = b.text_len * (1.0 - b.link_density)
        if b.in_boilerplate:
            b.keep = False
        elif b.link_density > MAX_LINK_DENSITY:
            b.keep = False
        elif b.tag in HEADING_TAGS:
            b.keep = b.link_text_len == 0 and b.text_len >= MIN_HEADING_LEN
        else:
            b.keep = b.text_len >= MIN_TEXT_LEN
        b.score = base if b.keep else -base
        out.append(b)
    return out
