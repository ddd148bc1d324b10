"""Golden extraction generation (FIXTURES.md §2).

Same regeneration pattern as the reference's
tests/generate_expected_results.py:20-43 — the goldens are produced by
*our own* extraction core over the fixture pages, sorted by url for
determinism (cf. :37 there), and then pinned: any behavioral change to the
core must be intentional and re-runs this generator.

Hostile-family pages are excluded (they yield null extraction by design);
the end-to-end test asserts byte-identity for every golden row AND that
hostile rows produce nulls + dropped-counters.
"""

from __future__ import annotations

import pandas as pd

from manga_ocr_spark.extraction.core import extract


def generate_golden(pages: pd.DataFrame) -> pd.DataFrame:
    """pages (from fixtures.pages.generate_pages) -> golden (url, expected_text)."""
    rows = []
    for r in pages.itertuples(index=False):
        if r.family == "hostile":
            continue
        res = extract(r.html)
        if res.text is not None:
            rows.append({"url": r.url, "expected_text": res.text})
    out = pd.DataFrame(rows, columns=["url", "expected_text"])
    return out.sort_values("url").reset_index(drop=True)
