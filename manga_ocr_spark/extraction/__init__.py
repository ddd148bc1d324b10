"""Pure-Python extraction core (no Spark imports).

Pipeline: bytes -> :func:`decode.decode_html` -> :func:`dom.parse_blocks`
-> :func:`score.score_blocks` -> :func:`merge.beam_merge` ->
:func:`normalize.join_blocks`.

The orchestration lives in :func:`core.extract`. Every function is
deterministic given the input bytes — the byte-identity contract of the
engine (BASELINE.json ``input_hint``) is enforced at this layer and pinned
by golden files, mirroring the reference's expected_results.json strategy
(/root/reference/tests/test_ocr.py:21-41).
"""

from manga_ocr_spark.extraction.core import ExtractResult, extract  # noqa: F401
from manga_ocr_spark.extraction.normalize import normalize_block  # noqa: F401
