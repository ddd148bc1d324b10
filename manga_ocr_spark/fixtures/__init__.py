"""Deterministic synthetic fixtures: pages table + golden extractions."""

from manga_ocr_spark.fixtures.pages import generate_pages  # noqa: F401
from manga_ocr_spark.fixtures.golden import generate_golden  # noqa: F401
