"""Source-format adapters beyond plain parquet (SURVEY.md §2.1)."""
