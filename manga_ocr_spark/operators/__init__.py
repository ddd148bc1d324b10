"""Large-scale training-data-pipeline operators.

All hot-path logic is JVM-side column expressions (whole-stage codegen) or
Arrow-batched pandas UDFs — never row-at-a-time Python. Each operator has a
`queries()` entry in __spark_entry__.py with a DuckDB oracle where SQL can
express the semantics.
"""
