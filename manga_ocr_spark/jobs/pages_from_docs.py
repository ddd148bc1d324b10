"""Bridge: driver testdata `documents` -> the engine's `pages` table.

The driver's correctness gate runs over /root/testdata parquet, whose
`documents` table carries plain text. To exercise the *real* extraction
engine under the DuckDB oracle, we wrap each document's text into
deterministic HTML (template families mirroring fixtures/pages.py) using
only JVM-side SQL expressions — so the identical construction is
expressible in the oracle SQL, and the oracle for "extract main content
from template(text)" is simply "whitespace-normalize(text)" (plus
duplication for the multi-block family). That turns the driver's
value-hash comparison into an end-to-end byte-identity check of
decode -> DOM -> score -> merge -> normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav>'
)
_ASIDE = (
    '<aside><ul><li><a href="/t/1">hot topic one</a></li>'
    '<li><a href="/t/2">hot topic two</a></li>'
    '<li><a href="/t/3">hot topic three</a></li>'
    '<li><a href="/t/4">hot topic four</a></li></ul></aside>'
)
_FOOTER = '<footer><p>(c) 2024 docs corp <a href="/privacy">privacy</a> terms</p></footer>'
_AD = '<div class="ad"><a href="/ad">sponsored link unit</a></div>'


def _html_expr(text_col: str, family_expr) -> F.Column:
    text = F.col(text_col)
    plain = F.concat(
        F.lit(f"<html><body>{_NAV}<article><p>"),
        text,
        F.lit(f"</p></article>{_FOOTER}</body></html>"),
    )
    linkfarm = F.concat(
        F.lit(f"<html><body>{_NAV}{_ASIDE}<div><p>"),
        text,
        F.lit(f"</p></div>{_ASIDE}{_FOOTER}</body></html>"),
    )
    multiblock = F.concat(
        F.lit(f"<html><body>{_NAV}<p>"),
        text,
        F.lit(f"</p>{_AD}<p>"),
        text,
        F.lit(f"</p>{_FOOTER}</body></html>"),
    )
    return (
        F.when(family_expr == 0, plain)
        .when(family_expr == 1, linkfarm)
        .otherwise(multiblock)
    )


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) -> pages(url, warc_ts, html, text, lang).

    Deterministic: family = doc_id % 3; url/warc_ts derived from doc_id.
    html is utf-8 encoded BinaryType, exactly the input_hint shape.
    """
    family = (F.col("doc_id") % 3).cast("int")
    return docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-03-01 00:00:00")) + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("warc_ts"),
        F.encode(_html_expr("text", family), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
