"""XML annotation exploder: per-row XML documents -> flat rows.

Reference parity: process_manga109s.py parses one XML file per book with
ElementTree and explodes the tree into flat frames/crops tables
(/root/reference/manga_ocr_dev/data/process_manga109s.py:50-180, SURVEY.md
§2.1 S5). Spark-native shape: the XML payloads live in a string/binary
column; one Arrow-batched mapInPandas parses and explodes them. Parsing
stays per-row and independent => embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ANNOTATION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seq", IntegerType()),
        StructField("tag", StringType()),
        StructField("content", StringType()),
    ]
)


def explode_xml(df: DataFrame, id_col: str = "doc_id", xml_col: str = "xml") -> DataFrame:
    """(id, xml) -> one row per element: (doc_id, seq, tag, content).

    Malformed XML yields zero rows for that document (bad-row tolerance,
    run.py:207-212 analogue) — never a task failure.
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out: list[dict] = []
            for did, xml in zip(pdf[id_col], pdf[xml_col]):
                try:
                    root = ET.fromstring(xml)
                except Exception:
                    continue
                for i, el in enumerate(root.iter()):
                    if el is root:
                        continue
                    out.append(
                        {
                            "doc_id": int(did),
                            "seq": i,
                            "tag": el.tag,
                            "content": (el.text or "").strip(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in ANNOTATION_SCHEMA.fields])

    return df.select(id_col, xml_col).mapInPandas(_map, ANNOTATION_SCHEMA)
