"""WARC (ISO 28500) source: Common-Crawl-style archive files -> pages.

The engine's input contract is an Iceberg-layout table of pages
(BASELINE input_hint), but the table has to come from somewhere: real
Common-Crawl deployments land `.warc.gz` segment files and explode them
into page rows as the ingest step. This source does that Spark-natively:

- ``spark.read.format("binaryFile")`` assigns ONE FILE PER TASK — WARC
  gzip is not block-splittable without an external index, and one-task-
  per-file is exactly how production CC pipelines parallelize (a crawl
  is ~64k segment files of ~1 GB; the file *count* provides the
  parallelism, not intra-file splits). For intra-file splits, use
  :func:`pages_from_warc_ranges` with a CDX-style offset index.
- record parsing runs in an Arrow-batched ``mapInArrow`` (no per-row
  Python from Spark's perspective; the record walk itself is a linear
  scan over the decompressed buffer).
- output is ``PAGES_SCHEMA`` rows (url, warc_ts, html, text=None,
  lang=None) ready for :func:`manga_ocr_spark.jobs.extract.extract_pages`
  or an :class:`ExtractJob` — the same downstream path as table input.

Format notes (public spec, ISO 28500 / WARC 1.0-1.1):

- a WARC file is a sequence of records; `.warc.gz` stores each record as
  its own gzip member — ``zlib`` handles concatenated members.
- record = version line (``WARC/1.0``) + CRLF-delimited named header
  fields + CRLF CRLF + exactly ``Content-Length`` bytes of content +
  CRLF CRLF.
- only ``WARC-Type: response`` records carrying an HTTP payload
  (``Content-Type: application/http``) yield pages; the HTML body is the
  part of the HTTP message after its header block. ``resource`` records
  (e.g. WET conversions) are yielded with their content as-is.

Reference analogue: the directory-poll ingest of
/root/reference/manga_ocr/run.py:93-107 — here the "directory" is a
crawl segment listing and each file explodes into many work items.
"""

from __future__ import annotations

import datetime as dt
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream. Each WARC record
    is its own member in `.warc.gz`; members are simply concatenated."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = n - len(tail)
    return b"".join(out)


def _parse_warc_date(s: str) -> dt.datetime | None:
    """WARC-Date: ISO-8601 UTC (``2024-03-01T12:34:56Z``, optionally
    fractional seconds). Returns a naive UTC datetime (the engine's
    session timezone is UTC, matching jobs/extract's convention)."""
    try:
        s = s.strip()
        if s.endswith("Z"):
            s = s[:-1]
        if "." in s:
            s = s.split(".", 1)[0]
        return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S")
    except ValueError:
        return None


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, content) for each record of a WARC buffer.

    ``headers`` keys are lower-cased field names plus ``"warc-version"``.
    Tolerates leading/trailing CRLF padding between records; stops at the
    first structurally-broken record (truncated files are a fact of life
    in crawl data — parse what is parseable, never raise mid-file).
    """
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos] in (0x0D, 0x0A):  # inter-record CRLFs
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # garbage past the last record
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", pos)
            sep = 2
        if hdr_end == -1:
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].decode("utf-8", "replace").splitlines()
        headers["warc-version"] = lines[0].strip()
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + sep
        if body_start + length > n:
            return  # truncated final record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _http_body(content: bytes) -> bytes | None:
    """Body of an HTTP message block (response records wrap one)."""
    if not content.startswith(b"HTTP/"):
        return None
    end = content.find(b"\r\n\r\n")
    sep = 4
    if end == -1:
        end = content.find(b"\n\n")
        sep = 2
    if end == -1:
        return None
    return content[end + sep :]


def warc_pages(data: bytes) -> Iterator[tuple[str, dt.datetime | None, bytes]]:
    """(url, warc_ts, html) for every page-bearing record of one file."""
    for headers, content in iter_warc_records(data):
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        if not url:
            continue
        ts = _parse_warc_date(headers.get("warc-date", ""))
        if rtype == "response" and headers.get("content-type", "").startswith(
            "application/http"
        ):
            body = _http_body(content)
            if body is not None:
                yield url, ts, body
        elif rtype == "resource" or (
            rtype == "conversion" and headers.get("content-type", "").startswith("text/")
        ):
            # WET-style conversions / raw resources: content IS the payload
            yield url, ts, content


def pages_from_warc(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """Read `.warc` / `.warc.gz` files under ``path`` into PAGES_SCHEMA.

    One Spark task per archive file (binaryFile source, see module
    docstring); records explode inside an Arrow-batched ``mapInArrow``.
    ``text``/``lang`` stay NULL (``lang`` optionally forced) — they are
    produced by extraction, not ingest.
    """
    from manga_ocr_spark.jobs.extract import PAGES_SCHEMA

    files = spark.read.format("binaryFile").load(path).select("content")

    def explode(batches):
        import pyarrow as pa

        for batch in batches:
            urls: list[str] = []
            tss: list[dt.datetime | None] = []
            htmls: list[bytes] = []
            for v in batch.column("content"):
                payload = v.as_py()
                if not payload:
                    continue
                for url, ts, html in warc_pages(payload):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array([lang] * len(urls), pa.string()),
                ],
                names=[f.name for f in PAGES_SCHEMA.fields],
            )

    return files.mapInArrow(explode, PAGES_SCHEMA)


def pages_from_warc_ranges(
    spark: SparkSession, index: DataFrame, lang: str | None = None
) -> DataFrame:
    """Indexed WARC reads: intra-file parallelism from a CDX-style offset
    index — the actual Common-Crawl scale path (the crawl publishes
    ``cluster.idx``/CDX files with per-record ``(file, offset, length)``).

    ``index`` columns: ``path`` (string), ``offset`` (long), ``length``
    (long). Each row is one independent read: because `.warc.gz` stores
    every record as its OWN gzip member, any member-aligned byte range
    decompresses standalone — this is what makes a 1 GB segment file
    splittable across tasks, where :func:`pages_from_warc` is limited to
    one task per file. Ranges may span several records (CDX "blocks").

    The range read goes through ``pyarrow.fs`` resolved per worker from
    the path, so local paths and any pyarrow-supported DFS (HDFS, S3)
    work unchanged. Partition the index (``index.repartition(n)``) to set
    the task granularity; a production job sorts ranges by (path, offset)
    within partitions so each task reads roughly-sequential byte spans.
    """
    from manga_ocr_spark.jobs.extract import PAGES_SCHEMA

    def read_ranges(batches):
        import pyarrow as pa
        from pyarrow import fs as pafs

        filesystems: dict[str, object] = {}  # per-scheme cache, worker-lifetime
        for batch in batches:
            urls: list[str] = []
            tss: list[dt.datetime | None] = []
            htmls: list[bytes] = []
            for path, offset, length in zip(
                batch.column("path").to_pylist(),
                batch.column("offset").to_pylist(),
                batch.column("length").to_pylist(),
            ):
                scheme = path.split("://", 1)[0] if "://" in path else "file"
                filesystem = filesystems.get(scheme)
                if filesystem is None:
                    filesystem, _ = pafs.FileSystem.from_uri(
                        path if "://" in path else f"file://{path}"
                    )
                    filesystems[scheme] = filesystem
                resolved = path.split("://", 1)[1] if "://" in path else path
                with filesystem.open_input_file(resolved) as f:
                    f.seek(offset)
                    buf = f.read(length)
                for url, ts, html in warc_pages(buf):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array([lang] * len(urls), pa.string()),
                ],
                names=[f.name for f in PAGES_SCHEMA.fields],
            )

    return index.select("path", "offset", "length").mapInArrow(read_ranges, PAGES_SCHEMA)
