"""WARC source (sources/warc.py): synthetic ISO-28500 archives — built
record-by-record by an independent writer here — through the binaryFile +
mapInArrow explode into PAGES_SCHEMA, and on through the extraction
engine end-to-end. Covers per-record gzip members (the Common-Crawl
layout), plain uncompressed WARC, skipped record types, WET-style
conversion records, and truncated tails."""

from __future__ import annotations

import gzip

import pytest

from manga_ocr_spark.sources.warc import (
    _parse_warc_date,
    iter_warc_records,
    pages_from_warc,
    warc_pages,
)


def _record(rtype: str, url: str | None, content: bytes, ctype: str | None = None) -> bytes:
    lines = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if url:
        lines.append(b"WARC-Target-URI: " + url.encode())
    lines.append(b"WARC-Date: 2024-03-01T12:00:00Z")
    if ctype:
        lines.append(b"Content-Type: " + ctype.encode())
    lines.append(b"Content-Length: " + str(len(content)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + content + b"\r\n\r\n"


def _http_response(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Server: test\r\n\r\n" + body
    )


def _sample_records(n_pages: int = 5) -> list[bytes]:
    recs = [_record("warcinfo", None, b"software: test-writer", "application/warc-fields")]
    for i in range(n_pages):
        html = f"<html><body><p>page body number {i} with real words</p></body></html>".encode()
        recs.append(
            _record(
                "request",
                f"https://w/{i}",
                b"GET / HTTP/1.1\r\nHost: w\r\n\r\n",
                "application/http; msgtype=request",
            )
        )
        recs.append(
            _record(
                "response",
                f"https://w/{i}",
                _http_response(html),
                "application/http; msgtype=response",
            )
        )
    recs.append(
        _record("conversion", "https://w/wet0", b"plain wet text content", "text/plain")
    )
    return recs


def test_iter_warc_records_plain_and_gzip_members():
    recs = _sample_records(3)
    plain = b"".join(recs)
    # Common-Crawl layout: one gzip member PER RECORD, concatenated
    gz = b"".join(gzip.compress(r) for r in recs)
    for data in (plain, gz):
        parsed = list(iter_warc_records(data))
        assert len(parsed) == len(recs)
        assert parsed[0][0]["warc-type"] == "warcinfo"
        assert parsed[0][0]["warc-version"] == "WARC/1.0"


def test_warc_pages_filters_and_bodies():
    data = b"".join(_sample_records(4))
    pages = list(warc_pages(data))
    # 4 responses + 1 conversion; requests/warcinfo skipped
    assert len(pages) == 5
    urls = [u for u, _, _ in pages]
    assert urls[:4] == [f"https://w/{i}" for i in range(4)]
    assert urls[4] == "https://w/wet0"
    # HTTP headers stripped from response bodies
    assert pages[0][2].startswith(b"<html>")
    assert pages[4][2] == b"plain wet text content"
    assert all(ts is not None and ts.year == 2024 for _, ts, _ in pages)


def test_warc_truncated_tail_parses_prefix():
    recs = _sample_records(3)
    data = b"".join(recs)
    cut = data[: len(data) - len(recs[-1]) // 2]  # chop mid-final-record
    parsed = list(iter_warc_records(cut))
    assert len(parsed) == len(recs) - 1  # everything before the break


def test_parse_warc_date_variants():
    assert _parse_warc_date("2024-03-01T12:00:00Z").hour == 12
    assert _parse_warc_date("2024-03-01T12:00:00.123Z").second == 0
    assert _parse_warc_date("garbage") is None


def test_pages_from_warc_end_to_end_extraction(spark, tmp_path):
    # two .warc.gz segment files -> binaryFile tasks -> PAGES_SCHEMA ->
    # the full extraction engine; every page lands with its url and a
    # non-empty extracted text
    from manga_ocr_spark.jobs.extract import extract_pages

    seg = tmp_path / "segments"
    seg.mkdir()
    for f in range(2):
        recs = []
        for i in range(6):
            body = (
                f"<html><body><nav><a href='/x'>boiler</a></nav>"
                f"<main><p>segment {f} page {i} content words here</p></main>"
                f"</body></html>"
            ).encode()
            recs.append(
                _record(
                    "response",
                    f"https://seg{f}.example/{i}",
                    _http_response(body),
                    "application/http; msgtype=response",
                )
            )
        (seg / f"part-{f}.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))

    pages = pages_from_warc(spark, str(seg), lang="en")
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    out = extract_pages(pages).collect()
    assert len(out) == 12
    by_url = {r.url: r for r in out}
    assert "segment 1 page 4 content words here" in by_url["https://seg1.example/4"].extracted_text
    assert all(r.warc_ts is not None for r in out)
    assert all(r.lang == "en" for r in out)


def test_pages_from_warc_one_task_per_file(spark, tmp_path):
    # the documented parallelism contract: binaryFile = one task per file
    seg = tmp_path / "segs2"
    seg.mkdir()
    for f in range(3):
        rec = _record(
            "response",
            f"https://p/{f}",
            _http_response(b"<p>x words</p>"),
            "application/http",
        )
        (seg / f"p{f}.warc.gz").write_bytes(gzip.compress(rec))
    df = pages_from_warc(spark, str(seg))
    assert df.rdd.getNumPartitions() == 3  # one task per archive file
    assert df.count() == 3


def test_pages_from_warc_ranges_indexed_reads(spark, tmp_path):
    # the CDX-style scale path: member-aligned byte ranges of ONE segment
    # file read independently (intra-file parallelism); the union over
    # index rows must equal the whole-file read, and a partial index must
    # read only its pages
    from manga_ocr_spark.sources.warc import pages_from_warc_ranges

    seg = tmp_path / "idx"
    seg.mkdir()
    path = str(seg / "big.warc.gz")
    offsets = []
    blob = bytearray()
    for i in range(10):
        rec = _record(
            "response",
            f"https://idx/{i}",
            _http_response(f"<p>indexed page {i} words</p>".encode()),
            "application/http; msgtype=response",
        )
        member = gzip.compress(rec)
        offsets.append((len(blob), len(member)))
        blob += member
    with open(path, "wb") as f:
        f.write(bytes(blob))

    # 3 ranges: records [0,3), [3,4), [4,10) — spans of whole members
    def rng(a, b):
        start = offsets[a][0]
        end = offsets[b - 1][0] + offsets[b - 1][1]
        return (path, start, end - start)

    full_index = spark.createDataFrame(
        [rng(0, 3), rng(3, 4), rng(4, 10)], "path string, offset long, length long"
    ).repartition(3)
    out = pages_from_warc_ranges(spark, full_index).collect()
    assert sorted(r.url for r in out) == sorted(f"https://idx/{i}" for i in range(10))

    partial = spark.createDataFrame([rng(3, 4)], "path string, offset long, length long")
    only = pages_from_warc_ranges(spark, partial, lang="en").collect()
    assert [r.url for r in only] == ["https://idx/3"] and only[0].lang == "en"

    # a bogus-scheme / nonexistent-path index row must be SKIPPED, never
    # fail the task (pyarrow raises ArrowInvalid — a ValueError, not an
    # OSError — for URIs it cannot parse; review cycle 4 finding)
    with_bad = spark.createDataFrame(
        [rng(3, 4), ("bogus-scheme://host/x.warc.gz", 0, 100),
         (str(seg / "missing.warc.gz"), 0, 100)],
        "path string, offset long, length long",
    )
    survived = pages_from_warc_ranges(spark, with_bad).collect()
    assert sorted(r.url for r in survived) == ["https://idx/3"]


def test_corrupt_gzip_member_yields_prefix_never_raises(spark):
    # self-review finding: a bit-flipped member / trailing garbage must
    # yield everything before the corruption, not raise into the task
    recs = _sample_records(3)
    good = b"".join(gzip.compress(r) for r in recs)
    for data in (
        good + b"\x1f\x8b" + b"garbage not a member",
        good[:-20],  # truncated final member
        b"".join(gzip.compress(r) for r in recs[:2])
        + gzip.compress(recs[2])[:10]
        + b"\xff" * 30,
    ):
        parsed = list(iter_warc_records(data))
        assert 0 < len(parsed) <= len(recs)
        assert parsed[0][0]["warc-type"] == "warcinfo"


def test_lf_only_record_with_crlf_http_payload():
    # self-review finding: LF-only WARC headers whose content is a CRLF
    # HTTP message — the EARLIEST blank line must terminate the WARC
    # header block, not the first CRLFCRLF inside the payload
    http = _http_response(b"<p>lf framed body</p>")
    rec = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: https://lf/1\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\nContent-Type: application/http\n"
        + f"Content-Length: {len(http)}\n\n".encode()
        + http
        + b"\n\n"
    )
    pages = list(warc_pages(rec))
    assert len(pages) == 1
    assert pages[0][0] == "https://lf/1"
    assert pages[0][2] == b"<p>lf framed body</p>"


def test_chunked_and_gzip_http_bodies():
    # crawls store HTTP messages as received: chunked framing and
    # content-encoding must be undone before the body becomes "html"
    body = b"<html><body><p>chunked gzip body</p></body></html>"
    chunked = b""
    for piece in (body[:10], body[10:25], body[25:]):
        chunked += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
    chunked += b"0\r\n\r\n"
    http_chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/html\r\n\r\n" + chunked
    )
    http_gzip = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Type: text/html\r\n\r\n" + gzip.compress(body)
    )
    http_br = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n" + b"\x00\x01brdata"
    )
    recs = [
        _record("response", "https://c/1", http_chunked, "application/http"),
        _record("response", "https://c/2", http_gzip, "application/http"),
        _record("response", "https://c/3", http_br, "application/http"),
    ]
    pages = {u: b for u, _, b in warc_pages(b"".join(recs))}
    assert pages["https://c/1"] == body
    assert pages["https://c/2"] == body
    assert "https://c/3" not in pages  # undecodable coding: skipped, not garbage


def test_streaming_batches_bound_output_size(spark, tmp_path):
    # many records in one archive must emit MULTIPLE bounded RecordBatches
    # (peak memory contract), while the row total stays exact
    import manga_ocr_spark.sources.warc as W

    seg = tmp_path / "big"
    seg.mkdir()
    n = 150
    recs = [
        _record(
            "response",
            f"https://b/{i}",
            _http_response(f"<p>doc {i} words</p>".encode()),
            "application/http",
        )
        for i in range(n)
    ]
    (seg / "seg.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    old = W._BATCH_PAGES
    W._BATCH_PAGES = 40  # force several flushes
    try:
        out = pages_from_warc(spark, str(seg)).collect()
    finally:
        W._BATCH_PAGES = old
    assert len(out) == n
    assert sorted(r.url for r in out) == sorted(f"https://b/{i}" for i in range(n))


def test_warc_random_mutations_never_raise():
    # hostile-crawl guarantee: random byte flips / truncations / splices
    # over a valid archive must never raise out of the record walk — a
    # single bad file cannot be allowed to kill a Spark task
    import random

    rng = random.Random(20250817)
    recs = _sample_records(4)
    base_plain = b"".join(recs)
    base_gz = b"".join(gzip.compress(r) for r in recs)
    for base in (base_plain, base_gz):
        for trial in range(60):
            data = bytearray(base)
            kind = trial % 3
            if kind == 0:  # flip up to 4 bytes
                for _ in range(rng.randint(1, 4)):
                    data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
            elif kind == 1:  # truncate anywhere
                data = data[: rng.randrange(len(data))]
            else:  # splice a random chunk into a random offset
                chunk = bytes(rng.randrange(256) for _ in range(rng.randint(1, 64)))
                at = rng.randrange(len(data))
                data = data[:at] + chunk + data[at:]
            for _h, _c in iter_warc_records(bytes(data)):
                pass
            for _p in warc_pages(bytes(data)):
                pass


def test_hostile_lengths_terminate():
    # third-review findings: negative Content-Length made pos a fixed
    # point (infinite loop); negative chunked sizes walked backward
    from manga_ocr_spark.sources.warc import _dechunk

    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://n/1\r\n"
        b"Content-Type: application/http\r\nContent-Length: -33\r\n\r\n"
        + b"x" * 100
    )
    assert list(iter_warc_records(bad)) == []  # terminates, yields nothing
    assert _dechunk(b"3\r\nabc\r\n-5\r\nxxxxxxxxxx") == b"abc"
    assert _dechunk(b"-5\r\nhello world data") == b""


def test_gzip_bomb_bounded(monkeypatch):
    # a member inflating past the cap must stop with the bounded prefix,
    # not materialize the bomb
    import manga_ocr_spark.sources.warc as W

    monkeypatch.setattr(W, "_INFLATE_CAP", 10_000)
    rec_small = _record("response", "https://b/1", _http_response(b"<p>ok</p>"), "application/http")
    bomb = gzip.compress(b"\x00" * 1_000_000)  # ~1000:1
    data = gzip.compress(rec_small) + bomb
    parsed = list(W.iter_warc_records(data))
    assert len(parsed) == 1  # the good record; the bomb member is cut off

    # content-encoding bomb drops the page, keeps the task alive
    bomb_http = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + gzip.compress(b"A" * 1_000_000)
    )
    rec = _record("response", "https://b/2", bomb_http, "application/http")
    assert list(W.warc_pages(rec)) == []
