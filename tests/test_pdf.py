"""PDF text extraction (extraction/pdf.py) validated against an
INDEPENDENT minimal PDF writer built here: classic-xref and
object-stream layouts, Flate/ASCIIHex/ASCII85 filters, TJ kerning, Td/Tm
line breaks, ToUnicode CMaps (bfchar + bfrange), Form XObjects, inline
images, incremental updates, encrypted/corrupt degradation — and the
dispatch through extraction/core + the Spark extraction job."""

from __future__ import annotations

import zlib

import pytest

from manga_ocr_spark.extraction.pdf import extract_pdf_lines


class PdfWriter:
    """Minimal independent PDF writer: explicit objects, classic xref."""

    def __init__(self) -> None:
        self.objects: dict[int, bytes] = {}

    def put(self, num: int, body: bytes) -> int:
        self.objects[num] = body
        return num

    def stream(self, num: int, d: str, data: bytes) -> int:
        body = f"<< {d} /Length {len(data)} >>\nstream\n".encode() + data + b"\nendstream"
        return self.put(num, body)

    def render(self, trailer_root: int = 1) -> bytes:
        out = bytearray(b"%PDF-1.5\n")
        offsets = {}
        for num in sorted(self.objects):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + self.objects[num] + b"\nendobj\n"
        xref_at = len(out)
        maxnum = max(self.objects) if self.objects else 0
        out += f"xref\n0 {maxnum + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            off = offsets.get(num, 0)
            out += f"{off:010d} {0:05d} n \n".encode()
        out += (
            f"trailer\n<< /Size {maxnum + 1} /Root {trailer_root} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)


def _simple_pdf(content: bytes, compress: bool = True, nfonts: bool = True) -> bytes:
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    res = b"/Resources << /Font << /F1 5 0 R >> >>" if nfonts else b""
    w.put(3, b"<< /Type /Page /Parent 2 0 R " + res + b" /Contents 4 0 R >>")
    if compress:
        w.stream(4, "/Filter /FlateDecode", zlib.compress(content))
    else:
        w.stream(4, "", content)
    w.put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return w.render()


def test_simple_tj_lines_flate_and_raw():
    content = (
        b"BT /F1 12 Tf 72 700 Td (Hello PDF world) Tj "
        b"0 -14 Td (second line here) Tj ET"
    )
    for compress in (True, False):
        lines = extract_pdf_lines(_simple_pdf(content, compress=compress))
        assert lines == ["Hello PDF world", "second line here"]


def test_tj_array_kerning_inserts_spaces():
    content = b"BT /F1 12 Tf 72 700 Td [(Hel) -20 (lo) -250 (world)] TJ ET"
    lines = extract_pdf_lines(_simple_pdf(content))
    assert lines == ["Hello world"]  # -20 joins, -250 becomes a space


def test_string_escapes_and_hex_strings():
    content = (
        rb"BT /F1 12 Tf (paren \( close \) back\\slash \101\102) Tj "
        b"0 -14 Td <48692068657821> Tj ET"
    )
    lines = extract_pdf_lines(_simple_pdf(content))
    assert lines == ["paren ( close ) back\\slash AB", "Hi hex!"]


def test_multi_page_order_via_page_tree():
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    # Kids deliberately list page B (obj 6) FIRST — tree order must win
    w.put(2, b"<< /Type /Pages /Kids [6 0 R 3 0 R] /Count 2 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    w.stream(4, "", b"BT (page A text) Tj ET")
    w.put(6, b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>")
    w.stream(7, "", b"BT (page B text) Tj ET")
    assert extract_pdf_lines(w.render()) == ["page B text", "page A text"]


def test_tounicode_cmap_bfchar_and_bfrange():
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <01> <0048> <02> <0069> endbfchar\n"  # H i
        b"1 beginbfrange <10> <12> <0041> endbfrange\n"  # A B C
        b"endcmap end\n"
    )
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
    )
    w.stream(4, "", b"BT /F1 12 Tf <0102> Tj 0 -14 Td <101112> Tj ET")
    w.put(5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>")
    w.stream(6, "", cmap)
    assert extract_pdf_lines(w.render()) == ["Hi", "ABC"]


def test_composite_font_without_cmap_yields_nothing():
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
    )
    w.stream(4, "", b"BT /F1 12 Tf <0102> Tj ET")
    w.put(5, b"<< /Type /Font /Subtype /Type0 >>")  # CID bytes unmappable
    assert extract_pdf_lines(w.render()) is None  # no mojibake emitted


def test_object_stream_layout():
    # modern layout: catalog/pages/page/font dicts packed into an ObjStm
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    header = bytearray()
    body = bytearray()
    for num, b in inner.items():
        header += f"{num} {len(body)} ".encode()
        body += b + b" "
    payload = bytes(header) + bytes(body)
    w = PdfWriter()
    w.stream(
        9,
        f"/Type /ObjStm /N {len(inner)} /First {len(header)} /Filter /FlateDecode",
        zlib.compress(payload),
    )
    w.stream(4, "/Filter /FlateDecode", zlib.compress(b"BT /F1 9 Tf (from objstm) Tj ET"))
    assert extract_pdf_lines(w.render()) == ["from objstm"]


def test_ascii_filters_and_filter_chain():
    import base64

    content = b"BT /F1 12 Tf (filtered text) Tj ET"
    hx = content.hex().encode() + b">"
    a85 = base64.a85encode(zlib.compress(content)) + b"~>"
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    w.stream(4, "/Filter /ASCIIHexDecode", hx)
    w.put(6, b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>")
    # chain: ASCII85 wrapping Flate
    w.stream(7, "/Filter [/ASCII85Decode /FlateDecode]", a85)
    assert extract_pdf_lines(w.render()) == ["filtered text", "filtered text"]


def test_form_xobject_text_and_inline_image_skip():
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >>"
        b" /XObject << /Fm1 8 0 R >> >> /Contents 4 0 R >>",
    )
    # inline image bytes include ( and BT to prove the skip is byte-exact
    w.stream(
        4,
        "",
        b"BT /F1 12 Tf (before form) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x00(BT\xff\x01 EI "
        b"/Fm1 Do BT (after form) Tj ET",
    )
    w.put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    w.stream(
        8,
        "/Type /XObject /Subtype /Form"
        " /Resources << /Font << /F1 5 0 R >> >>",
        b"BT /F1 10 Tf (inside the form) Tj ET",
    )
    lines = extract_pdf_lines(w.render())
    assert lines == ["before form", "inside the form", "after form"]


def test_incremental_update_latest_object_wins():
    base = _simple_pdf(b"BT /F1 12 Tf (original text) Tj ET")
    # append a replacement content object 4 (incremental update section)
    update = (
        b"4 0 obj\n<< /Length 34 >>\nstream\n"
        b"BT /F1 12 Tf (updated text) Tj ET\nendstream\nendobj\n"
    )
    data = base + update
    assert extract_pdf_lines(data) == ["updated text"]


def test_encrypted_and_corrupt_degrade_to_none():
    enc = _simple_pdf(b"BT (secret) Tj ET")
    enc += b"trailer\n<< /Encrypt 99 0 R /Root 1 0 R >>\n"
    assert extract_pdf_lines(enc) is None
    assert extract_pdf_lines(b"%PDF-1.5\ngarbage without objects") is None
    assert extract_pdf_lines(b"not a pdf at all") is None
    truncated = _simple_pdf(b"BT /F1 12 Tf (cut) Tj ET")[:80]
    assert extract_pdf_lines(truncated) in (None, [])


def test_core_dispatch_and_spark_job(spark):
    # the %PDF- magic routes through extraction/core with the same
    # byte-stable normalization; HTML rows are unaffected in the same batch
    from pyspark.sql import Row

    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.jobs.extract import extract_pages

    pdf = _simple_pdf(
        b"BT /F1 12 Tf (PDF  body   with \\( spaced \\)  runs) Tj 0 -14 Td (line two) Tj ET"
    )
    res = extract(pdf)
    assert res.text == "PDF body with ( spaced ) runs\nline two"
    assert res.n_blocks_kept == 2 and res.n_blocks_dropped == 0

    import datetime as dt

    rows = [
        Row(
            url="https://x/doc.pdf",
            warc_ts=dt.datetime(2024, 3, 1),
            html=bytearray(pdf),
            text=None,
            lang=None,
        ),
        Row(
            url="https://x/page.html",
            warc_ts=dt.datetime(2024, 3, 1),
            html=bytearray(b"<html><body><p>plain html words</p></body></html>"),
            text=None,
            lang=None,
        ),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = {r.url: r for r in extract_pages(df).collect()}
    assert out["https://x/doc.pdf"].extracted_text.startswith("PDF body with")
    assert out["https://x/page.html"].extracted_text == "plain html words"


def test_obj_pattern_inside_stream_body_does_not_clobber(spark=None):
    # self-review finding: 'N G obj' bytes inside a stream body must not
    # replace the real object of that number
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    w.stream(4, "", b"BT (real page text) Tj ET")
    # an image-ish stream whose bytes contain a fake redefinition of obj 3
    w.stream(5, "/Subtype /Image", b"\x00\x01 3 0 obj << /Junk true >> \xff\xfe")
    assert extract_pdf_lines(w.render()) == ["real page text"]


def test_bfrange_array_destination_no_crosstalk():
    # self-review finding: three <hex> items inside an ARRAY destination
    # must not be parsed as a scalar bfrange entry clobbering earlier maps
    cmap = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <0058> endbfchar\n"  # 0x41 -> 'X'
        b"1 beginbfrange <00> <02> [<0041> <0042> <0043>] endbfrange\n"
        b"endcmap\n"
    )
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
    )
    # codes: 00 01 02 (array dst -> A B C) then 41 (bfchar -> X)
    w.stream(4, "", b"BT /F1 12 Tf <00010241> Tj ET")
    w.put(5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>")
    w.stream(6, "", cmap)
    assert extract_pdf_lines(w.render()) == ["ABCX"]


def test_encrypt_bytes_in_content_not_treated_as_encrypted():
    # self-review finding: '/Encrypt 5 0 R' INSIDE page text must not
    # reject the document; a real trailer /Encrypt still must
    ok = _simple_pdf(rb"BT /F1 12 Tf (about /Encrypt 5 0 R syntax) Tj ET")
    assert extract_pdf_lines(ok) == ["about /Encrypt 5 0 R syntax"]
    enc = _simple_pdf(b"BT (secret) Tj ET")
    enc += b"trailer\n<< /Encrypt 99 0 R /Root 1 0 R >>\n"
    assert extract_pdf_lines(enc) is None


def test_pdf_header_after_preamble_junk():
    # self-review finding: ISO 32000 allows junk before %PDF- in the
    # first 1024 bytes (CGI preambles/BOM); html preambles stay html
    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.extraction.pdf import sniff_pdf

    pdf = _simple_pdf(b"BT /F1 12 Tf (preambled pdf) Tj ET")
    junked = b"\xef\xbb\xbfContent-Type: application/pdf\r\n\r\n" + pdf
    assert extract_pdf_lines(junked) == ["preambled pdf"]
    assert extract(junked).text == "preambled pdf"
    # an HTML page that merely mentions %PDF- stays on the HTML path
    html = b"<html><body><p>the %PDF-1.5 header marks pdf files</p></body></html>"
    assert sniff_pdf(html) == -1
    assert extract(html).text == "the %PDF-1.5 header marks pdf files"


def test_pdf_without_xref_or_trailer_still_extracts():
    # crawl PDFs routinely have broken/absent xref sections; the robust
    # object scan must not depend on them at all
    data = _simple_pdf(b"BT /F1 12 Tf (no xref needed) Tj ET")
    cut = data[: data.find(b"\nxref")]  # drop xref + trailer + EOF marker
    assert b"trailer" not in cut
    assert extract_pdf_lines(cut) == ["no xref needed"]


def test_pdf_random_mutations_never_raise():
    # same hostile-crawl guarantee for the PDF tier: arbitrary corruption
    # must degrade to None/partial text, never an exception
    import random

    rng = random.Random(20250817)
    base = _simple_pdf(
        b"BT /F1 12 Tf (fuzz target text) Tj 0 -14 Td [(with) -250 (array)] TJ ET"
    )
    for trial in range(80):
        data = bytearray(base)
        kind = trial % 3
        if kind == 0:
            for _ in range(rng.randint(1, 6)):
                data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        elif kind == 1:
            data = data[: rng.randrange(len(data))]
        else:
            chunk = bytes(rng.randrange(256) for _ in range(rng.randint(1, 80)))
            at = rng.randrange(len(data))
            data = data[:at] + chunk + data[at:]
        out = extract_pdf_lines(bytes(data))
        assert out is None or isinstance(out, list)


def _lzw_encode(data: bytes) -> bytes:
    """Independent PDF/TIFF LZW encoder (early change) for round-trips."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w = w + c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4095:  # table full: reset like real encoders
            emit(CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(EOD, width)
    if nbits:
        emit(0, 8 - nbits)  # pad
    return bytes(out)


def test_lzw_roundtrip_and_pdf_stream():
    import random

    from manga_ocr_spark.extraction.pdf import _lzw_decode

    rng = random.Random(99)
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaaaaaaaa",  # KwKwK case
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.randrange(4) for _ in range(5000)),   # width growth to 12
        bytes(rng.randrange(256) for _ in range(9000)), # table reset via CLEAR
        (b"BT /F1 12 Tf (lzw page text) Tj ET ") * 40,
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data, data[:24]

    # end to end: an LZW-compressed content stream extracts
    content = b"BT /F1 12 Tf (lzw compressed stream) Tj ET"
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    w.stream(4, "/Filter /LZWDecode", _lzw_encode(content))
    assert extract_pdf_lines(w.render()) == ["lzw compressed stream"]


def test_encoding_differences_glyph_names():
    # pre-Unicode simple fonts remap codes via /Encoding /Differences;
    # names resolve through the AGL table, uniXXXX, and the systematic
    # accented-Latin family
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
    )
    # codes: 0x80 -> eacute, 0x81 -> Euro, 0x82 -> uni0394 (Delta),
    #        0x90 -> Ntilde, 'A'..'z' untouched (latin-1 base)
    w.put(
        5,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding"
        b" << /Differences [ 128 /eacute /Euro /uni0394 144 /Ntilde ] >> >>",
    )
    w.stream(4, "", b"BT /F1 12 Tf (caf\x80 \x81 5 \x82x \x90B plain) Tj ET")
    assert extract_pdf_lines(w.render()) == ["café € 5 Δx ÑB plain"]


def test_glyph_name_resolver_table():
    from manga_ocr_spark.extraction.pdf import _glyph_to_unicode

    assert _glyph_to_unicode("A") == "A"
    assert _glyph_to_unicode("space") == " "
    assert _glyph_to_unicode("seven") == "7"
    assert _glyph_to_unicode("quotedblleft") == "“"
    assert _glyph_to_unicode("uni00E9") == "é"
    assert _glyph_to_unicode("u1F600") == "😀"
    assert _glyph_to_unicode("eacute") == "é"
    assert _glyph_to_unicode("Odieresis") == "Ö"
    assert _glyph_to_unicode("ccedilla") == "ç"
    assert _glyph_to_unicode("nosuchglyphname") is None


def test_surrogate_cmap_values_never_reach_output():
    # third-review finding: lone UTF-16 surrogates from bfrange/uniXXXX
    # would crash Arrow serialization downstream — they must be dropped
    from manga_ocr_spark.extraction.pdf import _glyph_to_unicode

    assert _glyph_to_unicode("uniD800") is None
    cmap = b"1 begincodespacerange <00> <FF> endcodespacerange\n" \
           b"1 beginbfrange <41> <43> <D800> endbfrange\nendcmap\n"
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
             b" /Contents 4 0 R >>")
    w.stream(4, "", b"BT /F1 12 Tf <414243> Tj (ok tail) Tj ET")
    w.put(5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>")
    w.stream(6, "", cmap)
    # every code maps to a surrogate -> dropped -> nothing extractable;
    # the critical property is NO surrogate ever reaches the output
    lines = extract_pdf_lines(w.render())
    for ln in lines or []:
        ln.encode("utf-8")  # must be Arrow/utf-8 serializable
    from manga_ocr_spark.extraction.pdf import _parse_tounicode

    table, _w = _parse_tounicode(cmap)
    assert all(not any(0xD800 <= ord(c) <= 0xDFFF for c in v) for v in table.values())


def test_inherited_resources_from_pages_node():
    # third-review finding: /Resources on the root /Pages node is
    # inheritable; a kid /Page without its own entry must still decode
    # through the inherited font map
    cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"2 beginbfchar <01> <0048> <02> <0069> endbfchar\nendcmap\n")
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
             b" /Resources << /Font << /F1 5 0 R >> >> >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")  # no Resources
    w.stream(4, "", b"BT /F1 12 Tf <0102> Tj ET")
    w.put(5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>")
    w.stream(6, "", cmap)
    assert extract_pdf_lines(w.render()) == ["Hi"]


def test_markup_preamble_never_routes_to_pdf():
    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.extraction.pdf import sniff_pdf

    xhtml = b'<?xml version="1.0"?><div><p>notes on %PDF-1.4 parsing</p></div>'
    assert sniff_pdf(xhtml) == -1
    assert extract(xhtml).text == "notes on %PDF-1.4 parsing"
    head_frag = b"<head><title>%PDF- files</title></head><body><p>body words</p></body>"
    assert sniff_pdf(head_frag) == -1


def test_flate_bomb_dropped(monkeypatch):
    import manga_ocr_spark.extraction.pdf as P

    monkeypatch.setattr(P, "_INFLATE_CAP", 10_000)
    bomb = zlib.compress(b"\x00" * 1_000_000)
    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    w.stream(4, "/Filter /FlateDecode", bomb)
    assert extract_pdf_lines(w.render()) is None  # dropped, not inflated


def test_plain_text_mentioning_pdf_header_not_routed_to_pdf_tier():
    # ADVICE r3: a non-markup crawl payload (WET record, notes about PDF
    # internals) that merely mentions %PDF- early must NOT be routed into
    # the PDF tier — a nonzero-offset header needs structural evidence
    # (obj/xref/trailer) behind it.
    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.extraction.pdf import sniff_pdf

    wet = b"notes: every pdf begins with the %PDF-1.7 header line\nand more prose\n"
    assert sniff_pdf(wet) == -1
    res = extract(wet)
    assert res.text is not None and "every pdf begins" in res.text
    # offset-0 headers still dispatch unconditionally (real PDFs)
    pdf = _simple_pdf(b"BT /F1 12 Tf (zero offset) Tj ET")
    assert sniff_pdf(pdf) == 0
    # preamble + real structure still accepted
    junked = b"Content-Type: application/pdf\r\n\r\n" + pdf
    assert extract_pdf_lines(junked) == ["zero offset"]


def test_pdf_behind_long_preamble_still_dispatches():
    # review finding: the structure window must start AT the header, not
    # inside the 1024-byte preamble cap — a real PDF behind a ~1 KB
    # CGI/HTTP preamble still belongs to the PDF tier
    from manga_ocr_spark.extraction.core import extract
    from manga_ocr_spark.extraction.pdf import sniff_pdf

    pdf = _simple_pdf(b"BT /F1 12 Tf (deep preamble) Tj ET")
    preamble = b"X-Proxy-Log: " + b"a" * 980 + b"\r\n\r\n"  # header lands near offset 1000
    junked = preamble + pdf
    idx = sniff_pdf(junked)
    assert idx == len(preamble)
    assert extract_pdf_lines(junked) == ["deep preamble"]
    assert extract(junked).text == "deep preamble"
