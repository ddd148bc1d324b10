"""Encrypted-PDF extraction (ISO 32000 §7.6 standard security handler,
empty user password) validated against an INDEPENDENT test-side
encryptor: own RC4, own FORWARD AES-128-CBC (the engine implements only
the inverse cipher), own Algorithm 2/4/5 implementations. Encrypted
fixtures must extract byte-identically to their plaintext twins; real
passwords and unsupported handlers must degrade to None."""

from __future__ import annotations

import struct
import zlib
from hashlib import md5

from manga_ocr_spark.extraction.pdf import extract_pdf_lines

from tests.test_pdf import PdfWriter

# -- independent test-side crypto -------------------------------------------

PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def rc4_t(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) % 256
        S[i], S[j] = S[j], S[i]
    i = j = 0
    out = []
    for ch in data:
        i = (i + 1) % 256
        j = (j + S[i]) % 256
        S[i], S[j] = S[j], S[i]
        out.append(ch ^ S[(S[i] + S[j]) % 256])
    return bytes(out)


# forward AES-128 (FIPS-197 cipher; engine has only the inverse)
_SBOX_HEX = (
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
SBOX = bytes.fromhex(_SBOX_HEX)
RCON = [1, 2, 4, 8, 16, 32, 64, 128, 27, 54]


def _expand(key: bytes) -> list[list[int]]:
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [SBOX[b] for b in t]
            t[0] ^= RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return w


def _mix_single(col: list[int]) -> list[int]:
    def xt(a):
        a <<= 1
        return (a ^ 0x11B) & 0xFF if a & 0x100 else a

    a0, a1, a2, a3 = col
    return [
        xt(a0) ^ (xt(a1) ^ a1) ^ a2 ^ a3,
        a0 ^ xt(a1) ^ (xt(a2) ^ a2) ^ a3,
        a0 ^ a1 ^ xt(a2) ^ (xt(a3) ^ a3),
        (xt(a0) ^ a0) ^ a1 ^ a2 ^ xt(a3),
    ]


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    w = _expand(key)
    # state columns
    st = [list(block[4 * c : 4 * c + 4]) for c in range(4)]

    def add_rk(rnd):
        for c in range(4):
            for r in range(4):
                st[c][r] ^= w[4 * rnd + c][r]

    add_rk(0)
    for rnd in range(1, 10):
        for c in range(4):
            st[c] = [SBOX[b] for b in st[c]]
        # ShiftRows over row-major view
        rows = [[st[c][r] for c in range(4)] for r in range(4)]
        for r in range(4):
            rows[r] = rows[r][r:] + rows[r][:r]
        st = [[rows[r][c] for r in range(4)] for c in range(4)]
        st = [_mix_single(st[c]) for c in range(4)]
        add_rk(rnd)
    for c in range(4):
        st[c] = [SBOX[b] for b in st[c]]
    rows = [[st[c][r] for c in range(4)] for r in range(4)]
    for r in range(4):
        rows[r] = rows[r][r:] + rows[r][:r]
    st = [[rows[r][c] for r in range(4)] for c in range(4)]
    add_rk(10)
    return bytes(b for c in range(4) for b in st[c])


def aes_cbc_encrypt_t(key: bytes, iv: bytes, plain: bytes) -> bytes:
    padlen = 16 - len(plain) % 16
    plain += bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for off in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[off : off + 16], prev))
        prev = aes128_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def file_key_t(o: bytes, p: int, id0: bytes, r: int, nbytes: int) -> bytes:
    h = md5(PAD + o + struct.pack("<i", p) + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h[:nbytes]).digest()
    return h[:nbytes]


def u_entry_t(key: bytes, id0: bytes, r: int) -> bytes:
    if r == 2:
        return rc4_t(key, PAD)
    enc = rc4_t(key, md5(PAD + id0).digest())
    for i in range(1, 20):
        enc = rc4_t(bytes(b ^ i for b in key), enc)
    return enc + b"\x00" * 16  # 16 arbitrary padding bytes per Algorithm 5


def obj_key_t(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    ext = key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
    if aes:
        ext += b"sAlT"
    return md5(ext).digest()[: min(len(key) + 5, 16)]


# -- fixture builder ---------------------------------------------------------

O_ENTRY = bytes(range(31, 63))  # arbitrary: owner-password path unused
P_VALUE = -44
ID0 = bytes.fromhex("f1e2d3c4b5a697887766554433221100")


def encrypted_pdf(content: bytes, variant: str, u_override: bytes | None = None) -> bytes:
    """Build an encrypted twin of tests.test_pdf._simple_pdf(content)."""
    if variant == "rc4-40":
        v, r, nbytes = 1, 2, 5
        enc_extra = ""
    elif variant == "rc4-128":
        v, r, nbytes = 2, 3, 16
        enc_extra = " /Length 128"
    elif variant == "aes-128":
        v, r, nbytes = 4, 4, 16
        enc_extra = (
            " /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
            " /StmF /StdCF /StrF /StdCF"
        )
    else:
        raise ValueError(variant)
    key = file_key_t(O_ENTRY, P_VALUE, ID0, r, nbytes)
    u = u_override if u_override is not None else u_entry_t(key, ID0, r)

    def enc_stream(num: int, data: bytes) -> bytes:
        if variant == "aes-128":
            iv = md5(b"iv" + bytes([num])).digest()  # deterministic test IV
            return aes_cbc_encrypt_t(obj_key_t(key, num, 0, True), iv, data)
        return rc4_t(obj_key_t(key, num, 0, False), data)

    w = PdfWriter()
    w.put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    w.put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.put(
        3,
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>",
    )
    w.stream(4, "/Filter /FlateDecode", enc_stream(4, zlib.compress(content)))
    w.put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    w.put(
        9,
        (
            f"<< /Filter /Standard /V {v} /R {r}{enc_extra} "
            f"/O <{O_ENTRY.hex()}> /U <{u[:32].hex()}> /P {P_VALUE} >>"
        ).encode(),
    )
    rendered = w.render()
    # splice /Encrypt + /ID into the trailer the writer emits
    old = b"/Root 1 0 R >>"
    new = f"/Root 1 0 R /Encrypt 9 0 R /ID [<{ID0.hex()}> <{ID0.hex()}>] >>".encode()
    assert old in rendered
    return rendered.replace(old, new)


# -- tests -------------------------------------------------------------------

CONTENT = b"BT /F1 12 Tf (encrypted payload line) Tj 0 -20 Td (second line) Tj ET"


def test_engine_aes_inverts_fips197_vector():
    # FIPS-197 appendix C.1 known-answer test against the ENGINE's
    # inverse cipher (the test-side forward cipher is checked too)
    from manga_ocr_spark.extraction.pdfcrypt import _aes128_decrypt_block, _expand_key_128

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    plain = bytes.fromhex("00112233445566778899aabbccddeeff")
    cipher = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes128_encrypt_block(key, plain) == cipher
    assert _aes128_decrypt_block(_expand_key_128(key), cipher) == plain


def test_engine_cbc_roundtrips_independent_encryptor():
    from manga_ocr_spark.extraction.pdfcrypt import aes128_cbc_decrypt

    key = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        plain = bytes((7 * i + 3) % 256 for i in range(n))
        enc = aes_cbc_encrypt_t(key, b"\xaa" * 16, plain)
        assert aes128_cbc_decrypt(key, enc) == plain


def test_rc4_40_extracts_byte_identical_to_plaintext_twin():
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    assert want == ["encrypted payload line", "second line"]
    assert extract_pdf_lines(encrypted_pdf(CONTENT, "rc4-40")) == want


def test_rc4_128_extracts_byte_identical_to_plaintext_twin():
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    assert extract_pdf_lines(encrypted_pdf(CONTENT, "rc4-128")) == want


def test_aes128_extracts_byte_identical_to_plaintext_twin():
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    assert extract_pdf_lines(encrypted_pdf(CONTENT, "aes-128")) == want


def test_real_user_password_degrades_to_none():
    # /U computed from a DIFFERENT (non-empty) password: the empty-password
    # check must fail and the document must degrade, never emit garbage
    wrong_u = bytes(range(32))
    assert extract_pdf_lines(encrypted_pdf(CONTENT, "rc4-128", u_override=wrong_u)) is None
    assert extract_pdf_lines(encrypted_pdf(CONTENT, "aes-128", u_override=wrong_u)) is None


def test_unsupported_v5_degrades_to_none():
    pdf = encrypted_pdf(CONTENT, "rc4-128")
    pdf = pdf.replace(b"/V 2 /R 3", b"/V 5 /R 6")
    assert extract_pdf_lines(pdf) is None


def test_core_dispatch_matches_plaintext_twin():
    from manga_ocr_spark.extraction.core import extract
    from tests.test_pdf import _simple_pdf

    plain_res = extract(_simple_pdf(CONTENT))
    enc_res = extract(encrypted_pdf(CONTENT, "aes-128"))
    assert plain_res.text is not None
    assert enc_res.text == plain_res.text  # byte-identical end to end


def test_encrypted_random_mutations_never_raise():
    # corruption fuzz over the encrypted variants: flips, truncations and
    # splices anywhere (incl. inside /O /U /CF and ciphertext) must never
    # raise — worst case is a None/partial extraction
    import random

    from manga_ocr_spark.extraction.core import extract

    rng = random.Random(20250817)
    bases = [encrypted_pdf(CONTENT, v) for v in ("rc4-40", "rc4-128", "aes-128")]
    for trial in range(60):
        data = bytearray(bases[trial % 3])
        op = trial % 4
        if op == 0:
            for _ in range(rng.randint(1, 8)):
                data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        elif op == 1:
            data = data[: rng.randrange(1, len(data))]
        elif op == 2:
            at = rng.randrange(len(data))
            data = data[:at] + bytes(rng.randrange(256) for _ in range(16)) + data[at:]
        else:
            a, b = sorted(rng.randrange(len(data)) for _ in range(2))
            data = data[:a] + data[b:]
        res = extract(bytes(data))  # must not raise
        assert res.text is None or isinstance(res.text, str)


def test_v1_nonstandard_length_forced_to_40_bit_key():
    # ADVICE r4: V=1 means 40-bit RC4 by definition (ISO 32000-1 §7.6.1);
    # a malformed-but-reader-tolerated file declaring /Length 128 must
    # still derive the 40-bit key, not fail the /U check and degrade.
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    pdf = encrypted_pdf(CONTENT, "rc4-40")
    patched = pdf.replace(b"/V 1 /R 2 ", b"/V 1 /R 2 /Length 128 ")
    assert patched != pdf
    assert extract_pdf_lines(patched) == want


def test_incremental_update_later_encrypt_dict_wins():
    # ADVICE r4: object definitions use later-wins incremental-update
    # semantics; the Encrypt trailer entry must follow the same rule. The
    # base revision's trailer points at a STALE Encrypt dict (object 8,
    # wrong /U); the appended update's trailer points at the good one.
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    pdf = encrypted_pdf(CONTENT, "rc4-128")
    assert b"/Encrypt 9 0 R" in pdf
    stale_first = pdf.replace(b"/Encrypt 9 0 R", b"/Encrypt 8 0 R")
    update = (
        b"\n8 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /O <"
        + O_ENTRY.hex().encode()
        + b"> /U <"
        + (b"\xaa" * 32).hex().encode()
        + b"> /P -44 >>\nendobj\ntrailer\n<< /Size 10 /Root 1 0 R "
        b"/Encrypt 9 0 R /ID [<" + ID0.hex().encode() + b"> <"
        + ID0.hex().encode()
        + b">] >>\nstartxref\n0\n%%EOF\n"
    )
    assert extract_pdf_lines(stale_first + update) == want
    # sanity: with only the stale trailer the document degrades (the /U
    # check on object 8's wrong entry fails) — proves the fixture bites
    assert extract_pdf_lines(stale_first) is None


def test_xref_stream_dict_does_not_override_later_classic_trailer():
    # second review cycle: the two-pass form visited ALL xref-stream
    # dicts after ALL classic trailers, so a stale XRef /Encrypt from an
    # old revision overrode a newer appended classic trailer. The merged
    # file-position-ordered pass must let the LATER (good) trailer win.
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    pdf = encrypted_pdf(CONTENT, "rc4-128")
    stale_xref = (
        b"7 0 obj\n<< /Type /XRef /Encrypt 8 0 R >>\nendobj\n"
    )
    bad_encrypt = (
        b"8 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /O <"
        + O_ENTRY.hex().encode()
        + b"> /U <"
        + (b"\xbb" * 32).hex().encode()
        + b"> /P -44 >>\nendobj\n"
    )
    anchor = b"1 0 obj"
    assert anchor in pdf
    # stale XRef dict EARLY in the file; the good classic trailer stays
    # at the end — later wins by file position
    patched = pdf.replace(anchor, stale_xref + bad_encrypt + anchor, 1)
    assert extract_pdf_lines(patched) == want


def test_empty_id_in_later_trailer_does_not_clobber_key_salt():
    # second review cycle: later-wins for /ID must require a NON-EMPTY
    # value — an appended trailer carrying '/ID [<> <>]' (empty bytes
    # pass the isinstance check) must not wipe the real key salt.
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    pdf = encrypted_pdf(CONTENT, "rc4-128")
    update = (
        b"\ntrailer\n<< /Size 10 /Root 1 0 R /Encrypt 9 0 R "
        b"/ID [<> <>] >>\nstartxref\n0\n%%EOF\n"
    )
    assert extract_pdf_lines(pdf + update) == want


def test_junk_trailer_inside_stream_body_cannot_win_position_ordering():
    # second review cycle, round 2: a 'trailer << ... >>' byte sequence
    # INSIDE a stream body, sitting at a later file position than every
    # real dict, must not clobber /Encrypt under the position-ordered
    # merge — object extents from _scan_objects exclude it.
    from tests.test_pdf import _simple_pdf

    want = extract_pdf_lines(_simple_pdf(CONTENT))
    pdf = encrypted_pdf(CONTENT, "rc4-128")
    bad_encrypt = (
        b"8 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /O <"
        + O_ENTRY.hex().encode()
        + b"> /U <" + (b"\xcc" * 32).hex().encode() + b"> /P -44 >>\nendobj\n"
    )
    junk_body = b"\ntrailer\n<< /Encrypt 8 0 R >>\n"
    junk_stream = (
        b"10 0 obj\n<< /Length " + str(len(junk_body)).encode() + b" >>\nstream"
        + junk_body + b"endstream\nendobj\n"
    )
    # junk-bearing stream object appended LAST — latest file position
    patched = pdf + b"\n" + bad_encrypt + junk_stream
    assert extract_pdf_lines(patched) == want
