"""ISO 32000-1 §7.6 standard security handler: empty-user-password
decryption for crawled PDFs (RC4 / AES-128-CBC), pure Python.

A real fraction of crawled PDFs are "encrypted" with an empty user
password (the owner password only gates editing); their content is
recoverable by any conforming reader. This module implements the
public-spec pieces needed to read them:

- Algorithm 2 (file encryption key from the padded empty password),
- Algorithms 4/5 (verify the empty user password against /U — anything
  else means a REAL password, which we cannot and must not guess),
- Algorithm 1 (per-object keys), RC4, and AES-128-CBC decryption
  (FIPS-197 inverse cipher, from scratch — no crypto libs in this
  container).

Supported: /Filter /Standard with V 1/2 (RC4) and V 4 (/CFM /V2 or
/AESV2), R 2/3/4. V 5 (AES-256, R 6) and non-empty passwords return
None — the caller degrades to the failure tier, same as before.

Reference parity note: the reference repo has no PDF code at all; this
tier exists because the north rule's extraction family is "HTML
boilerplate strip, PDF/layout parse, DOM heuristics".
"""

from __future__ import annotations

import struct
from hashlib import md5

# ISO 32000-1 Table 22 padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public since 1994; required by the PDF spec)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# -- AES-128 decryption (FIPS-197 inverse cipher) ---------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


# precomputed multiplication tables for InvMixColumns
_M9 = bytes(_gmul(x, 9) for x in range(256))
_M11 = bytes(_gmul(x, 11) for x in range(256))
_M13 = bytes(_gmul(x, 13) for x in range(256))
_M14 = bytes(_gmul(x, 14) for x in range(256))
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _expand_key_128(key: bytes) -> list[bytes]:
    """11 round keys of 16 bytes each."""
    w = [key[4 * i : 4 * i + 4] for i in range(4)]
    for i in range(4, 44):
        t = w[i - 1]
        if i % 4 == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // 4 - 1], t[1], t[2], t[3]])
        w.append(bytes(a ^ b for a, b in zip(w[i - 4], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(11)]


def _aes128_decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[10]))
    for rnd in range(9, 0, -1):
        # InvShiftRows (state is column-major: byte r,c at 4*c+r)
        s = bytearray(
            s[(4 * ((c - r) % 4)) + r] for c in range(4) for r in range(4)
        )
        # InvSubBytes
        s = bytearray(_INV_SBOX[b] for b in s)
        # AddRoundKey
        s = bytearray(a ^ b for a, b in zip(s, rk[rnd]))
        # InvMixColumns
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            s[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    s = bytearray(s[(4 * ((c - r) % 4)) + r] for c in range(4) for r in range(4))
    s = bytearray(_INV_SBOX[b] for b in s)
    return bytes(a ^ b for a, b in zip(s, rk[0]))


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """PDF AESV2 stream layout: 16-byte IV prefix + CBC ciphertext with
    PKCS#5 padding. None on malformed input (caller degrades)."""
    if len(data) < 32 or len(data) % 16:
        return None
    rk = _expand_key_128(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for off in range(16, len(data), 16):
        block = data[off : off + 16]
        plain = _aes128_decrypt_block(rk, block)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16:
        return None
    return bytes(out[:-pad])


# -- standard security handler ----------------------------------------------


class StdDecryptor:
    """File-key holder + per-object decryption for one document.

    ``cfm`` is "V2" (RC4) or "AESV2". Construct via :func:`build`.
    """

    def __init__(self, key: bytes, cfm: str) -> None:
        self.key = key
        self.cfm = cfm

    def object_key(self, num: int, gen: int) -> bytes:
        """Algorithm 1: per-object key from the file key + object ids."""
        ext = (
            self.key
            + struct.pack("<I", num & 0xFFFFFFFF)[:3]
            + struct.pack("<I", gen & 0xFFFFFFFF)[:2]
        )
        if self.cfm == "AESV2":
            ext += b"sAlT"
        return md5(ext).digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes | None:
        if self.cfm == "Identity":
            return data
        ok = self.object_key(num, gen)
        if self.cfm == "AESV2":
            return aes128_cbc_decrypt(ok, data)
        return rc4(ok, data)


def _file_key(o: bytes, p: int, id0: bytes, r: int, nbytes: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2 for the EMPTY user password."""
    h = md5()
    h.update(PAD)  # empty password -> the pad alone
    h.update(o[:32])
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = md5(key[:nbytes]).digest()
    return key[:nbytes]


def _check_empty_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4 (R2) / 5 (R>=3): recompute /U and compare. A mismatch
    means the document has a real user password — undecryptable."""
    if r == 2:
        return rc4(key, PAD) == u[:32]
    digest = md5(PAD + id0).digest()
    enc = rc4(key, digest)
    for i in range(1, 20):
        enc = rc4(bytes(b ^ i for b in key), enc)
    return enc == u[:16]  # spec: compare first 16 bytes only for R>=3


def build(encrypt: dict, id0: bytes, resolve) -> StdDecryptor | None:
    """StdDecryptor for the document, or None when it cannot be read
    without a real password (V5/AES-256, custom handlers, non-empty user
    password, malformed entries). ``resolve`` maps indirect refs."""
    try:
        filt = str(resolve(encrypt.get("Filter")))
        if filt != "Standard":
            return None
        v = resolve(encrypt.get("V", 0))
        r = resolve(encrypt.get("R", 0))
        if v not in (1, 2, 4) or r not in (2, 3, 4):
            return None
        o = resolve(encrypt.get("O"))
        u = resolve(encrypt.get("U"))
        p = resolve(encrypt.get("P"))
        if not isinstance(o, (bytes, bytearray)) or not isinstance(u, (bytes, bytearray)):
            return None
        if not isinstance(p, int):
            return None
        length_bits = resolve(encrypt.get("Length", 40))
        nbytes = int(length_bits) // 8 if isinstance(length_bits, int) else 5
        if r == 2 or v == 1:
            # V=1 means 40-bit RC4 by definition (ISO 32000-1 §7.6.1) —
            # a malformed file declaring a larger /Length would derive
            # the wrong key and needlessly fail the /U check
            nbytes = 5
        cfm = "V2"
        encrypt_metadata = resolve(encrypt.get("EncryptMetadata", True))
        if encrypt_metadata is None:
            encrypt_metadata = True
        if v == 4:
            cf = resolve(encrypt.get("CF")) or {}
            stmf = str(resolve(encrypt.get("StmF", "Identity")))
            if stmf == "Identity":
                # streams unencrypted (only strings/embedded files are):
                # the extractor reads streams, so pass them through
                return StdDecryptor(b"", "Identity")
            cfd = resolve(cf.get(stmf))
            if not isinstance(cfd, dict):
                return None
            cfm = str(resolve(cfd.get("CFM")))
            if cfm not in ("V2", "AESV2"):
                return None
            cflen = resolve(cfd.get("Length"))
            if isinstance(cflen, int):
                # crypt-filter /Length is defined in bytes but often
                # written in bits; normalize
                nbytes = cflen // 8 if cflen > 40 else cflen
            if cfm == "AESV2":
                nbytes = 16
        key = _file_key(bytes(o), p, id0, int(r), nbytes, bool(encrypt_metadata))
        if not _check_empty_user_password(key, bytes(u), id0, int(r)):
            return None
        return StdDecryptor(key, cfm)
    except Exception:
        return None
