"""AES-128/256 block cipher + CBC modes — pure Python, stdlib only.

Exists for one consumer: AES-encrypted PDFs
(kernels/pdf_parse._maybe_decrypt) — AESV2 (V4: AES-128-CBC streams
under MD5-derived sAlT-ed per-object keys) and AESV3 (V5/R6: AES-256
streams under the file key, with the no-padding CBC variants the
Algorithm-2.A/2.B key derivation needs).  Implemented from the public
FIPS-197 specification;
the S-box and its inverse are COMPUTED from the GF(2^8) multiplicative
inverse + affine map at import (no hand-typed tables to mistype), and
the forward cipher exists so fixtures can encrypt what tests decrypt.

Performance note: this is a fixture/decode-path cipher for payloads in
an Arrow batch, not a bulk-crypto library — ~1 MB/s pure Python is
fine for content streams (capped at 64 MiB by the PDF stream guard).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox():
    # multiplicative inverses in GF(2^8)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    # affine map: bit_j(s) = b_j ^ b_{j+4} ^ b_{j+5} ^ b_{j+6} ^
    # b_{j+7} ^ c_j with c = 0x63
    sbox = [0] * 256
    for x in range(256):
        c = inv[x]
        s = 0
        for j in range(8):
            bit = ((c >> j) & 1) ^ ((c >> ((j + 4) % 8)) & 1) \
                ^ ((c >> ((j + 5) % 8)) & 1) \
                ^ ((c >> ((j + 6) % 8)) & 1) \
                ^ ((c >> ((j + 7) % 8)) & 1) ^ ((0x63 >> j) & 1)
            s |= bit << j
        sbox[x] = s
    inv_sbox = [0] * 256
    for x, s in enumerate(sbox):
        inv_sbox[s] = x
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


@lru_cache(maxsize=64)
def _expand_key(key: bytes) -> List[List[int]]:
    """Cached: CBC runs call the block cipher once per 16 bytes with
    the same key — re-deriving the schedule per block dominated the
    pure-Python cost."""
    nk = len(key) // 4
    assert nk in (4, 8)
    nr = 10 if nk == 4 else 14
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(st, rk):
    return [a ^ b for a, b in zip(st, rk)]


def _shift_rows(st):
    out = list(st)
    for r in range(1, 4):
        row = [st[r + 4 * c] for c in range(4)]
        row = row[r:] + row[:r]
        for c in range(4):
            out[r + 4 * c] = row[c]
    return out


def _inv_shift_rows(st):
    out = list(st)
    for r in range(1, 4):
        row = [st[r + 4 * c] for c in range(4)]
        row = row[-r:] + row[:-r]
        for c in range(4):
            out[r + 4 * c] = row[c]
    return out


def _mix_columns(st, inverse=False):
    m = ([0x0E, 0x0B, 0x0D, 0x09] if inverse
         else [0x02, 0x03, 0x01, 0x01])
    out = [0] * 16
    for c in range(4):
        col = st[4 * c:4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (_gf_mul(col[0], m[(0 - r) % 4])
                              ^ _gf_mul(col[1], m[(1 - r) % 4])
                              ^ _gf_mul(col[2], m[(2 - r) % 4])
                              ^ _gf_mul(col[3], m[(3 - r) % 4]))
    return out


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    nr = len(rks) - 1
    st = _add_round_key(list(block), rks[0])
    for rnd in range(1, nr):
        st = [_SBOX[b] for b in st]
        st = _shift_rows(st)
        st = _mix_columns(st)
        st = _add_round_key(st, rks[rnd])
    st = [_SBOX[b] for b in st]
    st = _shift_rows(st)
    st = _add_round_key(st, rks[nr])
    return bytes(st)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    nr = len(rks) - 1
    st = _add_round_key(list(block), rks[nr])
    for rnd in range(nr - 1, 0, -1):
        st = _inv_shift_rows(st)
        st = [_INV_SBOX[b] for b in st]
        st = _add_round_key(st, rks[rnd])
        st = _mix_columns(st, inverse=True)
    st = _inv_shift_rows(st)
    st = [_INV_SBOX[b] for b in st]
    st = _add_round_key(st, rks[0])
    return bytes(st)


def cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC with a 16-byte IV prefix and PKCS#7 padding — the
    PDF AESV2 stream layout.  Raises ValueError on malformed input."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i:i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk),
                                           prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])


def cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Fixture-side inverse of :func:`cbc_decrypt`."""
    pad = 16 - len(plain) % 16
    plain = plain + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i:i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Raw CBC (no padding, no IV prefix) — the PDF R6 key-wrapping
    primitive (UE/OE entries and the 2.B hash rounds)."""
    assert len(plain) % 16 == 0
    out = bytearray()
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i:i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    assert len(data) % 16 == 0
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk),
                                           prev))
        prev = blk
    return bytes(out)
