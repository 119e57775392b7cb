"""AES-128 kernel (kernels/aes128.py) — pinned to the public FIPS-197
test vector (Appendix C.1), plus CBC layout and padding contracts."""

from __future__ import annotations

import pytest

from docling_graph_spark.kernels import aes128 as A

KEY = bytes(range(16))
PT = bytes.fromhex("00112233445566778899aabbccddeeff")
CT = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_fips197_appendix_c1_vector():
    assert A.encrypt_block(KEY, PT) == CT
    assert A.decrypt_block(KEY, CT) == PT


def test_cbc_roundtrip_various_lengths():
    for n in (0, 1, 15, 16, 17, 100, 4096):
        data = bytes((i * 7) % 256 for i in range(n))
        enc = A.cbc_encrypt(KEY, bytes(16), data)
        assert len(enc) % 16 == 0 and len(enc) >= 32
        assert A.cbc_decrypt(KEY, enc) == data


def test_cbc_rejects_malformed():
    with pytest.raises(ValueError, match="length"):
        A.cbc_decrypt(KEY, b"short")
    with pytest.raises(ValueError, match="length"):
        A.cbc_decrypt(KEY, bytes(33))
    good = A.cbc_encrypt(KEY, bytes(16), b"hello")
    bad = good[:-16] + bytes(16)  # destroy the padding block
    with pytest.raises(ValueError):
        A.cbc_decrypt(KEY, bad)


def test_sbox_is_a_computed_involution_pair():
    assert sorted(A._SBOX) == list(range(256))
    assert all(A._INV_SBOX[A._SBOX[x]] == x for x in range(256))
    assert A._SBOX[0x00] == 0x63 and A._SBOX[0x53] == 0xED
