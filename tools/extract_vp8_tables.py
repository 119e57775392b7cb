#!/usr/bin/env python
"""Transcribe the two public VP8 probability constant tables
(RFC 6386 §13.4 coeff_update_probs and §13.5 default_coeff_probs,
each [4][8][3][11] uint8) out of the system libwebp's .rodata into
`docling_graph_spark/kernels/vp8_tables.py` as literals.

The values are published in RFC 6386 (and in every VP8 implementation);
reading them from the installed library is just a transcription
mechanism that avoids hand-copying 2112 digits — the generated module
is then frozen and carries no runtime dependency on libwebp.  The
offsets below were located by structural scan (each table is a
1056-byte zero-free window; the update table is ~85% 0xFF) and then
FUNCTIONALLY verified: streams whose update flags / default-prob
tokens are coded under the extracted tables decode bit-exactly in
libwebp (tests/parity/test_vp8_libwebp.py re-runs that proof whenever
the library is importable).
"""

import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"


def rodata(path: str) -> "tuple[bytes, int]":
    data = open(path, "rb").read()
    assert data[:4] == b"\x7fELF"
    shoff = struct.unpack_from("<Q", data, 0x28)[0]
    shentsize = struct.unpack_from("<H", data, 0x3A)[0]
    shnum = struct.unpack_from("<H", data, 0x3C)[0]
    shstrndx = struct.unpack_from("<H", data, 0x3E)[0]
    secs = []
    for i in range(shnum):
        off = shoff + i * shentsize
        name_off = struct.unpack_from("<I", data, off)[0]
        s_off = struct.unpack_from("<Q", data, off + 0x18)[0]
        s_size = struct.unpack_from("<Q", data, off + 0x20)[0]
        secs.append((name_off, s_off, s_size))
    str_off = secs[shstrndx][1]

    def name(noff):
        e = data.index(b"\x00", str_off + noff)
        return data[str_off + noff:e].decode()

    for noff, o, sz in secs:
        if name(noff) == ".rodata":
            return data[o:o + sz], o
    raise SystemExit("no .rodata section")


def find_tables(ro: bytes) -> "tuple[int, int, int]":
    """(update_off, bmode_off, default_off) within .rodata, laid out
    as tree_dec.c defines them: CoeffsUpdateProba (1056 bytes, ~85%
    0xFF, zero-free) immediately followed by kBModesProba (900 =
    10*10*9 bytes, zero-free), then after alignment padding
    CoeffsProba0 (1056 bytes, zero-free, few 0xFF)."""
    N = 1056
    for i in range(len(ro) - N + 1):
        w = ro[i:i + N]
        if 0 in w or w.count(255) <= 700:
            continue
        bm = ro[i + N:i + N + 900]
        if 0 in bm:
            continue
        # default table: next zero-free 1056 window within 256 bytes
        for j in range(i + N + 900, i + N + 900 + 256):
            d = ro[j:j + N]
            if len(d) == N and 0 not in d and d.count(255) < 700:
                return i, i + N, j
        continue
    raise SystemExit("table triple not found")


def to_nested(raw: bytes):
    it = iter(raw)
    return [[[[next(it) for _ in range(11)] for _ in range(3)]
             for _ in range(8)] for _ in range(4)]


def to_bmode(raw: bytes):
    it = iter(raw)
    lib = [[[next(it) for _ in range(9)] for _ in range(10)]
           for _ in range(10)]
    # libwebp's B-mode enum orders RD/VR/LD differently from RFC 6386
    # §11.2 (lib: 4=RD,5=VR,6=LD; RFC: 4=LD,5=RD,6=VR) — re-index the
    # context axes into RFC order (verified bit-exact: the permuted
    # table gives full bpred parity against libwebp, the identity and
    # the other 3-cycle do not)
    q = {0: 0, 1: 1, 2: 2, 3: 3, 4: 6, 5: 4, 6: 5, 7: 7, 8: 8, 9: 9}
    return [[lib[q[a]][q[l]] for l in range(10)] for a in range(10)]


def main() -> None:
    ro, base = rodata(LIB)
    u_off, b_off, d_off = find_tables(ro)
    sys.stderr.write(f"update @ .rodata+{u_off}, bmode @ +{b_off}, "
                     f"default @ +{d_off}\n")
    upd = to_nested(ro[u_off:u_off + 1056])
    bmode = to_bmode(ro[b_off:b_off + 900])
    def_ = to_nested(ro[d_off:d_off + 1056])

    def fmt(t, name):
        def rec(node, ind):
            if isinstance(node[0], int):
                return ind + repr(node).replace(" ", "") + ","
            return (ind + "[\n"
                    + "\n".join(rec(ch, ind + "    ") for ch in node)
                    + "\n" + ind + "],")
        body = "\n".join(rec(ch, "    ") for ch in t)
        return f"{name} = [\n{body}\n]"

    out = (
        '"""VP8 constant probability tables (RFC 6386 §13.4/'
        '§13.5).\n\nPublic normative constants: '
        'COEFF_UPDATE_PROBS codes the per-probability\nupdate flags '
        'of every frame header, DEFAULT_COEFF_PROBS is the\n'
        'token-probability state each key frame starts from.  '
        'Transcribed by\ntools/extract_vp8_tables.py and functionally '
        'verified bit-exact\nagainst libwebp '
        '(tests/parity/test_vp8_libwebp.py); frozen here with\nno '
        'runtime dependency on the library.\n"""\n\n'
        + fmt(upd, "COEFF_UPDATE_PROBS") + "\n\n"
        + fmt(def_, "DEFAULT_COEFF_PROBS") + "\n\n"
        + fmt(bmode, "KF_BMODE_PROBS") + "\n")
    path = "docling_graph_spark/kernels/vp8_tables.py"
    open(path, "w").write(out)
    sys.stderr.write(f"wrote {path}\n")


if __name__ == "__main__":
    main()
