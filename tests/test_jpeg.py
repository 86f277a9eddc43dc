"""Baseline JPEG decoder golden tests.

No codec library exists in this container to produce reference images,
so the tests drive the decoder with a from-scratch SPEC ENCODER (forward
orthonormal DCT, canonical Huffman tables built per T.81 Annex C, FF
byte stuffing, restart markers) plus analytic cases whose decoded output
is exact by construction (flat blocks are DC-only: quantized DC of a
constant-130 block is 16 with a unit table, and the IDCT of a lone DC
coefficient is exactly flat). The bit layer is therefore exercised in
both directions and the decoder's output is pinned to the numpy source,
not to itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from railgun_spark.operators.jpeg import _M, _ZIGZAG, decode_jpeg


# ---------------------------------------------------------------------------
# spec encoder (test-only)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend_inverse(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _build_table(symbols_used):
    """Canonical table: all used symbols at one length L with the
    all-ones code unassigned (count + 1 <= 2^L)."""
    syms = sorted(set(symbols_used)) or [0]
    L = max(2, (len(syms) + 1 - 1).bit_length())
    while (1 << L) < len(syms) + 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _block_symbols(zz, pred):
    """(dc_category, [(rs, extra_val, extra_bits)...]) for one block."""
    diff = int(zz[0]) - pred
    cat = _category(diff)
    dc = (cat, _extend_inverse(diff, cat))
    acs = []
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, _extend_inverse(v, s), s))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return dc, acs, int(zz[0])


def encode_jpeg(
    rgb: np.ndarray,
    qtab: np.ndarray | None = None,
    sampling=(1, 1),
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Minimal baseline encoder: YCbCr (or grayscale), `sampling` (hs, vs)
    applied to luma (chroma stays 1x1), one quant table for all
    components, canonical single-length Huffman tables."""
    h, w = rgb.shape[:2]
    q = np.ones(64, dtype="int32") if qtab is None else qtab.astype("int32")
    r, g, b = [rgb[:, :, c].astype("float64") for c in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    hs, vs = sampling
    comps = [(1, hs, vs, y)]
    if not grayscale:
        # chroma at 1x1: box-average down by (hs, vs)
        def sub(p):
            if hs == 1 and vs == 1:
                return p
            hh = -(-h // vs) * vs
            ww = -(-w // hs) * hs
            pad = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
            return pad.reshape(hh // vs, vs, ww // hs, hs).mean(axis=(1, 3))

        comps += [(2, 1, 1, sub(cb)), (3, 1, 1, sub(cr))]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every component plane to its MCU-covered size
    padded = []
    for cid, chs, cvs, plane in comps:
        ph, pw = mcus_y * cvs * 8, mcus_x * chs * 8
        plane = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
        )
        padded.append((cid, chs, cvs, plane))

    # quantized zigzag blocks in MCU-interleaved order
    def zz_block(plane, y0, x0):
        f = _M @ (plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ _M.T
        # zigzag: zz[i] = f[_ZIGZAG[i]], quantized
        return np.round(f.reshape(64)[_ZIGZAG] / q).astype("int64")

    n_mcus = mcus_x * mcus_y
    dc_syms, ac_syms = [], []
    pred = [0] * len(padded)
    tokens_all = []
    for m in range(n_mcus):
        if restart_interval and m % restart_interval == 0:
            pred = [0] * len(padded)
        my, mx = divmod(m, mcus_x)
        tokens = []
        for ci, (cid, chs, cvs, plane) in enumerate(padded):
            for by in range(cvs):
                for bx in range(chs):
                    zz = zz_block(plane, (my * cvs + by) * 8, (mx * chs + bx) * 8)
                    dc, acs, dcval = _block_symbols(zz, pred[ci])
                    pred[ci] = dcval
                    dc_syms.append(dc[0])
                    ac_syms += [a[0] for a in acs]
                    tokens.append((dc, acs))
        tokens_all.append(tokens)

    dc_counts, dc_symbols, dc_codes = _build_table(dc_syms)
    ac_counts, ac_symbols, ac_codes = _build_table(ac_syms)

    scan = bytearray()
    writer = _BitWriter()
    for m, tokens in enumerate(tokens_all):
        if restart_interval and m and m % restart_interval == 0:
            scan += writer.flush()
            scan += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            writer = _BitWriter()
        for (cat, extra), acs in tokens:
            L, code = dc_codes[cat]
            writer.write(code, L)
            if cat:
                writer.write(extra, cat)
            for rs, extra_v, extra_n in acs:
                L, code = ac_codes[rs]
                writer.write(code, L)
                if extra_n:
                    writer.write(extra_v, extra_n)
    scan += writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(padded)])
    for cid, chs, cvs, _ in padded:
        sof += bytes([cid, (chs << 4) | cvs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(padded)])
    for cid, *_ in padded:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
def test_flat_gray_is_exact():
    """A constant-130 image is DC-only with a unit quant table; the IDCT
    of a lone DC coefficient is exactly flat — decode must be EXACT."""
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (16, 24, 3)
    assert np.allclose(out, 130.0, atol=1e-9)


def test_random_rgb_roundtrip_unit_quant():
    """Unit quant table: the only loss is DCT float rounding (<1/2 per
    coefficient), so every pixel lands within a few levels."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (24, 17, 3)
    assert np.abs(out - img).max() < 6.0
    assert np.abs(out - img).mean() < 1.5


def test_quantized_roundtrip_tracks_table():
    """A coarse quant table loses more but stays bounded by the table."""
    rng = np.random.RandomState(11)
    img = rng.randint(60, 196, size=(32, 32, 3), dtype=np.uint8)
    q = np.full(64, 16, dtype="int32")
    out = decode_jpeg(encode_jpeg(img, qtab=q))
    # worst-case per-coefficient error q/2; smooth-ish bound empirically
    assert np.abs(out - img).mean() < 12.0


def test_chroma_subsampling_420():
    rng = np.random.RandomState(3)
    # smooth image so 2x2 chroma subsampling loses little
    base = rng.randint(0, 256, size=(4, 3, 3)).astype("float64")
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # 32x24
    out = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))
    assert out.shape == (32, 24, 3)
    assert np.abs(out - img).mean() < 3.0


def test_chroma_subsampling_422_odd_dims():
    rng = np.random.RandomState(7)
    base = rng.randint(40, 216, size=(3, 4, 3)).astype("float64")
    # odd HEIGHT exercises MCU padding+crop; color-cell width stays even
    # so horizontal 2:1 chroma pairs never straddle a color edge (edge
    # straddle loss is inherent to subsampling, not a decode defect)
    img = np.kron(base, np.ones((7, 4, 1))).astype(np.uint8)  # 21x16
    out = decode_jpeg(encode_jpeg(img, sampling=(2, 1)))
    assert out.shape == (21, 16, 3)
    assert np.abs(out - img).mean() < 3.0


def test_restart_markers():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img))
    with_rst = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert np.allclose(plain, with_rst)


def test_grayscale_single_component():
    rng = np.random.RandomState(17)
    g = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    img = np.dstack([g, g, g])
    out = decode_jpeg(encode_jpeg(img, grayscale=True))
    assert out.shape == (16, 16, 3)
    assert np.abs(out - g[:, :, None]).max() < 6.0


def test_refusals():
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(img)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    # flip SOF0 -> SOF2 (progressive)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # truncated scan: cut well into the entropy data
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: len(good) - (len(good) - good.find(b"\xff\xda")) // 2])
    # 12-bit precision refused
    i = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad))


def test_decode_image_dispatch_and_pipeline(spark):
    """JPEG routes through decode_image and the Arrow pipeline with
    require_real=True, features matching the direct decode."""
    from railgun_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        extract_features,
    )

    rng = np.random.RandomState(23)
    base = rng.randint(0, 256, size=(2, 2, 3)).astype("float64")
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    jpg = encode_jpeg(img)
    d = decode_image(jpg, "image")
    assert (d["width"], d["height"]) == (16, 16)
    assert abs(d["feature"][3] - img.mean()) < 2.0

    df = spark.createDataFrame([(1, "image", bytearray(jpg), {})], MEDIA_SCHEMA)
    row = extract_features(df, decoder=decode_image, require_real=True).collect()[0]
    assert np.allclose(row["feature"], d["feature"], atol=1e-4)
