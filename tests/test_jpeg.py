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


def _sig(v: int) -> int:
    return 1 if v >= 0 else -1


class _Collector:
    """Pass 1: record Huffman symbols; ignore raw bits."""

    def __init__(self):
        self.dc: list[int] = []
        self.ac: list[int] = []

    def sym_dc(self, v):
        self.dc.append(v)

    def sym_ac(self, v):
        self.ac.append(v)

    def bits(self, v, n):
        pass


class _CodeWriter:
    """Pass 2: emit real codes through a _BitWriter."""

    def __init__(self, bw, dc_codes, ac_codes):
        self.bw, self.dc_codes, self.ac_codes = bw, dc_codes, ac_codes

    def sym_dc(self, v):
        L, c = self.dc_codes[v]
        self.bw.write(c, L)

    def sym_ac(self, v):
        L, c = self.ac_codes[v]
        self.bw.write(c, L)

    def bits(self, v, n):
        if n:
            self.bw.write(v & ((1 << n) - 1), n)


def _scan_units(comp_idxs, comps_meta, geom):
    hmax, vmax, mcus_x, mcus_y, w, h = geom
    if len(comp_idxs) > 1:
        return mcus_x * mcus_y, None
    ci = comp_idxs[0]
    _, hs, vs, _ = comps_meta[ci]
    comp_w = -(-w * hs // hmax)
    comp_h = -(-h * vs // vmax)
    cbw, cbh = -(-comp_w // 8), -(-comp_h // 8)
    return cbw * cbh, cbw


def _emit_interval(out, coefs, comps_meta, scan, geom, unit_lo, unit_hi, cbw):
    """Emit entropy symbols for units [unit_lo, unit_hi) of one restart
    interval — DC first/refine, AC first (with EOB runs), AC refine
    (with buffered correction bits), mirroring the decoder exactly."""
    comp_idxs, ss, se, ah, al = scan
    hmax, vmax, mcus_x, mcus_y, w, h = geom
    band_lo = max(ss, 1)
    pred = {ci: 0 for ci in comp_idxs}
    eobrun = 0
    pending: list[int] = []  # buffered refinement correction bits
    allow_runs = ss > 0 and ah == 0  # progressive AC first scans

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            n = min(eobrun, 32767)
            r = n.bit_length() - 1
            out.sym_ac(r << 4)
            out.bits(n - (1 << r), r)
            for bit in pending:
                out.bits(bit, 1)
            pending.clear()
            eobrun -= n

    def dc_block(ci, blk):
        if ah == 0:
            v = int(blk[0]) >> al  # DC point transform: arithmetic shift
            diff = v - pred[ci]
            pred[ci] = v
            cat = _category(diff)
            out.sym_dc(cat)
            out.bits(_extend_inverse(diff, cat), cat)
        else:
            out.bits((int(blk[0]) >> al) & 1, 1)

    def ac_first_block(blk):
        nonlocal eobrun
        vals = [_sig(int(blk[k])) * (abs(int(blk[k])) >> al) for k in range(band_lo, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            if allow_runs:
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
            else:
                out.sym_ac(0x00)
            return
        flush_eob()
        run = 0
        for i, v in enumerate(vals):
            if i > nz[-1]:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                out.sym_ac(0xF0)
                run -= 16
            s = _category(v)
            out.sym_ac((run << 4) | s)
            out.bits(_extend_inverse(v, s), s)
            run = 0
        if nz[-1] < len(vals) - 1:  # trailing zeros: EOB territory
            if allow_runs:
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
            else:
                out.sym_ac(0x00)

    def ac_refine_block(blk):
        nonlocal eobrun
        ks = list(range(band_lo, se + 1))
        was_sig = {k: (abs(int(blk[k])) >> (al + 1)) != 0 for k in ks}
        now_mag = {k: abs(int(blk[k])) >> al for k in ks}
        newly = [k for k in ks if not was_sig[k] and now_mag[k] == 1]

        def corr(krange):
            return [now_mag[k] & 1 for k in krange if was_sig[k]]

        if not newly:
            eobrun += 1
            pending.extend(corr(ks))
            if eobrun == 32767:
                flush_eob()
            return
        flush_eob()
        run = 0
        seg_corr: list[int] = []
        pos = 0
        for k in ks:
            if k > newly[-1]:
                break
            if was_sig[k]:
                seg_corr.append(now_mag[k] & 1)
            elif now_mag[k] == 1:  # newly significant
                out.sym_ac((run << 4) | 1)
                out.bits(1 if int(blk[k]) > 0 else 0, 1)
                for bit in seg_corr:
                    out.bits(bit, 1)
                seg_corr = []
                run = 0
            else:  # zero history, stays zero
                run += 1
                if run == 16:
                    out.sym_ac(0xF0)
                    for bit in seg_corr:
                        out.bits(bit, 1)
                    seg_corr = []
                    run = 0
            pos += 1
        tail = [k for k in ks if k > newly[-1]]
        if tail:
            eobrun += 1
            pending.extend(corr(tail))
            if eobrun == 32767:
                flush_eob()

    for unit in range(unit_lo, unit_hi):
        if len(comp_idxs) > 1:  # interleaved MCU
            my, mx = divmod(unit, mcus_x)
            for ci in comp_idxs:
                _, hs, vs, _ = comps_meta[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = coefs[ci][my * vs + by][mx * hs + bx]
                        if ss == 0:
                            dc_block(ci, blk)
                        if se >= band_lo and se >= 1:
                            (ac_first_block if ah == 0 else ac_refine_block)(blk)
        else:
            ci = comp_idxs[0]
            by, bx = divmod(unit, cbw)
            blk = coefs[ci][by][bx]
            if ss == 0:
                dc_block(ci, blk)
            if se >= band_lo and se >= 1:
                (ac_first_block if ah == 0 else ac_refine_block)(blk)
    flush_eob()


def encode_jpeg(
    rgb: np.ndarray,
    qtab: np.ndarray | None = None,
    sampling=(1, 1),
    restart_interval: int = 0,
    grayscale: bool = False,
    scans=None,
) -> bytes:
    """Spec encoder: baseline (scans=None -> SOF0, one interleaved
    full-spectrum scan) or progressive (SOF2 with an explicit scan list
    of (comp_indices, Ss, Se, Ah, Al)). YCbCr (or grayscale), `sampling`
    (hs, vs) on luma, one quant table, canonical single-length Huffman
    tables rebuilt per scan."""
    h, w = rgb.shape[:2]
    q = np.ones(64, dtype="int32") if qtab is None else qtab.astype("int32")
    r, g, b = [rgb[:, :, c].astype("float64") for c in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    hs, vs = sampling
    comps = [(1, hs, vs, y)]
    if not grayscale:
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
    geom = (hmax, vmax, mcus_x, mcus_y, w, h)

    comps_meta = []
    coefs = []  # per comp: [by][bx] -> zigzag int array
    for cid, chs, cvs, plane in comps:
        ph, pw = mcus_y * cvs * 8, mcus_x * chs * 8
        plane = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
        )
        grid = []
        for by in range(ph // 8):
            row = []
            for bx in range(pw // 8):
                f = _M @ (plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ _M.T
                row.append(np.round(f.reshape(64)[_ZIGZAG] / q).astype("int64"))
            grid.append(row)
        coefs.append(grid)
        comps_meta.append((cid, chs, cvs, 0))

    if scans is None:
        scans = [(list(range(len(comps))), 0, 63, 0, 0)]
        sof_marker = 0xC0
    else:
        sof_marker = 0xC2

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, chs, cvs, _ in comps_meta:
        sof += bytes([cid, (chs << 4) | cvs, 0])
    out += seg(sof_marker, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for scan in scans:
        comp_idxs, ss, se, ah, al = scan
        n_units, cbw = _scan_units(comp_idxs, comps_meta, geom)
        per = restart_interval if restart_interval else n_units

        col = _Collector()
        unit = 0
        while unit < n_units:
            hi = min(unit + per, n_units)
            _emit_interval(col, coefs, comps_meta, scan, geom, unit, hi, cbw)
            unit = hi
        dc_counts, dc_symbols, dc_codes = _build_table(col.dc)
        ac_counts, ac_symbols, ac_codes = _build_table(col.ac)
        if col.dc:
            out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
        if col.ac:
            out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)

        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([comps_meta[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)

        scan_bytes = bytearray()
        unit = 0
        n_int = 0
        bw = _BitWriter()
        writer = _CodeWriter(bw, dc_codes, ac_codes)
        while unit < n_units:
            hi = min(unit + per, n_units)
            _emit_interval(writer, coefs, comps_meta, scan, geom, unit, hi, cbw)
            unit = hi
            if unit < n_units:
                scan_bytes += bw.flush()
                scan_bytes += bytes([0xFF, 0xD0 + (n_int % 8)])
                n_int += 1
                bw = _BitWriter()
                writer = _CodeWriter(bw, dc_codes, ac_codes)
        scan_bytes += bw.flush()
        out += scan_bytes

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
    # SOF3 (lossless) refused
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(ValueError, match="lossless|SOF3"):
        decode_jpeg(lossless)
    # truncated scan: cut well into the entropy data
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: len(good) - (len(good) - good.find(b"\xff\xda")) // 2])
    # 12-bit precision refused
    i = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad))


def test_eobn_refused_in_sequential_scan():
    """EOBn symbols (s==0, 0<r<15) are spec-defined only for progressive
    scans (G.1.2.2); a sequential baseline scan emitting one is corrupt
    data and must refuse, not decode garbage (baseline has no CRC)."""
    from railgun_spark.operators.jpeg import _ScanState, _decode_ac_first

    class _Tbl:
        def __init__(self, syms):
            self.syms = list(syms)

        def decode(self, reader):
            return self.syms.pop(0)

    class _Rdr:
        def bits(self, n):
            return 0

        def bit(self):
            return 0

    coef = [0] * 64
    # EOB2 (rs=0x20): legal in progressive — sets an end-of-band run
    st = _ScanState(1)
    _decode_ac_first(_Rdr(), _Tbl([0x20]), st, coef, 1, 63, 0, progressive=True)
    assert st.eobrun == (1 << 2) - 1
    # the same symbol in a sequential scan is refused
    with pytest.raises(ValueError, match="EOBn.*sequential"):
        _decode_ac_first(
            _Rdr(), _Tbl([0x20]), _ScanState(1), [0] * 64, 1, 63, 0,
            progressive=False,
        )
    # plain EOB (rs=0x00) stays legal in sequential scans
    st = _ScanState(1)
    _decode_ac_first(_Rdr(), _Tbl([0x00]), st, [0] * 64, 1, 63, 0, progressive=False)
    assert st.eobrun == 0


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


def _spectral_scans(ncomps):
    """Spectral-selection-only progressive: DC scan, then per-component
    AC bands split in two."""
    scans = [(list(range(ncomps)), 0, 0, 0, 0)]
    for ci in range(ncomps):
        scans += [([ci], 1, 5, 0, 0), ([ci], 6, 63, 0, 0)]
    return scans


def _successive_scans(ncomps):
    """Full progressive: DC and AC first scans at Al=1, then refinement
    scans down to Al=0 — exercises DC refine, AC refine with newly-
    significant coeffs, correction bits, ZRL, and EOB runs."""
    scans = [(list(range(ncomps)), 0, 0, 0, 1)]
    for ci in range(ncomps):
        scans.append(([ci], 1, 63, 0, 1))
    scans.append((list(range(ncomps)), 0, 0, 1, 0))
    for ci in range(ncomps):
        scans.append(([ci], 1, 63, 1, 0))
    return scans


def test_progressive_spectral_equals_baseline():
    """Spectral-selection-only progressive must reconstruct EXACTLY the
    same coefficients as baseline: pixel-identical output."""
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg(img, scans=_spectral_scans(3)))
    assert np.array_equal(base, prog)
    assert np.abs(prog - img).max() < 6.0


def test_progressive_successive_approximation_equals_baseline():
    rng = np.random.RandomState(37)
    img = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg(img, scans=_successive_scans(3)))
    assert np.array_equal(base, prog)


def test_progressive_successive_two_levels():
    """Two refinement levels (Al=2 -> 1 -> 0) with a coarse quant table:
    small coefficients only become significant in late scans, exercising
    the EOB-run + buffered-correction paths hard."""
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    q = np.full(64, 8, dtype="int32")
    scans = [([0, 1, 2], 0, 0, 0, 2)]
    scans += [([ci], 1, 63, 0, 2) for ci in range(3)]
    scans += [([0, 1, 2], 0, 0, 2, 1)]
    scans += [([ci], 1, 63, 2, 1) for ci in range(3)]
    scans += [([0, 1, 2], 0, 0, 1, 0)]
    scans += [([ci], 1, 63, 1, 0) for ci in range(3)]
    base = decode_jpeg(encode_jpeg(img, qtab=q))
    prog = decode_jpeg(encode_jpeg(img, qtab=q, scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_subsampled_and_grayscale():
    """4:2:0 progressive exercises the per-component (non-padded) block
    raster of non-interleaved AC scans; grayscale the 1-component path."""
    rng = np.random.RandomState(43)
    base_img = rng.randint(0, 256, size=(3, 4, 3)).astype("float64")
    img = np.kron(base_img, np.ones((8, 8, 1))).astype(np.uint8)  # 24x32
    b420 = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))
    p420 = decode_jpeg(encode_jpeg(img, sampling=(2, 2), scans=_successive_scans(3)))
    assert np.array_equal(b420, p420)

    g = rng.randint(0, 256, size=(21, 10), dtype=np.uint8)
    gimg = np.dstack([g, g, g])
    bg = decode_jpeg(encode_jpeg(gimg, grayscale=True))
    pg = decode_jpeg(
        encode_jpeg(gimg, grayscale=True, scans=_successive_scans(1))
    )
    assert np.array_equal(bg, pg)


def test_progressive_with_restarts():
    rng = np.random.RandomState(47)
    img = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, scans=_successive_scans(3)))
    rst = decode_jpeg(
        encode_jpeg(img, scans=_successive_scans(3), restart_interval=3)
    )
    assert np.array_equal(plain, rst)


def test_progressive_truncated_scan_refused():
    rng = np.random.RandomState(53)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    prog = encode_jpeg(img, scans=_spectral_scans(3))
    # cut mid-way through the final AC scan's entropy data
    with pytest.raises(ValueError, match="truncated|missing EOI"):
        decode_jpeg(prog[: len(prog) - 30])


def _make_mjpeg_avi():
    """(avi bytes, source grays) — a 5-frame Motion-JPEG AVI built from
    the library's own JPEG encoder; shared by the decode and
    frame-sampling tests."""
    import struct

    from railgun_spark.operators.jpeg import encode_gray_jpeg

    rng = np.random.RandomState(61)
    w, h, n_frames = 16, 8, 5
    grays = [rng.randint(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n_frames)]
    jpgs = [encode_gray_jpeg(g) for g in grays]

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<IIIIIIIIII", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", j) for j in jpgs))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    return avi, grays


def test_mjpeg_avi_decode():
    """Motion-JPEG AVI: RIFF walking, avih dims/fps, per-frame decode
    through the library's own JPEG codec, Y4M-shaped luma features;
    non-JPEG frames and truncations refused."""
    import struct

    from railgun_spark.operators.multimodal import (
        decode_avi_mjpeg,
        decode_video,
    )

    avi, grays = _make_mjpeg_avi()
    w, h, n_frames = 16, 8, 5

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<IIIIIIIIII", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))

    d = decode_avi_mjpeg(avi)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, n_frames)
    assert abs(d["fps"] - 25.0) < 1e-9
    # luma of a grayscale JPEG ~= the source gray (unit quant table)
    for k in range(4):
        assert abs(d["feature"][k] - grays[k].mean()) < 2.0
    assert decode_video(avi)["feature"] == d["feature"]

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(avi[:-30])
    # a non-JPEG frame is refused with the codec hint
    bad_movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\x00\x01raw-dib"))
    bad_body = b"AVI " + hdrl + bad_movi
    bad = b"RIFF" + struct.pack("<I", len(bad_body)) + bad_body
    with pytest.raises(ValueError, match="not JPEG"):
        decode_avi_mjpeg(bad)


def test_mjpeg_avi_frame_sampling(spark):
    """sample_frames_y4m's AVI branch: only every_n-th chunk is
    JPEG-decoded; luma means track the source grays."""
    from railgun_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames_y4m,
    )

    avi, grays = _make_mjpeg_avi()
    df = spark.createDataFrame([(9, "video", bytearray(avi), {})], MEDIA_SCHEMA)
    rows = {r["frame_idx"]: r["luma_mean"]
            for r in sample_frames_y4m(df, every_n=2).collect()}
    assert set(rows) == {0, 2, 4}
    for k in rows:
        assert abs(rows[k] - grays[k].mean()) < 2.0


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    split=st.integers(1, 62),
    ladder=st.sampled_from([(0,), (1, 0), (2, 1, 0)]),
    sampling=st.sampled_from([(1, 1), (2, 2)]),
    restart=st.sampled_from([0, 2]),
    qstep=st.sampled_from([1, 4, 16]),
)
def test_progressive_random_scan_scripts(seed, split, ladder, sampling,
                                         restart, qstep):
    """Random progressive scan scripts — spectral band split at any
    coefficient, successive-approximation ladders down to Al=0, both
    samplings, restart intervals, coarse/fine quant — must reconstruct
    EXACTLY the baseline decode of the same image."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    q = np.full(64, qstep, dtype="int32")

    scans = []
    first_al = ladder[0]
    scans.append(([0, 1, 2], 0, 0, 0, first_al))  # DC first
    for ci in range(3):  # AC first scans, band split at `split`
        scans.append(([ci], 1, split, 0, first_al))
        if split < 63:
            scans.append(([ci], split + 1, 63, 0, first_al))
    for prev_al, al in zip(ladder, ladder[1:]):  # refinement ladder
        scans.append(([0, 1, 2], 0, 0, prev_al, al))
        for ci in range(3):
            scans.append(([ci], 1, 63, prev_al, al))

    base = decode_jpeg(encode_jpeg(img, qtab=q, sampling=sampling,
                                   restart_interval=restart))
    prog = decode_jpeg(encode_jpeg(img, qtab=q, sampling=sampling,
                                   restart_interval=restart, scans=scans))
    assert np.array_equal(base, prog)
