"""JPEG (ITU-T T.81 / ISO 10918-1) decoder — stdlib + numpy.

Covers the dominant interchange subsets: baseline sequential DCT (SOF0,
plus SOF1 extended-sequential at 8-bit) AND progressive DCT (SOF2) with
both spectral selection and successive approximation; 8-bit samples,
Huffman entropy coding, 1 or 3 components, chroma subsampling up to 2x2
(4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers, multi-scan files with
between-scan DHT redefinition, JFIF/EXIF APPn segments. Refused loudly
(same honesty discipline as the PPM/BMP/PNG/WAV/Y4M decoders —
truncation is an error, never padding): lossless/hierarchical SOFs,
arithmetic coding, 12-bit precision, 4-component CMYK, sampling factors
above 2.

Structure (all from the public spec):
  - marker walk: DQT (quant tables), DHT (Huffman code lengths+symbols,
    spec Annex C canonical code construction), SOF (dims + per-component
    sampling/quant ids), DRI (restart interval), then one SOS per scan —
    each scan's entropy data is decoded as it is encountered into a
    per-component COEFFICIENT store (baseline is the degenerate single
    full-spectrum scan of the same machinery).
  - scan bytes are de-stuffed (FF 00 -> FF) and split at RSTn markers;
    each restart interval decodes independently with DC predictors and
    the EOB-run counter reset.
  - progressive semantics per spec G.1.2: DC first scans code diffs of
    point-transformed values, DC refinement appends one bit per block;
    AC first scans code a spectral band with EOBn run codes; AC
    refinement delivers newly-significant +-1<<Al coefficients plus
    correction bits for every nonzero coefficient crossed.
  - after all scans: dezigzag, dequantize, batched 8x8 IDCT as two
    orthonormal-DCT matrix multiplies (exact float, no fixed-point
    approximation), +128 level shift.
  - chroma planes upsample by sample replication; BT.601 YCbCr -> RGB.

The decoder is deliberately plain Python per-symbol Huffman decoding —
correct and testable; decode happens inside Arrow batches where the
surrounding pipeline is already Python, and typical thumbnails decode in
milliseconds. Golden tests drive it with a from-scratch spec encoder
(forward DCT + Annex K tables) plus analytic DC-only cases, so the bit
layer is exercised in both directions.
"""

from __future__ import annotations

import struct

import numpy as np

# spec Figure A.6 zigzag: ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ_ORDER = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_ZIGZAG = np.array(_ZZ_ORDER)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: forward F = M @ f @ M.T, inverse
    f = M.T @ F @ M — the exact float form of the spec's A.3.3 FDCT/IDCT."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    M = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


_M = _dct_matrix()


class _HuffTable:
    """Canonical Huffman table (spec Annex C): codes of each length are
    consecutive, starting from (prev_start + count) << 1 per extra bit."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code in scan data")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitpos = 0

    def bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan data")
        b = (self.data[self.pos] >> (7 - self.bitpos)) & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.bitpos = 0
            self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, category: int) -> int:
    """Spec F.2.2.1 EXTEND: map `category` received bits to a signed value."""
    if category == 0:
        return 0
    if v < (1 << (category - 1)):
        return v - (1 << category) + 1
    return v


def _destuff_and_split(b: bytes, start: int) -> tuple[list[bytes], int]:
    """From `start`, remove FF00 stuffing and split the entropy-coded
    data at RSTn markers into independently-decodable restart intervals.
    Returns (intervals, position of the terminating marker's 0xFF)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i, n = start, len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = b[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next marker (EOI, next SOS header, DHT, ...): scan ends
            break
    intervals.append(bytes(cur))
    return intervals, i


class _ScanState:
    """Entropy state shared across one scan's blocks: DC predictors per
    scan-component and the progressive end-of-band run counter."""

    def __init__(self, n_comps: int):
        self.pred = [0] * n_comps
        self.eobrun = 0

    def reset(self):
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _decode_dc(reader, table, state, si, coef, ah, al):
    if ah == 0:  # first DC scan: category + diff bits, scaled by Al
        cat = table.decode(reader)
        if cat > 11:
            raise ValueError(f"bad JPEG DC category {cat}")
        state.pred[si] += _extend(reader.bits(cat), cat)
        coef[0] = state.pred[si] << al
    else:  # refinement: one bit appends 1<<Al
        if reader.bit():
            coef[0] |= 1 << al


def _refine_nonzero(reader, coef, k, al):
    """Correction bit for an already-nonzero coefficient (spec G.1.2.3):
    a 1-bit moves the magnitude toward the next level if that bit is not
    already set."""
    if reader.bit() and (coef[k] & (1 << al)) == 0:
        coef[k] += (1 << al) if coef[k] > 0 else -(1 << al)


def _decode_ac_first(reader, table, state, coef, ss, se, al, progressive):
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = table.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            # EOBn (run of 2^r + extra end-of-band blocks) exists only in
            # progressive scans; in sequential baseline the sole legal
            # s==0 codes are EOB (r==0) and ZRL (r==15) — spec F.1.2.2 vs
            # G.1.2.2. JPEG has no frame CRC, so accepting 0<r<15 here
            # would decode corrupt baseline data to garbage coefficients
            # instead of refusing.
            if r and not progressive:
                raise ValueError(
                    f"EOBn symbol (r={r}) in a sequential JPEG scan"
                )
            state.eobrun = (1 << r) + (reader.bits(r) if r else 0) - 1
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        coef[k] = _extend(reader.bits(s), s) << al
        k += 1


def _decode_ac_refine(reader, table, state, coef, ss, se, al):
    """Progressive AC successive-approximation refinement (G.1.2.3):
    newly-significant coefficients arrive as +-1<<Al; every nonzero
    coefficient crossed on the way receives a correction bit."""
    if state.eobrun > 0:
        state.eobrun -= 1
        for k in range(ss, se + 1):
            if coef[k]:
                _refine_nonzero(reader, coef, k, al)
        return
    k = ss
    while k <= se:
        rs = table.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: correct the rest of this band, then run
                state.eobrun = (1 << r) + (reader.bits(r) if r else 0) - 1
                for kk in range(k, se + 1):
                    if coef[kk]:
                        _refine_nonzero(reader, coef, kk, al)
                return
            newval = 0  # ZRL: skip 16 zero-history coefficients
        elif s == 1:
            newval = (1 << al) if reader.bit() else -(1 << al)
        else:
            raise ValueError(f"bad JPEG AC refinement size {s}")
        # advance past r zero-history coefficients, correcting nonzeros
        while k <= se:
            if coef[k]:
                _refine_nonzero(reader, coef, k, al)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if s and k <= se:
            coef[k] = newval
        k += 1


def _process_scan(
    intervals, scan_comps, ss, se, ah, al, restart_interval,
    comps, geom, coef, huff_dc, huff_ac, progressive,
):
    """Decode one scan's entropy-coded intervals into the coefficient
    store. Ns>1 scans interleave over MCUs (hs*vs blocks per component);
    Ns==1 scans are non-interleaved and walk the COMPONENT's own block
    raster (ceil dims of its subsampled plane — smaller than the padded
    MCU grid for subsampled components)."""
    hmax, vmax, mcus_x, mcus_y, w, h = geom
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        ci0 = scan_comps[0][0]
        _, hs0, vs0, _ = comps[ci0]
        comp_w = -(-w * hs0 // hmax)
        comp_h = -(-h * vs0 // vmax)
        cbw = -(-comp_w // 8)
        cbh = -(-comp_h // 8)
        n_units = cbw * cbh
    per_interval = restart_interval if restart_interval else n_units
    expected = -(-n_units // per_interval)
    if len(intervals) < expected:
        raise ValueError(
            f"truncated JPEG scan: {len(intervals)} restart intervals, "
            f"expected {expected}"
        )
    band_lo = max(ss, 1)

    def decode_block(reader, state, si, dc_id, ac_id, blk):
        if ss == 0:
            if ah == 0 and dc_id not in huff_dc:
                raise ValueError(f"JPEG references undefined DC table {dc_id}")
            _decode_dc(reader, huff_dc.get(dc_id), state, si, blk, ah, al)
        if se >= band_lo and se >= 1:
            if ac_id not in huff_ac:
                raise ValueError(f"JPEG references undefined AC table {ac_id}")
            if ah == 0:
                _decode_ac_first(
                    reader, huff_ac[ac_id], state, blk, band_lo, se, al, progressive
                )
            else:
                _decode_ac_refine(reader, huff_ac[ac_id], state, blk, band_lo, se, al)

    unit = 0
    for interval in intervals[:expected]:
        reader = _BitReader(interval)
        state = _ScanState(len(scan_comps))
        for _ in range(min(per_interval, n_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for si, (ci, dc_id, ac_id) in enumerate(scan_comps):
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            decode_block(
                                reader, state, si, dc_id, ac_id,
                                coef[ci][my * vs + by, mx * hs + bx],
                            )
            else:
                ci, dc_id, ac_id = scan_comps[0]
                by, bx = divmod(unit, cbw)
                decode_block(reader, state, 0, dc_id, ac_id, coef[ci][by, bx])
            unit += 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes -> (h, w, 3)
    float64 RGB raster in [0, 255]. Both paths decode into a shared
    coefficient store; baseline is the degenerate single full-spectrum
    scan of the progressive machinery, so the block layer cannot drift
    between them."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, progressive, [(cid, hs, vs, tq)])
    restart_interval = 0
    coef = None  # per component: (blocks_y, blocks_x, 64) int32, zigzag order
    geom = None
    saw_scan = False
    hit_eoi = False

    i, n = 2, len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at byte {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD9:  # EOI
            hit_eoi = True
            break
        if marker == 0x01:  # TEM: standalone
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack_from(">H", b, i + 2)[0]
        if i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables per segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tab = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype("int32")
                    j += 64
                elif pq == 1:
                    tab = np.frombuffer(seg[j : j + 128], dtype=">u2").astype("int32")
                    j += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(tab) != 64:
                    raise ValueError("truncated DQT table")
                qt[tq] = tab
        elif marker == 0xC4:  # DHT: one or more tables per segment
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                if len(symbols) != total:
                    raise ValueError("truncated DHT table")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, symbols)
                j += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG precision supported ({prec})")
            if nc not in (1, 3):
                raise ValueError(f"only 1- or 3-component JPEG supported ({nc})")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"unsupported JPEG sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, marker == 0xC2, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline/progressive JPEG (SOF{marker - 0xC0}: lossless/"
                "arithmetic/hierarchical) needs a codec library"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, progressive, comps = frame
            if not h or not w:
                raise ValueError("zero-dimension JPEG")
            if geom is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                geom = (hmax, vmax, mcus_x, mcus_y, w, h)
                coef = [
                    np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype="int32")
                    for (_, hs, vs, _) in comps
                ]
            ns = seg[0]
            cids = [c[0] for c in comps]
            scan_comps = []  # (ci, dc_id, ac_id)
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                if cs not in cids:
                    raise ValueError(f"JPEG scan references unknown component {cs}")
                scan_comps.append((cids.index(cs), tt >> 4, tt & 0x0F))
            ss, se, ah_al = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("sequential JPEG scan must cover the full spectrum")
            if ss > se or se > 63:
                raise ValueError(f"bad JPEG spectral band {ss}..{se}")
            if ss > 0 and ns != 1:
                raise ValueError("JPEG AC scans must be single-component")
            intervals, i_next = _destuff_and_split(b, i + 2 + seg_len)
            _process_scan(
                intervals, scan_comps, ss, se, ah, al, restart_interval,
                comps, geom, coef, huff_dc, huff_ac, progressive,
            )
            saw_scan = True
            i = i_next
            continue
        # APPn / COM / DNL / others: skip
        i += 2 + seg_len

    if frame is None or not saw_scan:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    if not hit_eoi:
        raise ValueError("truncated JPEG: missing EOI")
    h, w, progressive, comps = frame
    hmax, vmax = geom[0], geom[1]

    # dequantize + IDCT every block, assemble per-component planes
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"JPEG references undefined quant table {tq}")
        by, bx = coef[ci].shape[:2]
        # vectorized over all blocks: dezigzag, dequantize, batched IDCT
        zz = coef[ci].reshape(-1, 64).astype("float64") * qt[tq].astype("float64")
        blocks = np.zeros((zz.shape[0], 64))
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _M, blocks, _M) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        planes.append(plane)

    # upsample to full resolution by sample replication, crop, color-convert
    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0.0, 255.0)
        return np.dstack([g, g, g])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.dstack([r, g, bl]), 0.0, 255.0)


# ---------------------------------------------------------------------------
# Grayscale baseline ENCODER — the serving-side twin of the decoder
# (reference img/RespondWithGrid.go:35-37 serves density masks as jpeg;
# this provides that wire format without a codec library). Single
# component, SOF0, canonical one-length Huffman tables over the symbols
# actually used (spec Annex C; the all-ones code stays unassigned).
# ---------------------------------------------------------------------------
def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_gray_jpeg(gray, qtab=None) -> bytes:
    """(h, w) uint8 grayscale -> baseline JFIF bytes. `qtab` is a 64-long
    zigzag-order quantization table (default: all ones, near-lossless)."""
    gray = np.asarray(gray, dtype="float64")
    if gray.ndim != 2 or not gray.size:
        raise ValueError(f"encode_gray_jpeg expects a non-empty 2-D array, got {gray.shape}")
    h, w = gray.shape
    q = (
        np.ones(64, dtype="int32")
        if qtab is None
        else np.asarray(qtab, dtype="int32").reshape(64)
    )
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")

    # forward DCT + quantize, zigzag order, all blocks row-major — one
    # batched einsum over (n_blocks, 8, 8) instead of a Python loop of
    # tiny matmuls (the per-block loop held the GIL for most of the
    # encode under serve concurrency)
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )
    f = np.einsum("ij,bjk,lk->bil", _M, blocks, _M, optimize=True)
    zz_all = np.round(f.reshape(-1, 64)[:, _ZIGZAG] / q).astype("int64")

    def cat_of(a):
        """Vectorized _category: bit length of |a| (frexp exponent — exact
        for integers, unlike floor(log2))."""
        return np.where(a == 0, 0, np.frexp(np.abs(a))[1]).astype("int64")

    # DC: category + extend_inv over the block-to-block differences
    diffs = np.diff(zz_all[:, 0], prepend=np.int64(0))
    dcats = cat_of(diffs)
    dextras = np.where(
        diffs >= 0, diffs, diffs + np.left_shift(np.int64(1), dcats) - 1
    )

    # AC: categories/extras vectorized; the run-length walk touches only
    # the NONZERO coefficients of each block (mask tiles are piecewise
    # constant — most blocks are a bare EOB)
    ac = zz_all[:, 1:]
    acats = cat_of(ac)
    aextras = np.where(ac >= 0, ac, ac + np.left_shift(np.int64(1), acats) - 1)
    nzmask = ac != 0

    tokens = []  # per block: (dc_cat, dc_extra, [(rs, extra, nbits)...])
    dc_syms, ac_syms = [], []
    for b in range(zz_all.shape[0]):
        cat = int(dcats[b])
        dc_syms.append(cat)
        acs = []
        ks = np.nonzero(nzmask[b])[0]
        prev = -1
        for k in ks:
            run = int(k) - prev - 1
            prev = int(k)
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            s = int(acats[b, k])
            acs.append(((run << 4) | s, int(aextras[b, k]), s))
        if prev < 62:
            acs.append((0x00, 0, 0))
        ac_syms += [a[0] for a in acs]
        tokens.append((cat, int(dextras[b]), acs))

    def build_table(symbols):
        syms = sorted(set(symbols)) or [0]
        bits = max(2, len(syms).bit_length())
        while (1 << bits) < len(syms) + 1:
            bits += 1
        counts = [0] * 16
        counts[bits - 1] = len(syms)
        return counts, bytes(syms), {s: (bits, i) for i, s in enumerate(syms)}

    dc_counts, dc_symbols, dc_codes = build_table(dc_syms)
    ac_counts, ac_symbols, ac_codes = build_table(ac_syms)

    # entropy stream as (value, width) pairs, bit-packed ONCE via numpy
    # (MSB-first), 1-padded to the byte boundary, 0xFF bytes stuffed —
    # byte-identical to the former per-bit Python loop
    vals, wids = [], []
    for cat, extra, acs in tokens:
        L, c = dc_codes[cat]
        vals.append(c)
        wids.append(L)
        if cat:
            vals.append(extra)
            wids.append(cat)
        for rs, ev, en in acs:
            L, c = ac_codes[rs]
            vals.append(c)
            wids.append(L)
            if en:
                vals.append(ev)
                wids.append(en)
    va = np.asarray(vals, dtype=np.uint32)
    wa = np.asarray(wids, dtype=np.int64)
    total = int(wa.sum())
    pos_in = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(wa) - wa, wa)
    shifts = (np.repeat(wa, wa) - 1 - pos_in).astype(np.uint32)
    bits = ((np.repeat(va, wa) >> shifts) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    packed = np.packbits(bits)
    stuff_at = np.nonzero(packed == 0xFF)[0]
    out_bits = np.insert(packed, stuff_at + 1, np.uint8(0)).tobytes()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
        + seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(out_bits)
        + b"\xff\xd9"
    )
