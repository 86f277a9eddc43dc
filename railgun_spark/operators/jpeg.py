"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) decoder — stdlib + numpy.

Covers the dominant interchange subset: baseline sequential DCT (SOF0),
8-bit samples, Huffman entropy coding, 1 or 3 components, chroma
subsampling up to 2x2 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers,
JFIF/EXIF APPn segments. Refused loudly (same honesty discipline as the
PPM/BMP/PNG/WAV/Y4M decoders — truncation is an error, never padding):
progressive (SOF2) and the other non-baseline SOFs, arithmetic coding,
12-bit precision, 4-component CMYK, sampling factors above 2.

Structure (all from the public spec):
  - marker walk: DQT (quant tables), DHT (Huffman code lengths+symbols,
    spec Annex C canonical code construction), SOF0 (dims + per-component
    sampling/quant ids), DRI (restart interval), SOS (per-component
    table bindings) then the entropy-coded scan.
  - scan bytes are de-stuffed (FF 00 -> FF) and split at RSTn markers;
    each restart interval decodes independently with DC predictors reset.
  - per MCU and component: DC category + extend (spec F.2.2.1), AC
    run/size with ZRL and EOB (F.2.2.2), dezigzag, dequantize, 8x8 IDCT
    as two orthonormal-DCT matrix multiplies (exact float, no fixed-point
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


def _destuff_and_split(scan: bytes) -> list[bytes]:
    """Remove FF00 stuffing and split the scan at RSTn markers into
    independently-decodable restart intervals."""
    intervals: list[bytes] = []
    cur = bytearray()
    i, n = 0, len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = scan[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next marker (EOI or otherwise): scan ends here
            break
    intervals.append(bytes(cur))
    return intervals


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) float64 RGB raster in [0, 255]."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    scan_bindings = None  # [(comp_idx, dc_id, ac_id)]
    scan_data = None

    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at byte {i}")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
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
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise ValueError(f"non-baseline JPEG ({kind}) needs a codec library")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                raise ValueError("JPEG partial-scan SOS not supported (baseline interleaved only)")
            cids = [c[0] for c in frame[2]]
            scan_bindings = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_bindings.append((cids.index(cs), tt >> 4, tt & 0x0F))
            scan_data = b[i + 2 + seg_len :]
            break
        # APPn / COM / others: skip
        i += 2 + seg_len

    if frame is None or scan_data is None:
        raise ValueError("truncated JPEG: missing SOF0/SOS")
    h, w, comps = frame
    if not h or not w:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient planes (in blocks)
    planes = []
    for _, hs, vs, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG references undefined quant table {tq}")
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype="float64"))

    intervals = _destuff_and_split(scan_data)
    n_mcus = mcus_x * mcus_y
    per_interval = restart_interval if restart_interval else n_mcus
    expected_intervals = -(-n_mcus // per_interval)
    if len(intervals) < expected_intervals:
        raise ValueError(
            f"truncated JPEG scan: {len(intervals)} restart intervals, "
            f"expected {expected_intervals}"
        )

    mcu = 0
    for interval in intervals[:expected_intervals]:
        reader = _BitReader(interval)
        pred = [0] * len(comps)
        for _ in range(min(per_interval, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, (_, hs, vs, tq) in enumerate(comps):
                dc_id, ac_id = scan_bindings[ci][1], scan_bindings[ci][2]
                if dc_id not in huff_dc or ac_id not in huff_ac:
                    raise ValueError("JPEG references undefined Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype="int64")
                        cat = huff_dc[dc_id].decode(reader)
                        if cat > 11:
                            raise ValueError(f"bad JPEG DC category {cat}")
                        pred[ci] += _extend(reader.bits(cat), cat)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ac_id].decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype="float64")
                        blk[_ZIGZAG] = zz * qt[tq]
                        pix = _M.T @ blk.reshape(8, 8) @ _M + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1

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
