"""FLAC decoder — stdlib + numpy, from the public format spec
(xiph.org/flac/format.html / RFC 9639).

Gives the audio modality a COMPRESSED library-free format next to
PCM/float WAV: the container is fully self-describing (predictor
coefficients and rice parameters ride in the stream, unlike MP3's
fixed spec-table Huffman codes, which is why MP3 stays honestly behind
a codec library). Covered: STREAMINFO + skipped metadata blocks, fixed-
and variable-blocksize frames, UTF-8-coded frame/sample numbers, CRC-8
header and CRC-16 frame checks, subframe types CONSTANT / VERBATIM /
FIXED (orders 0-4) / LPC (any order, with quantized-coefficient shift),
wasted bits, partitioned rice residuals (both 4- and 5-bit parameter
variants, escape-to-raw partitions), and the four channel assignments
(independent, left-side, right-side, mid-side). Refused loudly —
truncation, bad sync, bad CRC, reserved codes — never padded.

Decode is plain-Python bit reading per subframe with numpy for the
predictor recurrences where possible; like the JPEG decoder this runs
inside Arrow batches where the surrounding pipeline is already Python.
"""

from __future__ import annotations

import struct

import numpy as np


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        p = self.pos
        while n > 0:
            byte, bit = divmod(p, 8)
            take = min(n, 8 - bit)
            chunk = (self.data[byte] >> (8 - bit - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            p += take
            n -= take
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code (corrupt stream)")
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length number (up to 36 bits / 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise ValueError("bad FLAC UTF-8 frame number")
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = bits.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad FLAC UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residuals(bits: _Bits, blocksize: int, pred_order: int) -> np.ndarray:
    """Partitioned rice residuals (spec: RESIDUAL / RICE_PARTITION)."""
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC blocksize not divisible by rice partition count")
    out = np.empty(blocksize - pred_order, dtype="int64")
    k = 0
    for p in range(n_parts):
        n = (blocksize >> part_order) - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        rice = bits.read(param_bits)
        if rice == escape:
            raw = bits.read(5)
            for i in range(n):
                out[k + i] = bits.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = bits.unary()
                u = (q << rice) | bits.read(rice)
                out[k + i] = (u >> 1) ^ -(u & 1)  # zigzag unfold
        k += n
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise ValueError("bad FLAC subframe padding bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count-1
        wasted = bits.unary() + 1
        bps -= wasted
        if bps <= 0:
            # a crafted stream can claim more wasted bits than the sample
            # size; without this guard read_signed(<=0) surfaces a
            # misleading 'negative shift count' instead of a refusal
            raise ValueError(
                f"FLAC wasted bits ({wasted}) exceed sample size"
            )
    if stype == 0:  # CONSTANT
        samples = np.full(blocksize, bits.read_signed(bps), dtype="int64")
    elif stype == 1:  # VERBATIM
        samples = np.array([bits.read_signed(bps) for _ in range(blocksize)], dtype="int64")
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        if order >= blocksize:
            raise ValueError(
                f"FLAC fixed predictor order {order} >= blocksize {blocksize}"
            )
        warm = [bits.read_signed(bps) for _ in range(order)]
        resid = _read_residuals(bits, blocksize, order)
        samples = np.empty(blocksize, dtype="int64")
        samples[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        if order >= blocksize:
            raise ValueError(
                f"FLAC LPC order {order} >= blocksize {blocksize}"
            )
        warm = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4)
        if precision == 15:
            raise ValueError("invalid FLAC LPC precision code")
        precision += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        resid = _read_residuals(bits, blocksize, order)
        samples = np.empty(blocksize, dtype="int64")
        samples[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[i - 1 - j]
            samples[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}


def decode_flac_pcm(content: bytes):
    """FLAC bytes -> ((n, ch) float64 frames in [-1, 1], sample_rate) —
    the channel-preserving full-signal decode behind decode_flac, so
    transforms like resample_audio can consume FLAC without the
    feature-extraction mono collapse."""
    b = bytes(content or b"")
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    streaminfo = None
    while True:
        if i + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(b[i + 1 : i + 4], "big")
        body = b[i + 4 : i + 4 + size]
        if len(body) < size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if size != 34:
                raise ValueError(f"bad FLAC STREAMINFO size {size}")
            streaminfo = body
        i += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps_stream = si.read(5) + 1
    total_samples = si.read(36)
    if not sample_rate:
        raise ValueError("FLAC STREAMINFO sample rate is zero")

    channels: list[np.ndarray] = [np.empty(0, dtype="int64") for _ in range(n_channels)]
    decoded = 0
    while i < len(b):
        frame_start = i
        bits = _Bits(b, i * 8)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {i}")
        if bits.read(1):
            raise ValueError("reserved FLAC frame bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved FLAC frame header bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code 0")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        bps = {0: bps_stream, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if bps is None:
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        header_len = (bits.pos + 7) // 8 - frame_start
        if _crc8(b[frame_start : frame_start + header_len]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_channels:
                raise ValueError("FLAC frame channel count differs from STREAMINFO")
            subs = [_read_subframe(bits, blocksize, bps) for _ in range(n_channels)]
        elif ch_code in (8, 9, 10):  # left-side / right-side / mid-side
            if n_channels != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            # the SIDE subframe carries one extra bit: second for
            # left-side and mid-side, first for right-side
            extra = (1, 0) if ch_code == 9 else (0, 1)
            a = _read_subframe(bits, blocksize, bps + extra[0])
            c = _read_subframe(bits, blocksize, bps + extra[1])
            if ch_code == 8:  # left, side: right = left - side
                subs = [a, a - c]
            elif ch_code == 9:  # side, right: left = right + side
                subs = [a + c, c]
            else:  # mid, side
                side = c
                mid = (a << 1) | (side & 1)
                subs = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")

        bits.align()
        crc_end = bits.pos // 8
        if _crc16(b[frame_start:crc_end]) != bits.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for ci in range(n_channels):
            channels[ci] = np.concatenate([channels[ci], subs[ci]])
        decoded += blocksize
        i = bits.pos // 8
        if total_samples and decoded >= total_samples:
            break

    if total_samples and decoded < total_samples:
        raise ValueError(
            f"truncated FLAC: {decoded} of {total_samples} samples decoded"
        )
    if total_samples:
        channels = [c[:total_samples] for c in channels]
    x = np.stack(channels).astype("float64") / float(1 << (bps_stream - 1))
    if x.shape[1] == 0:
        raise ValueError("empty FLAC stream")
    return x.T, int(sample_rate)


def decode_flac(content: bytes) -> dict:
    """FLAC bytes -> the decode_wav result shape: sample_rate,
    n_channels, n_samples, duration_s, and the shared 8-dim audio
    feature over the channel-averaged signal in [-1, 1]."""
    frames, sample_rate = decode_flac_pcm(content)
    n_channels = frames.shape[1]
    mono = frames.mean(axis=1)
    n_samples = len(mono)
    rms = float(np.sqrt((mono**2).mean()))
    zcr = (
        float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
        if n_samples > 1
        else 0.0
    )
    seg_rms = [
        float(np.sqrt((s**2).mean())) if len(s) else 0.0
        for s in np.array_split(mono, 4)
    ]
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(n_samples),
        "duration_s": n_samples / sample_rate,
        "feature": [rms, float(np.abs(mono).max()), zcr, float(mono.mean())] + seg_rms,
    }
