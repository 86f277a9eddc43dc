"""FLAC decoder golden tests.

As with JPEG, no codec library exists in the container to produce
reference files, so a from-scratch SPEC ENCODER drives the decoder:
MSB-first bit writer, CRC-8/CRC-16 (shared with the decoder — pinned
separately against hand-computed vectors so the pair cannot drift
together), UTF-8 frame numbers, rice-coded residuals with per-partition
parameters, and every subframe type (constant/verbatim/fixed/LPC).
Integer-exact prediction makes most round-trips bit-exact; the WAV path
cross-checks features on identical samples.
"""

from __future__ import annotations

import numpy as np
import pytest

from railgun_spark.operators.flac import _crc8, _crc16, decode_flac


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def align(self):
        while self.n:
            self.write(0, 1)

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def _rice_write(w: _BitW, v: int, k: int):
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1  # zigzag
    if v < 0:
        u = (-v << 1) - 1
    else:
        u = v << 1
    q = u >> k
    for _ in range(q):
        w.write(0, 1)
    w.write(1, 1)
    if k:
        w.write(u & ((1 << k) - 1), k)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(w: _BitW, samples, bps, kind, rice_k=4, part_order=0,
                    lpc=None, wasted=0):
    """kind: 'verbatim' | 'constant' | ('fixed', order) | 'lpc'."""
    samples = [int(s) for s in samples]
    w.write(0, 1)  # padding
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif isinstance(kind, tuple) and kind[0] == "fixed":
        w.write(8 + kind[1], 6)
    else:  # lpc
        w.write(31 + len(lpc[0]), 6)
    if wasted:
        w.write(1, 1)
        for _ in range(wasted - 1):
            w.write(0, 1)
        w.write(1, 1)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    else:
        w.write(0, 1)

    def s_write(v, n):
        w.write(v & ((1 << n) - 1), n)

    if kind == "constant":
        assert len(set(samples)) == 1
        s_write(samples[0], bps)
        return
    if kind == "verbatim":
        for s in samples:
            s_write(s, bps)
        return
    if isinstance(kind, tuple):
        order = kind[1]
        coefs = _FIXED[order]
        shift = 0
        pred = lambda i: sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
    else:
        coefs, precision, shift = lpc
        order = len(coefs)
        pred = lambda i: sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
    for s in samples[:order]:
        s_write(s, bps)
    if not isinstance(kind, tuple):  # LPC header
        w.write(precision - 1, 4)
        s_write(shift, 5)
        for c in coefs:
            s_write(c, precision)
    # residuals: method 0 (4-bit rice), chosen partition order
    w.write(0, 2)
    w.write(part_order, 4)
    n_parts = 1 << part_order
    blocksize = len(samples)
    k = order
    for p in range(n_parts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        w.write(rice_k, 4)
        for i in range(n):
            _rice_write(w, samples[k + i] - pred(k + i), rice_k)
        k += n


def encode_flac(channels, sample_rate=8000, bps=16, blocksize=None,
                kinds=None, ch_mode="independent", rice_k=4, part_order=0,
                lpc=None, wasted=0):
    """channels: list of equal-length int sample lists. Splits into
    frames of `blocksize` (default: all in one frame)."""
    n_ch = len(channels)
    total = len(channels[0])
    blocksize = blocksize or total
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unchecked
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ch_codes = {"independent": n_ch - 1, "left_side": 8, "right_side": 9,
                "mid_side": 10}
    frame_no = 0
    for start in range(0, total, blocksize):
        frame = [c[start : start + blocksize] for c in channels]
        bs = len(frame[0])
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize follows
        w.write(0, 4)  # rate from STREAMINFO
        w.write(ch_codes[ch_mode], 4)
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        assert frame_no < 0x80
        w.write(frame_no, 8)  # 1-byte UTF-8 number
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        hdr += bytes([_crc8(hdr)])
        fw = _BitW()
        kind_list = kinds or ["verbatim"] * n_ch
        if ch_mode == "independent":
            subs = [(frame[i], bps) for i in range(n_ch)]
        else:
            left = np.array(frame[0], dtype="int64")
            right = np.array(frame[1], dtype="int64")
            side = left - right
            if ch_mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif ch_mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        for (data, sub_bps), kind in zip(subs, kind_list):
            _write_subframe(fw, data, sub_bps, kind, rice_k=rice_k,
                            part_order=part_order, lpc=lpc, wasted=wasted)
        fw.align()
        frame_bytes = hdr + fw.bytes()
        frame_bytes += _crc16(frame_bytes).to_bytes(2, "big")
        out += frame_bytes
        frame_no += 1
    return bytes(out)


def test_crc_vectors():
    """Pin the CRC polynomials against independently-computed vectors so
    encoder and decoder cannot drift together."""
    # CRC-8 poly 0x07 over "123456789" is the standard check value 0xF4
    assert _crc8(b"123456789") == 0xF4
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check value 0xFEE8
    assert _crc16(b"123456789") == 0xFEE8


def _sine(n, freq, rate, amp, phase=0.0):
    t = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * freq * t / rate + phase)).astype("int64")


def test_verbatim_roundtrip_and_wav_feature_parity():
    """Verbatim stereo FLAC decodes bit-exactly; features equal the WAV
    decode of identical PCM (cross-format check through shared math)."""
    import struct

    from railgun_spark.operators.multimodal import decode_wav

    rate, n = 8000, 1000
    left = _sine(n, 440, rate, 12000)
    right = _sine(n, 220, rate, 8000)
    d = decode_flac(encode_flac([list(left), list(right)], sample_rate=rate))
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (rate, 2, n)
    assert abs(d["duration_s"] - n / rate) < 1e-9

    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    w = decode_wav(wav)
    assert np.allclose(d["feature"], w["feature"], atol=1e-12)


def test_fixed_predictors_all_orders_bit_exact():
    rate, n = 8000, 512
    x = _sine(n, 300, rate, 9000) + _sine(n, 77, rate, 3000)
    for order in range(5):
        out = decode_flac(
            encode_flac([list(x)], kinds=[("fixed", order)], rice_k=6)
        )
        # re-decode through verbatim for the identical-feature comparison
        ref = decode_flac(encode_flac([list(x)]))
        assert out["feature"] == ref["feature"], f"order {order}"


def test_constant_lpc_partitions_wasted_and_multiframe():
    rate = 8000
    # constant subframe
    c = decode_flac(encode_flac([[137] * 256], kinds=["constant"]))
    assert c["n_samples"] == 256 and abs(c["feature"][3] - 137 / 32768) < 1e-9
    # LPC order 2 with a shift
    x = _sine(600, 150, rate, 11000)
    lpc = ([3, -1], 5, 1)  # coefs, precision bits, shift
    got = decode_flac(encode_flac([list(x)], kinds=["lpc"], lpc=lpc, rice_k=7))
    ref = decode_flac(encode_flac([list(x)]))
    assert got["feature"] == ref["feature"]
    # rice partitions (order 2 -> 4 partitions) + multiframe split
    y = _sine(1024, 500, rate, 5000)
    got = decode_flac(
        encode_flac([list(y)], blocksize=256, kinds=[("fixed", 1)], part_order=2)
    )
    ref = decode_flac(encode_flac([list(y)]))
    assert got["feature"] == ref["feature"] and got["n_samples"] == 1024
    # wasted bits: all-even samples shifted down in the subframe
    z = (_sine(256, 100, rate, 7000) >> 1) << 1
    got = decode_flac(encode_flac([list(z)], wasted=1))
    ref = decode_flac(encode_flac([list(z)]))
    assert got["feature"] == ref["feature"]


def test_stereo_decorrelation_modes_bit_exact():
    rate, n = 8000, 400
    left = _sine(n, 330, rate, 10000)
    right = _sine(n, 110, rate, 6000, phase=1.0)
    ref = decode_flac(encode_flac([list(left), list(right)], sample_rate=rate))
    for mode in ("left_side", "right_side", "mid_side"):
        got = decode_flac(
            encode_flac([list(left), list(right)], sample_rate=rate, ch_mode=mode)
        )
        assert got["feature"] == ref["feature"], mode


def test_flac_refusals():
    x = list(_sine(128, 100, 8000, 5000))
    good = encode_flac([x])
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(good[: len(good) - 10])
    # corrupt one byte inside the frame: CRC-16 (or an upstream field
    # check) must catch it
    bad = bytearray(good)
    bad[-20] ^= 0x55
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # corrupt the header CRC byte itself
    hdr_bad = bytearray(good)
    # frame starts right after metadata: find sync 0xFFF8
    fs = good.index(b"\xff\xf8", 4)
    hdr_bad[fs + 5] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr_bad))
    # wasted-bits count >= sample size: clear refusal, not a numpy/python
    # shift error from bps dropping to <= 0
    with pytest.raises(ValueError, match="wasted bits"):
        decode_flac(encode_flac([[0] * 64], kinds=["constant"], wasted=16))


def test_flac_through_arrow_audio_pipeline(spark):
    """FLAC payloads ride the same mapInPandas audio path as WAV — the
    default decoder dispatches by magic, mixed WAV+FLAC batches work."""
    import struct

    from railgun_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        extract_audio_features,
        extract_features,
    )

    rate, n = 8000, 600
    x = _sine(n, 440, rate, 12000)
    flac = encode_flac([list(x)], sample_rate=rate)
    inter = np.asarray(x, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(inter)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(inter)) + inter)

    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), {}), (2, "audio", bytearray(flac), {})],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["n_samples"] == rows[2]["n_samples"] == n
    assert np.allclose(rows[1]["feature"], rows[2]["feature"], atol=1e-6)

    # and through the generic mixed-kind dispatcher with require_real
    feats = {r["media_id"]: r for r in
             extract_features(df, decoder=decode_media, require_real=True).collect()}
    assert np.allclose(feats[1]["feature"], feats[2]["feature"], atol=1e-6)


def test_aiff_and_au_decode_feature_parity_with_wav():
    """AIFF (big-endian PCM, 80-bit-float rate) and AU (int16/mu-law/
    float32) decode the same PCM to the same features as WAV; mu-law
    round-trips within companding error; refusals are loud."""
    import struct

    from railgun_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_audio,
        decode_wav,
    )

    rate, n = 8000, 800
    left = _sine(n, 440, rate, 12000)
    right = _sine(n, 220, rate, 8000)
    inter = np.empty(2 * n, dtype=">i2")
    inter[0::2], inter[1::2] = left, right

    # reference WAV
    le = inter.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(le)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(le)) + le)
    ref = decode_wav(wav)

    # AIFF: COMM with the rate as an 80-bit extended float
    exp = 16383 + 63
    mant = rate
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    f80 = struct.pack(">HII", exp, mant >> 32, mant & 0xFFFFFFFF)
    comm = struct.pack(">hIh", 2, n, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + inter.tobytes()
    aiff = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd)) + b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    a = decode_aiff(aiff)
    assert (a["sample_rate"], a["n_channels"], a["n_samples"]) == (rate, 2, n)
    assert np.allclose(a["feature"], ref["feature"], atol=1e-12)
    assert np.allclose(decode_audio(aiff)["feature"], ref["feature"], atol=1e-12)

    # AU int16 BE
    au = (b".snd" + struct.pack(">IIIII", 24, len(inter.tobytes()), 3, rate, 2)
          + inter.tobytes())
    u = decode_au(au)
    assert np.allclose(u["feature"], ref["feature"], atol=1e-12)
    assert np.allclose(decode_audio(au)["feature"], ref["feature"], atol=1e-12)

    # AU mu-law: compress mono with the standard G.711 formula, decode,
    # compare to the float signal within companding error
    mono = ((left + right) / 2).astype("int64")
    BIAS, CLIP = 0x84, 32635
    mu = []
    for s in mono:
        sign = 0x80 if s < 0 else 0
        s = min(abs(int(s)), CLIP) + BIAS
        e = 7
        for exp_i in range(7, -1, -1):
            if s & (0x4000 >> (7 - exp_i)):
                e = exp_i
                break
        m = (s >> (e + 3)) & 0x0F
        mu.append(~(sign | (e << 4) | m) & 0xFF)
    aum = (b".snd" + struct.pack(">IIIII", 24, len(mu), 1, rate, 1) + bytes(mu))
    m = decode_au(aum)
    x = mono.astype("float64") / 32768.0
    got = m["feature"]
    assert abs(got[0] - np.sqrt((x**2).mean())) < 0.01  # rms within companding err

    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(wav)
    with pytest.raises(ValueError, match="truncated AIFF"):
        decode_aiff(aiff[:-100])
    with pytest.raises(ValueError, match="truncated AU"):
        decode_au(au[:-5])
    # encoding 23 = G.721 ADPCM: genuinely codec-bound (27/A-law now decodes)
    with pytest.raises(ValueError, match="unsupported AU encoding"):
        decode_au(b".snd" + struct.pack(">IIIII", 24, 4, 23, rate, 1) + b"\x00" * 4)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 256),
    stereo=st.booleans(),
    kind_pick=st.integers(0, 6),
    blocksize=st.sampled_from([0, 64, 192]),
    rice_k=st.integers(10, 14),
    part_order=st.integers(0, 2),
    mode_pick=st.integers(0, 3),
)
def test_flac_roundtrip_property(seed, n, stereo, kind_pick, blocksize,
                                 rice_k, part_order, mode_pick):
    """Randomized FLAC round-trips: any subframe type, rice parameter,
    partition order, blocksize split, and channel mode must decode to
    the exact samples (checked through feature equality with a verbatim
    encoding of the same signal, which is bit-exact by construction).
    rice_k stays >= 10: uncorrelated samples under a fixed predictor
    leave residuals ~12x the amplitude, and the pure-Python unary coder
    costs residual>>k bits per sample. Earlier sweeps of this property
    caught the decoder surfacing numpy's negative-dimension error for
    order >= blocksize instead of a clean refusal."""
    rng = np.random.RandomState(seed)
    kinds = ["verbatim", "constant", ("fixed", 0), ("fixed", 1), ("fixed", 2),
             ("fixed", 3), ("fixed", 4)]
    kind = kinds[kind_pick]
    bs = blocksize or None
    # the frame sizes this stream will actually contain
    frame_sizes = ([bs] * (n // bs) + ([n % bs] if n % bs else [])) if bs else [n]
    min_frame = min(frame_sizes)
    if isinstance(kind, tuple) and kind[1] >= min_frame:
        kind = "verbatim"  # spec: predictor order must be < blocksize
    if kind == "constant":
        x = np.full(n, int(rng.randint(-3000, 3000)), dtype="int64")
    else:
        x = rng.randint(-3000, 3000, size=n).astype("int64")
    channels = [list(x)]
    ch_mode = "independent"
    if stereo:
        if kind == "constant":
            y = np.full(n, int(rng.randint(-3000, 3000)), dtype="int64")
        else:
            y = rng.randint(-3000, 3000, size=n).astype("int64")
        channels.append(list(y))
        ch_mode = ["independent", "left_side", "right_side", "mid_side"][mode_pick]
    order = kind[1] if isinstance(kind, tuple) else 0
    # rice partitions must divide EVERY frame size with room for warmup
    while part_order and any(
        f % (1 << part_order) or (f >> part_order) <= order for f in frame_sizes
    ):
        part_order -= 1
    kinds_list = [kind] * len(channels)
    enc = encode_flac(channels, blocksize=bs, kinds=kinds_list,
                      ch_mode=ch_mode, rice_k=rice_k, part_order=part_order)
    got = decode_flac(enc)
    ref = decode_flac(encode_flac(channels, blocksize=bs, ch_mode="independent"))
    assert got["n_samples"] == ref["n_samples"] == n
    assert got["feature"] == ref["feature"]


def test_flac_order_ge_blocksize_refused():
    """Pinned from the property sweep: a fixed-predictor subframe whose
    order >= blocksize must be refused cleanly, not surface numpy's
    negative-dimension error."""
    import pytest as _pytest

    enc = encode_flac([[5]], kinds=[("fixed", 1)])  # order 1, blocksize 1
    with _pytest.raises(ValueError, match="order"):
        decode_flac(enc)


def test_wav_extended_codings():
    """decode_wav's full real-world PCM family: 8-bit unsigned, 24-bit,
    32-bit integer, A-law, mu-law, and WAVE_FORMAT_EXTENSIBLE — pinned
    against the 16-bit decode of the same signal, an independent scalar
    G.711 formula, and the AU decoder's mu-law path."""
    import struct

    import numpy as np

    from railgun_spark.operators.multimodal import (
        _alaw_expand,
        decode_au,
        decode_wav,
    )

    def wav(fmt_tag, bits, payload, rate=8000, ch=1, ext=False):
        if ext:
            fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate,
                              rate * (bits // 8) * ch, (bits // 8) * ch, bits)
            fmt += struct.pack("<HH", 22, bits)  # cbSize, valid bits
            fmt += struct.pack("<I", 0x3)  # channel mask
            fmt += struct.pack("<H", fmt_tag) + b"\x00" * 14  # SubFormat GUID
        else:
            fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                              rate * (bits // 8) * ch, (bits // 8) * ch, bits)
        return (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(payload))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)

    s16 = np.round(12000 * np.sin(2 * np.pi * 440 * np.arange(500) / 8000)
                   ).astype(np.int64)
    ref = decode_wav(wav(1, 16, s16.astype("<i2").tobytes()))

    # 24-bit = 16-bit << 8: identical in [-1, 1], features EXACTLY equal
    v24 = (s16 << 8).astype(np.int32)
    raw24 = bytearray()
    for v in v24:
        raw24 += int(v & 0xFFFFFF).to_bytes(3, "little")
    assert decode_wav(wav(1, 24, bytes(raw24)))["feature"] == ref["feature"]

    # 32-bit int = 16-bit << 16: exactly equal
    assert decode_wav(
        wav(1, 32, (s16 << 16).astype("<i4").tobytes())
    )["feature"] == ref["feature"]

    # 8-bit unsigned: quantized to 8 bits, features close but not equal
    d8 = decode_wav(wav(1, 8, ((s16 >> 8) + 128).astype(np.uint8).tobytes()))
    assert abs(d8["feature"][0] - ref["feature"][0]) < 0.01

    # extensible header with a PCM SubFormat decodes identically
    assert decode_wav(
        wav(1, 16, s16.astype("<i2").tobytes(), ext=True)
    )["feature"] == ref["feature"]

    # mu-law: same payload through the AU decoder (encoding 1) must agree
    ulaw = bytes(range(256)) * 2
    d_wav = decode_wav(wav(7, 8, ulaw))
    d_au = decode_au(b".snd" + struct.pack(">IIIII", 24, len(ulaw), 1, 8000, 1)
                     + ulaw)
    assert d_wav["feature"] == d_au["feature"]

    # A-law: vectorized expander vs the independent scalar G.711 formula
    for byte in (0x00, 0x55, 0x80, 0xD5, 0x2A, 0xFF, 0x13, 0xE9):
        a = byte ^ 0x55
        seg = (a & 0x70) >> 4
        t = (a & 0x0F) << 4
        if seg == 0:
            t += 8
        else:
            t = (t + 0x108) << (seg - 1)
        expect = t if (a & 0x80) else -t
        got = int(_alaw_expand(np.array([byte], dtype=np.uint8))[0])
        assert got == expect, (byte, got, expect)
    d_alaw = decode_wav(wav(6, 8, bytes(range(256)) * 2))
    assert d_alaw["n_samples"] == 512 and d_alaw["feature"][1] <= 1.0

    # ADPCM (format 2) refuses by tag
    with pytest.raises(ValueError, match="unsupported WAVE coding"):
        decode_wav(wav(2, 4, b"\x00" * 64))


def test_aiff_au_wide_sample_formats():
    """AIFF 24/32-bit and AU 24/32-bit/A-law: shifted copies of a 16-bit
    signal decode to EXACTLY the 16-bit features; the AU A-law path
    matches the WAV A-law decode of the same payload."""
    import struct

    from railgun_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_wav,
    )

    s16 = _sine(400, 330, 8000, 11000)

    def aiff(bits, payload, n):
        exp = 16383 + 63
        mant = 8000
        while mant < (1 << 63):
            mant <<= 1
            exp -= 1
        comm = struct.pack(">hIh", 1, n, bits) + struct.pack(
            ">HII", exp, mant >> 32, mant & 0xFFFFFFFF)
        ssnd = struct.pack(">II", 0, 0) + payload
        return (b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
                + b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)

    ref = decode_aiff(aiff(16, s16.astype(">i2").tobytes(), len(s16)))
    raw24 = b"".join(int((v << 8) & 0xFFFFFF).to_bytes(3, "big") for v in s16)
    assert decode_aiff(aiff(24, raw24, len(s16)))["feature"] == ref["feature"]
    assert decode_aiff(
        aiff(32, (s16 << 16).astype(">i4").tobytes(), len(s16))
    )["feature"] == ref["feature"]

    def au(enc, payload):
        return (b".snd" + struct.pack(">IIIII", 24, len(payload), enc, 8000, 1)
                + payload)

    ref_au = decode_au(au(3, s16.astype(">i2").tobytes()))
    assert decode_au(au(4, raw24))["feature"] == ref_au["feature"]
    assert decode_au(
        au(5, (s16 << 16).astype(">i4").tobytes())
    )["feature"] == ref_au["feature"]
    alaw = bytes(range(256)) * 2
    wav_alaw = (b"RIFF" + struct.pack("<I", 36 + len(alaw)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 6, 1, 8000, 8000, 1, 8)
                + b"data" + struct.pack("<I", len(alaw)) + alaw)
    assert decode_au(au(27, alaw))["feature"] == decode_wav(wav_alaw)["feature"]
    with pytest.raises(ValueError, match="unsupported AU encoding"):
        decode_au(au(11, b"\x00" * 8))
