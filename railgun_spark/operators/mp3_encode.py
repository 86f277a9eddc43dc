"""From-scratch MPEG-1 Layer III frame ENCODER for synthetic streams —
the golden-pair twin of ``operators/mp3.py`` (the FLAC/JPEG test-encoder
pattern: no codec library exists in this container, so validation
streams are generated from the spec directly).

Scope: spectra are supplied directly as quantized values (|q| <= 15 so
the certified Huffman tables suffice), long or short blocks, mono /
stereo / MS joint stereo, main_data_begin always 0 (each frame
self-contained, stuffing-padded). Used by ``tests/test_mp3.py`` and the
driver-gated ``multimodal_mp3_features`` suite query, which decodes
tones synthesized here through the real Arrow pipeline.
"""

from __future__ import annotations

import numpy as np

from railgun_spark.operators.mp3 import _HUFF_RAW


class _BitW:
    def __init__(self):
        self.bits = []

    def write(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def bytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _encode_map(tid: int):
    xlen, hlens, codes = _HUFF_RAW[tid]
    return xlen, {divmod(i, xlen): (hlens[i], codes[i])
                  for i in range(xlen * xlen)}


_SR_IDX = {44100: 0, 48000: 1, 32000: 2}
_BR_IDX = {128000: 9, 160000: 10, 192000: 11, 256000: 13, 320000: 14}


_SCFSI_GROUPS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _write_granule(spec, table=13, global_gain=210,
                   block_type=0, subblock_gain=(0, 0, 0), scalefacs=None,
                   scalefac_scale=0, preflag=0, skip_groups=(), lsf=False,
                   mixed=False):
    """Side-info bits + main-data bits for one granule of one channel.
    Default scalefac_compress=0 (slen 0/0) writes zero part2 bits; an
    explicit ``scalefacs`` (21 long-block values, sfb 0-10 <= 15 and
    11-20 <= 7) uses compress index 15 (slen 4/3) — the intensity tests
    need real scalefactor bits carrying is_pos. The part2_3 budget ends
    exactly after big_values so the count1 region is empty."""
    spec = [int(v) for v in spec]
    if len(spec) != 576 or any(abs(v) > 15 for v in spec):
        raise ValueError("encoder spectra must be 576 values with |q| <= 15")
    nz = 0
    for i, v in enumerate(spec):
        if v:
            nz = i + 1
    big_values = (nz + 1) // 2
    xlen, emap = _encode_map(table)

    mw = _BitW()
    if scalefacs is not None and lsf:
        if block_type:
            raise ValueError("explicit scalefacs are long-block only here")
        sf = [int(v) for v in scalefacs]
        if len(sf) != 21 or any(not 0 <= v <= 3 for v in sf):
            raise ValueError("LSF scalefacs: 21 values in 0..3 (slen 2/2/2/2)")
        for v in sf:  # partition rule for sfc=202: slens (2,2,2,2)
            mw.write(v, 2)
    elif scalefacs is not None:
        if block_type == 2:
            raise ValueError(
                "explicit scalefacs are long-LAYOUT only (block_type "
                "0/1/3; short blocks use the 12x3 layout)"
            )
        sf = [int(v) for v in scalefacs]
        if len(sf) != 21 or any(not 0 <= v <= 15 for v in sf[:11]) \
                or any(not 0 <= v <= 7 for v in sf[11:]):
            raise ValueError("scalefacs: 21 values, sfb0-10 <=15, 11-20 <=7")
        skipped = set()
        for grp in skip_groups:  # scfsi: granule 1 omits these groups
            lo, hi = _SCFSI_GROUPS[grp]
            skipped.update(range(lo, hi))
        for sfb, v in enumerate(sf[:11]):
            if sfb not in skipped:
                mw.write(v, 4)
        for sfb, v in enumerate(sf[11:], start=11):
            if sfb not in skipped:
                mw.write(v, 3)
    for p in range(big_values):
        x, y = spec[2 * p], spec[2 * p + 1]
        h, c = emap[(abs(x), abs(y))]
        mw.write(c, h)
        if x:
            mw.write(1 if x < 0 else 0, 1)
        if y:
            mw.write(1 if y < 0 else 0, 1)
    part23 = len(mw.bits)

    sw = _BitW()
    sw.write(part23, 12)
    sw.write(big_values, 9)
    sw.write(global_gain, 8)
    if lsf:
        sw.write(0 if scalefacs is None else 202, 9)  # LSF scalefac_compress
    else:
        sw.write(0 if scalefacs is None else 15, 4)  # scalefac_compress
    if block_type:
        sw.write(1, 1)  # window_switching
        sw.write(block_type, 2)
        sw.write(1 if mixed else 0, 1)  # mixed_block
        for _ in range(2):
            sw.write(table, 5)
        for g in subblock_gain:
            sw.write(g, 3)
    else:
        sw.write(0, 1)
        for _ in range(3):
            sw.write(table, 5)
        sw.write(8, 4)   # region0_count
        sw.write(12, 3)  # region1_count -> region2 boundary = 576
    if not lsf:  # LSF has no preflag bit (derived from the sfc rule)
        sw.write(1 if preflag else 0, 1)
    sw.write(1 if scalefac_scale else 0, 1)
    sw.write(1, 1)  # count1table_select B (fixed 4-bit codes)
    return sw.bits, mw.bits


_SR_IDX_LSF = {22050: 0, 24000: 1, 16000: 2}
_BR_IDX_LSF = {64000: 8, 80000: 9, 96000: 10, 128000: 12, 160000: 14}


def encode_mp3(granule_specs, sample_rate=44100, bitrate=256000,
               mode=3, mode_ext=0, table=13, global_gain=210,
               block_types=None, crc=False, scalefacs=None,
               scalefac_scale=0, preflag=0, scfsi=None, lsf=False,
               mixed=False):
    """granule_specs: per-granule spectra — mono: one 576-array per
    granule; stereo: (left, right) pairs. Frames carry two granules; an
    odd count is zero-padded. ``crc=True`` sets the protection bit and
    writes the §2.4.3.1 CRC-16 over header bytes 2-3 + side info.
    ``scalefacs`` parallels granule_specs (each element None, or a
    21-list for mono / a (left, right) pair of None-or-21-list for
    stereo) — used to carry intensity positions. ``scfsi`` is a 4-list
    of 0/1 per scfsi band group (applied to every channel): granule 1
    then OMITS scalefactor bits for the flagged groups and the decoder
    must reuse granule 0's. ``lsf=True`` writes MPEG-2 LSF frames
    (ISO 13818-3): one 576-sample granule per frame, 8-bit
    main_data_begin, no scfsi, 9-bit scalefac_compress (0, or 202 =
    slens 2/2/2/2 when scalefacs given), no preflag bit."""
    n_channels = 1 if mode == 3 else 2
    scfsi = list(scfsi) if scfsi is not None else [0, 0, 0, 0]
    specs = list(granule_specs)
    sfs = list(scalefacs) if scalefacs is not None else [None] * len(specs)
    if len(sfs) != len(specs):
        raise ValueError("scalefacs must parallel granule_specs")
    gr_per_frame = 1 if lsf else 2
    if lsf and (any(scfsi) or preflag):
        raise ValueError("LSF frames have no scfsi or preflag bits")
    if lsf and sample_rate == 44100:
        sample_rate = 22050  # convenience: default rate's LSF twin
    if not lsf and len(specs) % 2:
        if n_channels == 1:
            specs.append(np.zeros(576))
        else:
            specs.append((np.zeros(576), np.zeros(576)))
        sfs.append(None)
    if lsf:
        bitrate = 128000 if bitrate == 256000 else bitrate
        frame_len = 72 * bitrate // sample_rate  # padding bit 0
        side_len = 9 if n_channels == 1 else 17
    else:
        frame_len = 144 * bitrate // sample_rate  # padding bit 0
        side_len = 17 if n_channels == 1 else 32
    out = bytearray()
    for f in range(0, len(specs), gr_per_frame):
        hdr = _BitW()
        hdr.write(0x7FF, 11)
        hdr.write(2 if lsf else 3, 2)   # MPEG-2 LSF / MPEG-1
        hdr.write(1, 2)   # Layer III
        hdr.write(0 if crc else 1, 1)  # protection bit: 0 -> CRC present
        hdr.write((_BR_IDX_LSF if lsf else _BR_IDX)[bitrate], 4)
        hdr.write((_SR_IDX_LSF if lsf else _SR_IDX)[sample_rate], 2)
        hdr.write(0, 1)   # padding
        hdr.write(0, 1)   # private
        hdr.write(mode, 2)
        hdr.write(mode_ext, 2)
        hdr.write(0, 4)   # copyright/original/emphasis

        side = _BitW()
        if lsf:
            side.write(0, 8)  # main_data_begin
            side.write(0, 1 if n_channels == 1 else 2)  # private_bits
        else:
            side.write(0, 9)  # main_data_begin
            side.write(0, 5 if n_channels == 1 else 3)  # private_bits
            for _ch in range(n_channels):
                for bit in scfsi:
                    side.write(1 if bit else 0, 1)
        main = _BitW()
        skip = tuple(i for i, bit in enumerate(scfsi) if bit)
        for gr in range(gr_per_frame):
            g = specs[f + gr]
            gsf = sfs[f + gr]
            chans = [g] if n_channels == 1 else list(g)
            chan_sfs = [gsf] if n_channels == 1 else (
                list(gsf) if gsf is not None else [None, None]
            )
            for ch in range(n_channels):
                bt = 0
                if block_types is not None:
                    bt = block_types[f + gr]
                sbits, mbits = _write_granule(
                    chans[ch], table=table,
                    global_gain=global_gain, block_type=bt,
                    scalefacs=chan_sfs[ch],
                    scalefac_scale=scalefac_scale, preflag=preflag,
                    skip_groups=skip if gr == 1 else (), lsf=lsf,
                    mixed=mixed and bt == 2,
                )
                side.bits.extend(sbits)
                main.bits.extend(mbits)
        sbytes = side.bytes()
        assert len(sbytes) == side_len, (len(sbytes), side_len)
        mbytes = main.bytes()
        hbytes = hdr.bytes()
        crc_bytes = b""
        if crc:
            from railgun_spark.operators.mp3 import _crc16_mpeg

            crc_bytes = _crc16_mpeg(hbytes[2:4] + sbytes).to_bytes(2, "big")
        room = frame_len - 4 - len(crc_bytes) - side_len
        assert len(mbytes) <= room, "granule data overflows the frame"
        out += (hbytes + crc_bytes + sbytes + mbytes
                + b"\x00" * (room - len(mbytes)))
    return bytes(out)


def encode_mp3_tone(sb: int, k: int, q: int, n_granules: int = 2,
                    global_gain: int = 210) -> bytes:
    """Single-spectral-line mono stream: quantized value q at MDCT bin k
    of subband sb, held for n_granules granules — decodes to a tone at
    (18*sb + k + 0.5) * 44100 / 1152 Hz."""
    spec = np.zeros(576, dtype=np.int64)
    spec[sb * 18 + k] = q
    return encode_mp3([spec] * n_granules, global_gain=global_gain)
