"""Minimal FLAC *encoder*.  Emits spec-compliant streams covering every
subframe type the native decoder (native/flacdec.cpp) supports: constant,
verbatim, fixed (orders 0-4) and LPC, with Rice residuals (including
escape partitions), mono and stereo (independent + left/side + mid/side).

Two consumers: (a) the decoder test fixture (tests/test_flac.py), which
is why every exotic mode exists; (b) corpus tooling
(tools/synth_corpus.py), which writes synthesized speech as FLAC so the
preprocessing pipeline decodes it through the same native path recorded
LibriSpeech would take.  (The reference writes FLAC only via sox,
utils/augmentation.py:16-28.)

CRCs are written as zeros — the decoder skips them by design (corrupt
corpora fail loudly at the frame level instead).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1 if nbits < 64 else ~0
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int):
    """FLAC's UTF-8-style frame number coding (spec allows up to 36 bits,
    i.e. streams far beyond the 128 frames the original test fixture
    capped at)."""
    if n < 0x80:
        bw.write(n, 8)
        return
    assert n < (1 << 36), "FLAC frame number exceeds 36 bits"
    # total bytes B in 2..7; capacity = (7 - B) + 6 * (B - 1) data bits
    for B in range(2, 8):
        if n < (1 << ((7 - B) + 6 * (B - 1))):
            break
    cont = [(n >> (6 * i)) & 0x3F for i in range(B - 1)]  # low -> high
    lead_bits = 7 - B
    lead_mark = (0xFF << (8 - B)) & 0xFF  # B ones then a zero
    bw.write(lead_mark | (n >> (6 * (B - 1))) & ((1 << lead_bits) - 1)
             if lead_bits else lead_mark, 8)
    for t in reversed(cont):
        bw.write(0x80 | t, 8)


def _rice_residual(bw: BitWriter, residual: Sequence[int], param: int,
                   escape_bits: Optional[int] = None):
    """One partition (porder=0), method 0 (4-bit params)."""
    bw.write(0, 2)       # method 0
    bw.write(0, 4)       # partition order 0
    if escape_bits is not None:
        bw.write(0xF, 4)             # escape code
        bw.write(escape_bits, 5)
        for r in residual:
            bw.write_signed(int(r), escape_bits)
        return
    bw.write(param, 4)
    for r in residual:
        r = int(r)
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1  # FLAC zigzag
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
              lpc_order: int = 2, lpc_shift: int = 1,
              rice_param: int = 6, escape_bits: Optional[int] = None):
    bw.write(0, 1)  # padding
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(0x08 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        coefs = FIXED_COEFS[order]
        res = [int(x[i]) - sum(c * int(x[i - 1 - j])
                               for j, c in enumerate(coefs))
               for i in range(order, len(x))]
        _rice_residual(bw, res, rice_param, escape_bits)
    elif kind == "lpc":
        order = lpc_order
        coefs = [3, -2, 1, -1][:order]
        precision = 5
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = []
        for i in range(order, len(x)):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            res.append(int(x[i]) - (acc >> lpc_shift))
        _rice_residual(bw, res, rice_param, escape_bits)
    else:
        raise ValueError(kind)


def encode_flac(channels_pcm: List[np.ndarray], sample_rate: int = 16000,
                bps: int = 16, blocksize: int = 256,
                subframe_kind: str = "verbatim",
                channel_mode: str = "independent",
                **sub_kw) -> bytes:
    """Encode per-channel int PCM into a FLAC stream."""
    nch = len(channels_pcm)
    n = len(channels_pcm[0])
    out = bytearray(b"fLaC")

    si = BitWriter()
    si.write(1, 1)       # last metadata block
    si.write(0, 7)       # STREAMINFO
    si.write(34, 24)
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)   # md5
    out += si.getvalue()

    frame_idx = 0
    for start in range(0, n, blocksize):
        size = min(blocksize, n - start)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed blocksize strategy
        if size == blocksize and blocksize in (256, 4096):
            bs_code = {256: 8, 4096: 12}[blocksize]
            bw_bs_extra = None
        else:
            bs_code = 7  # 16-bit blocksize-1 follows
            bw_bs_extra = size - 1
        bw.write(bs_code, 4)
        bw.write(0, 4)   # sample rate from STREAMINFO
        if channel_mode == "independent":
            bw.write(nch - 1, 4)
        elif channel_mode == "left_side":
            bw.write(8, 4)
        elif channel_mode == "mid_side":
            bw.write(10, 4)
        else:
            raise ValueError(channel_mode)
        bw.write({8: 1, 16: 4, 24: 6}[bps], 3)
        bw.write(0, 1)   # reserved
        _utf8_number(bw, frame_idx)
        if bw_bs_extra is not None:
            bw.write(bw_bs_extra, 16)
        bw.write(0, 8)   # crc8 (unchecked)

        # Fast path for the corpus-writer configuration (mono, 16-bit,
        # verbatim, independent): every field before the sample data is a
        # whole number of bytes (32-bit fixed header + UTF-8 frame number
        # + optional 16-bit blocksize + CRC-8 byte + 8-bit subframe
        # header), so the samples can be emitted as one big-endian int16
        # buffer instead of 2·size BitWriter calls.  Bit-identical to the
        # generic path below (asserted by tests/test_synth_accel.py).
        if (nch == 1 and bps == 16 and subframe_kind == "verbatim"
                and channel_mode == "independent" and not sub_kw):
            bw.write(0, 1)   # subframe padding bit
            bw.write(1, 6)   # verbatim
            bw.write(0, 1)   # no wasted bits
            assert bw.nbits == 0  # byte-aligned by construction
            x = np.asarray(channels_pcm[0][start:start + size])
            out += bw.getvalue()
            out += x.astype(">i2").tobytes()
            out += b"\x00\x00"  # crc16 (unchecked)
            frame_idx += 1
            continue

        chs = [np.asarray(c[start:start + size], np.int64)
               for c in channels_pcm]
        if channel_mode == "left_side":
            left, right = chs
            sub_chs = [(left, bps), (left - right, bps + 1)]
        elif channel_mode == "mid_side":
            left, right = chs
            side = left - right
            mid = (left + right) >> 1
            sub_chs = [(mid, bps), (side, bps + 1)]
        else:
            sub_chs = [(c, bps) for c in chs]
        for c, cbps in sub_chs:
            _subframe(bw, c, cbps, subframe_kind, **sub_kw)
        bw.align()
        bw.write(0, 16)  # crc16 (unchecked)
        out += bw.getvalue()
        frame_idx += 1
    return bytes(out)
