"""Minimal FLAC *encoder* — test fixture for the native decoder.

Produces spec-conformant streams exercising the decoder paths: CONSTANT,
VERBATIM, FIXED(0-2) and LPC subframes, Rice residuals (with partition
order 0), mono and independent stereo, 16-bit. Not used by the framework
itself; only tests import it.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def write_rice(self, value: int, param: int):
        zz = (value << 1) if value >= 0 else ((-value) << 1) - 1
        self.write_unary(zz >> param)
        if param:
            self.write(zz & ((1 << param) - 1), param)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_extra = 1
    while bits > 6 * n_extra + (6 - n_extra):
        n_extra += 1
    lead = (0xFF << (7 - n_extra)) & 0xFF
    lead |= n >> (6 * n_extra)
    out.append(lead & 0xFF)
    for i in range(n_extra - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str, rice_param: int = 6):
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        coeffs = {0: [], 1: [1], 2: [2, -1]}[order]
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(rice_param, 4)
        for i in range(order, len(x)):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coeffs))
            bw.write_rice(int(x[i]) - pred, rice_param)
    elif mode == "lpc2":
        order, precision, shift = 2, 15, 12
        coeffs = [int(1.6 * (1 << shift)), int(-0.64 * (1 << shift))]
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coeffs:
            bw.write_signed(c, precision)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(rice_param, 4)
        for i in range(order, len(x)):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coeffs)) >> shift
            bw.write_rice(int(x[i]) - pred, rice_param)
    else:
        raise ValueError(mode)


def encode_flac(
    samples: np.ndarray,  # (n,) or (n, channels) int16-range ints
    sample_rate: int = 22050,
    bps: int = 16,
    block_size: int = 4096,
    subframe_mode: str = "fixed1",
) -> bytes:
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)  # min/max block size
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # 20 bits rate | 3 bits channels-1 | 5 bits bps-1 | 36 bits total
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_idx = 0
    pos = 0
    while pos < n:
        count = min(block_size, n - pos)
        block = x[pos : pos + count]
        header = BitWriter()
        header.write(0x3FFE, 14)
        header.write(0, 1)  # reserved
        header.write(0, 1)  # fixed blocksize stream
        header.write(7, 4)  # block size: 16-bit - 1 follows
        header.write(0, 4)  # sample rate: from streaminfo
        header.write(channels - 1, 4)  # independent channels
        header.write(4, 3)  # 16 bps
        header.write(0, 1)
        hdr_bytes = bytearray(header.tobytes())
        hdr_bytes += _utf8_number(frame_idx)
        hdr_bytes += struct.pack(">H", count - 1)
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = BitWriter()
        mode = subframe_mode
        for c in range(channels):
            ch = block[:, c]
            use = mode
            if mode.startswith("fixed") and count <= int(mode[-1]):
                use = "verbatim"
            _write_subframe(body, ch, bps, use)
        body.align()
        frame = bytes(hdr_bytes) + body.tobytes() + b"\x00\x00"  # CRC16 unverified
        out += frame
        pos += count
        frame_idx += 1
    return bytes(out)
