"""Decoder tests on inputs the repo's own encoder NEVER touched.

Role of reference jpeg2000/testdata/encoded_generator.go,
simple_generator.go, multilevel_generator.go, multitile_generator.go,
rgb_generator.go: codestreams are hand-packed byte-by-byte here (raw
struct.pack, not codestream/j2k.py writers), so the decoder cannot
share a compensating bug with the encoder on these paths. An
independent, spec-direct MQ encoder (T.800 Annex C flowcharts,
written from the standard inside this file) cross-checks the MQ
decoder at the entropy layer.
"""

import struct

import numpy as np
import pytest

from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder

# ------------------------------------------------------------------
# hand-packed codestream builders (bytes only — no library writers)
# ------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _siz(w, h, bits, ncomp=1, tw=None, th=None):
    tw = tw or w
    th = th or h
    p = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, ncomp)
    for _ in range(ncomp):
        p += bytes([bits - 1, 1, 1])  # unsigned, no subsampling
    return _seg(0xFF51, p)


def _cod(levels, mct=0):
    # LRCP, 1 layer, 64x64 code-blocks, no precincts, 5/3 reversible
    p = bytes([0, 0]) + struct.pack(">H", 1) + bytes(
        [mct, levels, 4, 4, 0, 1])
    return _seg(0xFF52, p)


def _qcd(levels, bits):
    # style 0 (no quantization), 2 guard bits, exponents = bits + gain
    p = bytes([0 | (2 << 5)])
    p += bytes([(bits + 0) << 3])  # LL
    for _ in range(levels):
        p += bytes([(bits + 1) << 3, (bits + 1) << 3, (bits + 2) << 3])
    return _seg(0xFF5C, p)


def _tile(index: int, body: bytes) -> bytes:
    sot = struct.pack(">HHHIBB", 0xFF90, 10, index, 12 + 2 + len(body),
                      0, 1)
    return sot + struct.pack(">H", 0xFF93) + body


def _stream(w, h, bits, levels, body_per_tile, ncomp=1, mct=0,
            tw=None, th=None, ntiles=1):
    s = b"\xff\x4f" + _siz(w, h, bits, ncomp, tw, th) + \
        _cod(levels, mct) + _qcd(levels, bits)
    for t in range(ntiles):
        s += _tile(t, body_per_tile)
    return s + b"\xff\xd9"


def _decode(stream):
    arr, siz, cod = J2KDecoder().decode(stream)
    return arr


# Empty packets: a single 0 bit, padded to a byte → 0x00 per packet.
# With LRCP, 1 layer, 1 component: one packet per resolution level.
def _empty_packets(levels):
    return b"\x00" * (levels + 1)


def test_simple_0level_empty_packets():
    """8×8, 0 levels, empty packet: all-zero coefficients decode to the
    DC midpoint (hand-built stream; role of GenerateSimpleJ2K)."""
    arr = _decode(_stream(8, 8, 8, 0, _empty_packets(0)))
    np.testing.assert_array_equal(arr[:, :, 0], 128)


def test_multilevel_empty_packets():
    """17×13, 3 levels (ragged windows), all packets empty
    (role of GenerateMultilevelJ2K)."""
    arr = _decode(_stream(17, 13, 12, 3, _empty_packets(3)))
    np.testing.assert_array_equal(arr[:, :, 0], 1 << 11)


def test_multitile_empty_packets():
    """16×16 image as 2×2 tiles of 8×8, each tile's packets empty
    (role of GenerateMultitileJ2K)."""
    arr = _decode(_stream(16, 16, 8, 1, _empty_packets(1),
                          tw=8, th=8, ntiles=4))
    np.testing.assert_array_equal(arr[:, :, 0], 128)


def test_rgb_rct_empty_packets():
    """3-component with RCT: zero YUV inverts to the gray midpoint
    (role of GenerateRGBJ2K)."""
    levels = 1
    body = b"\x00" * ((levels + 1) * 3)  # LRCP: res-major, comp-minor
    arr = _decode(_stream(8, 8, 8, levels, body, ncomp=3, mct=1))
    assert arr.shape == (8, 8, 3)
    np.testing.assert_array_equal(arr, 128)


def test_truncated_after_header_resilient():
    """Header-only stream (no tile data) must not crash resilient mode."""
    s = b"\xff\x4f" + _siz(8, 8, 8) + _cod(0, 0) + _qcd(0, 8)
    arr, _, _ = J2KDecoder(resilient=True).decode(s + b"\xff\xd9")
    assert arr.shape == (8, 8, 1)


# ------------------------------------------------------------------
# independent MQ encoder (ISO/IEC 15444-1 Annex C, written from the
# spec flowcharts — NOT from entropy/mq.py)
# ------------------------------------------------------------------

# Table C.2 (spec constants)
QE = [0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
      0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
      0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
      0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
      0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
      0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601]
NMPS = [1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18,
        19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
        35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46]
NLPS = [1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15,
        16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
        31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46]
SWITCH = [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 0]


class SpecMQEncoder:
    """Annex C software-conventions encoder (C.3.1-C.3.4 flowcharts)."""

    def __init__(self, nctx):
        self.I = [0] * nctx
        self.MPS = [0] * nctx
        # INITENC
        self.A = 0x8000
        self.C = 0
        self.CT = 12
        self.B = []  # BP points at B[-1]; B starts "before" the data

    # BYTEOUT (C.3.2, software conventions)
    def _byteout(self):
        if self.B and self.B[-1] == 0xFF:
            self.B.append((self.C >> 20) & 0xFF)
            self.C &= 0xFFFFF
            self.CT = 7
        else:
            if self.C < 0x8000000:
                self.B.append((self.C >> 19) & 0xFF)
                self.C &= 0x7FFFF
                self.CT = 8
            else:
                if self.B:
                    self.B[-1] += 1
                else:
                    self.B.append(1)  # carry into the leading byte
                if self.B[-1] == 0xFF:
                    self.C &= 0x7FFFFFF
                    self.B.append((self.C >> 20) & 0xFF)
                    self.C &= 0xFFFFF
                    self.CT = 7
                else:
                    self.B.append((self.C >> 19) & 0xFF)
                    self.C &= 0x7FFFF
                    self.CT = 8

    def _renorme(self):
        while True:
            self.A <<= 1
            self.C <<= 1
            self.CT -= 1
            if self.CT == 0:
                self._byteout()
            if self.A & 0x8000:
                break

    def encode(self, d, cx):
        i = self.I[cx]
        qe = QE[i]
        self.A -= qe
        if d == self.MPS[cx]:  # CODEMPS
            if self.A & 0x8000:
                self.C += qe
                return
            if self.A < qe:
                self.A = qe
            else:
                self.C += qe
            self.I[cx] = NMPS[i]
            self._renorme()
        else:  # CODELPS
            if self.A < qe:
                self.C += qe
            else:
                self.A = qe
            if SWITCH[i]:
                self.MPS[cx] = 1 - self.MPS[cx]
            self.I[cx] = NLPS[i]
            self._renorme()

    def flush(self):
        # SETBITS + FLUSH (C.3.4)
        tempc = self.C + self.A
        self.C |= 0xFFFF
        if self.C >= tempc:
            self.C -= 0x8000
        self.C <<= self.CT
        self._byteout()
        self.C <<= self.CT
        self._byteout()
        if self.B and self.B[-1] == 0xFF:
            self.B.pop()
        return bytes(self.B)


@pytest.mark.parametrize("seed", range(5))
def test_spec_mq_encoder_decodes_with_repo_decoder(seed, rng):
    """Random decision streams encoded by the spec-direct MQ encoder
    above decode bit-exactly with entropy/mq.MQDecoder. Neither side
    shares code; only the published standard connects them."""
    from go_dicom_codec_tpu.entropy.mq import MQDecoder

    r = np.random.default_rng(900 + seed)
    n = int(r.integers(50, 600))
    nctx = 19
    ctxs = r.integers(0, nctx, n)
    bits = r.integers(0, 2, n)

    enc = SpecMQEncoder(nctx)
    for b, cx in zip(bits, ctxs):
        enc.encode(int(b), int(cx))
    data = enc.flush()

    dec = MQDecoder(data)
    got = [dec.decode(int(cx)) for cx in ctxs]
    assert got == [int(b) for b in bits]
