"""Foreign-encoder interop: decode a real Kakadu clinical codestream.

test-data/ct1_kakadu.j2c is the raw JPEG 2000 codestream extracted from
the reference's CT1_J2KI DICOM fixture (reference test-data/CT1_J2KI),
produced by Kakadu 2.2 (COM marker): 512×512, 16-bit signed, 9/7 lossy,
5 levels, LRCP, single tile, scalar-expounded quantization.

The decode is pinned by checksum — the role of the reference's
byte-parity HTJ2K interop manifest (htj2k/interop_fixture_test.go) for
the classic-J2K path: any regression in codestream parsing, T2, T1/MQ,
dequantization, or the 9/7 inverse changes these pixels.
"""

import hashlib
import os

import numpy as np
import pytest

from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "test-data",
                       "ct1_kakadu.j2c")

PINNED_SHA256 = "531339e26d7b4721e90aae8ae77ab6cd8ec3642c0ec3e9a233d210b9945eceb5"


@pytest.fixture(scope="module")
def decoded():
    data = open(FIXTURE, "rb").read()
    arr, siz, cod = J2KDecoder().decode(data)
    return arr[:, :, 0], siz, cod


def test_kakadu_header(decoded):
    _, siz, cod = decoded
    assert (siz.xsiz, siz.ysiz) == (512, 512)
    assert siz.components[0] == (16, True, 1, 1)  # 16-bit signed
    assert cod.num_levels == 5 and cod.transform == 0  # 9/7 lossy
    assert cod.progression == 0  # LRCP


def test_kakadu_decode_pinned(decoded):
    a, _, _ = decoded
    assert a.shape == (512, 512)
    # plausible CT (Hounsfield-like) dynamic range
    assert -3000 < a.min() < -1000 and 1000 < a.max() < 4000
    # real anatomy: strong spatial coherence
    af = a.astype(float)
    corr = np.corrcoef(af[:, :-1].ravel(), af[:, 1:].ravel())[0, 1]
    assert corr > 0.97
    # pinned pixel checksum
    sha = hashlib.sha256(a.astype("<i4").tobytes()).hexdigest()
    assert sha == PINNED_SHA256


def test_kakadu_resilient_truncation(decoded):
    """Truncated foreign stream decodes partially in resilient mode."""
    data = open(FIXTURE, "rb").read()
    arr, _, _ = J2KDecoder(resilient=True).decode(data[: len(data) // 2])
    full = decoded[0].astype(float)
    part = arr[:, :, 0].astype(float)
    # coarse image recovered: still strongly correlated with the full one
    assert np.corrcoef(part.ravel(), full.ravel())[0, 1] > 0.8
