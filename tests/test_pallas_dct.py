"""Pallas fused DCT+quant kernel vs the XLA einsum reference.

Interpret mode on the CPU mesh (conftest pins cpu); the real Mosaic
lowering is exercised by tools/device_bench.py on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from go_dicom_codec_tpu.codecs import jpeg_common as jc
from go_dicom_codec_tpu.ops.dct8x8 import (fdct8x8, pad_replicate_to_8,
                                           quantize, to_blocks)
from go_dicom_codec_tpu.ops.pallas_dct import encode_plane_blocks_pallas


@pytest.mark.parametrize("shape", [(64, 128), (64, 136), (33, 17), (8, 8)])
@pytest.mark.parametrize("quality", [50, 90])
def test_pallas_dct_matches_einsum(shape, quality, rng):
    h, w = shape
    img = rng.integers(0, 4096, (h, w)).astype(np.int32)
    q = jc.scale_quant_table(jc.LUMA_QUANT, quality, 255)

    got = encode_plane_blocks_pallas(img, q, level_shift=2048,
                                     interpret=True)
    p = np.asarray(pad_replicate_to_8(jnp.asarray(img))
                   ).astype(np.float32) - 2048
    want = np.asarray(quantize(fdct8x8(to_blocks(jnp.asarray(p))),
                               jnp.asarray(q)))
    d = np.abs(got.reshape(want.shape) - want)
    # summation-order differences can flip the round-half boundary on a
    # handful of coefficients; anything larger is a real defect
    assert d.max() <= 1
    assert (d != 0).mean() < 0.005
