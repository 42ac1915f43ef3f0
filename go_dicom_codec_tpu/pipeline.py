"""Device-side encode transform pipelines (the flagship compute step).

The JPEG 2000 lossless encode transform — DC shift → (RCT) → multilevel 5/3
DWT → per-codeblock stats — is the north-star kernel (BASELINE.json): one
jit launch over a whole batch of frames replaces the reference's sequential
tile loop (jpeg2000/encoder.go:1986-2018 writeTiles → transformTile:2213).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .ops.blockstats import codeblock_max_abs, max_bitplane
from .ops.dwt53 import fwd53_multilevel
from .ops.mct import dc_level_shift, rct_forward


def j2k_lossless_encode_transform(frames: jnp.ndarray, levels: int = 5,
                                  bits: int = 16, signed: bool = False,
                                  cb: int = 64):
    """Grayscale J2K lossless device stage: [B, H, W] int32 → coeffs + stats.

    Returns (coeffs [B,H,W] packed-Mallat, cb_max [B,nby,nbx],
    cb_bitplanes [B,nby,nbx]).
    """
    x = dc_level_shift(frames.astype(jnp.int32), bits, signed)
    coeffs = fwd53_multilevel(x, levels)
    m = codeblock_max_abs(coeffs, cb, cb)
    return coeffs, m, max_bitplane(m)


@partial(jax.jit, static_argnames=("levels", "bits", "signed", "cb"))
def j2k_lossless_encode_transform_jit(frames, levels: int = 5, bits: int = 16,
                                      signed: bool = False, cb: int = 64):
    return j2k_lossless_encode_transform(frames, levels, bits, signed, cb)


def j2k_rgb_lossless_encode_transform(frames: jnp.ndarray, levels: int = 5,
                                      bits: int = 8, cb: int = 64):
    """RGB J2K lossless device stage: [B, 3, H, W] int32 → 3×(coeffs, stats).

    DC shift → RCT (ops/mct.py) → per-component multilevel 5/3.
    """
    x = dc_level_shift(frames.astype(jnp.int32), bits, signed=False)
    y, u, v = rct_forward(x[:, 0], x[:, 1], x[:, 2])
    comps = jnp.stack([y, u, v], axis=1)
    coeffs = fwd53_multilevel(comps, levels)
    m = codeblock_max_abs(coeffs, cb, cb)
    return coeffs, m, max_bitplane(m)
