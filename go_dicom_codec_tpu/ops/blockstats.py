"""Per-codeblock statistics on device.

The reference computes each codeblock's max bitplane with a scalar scan
(reference jpeg2000/encoder.go:3643 calculateMaxBitplane) inside the
per-codeblock encode loop. Here the whole tile's codeblock grid is reduced
in one launch: reshape [H, W] coefficients into [nby, cbh, nbx, cbw] and
max-reduce — the input to host-side T1 pass planning.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pad_to_multiple(x: jnp.ndarray, mult_h: int, mult_w: int) -> jnp.ndarray:
    """Zero-pad trailing 2 dims up to multiples (pad-and-mask design rule)."""
    h, w = x.shape[-2], x.shape[-1]
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad)


def codeblock_max_abs(coeffs: jnp.ndarray, cb_h: int, cb_w: int) -> jnp.ndarray:
    """[..., H, W] int32 → [..., ceil(H/cb_h), ceil(W/cb_w)] max |coeff|.

    Zero padding never raises a block's max magnitude.
    """
    x = pad_to_multiple(jnp.abs(coeffs), cb_h, cb_w)
    h, w = x.shape[-2], x.shape[-1]
    nby, nbx = h // cb_h, w // cb_w
    x = x.reshape(x.shape[:-2] + (nby, cb_h, nbx, cb_w))
    return x.max(axis=(-3, -1))


def max_bitplane(max_abs: jnp.ndarray) -> jnp.ndarray:
    """Number of magnitude bitplanes per block: ceil(log2(maxabs+1)).

    Matches the reference's numbps layout input (encoder.go:3288-3364):
    0 for an all-zero block.
    """
    # int32 bit-length via floating log2 is inexact near powers of two;
    # use 31 - clz emulation: compare against powers of two.
    v = max_abs.astype(jnp.uint32)
    bits = jnp.zeros(v.shape, dtype=jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        ge = v >= (jnp.uint32(1) << shift)
        bits = bits + jnp.where(ge, shift, 0)
        v = jnp.where(ge, v >> shift, v)
    return jnp.where(max_abs > 0, bits + 1, 0)


@partial(jax.jit, static_argnames=("cb_h", "cb_w"))
def codeblock_stats(coeffs: jnp.ndarray, cb_h: int = 64, cb_w: int = 64):
    """One-launch per-codeblock (max_abs, num_bitplanes)."""
    m = codeblock_max_abs(coeffs, cb_h, cb_w)
    return m, max_bitplane(m)
