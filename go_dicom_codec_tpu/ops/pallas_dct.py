"""Fused 8×8 DCT + quantization as a Pallas TPU kernel.

The XLA einsum path (ops/dct8x8.py) is the default device stage; this
kernel is the hand-scheduled alternative that keeps a whole (8, 128)
tile — 16 MCU blocks — resident in VMEM across level shift, both DCT
matmuls, and the divisor rounding, so HBM sees exactly one read and one
write per sample. The per-block right-multiplication by Dᵀ is expressed
as one (8,128)×(128,128) MXU matmul against a block-diagonal Dᵀ: the
MXU is 128×128, so the "wasted" off-diagonal lanes are free compared to
sixteen 8×8 products.

Measured on one v5e chip (chained fori_loop, 32×512×512 batch): this
kernel sustains ~3.0 Gpx/s vs ~4.4 Gpx/s for the XLA einsum path — XLA
stays the default. The gap is structural, not scheduling: an 8-point
DCT contracts only 8 of the MXU's 128 systolic rows whichever way the
tiles are laid out, and XLA's batched-small-matmul lowering handles
that shape better than the block-diagonal formulation (the same
conclusion round 1 reached for a fused Pallas DWT, ops/dwt53.py:17-27
— kept here as working code rather than a claim).

Used by tools/device_bench.py for the XLA-vs-Pallas comparison;
correctness is pinned against the einsum path in
tests/test_pallas_dct.py (interpret mode on CPU, real lowering on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dct8x8 import _D_np

LANE = 128
BLOCKS_PER_TILE = LANE // 8


def _block_diag_dt() -> np.ndarray:
    """[128, 128] block-diagonal of Dᵀ (16 copies)."""
    bd = np.zeros((LANE, LANE), dtype=np.float32)
    for b in range(BLOCKS_PER_TILE):
        bd[b * 8 : b * 8 + 8, b * 8 : b * 8 + 8] = _D_np.T
    return bd


def _kernel(x_ref, d_ref, bdt_ref, qt_ref, shift_ref, o_ref):
    xt = x_ref[0].astype(jnp.float32) - shift_ref[0]          # [8, 128]
    y = jnp.dot(d_ref[...], xt, preferred_element_type=jnp.float32)
    z = jnp.dot(y, bdt_ref[...], preferred_element_type=jnp.float32)
    r = z / qt_ref[...]
    # round half away from zero (reference encoder.go:458-465)
    o_ref[0] = jnp.where(r >= 0, jnp.floor(r + 0.5),
                         -jnp.floor(-r + 0.5)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("level_shift", "interpret"))
def fdct8x8_quant_pallas(x: jnp.ndarray, qtable: jnp.ndarray,
                         level_shift: int = 128,
                         interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] int samples → [B, H, W] int32 quantized DCT blocks
    (raster layout within each 8×8 block). H % 8 == 0, W % 128 == 0 —
    use the wrapper below for arbitrary shapes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = x.shape
    assert h % 8 == 0 and w % LANE == 0, (h, w)
    d = jnp.asarray(_D_np)
    bdt = jnp.asarray(_block_diag_dt())
    qt = jnp.tile(jnp.asarray(qtable, dtype=jnp.float32).reshape(8, 8),
                  (1, BLOCKS_PER_TILE))  # _qtile, traced
    shift = jnp.full((8, LANE), np.float32(level_shift))

    grid = (b, h // 8, w // LANE)
    tile = pl.BlockSpec((1, 8, LANE), lambda bi, i, j: (bi, i, j),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda bi, i, j: (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=grid,
        in_specs=[tile, const((8, 8)), const((LANE, LANE)),
                  const((8, LANE)), const((8, LANE))],
        out_specs=tile,
        interpret=interpret,
    )(x, d, bdt, qt, shift)


def encode_plane_blocks_pallas(plane, qtable, level_shift: int = 128,
                               interpret: bool = False):
    """Arbitrary [H, W] plane → quantized coefficient blocks
    [nby, nbx, 8, 8] int32 via the Pallas kernel (pads by replication
    like ops/dct8x8.pad_replicate_to_8, plus lane padding)."""
    import numpy as _np

    p = _np.asarray(plane)
    h, w = p.shape
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    wl = -(-w8 // LANE) * LANE
    p = _np.pad(p, ((0, h8 - h), (0, wl - w)), mode="edge")
    out = _np.asarray(fdct8x8_quant_pallas(
        jnp.asarray(p[None].astype(_np.int32)), jnp.asarray(qtable),
        level_shift=level_shift, interpret=interpret))[0]
    out = out[:h8, :w8]
    return out.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
