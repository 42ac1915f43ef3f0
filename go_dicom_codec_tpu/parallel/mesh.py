"""Device mesh + sharding for frame/tile batches.

The reference has no distributed layer (SURVEY.md §2.10): frames and tiles
encode in sequential loops. Here those loops are the parallel axes — frames
(data parallel) × tiles (spatial) over a jax.sharding.Mesh, with XLA
collectives for the few cross-shard reductions (aggregate stats). ICI
carries the tile axis; DCN only ever sees independent frame batches.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


FRAME_AXIS = "frames"
TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None,
              tile_parallel: int = 1) -> Mesh:
    """Mesh over (frames, tiles). tile_parallel divides n_devices."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if n % tile_parallel != 0:
        raise ValueError(f"tile_parallel={tile_parallel} must divide {n}")
    grid = devices.reshape(n // tile_parallel, tile_parallel)
    return Mesh(grid, (FRAME_AXIS, TILE_AXIS))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [F, ...] frame batch over the frame axis."""
    return NamedSharding(mesh, P(FRAME_AXIS))


def frame_tile_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [F, T, ...] frame×tile batch over both mesh axes."""
    return NamedSharding(mesh, P(FRAME_AXIS, TILE_AXIS))


def shard_frames(batch: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [F, ...] batch sharded over frames."""
    return jax.device_put(batch, frame_sharding(mesh))


def pad_batch_to_devices(batch: np.ndarray, n: int) -> Tuple[np.ndarray, int]:
    """Pad the leading dim to a multiple of n; returns (padded, orig_len)."""
    f = batch.shape[0]
    pad = (-f) % n
    if pad:
        batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                dtype=batch.dtype)], axis=0)
    return batch, f


def encode_frames_sharded(frames, bit_depth: int = 16,
                          signed: bool = False, levels: int = 5,
                          mesh: Optional[Mesh] = None, params=None):
    """Multi-chip J2K-lossless multi-frame encode.

    The device stage (DC shift + multilevel 5/3) runs ONCE over the whole
    batch, sharded across the mesh's frame axis — XLA partitions the jit
    per-device, each chip transforming its frame shard in parallel; the
    host then entropy-codes each frame. Codestreams are byte-identical to
    the scalar encoder's.

    frames: [F, H, W] grayscale. Pads F up to the mesh size and drops the
    padding on output.
    """
    from ..codecs.jpeg2000 import J2KEncodeParams, J2KEncoder
    from ..codestream import j2k as j2kcs
    from ..pipeline import _pipeline_device_stage

    frames = np.asarray(frames)
    f, h, w = frames.shape
    mesh = mesh or make_mesh()
    nshard = mesh.shape[FRAME_AXIS] * mesh.shape[TILE_AXIS]
    padded, orig = pad_batch_to_devices(frames, nshard)

    p = params or J2KEncodeParams(num_levels=levels)
    p.num_levels = p.clamped_levels(w, h)
    sharding = NamedSharding(mesh, P((FRAME_AXIS, TILE_AXIS)))
    x = jax.device_put(jnp.asarray(padded), sharding)
    coeffs = np.asarray(jax.jit(
        _pipeline_device_stage, static_argnums=(1, 2, 3),
        out_shardings=sharding)(x, bit_depth, signed, p.num_levels))

    enc = J2KEncoder(p)
    siz = j2kcs.SizInfo(xsiz=w, ysiz=h, xtsiz=w, ytsiz=h,
                        components=[(bit_depth, signed, 1, 1)])
    cod = j2kcs.CodInfo(progression=p.progression, num_layers=1, mct=0,
                        num_levels=p.num_levels, cb_width=p.cb_width,
                        cb_height=p.cb_height, transform=1)
    qcd = j2kcs.QcdInfo(style=0, guard_bits=p.guard_bits)
    from ..codecs import j2k_quant as jq
    from ..codecs.j2k_geometry import band_gain
    for (_, band) in jq.band_sequence(p.num_levels):
        qcd.exponents.append(bit_depth + band_gain(band))
    header = bytearray(b"\xff\x4f")
    header += j2kcs.write_siz(siz)
    header += j2kcs.write_cod(cod)
    header += j2kcs.write_qcd(qcd)
    if p.comment:
        header += j2kcs.write_com(p.comment)

    out = []
    for k in range(orig):
        body = enc._encode_tile_entropy(coeffs[k : k + 1], (0, 0, w, h),
                                        cod, qcd, bit_depth)
        out.append(bytes(header) + j2kcs.write_tile_part(0, body)
                   + j2kcs.EOC.to_bytes(2, "big"))
    return out
