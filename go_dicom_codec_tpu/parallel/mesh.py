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
