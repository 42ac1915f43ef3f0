"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The TPU-specific test layer SURVEY.md §4 calls for: device-vs-host kernel
equivalence under sharding, frame/tile mesh scale-out, and the collective
aggregation used for global rate allocation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from go_dicom_codec_tpu.ops.dwt53 import fwd53_multilevel, inv53_multilevel
from go_dicom_codec_tpu.parallel import (FRAME_AXIS, TILE_AXIS, make_mesh,
                                         frame_sharding, pad_batch_to_devices)
from go_dicom_codec_tpu.pipeline import j2k_lossless_encode_transform


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(8, tile_parallel=2)
    assert m.shape[FRAME_AXIS] == 4 and m.shape[TILE_AXIS] == 2
    m1 = make_mesh(8)
    assert m1.shape[FRAME_AXIS] == 8
    with pytest.raises(ValueError):
        make_mesh(8, tile_parallel=3)


def test_sharded_dwt_matches_single_device(rng):
    """DWT over a frame-sharded batch == per-frame single-device DWT."""
    frames = rng.integers(-2048, 2048, size=(8, 64, 64)).astype(np.int32)
    mesh = make_mesh(8)
    sharded = jax.device_put(jnp.asarray(frames), frame_sharding(mesh))
    out_sharded = np.asarray(jax.jit(
        lambda x: fwd53_multilevel(x, 3))(sharded))
    out_single = np.asarray(fwd53_multilevel(jnp.asarray(frames), 3))
    np.testing.assert_array_equal(out_sharded, out_single)


def test_shard_map_tile_pipeline_with_collective(rng):
    """Full sharded encode-transform step with a psum over the mesh."""
    mesh = make_mesh(8, tile_parallel=2)
    F, T, H, W = 8, 4, 32, 32
    frames = rng.integers(0, 1 << 12, size=(F, T, H, W)).astype(np.int32)

    def step(local):
        f, t = local.shape[0], local.shape[1]
        coeffs, cb_max, cb_bits = j2k_lossless_encode_transform(
            local.reshape(f * t, H, W), levels=2, bits=12, cb=16)
        total_bits = jax.lax.psum(jnp.sum(cb_bits.astype(jnp.int32)),
                                  axis_name=(FRAME_AXIS, TILE_AXIS))
        return coeffs.reshape(f, t, H, W), total_bits

    fn = shard_map(step, mesh=mesh, in_specs=P(FRAME_AXIS, TILE_AXIS),
                   out_specs=(P(FRAME_AXIS, TILE_AXIS), P()),
                   check_rep=False)
    x = jax.device_put(jnp.asarray(frames),
                       NamedSharding(mesh, P(FRAME_AXIS, TILE_AXIS)))
    coeffs, total = jax.jit(fn)(x)
    assert coeffs.shape == (F, T, H, W)

    # reference: unsharded computation
    ref_coeffs, ref_max, ref_bits = j2k_lossless_encode_transform(
        jnp.asarray(frames.reshape(F * T, H, W)), levels=2, bits=12, cb=16)
    np.testing.assert_array_equal(
        np.asarray(coeffs).reshape(F * T, H, W), np.asarray(ref_coeffs))
    assert int(total) == int(np.asarray(ref_bits).sum())


def test_sharded_roundtrip_inverse(rng):
    """fwd + inv DWT under frame sharding is identity."""
    frames = rng.integers(-500, 500, size=(8, 40, 56)).astype(np.int32)
    mesh = make_mesh(8)
    x = jax.device_put(jnp.asarray(frames), frame_sharding(mesh))

    @jax.jit
    def roundtrip(v):
        return inv53_multilevel(fwd53_multilevel(v, 2), 2)

    np.testing.assert_array_equal(np.asarray(roundtrip(x)), frames)


def test_pad_batch_to_devices():
    batch = np.ones((5, 4, 4), dtype=np.int32)
    padded, orig = pad_batch_to_devices(batch, 8)
    assert padded.shape[0] == 8 and orig == 5
    assert (padded[5:] == 0).all()


def test_encode_frames_sharded_byte_identical(rng):
    """The mesh-sharded multi-frame encode produces byte-identical
    codestreams to the scalar single-frame encoder, across all 8
    virtual devices."""
    from go_dicom_codec_tpu.parallel.mesh import (encode_frames_sharded,
                                                  make_mesh)
    from go_dicom_codec_tpu.pipeline import encode_frames_pipelined

    frames = (np.cumsum(rng.integers(-9, 10, (5, 64, 64)), axis=2)
              % 4096).astype(np.int32)
    mesh = make_mesh(tile_parallel=2)
    sharded = encode_frames_sharded(frames, bit_depth=12, levels=3,
                                    mesh=mesh)
    scalar = encode_frames_pipelined(frames, bit_depth=12, levels=3)
    assert len(sharded) == 5
    assert sharded == scalar
