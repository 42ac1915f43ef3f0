#!/usr/bin/env python
"""Headline benchmark: JPEG 2000 lossless DWT+stats encode throughput.

Measures the north-star metric from BASELINE.json — the device-side J2K
lossless encode transform (DC shift + multilevel 5/3 DWT + per-codeblock
max-bitplane stats) in Mpixels/s on one chip. Target ≥1 Gpx/s on v5e.

vs_baseline compares against the reference's fastest *measured* throughput
(JPEG Baseline encode ≈224 Mpx/s single-core Go, BASELINE.md; its J2K path
is structurally slower and unpublished).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from go_dicom_codec_tpu.pipeline import j2k_lossless_encode_transform_jit


def main() -> None:
    batch, h, w, levels = 32, 512, 512, 5
    rng = np.random.default_rng(0)
    # 16-bit CT-like content
    frames = jnp.asarray(rng.integers(0, 1 << 12, size=(batch, h, w),
                                      dtype=np.int32))

    def step(x):
        coeffs, cb_max, cb_bits = j2k_lossless_encode_transform_jit(
            x, levels=levels, bits=16, signed=False, cb=64)
        return coeffs, cb_max, cb_bits

    # warmup/compile; np.asarray readback is the only reliable sync point
    # over the axon relay (block_until_ready returns early there).
    out = step(frames)
    np.asarray(out[2])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(frames)
    np.asarray(out[2])  # drains the FIFO device queue
    dt = time.perf_counter() - t0

    mpx = batch * h * w * iters / dt / 1e6
    print(json.dumps({
        "metric": "j2k_lossless_dwt53_encode_throughput",
        "value": round(mpx, 1),
        "unit": "Mpx/s/chip",
        "vs_baseline": round(mpx / 224.0, 2),
    }))


if __name__ == "__main__":
    main()
