#!/usr/bin/env python
"""Headline benchmark: JPEG 2000 lossless DWT+stats encode throughput.

Measures the north-star metric from BASELINE.json — the device-side J2K
lossless encode transform (DC shift + multilevel 5/3 DWT + per-codeblock
max-bitplane stats) in Mpixels/s on one chip. Target ≥1 Gpx/s on v5e.

Methodology (round-2 verdict item #5): iterations are chained
device-resident inside ONE jit via lax.fori_loop, so the number
amortizes tunnel/dispatch latency and reflects the on-chip rate; the
same harness re-measures the x+1 memory-bound ceiling for comparison
(reported on stderr, with the per-dispatch legacy number).

vs_baseline compares against the reference's fastest *measured*
throughput (JPEG Baseline encode ≈224 Mpx/s single-core Go, BASELINE.md;
its J2K path is structurally slower and unpublished).

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from go_dicom_codec_tpu.pipeline import j2k_lossless_encode_transform

BATCH, H, W, LEVELS, ITERS = 32, 512, 512, 5, 30


def _chained(x):
    """ITERS transform steps chained on device: one dispatch total.

    Each step is the full encode device stage per the north star's
    "DWT+quant" wording (round-2 verdict item #5): DC shift + multilevel
    5/3 + per-codeblock max/bitplane stats + deadzone quantization of
    the coefficients (sign-magnitude deadzone with a fixed-point step,
    the form the lossy path and PCRD slope scaling consume).
    """

    def body(_, carry):
        frames, acc = carry
        coeffs, cb_max, cb_bits = j2k_lossless_encode_transform(
            frames, levels=LEVELS, bits=16, signed=False, cb=64)
        # deadzone quant: q = sign(c) * floor(|c| * (1/Δ))  (Δ = 2 here,
        # fixed-point reciprocal multiply like the device lossy stage)
        mag = jnp.abs(coeffs)
        q = jnp.sign(coeffs) * ((mag * 32768) >> 16)
        # feed quantized coefficients back as the next batch (keeps the
        # loop device-resident); accumulate so nothing is dead code
        return q, acc + jnp.sum(cb_bits.astype(jnp.int32)) + q[0, 0, 0]

    out, acc = jax.lax.fori_loop(0, ITERS, body,
                                 (x, jnp.int32(0)))
    return out, acc


def _chained_copy(x):
    """The x+1 ceiling measured with the identical chained harness."""

    def body(_, carry):
        frames, acc = carry
        y = frames + 1
        return y, acc + y[0, 0, 0]

    return jax.lax.fori_loop(0, ITERS, body, (x, jnp.int32(0)))


def _run(jfn, frames, repeats=3):
    out = jfn(frames)
    np.asarray(out[1])  # readback is the only reliable sync on axon
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jfn(frames)
        np.asarray(out[1])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return BATCH * H * W * ITERS / best / 1e6


def main() -> None:
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 1 << 12, size=(BATCH, H, W),
                                      dtype=np.int32))

    mpx = _run(jax.jit(_chained), frames)
    ceiling = _run(jax.jit(_chained_copy), frames, repeats=2)
    print(f"x+1 ceiling (same chained harness): {ceiling:.0f} Mpx/s; "
          f"transform reaches {100 * mpx / max(ceiling, 1):.0f}% of it",
          file=sys.stderr)

    print(json.dumps({
        "metric": "j2k_dwt53_quant_stats_encode_throughput",
        "value": round(mpx, 1),
        "unit": "Mpx/s/chip",
        "vs_baseline": round(mpx / 224.0, 2),
    }))


if __name__ == "__main__":
    main()
