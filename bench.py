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


def _time_once(jfn, frames):
    t0 = time.perf_counter()
    out = jfn(frames)
    np.asarray(out[1])  # readback is the only reliable sync on axon
    return time.perf_counter() - t0


def main() -> None:
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 1 << 12, size=(BATCH, H, W),
                                      dtype=np.int32))

    fn = jax.jit(_chained)
    fn_copy = jax.jit(_chained_copy)
    _time_once(fn, frames)       # compile
    _time_once(fn_copy, frames)  # compile
    # interleaved pairs: the tunnel's throughput drifts minute to minute,
    # so the efficiency ratio is only meaningful within adjacent runs
    px = BATCH * H * W * ITERS
    best_t = best_c = None
    ratios = []
    for _ in range(3):
        tc = _time_once(fn_copy, frames)
        tt = _time_once(fn, frames)
        ratios.append(tc / tt)
        best_t = tt if best_t is None else min(best_t, tt)
        best_c = tc if best_c is None else min(best_c, tc)
    mpx = px / best_t / 1e6
    ceiling = px / best_c / 1e6
    eff = 100 * sorted(ratios)[len(ratios) // 2]
    print(f"x+1 ceiling (same chained harness): {ceiling:.0f} Mpx/s; "
          f"transform reaches {eff:.0f}% of it "
          f"(median of interleaved pairs)", file=sys.stderr)

    print(json.dumps({
        "metric": "j2k_dwt53_quant_stats_encode_throughput",
        "value": round(mpx, 1),
        "unit": "Mpx/s/chip",
        "vs_baseline": round(mpx / 224.0, 2),
    }))


if __name__ == "__main__":
    main()
