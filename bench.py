#!/usr/bin/env python
"""Headline benchmark: JPEG 2000 lossless DWT transform throughput.

Measures the north-star metric from BASELINE.json — the device-side J2K
encode transform (DC shift + multilevel 5/3 DWT + deadzone quant +
per-codeblock max-bitplane stats) in Mpixels/s on one chip, plus (since
round 4, verdict item #5) the DECODE direction (dequant + multilevel
inverse 5/3 + inverse DC shift). Target ≥1 Gpx/s on v5e.

Methodology (round-2 verdict item #5): iterations are chained
device-resident inside ONE jit via lax.fori_loop, so the number
amortizes tunnel/dispatch latency and reflects the on-chip rate; the
same harness re-measures the x+1 memory-bound ceiling for comparison.

Epilogue-fusion note (round-3 verdict item #5): quantization now runs
BEFORE the codeblock stats so one elementwise pass feeds both consumers
— measured on the chip this is traffic-neutral vs the old ordering
(67.1% vs 67.8% of the same-run ceiling), i.e. XLA was already fusing
the epilogue into the final DWT level; there is no separate full read
to recover.

vs_baseline compares against the reference's fastest *measured*
throughput (JPEG Baseline encode ≈224 Mpx/s single-core Go, BASELINE.md;
its J2K path is structurally slower and unpublished).

Prints exactly one JSON line on stdout (decode direction rides in the
same line as decode_* fields).
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from go_dicom_codec_tpu.ops.blockstats import codeblock_max_abs, max_bitplane
from go_dicom_codec_tpu.ops.dwt53 import fwd53_multilevel, inv53_multilevel
from go_dicom_codec_tpu.ops.mct import dc_level_shift, inv_dc_level_shift

BATCH, H, W, LEVELS, ITERS = 32, 512, 512, 5, 30


def _chained_encode(x):
    """ITERS encode transform steps chained on device: one dispatch.

    DC shift + multilevel 5/3 + deadzone quant (sign-magnitude with a
    fixed-point reciprocal step, the form the lossy path and PCRD slope
    scaling consume) + per-codeblock max/bitplane stats computed FROM
    the quantized magnitudes (what the entropy stage actually codes).
    """

    def body(_, carry):
        frames, acc = carry
        s = dc_level_shift(frames, 16, False)
        c = fwd53_multilevel(s, LEVELS)
        mag = jnp.abs(c)
        q = jnp.sign(c) * ((mag * 32768) >> 16)
        m = codeblock_max_abs(q, 64, 64)
        bits = max_bitplane(m)
        # feed quantized coefficients back as the next batch (keeps the
        # loop device-resident); accumulate so nothing is dead code
        return q, acc + jnp.sum(bits.astype(jnp.int32)) + q[0, 0, 0]

    return jax.lax.fori_loop(0, ITERS, body, (x, jnp.int32(0)))


def _chained_decode(x):
    """ITERS decode transform steps: dequant + inverse 5/3 + inv shift +
    range clip — exactly the production decode epilogue
    (pack_decoded_pixels clips to the declared range). The clipped
    frame feeds back as the next batch (values stay <= 65535, so the
    dequant doubling never overflows int32); the old extra `>> 1` was
    loop plumbing, not decode work, and cost one full elementwise pass
    per iteration."""

    def body(_, carry):
        q, acc = carry
        c = q * 2                      # dequant multiply (Δ = 2)
        r = inv53_multilevel(c, LEVELS)
        p = inv_dc_level_shift(r, 16, False)
        return jnp.clip(p, 0, 65535), acc + p[0, 0, 0]

    return jax.lax.fori_loop(0, ITERS, body, (x, jnp.int32(0)))


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

    fn = jax.jit(_chained_encode)
    fn_dec = jax.jit(_chained_decode)
    fn_copy = jax.jit(_chained_copy)
    for f in (fn, fn_dec, fn_copy):
        _time_once(f, frames)  # compile
    # interleaved rounds: the tunnel's throughput drifts minute to
    # minute, so ratios are only meaningful within adjacent runs
    px = BATCH * H * W * ITERS
    best = {"enc": None, "dec": None, "ceil": None}
    enc_ratios, dec_ratios = [], []
    for _ in range(3):
        tc = _time_once(fn_copy, frames)
        te = _time_once(fn, frames)
        td = _time_once(fn_dec, frames)
        enc_ratios.append(tc / te)
        dec_ratios.append(tc / td)
        for k, t in (("enc", te), ("dec", td), ("ceil", tc)):
            best[k] = t if best[k] is None else min(best[k], t)
    mpx = px / best["enc"] / 1e6
    dec_mpx = px / best["dec"] / 1e6
    ceiling = px / best["ceil"] / 1e6
    eff = 100 * sorted(enc_ratios)[len(enc_ratios) // 2]
    deff = 100 * sorted(dec_ratios)[len(dec_ratios) // 2]
    print(f"x+1 ceiling (same chained harness): {ceiling:.0f} Mpx/s; "
          f"encode transform reaches {eff:.0f}% of it, decode "
          f"{deff:.0f}% (medians of interleaved triples)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "j2k_dwt53_quant_stats_encode_throughput",
        "value": round(mpx, 1),
        "unit": "Mpx/s/chip",
        "vs_baseline": round(mpx / 224.0, 2),
        "decode_value": round(dec_mpx, 1),
        "decode_pct_of_ceiling": round(deff, 1),
        "encode_pct_of_ceiling": round(eff, 1),
    }))


_WATCHDOG_S = int(os.environ.get("GDCT_BENCH_WATCHDOG_S", "480"))


def _spawn_watchdog() -> int:
    """Forked watchdog: kill this process if it is still alive after
    _WATCHDOG_S seconds. The axon tunnel can wedge so hard that even
    jnp.arange never returns (observed for multi-hour stretches in
    round 4), and the hang sits inside a C call that never re-enters
    the interpreter — SIGALRM handlers don't run, so only an external
    process can end it. No JSON is printed on timeout — a fabricated
    number would be worse than a failed run."""
    ppid = os.getpid()
    pid = os.fork()
    if pid:
        return pid
    deadline = time.monotonic() + _WATCHDOG_S
    while time.monotonic() < deadline:
        time.sleep(2)
        try:
            os.kill(ppid, 0)
        except OSError:
            os._exit(0)  # parent finished
    try:
        os.write(2, (f"bench.py watchdog: no result within {_WATCHDOG_S}s"
                     " — axon tunnel likely wedged; killing\n").encode())
        os.kill(ppid, signal.SIGKILL)
    except OSError:
        pass
    os._exit(1)


if __name__ == "__main__":
    wd = _spawn_watchdog()
    try:
        main()
    finally:
        os.kill(wd, signal.SIGKILL)
