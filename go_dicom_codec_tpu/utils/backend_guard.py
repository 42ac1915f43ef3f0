"""Backend liveness guard for the CLI tools.

The axon tunnel can wedge so hard that the first device use blocks
forever inside a C call (observed for multi-hour stretches in round 4
— even `np.asarray(jnp.arange(8))` never returns, and SIGALRM cannot
interrupt it). Any tool that would otherwise hang probes the default
backend in a SUBPROCESS with a timeout first, and falls back to the
CPU platform with a loud warning when the probe dies.

Must be called BEFORE the process touches any jax device: platform
selection only works via jax.config.update("jax_platforms", ...)
prior to backend initialization (see CLAUDE.md).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = ("import numpy, jax, jax.numpy as jnp; "
          "numpy.asarray(jnp.arange(4))")


def ensure_live_backend(timeout_s: float = 60.0) -> bool:
    """Probe the default jax backend; force CPU if it is unresponsive.

    Returns True when the default backend is usable (or already CPU),
    False when the probe timed out/failed and the process was switched
    to the CPU platform. No-op (True) when JAX_PLATFORMS already pins
    cpu.
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # env alone is not sufficient under the axon sitecustomize —
        # pin it via config too (safe: no device touched yet)
        jax.config.update("jax_platforms", "cpu")
        return True
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            timeout=timeout_s, capture_output=True, env=dict(os.environ))
        if proc.returncode == 0:
            return True
        reason = f"probe rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"probe hung >{timeout_s:.0f}s (wedged tunnel?)"
    except OSError as e:  # pragma: no cover - exotic spawn failures
        reason = f"probe failed to spawn: {e}"
    print(f"WARNING: default jax backend unresponsive ({reason}); "
          "falling back to the CPU platform for this run",
          file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")
    return False
