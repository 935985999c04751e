"""Liveness probe for the real-TPU tunnel used by the on-chip tests.

The on-chip tests are gated on ``PALLAS_AXON_POOL_IPS`` being set, but
the env var alone does not mean the tunnel is reachable: with the
backend down, ``jax.devices()`` in the spawned subprocess blocks until
the test's own (intentionally generous, up to 45-minute) compile
timeout expires, and the test FAILS instead of skipping.  Probe once
per session with a short deadline and let the tests skip cleanly.
"""

import functools
import os
import subprocess
import sys


@functools.lru_cache(maxsize=None)
def tpu_tunnel_alive(timeout=240) -> bool:
    """True iff a jax TPU-like backend initializes within ``timeout``
    seconds in a clean subprocess (no CPU-forcing env)."""
    if "PALLAS_AXON_POOL_IPS" not in os.environ:
        return False
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; b = jax.default_backend(); "
             "print('TUNNEL-ALIVE' if b != 'cpu' else 'CPU-ONLY')"],
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "TUNNEL-ALIVE" in proc.stdout
