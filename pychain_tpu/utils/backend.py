"""Backend liveness helpers for tunneled TPU environments.

On this class of machine a site-hook registers a remote ("axon"
tunnel) TPU backend whenever ``PALLAS_AXON_POOL_IPS`` is set; when the
tunnel is unreachable, the first ``jax.devices()`` call blocks
indefinitely rather than failing.  Anything that might run under that
env (benchmarks, examples, on-chip tests, driver entry points) should
probe liveness in a subprocess with a deadline first and degrade
cleanly.
"""

from __future__ import annotations

import os
import subprocess
import sys

TUNNEL_ENV_VAR = "PALLAS_AXON_POOL_IPS"


def tunnel_env_set() -> bool:
    return bool(os.environ.get(TUNNEL_ENV_VAR))


_PROBE_VERDICT: list = []  # one verdict per process, whatever the timeout


def tpu_tunnel_alive(timeout: int = 240) -> bool:
    """True iff a non-CPU jax backend initializes within ``timeout``
    seconds in a clean subprocess (no CPU-forcing env).  False when the
    tunnel env var is unset, when initialization fails, or when it is
    still blocked at the deadline.  Cached ONCE per process regardless
    of ``timeout`` — different call sites (240s vs 300s) must not each
    pay their own multi-minute probe against a dead tunnel.
    """
    if _PROBE_VERDICT:
        return _PROBE_VERDICT[0]
    verdict = _probe(timeout)
    _PROBE_VERDICT.append(verdict)
    return verdict


def _probe(timeout: int) -> bool:
    if not tunnel_env_set():
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
