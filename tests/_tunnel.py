"""Liveness probe for the real-TPU tunnel used by the on-chip tests.

The on-chip tests are gated on ``PALLAS_AXON_POOL_IPS`` being set, but
the env var alone does not mean the tunnel is reachable: with the
backend down, ``jax.devices()`` in the spawned subprocess blocks until
the test's own (intentionally generous, up to 45-minute) compile
timeout expires, and the test FAILS instead of skipping.  Probe once
per session with a short deadline and let the tests skip cleanly.
"""

from pychain_tpu.utils.backend import tpu_tunnel_alive  # noqa: F401
