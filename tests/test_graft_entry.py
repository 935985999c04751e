"""Driver-entry contract: the dryrun must exercise the flagship engine
ladder, not the gather fallback (VERDICT r4 Weak #3).

``__graft_entry__._setup`` passes ChainGraphBatch pytrees; under
``impl="auto"`` the shared prob-domain denominator resolves to the
factorized family (Pallas tiers on a real TPU backend) and the linear
numerators to the closed form.  ``dryrun_multichip(8)`` runs the full
sharded train step on the virtual mesh with those engines.
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402

from pychain_tpu.loss import dispatch_arrays  # noqa: E402
from pychain_tpu.ops.factorized import FactorizedArrays  # noqa: E402
from pychain_tpu.ops.linear import LinearArrays  # noqa: E402


def test_setup_dispatches_flagship_engines():
    _, _, _, _, den_b, num_b = graft._setup()
    den = dispatch_arrays(den_b, "auto")
    num = dispatch_arrays(num_b, "auto")
    assert isinstance(den, FactorizedArrays)
    assert not den.log_semantics
    assert isinstance(num, LinearArrays)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual mesh")
def test_dryrun_multichip_engine_selection(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "den engine=FactorizedArrays" in out
    assert "num engine=LinearArrays" in out
    assert "ok" in out
