"""Host-side construction cost regressions.

List graph batches are rebuilt every minibatch; at the headline scale
their warm construction cost (~20 ms) exceeded the 15.5 ms device step,
making the input pipeline the bottleneck.  Two fixes are pinned here:
engine-classification caching on the (immutable) ChainGraph, and one
batched device_put.  Timing assertions are deliberately loose (CI
jitter); the functional cache assertions are exact.
"""

import time

import numpy as np

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.ops.leveled import is_leveled_graph
from pychain_tpu.ops.linear import is_linear_graph
from pychain_tpu.utils.testgraphs import linear_fst, sausage_fst


def test_engine_classification_is_cached():
    g = ChainGraph(linear_fst([0, 1, 2, 3]), log_domain=True)
    assert is_linear_graph(g)
    assert g._is_linear_cache is True
    # poison the cache: the cached value (not a recompute) is returned
    g._is_linear_cache = False
    assert not is_linear_graph(g)

    s = ChainGraph(sausage_fst([[0, 1], [2]], seed=0), log_domain=True)
    assert is_leveled_graph(s)
    assert s._is_leveled_cache[16] is True
    assert is_leveled_graph(s, max_width=1) in (True, False)
    assert 1 in s._is_leveled_cache


def test_warm_batch_rebuild_is_cheap():
    """RELATIVE bound (no absolute wall-clock dependence): a warm
    rebuild must clearly beat a cache-stripped rebuild, which is what
    regressing the classification cache would reintroduce."""
    rng = np.random.RandomState(0)
    B, T = 64, 200
    graphs = [ChainGraph(linear_fst(rng.randint(0, 50, size=T)),
                         log_domain=True) for _ in range(B)]

    def build():
        return ChainGraphBatch(graphs, max_num_transitions=T,
                               max_num_states=T + 1)

    def strip_caches():
        for g in graphs:
            for attr in ("_is_linear_cache", "_is_leveled_cache",
                         "_leveled_meta"):
                if hasattr(g, attr):
                    delattr(g, attr)

    build()  # warm jit/dispatch paths
    warm = min((lambda t0: (build(), time.time() - t0)[1])(time.time())
               for _ in range(8))

    def cold_once():
        strip_caches()
        t0 = time.time()
        build()
        return time.time() - t0

    cold = min(cold_once() for _ in range(8))
    build()  # re-warm for later tests
    assert warm < 0.8 * cold, (
        f"warm rebuild {warm * 1e3:.1f} ms not clearly faster than "
        f"cache-stripped {cold * 1e3:.1f} ms")
