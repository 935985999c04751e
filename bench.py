#!/usr/bin/env python3
"""Headline benchmark: denominator-graph forward-backward throughput.

Config per BASELINE.json: B=128 utterances, T=500 frames, trigram-
phone-LM-like denominator graph with ~3000 states, full fwd+bwd with
occupation-posterior gradients (i.e. one jax.grad of chain_function).

Prints ONE JSON line:
  {"metric": ..., "value": utts/sec/chip, "unit": "utts/sec",
   "vs_baseline": value / reference-CPU utts/sec}

The reference publishes no numbers (BASELINE.md); the baseline is the
reference's own CPU engine measured on this host by
tools/measure_baseline.py -> BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pychain_tpu import ChainGraph, ChainGraphBatch  # noqa: E402
from pychain_tpu.loss import chain_function, dispatch_arrays  # noqa: E402
from pychain_tpu.utils.testgraphs import denominator_fst  # noqa: E402

QUICK = "--quick" in sys.argv
S8K = "--s8k" in sys.argv  # S~8000 scalability entry (the round-3
                           # beyond-VMEM class; after the round-4
                           # fits_vmem recalibration the resident
                           # kernels serve it directly)
FULL = "--full" in sys.argv  # full ChainLoss (den + linear numerators)
                             # value+grad — the end-to-end training number
SEMIRING = "--semiring" in sys.argv  # arbitrary cyclic numerator batch
                                     # on the one-hot semiring engine
XL = "--xl" in sys.argv  # XL cyclic numerator batch (S~1000, K~3100)
                         # beyond the dense one-hot budget: the XL
                         # semiring kernels, A/B'd against gather
XLSTREAM = "--xlstream" in sys.argv  # denominator-scale LOG-DOMAIN
                                     # batch (S~3000, K~50k, shared):
                                     # auto -> the factorized engines
                                     # in normalized-linear form
                                     # (log_semantics), A/B'd against
                                     # gather
LONG = "--long" in sys.argv  # BASELINE config 5: long utterances
                             # (T=2500, bf16), stream_mode="auto"; add
                             # --big for B=128 (auto -> lean streams)
TRAIN = "--train" in sys.argv  # REAL training step at headline scale:
                               # TDNN fwd + ChainLoss + grad + adam
                               # update, one jitted step
if "--gather" in sys.argv:
    IMPLS = ["gather"]
elif "--f32" in sys.argv:
    IMPLS = ["factorized"]
elif S8K or FULL or TRAIN:
    IMPLS = ["pallas"]     # s8k: the Pallas tiering (resident since the
                           # round-4 recalibration) — the point
else:
    IMPLS = ["factorized", "pallas"]  # parity engine + fast engine
TILE_DTYPE = ("bfloat16" if ("--bf16" in sys.argv or S8K or FULL or TRAIN)
              else None)
if LONG:
    IMPLS = ["pallas"]
    TILE_DTYPE = "bfloat16"
if QUICK:
    B, T = 16, 100
elif S8K:
    B, T = 64, 300
elif LONG:
    # BASELINE config 5 (long utterances, T>1500, bf16).  Default
    # B=32 keeps the full fwd->bwd streams within budget; --big sizes
    # the batch so "auto" must drop to the lean stream mode (3 streams
    # at B=64 T=3700 bf16 = 4.37e9 B > the 4 GiB STREAM_BUDGET;
    # T=3500 came in at 4.13e9 and still picked "full").  x + exp(x) +
    # grad are ~8.5 GB next to lean's single 1.46 GB alpha stream, so
    # --big also syncs every timed iteration: two async grads in
    # flight is the difference between ~11 GB and OOM (B=128 T=2500
    # is 7.7 GB in x/grad alone and OOMs outright).
    B, T = (64, 3700) if "--big" in sys.argv else (32, 2500)
else:
    B, T = 128, 500
NUM_PHONES, FANOUT = ((100, 10) if QUICK
                      else ((4000, 30) if S8K else (1500, 30)))


def _require_live_backend(timeout=300):
    """Fail fast (rc=1, clear message) when the TPU tunnel env is set
    but the backend is unreachable — jax.devices() would otherwise
    block this process forever and the driver would record a hang
    instead of a diagnosable error."""
    from pychain_tpu.utils.backend import tpu_tunnel_alive, tunnel_env_set
    if not tunnel_env_set():
        return  # plain local backends initialize or fail promptly
    if not tpu_tunnel_alive(timeout=timeout):
        print("# TPU tunnel env is set but the backend is unreachable "
              f"(still blocked after {timeout}s)", file=sys.stderr)
        sys.exit(1)


def _bench_full(rng, den, den_batch_bf16, x, lengths, B, T, S, K, P):
    """Full ChainLoss (bf16 Pallas denominator + linear numerators),
    value AND gradient — the number a training step actually pays."""
    from pychain_tpu import ChainGraph, ChainGraphBatch, ChainLoss
    from pychain_tpu.utils.testgraphs import linear_fst

    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_batch = ChainGraphBatch(nums, max_num_transitions=T,
                                max_num_states=T + 1)
    loss_mod = ChainLoss(den, impl="pallas", tile_dtype="bfloat16")
    loss_mod._den_batches[B] = den_batch_bf16   # reuse the built batch
    vg = jax.jit(jax.value_and_grad(
        lambda xx: loss_mod(xx, lengths, num_batch)))

    t0 = time.time()
    loss, grad = vg(x)
    _ = float(loss) + float(grad[0, 0, 0])
    print(f"# [full] compile+first-run {time.time()-t0:.1f}s "
          f"loss={float(loss):.6f}", file=sys.stderr)

    def timed(iters):
        t0 = time.time()
        for _ in range(iters):
            l, g = vg(x)
        _ = float(l) + float(g[0, 0, 0])
        return (time.time() - t0) / iters

    iters = 3 if QUICK else 30
    timed(2)
    best = min(timed(iters) for _ in range(2))
    ups = B / best
    print(f"# [full] amortized s/batch over {iters}: {best:.4f} "
          f"({ups:.0f} utts/s)", file=sys.stderr)
    vs = None
    ref = _reference_ups()
    if ref:
        vs = ups / ref
    print(json.dumps({
        "metric": f"full ChainLoss value+grad utts/sec/chip "
                  f"(B={B},T={T},S={S},K={K},P={P}; bf16 Pallas den "
                  f"+ linear numerators)",
        "value": round(ups, 2),
        "unit": "utts/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


def _bench_train(rng, den, den_batch_bf16, lengths, B, T, S, K, P):
    """One REAL jitted training step at headline scale: TDNN acoustic
    model forward, full ChainLoss (bf16 Pallas denominator + linear
    numerators), gradient w.r.t. the model parameters, and an adam
    update — the per-step cost of the end-to-end recipe
    (examples/train_corpus.py) minus host-side data assembly (which is
    overlapped by data/prefetch.py and measured in test_perf_host)."""
    import optax

    from pychain_tpu import ChainGraph, ChainGraphBatch, ChainLoss
    from pychain_tpu.models import TDNN, TDNNConfig
    from pychain_tpu.utils.testgraphs import linear_fst

    FEAT_DIM = 40
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_batch = ChainGraphBatch(nums, max_num_transitions=T,
                                max_num_states=T + 1)
    loss_mod = ChainLoss(den, impl="pallas", tile_dtype="bfloat16")
    loss_mod._den_batches[B] = den_batch_bf16   # reuse the built batch

    cfg = TDNNConfig(num_pdfs=P, hidden_dim=512,
                     kernel_sizes=(3, 3, 3, 3, 3),
                     dilations=(1, 1, 3, 3, 3),
                     strides=(1, 1, 1, 1, 1), dropout=0.0)
    model = TDNN(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, FEAT_DIM),
                              jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, feats):
        # train=True: BatchNorm normalizes by batch statistics and the
        # running stats update through the mutable collection — the
        # full fidelity of a real step (adam only sees 'params')
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, feats,
                train=True, mutable=["batch_stats"])
            return loss_mod(out, lengths, num_batch), upd["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_bs, opt_state

    t0 = time.time()
    loss, params, batch_stats, opt_state = train_step(
        params, batch_stats, opt_state, feats)
    _ = float(loss)
    print(f"# [train] compile+first-step {time.time()-t0:.1f}s "
          f"loss={float(loss):.6f}", file=sys.stderr)

    def timed(iters):
        nonlocal params, batch_stats, opt_state
        t0 = time.time()
        for _ in range(iters):
            loss, params, batch_stats, opt_state = train_step(
                params, batch_stats, opt_state, feats)
        _ = float(loss)
        return (time.time() - t0) / iters

    iters = 3 if QUICK else 30
    timed(2)
    best = min(timed(iters) for _ in range(2))
    ups = B / best
    print(f"# [train] amortized s/step over {iters}: {best:.4f} "
          f"({ups:.0f} utts/s)", file=sys.stderr)
    ref = _reference_ups()
    print(json.dumps({
        "metric": f"full training step utts/sec/chip "
                  f"(B={B},T={T},S={S},K={K},P={P}; TDNN-512x5 "
                  f"train-mode BN + bf16 Pallas den + linear "
                  f"numerators + adam)",
        "value": round(ups, 2),
        "unit": "utts/sec",
        "vs_baseline": round(ups / ref, 2) if ref else None,
    }))


def _reference_ups():
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if not os.path.exists(baseline_path):
        return None
    with open(baseline_path) as f:
        return json.load(f).get("reference_cpu", {}).get("utts_per_sec")


def _bench_semiring(xl=False, xlstream=False):
    """Arbitrary cyclic numerator graphs (the class the reference's
    log-domain CUDA kernels serve): B random ergodic graphs, value+grad
    through impl='auto' (select-free Pallas kernels on TPU, XLA scan
    elsewhere).  With xl=True, the batch is sized beyond the dense
    one-hot budget (S~1000, K~3100 per graph — the flat-start-utterance
    class from VERDICT r2) so auto dispatch lands on the XL semiring
    kernels, and the gather engine is A/B'd in the same process.

    With xlstream=True, the batch is a DENOMINATOR-scale log-domain
    graph (S~3000, K~50k shared across the batch — the one class the
    reference's per-arc CUDA log-domain kernels served and no fast
    tier here did until round 4).  A shared graph factorizes, so auto
    dispatch serves it through the factorized/Pallas engines in
    normalized-linear form (log_semantics; leaky=0) — measured FAR
    ahead of both the gather engine and the dense streamed-XL masks
    (which measured 0.2x gather here: O(S*K) dense work is the wrong
    algorithm for a shared graph, docs/DESIGN.md round-4).  The gather
    engine is A/B'd in the same process."""
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.utils.testgraphs import denominator_fst, random_fst

    if xlstream:
        if QUICK:
            B, T, PHONES = 4, 20, 40
        else:
            B, T, PHONES = 32, 150, 1500
        den_fst, P = denominator_fst(num_phones=PHONES,
                                     states_per_phone=2, seed=0,
                                     bigram_fanout=30)
        shared = ChainGraph(den_fst, log_domain=True)
        batch = ChainGraphBatch(shared, B)
        graphs = [shared]
    elif xl:
        B, T, S_g, P = (8, 50, 200, 300) if QUICK else (128, 500, 1000,
                                                        3000)
        arcs_per_state = 5
    else:
        B, T, S_g, P = (8, 50, 12, 8) if QUICK else (128, 500, 16, 96)
        arcs_per_state = 3
    if not xlstream:
        graphs = [ChainGraph(random_fst(num_states=S_g, num_pdfs=P,
                                        max_arcs_per_state=arcs_per_state,
                                        seed=s),
                             log_domain=True) for s in range(B)]
        batch = ChainGraphBatch(
            graphs,
            max_num_transitions=max(g.num_transitions for g in graphs),
            max_num_states=max(g.num_states for g in graphs))
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    if xlstream:
        from pychain_tpu.ops.semiring_xl import fits_xl_budget
        assert QUICK or not fits_xl_budget(mk, ms), \
            "xlstream config should exceed the resident XL mask budget"
    elif xl:
        assert QUICK or batch._semiring is None, \
            "xl config should exceed the dense one-hot budget"
    else:
        assert batch._semiring is not None
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    g = dispatch_arrays(batch, "semiring_xl" if xl else "auto")
    if xlstream:
        from pychain_tpu.ops.factorized import FactorizedArrays
        # (QUICK shrinks the graph into the dense one-hot budget, where
        # auto correctly prefers the dense semiring engine)
        assert QUICK or (isinstance(g, FactorizedArrays)
                         and g.log_semantics), \
            "auto must serve the shared log-domain graph factorized"
        print(f"# xlstream dispatch -> {type(g).__name__} "
              f"engine={getattr(g, 'engine', None)}", file=sys.stderr)
    vg = jax.jit(jax.value_and_grad(chain_function))
    tag = "xlstream" if xlstream else ("xl" if xl else "semiring")

    t0 = time.time()
    objf, grad = vg(x, lengths, g)
    _ = float(objf) + float(grad[0, 0, 0])
    print(f"# [{tag}] compile+first-run {time.time()-t0:.1f}s "
          f"objf={float(objf):.4f}", file=sys.stderr)

    def timed(iters, gg):
        t0 = time.time()
        for _ in range(iters):
            o, gr = vg(x, lengths, gg)
        _ = float(o) + float(gr[0, 0, 0])
        return (time.time() - t0) / iters

    iters = 3 if QUICK else 30
    timed(2, g)
    best = min(timed(iters, g) for _ in range(2))
    ups = B / best
    print(f"# [{tag}] amortized s/batch over {iters}: {best:.4f} "
          f"({ups:.0f} utts/s)", file=sys.stderr)

    extra = ""
    if xl or xlstream:
        # A/B the gather engine in the same process (few iterations —
        # it is the measured ~200x cliff the XL engine removes)
        gg = dispatch_arrays(batch, "gather")
        og, gr = vg(x, lengths, gg)
        dv = abs(float(og) - float(objf)) / max(abs(float(og)), 1.0)
        g_iters = 1 if QUICK else 2
        g_best = timed(g_iters, gg)
        g_ups = B / g_best
        print(f"# [gather A/B] {g_best:.3f} s/batch ({g_ups:.2f} utts/s); "
              f"objf rel diff {dv:.2e}; {tag} speedup {ups / g_ups:.1f}x",
              file=sys.stderr)
        extra = (f"; gather engine {g_ups:.1f} utts/s -> "
                 f"{ups / g_ups:.1f}x speedup, objf rel diff {dv:.1e}")

    kind = ("denominator-scale log-domain" if xlstream
            else "arbitrary-cyclic numerator")
    eng = ("factorized-log (auto)" if xlstream
           else ("XL" if xl else "one-hot"))
    ref = _reference_ups()
    print(json.dumps({
        "metric": f"{kind} fwd-bwd utts/sec/chip "
                  f"(B={B},T={T},S<={ms},K<={mk},P={P}; "
                  f"{eng} semiring engine"
                  f"{extra})",
        "value": round(ups, 2),
        "unit": "utts/sec",
        "vs_baseline": round(ups / ref, 2) if ref else None,
    }))


def _bench_viterbi():
    """Forced-alignment throughput at the constrained-graph realignment
    size (VERDICT r2 #4): per-utterance random graphs, Pallas
    VMEM-resident max-plus sweep A/B'd against the scatter sweep in the
    same process, exact objf/path parity asserted."""
    from pychain_tpu import ChainGraph, ChainGraphBatch, viterbi_align
    from pychain_tpu.utils.testgraphs import random_fst

    B, T, S_g, P = (8, 40, 24, 16) if QUICK else (128, 500, 512, 512)
    graphs = [ChainGraph(random_fst(num_states=S_g, num_pdfs=P,
                                    max_arcs_per_state=4, seed=s),
                         log_domain=True) for s in range(B)]
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    def run(tag, sweep, iters):
        fn = jax.jit(lambda xx: viterbi_align(xx, lengths, batch,
                                              sweep=sweep))
        t0 = time.time()
        r = fn(x)
        _ = float(r.objf.sum()) + int(np.asarray(r.pdfs)[0, 0])
        print(f"# [viterbi/{sweep}] compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(iters):
            r = fn(x)
        _ = float(r.objf.sum())
        per = (time.time() - t0) / iters
        print(f"# [viterbi/{sweep}] {per*1000:.1f} ms/batch "
              f"({B/per:.1f} utts/s)", file=sys.stderr)
        return r, per

    rp, tp = run("pallas", "pallas", 3 if QUICK else 10)
    rs, ts = run("scatter", "scatter", 1 if QUICK else 2)
    assert np.array_equal(np.asarray(rp.objf), np.asarray(rs.objf))
    assert np.array_equal(np.asarray(rp.pdfs), np.asarray(rs.pdfs))
    ups = B / tp
    print(json.dumps({
        "metric": f"viterbi forced-alignment utts/sec/chip "
                  f"(B={B},T={T},S<={ms},K<={mk},P={P}; Pallas "
                  f"max-plus sweep; scatter sweep {B/ts:.1f} utts/s -> "
                  f"{ts/tp:.1f}x, exact parity)",
        "value": round(ups, 2),
        "unit": "utts/sec",
        "vs_baseline": None,
    }))


def main():
    _require_live_backend()
    if "--viterbi" in sys.argv:
        return _bench_viterbi()
    if SEMIRING or XL or XLSTREAM:
        return _bench_semiring(xl=XL, xlstream=XLSTREAM)
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=NUM_PHONES, states_per_phone=2,
                                 seed=0, bigram_fanout=FANOUT)
    den = ChainGraph(den_fst, log_domain=False)
    batch = ChainGraphBatch(den, B, tile_dtype=TILE_DTYPE)
    # the pallas engine's fast mode wants bfloat16-quantised tiles
    batch_bf16 = (batch if TILE_DTYPE == "bfloat16"
                  else ChainGraphBatch(den, B, tile_dtype="bfloat16"))
    S, K = den.num_states, den.num_transitions
    print(f"# backend={jax.default_backend()} devices={jax.devices()} "
          f"B={B} T={T} S={S} K={K} P={P}", file=sys.stderr)

    # Generate on device; pass graphs as jit ARGUMENTS (closure constants
    # force slow device->host reads during lowering on tunneled backends).
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    if FULL:
        return _bench_full(rng, den, batch_bf16, x, lengths, B, T, S, K, P)
    if TRAIN:
        return _bench_train(rng, den, batch_bf16, lengths, B, T, S, K, P)

    grad_fn = jax.jit(jax.value_and_grad(chain_function))

    def measure(impl):
        g = dispatch_arrays(batch_bf16 if impl == "pallas" else batch,
                            impl=impl)
        t0 = time.time()
        objf, grad = grad_fn(x, lengths, g)
        # Host-sync via a scalar read: block_until_ready is unreliable
        # on tunneled backends and under-reports.
        _ = float(objf) + float(grad[0, 0, 0])
        print(f"# [{impl}] compile+first-run {time.time()-t0:.1f}s "
              f"objf={float(objf):.4f}", file=sys.stderr)
        del objf, grad      # HBM-tight configs: don't hold a stale
                            # (B, T, P) grad across the timed runs

        # Amortised timing: enqueue N batches asynchronously, sync once
        # (per-call sync costs ~35 ms on the tunneled backend, and the
        # first few dispatches after a sync stall while the tunnel
        # pipeline refills — so N must be large enough to amortise it;
        # measured: 10 iters over-reports ~40%, 30 is stable).
        # --long --big runs within ~1 GB of HBM capacity: reading each
        # grad before the next dispatch keeps exactly one output alive
        # (two in-flight 2.7 GB grads OOM).  The ~35 ms/call sync tax
        # is <15% at this batch's step time; everywhere else the
        # enqueue-N-sync-once discipline stands.
        sync_each = LONG and "--big" in sys.argv

        def timed(iters):
            t0 = time.time()
            for _ in range(iters):
                o, gr = grad_fn(x, lengths, g)
                if sync_each:
                    # read AND drop the outputs before re-dispatching:
                    # the next execution's 2.7 GB grad buffer must not
                    # coexist with this one
                    _ = float(o) + float(gr[0, 0, 0])
                    del o, gr
            if not sync_each:
                _ = float(o) + float(gr[0, 0, 0])
            return (time.time() - t0) / iters

        iters = 3 if QUICK else (10 if sync_each else 30)
        timed(2)  # warm the dispatch path
        best = min(timed(iters) for _ in range(2))
        print(f"# [{impl}] amortized s/batch over {iters}: {best:.4f} "
              f"({B / best:.0f} utts/s)", file=sys.stderr)
        return B / best

    results = {impl: measure(impl) for impl in IMPLS}
    headline_impl = IMPLS[-1]
    utts_per_sec = results[headline_impl]

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ups = ref.get("reference_cpu", {}).get("utts_per_sec")
        if ref_ups:
            vs_baseline = utts_per_sec / ref_ups

    others = "; ".join(f"{k}={v:.0f}" for k, v in results.items()
                       if k != headline_impl)
    extra = f"; other engines: {others} utts/s" if others else ""
    if S8K:
        from pychain_tpu.loss import dispatch_arrays as _da
        eng = getattr(_da(batch_bf16, "pallas"), "engine", "?")
        extra += f"; S~8k scalability config, engine tier -> {eng}"
    if LONG:
        # report the mode the run ACTUALLY used: same s_pad / stream
        # count the dispatch derives (pallas_fact auto selection)
        from pychain_tpu.ops.pallas_fact import select_stream_mode
        fa = batch_bf16._fact
        n_streams = 3 if fa.xsrc_mode == "identity" else 4
        mode = select_stream_mode(T, fa.s_pad, B, 2, n_streams)
        extra += f"; long-T bf16, stream_mode auto -> {mode}"
    print(json.dumps({
        "metric": f"den-graph fwd-bwd utts/sec/chip "
                  f"(B={B},T={T},S={S},K={K},P={P}; "
                  f"engine={headline_impl}{extra})",
        "value": round(utts_per_sec, 2),
        "unit": "utts/sec",
        "vs_baseline": (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
    }))


if __name__ == "__main__":
    main()
