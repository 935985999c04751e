"""Chain graphs: Python-facing graph objects and batched, device-ready tensors.

API-parity layer with the reference's ``pychain/graph.py``:

* :class:`ChainGraph` — one FST lowered to transition tensors, with
  ``initial_mode``/``final_mode``/``log_domain`` semantics matching
  graph.py:25-70 of the reference,
* :class:`ChainGraphBatch` — a batch of graphs padded to static shapes
  (graph.py:73-194), registered as a JAX pytree so it can be passed
  straight into jitted functions.

TPU-first differences from the reference:

* ``ChainGraphBatch`` keeps a ``shared`` flag when built by broadcasting a
  single graph (the denominator case).  The forward-backward kernels use
  it to keep one un-batched copy of the graph (gathers become row
  gathers over a shared index vector instead of per-sequence gathers).
* Padding arcs carry probability 0 (prob domain) or -inf (log domain) so
  that fully-vectorised arc sweeps are no-ops on padding.  The reference
  pads probs with 0 in both domains but never *visits* padded arcs
  because its CSR loops stop at ``end`` (graph.py:128-139); visiting them
  with a neutral weight is numerically identical.
* Batches do NOT need to be sorted by decreasing length; masking replaces
  ``pack_padded_sequence``.  ``reorder`` is kept for API compatibility.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .graphs.compiler import CompiledGraph, compile_fst, leaky_probs as _leaky_probs
from .graphs.fst import FST, n_arcs, n_states

NEG_INF = float("-inf")

# f32 exp-safe band: exp(w) keeps full relative precision for normals,
# w in about [-87.3, 88.7].  Weights outside it silently underflow to 0
# (removing legal paths) or overflow to inf (NaN cascades) when a
# log-domain graph is served in normalized-linear form.  A centered
# shift of up to +/-80 nats around the band midpoint re-admits spreads
# up to _EXP_SPREAD; wider graphs skip the factorized-log lowering.
_EXP_LO, _EXP_HI = -87.0, 88.0
_EXP_SPREAD = 160.0


def _log_band_shifts(graph):
    """Shifts bringing a log-domain graph's finite weights into the f32
    exp-safe band, or None when impossible (spread > _EXP_SPREAD nats,
    or +inf/NaN weights).  Returns (arc, init, fin): subtracting them
    from arc/initial/final log-weights rescales every length-L path by
    exp(-(arc*L + init + fin)); loss._run adds the correction back onto
    the objf after the linear-domain engines run.  All-zero shifts mean
    the graph is already in band (the common normalized case) and the
    lowering stays bit-identical to round 4's."""

    def shift_of(v):
        v = np.asarray(v)
        if np.isposinf(v).any() or np.isnan(v).any():
            return None
        f = v[np.isfinite(v)]
        if f.size == 0:
            return 0.0
        lo, hi = float(f.min()), float(f.max())
        if _EXP_LO <= lo and hi <= _EXP_HI:
            return 0.0
        if hi - lo > _EXP_SPREAD:
            return None
        return (lo + hi) / 2.0

    sa = shift_of(graph.forward_transition_probs)
    si = shift_of(graph.initial_probs)
    sf = shift_of(graph.final_probs)
    if sa is None or si is None or sf is None:
        return None
    return sa, si, sf


class ChainGraph:
    """One chain-training graph (numerator or denominator).

    Mirrors reference graph.py:23-70: lowers the FST, computes leaky-HMM
    priors (prob domain), and builds initial/final state distributions.
    """

    def __init__(self, fst: FST, initial_mode: str = "fst",
                 final_mode: str = "fst", log_domain: bool = False):
        assert initial_mode in ("fst", "leaky")
        assert final_mode in ("fst", "ones")
        if n_states(fst) == 0 or n_arcs(fst) == 0:
            raise Exception("An empty graph encountered!")  # graph.py:69-70
        self.log_domain = log_domain
        g = compile_fst(fst, log_domain=log_domain)
        self.num_states = g.num_states
        self.num_transitions = g.num_transitions
        self.start_state = g.start_state
        self.is_empty = False
        # Widest pdf id referenced by any arc: the nnet output must have
        # at least this many columns (the reference only asserts this in
        # a debug build, fstext.cc:42; an out-of-range pdf would silently
        # produce NaN/garbage through the emission gathers here).
        self.num_pdfs = int(g.forward_transitions[:, 2].max()) + 1

        self.forward_transitions = g.forward_transitions
        self.forward_transition_probs = g.forward_transition_probs
        self.forward_transition_indices = g.forward_transition_indices
        self.backward_transitions = g.backward_transitions
        self.backward_transition_probs = g.backward_transition_probs
        self.backward_transition_indices = g.backward_transition_indices
        self.final_probs = g.final_probs

        S = self.num_states
        if log_domain:
            # graph.py:54-59 — no leaky HMM in log domain.
            assert initial_mode == "fst", \
                "'leaky' mode is incompatible with log domain"
            self.leaky_probs = None
            self.initial_probs = np.full(S, NEG_INF, np.float32)
            self.initial_probs[self.start_state] = 0.0
            if final_mode == "ones":
                self.final_probs = np.zeros(S, np.float32)
        else:
            # graph.py:61-68.
            self.leaky_probs = _leaky_probs(fst)
            if initial_mode == "fst":
                self.initial_probs = np.zeros(S, np.float32)
                self.initial_probs[self.start_state] = 1.0
            else:
                self.initial_probs = self.leaky_probs.copy()
            if final_mode == "ones":
                self.final_probs = np.ones(S, np.float32)

    @classmethod
    def from_compiled(cls, g: CompiledGraph, initial_probs, leaky_probs=None):
        """Build directly from a CompiledGraph (bypasses FST lowering)."""
        self = cls.__new__(cls)
        self.log_domain = g.log_domain
        self.num_states = g.num_states
        self.num_transitions = g.num_transitions
        self.start_state = g.start_state
        self.is_empty = False
        self.num_pdfs = int(g.forward_transitions[:, 2].max()) + 1
        self.forward_transitions = g.forward_transitions
        self.forward_transition_probs = g.forward_transition_probs
        self.forward_transition_indices = g.forward_transition_indices
        self.backward_transitions = g.backward_transitions
        self.backward_transition_probs = g.backward_transition_probs
        self.backward_transition_indices = g.backward_transition_indices
        self.final_probs = g.final_probs
        self.initial_probs = np.asarray(initial_probs, np.float32)
        self.leaky_probs = None if leaky_probs is None else np.asarray(
            leaky_probs, np.float32)
        return self


class ChainGraphBatch:
    """A batch of graphs padded to common static shapes (graph.py:73-194).

    Constructed either from a single :class:`ChainGraph` plus
    ``batch_size`` (broadcast; used for the shared denominator graph) or
    from a list of graphs plus ``max_num_transitions``/``max_num_states``.

    Device arrays live in the following fields (jnp, batched):
    ``forward_transitions`` (B, K, 3), ``forward_transition_probs`` (B, K),
    ``forward_transition_indices`` (B, S, 2), the ``backward_*``
    counterparts, ``initial_probs``/``final_probs``/``leaky_probs`` (B, S),
    ``start_state`` (B,).  When ``shared`` is True the same content is
    also available un-batched via ``shared_*`` attributes.
    """

    def __init__(self, graphs, batch_size=None, max_num_transitions=None,
                 max_num_states=None, tile_dtype=None):
        self._tile_dtype = tile_dtype
        gs = graphs if isinstance(graphs, (list, tuple)) else [graphs]
        self.num_pdfs = max(
            (getattr(g, "num_pdfs", 0) for g in gs), default=0)
        if isinstance(graphs, ChainGraph):
            if not batch_size:
                raise ValueError(
                    "batch size should be specified to expand a single graph")
            self.batch_size = int(batch_size)
            self._init_by_one(graphs)
        elif isinstance(graphs, (list, tuple)):
            if not max_num_transitions:
                raise ValueError(
                    "max_num_transitions should be specified if given a "
                    "a list of ChainGraph objects to initialize from")
            if not max_num_states:
                raise ValueError(
                    "max_num_states should be specified if given a "
                    "a list of ChainGraph objects to initialize from")
            self.batch_size = len(graphs)
            self._init_by_list(list(graphs), int(max_num_transitions),
                               int(max_num_states))
        else:
            raise ValueError(
                "ChainGraphBatch should be either initialized by a single "
                "ChainGraph object or a list of ChainGraph objects but "
                "given {}".format(type(graphs)))

    # -- broadcast constructor (graph.py:101-120) -----------------------
    def _init_by_one(self, graph: ChainGraph):
        self.log_domain = graph.log_domain
        self._semiring_xl = None
        self._dense_list = None
        self.shared = True
        self._linear = None
        self._leveled = None
        self._semiring = None
        self.num_states = graph.num_states
        self.num_transitions = graph.num_transitions

        # Factorized block-sparse form for the MXU fast path.
        self._fact = None
        from .graphs.factorize import factorize
        from .ops.factorized import from_factorized_graph
        if not graph.log_domain:
            fg = factorize(graph)
            self._fact = from_factorized_graph(
                fg, graph.initial_probs, graph.final_probs,
                graph.leaky_probs, tile_dtype=self._tile_dtype)
        else:
            # A SHARED log-domain graph is the same transition matrix
            # with log weights: exp them (exact for hard zeros, after
            # re-centering any out-of-band finite weights — see
            # _log_band_shifts) and the factorized engines serve it in
            # normalized-linear form at denominator speed — measured
            # 0.2x GATHER for the dense streamed-XL masks at
            # S=3000/K=50k (the O(S*K) work is the wrong algorithm for
            # a shared graph), vs the factorized class's 238-2738
            # utts/s.  leaky is forced to 0 at dispatch; infeasible
            # sequences are guarded back to the log-engine contract
            # (loss._run).
            #
            # The list-engine builders run on ONE graph and broadcast
            # on device (ADVICE r4: duplicating B identical per-graph
            # arrays eagerly was redundant O(B*K*S) host work); the
            # dense one-hot semiring engine is not built at all when
            # the factorization succeeds — the factorized-log path is
            # the measured fast engine for shared cyclic graphs.
            self._graphs = list([graph] * self.batch_size)
            shifts = _log_band_shifts(graph)
            if shifts is None:
                import warnings
                warnings.warn(
                    "pychain_tpu: shared log-domain graph has finite "
                    "log-weights spanning more than {:.0f} nats (or "
                    "+inf/NaN); the factorized-log fast path would "
                    "silently under/overflow in float32, so it is "
                    "disabled for this graph — dispatching to the "
                    "log-semiring/gather engines instead".format(
                        _EXP_SPREAD),
                    RuntimeWarning, stacklevel=4)
                self._detect_log_engines(
                    [graph], graph.num_transitions, graph.num_states,
                    broadcast_to=self.batch_size)
            else:
                import dataclasses as _dc
                import types
                sa, si, sf = shifts
                shim = types.SimpleNamespace(
                    log_domain=False,
                    num_states=graph.num_states,
                    forward_transitions=graph.forward_transitions,
                    forward_transition_probs=np.exp(
                        (graph.forward_transition_probs - sa).astype(
                            np.float64)).astype(np.float32),
                    final_probs=np.exp(
                        (graph.final_probs - sf).astype(
                            np.float64)).astype(np.float32),
                )
                fg = factorize(shim)
                S = graph.num_states
                log_shifts = (None if sa == si == sf == 0.0
                              else jnp.asarray([sa, si + sf],
                                               jnp.float32))
                self._fact = _dc.replace(
                    from_factorized_graph(
                        fg,
                        np.exp((graph.initial_probs - si).astype(
                            np.float64)).astype(np.float32),
                        shim.final_probs,
                        np.full(S, 1.0 / S, np.float32),  # unused
                        tile_dtype=self._tile_dtype),
                    log_semantics=True, log_shifts=log_shifts)
                self._detect_log_engines(
                    [graph], graph.num_transitions, graph.num_states,
                    broadcast_to=self.batch_size, skip_semiring=True)

        t = graph.forward_transitions
        self._fwd_src = jnp.asarray(t[:, 0])
        self._fwd_dst = jnp.asarray(t[:, 1])
        self._fwd_pdf = jnp.asarray(t[:, 2])
        self._fwd_prob = jnp.asarray(graph.forward_transition_probs)
        t = graph.backward_transitions
        self._bwd_src = jnp.asarray(t[:, 0])
        self._bwd_dst = jnp.asarray(t[:, 1])
        self._bwd_pdf = jnp.asarray(t[:, 2])
        self._bwd_prob = jnp.asarray(graph.backward_transition_probs)
        self._initial = jnp.asarray(graph.initial_probs)
        self._final = jnp.asarray(graph.final_probs)
        self._leaky = (None if graph.leaky_probs is None
                       else jnp.asarray(graph.leaky_probs))
        self._fwd_indices = jnp.asarray(graph.forward_transition_indices)
        self._bwd_indices = jnp.asarray(graph.backward_transition_indices)
        self._start = jnp.full((self.batch_size,), graph.start_state,
                               dtype=jnp.int32)

    def _detect_log_engines(self, graphs, max_k, max_s,
                            broadcast_to=None, skip_semiring=False):
        """Eager log-domain engine detection, identical for list and
        broadcast batches: linear closed-form, leveled, or the dense
        one-hot semiring engine when the B*K*S one-hots fit the
        budget.  (The XL semiring tiers are built lazily on first
        dispatch — see loss._force_engine.)

        broadcast_to=B builds the engine arrays from the single graph
        given and broadcasts the batch axis on device (every engine's
        leaves are batch-leading) — the shared-graph ctor path.
        skip_semiring suppresses the dense one-hot build when a faster
        engine (factorized-log) already claims the batch."""

        def _built(arrs):
            if broadcast_to is None:
                return arrs
            return jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a, (broadcast_to,) + a.shape[1:]), arrs)

        from .ops.linear import is_linear_graph, linear_arrays
        if all(is_linear_graph(g) for g in graphs):
            self._linear = _built(linear_arrays(graphs, max_k))
            return
        from .ops.leveled import is_leveled_graph, leveled_arrays
        if all(is_leveled_graph(g) for g in graphs):
            self._leveled = _built(leveled_arrays(graphs))
            return
        if skip_semiring:
            return
        # Arbitrary (cyclic/self-loop/DAG) supervision: dense one-hot
        # MXU engine when the B*K*S one-hots fit the budget, else the
        # generic gather engine.
        from .ops.semiring import fits_budget, semiring_arrays
        if fits_budget(self.batch_size, max_k, max_s):
            self._semiring = _built(
                semiring_arrays(graphs, max_k, max_s))

    # -- list constructor (graph.py:122-175) -----------------------------
    def _init_by_list(self, graphs, max_k, max_s):
        g0 = graphs[0]
        self.log_domain = g0.log_domain
        self.shared = False
        self._fact = None

        # Linear-chain fast path: the standard numerator supervision is a
        # per-utterance linear FST, whose forward-backward has a closed
        # form (ops/linear.py) — no sequential scan at all.
        self._linear = None
        self._leveled = None
        self._semiring = None
        self._semiring_xl = None  # built lazily on first dispatch
        self._dense_list = None   # prob-domain lists: lazy, like XL
        # keep the source graphs (references, cheap) so a forced
        # impl="leveled"/"semiring" can compile its engine lazily even
        # when auto-detection selected a different one
        self._graphs = list(graphs)
        if self.log_domain:
            self._detect_log_engines(graphs, max_k, max_s)
        self.num_states = max_s
        self.num_transitions = max_k
        B = self.batch_size
        pad_log = NEG_INF if self.log_domain else 0.0

        fwd_t = np.zeros((B, max_k, 3), np.int32)
        bwd_t = np.zeros((B, max_k, 3), np.int32)
        fwd_p = np.full((B, max_k), pad_log, np.float32)
        bwd_p = np.full((B, max_k), pad_log, np.float32)
        fwd_i = np.zeros((B, max_s, 2), np.int32)
        bwd_i = np.zeros((B, max_s, 2), np.int32)
        if self.log_domain:
            initial = np.full((B, max_s), NEG_INF, np.float32)
            final = np.full((B, max_s), NEG_INF, np.float32)
            leaky = None
        else:
            initial = np.zeros((B, max_s), np.float32)
            final = np.zeros((B, max_s), np.float32)
            leaky = np.zeros((B, max_s), np.float32)
        start = np.zeros(B, np.int32)

        for i, g in enumerate(graphs):
            k, s = g.num_transitions, g.num_states
            if k > max_k or s > max_s:
                raise ValueError(
                    f"graph {i} exceeds padding shape: K={k}>{max_k} or "
                    f"S={s}>{max_s}")
            fwd_t[i, :k] = g.forward_transitions
            bwd_t[i, :k] = g.backward_transitions
            fwd_p[i, :k] = g.forward_transition_probs
            bwd_p[i, :k] = g.backward_transition_probs
            fwd_i[i, :s] = g.forward_transition_indices
            bwd_i[i, :s] = g.backward_transition_indices
            initial[i, :s] = g.initial_probs
            final[i, :s] = g.final_probs
            if leaky is not None and g.leaky_probs is not None:
                leaky[i, :s] = g.leaky_probs
            start[i] = g.start_state

        # ONE batched device_put for all fields: list batches are
        # rebuilt every minibatch, and 14 separate transfers measurably
        # dominated the warm construction cost (see test_perf_host.py)
        host = dict(
            fwd_src=np.ascontiguousarray(fwd_t[..., 0]),
            fwd_dst=np.ascontiguousarray(fwd_t[..., 1]),
            fwd_pdf=np.ascontiguousarray(fwd_t[..., 2]),
            fwd_prob=fwd_p,
            bwd_src=np.ascontiguousarray(bwd_t[..., 0]),
            bwd_dst=np.ascontiguousarray(bwd_t[..., 1]),
            bwd_pdf=np.ascontiguousarray(bwd_t[..., 2]),
            bwd_prob=bwd_p, initial=initial, final=final,
            fwd_indices=fwd_i, bwd_indices=bwd_i, start=start)
        if leaky is not None:
            host["leaky"] = leaky
        dev = jax.device_put(host)
        self._fwd_src = dev["fwd_src"]
        self._fwd_dst = dev["fwd_dst"]
        self._fwd_pdf = dev["fwd_pdf"]
        self._fwd_prob = dev["fwd_prob"]
        self._bwd_src = dev["bwd_src"]
        self._bwd_dst = dev["bwd_dst"]
        self._bwd_pdf = dev["bwd_pdf"]
        self._bwd_prob = dev["bwd_prob"]
        self._initial = dev["initial"]
        self._final = dev["final"]
        self._leaky = dev.get("leaky")
        self._fwd_indices = dev["fwd_indices"]
        self._bwd_indices = dev["bwd_indices"]
        self._start = dev["start"]

    # -- API-compat views (always batched, like the reference) -----------
    def _bcast(self, v):
        if v is None or not self.shared:
            return v
        return jnp.broadcast_to(v, (self.batch_size,) + v.shape)

    @property
    def forward_transitions(self):
        return self._bcast(
            jnp.stack([self._fwd_src, self._fwd_dst, self._fwd_pdf], -1))

    @property
    def backward_transitions(self):
        return self._bcast(
            jnp.stack([self._bwd_src, self._bwd_dst, self._bwd_pdf], -1))

    @property
    def forward_transition_probs(self):
        return self._bcast(self._fwd_prob)

    @property
    def backward_transition_probs(self):
        return self._bcast(self._bwd_prob)

    @property
    def forward_transition_indices(self):
        return self._bcast(self._fwd_indices)

    @property
    def backward_transition_indices(self):
        return self._bcast(self._bwd_indices)

    @property
    def initial_probs(self):
        return self._bcast(self._initial)

    @property
    def final_probs(self):
        return self._bcast(self._final)

    @property
    def leaky_probs(self):
        return self._bcast(self._leaky)

    @property
    def start_state(self):
        return self._start

    def reorder(self, new_order):
        """Permute the batch (graph.py:177-194).  Kept for API parity; the
        TPU implementation does not require length-sorted batches."""
        if self.shared:
            return  # broadcasting a single graph: permutation is identity
        idx = jnp.asarray(new_order)
        for name in ("_fwd_src", "_fwd_dst", "_fwd_pdf", "_fwd_prob",
                     "_bwd_src", "_bwd_dst", "_bwd_pdf", "_bwd_prob",
                     "_initial", "_final", "_leaky", "_fwd_indices",
                     "_bwd_indices", "_start"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, jnp.take(v, idx, axis=0))
        # the compiled fast-path engines are per-sequence too (every
        # leaf is batch-leading) — a stale copy here would silently pair
        # graphs with the wrong sequences under impl="auto"
        for name in ("_linear", "_leveled", "_semiring", "_semiring_xl",
                     "_dense_list"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name,
                        jax.tree.map(lambda a: jnp.take(a, idx, axis=0),
                                     v))
        # ... and so is the source-graph list that _force_engine
        # compiles lazily from (a stale order here reproduces the same
        # wrong-pairing bug for forced impl="leveled"/"semiring")
        gl = getattr(self, "_graphs", None)
        if gl is not None:
            self._graphs = [gl[int(i)] for i in np.asarray(new_order)]

    # -- pytree protocol --------------------------------------------------
    _leaves = ("_fwd_src", "_fwd_dst", "_fwd_pdf", "_fwd_prob",
               "_bwd_src", "_bwd_dst", "_bwd_pdf", "_bwd_prob",
               "_initial", "_final", "_leaky", "_fwd_indices",
               "_bwd_indices", "_start", "_fact", "_linear", "_leveled",
               "_semiring", "_semiring_xl", "_dense_list")

    def tree_flatten(self):
        children = tuple(getattr(self, n) for n in self._leaves)
        aux = (self.batch_size, self.log_domain, self.shared,
               self.num_states, self.num_transitions, self.num_pdfs)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        self = cls.__new__(cls)
        (self.batch_size, self.log_domain, self.shared,
         self.num_states, self.num_transitions, self.num_pdfs) = aux
        for n, v in zip(cls._leaves, children):
            setattr(self, n, v)
        return self


jax.tree_util.register_pytree_node(
    ChainGraphBatch,
    ChainGraphBatch.tree_flatten,
    ChainGraphBatch.tree_unflatten,
)
