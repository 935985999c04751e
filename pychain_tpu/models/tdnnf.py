"""TDNN-F acoustic model: factored TDNN with semi-orthogonal bottlenecks.

The standard Kaldi *chain* acoustic model (Povey et al., "Semi-Orthogonal
Low-Rank Matrix Factorization for Deep Neural Networks", Interspeech
2018) — the architecture most reference consumers (pychain_example /
Espresso recipes, reference README.md:9) train against this loss.  Each
layer factors one wide TDNN convolution into

    linear bottleneck conv (no bias, SEMI-ORTHOGONAL rows)
    -> affine conv back to hidden_dim -> ReLU -> BatchNorm -> dropout
    -> scaled residual bypass (0.66 x previous layer output)

The semi-orthogonality of the bottleneck factor M (rows <= cols,
M M^T ~= sigma^2 I for a floating scale sigma) is what makes the
factorization trainable; Kaldi enforces it every few optimizer steps
with a Newton-like update (nnet-utils.cc ConstrainOrthonormalInternal,
"floating" case).  Here that update is the pure function
:func:`constrain_semi_orthogonal`: apply it to the train state's params
every N steps (N~4, as in Kaldi).

TPU notes: both factors run as (B*T)-batched MXU matmuls; the constraint
update is a handful of small matmuls (bottleneck x k*hidden) — negligible
next to a training step, and jit-compatible (call it inside your jitted
train step under ``lax.cond(step % 4 == 0, ...)`` or outside, either
works since it is pure).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

BOTTLENECK_KERNEL_NAME = "linear_bottleneck"


@dataclass(frozen=True)
class TDNNFConfig:
    num_pdfs: int = 1024
    hidden_dim: int = 512
    bottleneck_dim: int = 128
    num_layers: int = 6
    kernel_size: int = 2          # each factor spans 2 frames: the pair
    dilations: Sequence[int] = (1, 1, 1, 3, 3, 3)   # covers [-d, 0]+[0, d]
    dropout: float = 0.0
    bypass_scale: float = 0.66    # Kaldi's default residual scale
    mp_axis: str | None = None


class TDNNFLayer(nn.Module):
    hidden_dim: int
    bottleneck_dim: int
    kernel_size: int
    dilation: int
    dropout: float
    bypass_scale: float
    mp_axis: str | None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bypass = x
        kernel_init = nn.initializers.lecun_normal()
        out_init = kernel_init
        if self.mp_axis is not None:
            out_init = nn.with_partitioning(
                kernel_init, (None, None, self.mp_axis))
        # factor 1: linear bottleneck, no bias, semi-orthogonal target
        # (its kernel is found by name in constrain_semi_orthogonal)
        x = nn.Conv(
            features=self.bottleneck_dim,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=False,
            kernel_init=kernel_init,
            name=BOTTLENECK_KERNEL_NAME,
        )(x)
        # factor 2: affine back up to hidden_dim
        x = nn.Conv(
            features=self.hidden_dim,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=True,
            kernel_init=out_init,
            name="affine",
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, axis_name=None,
                         momentum=0.95)(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if bypass.shape[-1] == x.shape[-1]:
            x = x + self.bypass_scale * bypass
        return x


class TDNNF(nn.Module):
    """x (B, T, D) -> per-frame pdf scores (B, T, num_pdfs)."""

    config: TDNNFConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dil = list(cfg.dilations)
        if len(dil) < cfg.num_layers:
            dil = dil + [dil[-1]] * (cfg.num_layers - len(dil))
        for i in range(cfg.num_layers):
            x = TDNNFLayer(cfg.hidden_dim, cfg.bottleneck_dim,
                           cfg.kernel_size, dil[i], cfg.dropout,
                           cfg.bypass_scale, cfg.mp_axis,
                           name=f"tdnnf_{i}")(x, train=train)
        kernel_init = nn.initializers.lecun_normal()
        if cfg.mp_axis is not None:
            kernel_init = nn.with_partitioning(
                kernel_init, (cfg.mp_axis, None))
        x = nn.Dense(cfg.num_pdfs, kernel_init=kernel_init)(x)
        return x

    def output_lengths(self, input_lengths):
        return jnp.asarray(input_lengths)   # no frame subsampling


def _constrain_kernel(kernel, update_speed):
    """One floating-case semi-orthogonal update on a conv kernel
    (k, in, bneck).  Treats M = kernel reshaped to (bneck, k*in) —
    rows <= cols — and pulls M M^T toward sigma^2 I with
    sigma^2 = tr((M M^T)^2) / tr(M M^T), the scale that minimises the
    Frobenius deviation (Kaldi nnet-utils.cc, floating case):

        M <- M - (update_speed / sigma^2) (M M^T - sigma^2 I) M
    """
    shape = kernel.shape
    m = kernel.reshape(-1, shape[-1]).T          # (bneck, k*in)
    p = m @ m.T
    trace_p = jnp.trace(p)
    trace_p2 = jnp.sum(p * p)
    sigma2 = trace_p2 / trace_p
    d = p - sigma2 * jnp.eye(p.shape[0], dtype=p.dtype)
    m = m - (update_speed / sigma2) * (d @ m)
    return m.T.reshape(shape)


def constrain_semi_orthogonal(params, update_speed: float = 0.125):
    """Apply the semi-orthogonal constraint update to every TDNN-F
    bottleneck kernel in a params pytree (pure; call every ~4 steps).

    Finds kernels by the ``linear_bottleneck`` module name, so it works
    on the raw ``model.init`` output or the params leaf of a train
    state.  Other leaves pass through untouched.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for path, leaf in flat:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if BOTTLENECK_KERNEL_NAME in names and names[-1] == "kernel":
            leaf = _constrain_kernel(leaf, update_speed)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def semi_orthogonal_deviation(params):
    """max over bottleneck kernels of ||M M^T / sigma^2 - I||_F /
    sqrt(rows) — a convergence diagnostic for the constraint."""
    worst = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if BOTTLENECK_KERNEL_NAME in names and names[-1] == "kernel":
            m = leaf.reshape(-1, leaf.shape[-1]).T
            p = m @ m.T
            sigma2 = jnp.sum(p * p) / jnp.trace(p)
            eye = jnp.eye(p.shape[0], dtype=p.dtype)
            dev = jnp.linalg.norm(p / sigma2 - eye) / jnp.sqrt(p.shape[0])
            worst = jnp.maximum(worst, dev)
    return worst
