"""TDNN acoustic model for chain training.

The reference delegates acoustic models to its consumers (README.md:9
points at Espresso / pychain_example, whose standard chain model is a
TDNN).  pychain_tpu ships one natively so the framework is end-to-end: a
stack of dilated 1-D convolutions (time-delay layers) with batch norm,
ReLU and dropout, producing per-frame pdf log-likelihoods.

TPU notes: convolutions run as (B*T)-batched matmuls on the MXU; widths
are kept at multiples of 128 by default; parameters can be sharded over
an ``mp`` mesh axis via the logical axis annotations on the kernels
(flax ``nn.with_partitioning``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class TDNNConfig:
    num_pdfs: int = 1024
    hidden_dim: int = 512
    kernel_sizes: Sequence[int] = (3, 3, 3, 3, 3)
    dilations: Sequence[int] = (1, 1, 3, 3, 3)
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    dropout: float = 0.1
    # mesh axis names for (in_features, out_features) kernel sharding;
    # None disables parameter partitioning annotations.
    mp_axis: str | None = None


class TDNNLayer(nn.Module):
    features: int
    kernel_size: int
    dilation: int
    stride: int
    dropout: float
    mp_axis: str | None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel_init = nn.initializers.lecun_normal()
        if self.mp_axis is not None:
            kernel_init = nn.with_partitioning(
                kernel_init, (None, None, self.mp_axis))
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=True,
            kernel_init=kernel_init,
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, axis_name=None,
                         momentum=0.95)(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class TDNN(nn.Module):
    """x (B, T, D) -> per-frame pdf scores (B, T, num_pdfs).

    Output is unnormalised log-likelihood-style scores, as the chain
    objective expects (the loss clamps to [-30, 30] internally).
    """

    config: TDNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        for k, d, s in zip(cfg.kernel_sizes, cfg.dilations, cfg.strides):
            x = TDNNLayer(cfg.hidden_dim, k, d, s, cfg.dropout,
                          cfg.mp_axis)(x, train=train)
        kernel_init = nn.initializers.lecun_normal()
        if cfg.mp_axis is not None:
            kernel_init = nn.with_partitioning(
                kernel_init, (cfg.mp_axis, None))
        x = nn.Dense(cfg.num_pdfs, kernel_init=kernel_init)(x)
        return x

    def output_lengths(self, input_lengths):
        """Frame subsampling from strides (reference consumers do the
        same bookkeeping host-side)."""
        out = jnp.asarray(input_lengths)
        for s in self.config.strides:
            if s > 1:
                out = (out + s - 1) // s
        return out
