"""Bidirectional LSTM acoustic model for chain training.

The reference's consumers (Espresso / pychain_example, README.md:9)
train chain models with TDNN and (B)LSTM encoders; pychain_tpu ships
both so the framework is standalone.  Recurrence runs as ``flax.linen``
scanned LSTM cells — XLA compiles the time loop, matmuls hit the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class BLSTMConfig:
    num_pdfs: int = 1024
    hidden_dim: int = 512
    num_layers: int = 3
    dropout: float = 0.1
    bidirectional: bool = True


class BLSTM(nn.Module):
    """x (B, T, D) -> per-frame pdf scores (B, T, num_pdfs).

    ``lengths`` (B,) masks padding: without it the reversed RNN would
    consume the pad frames first and contaminate the backward states of
    every short utterance in a bucket.
    """

    config: BLSTMConfig

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        cfg = self.config
        seq_lengths = None if lengths is None else jnp.asarray(lengths)
        for layer in range(cfg.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.hidden_dim),
                         name=f"lstm_fwd_{layer}")
            if cfg.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(cfg.hidden_dim),
                             reverse=True, keep_order=True,
                             name=f"lstm_bwd_{layer}")
                x = jnp.concatenate([fwd(x, seq_lengths=seq_lengths),
                                     bwd(x, seq_lengths=seq_lengths)],
                                    axis=-1)
            else:
                x = fwd(x, seq_lengths=seq_lengths)
            if cfg.dropout > 0:
                x = nn.Dropout(rate=cfg.dropout,
                               deterministic=not train)(x)
        return nn.Dense(cfg.num_pdfs)(x)

    def output_lengths(self, input_lengths):
        return jnp.asarray(input_lengths)
