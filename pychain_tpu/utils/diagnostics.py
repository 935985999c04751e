"""Observability: verbosity control and invariant reporting.

Mirrors the reference's single observability knob — a global verbosity
integer settable from Python (``pychain_C.set_verbose_level``,
pychain.cc:134, base.h:34-42) gating per-frame invariant checks printed
to stderr (chain-computation.cc:345-391) — but surfaces the results as
data instead of only text: :func:`check_result` returns a structured
report, and the per-sequence ``ok`` flags are first-class outputs of
``chain_function_with_aux`` (the reference computes then drops them,
loss.py:44/62).

Levels: 0 = silent; 1 = log failed minibatches; 2 = log per-frame
invariant breaches.
"""

from __future__ import annotations

import logging
import sys
from dataclasses import dataclass

import numpy as np

logger = logging.getLogger("pychain_tpu")

_verbose_level = 0


def set_verbose_level(level: int) -> None:
    """Parity with ``pychain_C.set_verbose_level`` (pychain.cc:134)."""
    global _verbose_level
    _verbose_level = int(level)


def get_verbose_level() -> int:
    return _verbose_level


@dataclass
class InvariantReport:
    """Structured result of checking one minibatch's diagnostics."""
    ok: np.ndarray            # (B,) per-sequence
    max_alpha_beta_err: float
    max_gamma_sum_err: float
    bad_sequences: np.ndarray  # indices with ok == False

    @property
    def all_ok(self) -> bool:
        return bool(self.ok.all())


def check_result(res, lengths, tol: float = 0.05) -> InvariantReport:
    """Evaluate the alpha*beta == 1 and sum(gamma) == 1 invariants
    (chain-computation.cc:345-391) on a FwdBwdResult, honouring each
    sequence's length mask.  Logs according to the verbose level."""
    lengths = np.asarray(lengths)
    ab = np.asarray(res.alpha_beta)
    gs = np.asarray(res.gamma_sum)
    B, T = ab.shape
    mask = np.arange(T)[None, :] < lengths[:, None]
    ab_err = np.abs(np.where(mask, ab, 1.0) - 1.0)
    gs_err = np.abs(np.where(mask, gs, 1.0) - 1.0)
    ok = np.asarray(res.ok)
    report = InvariantReport(
        ok=ok,
        max_alpha_beta_err=float(ab_err.max()),
        max_gamma_sum_err=float(gs_err.max()),
        bad_sequences=np.nonzero(~ok)[0],
    )
    if _verbose_level >= 1 and not report.all_ok:
        print(f"pychain_tpu: {len(report.bad_sequences)} sequence(s) "
              f"failed invariants (abandon advised): "
              f"{report.bad_sequences.tolist()}; "
              f"max|alpha*beta-1|={report.max_alpha_beta_err:.4f} "
              f"max|sum(gamma)-1|={report.max_gamma_sum_err:.4f}",
              file=sys.stderr)
    if _verbose_level >= 2:
        bad_t = np.argwhere(mask & ((ab_err > tol) | (gs_err > tol)))
        for b, t in bad_t[:50]:
            print(f"pychain_tpu: seq {b} frame {t}: "
                  f"alpha*beta={ab[b, t]:.4f} sum(gamma)={gs[b, t]:.4f}",
                  file=sys.stderr)
    return report
