"""Phone-level Viterbi decoding (decode.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu.decode import PhoneDecoder, edit_distance, phone_error_rate
from pychain_tpu.graphs.builder import (ChainTopology,
                                        alignment_to_pdf_sequence,
                                        estimate_phone_lm)


def _lm_and_topo(num_phones=4, seed=0):
    rng = np.random.RandomState(seed)
    ts = [[int(p) for p in rng.randint(0, num_phones, size=rng.randint(4, 9))]
          for _ in range(30)]
    lm = estimate_phone_lm(ts, num_phones=num_phones, order=2)
    return lm, ChainTopology(num_phones=num_phones)


def test_oracle_emissions_decode_exactly():
    """Emissions strongly favoring a phone path recover it exactly."""
    lm, topo = _lm_and_topo()
    rng = np.random.RandomState(1)
    dec = PhoneDecoder(lm, topo)
    phones = [2, 0, 3, 1, 2]
    durs = [3, 2, 4, 2, 3]
    T = sum(durs)
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    x = np.full((1, T, topo.num_pdfs), -8.0, np.float32)
    x[0, np.arange(T), seq] = 8.0
    res = dec(jnp.asarray(x), np.array([T], np.int32))
    assert res.phones[0] == phones
    assert res.durations[0] == durs
    assert np.isfinite(res.scores[0])


def test_batch_and_lengths():
    lm, topo = _lm_and_topo(num_phones=3, seed=2)
    dec = PhoneDecoder(lm, topo)
    plans = [([0, 1], [4, 3]), ([2, 0, 1], [2, 2, 2])]
    T = 7
    x = np.full((2, T, topo.num_pdfs), -6.0, np.float32)
    lengths = []
    for b, (ph, du) in enumerate(plans):
        seq = alignment_to_pdf_sequence(ph, du, topo)
        x[b, np.arange(len(seq)), seq] = 6.0
        lengths.append(len(seq))
    res = dec(jnp.asarray(x), np.array(lengths, np.int32))
    for b, (ph, du) in enumerate(plans):
        assert res.phones[b] == ph
        assert sum(res.durations[b]) == lengths[b]


def test_shared_topology_rejected():
    lm, _ = _lm_and_topo()
    with pytest.raises(ValueError, match="non-shared"):
        PhoneDecoder(lm, ChainTopology(num_phones=4, shared_pdfs=True))


def test_edit_distance_and_per():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1          # deletion
    assert edit_distance([1, 2], [1, 0, 2]) == 1          # insertion
    assert edit_distance([1, 2, 3], [1, 0, 3]) == 1       # substitution
    assert edit_distance([], [1, 2]) == 2
    per = phone_error_rate([[1, 2, 3], [4]], [[1, 2], [4]])
    np.testing.assert_allclose(per, 0.25)
