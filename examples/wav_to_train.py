#!/usr/bin/env python3
"""Fully standalone pipeline: wav files -> LF-MMI training.

No Kaldi, no precomputed anything.  This is the whole story in one
script, every stage native to the package:

    wav (data.read_wav)
      -> log-mel fbank (data.fbank_batch, jittable — can run on-device)
      -> phone LM + denominator + numerators from the transcripts
         (graphs.builder)
      -> TDNN acoustic model (models)
      -> chain loss with xent regularization (chain_loss_xent)

The synthetic "speech" makes each phone a tone at its own frequency,
so the fbank features are genuinely learnable.  Run:

    python examples/wav_to_train.py --steps 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pychain_tpu import ChainGraph, ChainGraphBatch, chain_loss_xent
from pychain_tpu.data import FbankConfig, fbank_batch, num_frames, \
    read_wav, write_wav
from pychain_tpu.graphs import (ChainTopology, estimate_phone_lm,
                                make_denominator_fst, make_numerator_fst)
from pychain_tpu.models import TDNN, TDNNConfig

SR = 16000


def synth_corpus(data_dir, utts=16, num_phones=8, seed=0):
    """Tone-per-phone synthetic speech with transcripts."""
    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)
    # distinct tones, all safely below Nyquist (SR/2 = 8 kHz)
    freqs = np.linspace(300.0, 7000.0, num_phones)
    markov = rng.dirichlet(np.ones(num_phones) * 0.4, size=num_phones)
    transcripts = []
    for i in range(utts):
        n_ph = rng.randint(4, 8)
        phones = [int(rng.randint(num_phones))]
        for _ in range(n_ph - 1):
            phones.append(int(rng.choice(num_phones, p=markov[phones[-1]])))
        wav = []
        for p in phones:
            dur = rng.randint(int(0.08 * SR), int(0.2 * SR))
            t = np.arange(dur) / SR
            tone = 0.3 * np.sin(2 * np.pi * freqs[p] * t)
            wav.append(tone + 0.02 * rng.randn(dur))
        wav = np.concatenate(wav).clip(-1, 1).astype(np.float32)
        write_wav(os.path.join(data_dir, f"utt{i:03d}.wav"), wav, SR)
        transcripts.append(phones)
    with open(os.path.join(data_dir, "text"), "w") as f:
        for i, t in enumerate(transcripts):
            f.write(f"utt{i:03d} {' '.join(map(str, t))}\n")
    return transcripts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/pychain_tpu_wav")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--num-phones", type=int, default=8)
    args = ap.parse_args()
    if args.steps < 1:
        ap.error("--steps must be >= 1")

    from pychain_tpu.utils.backend import tpu_tunnel_alive, tunnel_env_set
    if tunnel_env_set() and not tpu_tunnel_alive():
        print("WARNING: TPU tunnel unreachable; using CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    transcripts = synth_corpus(args.data_dir, num_phones=args.num_phones)
    B = len(transcripts)

    # ---- wav -> features (batched, jittable) ----
    cfg = FbankConfig(sample_rate=SR, num_bins=40)
    wavs = [read_wav(os.path.join(args.data_dir, f"utt{i:03d}.wav"))[0]
            for i in range(B)]
    n_max = max(len(w) for w in wavs)
    padded = np.zeros((B, n_max), np.float32)
    for i, w in enumerate(wavs):
        padded[i, :len(w)] = w
    feats = jax.jit(lambda s: fbank_batch(s, cfg))(padded)   # (B, T, 40)
    lengths = np.array([num_frames(len(w), cfg) for w in wavs], np.int32)
    T = feats.shape[1]
    print(f"features: {B} utts, T<= {T}, dim {feats.shape[2]}")

    # ---- transcripts -> graphs (all native) ----
    topo = ChainTopology(num_phones=args.num_phones)
    lm = estimate_phone_lm(transcripts, num_phones=args.num_phones,
                           order=2)
    den = ChainGraph(make_denominator_fst(lm, topo), log_domain=False)
    nums = [ChainGraph(make_numerator_fst(t, topo), log_domain=True)
            for t in transcripts]
    num_batch = ChainGraphBatch(
        nums, max_num_transitions=max(g.num_transitions for g in nums),
        max_num_states=max(g.num_states for g in nums))
    den_batch = ChainGraphBatch(den, B)
    print(f"graphs: den S={den.num_states} K={den.num_transitions}, "
          f"P={topo.num_pdfs}")

    # ---- model + training ----
    model = TDNN(TDNNConfig(num_pdfs=topo.num_pdfs, hidden_dim=128,
                            kernel_sizes=(3, 3, 3), dilations=(1, 1, 2),
                            strides=(1, 1, 1), dropout=0.0))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 40)),
                        train=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    lens_j = jnp.asarray(lengths)

    @jax.jit
    def step_fn(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, feats, train=False)
            loss, (mmi, xent) = chain_loss_xent(
                out, out, lens_j, num_batch, den_batch,
                xent_regularize=0.1, l2_regularize=5e-4)
            return loss, (mmi, xent)
        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state)
        return loss, parts, optax.apply_updates(params, updates), new_opt

    from pychain_tpu.decode import PhoneDecoder, phone_error_rate
    decoder = PhoneDecoder(lm, topo)

    def eval_per(p):
        out = model.apply(p, feats, train=False)
        res = decoder(out, lengths)
        return phone_error_rate(transcripts, res.phones)

    per0 = eval_per(params)
    t0 = time.time()
    first = None
    for s in range(1, args.steps + 1):
        loss, (mmi, xent), params, opt_state = step_fn(params, opt_state)
        if first is None:
            first = float(loss)
        if s % 5 == 0 or s == 1:
            print(f"step {s}: loss={float(loss):.4f} mmi={float(mmi):.4f} "
                  f"xent={float(xent):.4f}")
    per1 = eval_per(params)
    print(f"done: {args.steps} steps in {time.time() - t0:.1f}s; "
          f"loss {first:.4f} -> {float(loss):.4f}; "
          f"phone error rate {per0:.2%} -> {per1:.2%} "
          "(native Viterbi decode)")
    assert float(loss) < first, "training did not reduce the loss"
    return float(loss)


if __name__ == "__main__":
    main()
