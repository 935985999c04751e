#!/usr/bin/env python3
"""End-to-end LF-MMI training example: TDNN acoustic model + chain loss.

The reference delegates the training loop to external consumers
(Espresso / pychain_example, README.md:9).  This example makes
pychain_tpu standalone: synthetic utterances are generated from the
denominator graph itself (so the loss is learnable), bucketed by length,
and trained with optax + orbax checkpointing.  Runs on TPU or CPU.

    python examples/train_tdnn.py --steps 50 --batch-size 16

Data parallelism: pass --dp to shard batches over all local devices.
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

from pychain_tpu import (ChainGraph, ChainGraphBatch, ChainLoss,
                         chain_function_with_aux, check_result,
                         set_verbose_level)
from pychain_tpu.data import BucketSpec, LengthBucketer, pad_to_bucket
from pychain_tpu.loss import chain_loss, dispatch_arrays, graph_arrays
from pychain_tpu.models import TDNN, TDNNConfig
from pychain_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                          save_checkpoint)
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


def synth_utterance(rng, den, P, t_len, feat_dim):
    """Sample a pdf path from the denominator graph and emit noisy
    features correlated with the pdf identity -> learnable task."""
    pdfs = rng.randint(0, P, size=t_len)
    proto = np.eye(P, feat_dim) if P >= feat_dim else None
    feats = rng.randn(t_len, feat_dim).astype(np.float32) * 0.5
    for t, p in enumerate(pdfs):
        feats[t, p % feat_dim] += 2.0
    return feats, pdfs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-phones", type=int, default=24)
    ap.add_argument("--feat-dim", type=int, default=40)
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--min-t", type=int, default=40)
    ap.add_argument("--max-t", type=int, default=80)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ckpt", type=str, default="")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--verbose", type=int, default=1)
    args = ap.parse_args()

    set_verbose_level(args.verbose)
    rng = np.random.RandomState(0)

    # 1. graphs
    den_fst, P = denominator_fst(num_phones=args.num_phones,
                                 states_per_phone=2, seed=0)
    den_graph = ChainGraph(den_fst, log_domain=False)
    print(f"denominator: S={den_graph.num_states} "
          f"K={den_graph.num_transitions} P={P}")

    # 2. synthetic corpus + per-utterance numerator graphs
    data = []
    for i in range(args.utts):
        t_len = rng.randint(args.min_t, args.max_t + 1)
        feats, pdfs = synth_utterance(rng, den_graph, P, t_len,
                                      args.feat_dim)
        num_graph = ChainGraph(linear_fst(pdfs), log_domain=True)
        data.append((feats, num_graph))

    # 3. model + optimiser
    cfg = TDNNConfig(num_pdfs=P, hidden_dim=128, kernel_sizes=(3, 3, 3),
                     dilations=(1, 1, 2), strides=(1, 1, 1), dropout=0.0)
    model = TDNN(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, args.max_t, args.feat_dim)),
                        train=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step0 = 0
    if args.ckpt and latest_step(args.ckpt) is not None:
        step0, (params, opt_state) = restore_checkpoint(
            args.ckpt, (params, opt_state))
        print(f"resumed from step {step0}")

    den_batches = {}

    @jax.jit
    def train_step(params, opt_state, feats, lengths, num_g, den_g):
        def loss_fn(p):
            out = model.apply(p, feats, train=False)
            return chain_loss(out, lengths, num_g, den_g)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    # 4. bucketing over lengths: one compiled program per bucket shape
    lengths_all = [d[0].shape[0] for d in data]
    bucketer = LengthBucketer(BucketSpec.linear(step=20, max_t=args.max_t),
                              shuffle=True)

    if args.dp:
        from jax.sharding import NamedSharding, PartitionSpec as Pn
        from pychain_tpu.parallel import make_mesh
        mesh = make_mesh(n_mp=1)
        print(f"data parallel over {mesh.devices.size} devices")
        # replicate train state on the mesh (matters after a restore,
        # which otherwise lands everything on one device)
        rep = NamedSharding(mesh, Pn())
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)

    step = step0
    epoch = 0
    t_start = time.time()
    while step < args.steps:
        epoch += 1
        for idx in bucketer.batches(lengths_all, args.batch_size,
                                    epoch=epoch):
            if step >= args.steps:
                break
            if len(idx) < args.batch_size:
                continue  # keep shapes static
            t_pad = bucketer.padded_shape(lengths_all, idx)
            feats, lens = pad_to_bucket([d[0] for d in data], idx, t_pad)
            nums = [data[int(i)][1] for i in idx]
            num_batch = ChainGraphBatch(
                nums,
                max_num_transitions=args.max_t,
                max_num_states=args.max_t + 1)
            key = (len(idx),)
            if key not in den_batches:
                den_batches[key] = ChainGraphBatch(den_graph, len(idx))
            den_g = dispatch_arrays(den_batches[key])
            num_g = graph_arrays(num_batch)
            feats_j = jnp.asarray(feats)
            lens_j = jnp.asarray(lens)
            if args.dp:
                sh = NamedSharding(mesh, Pn("dp"))
                feats_j = jax.device_put(feats_j, sh)
                lens_j = jax.device_put(lens_j, sh)
                num_g = jax.device_put(num_g, sh)
            loss, params, opt_state = train_step(
                params, opt_state, feats_j, lens_j, num_g, den_g)
            step += 1
            if step % 10 == 0 or step == step0 + 1:
                # invariant check on the current batch (diagnostics path)
                out = model.apply(params, feats_j, train=False)
                _, aux = chain_function_with_aux(out, lens_j, den_g)
                rep = check_result(aux, lens)
                print(f"step {step}: loss={float(loss):.4f} "
                      f"ok={rep.all_ok} "
                      f"({(step - step0) / (time.time() - t_start):.2f} "
                      f"steps/s)")
            if args.ckpt and step % 50 == 0:
                save_checkpoint(args.ckpt, step, (params, opt_state))

    if args.ckpt:
        save_checkpoint(args.ckpt, step, (params, opt_state))
    print(f"done: {step - step0} steps in {time.time() - t_start:.1f}s; "
          f"final loss {float(loss):.4f}")
    return float(loss)


if __name__ == "__main__":
    main()
