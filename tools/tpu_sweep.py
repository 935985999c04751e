#!/usr/bin/env python3
"""One-command TPU validation sweep.

Runs, in order, against the real chip (requires the tunnel to be up):

1. the on-chip kernel parity tests (bf16 Pallas + semiring),
2. bench.py in every mode (headline, --full, --train, --semiring,
   --xl, --long, --s8k),
3. the sharded-pallas 1-device-mesh parity check (tools/sharded_check),
4. the fits_vmem dispatch-boundary sweep (tools/vmem_boundary),
5. the driver entry compile check (__graft_entry__.entry).

Writes a JSON report to --out (default /tmp/tpu_sweep.json) and prints
a summary line per stage.  Exits nonzero if any stage fails, and fails
fast with a clear message when the tunnel is unreachable.

Usage:  python tools/tpu_sweep.py [--out report.json] [--skip-tests]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, timeout, env=None):
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO,
                              env=env or dict(os.environ))
        return {"cmd": " ".join(cmd), "rc": proc.returncode,
                "secs": round(time.time() - t0, 1),
                "stdout": proc.stdout[-4000:],
                "stderr": proc.stderr[-2000:]}
    except subprocess.TimeoutExpired:
        return {"cmd": " ".join(cmd), "rc": -9,
                "secs": round(time.time() - t0, 1),
                "stdout": "", "stderr": f"timeout after {timeout}s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_sweep.json")
    ap.add_argument("--skip-tests", action="store_true")
    args = ap.parse_args()

    from pychain_tpu.utils.backend import tpu_tunnel_alive, tunnel_env_set
    if not tunnel_env_set():
        print("no TPU tunnel env; nothing to sweep", file=sys.stderr)
        return 1
    if not tpu_tunnel_alive():
        print("TPU tunnel unreachable; try again later", file=sys.stderr)
        return 1
    print("tunnel alive; sweeping", file=sys.stderr)

    report = {"stages": {}}
    ok = True

    if not args.skip_tests:
        r = run([sys.executable, "-m", "pytest",
                 "tests/test_pallas_bf16.py::test_pallas_bf16_on_tpu_hardware",
                 "tests/test_semiring.py::test_semiring_pallas_on_tpu_hardware",
                 "-q"], timeout=5400)
        report["stages"]["onchip_tests"] = r
        ok &= r["rc"] == 0
        print(f"[onchip_tests] rc={r['rc']} {r['secs']}s", file=sys.stderr)

    for mode, flags, timeout in (("headline", [], 1800),
                                 ("full", ["--full"], 1800),
                                 ("train", ["--train"], 1800),
                                 ("semiring", ["--semiring"], 1800),
                                 ("xl", ["--xl"], 2400),
                                 ("long", ["--long"], 2400),
                                 ("viterbi", ["--viterbi"], 2400),
                                 ("s8k", ["--s8k"], 2400)):
        r = run([sys.executable, "bench.py"] + flags, timeout=timeout)
        report["stages"][f"bench_{mode}"] = r
        line = [ln for ln in r["stdout"].splitlines()
                if ln.startswith("{")]
        if line:
            try:
                report["stages"][f"bench_{mode}"]["parsed"] = \
                    json.loads(line[-1])
            except json.JSONDecodeError:
                pass
        ok &= r["rc"] == 0
        print(f"[bench_{mode}] rc={r['rc']} {r['secs']}s "
              f"{line[-1] if line else ''}", file=sys.stderr)

    # end-to-end recipe on chip: synthetic corpus -> staged HBM corpus
    # -> jitted train steps -> steady-state + pipeline report; proves
    # the integration surface every sweep, not just the kernels
    r = run([sys.executable, "examples/train_corpus.py",
             "--corpus-utts", "128", "--corpus-phones", "300",
             "--corpus-min-t", "180", "--corpus-max-t", "200",
             "--bucket-step", "50", "--batch-size", "64",
             "--tile-dtype", "bfloat16", "--steps", "10",
             "--warmup-steps", "3", "--diag-every", "5",
             "--lr", "3e-4", "--device-corpus"], timeout=2400)
    bad = ("ok=False" in r.get("stdout", "")
           or "WARNING: final loss" in r.get("stderr", ""))
    report["stages"]["recipe"] = r
    ok &= r["rc"] == 0 and not bad
    print(f"[recipe] rc={r['rc']} {r['secs']}s", file=sys.stderr)

    # pallas-inside-shard_map on real hardware (1-device mesh): every
    # sweep re-proves the kernels x distribution intersection the
    # virtual-CPU-mesh tests cannot (VERDICT r2 "what's weak" #4)
    r = run([sys.executable, "tools/sharded_check.py"], timeout=2400)
    report["stages"]["sharded_pallas"] = r
    ok &= r["rc"] == 0
    print(f"[sharded_pallas] rc={r['rc']} {r['secs']}s", file=sys.stderr)

    # dispatch across the fits_vmem estimate boundary must compile or
    # fall back — never die in Mosaic (VERDICT r2 "what's weak" #6)
    r = run([sys.executable, "tools/vmem_boundary.py"], timeout=3000)
    report["stages"]["vmem_boundary"] = r
    ok &= r["rc"] == 0
    print(f"[vmem_boundary] rc={r['rc']} {r['secs']}s", file=sys.stderr)

    code = ("import jax, __graft_entry__ as g; fn, a = g.entry(); "
            "print('entry loss', jax.jit(fn)(*a))")
    r = run([sys.executable, "-c", code], timeout=1800)
    report["stages"]["entry"] = r
    ok &= r["rc"] == 0
    print(f"[entry] rc={r['rc']} {r['secs']}s", file=sys.stderr)

    report["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(("SWEEP OK" if ok else "SWEEP FAILED") + f" -> {args.out}",
          file=sys.stderr)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
