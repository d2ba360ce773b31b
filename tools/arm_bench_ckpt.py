"""Arm .runs/bench_ckpt.json from a validated train_to_spec summary.

The marker makes the driver's plain `python bench.py` measure the
REAL-acceptance speculative headline (bench.resolve_bench_ckpt).  Arms
only when the summary clears the same thresholds the r4 queue used:
spec_acceptance >= 0.5 and templated_frac >= 0.9.  The marker pins the
batch/prefill-chunk profile the checkpoint was validated at so the
harness re-measures the same program (cache hit).

Usage: python tools/arm_bench_ckpt.py <t2s_summary.json> [--batch 24]
       [--chunks 3] [--spec 3] [--force]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("summary")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--chunks", type=int, default=3)
    p.add_argument("--spec", type=int, default=3)
    p.add_argument("--kv", choices=["int8", "bf16"], default="int8",
                   help="KV-cache dtype the checkpoint was VALIDATED at "
                        "(int8-KV prefill skew is the r4 degeneration "
                        "suspect; a bf16-validated ckpt must be served "
                        "bf16)")
    p.add_argument("--force", action="store_true",
                   help="arm even below the acceptance/templated gates")
    args = p.parse_args()

    rec = json.load(open(args.summary))
    acc = rec.get("spec_acceptance") or 0.0
    frac = rec.get("templated_frac") or 0.0
    ckpt = rec.get("ckpt")
    if not ckpt or not os.path.exists(ckpt):
        sys.exit(f"no checkpoint at {ckpt!r}")
    if not args.force and (acc < 0.5 or frac < 0.9):
        sys.exit(f"NOT arming: spec_acceptance={acc} templated_frac={frac} "
                 "(gates: >=0.5 / >=0.9; --force overrides)")
    marker = os.path.join(ROOT, ".runs", "bench_ckpt.json")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"ckpt": ckpt, "spec": args.spec, "batch": args.batch,
                   "prefill_chunks": args.chunks, "kv": args.kv}, f)
    print(f"armed {marker}: acceptance={acc} templated={frac} ckpt={ckpt}")


if __name__ == "__main__":
    main()
