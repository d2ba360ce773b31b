"""Experiment-dir garbage collection (reference scripts/utils/clear_exps.py):
keep every 5th checkpoint plus the last one, delete the rest."""

from __future__ import annotations

import argparse
import os
import re
import shutil


def clear_experiment(exp_dir: str, keep_every: int = 5, dry_run: bool = False):
    pat = re.compile(r"checkpoint_(\d+)$")
    ckpts = []
    for name in os.listdir(exp_dir):
        m = pat.match(name)
        if m:
            ckpts.append((int(m.group(1)), os.path.join(exp_dir, name)))
    if not ckpts:
        return []
    ckpts.sort()
    last = ckpts[-1][0]
    removed = []
    for num, path in ckpts:
        if num == last or num % keep_every == 0:
            continue
        removed.append(path)
        if not dry_run:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
    return removed


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps_root", type=str, required=True)
    parser.add_argument("--keep_every", type=int, default=5)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()
    for exp in sorted(os.listdir(args.exps_root)):
        exp_dir = os.path.join(args.exps_root, exp)
        if not os.path.isdir(exp_dir):
            continue
        removed = clear_experiment(exp_dir, args.keep_every, args.dry_run)
        for r in removed:
            print(("DRY " if args.dry_run else "rm ") + r)
