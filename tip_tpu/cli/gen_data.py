"""CLI: synthesize training data from AMASS (reference
data-gen-and-viz-bullet-new.py:287-339 + data-gen-new-scripts.bash).

  python -m tip_tpu.cli.gen_data --src_dir <AMASS/subset> --save_dir data/syn_X_v1 \
      [--name_contains regex] [--n_proc 7] [--seed 42]
"""

import argparse
import os
import re

import numpy as np


def iter_jobs(src_dir, save_dir, name_contains):
    for d, _, files in os.walk(src_dir):
        for fn in files:
            if not fn.endswith("_poses.npz"):
                continue
            save_local = (d.rsplit("/", 1)[-1] + "_" + fn[:-10] + ".pkl"
                          ).replace(" ", "_")
            save_path = os.path.join(save_dir, save_local)
            if name_contains and not re.search(name_contains, save_path,
                                               re.IGNORECASE):
                continue
            if os.path.exists(save_path):      # idempotent resume
                continue
            yield os.path.join(d, fn), save_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--name_contains", default="")
    ap.add_argument("--n_proc", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    jobs = list(iter_jobs(args.src_dir, args.save_dir, args.name_contains))
    print(f"{len(jobs)} motions to synthesize")

    def run_one(i, src, dst):
        # per-job RNG stream: reproducible under any worker scheduling
        from tip_tpu.data_gen.amass_syn import synthesize_file
        rng = np.random.default_rng([args.seed, i])
        ok = synthesize_file(src, dst, rng=rng)
        if ok:
            print("wrote", dst)
        return int(ok)

    if args.n_proc > 1:
        from joblib import Parallel, delayed
        results = Parallel(n_jobs=args.n_proc)(
            delayed(run_one)(i, s, d) for i, (s, d) in enumerate(jobs))
    else:
        results = [run_one(i, s, d) for i, (s, d) in enumerate(jobs)]
    print("count", int(np.sum(results)))


if __name__ == "__main__":
    main()
