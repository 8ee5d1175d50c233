"""CLI: synthesize training data from AMASS (reference
data-gen-and-viz-bullet-new.py:287-339 + data-gen-new-scripts.bash).

  python -m tip_tpu.cli.gen_data --src_dir <AMASS/subset> --save_dir data/syn_X_v1 \
      [--name_contains regex] [--n_proc 7] [--seed 42] \
      [--shard_index 0 --num_shards 1]

Multi-host fan-out (SURVEY.md §2.8 host parallelism): run one process per
host with --shard_index/--num_shards; motions are partitioned by a stable
hash of the output name, so shards never collide, resume is idempotent, and
the per-motion RNG stream is independent of scheduling, sharding, or resume
order.
"""

import argparse
import os
import re
import zlib

import numpy as np


def _name_hash(save_path: str) -> int:
    return zlib.crc32(os.path.basename(save_path).encode())


def iter_jobs(src_dir, save_dir, name_contains, shard_index=0, num_shards=1):
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
            if _name_hash(save_path) % num_shards != shard_index:
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
    ap.add_argument("--shard_index", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1,
                    help="partition motions across hosts by output-name hash")
    args = ap.parse_args()
    assert 0 <= args.shard_index < args.num_shards

    os.makedirs(args.save_dir, exist_ok=True)
    jobs = list(iter_jobs(args.src_dir, args.save_dir, args.name_contains,
                          args.shard_index, args.num_shards))
    print(f"{len(jobs)} motions to synthesize "
          f"(shard {args.shard_index}/{args.num_shards})")

    def run_one(src, dst):
        # RNG stream derived from the output name: reproducible under any
        # worker scheduling, sharding, or resume order
        from tip_tpu.data_gen.amass_syn import synthesize_file
        rng = np.random.default_rng([args.seed, _name_hash(dst)])
        ok = synthesize_file(src, dst, rng=rng)
        if ok:
            print("wrote", dst)
        return int(ok)

    if args.n_proc > 1:
        from joblib import Parallel, delayed
        results = Parallel(n_jobs=args.n_proc)(
            delayed(run_one)(s, d) for s, d in jobs)
    else:
        results = [run_one(s, d) for s, d in jobs]
    print("count", int(np.sum(results)))


if __name__ == "__main__":
    main()
