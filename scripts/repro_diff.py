"""Diff two convergence runs' results.json + train_metrics.jsonl.

Round-4b stage R retrains the flagship recipe from scratch (same packed
data, same seeds, same config) after a host move wiped the gitignored
checkpoint, then this tool quantifies reproducibility: per-mode metric
deltas between the archived flagship results.json and the retrained run's,
plus loss-trajectory agreement at milestone epochs. Training on the TPU is
deterministic given (data, seed, config) up to XLA scheduling; this
measures how far "up to" goes end to end.

Pure-json aggregation — safe to run beside a TPU job (no jax import).
"""

import argparse
import json
import os


def load_metrics(path):
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "epoch" in rec:
                out[rec["epoch"]] = rec
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--archived",
                    default="/root/repo/artifacts/corpus_run_v2")
    ap.add_argument("--retrained",
                    default="/root/repo/artifacts/corpus_run_v2_repro")
    ap.add_argument("--milestones", default="1,10,100,400,1100")
    args = ap.parse_args()

    with open(os.path.join(args.archived, "results.json")) as f:
        a = json.load(f)
    with open(os.path.join(args.retrained, "results.json")) as f:
        b = json.load(f)

    print(f"archived step={a['step']}  retrained step={b['step']}")
    print()
    print("| mode | metric | archived | retrained | delta |")
    print("|---|---|---|---|---|")
    worst = 0.0
    for mode in a["modes"]:
        if mode not in b["modes"]:
            continue
        ma, mb = a["modes"][mode]["means"], b["modes"][mode]["means"]
        for k in ma:
            if not isinstance(ma[k], (int, float)) or k not in mb:
                continue
            d = mb[k] - ma[k]
            rel = abs(d) / max(abs(ma[k]), 1e-9)
            worst = max(worst, rel)
            print(f"| {mode} | {k} | {ma[k]:.4g} | {mb[k]:.4g} | "
                  f"{d:+.2e} |")
    print(f"\nworst relative metric delta: {worst:.2e}")

    la = load_metrics(os.path.join(args.archived, "train_metrics.jsonl"))
    lb = load_metrics(os.path.join(args.retrained, "train_metrics.jsonl"))
    eps = [int(e) for e in args.milestones.split(",")]
    print("\n| epoch | archived mean loss | retrained | delta |")
    print("|---|---|---|---|")
    for e in eps:
        if e in la and e in lb:
            da, db = la[e]["mean_loss"], lb[e]["mean_loss"]
            print(f"| {e} | {da:.6g} | {db:.6g} | {db - da:+.2e} |")


if __name__ == "__main__":
    main()
