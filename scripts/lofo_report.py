"""Build the leave-one-family-out comparison table for RESULTS.md.

Reads the flagship run's results.json (trained on all 12 families,
per-family breakdown includes dance) and the LOFO run's results.json
(trained WITHOUT dance, evaluated on the same held-out dance clips), and
prints the in-distribution vs out-of-distribution markdown table.

Pure-json aggregation — safe to run beside a TPU job (use `python -S` or
any interpreter; no jax import).
"""

import argparse
import json
import os

KEYS = [("angle_deg", "joint angle err (deg)"),
        ("sip_deg", "SIP err (deg)"),
        ("j_pos_cm", "joint pos err (cm)"),
        ("root_drift_10s", "root drift @10 s (m)"),
        ("jerk", "jerk x100")]


def fam_row(results, mode, fam):
    return results["modes"][mode]["by_family"][fam]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--flagship",
                    default="/root/repo/artifacts/corpus_run_v2/results.json")
    ap.add_argument("--lofo",
                    default="/root/repo/artifacts/corpus_run_lofo/results.json")
    ap.add_argument("--family", default="dance")
    ap.add_argument("--mode", default="recompute")
    args = ap.parse_args()

    with open(args.flagship) as f:
        flag = json.load(f)
    with open(args.lofo) as f:
        lofo = json.load(f)

    fr = fam_row(flag, args.mode, args.family)
    lr = fam_row(lofo, args.mode, args.family)
    assert fr["n"] == lr["n"], (fr["n"], lr["n"])

    print(f"LOFO: family={args.family} mode={args.mode} "
          f"n={fr['n']} clips; flagship step={flag['step']} "
          f"lofo step={lofo['step']}")
    print()
    print(f"| metric | trained WITH {args.family} | "
          f"trained WITHOUT {args.family} (LOFO) | degradation |")
    print("|---|---|---|---|")
    for k, label in KEYS:
        a, b = fr[k], lr[k]
        d = (f"{b / a:.2f}x" if a > 1e-9 else "—")
        print(f"| {label} | {a:.3f} | {b:.3f} | {d} |")

    # overall LOFO-eval means should equal the dance family row (eval was
    # family-filtered); print for cross-checking
    print()
    print("lofo eval means (should match its dance row):",
          json.dumps(lofo["modes"][args.mode]["means"], indent=None))


if __name__ == "__main__":
    main()
