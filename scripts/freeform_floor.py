"""Decompose freeform-family root drift into velocity bias vs random walk.

The freeform family is the quality tail (RESULTS.md: ~8 deg / ~3.7 m drift
vs 2.3 deg overall). It is contact-free by construction, so SBP anchoring
cannot fire and root position is pure dead reckoning on the predicted root
velocity — the same failure mode the reference has (its drift correction,
data_utils.py:473-548, also needs active contacts). This tool quantifies
WHY the drift floor binds, from a trajectory dump:

  python -m tip_tpu.cli.evaluate --ckpt ... --five_sbp --with_acc_sum \
      --test_dir artifacts/corpus_run_v2/corpus_test --save_trajs /tmp/trajs.pkl
  python scripts/freeform_floor.py --trajs /tmp/trajs.pkl

Per freeform clip it reports:
  * measured drift @10 s (displacement metric, head/tail-cropped like
    ops/metrics.loss_root_dist_pos);
  * the per-clip mean per-frame root-velocity error ("bias") and the drift
    a constant bias alone would produce over 10 s;
  * the residual drift after removing the clip's own bias (the
    zero-mean random-walk component — the irreducible dead-reckoning
    floor for ANY integrator with this per-frame noise).

If bias dominates, better freeform coverage (corpus supplements) can still
help — the model is systematically mis-estimating velocity on those
motions. If the debiased random walk dominates, the floor is inherent
open-loop integration noise and more data cannot fix it.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FPS = 60
CROP_HEAD, CROP_TAIL = 30, 6       # reference offline_testing_simple.py:437


def clip_stats(gt, pred, horizon_s=10.0):
    g = np.asarray(gt)[CROP_HEAD:-CROP_TAIL, 0:3]
    p = np.asarray(pred)[CROP_HEAD:-CROP_TAIL, 0:3]
    n = min(len(g), len(p))
    g, p = g[:n], p[:n]
    k = int(horizon_s * FPS)

    if n <= k:
        return None
    # metric-parity drift: first frame -> t seconds, single window
    # (ops/metrics.loss_root_dist_pos, data_utils.py:381-391)
    drift_metric = float(np.linalg.norm((p[k] - p[0]) - (g[k] - g[0])))
    # window-mean drift over every start frame — the stable statistic the
    # bias/random-walk decomposition below is compared against
    d = np.linalg.norm((p[k:] - p[:-k]) - (g[k:] - g[:-k]), axis=-1)
    drift = float(d.mean())

    v_err = np.diff(p, axis=0) - np.diff(g, axis=0)    # (n-1, 3) per frame
    bias = v_err.mean(axis=0)                          # constant component
    resid = v_err - bias                               # zero-mean noise
    bias_drift = float(np.linalg.norm(bias) * k)
    # debiased integrator: drift of cumsum(resid) over the same horizon
    c = np.vstack([np.zeros(3), np.cumsum(resid, axis=0)])
    rd = np.linalg.norm(c[k:] - c[:-k], axis=-1)
    debiased_drift = float(rd.mean())
    sigma = float(resid.std(axis=0).mean())
    return dict(drift_10s=drift, drift_metric=drift_metric,
                bias_mps=float(np.linalg.norm(bias) * FPS),
                bias_drift_10s=bias_drift,
                debiased_drift_10s=debiased_drift,
                frame_sigma_m=sigma, frames=n)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trajs", required=True,
                    help="pkl from cli/evaluate --save_trajs")
    ap.add_argument("--family", default="freeform")
    ap.add_argument("--horizon_s", type=float, default=10.0)
    args = ap.parse_args()

    with open(args.trajs, "rb") as fh:
        d = pickle.load(fh)

    rows = []
    for f, gt, pred in zip(d["files"], d["gt_list"], d["ours_list"]):
        base = os.path.basename(f)
        if args.family not in base:
            continue
        st = clip_stats(gt, pred, args.horizon_s)
        if st:
            rows.append((base, st))

    if not rows:
        print(f"no '{args.family}' clips with a full {args.horizon_s}s "
              f"horizon in {args.trajs}")
        return

    print(f"| clip | drift@10s metric (m) | window-mean | vel bias (m/s) | "
          f"bias-only drift | debiased drift | frame sigma (m) |")
    print("|---|---|---|---|---|---|---|")
    for base, st in sorted(rows, key=lambda r: -r[1]["drift_10s"]):
        print(f"| {base} | {st['drift_metric']:.2f} | {st['drift_10s']:.2f} | "
              f"{st['bias_mps']:.3f} | "
              f"{st['bias_drift_10s']:.2f} | {st['debiased_drift_10s']:.2f} | "
              f"{st['frame_sigma_m']:.4f} |")
    tot = {k: float(np.mean([st[k] for _, st in rows]))
           for k in rows[0][1]}
    print(f"\nmeans: drift {tot['drift_10s']:.2f} m; bias-only "
          f"{tot['bias_drift_10s']:.2f} m; debiased "
          f"{tot['debiased_drift_10s']:.2f} m "
          f"(bias fraction ~{tot['bias_drift_10s'] / max(tot['drift_10s'], 1e-9):.0%})")


if __name__ == "__main__":
    main()
