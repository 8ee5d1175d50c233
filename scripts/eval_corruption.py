"""Sensor-corruption degradation sweep over a converged checkpoint.

Gives the headline quality number error bars (VERDICT r3: "1.63 deg may be
partly generator memorization; nothing currently bounds that"): the held-out
corpus is re-evaluated under escalating off-distribution sensor corruption
(eval_corruption.SWEEP — NaN dropout bursts repaired by the reference
imputation path, constant acc bias beyond the train-time ±0.1, calibration
rotation error) and the metric table is written per rung.

Usage:
    python scripts/eval_corruption.py --out /root/repo/artifacts/corpus_run_v2 \
        [--results corruption.json] [--mode recompute] [--n_motions 20]

Reference corruption sources: preprocess_DIP_TC_new.py:112-136 (dropout
imputation), preprocess_and_combine_syn_amass.py:86 + constants.py:19
(train-time bias augmentation), live-demo calibration step (mount error).
"""

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root (tip_tpu)
sys.path.insert(0, _HERE)                    # scripts (train_convergence)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/artifacts/corpus_run_v2")
    ap.add_argument("--test_dir", default=None)
    ap.add_argument("--results", default="corruption.json")
    ap.add_argument("--mode", default="recompute",
                    help="serving mode for the sweep (one mode keeps the "
                         "sweep ~10 min; modes match to ~0.001 deg anyway)")
    ap.add_argument("--test_len", type=int, default=690)
    ap.add_argument("--n_motions", type=int, default=0,
                    help="cap motions per rung (0 = all)")
    ap.add_argument("--epochs", type=int, default=1100)
    args = ap.parse_args()

    import jax.numpy as jnp  # noqa: F401

    from tip_tpu import constants as cst
    from tip_tpu import eval_corruption as EC
    from tip_tpu import eval_harness as H
    from tip_tpu.models.tip_model import ModelConfig
    from tip_tpu.runtime import runner as runner_lib
    from tip_tpu.train import train as train_lib

    from train_convergence import make_train_cfg

    cfg_t = make_train_cfg(args.epochs)
    state = train_lib.restore_checkpoint(os.path.join(args.out, "ckpt"),
                                         cfg_t, params_only=True)
    print(f"eval at step {int(state.step)}")
    test_dir = args.test_dir or os.path.join(args.out, "corpus_test")
    files = [os.path.join(test_dir, f) for f in sorted(os.listdir(test_dir))
             if f.endswith(".pkl")]
    if args.n_motions:
        files = files[:args.n_motions]

    model_cfg = ModelConfig(size_s=cst.state_dim(5), with_acc_sum=True)
    res_path = os.path.join(args.out, args.results)
    results = {"step": int(state.step), "mode": args.mode,
               "n_test": len(files), "rungs": {}}
    if os.path.exists(res_path):
        cached = json.load(open(res_path))
        if cached.get("step") == int(state.step):
            results = cached

    for cor in EC.SWEEP:
        label = cor.label()
        if label in results["rungs"]:
            print(f"{label}: cached")
            continue
        ecfg = H.EvalConfig(
            runner=runner_lib.RunnerConfig(model=model_cfg, n_sbps=5,
                                           with_acc_sum=True,
                                           serving_mode=args.mode),
            test_len=args.test_len, max_motions_per_cat=len(files),
            corruption=None if label == "clean" else cor)
        t0 = time.time()
        _, means, maxima = H.evaluate(state.params, ecfg, files,
                                      log=lambda *a: None)
        results["rungs"][label] = {
            "config": {k: v for k, v in cor.__dict__.items()},
            "means": means,
            "worst_angle": maxima["angle_deg"][0],
            "eval_s": round(time.time() - t0, 1)}
        print(label, json.dumps(means), flush=True)
        with open(res_path, "w") as f:
            json.dump(results, f, indent=1)

    print(f"wrote {res_path}")


if __name__ == "__main__":
    main()
