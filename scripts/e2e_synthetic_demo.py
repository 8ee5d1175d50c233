"""End-to-end slice on real hardware: synthesize -> pack -> train -> evaluate.

Generates a family of synthetic SMPL motions, runs the full data pipeline,
trains the *full-size* paper-config model on the TPU for a few epochs, then
evaluates trained-vs-untrained parameters with the offline harness on
held-out motions. Metrics must improve.

  python scripts/e2e_synthetic_demo.py [--epochs 20] [--out /tmp/tip_e2e]
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_motion(rng, T=420, fps=120.0):
    from tip_tpu.data_gen import smpl

    t = np.arange(T) / fps
    poses = np.zeros((T, 24, 3))
    poses[:, 0] = [1.20919958, 1.20919958, 1.20919958]
    # randomized multi-joint swing field
    for j in (1, 2, 4, 5, 7, 8, 3, 6, 12, 15, 16, 17, 18, 19):
        amp = rng.uniform(0.05, 0.45)
        f = rng.uniform(0.3, 1.2)
        ph = rng.uniform(0, 2 * np.pi)
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        poses[:, j] = np.outer(amp * np.sin(2 * np.pi * f * t + ph), ax)
    trans = np.zeros((T, 3))
    trans[:, 2] = 0.95 + 0.03 * np.sin(2 * np.pi * 0.9 * t)
    trans[:, 0] = rng.uniform(-0.5, 0.5) * t
    trans[:, 1] = rng.uniform(-0.3, 0.3) * t
    return smpl.SmplMotion(poses=poses, trans=trans, fps=fps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n_train", type=int, default=16)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--out", default="/tmp/tip_e2e")
    ap.add_argument("--serving_mode", default="recompute",
                    choices=["recompute", "kv_cache", "kv_cache_rnn_carry"],
                    help="evaluate the trained model with this runner "
                         "serving mode (the kv-cache divergence study on a "
                         "TRAINED model, PERF.md)")
    args = ap.parse_args()

    from tip_tpu import eval_harness as H
    from tip_tpu.data_gen import amass_syn
    from tip_tpu.data_gen.combine import combine
    from tip_tpu.runtime import runner as runner_lib
    from tip_tpu.train import data as data_lib
    from tip_tpu.train import train as train_lib

    os.makedirs(args.out, exist_ok=True)
    train_dir = os.path.join(args.out, "syn_DEMO_v1")
    test_dir = os.path.join(args.out, "syn_DEMO_test_v1")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)

    rng = np.random.default_rng(7)
    t0 = time.time()
    for i in range(args.n_train + args.n_test):
        d = train_dir if i < args.n_train else test_dir
        path = os.path.join(d, f"motion_{i:02d}.pkl")
        if os.path.exists(path):
            continue
        payload = amass_syn.synthesize(make_motion(rng), rng=rng)
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    print(f"synthesized {args.n_train + args.n_test} motions "
          f"in {time.time()-t0:.1f}s")

    prefix = os.path.join(args.out, "train_demo")
    if not os.path.exists(prefix + "_imu.npy"):
        combine([train_dir], [1], prefix, seed=0)

    ds = data_lib.PackedDataset.load(prefix + "_imu.npy", prefix + "_s.npy",
                                     prefix + "_info.npy")

    cfg = train_lib.TrainConfig(epochs=args.epochs, log_interval=20)
    untrained = train_lib.init_state(cfg).params

    t0 = time.time()
    state = train_lib.train_loop(
        cfg, ds, ckpt_dir=os.path.join(args.out, "ckpt"),
        gather_on_device=True,
        log_fn=lambda r: print(json.dumps(r)))
    print(f"trained {args.epochs} epochs in {time.time()-t0:.1f}s")

    eval_cfg = H.EvalConfig(
        runner=runner_lib.RunnerConfig(serving_mode=args.serving_mode),
        test_len=400, max_motions_per_cat=args.n_test)
    files = [os.path.join(test_dir, f) for f in sorted(os.listdir(test_dir))]

    _, means_untrained, _ = H.evaluate(untrained, eval_cfg, files,
                                       log=lambda *a: None)
    _, means_trained, _ = H.evaluate(state.params, eval_cfg, files,
                                     log=lambda *a: None)
    print("untrained:", json.dumps(means_untrained, indent=1))
    print("trained:  ", json.dumps(means_trained, indent=1))

    assert means_trained["angle_deg"] < means_untrained["angle_deg"] * 0.8, \
        "training did not improve pose error"
    print("OK: end-to-end pipeline learns "
          f"({means_untrained['angle_deg']:.1f} -> "
          f"{means_trained['angle_deg']:.1f} deg)")


if __name__ == "__main__":
    main()
