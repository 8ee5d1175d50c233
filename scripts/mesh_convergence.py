"""Multi-device training convergence mini-run (virtual CPU mesh).

Extends multi-chip correctness from one dryrun step (__graft_entry__.
dryrun_multichip, scripts/dcn_dryrun.py) to an actual optimization
trajectory: the same tiny slice of the packed corpus is trained for
--epochs epochs twice — single-device and on a (data x model) mesh of 8
virtual CPU devices — and the per-epoch mean-loss curves must agree.

Exact agreement is not expected: the meshed step all-reduces gradients in
a different summation order (psum over data shards vs one fused reduction),
so trajectories diverge at fp32 rounding rate; the assertion is a
per-epoch relative tolerance wide enough for reduction-order noise and
tight enough to catch a sharding bug (wrong batch split, missed psum,
desynced dropout), all of which produce O(1) curve departures immediately.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/mesh_convergence.py [--epochs 30]
(also self-forces cpu via jax.config — the axon sitecustomize overrides
the env var, CLAUDE.md.)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_prefix",
                    default="/root/repo/artifacts/corpus_run_v2/packed")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--segments", type=int, default=8,
                    help="corpus segments in the mini-dataset")
    ap.add_argument("--downsample", type=int, default=12,
                    help="extra window-downsample factor (keeps epochs tiny)")
    ap.add_argument("--rtol", type=float, default=0.05)
    ap.add_argument("--out", default=None, help="write the JSON line here too")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, jax.devices()

    from tip_tpu import constants as cst
    from tip_tpu.models.tip_model import ModelConfig
    from tip_tpu.parallel import mesh as mesh_lib
    from tip_tpu.train import data as data_lib
    from tip_tpu.train import train as train_lib

    ds = data_lib.PackedDataset.load(args.data_prefix + "_imu.npy",
                                     args.data_prefix + "_s.npy",
                                     args.data_prefix + "_info.npy",
                                     with_acc_sum=True)
    info = ds.info[:args.segments].copy()
    info[:, 2] *= args.downsample
    ds = data_lib.PackedDataset(imu=ds.imu, acc_sum=ds.acc_sum, s=ds.s,
                                info=info)

    # rnn_impl="scan" on BOTH sides: under a mesh _mesh_safe would switch
    # pallas->scan anyway; the comparison must not also compare RNN impls
    # batch 64 (divisible by the 4-way data axis): the mini-dataset holds
    # only a few hundred windows per epoch and the default 256 would be
    # dropped whole by drop_remainder
    cfg = train_lib.TrainConfig(
        model=ModelConfig(size_s=cst.state_dim(5), with_acc_sum=True,
                          rnn_impl="scan"),
        n_sbps=5, batch_size=64, epochs=args.epochs, optimizer="AdamW")
    n_win = sum(max(1, round(((e - 1) - (s + cfg.seq_len)) / r))
                for s, e, r in info.astype(np.int64))
    assert n_win >= cfg.batch_size, (n_win, cfg.batch_size)

    def run(mesh):
        losses = []

        def log_fn(rec):
            if "mean_loss" in rec:
                losses.append(rec["mean_loss"])
                print(("mesh " if mesh is not None else "single ")
                      + f"epoch {rec['epoch']}: {rec['mean_loss']:.4f}",
                      flush=True)

        train_lib.train_loop(cfg, ds, mesh=mesh, log_fn=log_fn,
                             max_epochs=args.epochs)
        return np.asarray(losses)

    single = run(None)
    meshed = run(mesh_lib.make_mesh(n_data=4, n_model=2))

    rel = np.abs(single - meshed) / np.maximum(np.abs(single), 1e-9)
    result = {
        "metric": "mesh_convergence_minirun",
        "epochs": args.epochs,
        "mesh": "4x2 data x model (8 virtual cpu devices)",
        "single_final_loss": round(float(single[-1]), 5),
        "mesh_final_loss": round(float(meshed[-1]), 5),
        "max_epoch_rel_diff": round(float(rel.max()), 5),
        "rtol": args.rtol,
        "loss_drop_single": round(float(single[0] / single[-1]), 2),
        "ok": bool(rel.max() < args.rtol and single[-1] < single[0]),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    assert result["ok"], result


if __name__ == "__main__":
    main()
