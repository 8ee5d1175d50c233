"""Honest training step timings at the paper config, by implementation.

Measures make_epoch_fn (whole-epoch lax.scan, block_until_ready) over
synthetic device-resident data — the same methodology as PERF.md's training
table — for the XLA encoder vs the fused whole-layer Pallas kernels
(ModelConfig.encoder_impl), crossed with the RNN impl and dropout RNG.

  python scripts/bench_train_step.py [--steps 100] [--batch 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_step_gflops(m, T, B, n_sbps=5):
    """Analytic fwd+bwd FLOPs of one train step (matmuls only; bwd = 2x
    fwd). Used for the MFU rows in PERF.md — same model for every shape so
    the paper-vs-scaled comparison is apples to apples."""
    d, ff, rh = m.tf_in_dim, m.tf_hid_size, m.rnn_hid_size
    in_dim = m.input_size_imu + (18 if m.with_acc_sum else 0) + m.size_s
    per_layer = (4 * T * d * d        # qkv + out_proj
                 + 2 * T * T * d      # scores + attn*V (all heads)
                 + 2 * T * d * ff)    # ff1 + ff2
    fwd = (T * in_dim * d + m.tf_layers * per_layer
           + T * (d * rh + rh * rh)   # rnn
           + T * rh * m.size_s)       # out head
    return 3 * 2 * fwd * B / 1e9      # x2 mul-add, x3 fwd+bwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scaled", action="store_true",
                    help="also run a d=1024/ff=4096/hd=64/rnn=1024 variant "
                         "of the same epoch-scan code path (VERDICT r4: "
                         "substantiate that the paper shape's ~15% MFU is "
                         "the SHAPE's floor, not the code path's)")
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="chip bf16 peak for the MFU column (v5e-class)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tip_tpu import constants as cst
    from tip_tpu.models.tip_model import ModelConfig
    from tip_tpu.train import data as data_lib
    from tip_tpu.train import train as train_lib

    # synthetic packed blobs big enough for the window sampler
    T_total = 40 * args.batch * 4 + 800
    rng = np.random.default_rng(0)
    ds = data_lib.PackedDataset(
        imu=rng.normal(size=(T_total, 72)).astype(np.float32),
        acc_sum=rng.normal(size=(T_total, 18)).astype(np.float32),
        s=(rng.normal(size=(T_total, 131)) * 0.1).astype(np.float32),
        info=np.array([[0, T_total, 1]], np.int64))
    device_data = data_lib.to_device(ds)
    idx = data_lib.sample_epoch_indices(ds.info, 40,
                                        np.random.default_rng(1))
    n_b = min(args.steps, len(idx) // args.batch)
    ends = jnp.asarray(idx[:n_b * args.batch].reshape(n_b, args.batch),
                       jnp.int32)

    variants = [
        ("f32 threefry xla-enc scan-rnn", dict(), "threefry"),
        ("bf16 rbg xla-enc scan-rnn",
         dict(compute_dtype="bfloat16"), "rbg"),
        ("bf16 rbg xla-enc pallas-rnn",
         dict(compute_dtype="bfloat16", rnn_impl="pallas"), "rbg"),
        ("bf16 rbg PALLAS-enc pallas-rnn",
         dict(compute_dtype="bfloat16", rnn_impl="pallas",
              encoder_impl="pallas"), "rbg"),
        ("bf16 rbg PALLAS-enc scan-rnn",
         dict(compute_dtype="bfloat16", encoder_impl="pallas"), "rbg"),
        ("f32 threefry PALLAS-enc scan-rnn",
         dict(encoder_impl="pallas"), "threefry"),
        ("bf16 HASH-drop xla-enc pallas-rnn",
         dict(compute_dtype="bfloat16", rnn_impl="pallas",
              dropout_impl="hash"), "rbg"),
        ("f32 HASH-drop xla-enc pallas-rnn",
         dict(rnn_impl="pallas", dropout_impl="hash"), "threefry"),
    ]
    if args.scaled:
        # MXU-friendly scaled shape on the SAME code path: hd=64 removes
        # the 8x lane-tile padding of the paper's hd=16, ff/d stay 4:1
        variants = [
            ("bf16 HASH-drop xla-enc scan-rnn SCALED d1024/hd64",
             dict(compute_dtype="bfloat16", dropout_impl="hash",
                  tf_in_dim=1024, tf_hid_size=4096, rnn_hid_size=1024,
                  n_heads=16), "rbg"),
            ("bf16 HASH-drop xla-enc pallas-rnn (paper shape, for MFU "
             "side-by-side)",
             dict(compute_dtype="bfloat16", rnn_impl="pallas",
                  dropout_impl="hash"), "rbg"),
        ]
    for name, mkw, rng_impl in variants:
        cfg = train_lib.TrainConfig(
            model=ModelConfig(size_s=cst.state_dim(5), with_acc_sum=True,
                              **mkw),
            batch_size=args.batch, dropout_rng_impl=rng_impl)
        epoch_fn = train_lib.make_epoch_fn(cfg, device_data)
        state = train_lib.init_state(cfg)
        s2, aux = epoch_fn(state, ends)          # compile + warmup
        jax.block_until_ready(s2)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s2, aux = epoch_fn(state, ends)
            jax.block_until_ready(s2)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) / n_b * 1e3
        gf = train_step_gflops(cfg.model, cfg.seq_len, args.batch)
        print(json.dumps({
            "variant": name, "ms_per_step": round(ms, 3),
            "samples_per_s": int(args.batch / ms * 1e3),
            "steps": n_b,
            "gflops_per_step": round(gf, 1),
            "tflops_per_s": round(gf / ms, 1),
            "mfu_pct": round(100.0 * gf / ms / args.peak_tflops, 1),
            "loss_head": round(float(np.asarray(aux["loss"])[0]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
