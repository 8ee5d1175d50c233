"""CLI: train the TIP state predictor (reference train_model.py:21-74 recipe).

Paper run (reference README step 4):
  python -m tip_tpu.cli.train --data_prefix data/train_v1 --save_path output/model-v1 \
      --batch_size 256 --lr 1e-4 --epochs 1100 --seq_len 40 --cosine_lr \
      --weight_decay 1e-4 --optim AdamW --n_sbps 5 --with_acc_sum \
      --noise_input_hist 0.15 --seed 5104
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_prefix", required=True,
                    help="blob prefix: <prefix>_imu.npy etc.")
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=1100)
    ap.add_argument("--seq_len", type=int, default=40)
    ap.add_argument("--clip", type=float, default=5.0)
    ap.add_argument("--optim", default="Adam", choices=["Adam", "AdamW"])
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--cosine_lr", action="store_true")
    ap.add_argument("--n_sbps", type=int, default=5)
    ap.add_argument("--with_acc_sum", action="store_true")
    ap.add_argument("--noise_input_hist", type=float, default=0.15)
    ap.add_argument("--past_dropout", type=float, default=0.8)
    ap.add_argument("--in_dropout", type=float, default=0.0)
    ap.add_argument("--rnn_nhid", type=int, default=512)
    ap.add_argument("--tf_nhid", type=int, default=1024)
    ap.add_argument("--tf_in_dim", type=int, default=256)
    ap.add_argument("--n_heads", type=int, default=16)
    ap.add_argument("--tf_layers", type=int, default=4)
    ap.add_argument("--seed", type=int, default=5104)
    ap.add_argument("--n_model_shards", type=int, default=1,
                    help="tensor-parallel mesh axis size")
    ap.add_argument("--warm_start", default=None,
                    help="orbax ckpt dir or reference .pt: load weights only")
    ap.add_argument("--device_data", action="store_true",
                    help="upload the blobs to HBM and gather windows inside "
                         "the compiled step (removes the host input "
                         "bottleneck; blobs must fit in device memory)")
    ap.add_argument("--metrics", default=None,
                    help="structured jsonl training log (default: "
                         "<save_path>/metrics.jsonl)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (PERF.md: -1.5 ms/step at the "
                         "paper config; params/optimizer stay f32)")
    ap.add_argument("--dropout_rng", default="threefry",
                    choices=["threefry", "rbg"],
                    help="rbg = TPU hardware generator, ~2 ms/step faster; "
                         "threefry = cross-backend-reproducible default")
    ap.add_argument("--dropout_impl", default="rng",
                    choices=["rng", "hash"],
                    help="hash = counter-based murmur3 masks (no RNG "
                         "state; the fastest measured training config, "
                         "PERF.md: 7.78 ms/step with --bf16 --rnn_impl "
                         "pallas)")
    ap.add_argument("--rnn_impl", default="scan", choices=["scan", "pallas"],
                    help="pallas = fused RNN fwd + BPTT bwd kernels "
                         "(differentiable, grads scan-exact; ~0.3 ms/step)")
    ap.add_argument("--encoder_impl", default="xla",
                    choices=["xla", "pallas"],
                    help="pallas = whole-encoder-layer fused fwd + "
                         "rematerialising bwd kernels (hash-PRNG dropout; "
                         "see PERF.md)")
    args = ap.parse_args()

    import jax
    from tip_tpu.models.tip_model import ModelConfig
    from tip_tpu.parallel import mesh as mesh_lib
    from tip_tpu.train import data as data_lib
    from tip_tpu.train import train as train_lib
    from tip_tpu import constants as cst

    model_cfg = ModelConfig(
        size_s=cst.state_dim(args.n_sbps), with_acc_sum=args.with_acc_sum,
        tf_in_dim=args.tf_in_dim, tf_hid_size=args.tf_nhid,
        n_heads=args.n_heads, tf_layers=args.tf_layers,
        rnn_hid_size=args.rnn_nhid, in_dropout=args.in_dropout,
        past_dropout=args.past_dropout,
        compute_dtype="bfloat16" if args.bf16 else None,
        rnn_impl=args.rnn_impl, encoder_impl=args.encoder_impl,
        dropout_impl=args.dropout_impl)
    cfg = train_lib.TrainConfig(
        model=model_cfg, n_sbps=args.n_sbps, batch_size=args.batch_size,
        seq_len=args.seq_len, lr=args.lr, optimizer=args.optim,
        weight_decay=args.weight_decay, clip=args.clip, epochs=args.epochs,
        cosine_lr=args.cosine_lr, noise_input_hist=args.noise_input_hist,
        seed=args.seed, dropout_rng_impl=args.dropout_rng)

    ds = data_lib.PackedDataset.load(
        args.data_prefix + "_imu.npy", args.data_prefix + "_s.npy",
        args.data_prefix + "_info.npy", with_acc_sum=args.with_acc_sum)

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(n_model=args.n_model_shards)
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    import os
    metrics = args.metrics or os.path.join(args.save_path, "metrics.jsonl")
    train_lib.train_loop(cfg, ds, mesh=mesh, ckpt_dir=args.save_path,
                         warm_start=args.warm_start, metrics_path=metrics,
                         gather_on_device=args.device_data)


if __name__ == "__main__":
    main()
