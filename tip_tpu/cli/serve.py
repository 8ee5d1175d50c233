"""CLI: multi-stream pose-serving daemon (new capability vs the reference).

Serves many live IMU clients from one chip: each TCP client speaks the
imu_bridge wire protocol (42 ascii floats per frame, pre-calibrated) and
gets its predicted 114-d pose back as a jsonl line per 60 Hz tick, all
clients served by one vmapped StreamPool step (runtime/serving.py,
runtime/serve_daemon.py).

  python -m tip_tpu.cli.serve --ckpt output/model-v1 --five_sbp \
      --with_acc_sum --capacity 64 [--port 27100] [--serving_mode kv_cache] \
      [--bf16] [--chunk 256] [--seconds 0]
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=27100)
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=None,
                    help="lax.map sub-batch size for pools > ~512 streams")
    ap.add_argument("--five_sbp", action="store_true")
    ap.add_argument("--with_acc_sum", action="store_true")
    ap.add_argument("--serving_mode", default="recompute",
                    choices=["recompute", "kv_cache", "kv_cache_rnn_carry"])
    ap.add_argument("--forward_impl", default="xla", choices=["xla", "fused"],
                    help="fused = the batched Pallas cached-step kernel "
                         "(kv modes; 1.35M frames/s/chip measured, PERF.md)")
    ap.add_argument("--tail_impl", default="auto",
                    choices=["auto", "xla", "fused"],
                    help="fused = Pallas decode+tail kernels "
                         "(ops/fused_tail.py; 5-SBP layouts only). auto "
                         "(default) = fused on TPU/5-SBP, xla otherwise")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (the serving throughput sweet "
                         "spot, PERF.md)")
    ap.add_argument("--seconds", type=float, default=0.0,
                    help="stop after N seconds (0 = until ^C)")
    args = ap.parse_args()

    from tip_tpu import constants as cst
    from tip_tpu.models import tip_model as M
    from tip_tpu.runtime import calibration as cal_lib
    from tip_tpu.runtime import runner as runner_lib
    from tip_tpu.runtime.serve_daemon import ServeDaemon
    from tip_tpu.runtime.serving import StreamPool
    from tip_tpu.train import train as train_lib

    n_sbps = 5 if args.five_sbp else 2
    model_cfg = M.ModelConfig(
        size_s=cst.state_dim(n_sbps), with_acc_sum=args.with_acc_sum,
        forward_impl=args.forward_impl,
        compute_dtype="bfloat16" if args.bf16 else None)
    if args.ckpt.endswith(".pt"):
        import torch
        params = M.params_from_torch_state_dict(
            torch.load(args.ckpt, map_location="cpu"), model_cfg)
    else:
        params = train_lib.restore_checkpoint(
            args.ckpt, train_lib.TrainConfig(model=model_cfg, n_sbps=n_sbps),
            params_only=True).params

    cfg = runner_lib.RunnerConfig(model=model_cfg, n_sbps=n_sbps,
                                  with_acc_sum=args.with_acc_sum,
                                  serving_mode=args.serving_mode,
                                  tail_impl=args.tail_impl)
    pool = StreamPool(params, cfg, capacity=args.capacity, chunk=args.chunk)
    daemon = ServeDaemon(pool, cal_lib.t_pose_init_state(),
                         host=args.host, port=args.port)
    print(f"serving on {args.host}:{daemon.port} "
          f"(capacity {args.capacity}, mode {args.serving_mode})")
    daemon.run(seconds=args.seconds or None)


if __name__ == "__main__":
    main()
