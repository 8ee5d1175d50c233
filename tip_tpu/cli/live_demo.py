"""CLI: live streaming demo (reference live_demo_new.py:186-327).

Consumes 60 Hz IMU frames from the TCP bridge (native/imu_bridge or a real
sensor SDK speaking the same protocol), runs the two-stage calibration, and
streams poses through the full runner; optional PyBullet viz when available,
otherwise a jsonl pose writer.

  # terminal 1: replay a recording through the bridge
  native/build/imu_bridge --replay recording.f32 --hz 60
  # terminal 2:
  python -m tip_tpu.cli.live_demo --ckpt output/model-v1 --with_acc_sum --five_sbp \
      [--skip_calibration] [--seconds 30] [--out poses.jsonl]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=27015)
    ap.add_argument("--five_sbp", action="store_true")
    ap.add_argument("--with_acc_sum", action="store_true")
    ap.add_argument("--multi_sbp_correction", action="store_true")
    ap.add_argument("--skip_calibration", action="store_true",
                    help="treat incoming frames as already bone-frame")
    ap.add_argument("--seconds", type=float, default=0.0,
                    help="stop after N seconds (0 = until ^C)")
    ap.add_argument("--out", default=None, help="jsonl pose output path")
    ap.add_argument("--record", default=None,
                    help="record calibrated 72-float frames (raw f32) for "
                         "offline evaluation; a snapshot is persisted every "
                         "15 s like the reference (live_demo_new.py:313-323)")
    ap.add_argument("--metrics", default=None,
                    help="jsonl metrics output (latency percentiles every "
                         "second + final summary)")
    ap.add_argument("--tail_impl", default="auto",
                    choices=["auto", "xla", "fused"],
                    help="fused = Pallas decode+tail kernels "
                         "(ops/fused_tail.py; 5-SBP layouts only). auto "
                         "(default) = fused on TPU/5-SBP, xla otherwise")
    ap.add_argument("--viz", action="store_true",
                    help="PyBullet viewer: predicted character + SBP markers "
                         "+ terrain heightfield re-meshed every 15 frames "
                         "(reference render_funcs.py:69-227, "
                         "live_demo_new.py:293-305); needs the pybullet wheel")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tip_tpu import constants as cst
    from tip_tpu.models import tip_model as M
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import calibration as cal_lib
    from tip_tpu.runtime import full_runner as FR
    from tip_tpu.runtime import terrain as terrain_lib
    from tip_tpu.runtime import runner as runner_lib
    from tip_tpu.runtime.imu_client import IMUClient
    from tip_tpu.train import train as train_lib

    n_sbps = 5 if args.five_sbp else 2
    model_cfg = M.ModelConfig(size_s=cst.state_dim(n_sbps),
                              with_acc_sum=args.with_acc_sum)
    if args.ckpt.endswith(".pt"):
        import torch
        params = M.params_from_torch_state_dict(
            torch.load(args.ckpt, map_location="cpu"), model_cfg)
    else:
        params = train_lib.restore_checkpoint(
            args.ckpt, train_lib.TrainConfig(model=model_cfg, n_sbps=n_sbps),
            params_only=True).params

    cfg = FR.FullRunnerConfig(
        base=runner_lib.RunnerConfig(model=model_cfg, n_sbps=n_sbps,
                                     with_acc_sum=args.with_acc_sum,
                                     tail_impl=args.tail_impl),
        terrain=terrain_lib.TerrainConfig(),
        multi_sbp=args.multi_sbp_correction)
    skel = kin.amass_skeleton()

    client = IMUClient(args.host, args.port)
    client.start()
    while client.current_reading() is None:
        time.sleep(0.05)
    print("receiving frames")

    def mean_readings(seconds=3.0):
        buf = []
        t_end = time.time() + seconds
        while time.time() < t_end:
            buf.append(client.current_reading())
            time.sleep(cst.DT)
        return np.mean(buf, axis=0)

    if args.skip_calibration:
        cal = None
    else:
        input("Align all IMUs with the room axes, then press enter.")
        print("hold 3 s…")
        mean_aligned = mean_readings()
        input("Now wear the IMUs, stand in T-pose, press enter.")
        print("hold 3 s…")
        mean_tpose = mean_readings()
        cal = cal_lib.calibrate(mean_aligned, mean_tpose)

    s_init = cal_lib.t_pose_init_state()
    carry = FR.full_runner_init(cfg, skel, jnp.asarray(s_init, jnp.float32))
    # pre-pack fused-kernel weights once (the per-frame dispatch has no
    # scan for XLA to hoist the pack out of); None for the xla impl
    packed = runner_lib.pack_fused_weights(params, cfg.base)
    step = jax.jit(lambda p, pk, c, x: FR.full_runner_step(
        p, c, x, cfg, skel, packed_ws=pk))

    # compile before the real-time loop starts (first call is slow)
    print("compiling runner step…")
    t0 = time.time()
    warm_carry, warm_out = step(params, packed, carry,
                                jnp.zeros(72, jnp.float32).at[0].set(1.0)
                                .at[4].set(1.0).at[8].set(1.0))
    jax.block_until_ready(warm_out["qdq"])
    print(f"compiled in {time.time()-t0:.1f}s")

    from tip_tpu.utils.observability import LatencyHistogram, MetricsWriter

    viewer = None
    to_bullet = None
    if args.viz:
        from tip_tpu.viz import pybullet_viz, urdf_export
        viewer = pybullet_viz.Viewer(urdf_export.default_urdf_path(),
                                     compare_gt=False)
        to_bullet = jax.jit(kin.our_pose_to_bullet)

    out_f = open(args.out, "w") if args.out else None
    metrics = MetricsWriter(args.metrics) if args.metrics else None
    rec = [] if args.record else None
    rec_flushed = 0
    hist = LatencyHistogram()
    t0 = time.time()
    last_report = t0
    t = 0
    try:
        while not args.seconds or time.time() - t0 < args.seconds:
            tick = time.perf_counter()
            reading = client.current_reading()
            if cal is not None:
                reading = cal_lib.transform_reading(cal, reading)
            with hist.timed():
                carry, out = step(params, packed, carry,
                                  jnp.asarray(reading, jnp.float32))
                qdq = np.asarray(out["qdq"])
            if out_f:
                out_f.write(json.dumps({"t": t, "qdq": qdq.tolist()}) + "\n")
            if viewer is not None:
                viewer.set_pose(np.asarray(to_bullet(out["qdq"])))
                viewer.set_markers(np.asarray(out["viz_locs"]))
                if t % 15 == 0:   # heightfield re-mesh (ref :293-305)
                    from tip_tpu.runtime import terrain as _terr
                    viewer.update_heightfield(
                        np.asarray(_terr.height_field(carry.terrain)),
                        cfg.terrain.grid_size)
            if rec is not None:
                rec.append(reading.astype(np.float32))
                # persist a snapshot every 15 s (reference
                # live_demo_new.py:313-323 dumps a pkl every 15 s)
                if len(rec) - rec_flushed >= int(15.0 / cst.DT):
                    np.stack(rec).tofile(args.record)
                    rec_flushed = len(rec)
            if metrics is not None and time.time() - last_report >= 1.0:
                metrics.write(kind="latency", frame=t, **hist.summary())
                last_report = time.time()
            # 60 Hz pacing
            sleep = cst.DT - (time.perf_counter() - tick)
            if sleep > 0:
                time.sleep(sleep)
            t += 1
    except KeyboardInterrupt:
        pass
    finally:
        client.stop()
        if out_f:
            out_f.close()
        if viewer is not None:
            viewer.close()
        if rec:
            np.stack(rec).tofile(args.record)
        summ = hist.summary()
        if metrics is not None:
            metrics.write(kind="final", frames=t, **summ)
            metrics.close()
        if summ.get("count"):
            print(f"frames={t} p50={summ['p50_ms']:.2f}ms "
                  f"p99={summ['p99_ms']:.2f}ms")


if __name__ == "__main__":
    main()
