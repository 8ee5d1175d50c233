"""CLI: offline evaluation (reference offline_testing_simple.py + README step 5).

  python -m tip_tpu.cli.evaluate --ckpt output/model-v1 \
      --name_contains "dipimu_s_09 dipimu_s_10" --test_len 30000 \
      --with_acc_sum --five_sbp [--full_runner] [--data_root data]
"""

import argparse
import json


# reference test-data directory list (offline_testing_simple.py:307-314)
TEST_DIRS_V0 = [
    "syn_AMASS_CMU_v0", "syn_Eyes_Japan_Dataset_v0", "syn_KIT_v0",
    "syn_HUMAN4D_v0", "syn_ACCAD_v0", "syn_DFaust_67_v0", "syn_HumanEva_v0",
    "syn_MPI_Limits_v0", "syn_MPI_mosh_v0", "syn_SFU_v0",
    "syn_Transitions_mocap_v0", "preprocessed_DIP_IMU_v0",
    "preprocessed_TotalCapture_v0", "syn_TotalCapture_v0", "syn_DanceDB_v0",
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (or .pt torch state_dict)")
    ap.add_argument("--name_contains", default="")
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--tag", default="v0")
    ap.add_argument("--test_len", type=int, default=600)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--five_sbp", action="store_true")
    ap.add_argument("--with_acc_sum", action="store_true")
    ap.add_argument("--full_runner", action="store_true")
    ap.add_argument("--multi_sbp", action="store_true",
                    help="SBP-conditioned IK history feedback + pelvis "
                         "terrain updates (needs --full_runner; reference "
                         "MULTI_SBP_CORRECTION)")
    ap.add_argument("--map_bound", type=float, default=None,
                    help="terrain grid half-extent in metres for "
                         "--full_runner (default: the reference's +-5 m, "
                         "constants.MAP_BOUND; raise for corpora that "
                         "wander beyond it)")
    ap.add_argument("--save_trajs", default=None,
                    help="dump raw gt/pred trajectories to this pkl "
                         "(reference test-output-tmp.pkl)")
    ap.add_argument("--metrics", default=None,
                    help="structured jsonl results (per-motion + summary)")
    ap.add_argument("--viz_compare", action="store_true",
                    help="replay each motion in the PyBullet viewer: ours vs "
                         "GT + SBP markers + terrain (needs the pybullet "
                         "wheel; reference --compare_gt viz)")
    ap.add_argument("--render_gifs", default=None, metavar="DIR",
                    help="write one ours-vs-GT stick-figure GIF per motion "
                         "into DIR (matplotlib renderer, no pybullet; "
                         "includes SBP markers and, with --full_runner, the "
                         "final terrain map)")
    ap.add_argument("--render_stride", type=int, default=4)
    ap.add_argument("--extras", action="store_true",
                    help="also report capability metrics beyond the "
                         "reference's 8: per-channel SBP contact-flag "
                         "precision/recall vs the pickles' labels and (with "
                         "--full_runner) terrain-reconstruction quality "
                         "(eval_terrain.py)")
    ap.add_argument("--serving_mode", default="recompute",
                    choices=["recompute", "kv_cache", "kv_cache_rnn_carry"],
                    help="run the metric protocol under a KV-cached serving "
                         "mode (semantics/divergence study in PERF.md); "
                         "default is the reference-parity recompute path")
    ap.add_argument("--forward_impl", default="xla",
                    choices=["xla", "fused"],
                    help="fused = whole-model / whole-cached-step Pallas "
                         "kernel (bf16 weights; see PERF.md)")
    args = ap.parse_args()

    from tip_tpu import constants as cst
    from tip_tpu import eval_harness as H
    from tip_tpu.models import tip_model as M
    from tip_tpu.runtime import runner as runner_lib
    from tip_tpu.train import train as train_lib

    n_sbps = 5 if args.five_sbp else 2
    model_cfg = M.ModelConfig(size_s=cst.state_dim(n_sbps),
                              with_acc_sum=args.with_acc_sum,
                              forward_impl=args.forward_impl)

    if args.ckpt.endswith(".pt"):
        import torch
        sd = torch.load(args.ckpt, map_location="cpu")
        params = M.params_from_torch_state_dict(sd, model_cfg)
    else:
        cfg_t = train_lib.TrainConfig(model=model_cfg, n_sbps=n_sbps)
        params = train_lib.restore_checkpoint(args.ckpt, cfg_t,
                                              params_only=True).params

    cfg = H.EvalConfig(
        runner=runner_lib.RunnerConfig(model=model_cfg, n_sbps=n_sbps,
                                       with_acc_sum=args.with_acc_sum,
                                       serving_mode=args.serving_mode),
        use_full_runner=args.full_runner, multi_sbp=args.multi_sbp,
        test_len=args.test_len, seed=args.seed,
        **({"terrain_map_bound": args.map_bound}
           if args.map_bound is not None else {}))

    dirs = [d.replace("v0", args.tag) for d in TEST_DIRS_V0]
    files = H.collect_test_files(args.data_root, dirs,
                                 args.name_contains.split())
    print(f"{len(files)} candidate motions")

    viz_hook = None
    if args.viz_compare:
        import jax
        import numpy as np
        from tip_tpu.ops import kinematics as kin
        from tip_tpu.runtime import terrain as terrain_lib
        from tip_tpu.viz import pybullet_viz, urdf_export
        viewer = pybullet_viz.Viewer(urdf_export.default_urdf_path(),
                                     n_markers=2 * n_sbps, compare_gt=True)
        to_bullet = jax.jit(jax.vmap(kin.our_pose_to_bullet))

        def viz_hook(f, gt, pred, info):
            import jax.numpy as jnp
            heights = (np.asarray(terrain_lib.height_field(info["terrain"]))
                       if "terrain" in info else None)
            gsz = (info["terrain_cfg"].grid_size if "terrain_cfg" in info
                   else 0.1)
            pybullet_viz.replay_compare(
                viewer,
                np.asarray(to_bullet(jnp.asarray(pred, jnp.float32))),
                np.asarray(to_bullet(jnp.asarray(gt, jnp.float32))),
                viz_locs=info.get("viz_locs"), heights=heights,
                grid_size=gsz)

    if args.render_gifs:
        import os

        import numpy as np
        from tip_tpu.ops import kinematics as kin
        from tip_tpu.viz import skeleton_render as SR
        os.makedirs(args.render_gifs, exist_ok=True)
        rskel = kin.amass_skeleton()
        prev_hook = viz_hook

        def viz_hook(f, gt, pred, info, _prev=prev_hook):
            if _prev is not None:
                _prev(f, gt, pred, info)
            name = os.path.splitext(os.path.basename(f))[0] + ".gif"
            SR.render_motion(
                rskel, np.asarray(pred), os.path.join(args.render_gifs, name),
                gt_qdq=np.asarray(gt), viz_locs=info.get("viz_locs"),
                terrain_state=info.get("terrain"),
                terrain_cfg=info.get("terrain_cfg"),
                stride=args.render_stride)

    mw = None
    if args.metrics:
        from tip_tpu.utils.observability import MetricsWriter
        mw = MetricsWriter(args.metrics)

    extras = {} if args.extras else None
    per_motion, means, maxima = H.evaluate(params, cfg, files,
                                           save_trajs_path=args.save_trajs,
                                           viz_hook=viz_hook,
                                           metrics_writer=mw,
                                           extras_out=extras)
    if mw is not None:
        if extras:
            mw.write(kind="extras", **extras)
        mw.close()

    print(json.dumps({"means": means}, indent=2))
    if extras:
        print(json.dumps({"extras": extras}, indent=2))
    for k, (v, f) in maxima.items():
        print(f"max {k}: {v:.4f}  ({f})")


if __name__ == "__main__":
    main()
