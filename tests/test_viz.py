"""Plot tools smoke tests (write PNGs from synthesized data)."""

import os

import numpy as np

from tip_tpu.data_gen import amass_syn
from tip_tpu.viz import plots

import test_data_pipeline as TDP


def test_plots_from_synthesized_motion(tmp_path):
    motion = TDP.make_synthetic_motion(T=200)
    out = amass_syn.synthesize(motion, height=1.7,
                               rng=np.random.default_rng(0))

    p1 = tmp_path / "sbp.png"
    plots.plot_sbp_labels(out["constrs"], str(p1))
    assert os.path.getsize(p1) > 1000

    fk = amass_syn.fk_motion(*TDP.smpl.resample_motion(motion)[:2], 1.7)
    pq_lankle = np.asarray(fk["pq_sbp"])[:, 0]
    p2 = tmp_path / "drift.png"
    drift = plots.plot_sbp_residue_drift(pq_lankle, out["constrs"][:, :4],
                                         str(p2))
    assert os.path.getsize(p2) > 1000
    # residue drift during genuine contacts stays small
    assert np.abs(drift).max() < 0.5

    p3 = tmp_path / "overlay.png"
    plots.plot_imu_overlay(out["imu"], out["imu"] * 0.98, str(p3))
    assert os.path.getsize(p3) > 1000


def test_skeleton_render_frames_and_gif(tmp_path):
    """The matplotlib 3D renderer: frames are real RGB images that track the
    pose, GIF/PNG writers produce non-trivial files, SBP markers and terrain
    overlays draw without error."""
    import jax.numpy as jnp

    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import terrain as terrain_lib
    from tip_tpu.viz import skeleton_render as SR

    import test_runner as TR

    skel = kin.amass_skeleton()
    T = 13
    qdq = np.tile(TR.make_s_init(), (T, 1))
    qdq[:, 0] = np.linspace(0.0, 1.0, T)          # walk +x

    # bones: one per joint, all indices within the link table
    bones = SR.bone_segments(skel)
    assert len(bones) == skel.n_joints
    assert bones.min() >= 0 and bones.max() <= skel.n_joints

    f0 = SR.render_frame(skel, qdq[0])
    fN = SR.render_frame(skel, qdq[-1], gt_qdq=qdq[0])
    assert f0.dtype == np.uint8 and f0.ndim == 3 and f0.shape[2] == 3
    assert f0.shape == fN.shape
    assert (f0 != fN).any()                        # the pose moved
    assert f0.std() > 1.0                          # not a blank canvas

    # SBP marker + terrain overlay paths
    tcfg = terrain_lib.TerrainConfig(map_bound=3.0)
    ts = terrain_lib.terrain_init(tcfg)
    ts, _ = terrain_lib.update_height_map(
        ts, tcfg, jnp.asarray([0.5, 0.0, 0.2], jnp.float32),
        jnp.asarray(True))
    locs = np.full((5, 3), 100.0)
    locs[0] = [0.5, 0.0, 0.2]                      # one active SBP
    fT = SR.render_frame(skel, qdq[0], sbp_locs=locs,
                         terrain_state=ts, terrain_cfg=tcfg)
    assert (fT != f0).any()                        # overlays drew something

    gif = tmp_path / "walk.gif"
    n = SR.render_motion(skel, qdq, str(gif), gt_qdq=qdq, stride=4)
    assert n == 4 and os.path.getsize(gif) > 5000

    pngs = tmp_path / "f_%02d.png"
    n = SR.render_motion(skel, qdq[:5], str(pngs), stride=4)
    assert n == 2 and os.path.getsize(tmp_path / "f_01.png") > 1000


def test_render_cli_dump_and_motion_pkl(tmp_path):
    """CLI smoke: renders from an eval raw-trajectory dump and from a
    dataset pickle."""
    import pickle

    from tip_tpu.cli import render as cli_render

    import test_runner as TR

    T = 9
    qdq = np.tile(TR.make_s_init(), (T, 1))
    qdq[:, 1] = np.linspace(0.0, 0.5, T)

    dump = tmp_path / "trajs.pkl"
    with open(dump, "wb") as fh:
        pickle.dump({"gt_list": [qdq], "ours_list": [qdq + 0.01],
                     "files": ["m0"]}, fh)
    out1 = tmp_path / "dump.gif"
    cli_render.main(["--dump", str(dump), "--out", str(out1), "--stride", "4"])
    assert os.path.getsize(out1) > 5000

    mp = tmp_path / "motion.pkl"
    with open(mp, "wb") as fh:
        pickle.dump({"nimble_qdq": qdq}, fh)
    out2 = tmp_path / "gt.gif"
    cli_render.main(["--motion_pkl", str(mp), "--out", str(out2),
                     "--stride", "4", "--max_frames", "5"])
    assert os.path.getsize(out2) > 3000
