"""Terrain-reconstruction quality metrics + SBP flag metrics.

Covers eval_terrain.py (VERDICT r3: measure the paper's title capability
directly) and the eval-harness extras: the update-flag track recorded by the
full runner must reconstruct the final established-cell mask exactly, the
metric must score a faithfully-built map as near-perfect, and the
precision/recall summaries must match hand counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu import eval_harness as H
from tip_tpu import eval_terrain as ET
from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import sbp as sbp_ops
from tip_tpu.runtime import full_runner as FR
from tip_tpu.runtime import terrain as terrain_lib

import test_runner as TR


@pytest.fixture(scope="module")
def setup():
    # f32 throughout: the harness streams f32 states, so f64 params would
    # mix dtypes inside the jitted runner (scatter dtype-promotion warnings)
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float32)
    skel = kin.amass_skeleton(dtype=jnp.float32)
    return params, skel


def test_update_flags_reconstruct_established_mask(setup):
    """established_mask_from_updates(viz, upd) == (confidence > -99) of the
    runner's final terrain state — the recorded flag track carries exactly
    the information the map establishment consumed."""
    params, skel = setup
    tcfg = terrain_lib.TerrainConfig(map_bound=3.0)
    cfg = FR.FullRunnerConfig(base=TR.CFG, terrain=tcfg, playback_gt=True)
    T = 160
    imu = TR.make_stream(T)
    s_gt = np.tile(TR.make_s_init(), (T, 1))
    s_gt[:, 0] = np.linspace(0.0, 1.5, T)          # walk forward
    c_gt = np.zeros((T, 20))
    c_gt[:, 0] = 1.0                               # lankle contact throughout
    c_gt[: T // 2, 4] = 1.0                        # rankle contact, then off
    _, _, viz, upd, final = FR.run_offline_full(
        params, cfg, skel, jnp.asarray(s_gt[0]), jnp.asarray(imu),
        s_gt=jnp.asarray(s_gt), c_gt=jnp.asarray(c_gt),
        collect_updates=True)
    upd = np.asarray(upd)
    assert upd.any(), "playback stream produced no terrain updates"
    mask = ET.established_mask_from_updates(np.asarray(viz), upd, tcfg)
    ref = np.asarray(final.terrain.confidence) > -99.0
    np.testing.assert_array_equal(mask, ref)


def _straight_walk_gt(skel, T, profile):
    """GT trajectory walking +x with lankle contacts following a height
    profile. Returns (gt_qdq, gt_c, contact points (T, 3))."""
    s0 = TR.make_s_init()
    gt = np.tile(s0, (T, 1))
    gt[:, 0] = np.linspace(0.0, 4.0, T)
    feet = np.asarray(ET._fk_feet(kin.amass_skeleton(),
                                  jnp.asarray(gt, jnp.float32)))
    c = np.zeros((T, 20))
    c[:, 0] = 1.0
    pts = feet[:, 0].copy()
    pts[:, 2] = profile(pts[:, 0])
    c[:, 3] = pts[:, 2] - feet[:, 0, 2]            # z offset -> desired height
    return gt, c, pts


def test_motion_terrain_metrics_on_faithful_map(setup):
    """A terrain state built by feeding the TRUE contact points through
    update_height_map scores ~perfect: full path coverage, MAE below the
    region-merge epsilon, finite latency."""
    _, skel = setup
    tcfg = terrain_lib.TerrainConfig(map_bound=6.0)
    T = 240
    gt, c, pts = _straight_walk_gt(skel, T, lambda x: 0.15 * np.floor(x))

    state = terrain_lib.terrain_init(tcfg)
    upd = np.zeros((T, 3), bool)
    viz = np.full((T, 5, 3), 100.0)
    for t in range(4, T, 8):                       # updates every 8 frames
        state, _ = terrain_lib.update_height_map(
            state, tcfg, jnp.asarray(pts[t - 1], jnp.float32),
            jnp.asarray(True))
        upd[t, 0] = True
        viz[t - 1, 0] = pts[t - 1]

    m = ET.motion_terrain_metrics(skel, gt, c, state, tcfg, viz=viz, upd=upd)
    assert m["pct_path_established"] > 0.95
    assert m["height_mae_m"] < 0.06
    assert abs(m["height_bias_m"]) < 0.06
    assert 0.0 <= m["latency_s"] < 1.0
    assert m["n_path_cells"] > 10

    s = ET.summarize([m, None, m])
    assert s["n_motions_with_contacts"] == 2
    assert s["height_mae_m"] == pytest.approx(m["height_mae_m"], abs=1e-4)
    assert s["height_mae_m_max"] >= s["height_mae_m"]


def test_drift_corrected_metrics_isolate_estimator_error(setup):
    """A runner whose root drifts writes the map at drifted contact
    positions: the plain MAE charges that localization error to the map,
    the drift-corrected MAE (gt samples shifted into the runner's frame by
    the per-frame root drift) does not — it scores the estimator itself."""
    _, skel = setup
    tcfg = terrain_lib.TerrainConfig(map_bound=6.0)
    T = 240
    gt, c, pts = _straight_walk_gt(skel, T, lambda x: 0.15 * np.floor(x))
    # linearly growing root drift, up to 0.8 m in x and 0.2 m in z
    drift = np.linspace(0.0, 1.0, T)[:, None] * np.array([0.8, 0.0, 0.2])
    pred = gt.copy()
    pred[:, 0:3] += drift

    # build the map the way the drifting runner would: contacts at the
    # estimated (shifted) positions
    state = terrain_lib.terrain_init(tcfg)
    upd = np.zeros((T, 3), bool)
    viz = np.full((T, 5, 3), 100.0)
    for t in range(4, T, 8):
        p = pts[t - 1] + drift[t - 1]
        state, _ = terrain_lib.update_height_map(
            state, tcfg, jnp.asarray(p, jnp.float32), jnp.asarray(True))
        upd[t, 0] = True
        viz[t - 1, 0] = p

    m = ET.motion_terrain_metrics(skel, gt, c, state, tcfg, viz=viz, upd=upd,
                                  pred_qdq=pred)
    assert m["pct_path_established_dc"] > 0.9
    assert m["height_mae_dc_m"] < 0.06          # estimator is near-perfect
    assert m["height_mae_m"] > 0.05             # plain MAE eats the drift
    assert m["height_mae_dc_m"] < 0.5 * m["height_mae_m"]

    s = ET.summarize([m, None])
    assert s["n_motions_with_contacts"] == 1
    assert s["height_mae_dc_m"] == pytest.approx(m["height_mae_dc_m"],
                                                 abs=1e-4)

    # without pred_qdq the dc keys are absent and summarize omits them
    m2 = ET.motion_terrain_metrics(skel, gt, c, state, tcfg,
                                   viz=viz, upd=upd)
    assert "height_mae_dc_m" not in m2
    assert "height_mae_dc_m" not in ET.summarize([m2])


def test_gt_contact_samples_positions():
    """Contact points are the FK'd foot links plus the label offsets."""
    skel = kin.amass_skeleton()
    T = 12
    gt = np.tile(TR.make_s_init(), (T, 1))
    gt[:, 1] = np.linspace(0, 1, T)
    c = np.zeros((T, 20))
    c[3:7, 0] = 1.0
    c[3:7, 1:4] = [0.01, -0.02, 0.03]
    frames, pts = ET.gt_contact_samples(skel, gt, c)
    assert list(frames) == [3, 4, 5, 6]
    feet = np.asarray(ET._fk_feet(skel, jnp.asarray(gt, jnp.float32)))
    np.testing.assert_allclose(pts, feet[3:7, 0] + [0.01, -0.02, 0.03],
                               atol=1e-6)


def test_sbp_flag_metrics_hand_counts():
    gt = np.zeros((10, 20))
    pr = np.zeros((10, 20))
    gt[:6, 0] = 1.0          # lankle: 6 positive frames
    pr[2:8, 0] = 1.0         # pred: hits 4 of them + 2 false alarms
    gt[:, 16] = 1.0          # root: all positive, never predicted
    counts = H.sbp_flag_counts(gt, pr)
    np.testing.assert_array_equal(counts[0], [4, 2, 2, 2])
    np.testing.assert_array_equal(counts[4], [0, 0, 10, 0])
    s = H.summarize_sbp_counts(counts)
    assert s["lankle"]["precision"] == pytest.approx(4 / 6, abs=1e-4)
    assert s["lankle"]["recall"] == pytest.approx(4 / 6, abs=1e-4)
    assert s["lankle"]["gt_pos_rate"] == pytest.approx(0.6)
    assert s["root"]["recall"] == 0.0
    assert np.isnan(s["root"]["precision"])
    assert s["rwrist"]["gt_pos_rate"] == 0.0


def test_evaluate_extras_end_to_end(setup, tmp_path):
    """The harness fills extras_out with sbp + terrain aggregates from a real
    synthesized pickle through the full runner (small model, random params —
    numbers are meaningless, plumbing must be finite and complete)."""
    import pickle

    from tip_tpu.data_gen import amass_syn, corpus
    from tip_tpu.runtime import runner as runner_lib

    params, _ = setup
    rng = np.random.default_rng(7)
    motion = corpus.make_walk(rng, duration_s=5.0, terrain="stairs")
    payload = amass_syn.synthesize(motion, height=1.6, rng=rng)
    f = str(tmp_path / "walk_stairs_0000.pkl")
    with open(f, "wb") as fh:
        pickle.dump(payload, fh)

    ecfg = H.EvalConfig(
        runner=runner_lib.RunnerConfig(model=TR.SMALL_MODEL, n_sbps=5,
                                       with_acc_sum=TR.SMALL_MODEL.with_acc_sum),
        use_full_runner=True, multi_sbp=True,
        test_len=10000, max_motions_per_cat=5, terrain_map_bound=6.0)
    extras = {}
    per_motion, means, maxima = H.evaluate(
        params, ecfg, [f], log=lambda *a: None, extras_out=extras)
    assert len(per_motion) == 1
    assert "sbp" in extras
    assert set(extras["sbp"]) == set(H.SBP_CHANNEL_NAMES)
    assert extras["sbp"]["lankle"]["gt_pos_rate"] > 0.2
    assert "terrain" in extras
    assert extras["terrain"]["n_motions_with_contacts"] == 1
    assert np.isfinite(extras["terrain"]["pct_path_established"])
    # the drift-corrected variant rides along (pred is always available in
    # the harness). With this test's random params the drift can shift the
    # gt path entirely off the established cells, so only the coverage key
    # is guaranteed (mae_dc is NaN -> omitted when nothing is established).
    assert np.isfinite(extras["terrain"]["pct_path_established_dc"])
    # per-family breakdown (corpus filename convention)
    assert set(extras["terrain_by_family"]) == {"walk_stairs"}
    assert (extras["terrain_by_family"]["walk_stairs"]
            ["n_motions_with_contacts"] == 1)
