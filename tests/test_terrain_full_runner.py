"""Terrain clustering vs numpy oracle + full-runner behavior tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import full_runner as FR
from tip_tpu.runtime import runner as R
from tip_tpu.runtime import terrain as terrain_lib

import test_runner as TR

RNG = np.random.default_rng(11)


class NumpyTerrain:
    """Transcription of the reference terrain update
    (real_time_runner.py:113-262) with boundary-clamped patches, matching the
    documented divergences of tip_tpu.runtime.terrain."""

    def __init__(self, cfg: terrain_lib.TerrainConfig):
        self.cfg = cfg
        G = cfg.grid_num
        self.region_map = np.zeros((G, G), int)
        self.conf = np.full((G, G), -100.0)
        self.heights = [0.0]
        self.weights = [10.0]
        d = cfg.diffuse_region
        x = np.arange(-d, d)
        xx, yy = np.meshgrid(x, x)
        self.diffuse = -np.sqrt(xx ** 2 + yy ** 2)

    def update(self, c_loc, do_update):
        cfg = self.cfg
        G, d = cfg.grid_num, cfg.diffuse_region
        if not do_update:
            return 0.0
        h = c_loc[2]
        ci = round(c_loc[0] / cfg.grid_size) + G // 2
        cj = round(c_loc[1] / cfg.grid_size) + G // 2
        i0 = np.clip(ci - d, 0, G - 2 * d)
        j0 = np.clip(cj - d, 0, G - 2 * d)
        region_old = self.region_map[i0:i0 + 2 * d, j0:j0 + 2 * d].copy()
        conf_old = self.conf[i0:i0 + 2 * d, j0:j0 + 2 * d].copy()

        if h < self.heights[0] + cfg.update_epsilon:
            idx = 0
        else:
            hs = np.array(self.heights)[region_old.reshape(-1)]
            diffs = np.abs(hs - h)
            if diffs.min() < cfg.update_epsilon:
                idx = int(region_old.reshape(-1)[np.argmin(diffs)])
            else:
                idx = -1
        if idx < 0:
            idx = len(self.heights)
            self.heights.append(h)
            self.weights.append(10.0)
        else:
            w = self.weights[idx]
            self.heights[idx] = (self.heights[idx] * w * cfg.temporal_inertia
                                 + h) / (w * cfg.temporal_inertia + 1.0)
            self.weights[idx] += 1.0

        region_new = np.full_like(region_old, idx)
        conf_new = self.diffuse.copy()
        merge_r = np.where(conf_old > conf_new, region_old, region_new)
        merge_c = np.maximum(conf_old, conf_new)
        self.region_map[i0:i0 + 2 * d, j0:j0 + 2 * d] = merge_r
        self.conf[i0:i0 + 2 * d, j0:j0 + 2 * d] = merge_c
        return self.heights[self.region_map[ci, cj]] - h


@pytest.fixture(scope="module")
def tcfg():
    return terrain_lib.TerrainConfig(map_bound=3.0)


def test_terrain_matches_numpy_oracle(tcfg):
    oracle = NumpyTerrain(tcfg)
    state = terrain_lib.terrain_init(tcfg, dtype=jnp.float64)

    # contacts on two plateaus + ground
    contacts = []
    for _ in range(40):
        which = RNG.integers(0, 3)
        xy = RNG.uniform(-1.5, 1.5, 2) * 0.3 + [(0.0, 0.0), (1.2, 0.0),
                                                (0.0, 1.2)][which][0:2]
        z = [0.0, 0.5, 1.0][which] + RNG.normal() * 0.02
        contacts.append(np.array([xy[0], xy[1], z]))

    for c in contacts:
        ref_corr = oracle.update(c, True)
        state, corr = terrain_lib.update_height_map(
            state, tcfg, jnp.asarray(c), jnp.asarray(True))
        np.testing.assert_allclose(float(corr), ref_corr, atol=1e-9)

    assert int(state.n_regions) == len(oracle.heights)
    np.testing.assert_allclose(
        np.asarray(state.region_height[:int(state.n_regions)]),
        np.array(oracle.heights), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(state.region_map),
                                  oracle.region_map)
    # height_field renders heights through the region map
    hf = np.asarray(terrain_lib.height_field(state))
    np.testing.assert_allclose(
        hf, np.array(oracle.heights + [0.0] * 100)[
            np.minimum(oracle.region_map, len(oracle.heights) - 1)], atol=1e-9)


def test_terrain_no_update_is_noop(tcfg):
    state = terrain_lib.terrain_init(tcfg)
    state2, corr = terrain_lib.update_height_map(
        state, tcfg, jnp.asarray([0.5, 0.5, 0.7]), jnp.asarray(False))
    assert float(corr) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


FCFG = FR.FullRunnerConfig(
    base=TR.CFG, terrain=terrain_lib.TerrainConfig(map_bound=3.0))


@pytest.fixture(scope="module")
def setup():
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    return params, skel


def test_full_runner_runs_and_is_finite(setup):
    params, skel = setup
    T = 30
    imu = TR.make_stream(T)
    s_init = TR.make_s_init()
    s_traj, c_traj, viz, final = FR.run_offline_full(
        params, FCFG, skel, jnp.asarray(s_init), jnp.asarray(imu))
    s_traj = np.asarray(s_traj)
    assert s_traj.shape == (T, 114)
    assert np.isfinite(s_traj).all()
    assert np.isfinite(np.asarray(final.terrain.region_height)).all()
    # warmup frames return s_init
    np.testing.assert_allclose(s_traj[:6], np.tile(s_init, (6, 1)), atol=1e-9)


def test_full_runner_multi_sbp_ik_feedback(setup):
    params, skel = setup
    cfg = FR.FullRunnerConfig(base=TR.CFG,
                              terrain=terrain_lib.TerrainConfig(map_bound=3.0),
                              multi_sbp=True)
    T = 25
    imu = TR.make_stream(T)
    s_init = TR.make_s_init()
    s_traj, _, _, final = FR.run_offline_full(
        params, cfg, skel, jnp.asarray(s_init), jnp.asarray(imu))
    assert np.isfinite(np.asarray(s_traj)).all()
    assert np.isfinite(np.asarray(final.ik_deltas)).all()


def test_full_runner_gt_playback(setup):
    """Playback mode must echo the ground-truth states untouched."""
    params, skel = setup
    cfg = FR.FullRunnerConfig(base=TR.CFG,
                              terrain=terrain_lib.TerrainConfig(map_bound=3.0),
                              playback_gt=True)
    T = 20
    imu = TR.make_stream(T)
    s_gt = np.tile(TR.make_s_init(), (T, 1))
    s_gt[:, 0] = np.linspace(0, 1, T)          # walk forward
    c_gt = np.zeros((T, 20))
    s_traj, c_traj, _, _ = FR.run_offline_full(
        params, cfg, skel, jnp.asarray(s_gt[0]), jnp.asarray(imu),
        s_gt=jnp.asarray(s_gt), c_gt=jnp.asarray(c_gt))
    np.testing.assert_allclose(np.asarray(s_traj)[1:], s_gt[:-1], atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_traj)[1:], c_gt[:-1], atol=1e-9)


def test_full_runner_long_stream_soak(setup):
    """Scaled-down soak (scripts/soak.py runs the 36k-frame version on TPU):
    a long stream through the full runner with multi_sbp on keeps outputs
    finite, the carry shapes fixed, and the terrain region table below
    capacity (no overflow of the fixed-capacity divergence)."""
    params, skel = setup
    cfg = FR.FullRunnerConfig(
        base=TR.CFG,
        terrain=terrain_lib.TerrainConfig(map_bound=3.0, max_regions=16),
        multi_sbp=True)
    s_init = TR.make_s_init()
    carry = FR.full_runner_init(cfg, skel, jnp.asarray(s_init),
                                dtype=jnp.float64)

    @jax.jit
    def run_chunk(carry, chunk):
        def sstep(c, x):
            c, out = FR.full_runner_step(params, c, x, cfg, skel)
            return c, out["qdq"][:3]
        return jax.lax.scan(sstep, carry, chunk)

    shapes0 = jax.tree_util.tree_map(lambda x: x.shape, carry)
    roots = []
    for i in range(4):
        chunk = jnp.asarray(TR.make_stream(500))   # module RNG: fresh chunk
        carry, r = run_chunk(carry, chunk)
        roots.append(np.asarray(r))
    roots = np.concatenate(roots)

    assert int(carry.base.t) == 2000
    assert np.isfinite(roots).all()
    assert np.isfinite(np.asarray(carry.base.last_s)).all()
    # random-weight + random-IMU input is adversarial for the clusterer: it
    # saturates the fixed-capacity region table, which must degrade
    # gracefully (cursor clamps, last slot reused, everything stays finite)
    # rather than overflow
    assert int(carry.terrain.n_regions) <= cfg.terrain.max_regions
    assert np.isfinite(np.asarray(carry.terrain.region_height)).all()
    # carry is a fixed pytree: no buffer grew
    shapes1 = jax.tree_util.tree_map(lambda x: x.shape, carry)
    assert shapes0 == shapes1


def test_batched_ik_feedback_matches_sequential_transcription():
    """The vmapped both-legs IK feedback equals the straightforward one-side-
    at-a-time transcription of the reference
    (correct_joint_q_for_history_feedback, real_time_runner.py:334-382)."""
    from tip_tpu.chars.amass import IK_CHAIN_BULLET, IK_CHAIN_NIMBLE
    from tip_tpu.ops import ik as ik_ops
    from tip_tpu.ops import rotations as rot

    def one_side(s_hist, pq_jf, raw_residues, ik_deltas, side, dt):
        link_name = "lankle" if side == 0 else "rankle"
        i_p, i_a, i_b, i_c = IK_CHAIN_BULLET[link_name]
        j_a, j_b, j_c = IK_CHAIN_NIMBLE[link_name]
        root_res = raw_residues[4]
        sbp_res = raw_residues[side]
        both = (~jnp.any(jnp.isnan(sbp_res))) & (~jnp.any(jnp.isnan(root_res)))
        delta = ik_deltas[side] + jnp.where(
            both,
            (jnp.nan_to_num(sbp_res) - jnp.nan_to_num(root_res)) * dt, 0.0)
        corr = -delta
        n = jnp.linalg.norm(corr)
        overflow = n > 0.5
        apply_ik = both & (~overflow) & (n > 0.05)
        a_q, b_q, c_q = ik_ops.leg_two_joint_ik_keep_foot(
            pq_jf[i_p + 1], pq_jf[i_a + 1], pq_jf[i_b + 1], pq_jf[i_c + 1],
            corr)
        a_aa, b_aa, c_aa = (rot.q_to_aa(q) for q in (a_q, b_q, c_q))

        def put(s, j, aa):
            sl = s[3 + j * 3: 6 + j * 3]
            return s.at[3 + j * 3: 6 + j * 3].set(
                jnp.where(apply_ik, aa, sl))

        s_hist = put(put(put(s_hist, j_a, a_aa), j_b, b_aa), j_c, c_aa)
        new_delta = jnp.where(both & ~overflow, delta, 0.0)
        return s_hist, ik_deltas.at[side].set(new_delta)

    rng = np.random.default_rng(3)
    for trial in range(40):
        s = jnp.asarray(rng.normal(size=114))
        pq = rng.normal(size=(20, 7))
        pq[:, 3:] /= np.linalg.norm(pq[:, 3:], axis=1, keepdims=True)
        pq = jnp.asarray(pq)
        rr = rng.normal(size=(5, 3)) * 0.1
        if trial % 3 == 0:
            rr[0] = np.nan                     # inactive left SBP
        if trial % 5 == 0:
            rr[4] = np.nan                     # inactive root SBP
        rr = jnp.asarray(rr)
        dl = jnp.asarray(rng.normal(size=(2, 3))
                         * (3.0 if trial % 7 == 0 else 0.1))  # overflow path
        sa, da = one_side(s, pq, rr, dl, 0, 1 / 60)
        sa, da = one_side(sa, pq, rr, da, 1, 1 / 60)
        sb, db, _ = FR._ik_history_feedback(None, s, pq, rr, dl, 1 / 60)
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-12)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-12)
