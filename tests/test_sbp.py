"""SBP ops vs numpy transcriptions of the reference formulas."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from tip_tpu.ops import sbp as sbp_ops

RNG = np.random.default_rng(9)


def np_ang_vel(q1, q2, dt):
    sub = q2 - q1 if np.linalg.norm(q2 - q1) < np.linalg.norm(q2 + q1) else q2 + q1
    conj = q2 * np.array([-1.0, -1, -1, 1])
    v1, w1 = sub[:3], sub[3]
    v2, w2 = conj[:3], conj[3]
    prod3 = w1 * v2 + w2 * v1 + np.cross(v1, v2)
    return 2.0 * prod3 / dt


def np_rot_center(x1, q1, x2, q2, dt, sol_prev, grid, v_thres=0.15):
    """Direct transcription of reference data_utils.py:27-100."""
    v = (x2 - x1) / dt
    w = np_ang_vel(q1, q2, dt)
    r2 = Rotation.from_quat(q2).as_matrix()
    lps_r = grid @ r2.T
    wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    lps_v = lps_r @ wx.T + v
    if sol_prev is None:
        dist = np.zeros(len(grid))
    else:
        dist = np.linalg.norm(lps_r - (sol_prev - v * dt), axis=1)
    residues = (np.linalg.norm(lps_v, axis=1) + 0.2 * dist
                + 0.02 * np.linalg.norm(lps_r, axis=1))
    i = np.argmin(residues)
    if residues[i] < v_thres:
        return lps_r[i], True
    return None, False


def make_link_traj(T=40, stationary=True):
    """A link rotating about a fixed world point (true rot center)."""
    pivot = np.array([0.3, 0.1, 0.0])
    offset = np.array([0.0, 0.0, 0.10])      # within the foot grid z range
    pq = np.zeros((T, 7))
    for t in range(T):
        ang = 0.4 * np.sin(t * 0.15)
        r = Rotation.from_rotvec([ang, 0.2 * ang, 0])
        drift = np.zeros(3) if stationary else np.array([0.02 * t, 0, 0])
        pq[t, :3] = pivot - r.apply(offset) + drift
        pq[t, 3:] = r.as_quat()
    return pq


def test_rot_center_matches_reference_transcription():
    grid = sbp_ops.GRID_FOOT
    pq = make_link_traj()
    dt = 2.0 / 60.0
    sol_prev, prev_active = None, False
    sol_prev_j = jnp.zeros(3)
    for t in range(2, 20):
        x1, q1 = pq[t - 1, :3], pq[t - 1, 3:]
        x2, q2 = pq[t + 1, :3], pq[t + 1, 3:]
        ref_sol, ref_active = np_rot_center(x1, q1, x2, q2, dt, sol_prev, grid)
        rc = sbp_ops.rot_center_sample(
            jnp.asarray(x1), jnp.asarray(q1), jnp.asarray(x2), jnp.asarray(q2),
            dt, sol_prev_j, jnp.asarray(prev_active), jnp.asarray(grid))
        assert bool(rc.active) == ref_active, t
        if ref_active:
            np.testing.assert_allclose(np.asarray(rc.sol), ref_sol, atol=1e-7)
        sol_prev = ref_sol
        prev_active = ref_active
        sol_prev_j = jnp.where(rc.active, rc.sol, 0.0)


def test_link_contact_sequence_scan():
    pq = make_link_traj(T=30)
    seq = np.asarray(sbp_ops.link_contact_sequence(
        jnp.asarray(pq), 1.0 / 60.0, jnp.asarray(sbp_ops.GRID_FOOT)))
    assert seq.shape == (30, 4)
    # boundary frames stay zero
    assert (seq[:2] == 0).all() and (seq[-2:] == 0).all()
    # a stationary pivot should be detected through most of the motion
    assert seq[2:-2, 0].mean() > 0.8
    # detected world offsets point from link to the (fixed) pivot
    act = seq[:, 0] == 1.0
    pts = pq[act, :3] + seq[act, 1:]
    assert np.abs(pts - pts.mean(0)).max() < 0.06


def test_moving_link_rejected():
    pq = make_link_traj(T=30, stationary=False)
    # fast drift: no candidate point should fall below the velocity threshold
    pq[:, 0] += np.arange(30) * 0.03
    seq = np.asarray(sbp_ops.link_contact_sequence(
        jnp.asarray(pq), 1.0 / 60.0, jnp.asarray(sbp_ops.GRID_FOOT)))
    assert seq[:, 0].mean() < 0.3


def test_root_correction_masks_match_nan_reference():
    """Masked root correction == NaN-based reference logic."""
    pq_prev = RNG.normal(size=(20, 7))
    pq_cur = RNG.normal(size=(20, 7)) * 0.1 + pq_prev
    for pq in (pq_prev, pq_cur):
        pq[:, 3:] /= np.linalg.norm(pq[:, 3:], axis=1, keepdims=True)

    constrs = np.zeros(20)
    constrs[0] = 1.0; constrs[1:4] = [0.01, 0.02, -0.1]    # lankle active
    constrs[8] = 1.0; constrs[9:12] = [0.0, 0.0, 0.05]     # lwrist active

    out = sbp_ops.root_correction_from_constrs(
        jnp.asarray(pq_prev), jnp.asarray(pq_cur), jnp.asarray(constrs),
        dt=1.0 / 60)

    # reference transcription
    rows = [3, 6, 15, 19, 0]
    resid = np.full((5, 3), np.nan)
    viz = np.ones((5, 3)) * 100.0
    for i in range(5):
        c = constrs[4 * i:4 * i + 4]
        if c[0] == 1.0:
            r = rows[i]
            x1, q1 = pq_prev[r, :3], pq_prev[r, 3:]
            x2, q2 = pq_cur[r, :3], pq_cur[r, 3:]
            w = np_ang_vel(q1, q2, 1 / 60)
            resid[i] = np.cross(w, c[1:4]) + (x2 - x1) * 60.0
            viz[i] = x2 + c[1:4]
    vel = np.zeros(3) if np.isnan(resid[:2]).all() else np.nanmean(resid[:2], 0)
    vel = np.clip(vel, -0.5, 0.5)

    np.testing.assert_allclose(np.asarray(out.vel_res), vel, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.c_locs), viz, atol=1e-6)
    got = np.asarray(out.raw_residues)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(resid))
    np.testing.assert_allclose(got[~np.isnan(got)], resid[~np.isnan(resid)],
                               atol=1e-6)
