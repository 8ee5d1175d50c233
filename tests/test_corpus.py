"""Procedural corpus generator: IK exactness, stance stationarity, labels.

The corpus (data_gen/corpus.py) replaces the reference's AMASS source data
(absent from this environment) for convergence training; these tests prove
the properties the training signal depends on: the analytic leg IK is
exact, planned stance feet are world-stationary through the real FK+label
pipeline, and every family synthesizes finite training pickles with the
expected SBP contact statistics.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tip_tpu.data_gen import amass_syn, corpus, smpl


def test_leg_ik_exact():
    """solve_leg reaches the requested ankle position and foot orientation
    exactly (closed-form chain recomposition, no FK engine involved)."""
    rng = np.random.default_rng(0)
    geo_l, geo_r = corpus.leg_geometry()
    T = 64
    for geo in (geo_l, geo_r):
        pelvis_p = rng.normal(size=(T, 3))
        pelvis_R = (Rotation.from_rotvec(rng.normal(size=(T, 3)) * 0.3)
                    .as_matrix() @ corpus._R_ZUP.as_matrix())
        # reachable targets in a cone around the rest leg direction (-y body)
        d = rng.uniform(0.55, 0.97, T) * (geo.l1 + geo.l2)
        dirs = np.array([0.0, -1.0, 0.0]) + rng.normal(size=(T, 3)) * 0.25
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        local = geo.hip_off + d[:, None] * dirs
        ankle_w = pelvis_p + np.einsum("tij,tj->ti", pelvis_R, local)
        foot_R_w = (Rotation.from_rotvec(rng.normal(size=(T, 3)) * 0.2)
                    .as_matrix() @ corpus._R_ZUP.as_matrix())

        hip_aa, knee_aa, ankle_aa = corpus.solve_leg(
            geo, pelvis_p, pelvis_R, ankle_w, foot_R_w)

        R_h = Rotation.from_rotvec(hip_aa).as_matrix()
        R_k = Rotation.from_rotvec(knee_aa).as_matrix()
        R_a = Rotation.from_rotvec(ankle_aa).as_matrix()
        chain = geo.hip_off + np.einsum(
            "tij,j->ti", R_h, geo.b1) + np.einsum(
            "tij,tjk,k->ti", R_h, R_k, geo.b2)
        got = pelvis_p + np.einsum("tij,tj->ti", pelvis_R, chain)
        assert np.abs(got - ankle_w).max() < 1e-9
        foot_got = pelvis_R @ R_h @ R_k @ R_a
        assert np.abs(foot_got - foot_R_w).max() < 1e-9


def test_walk_stance_feet_stationary_through_fk():
    """Through the real resample + URDF-FK pipeline, a walk's stance feet
    are world-stationary and the gait has a healthy stance fraction."""
    rng = np.random.default_rng(3)
    m = corpus.make_walk(rng, duration_s=6.0, terrain="stairs")
    aa60, trans60, _ = smpl.resample_motion(m)
    assert np.isfinite(aa60).all() and np.isfinite(trans60).all()
    fk = amass_syn.fk_motion(aa60, trans60, 1.6)       # scale 1.0
    pq = np.asarray(fk["pq_sbp"])                      # (T, 5, 7)
    for foot in (0, 1):                                # lfoot, rfoot links
        speed = np.linalg.norm(
            np.diff(pq[:, foot, :3], axis=0), axis=1) * 60.0
        frac_slow = (speed < 0.02).mean()
        assert 0.3 < frac_slow < 0.8, frac_slow
        # mid-stance frames are stationary to interpolation precision
        assert np.percentile(speed, 10) < 1e-3


def test_walk_stairs_contacts_climb():
    """Stairs ground profile: foot contacts happen at multiple distinct
    heights (the terrain-estimation training signal)."""
    rng = np.random.default_rng(5)
    m = corpus.make_walk(rng, duration_s=8.0, terrain="stairs")
    payload = amass_syn.synthesize(m, height=1.6, rng=rng)
    c = payload["constrs"].reshape(-1, 5, 4)
    fk = amass_syn.fk_motion(*smpl.resample_motion(m)[:2], 1.6)
    foot_z = np.asarray(fk["pq_sbp"])[:, 0, 2]
    on = (c[:, 0, 0] > 0) & np.isfinite(c[:, 0, 0])
    assert on.mean() > 0.3
    contact_heights = foot_z[on]
    assert contact_heights.max() - contact_heights.min() > 0.25


@pytest.mark.parametrize("family,feet_lo,feet_hi", [
    ("walk_flat", 0.3, 0.8),
    ("idle", 0.85, 1.01),
    ("squat", 0.85, 1.01),
    ("freeform", 0.0, 0.25),
])
def test_families_synthesize_with_expected_contacts(family, feet_lo, feet_hi):
    rng = np.random.default_rng(11)
    _, m = corpus.make_motion(rng, family)
    payload = amass_syn.synthesize(m, height=1.7, rng=rng)
    for k in ("imu", "nimble_qdq", "constrs"):
        assert np.isfinite(payload[k]).all(), k
    assert payload["imu"].shape[1] == 72
    assert payload["nimble_qdq"].shape[1] == 114
    c = payload["constrs"].reshape(-1, 5, 4)
    feet = ((c[:, :2, 0] > 0) & np.isfinite(c[:, :2, 0])).mean()
    assert feet_lo <= feet <= feet_hi, (family, feet)


def test_generate_corpus_resumable(tmp_path):
    """Deterministic per-index RNG + skip-existing (the reference
    generator's resumability, data-gen-and-viz-bullet-new.py:245-247)."""
    import pickle

    out = str(tmp_path / "corpus")
    wrote = corpus.generate_corpus(out, 2, seed=123, log=lambda *a: None)
    assert wrote == 2
    import os
    files = sorted(os.listdir(out))
    assert len(files) == 2 and all(f.endswith(".pkl") for f in files)
    with open(os.path.join(out, files[0]), "rb") as f:
        first = pickle.load(f)
    # second call: everything exists, nothing rewritten
    assert corpus.generate_corpus(out, 2, seed=123, log=lambda *a: None) == 0
    # deleting one file and rerunning regenerates it bit-identically
    os.remove(os.path.join(out, files[0]))
    assert corpus.generate_corpus(out, 2, seed=123, log=lambda *a: None) == 1
    with open(os.path.join(out, files[0]), "rb") as f:
        again = pickle.load(f)
    for k in first:
        np.testing.assert_array_equal(first[k], again[k])


def test_dance_family_contact_statistics():
    """Step-dance fills the gap between gait (long stances) and freeform
    (no contacts): frequent short foot contacts, finite everything."""
    rng = np.random.default_rng(3)
    _, m = corpus.make_motion(rng, "dance")
    payload = amass_syn.synthesize(m, height=1.6, rng=rng)
    for k in ("imu", "nimble_qdq", "constrs"):
        assert np.isfinite(payload[k]).all(), k
    c = payload["constrs"].reshape(-1, 5, 4)
    feet = ((c[:, :2, 0] > 0) & np.isfinite(c[:, :2, 0])).mean()
    assert 0.3 < feet < 0.85, feet
    # contacts are MANY short stances, not a few long ones: count distinct
    # contact runs on the left foot
    on = (c[:, 0, 0] > 0) & np.isfinite(c[:, 0, 0])
    runs = int(np.sum(np.diff(on.astype(int)) == 1))
    assert runs >= 4, runs
