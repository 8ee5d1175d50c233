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


def test_np_fk_chain_matches_kin_fk():
    """The host-side planning FK (corpus.np_fk_chain) agrees with the
    product FK (ops.kinematics.fk) on joint frames for arbitrary poses."""
    import jax.numpy as jnp

    from tip_tpu.ops import kinematics as kin
    from tip_tpu.ops import rotations as rot

    rng = np.random.default_rng(2)
    T = 8
    aa24 = rng.normal(size=(T, 24, 3)) * 0.4
    root_p = rng.normal(size=(T, 3))
    root_R = Rotation.from_rotvec(rng.normal(size=(T, 3))).as_matrix()

    p_np, R_np = corpus.np_fk_chain(aa24, root_p, root_R)

    skel = kin.amass_skeleton(dtype=jnp.float64)
    aa19 = aa24[:, smpl.CHAR_TO_SMPL]
    joint_q = rot.aa_to_q(jnp.asarray(aa19))
    root_q = jnp.asarray(Rotation.from_matrix(root_R).as_quat())
    import jax
    _, pq_jf = jax.vmap(lambda p, q, j: kin.fk(skel, p, q, j))(
        jnp.asarray(root_p), root_q, joint_q)
    pq_jf = np.asarray(pq_jf)
    np.testing.assert_allclose(p_np, pq_jf[:, 1:, :3], atol=1e-9)
    R_fk = Rotation.from_quat(pq_jf[:, 1:, 3:].reshape(-1, 4)).as_matrix()
    np.testing.assert_allclose(R_np.reshape(-1, 3, 3), R_fk, atol=1e-9)


def test_arm_ik_exact():
    """solve_arm pins the wrist-link point exactly (verified through
    np_fk_chain-based arm_pin_point) for random torsos and targets."""
    rng = np.random.default_rng(4)
    T = 48
    geo_l, geo_r = corpus.arm_geometry()
    aa24 = np.zeros((T, 24, 3))
    import tip_tpu.constants as cst
    J = cst.SMPL_JOINT_IDX
    aa24[:, J["lowerback"]] = rng.normal(size=3) * 0.2
    aa24[:, J["chest"]] = rng.normal(size=3) * 0.2
    root_p = rng.normal(size=(T, 3))
    root_R = (Rotation.from_rotvec(rng.normal(size=(T, 3)) * 0.3)
              .as_matrix() @ corpus._R_ZUP.as_matrix())
    for geo, sgn in ((geo_l, 1.0), (geo_r, -1.0)):
        p_jf, _ = corpus.np_fk_chain(aa24, root_p, root_R)
        anchor = p_jf[:, geo.sho]
        d = rng.uniform(0.5, 0.97, T) * geo.reach
        dirs = rng.normal(size=(T, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        target = anchor + d[:, None] * dirs
        sho_aa, elb_aa = corpus.solve_arm(
            geo, aa24, root_p, root_R, target,
            pole=np.array([sgn, 0.3, -0.5]))
        aa = aa24.copy()
        aa[:, J[geo.side + "shoulder"]] = sho_aa
        aa[:, J[geo.side + "elbow"]] = elb_aa
        got = corpus.arm_pin_point(aa, root_p, root_R, geo.side)
        assert np.abs(got - target).max() < 1e-9


def test_sit_pelvis_labels_at_seat_height():
    """make_sit produces pelvis SBP positives concentrated at seat height.

    The labeler is stationarity-based (reference data_utils.py:27-100), so a
    quietly standing pelvis may ALSO label positive — that is faithful, not a
    bug. The assertion is therefore on the seated-height share of all frames,
    not on exclusivity."""
    heights_all = []
    seated_frac = []
    for seed in (17, 18, 19):
        rng = np.random.default_rng(seed)
        m = corpus.make_sit(rng, duration_s=8.0)
        fk = amass_syn.fk_motion(*smpl.resample_motion(m)[:2], 1.6)
        pq = np.asarray(fk["pq_sbp"])
        c = amass_syn.sbp_labels(fk["pq_sbp"]).reshape(-1, 5, 4)
        on = c[:, 4, 0] > 0
        h = pq[on, 4, 2] + c[on, 4, 3]
        heights_all.append(h)
        seated_frac.append((on & (pq[:, 4, 2] + c[:, 4, 3] < 0.8)).mean())
    h = np.concatenate(heights_all)
    assert h.min() > 0.15 and h.max() < 1.15
    # the seated hold dominates: >= 25% of frames are seat-height positives
    assert np.mean(seated_frac) > 0.25, seated_frac


@pytest.mark.parametrize("family,channel,lo,hi,min_height,max_height", [
    ("floorsit", 2, 0.25, 1.0, -0.05, 0.30),  # left palm on the floor
    ("floorsit", 3, 0.25, 1.0, -0.05, 0.30),  # right palm on the floor
    ("crawl", 2, 0.3, 0.9, -0.05, 0.30),
    ("crawl", 3, 0.3, 0.9, -0.05, 0.30),
    ("lean", None, 0.2, 1.0, 0.75, 1.6),      # whichever hand leans, high up
])
def test_contact_rich_families_label_positive(family, channel, lo, hi,
                                              min_height, max_height):
    """The new families actually produce positive wrist/pelvis SBP labels
    through the real synthesis pipeline, at the intended contact heights."""
    rng = np.random.default_rng(17)
    maker = {"sit": corpus.make_sit, "floorsit": corpus.make_floorsit,
             "crawl": corpus.make_crawl, "lean": corpus.make_lean}[family]
    m = maker(rng, duration_s=8.0)
    aa60, trans60, _ = smpl.resample_motion(m)
    assert np.isfinite(aa60).all() and np.isfinite(trans60).all()
    fk = amass_syn.fk_motion(aa60, trans60, 1.6)
    pq = np.asarray(fk["pq_sbp"])                  # (T, 5, 7)
    c = amass_syn.sbp_labels(fk["pq_sbp"]).reshape(-1, 5, 4)
    channels = [channel] if channel is not None else [2, 3]
    on_any = np.zeros(len(c), bool)
    best = 0.0
    for ch in channels:
        on = c[:, ch, 0] > 0
        on_any |= on
        best = max(best, on.mean())
        if on.any():
            heights = pq[on, ch, 2] + c[on, ch, 3]
            assert min_height <= heights.min() and heights.max() <= max_height, \
                (family, ch, heights.min(), heights.max())
    frac = on_any.mean() if channel is None else best
    assert lo <= frac <= hi, (family, frac)


@pytest.mark.parametrize("family,feet_lo,feet_hi", [
    ("sit", 0.85, 1.01),
    ("floorsit", 0.45, 1.01),
    ("crawl", 0.45, 1.01),
    ("lean", 0.85, 1.01),
])
def test_contact_rich_families_synthesize(family, feet_lo, feet_hi):
    rng = np.random.default_rng(23)
    _, m = corpus.make_motion(rng, family, duration_s=8.0)
    payload = amass_syn.synthesize(m, height=1.7, rng=rng)
    for k in ("imu", "nimble_qdq", "constrs"):
        assert np.isfinite(payload[k]).all(), k
    c = payload["constrs"].reshape(-1, 5, 4)
    feet = ((c[:, :2, 0] > 0) & np.isfinite(c[:, :2, 0])).mean()
    assert feet_lo <= feet <= feet_hi, (family, feet)


def test_sit_pelvis_stationary_through_fk():
    """During the seated hold the pelvis SBP point is world-stationary
    through the real resample + FK pipeline."""
    rng = np.random.default_rng(31)
    m = corpus.make_sit(rng, duration_s=9.0)
    fk = amass_syn.fk_motion(*smpl.resample_motion(m)[:2], 1.6)
    pq = np.asarray(fk["pq_sbp"])
    speed = np.linalg.norm(np.diff(pq[:, 4, :3], axis=0), axis=1) * 60.0
    # a long stretch of near-zero pelvis speed (the hold)
    assert (speed < 0.01).mean() > 0.25
    assert np.percentile(speed, 20) < 1e-3


def test_generate_corpus_exclude_families():
    """exclude drops a family from the draw and rejects unknown names."""
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        corpus.generate_corpus("/tmp/nonexistent_xx", 1, exclude=("nope",))
    fams = [f for f, _, _ in corpus._FAMILIES]
    assert {"sit", "floorsit", "crawl", "lean"} <= set(fams)


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


def test_freeform2_is_opt_in_only():
    """The corpus v3 supplement family must NOT join the default mix:
    adding a row to _FAMILIES would change the (seed, i) -> family draw
    stream and break bit-identical regeneration of the v2/LOFO corpora
    (the archived results.json files are keyed to those exact corpora)."""
    assert all(n != "freeform2" for n, _, _ in corpus._FAMILIES)
    assert any(n == "freeform2" for n, _, _ in corpus._EXTRA_FAMILIES)
    assert len(corpus._FAMILIES) == 12


def test_freeform2_motion_properties():
    """Enriched free-form: segment crossfades keep joints/translation
    smooth; the root actually rotates (v2 freeform roots never do); the
    synthesized payload is finite with freeform-like (near-zero) contact
    rates."""
    rng = np.random.default_rng(7)
    fam, m = corpus.make_motion(rng, "freeform2")
    assert fam == "freeform2"
    T = len(m.poses)
    assert T >= int(8.0 * corpus.FPS)

    # non-root joint fields are continuous through the segment crossfades
    # (root rotvecs may branch-flip at |angle|=pi, which slerp absorbs)
    dpose = np.abs(np.diff(m.poses[:, 1:], axis=0)).max()
    assert dpose < 0.1, dpose            # rad per 120 Hz frame
    dtrans = np.abs(np.diff(m.trans, axis=0)).max()
    assert dtrans < 0.02, dtrans         # <2.4 m/s equivalent

    # the root actually rotates (v2 freeform roots are constant) and its
    # quaternion path is smooth (rotvec branch flips are representation-only)
    r_all = Rotation.from_rotvec(m.poses[:, 0])
    dpsi = np.abs(np.diff(r_all.as_quat(), axis=0)).max()
    assert dpsi < 0.05, dpsi
    dev = (r_all[0].inv() * r_all).magnitude().max()
    assert dev > 0.05, dev

    payload = amass_syn.synthesize(m, height=1.7, rng=rng)
    for k in ("imu", "nimble_qdq", "constrs"):
        assert np.isfinite(payload[k]).all(), k
    c = payload["constrs"].reshape(-1, 5, 4)
    feet = ((c[:, :2, 0] > 0) & np.isfinite(c[:, :2, 0])).mean()
    assert feet <= 0.25, feet            # contact-free regime like freeform


def test_generate_corpus_families_param(tmp_path):
    """families= draws only the requested (possibly opt-in) families and
    stays resumable; bad combinations raise."""
    out = str(tmp_path / "sup")
    wrote = corpus.generate_corpus(out, 2, seed=300,
                                   families=("freeform2",),
                                   log=lambda *a: None)
    assert wrote == 2
    import os
    files = sorted(os.listdir(out))
    assert len(files) == 2
    assert all(f.startswith("freeform2_") for f in files)
    # idempotent rerun
    assert corpus.generate_corpus(out, 2, seed=300, families=("freeform2",),
                                  log=lambda *a: None) == 0
    with pytest.raises(ValueError):
        corpus.generate_corpus(out, 1, families=("nope",))
    with pytest.raises(ValueError):
        corpus.generate_corpus(out, 1, families=("freeform2",),
                               exclude=("dance",))
