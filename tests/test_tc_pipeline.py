"""TotalCapture preprocessing golden tests (reference
preprocess_DIP_TC_new.py:82-136, 363-388).

The TC branch differs from DIP in three subtle ways, each pinned here
against an independent numpy transcription of the reference:
  * the 6-sensor release order (ll, rl, lw, rw, h, r) is scattered into the
    17-slot DIP layout before the usual [2, 7, 8, 11, 12, 0] selection
    (reference :82-90);
  * NaN dropout imputation has a `t <= 10` boundary (frames 0..10 take the
    nanmean of frames 0..9; later frames the mean of the previous 5) and
    runs sequentially in place, so long dropouts consume already-imputed
    frames (reference :112-136);
  * the world-frame rotation is x+90 deg (rot_up_R_tc), not the DIP rot_up
    quaternion (reference :383-385).
"""

import os
import pickle

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tip_tpu.data_gen import dip


def _reference_fill(H_ori, H_acc):
    """Verbatim numpy transcription of fill_in_nan_values
    (preprocess_DIP_TC_new.py:113-136)."""
    m_len = H_ori.shape[0]
    mask = np.isnan(np.sum(H_ori.reshape((-1, 6, 9)), axis=2))
    for t in range(m_len):
        for i in range(6):
            if mask[t, i]:
                if t <= 10:
                    H_ori[t, i, :, :] = np.nanmean(H_ori[0:10, i], axis=0)
                else:
                    H_ori[t, i, :, :] = np.nanmean(H_ori[t - 5:t, i], axis=0)
    mask = np.isnan(np.sum(H_acc, axis=2))
    for t in range(m_len):
        for i in range(6):
            if mask[t, i]:
                if t <= 10:
                    H_acc[t, i, :] = np.nanmean(H_acc[0:10, i], axis=0)
                else:
                    H_acc[t, i, :] = np.nanmean(H_acc[t - 5:t, i], axis=0)
    return H_ori, H_acc


def _random_sensors(rng, T):
    ori = Rotation.from_rotvec(rng.normal(size=(T * 6, 3))).as_matrix() \
        .reshape(T, 6, 3, 3)
    acc = rng.normal(size=(T, 6, 3)) * 3.0
    return ori, acc


def _inject_dropouts(rng, ori, acc):
    """NaN dropouts: early frames (t <= 10 boundary straddled), a mid-stream
    burst longer than the 5-frame window, and scattered singles."""
    for t, i in [(0, 2), (5, 2), (10, 3), (11, 3), (12, 3)]:
        ori[t, i] = np.nan
    for t in range(40, 48):            # 8-frame burst: imputation feeds on
        acc[t, 1] = np.nan             # its own previous fills
    for t, i in [(25, 0), (60, 5), (61, 4)]:
        ori[t, i] = np.nan
        acc[t, i] = np.nan
    return ori, acc


def test_tc_scatter_reorders_sensors():
    """TC release order (ll, rl, lw, rw, h, r) must come out of the feature
    path as (root, lwrist, rwrist, lknee, rknee, head) (reference :82-90 and
    :166-167)."""
    T = 4
    ori6 = np.zeros((T, 6, 3, 3))
    acc6 = np.zeros((T, 6, 3))
    for k in range(6):                 # tag each sensor with its TC index
        ori6[:, k] = np.eye(3) * (k + 1)
        acc6[:, k] = k + 1
    with open("/tmp/_tc_tag.pkl", "wb") as f:
        pickle.dump({"ori": ori6, "acc": acc6}, f)
    ori17, acc17 = dip.load_imu_17("/tmp/_tc_tag.pkl")
    sel_o = ori17[:, list(dip.DIP_SENSORS)]
    sel_a = acc17[:, list(dip.DIP_SENSORS)]
    # ours order (root, lw, rw, lknee, rknee, head) <- TC indices
    # r=5, lw=2, rw=3, ll=0, rl=1, h=4
    expect = [6, 3, 4, 1, 2, 5]
    assert [int(sel_o[0, j, 0, 0]) for j in range(6)] == expect
    assert [int(sel_a[0, j, 0]) for j in range(6)] == expect


def test_fill_nan_matches_reference_transcription():
    rng = np.random.default_rng(7)
    ori, acc = _random_sensors(rng, 80)
    ori, acc = _inject_dropouts(rng, ori, acc)

    got_o, got_a = dip.fill_nan_trailing_mean(ori.copy(), acc.copy())
    ref_o, ref_a = _reference_fill(ori.copy(), acc.copy())
    np.testing.assert_array_equal(got_o, ref_o)
    np.testing.assert_array_equal(got_a, ref_a)
    assert np.isfinite(got_o).all() and np.isfinite(got_a).all()


def test_fill_nan_t10_boundary_semantics():
    """Pin the boundary itself: frame 10 uses frames 0..9; frame 11 uses
    frames 6..10 (which at slot 10 may include an already-imputed value)."""
    rng = np.random.default_rng(3)
    ori, acc = _random_sensors(rng, 30)
    ori[10, 0] = np.nan
    ori[11, 0] = np.nan
    got_o, _ = dip.fill_nan_trailing_mean(ori.copy(), acc.copy())
    # frame 10: nanmean over raw frames 0..9
    np.testing.assert_allclose(got_o[10, 0], ori[0:10, 0].mean(axis=0),
                               rtol=0, atol=1e-12)
    # frame 11: mean over frames 6..10 with slot 10 ALREADY imputed
    filled = np.concatenate([ori[6:10, 0], got_o[10:11, 0]], axis=0)
    np.testing.assert_allclose(got_o[11, 0], filled.mean(axis=0),
                               rtol=0, atol=1e-12)


def test_preprocess_tc_pair_golden(tmp_path):
    """End-to-end TC pair against an independent transcription of the
    reference chain (scatter -> select -> impute -> x+90 rotation), plus
    the qdq root stream using the PROVIDED translation (no synthetic
    upright root — that augmentation is DIP-only, reference :98-107)."""
    from tip_tpu.data_gen import corpus, smpl
    from tip_tpu.data_gen.amass_syn import nimble_qdq

    rng = np.random.default_rng(11)
    motion = corpus.make_walk(rng, duration_s=3.0)
    npz_path = str(tmp_path / "gt_poses.npz")
    poses156 = np.zeros((len(motion.poses), 156))
    poses156[:, :72] = motion.poses.reshape(-1, 72)
    np.savez(npz_path, poses=poses156, trans=motion.trans,
             mocap_framerate=motion.fps)

    T = 100
    ori6, acc6 = _random_sensors(rng, T)
    ori6, acc6 = _inject_dropouts(rng, ori6, acc6)
    imu_path = str(tmp_path / "imu.pkl")
    with open(imu_path, "wb") as f:
        pickle.dump({"ori": ori6, "acc": acc6}, f)

    payload = dip.preprocess_tc_pair(npz_path, imu_path)

    # oracle: reference chain transcribed
    ori17 = np.zeros((T, 17, 3, 3))
    acc17 = np.zeros((T, 17, 3))
    ori17[:, [11, 12, 7, 8, 0, 2]] = ori6
    acc17[:, [11, 12, 7, 8, 0, 2]] = acc6
    H_ori = ori17[:, [2, 7, 8, 11, 12, 0]].copy()
    H_acc = acc17[:, [2, 7, 8, 11, 12, 0]].copy()
    H_ori, H_acc = _reference_fill(H_ori, H_acc)
    rot_tc = Rotation.from_rotvec([np.pi / 2, 0, 0]).as_matrix()
    H_acc = np.einsum("jk,abk->abj", rot_tc, H_acc)
    H_ori = np.einsum("jk,abki->abji", rot_tc, H_ori)
    expect_imu = np.concatenate(
        [H_ori.reshape(-1, 54), H_acc.reshape(-1, 18)], axis=1)
    np.testing.assert_allclose(payload["imu"], expect_imu, atol=1e-12)

    aa60, trans60, _ = smpl.resample_motion(smpl.load_amass_npz(npz_path))
    expect_qdq = nimble_qdq(aa60, trans60)
    np.testing.assert_allclose(payload["nimble_qdq"], expect_qdq, atol=1e-9)
    # the provided translation must survive (no synthetic (0,0,0.95) root)
    assert np.abs(payload["nimble_qdq"][:, :3] - trans60).max() < 1e-9
    assert np.ptp(payload["nimble_qdq"][:, :2]) > 0.1


def test_fill_nan_all_nan_column_asserts():
    """A sensor that is NaN for all of frames 0..9 cannot be imputed — the
    reference's finiteness assert fires (preprocess_DIP_TC_new.py:134-135)."""
    rng = np.random.default_rng(5)
    ori, acc = _random_sensors(rng, 20)
    ori[0:12, 4] = np.nan
    with pytest.raises(AssertionError):
        dip.fill_nan_trailing_mean(ori, acc)
