"""DIP preprocessing against the shipped golden SBP fixtures."""

import os
import pickle

import numpy as np
import pytest

from tip_tpu.data_gen import dip as dip_lib
from tip_tpu.data_gen import smpl

SBP_DIR = "/root/reference/data/source/preprocessed_DIP_IMU_c"

pytestmark = pytest.mark.skipif(not os.path.isdir(SBP_DIR),
                                reason="shipped DIP SBP fixtures not present")


def test_shipped_sbp_fixture_format():
    files = sorted(os.listdir(SBP_DIR))
    assert len(files) >= 40
    with open(os.path.join(SBP_DIR, files[0]), "rb") as f:
        d = pickle.load(f)
    c = np.asarray(d["constrs"])
    assert c.ndim == 2 and c.shape[1] == 20
    flags = c[:, 0::4]
    assert set(np.unique(flags)).issubset({0.0, 1.0})
    # offsets are small local vectors when active
    act = flags[:, 0] == 1.0
    if act.any():
        assert np.abs(c[act][:, 1:4]).max() < 0.5


def test_augment_and_split_with_real_fixtures(tmp_path):
    """augment_with_sbp + copy_train_split on synthetic motions named like
    the DIP files, using the real shipped constraint pickles."""
    names = [n for n in sorted(os.listdir(SBP_DIR))
             if n.startswith(("dipimu_s_01", "dipimu_s_09", "dipimu_s_10"))][:6]
    assert names

    motion_dir = tmp_path / "preprocessed_DIP_IMU_v1"
    motion_dir.mkdir()
    rng = np.random.default_rng(0)
    for n in names:
        with open(os.path.join(SBP_DIR, n), "rb") as f:
            T = len(pickle.load(f)["constrs"])
        payload = {"imu": rng.normal(size=(T, 72)),
                   "nimble_qdq": rng.normal(size=(T, 114))}
        with open(motion_dir / n, "wb") as f:
            pickle.dump(payload, f)

    out_dir = str(tmp_path / "with_c")
    n_aug = dip_lib.augment_with_sbp(str(motion_dir), SBP_DIR, out_dir)
    assert n_aug == len(names)
    with open(os.path.join(out_dir, names[0]), "rb") as f:
        merged = pickle.load(f)
    assert set(merged) == {"imu", "nimble_qdq", "constrs"}
    assert len(merged["constrs"]) == len(merged["imu"])

    n_train = dip_lib.copy_train_split(out_dir)
    train_names = os.listdir(out_dir + "_train")
    assert n_train == len(train_names)
    assert all(not n.startswith(("dipimu_s_09", "dipimu_s_10"))
               for n in train_names)
    assert any(n.startswith("dipimu_s_01") for n in train_names)


def test_dip_synthetic_root_augmentation():
    """DIP motions (no translation) get the upright z-up root."""
    T = 80
    rng = np.random.default_rng(1)
    poses = np.zeros((T, 24, 3))
    poses[:, 0] = rng.normal(size=3) * 0.1       # near-identity belly
    motion = smpl.SmplMotion(poses=poses, trans=None, fps=60.0)
    qdq = dip_lib._qdq_from_gt(motion, has_trans=False)
    # constant synthetic root position (0, 0, 0.95)
    np.testing.assert_allclose(qdq[:, :3], [[0, 0, 0.95]] * len(qdq),
                               atol=1e-9)
    # root velocity zero
    np.testing.assert_allclose(qdq[:, 57:60], 0.0, atol=1e-9)
    # root orientation includes the y-up -> z-up rotation (angle ~ 2pi/3)
    ang = np.linalg.norm(qdq[0, 3:6])
    assert 1.9 < ang < 2.3
