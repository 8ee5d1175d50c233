"""Sensor-corruption eval models (eval_corruption.py).

The corruption stream must be deterministic, structurally faithful (bias
shifts only acc, calibration rotates ori+acc consistently, dropouts repair
through the reference imputation path to finite values), and plumb through
the harness via EvalConfig.corruption.
"""

import numpy as np
import pytest

from tip_tpu import eval_corruption as EC


def _stream(T=240, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation
    ori = Rotation.from_rotvec(
        rng.normal(size=(T * EC.N_SENSORS, 3)) * 0.3).as_matrix()
    ori = ori.reshape(T, EC.N_SENSORS, 3, 3)
    acc = rng.normal(size=(T, EC.N_SENSORS, 3))
    return EC.merge_features(ori, acc)


def test_clean_config_is_identity():
    x = _stream()
    y = EC.corrupt_imu(x, EC.CorruptionConfig(), np.random.default_rng(0))
    np.testing.assert_array_equal(x, y)


def test_deterministic():
    x = _stream()
    cfg = EC.CorruptionConfig(dropout_rate_hz=1.0, acc_bias=0.5,
                              calib_rot_deg=5.0)
    a = EC.corrupt_imu(x, cfg, np.random.default_rng(7))
    b = EC.corrupt_imu(x, cfg, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    c = EC.corrupt_imu(x, cfg, np.random.default_rng(8))
    assert np.abs(a - c).max() > 1e-6


def test_acc_bias_constant_per_sensor_and_ori_untouched():
    x = _stream()
    cfg = EC.CorruptionConfig(acc_bias=0.5)
    y = EC.corrupt_imu(x, cfg, np.random.default_rng(3))
    ori_x, acc_x = EC.split_features(x)
    ori_y, acc_y = EC.split_features(y)
    np.testing.assert_allclose(ori_y, ori_x, atol=1e-12)
    d = acc_y - acc_x
    # constant over time per sensor, magnitude exactly acc_bias
    np.testing.assert_allclose(d - d[0][None], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.linalg.norm(d[0], axis=1), 0.5, atol=1e-9)


def test_calibration_rotates_ori_and_acc_consistently():
    x = _stream()
    cfg = EC.CorruptionConfig(calib_rot_deg=5.0)
    y = EC.corrupt_imu(x, cfg, np.random.default_rng(5))
    ori_x, acc_x = EC.split_features(x)
    ori_y, acc_y = EC.split_features(y)
    # per sensor: ori_y = R ori_x with a single R of 5 degrees
    for s in range(EC.N_SENSORS):
        R = ori_y[0, s] @ ori_x[0, s].T
        ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
        assert ang == pytest.approx(5.0, abs=1e-6)
        np.testing.assert_allclose(ori_y[:, s],
                                   np.einsum("ij,tjk->tik", R, ori_x[:, s]),
                                   atol=1e-9)
        np.testing.assert_allclose(acc_y[:, s],
                                   np.einsum("ij,tj->ti", R, acc_x[:, s]),
                                   atol=1e-9)


def test_dropout_repairs_finite_and_alters_stream():
    x = _stream(T=600)
    cfg = EC.CorruptionConfig(dropout_rate_hz=0.3, dropout_len_s=(0.2, 0.8))
    y = EC.corrupt_imu(x, cfg, np.random.default_rng(11))
    assert np.isfinite(y).all()
    # per-sensor: bursts happened but did not swallow the whole stream
    ori_x, acc_x = EC.split_features(x)
    ori_y, acc_y = EC.split_features(y)
    per_sensor = (np.abs(acc_y - acc_x).max(axis=2) > 1e-9)     # (T, 6)
    assert 0.01 < per_sensor.mean() < 0.8
    assert np.abs(ori_y - ori_x).max() > 1e-9    # ori dropped out too


def test_label():
    assert EC.CorruptionConfig().label() == "clean"
    assert "bias0.5" in EC.CorruptionConfig(acc_bias=0.5).label()
    lab = EC.CorruptionConfig(dropout_rate_hz=1.0, calib_rot_deg=5.0).label()
    assert "drop1Hz" in lab and "calib5deg" in lab


def test_harness_plumbs_corruption(tmp_path):
    """EvalConfig.corruption degrades a real eval run deterministically."""
    import pickle

    import jax
    import jax.numpy as jnp

    from tip_tpu import eval_harness as H
    from tip_tpu.data_gen import amass_syn, corpus
    from tip_tpu.models import tip_model as M
    from tip_tpu.runtime import runner as runner_lib

    import test_runner as TR

    rng = np.random.default_rng(2)
    motion = corpus.make_idle(rng, duration_s=4.0)
    payload = amass_syn.synthesize(motion, height=1.6, rng=rng)
    f = str(tmp_path / "idle_0000.pkl")
    with open(f, "wb") as fh:
        pickle.dump(payload, fh)

    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float32)
    base = dict(runner=runner_lib.RunnerConfig(
        model=TR.SMALL_MODEL, n_sbps=5,
        with_acc_sum=TR.SMALL_MODEL.with_acc_sum),
        test_len=10000, max_motions_per_cat=5)
    _, means_clean, _ = H.evaluate(params, H.EvalConfig(**base), [f],
                                   log=lambda *a: None)
    cor = EC.CorruptionConfig(acc_bias=3.0, calib_rot_deg=20.0)
    _, means_cor, _ = H.evaluate(
        params, H.EvalConfig(**base, corruption=cor), [f],
        log=lambda *a: None)
    _, means_cor2, _ = H.evaluate(
        params, H.EvalConfig(**base, corruption=cor), [f],
        log=lambda *a: None)
    # corruption changes the outcome; rerun is bit-stable
    assert means_cor["angle_deg"] != means_clean["angle_deg"]
    assert means_cor["angle_deg"] == means_cor2["angle_deg"]
