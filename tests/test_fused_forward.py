"""Fused whole-model Pallas forward vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import fused_forward as FF

CFG = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                    rnn_hid_size=24)


def test_fused_matches_xla_forward_f32():
    params = M.init_params(jax.random.PRNGKey(0), CFG)
    ws = FF.pack_weights(params, CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    T = 16
    x_imu = rng.normal(size=(1, T, 90)).astype(np.float32)
    x_s = rng.normal(size=(1, T, 131)).astype(np.float32)
    x_s[..., 108:111] = 0.0        # the fused path expects pre-zeroed root vel

    ref = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s),
                               CFG))[0]
    x = jnp.asarray(np.concatenate([x_imu[0], x_s[0]], axis=-1))
    out = np.asarray(FF.fused_forward(tuple(ws), x, CFG, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_bf16_close():
    params = M.init_params(jax.random.PRNGKey(1), CFG)
    ws = FF.pack_weights(params, CFG, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    T = 12
    x_imu = rng.normal(size=(1, T, 90)).astype(np.float32)
    x_s = rng.normal(size=(1, T, 131)).astype(np.float32)
    x_s[..., 108:111] = 0.0

    ref = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s),
                               CFG))[0]
    x = jnp.asarray(np.concatenate([x_imu[0], x_s[0]], axis=-1))
    out = np.asarray(FF.fused_forward(tuple(ws), x, CFG, interpret=True))
    assert np.abs(out - ref).max() < 0.15
    assert np.abs(out - ref).mean() < 0.02


def test_fused_forward_last_matches_full():
    params = M.init_params(jax.random.PRNGKey(2), CFG)
    ws = tuple(FF.pack_weights(params, CFG, dtype=jnp.float32))
    rng = np.random.default_rng(2)
    T = 10
    x = jnp.asarray(rng.normal(size=(T, 90 + 131)).astype(np.float32))
    full = np.asarray(FF.fused_forward(ws, x, CFG, interpret=True))
    for k in (0, 3, T - 1):
        last = np.asarray(FF.fused_forward_last(ws, x, k, CFG, interpret=True))
        np.testing.assert_allclose(last, full[k], atol=1e-5)


def test_runner_fused_forward_impl_wiring():
    """ModelConfig(forward_impl="fused") routes the runner's model stage
    through the single-output Pallas kernel; outputs must track the XLA
    path within bf16 tolerance over a short stream."""
    from scipy.spatial.transform import Rotation

    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import runner as R

    skel = kin.amass_skeleton()
    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9

    rng = np.random.default_rng(3)
    base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.2)
    frames = []
    for _ in range(12):
        base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.02) * base
        frames.append(np.concatenate([base.as_matrix().reshape(-1),
                                      rng.normal(size=18) * 0.3]))
    imu = jnp.asarray(np.stack(frames).astype(np.float32))

    outs = {}
    for impl in ("xla", "fused"):
        # f32 packing (compute_dtype) isolates the wiring from bf16 rounding,
        # which random untrained weights amplify chaotically through the
        # autoregressive loop
        cfg = R.RunnerConfig(model=M.ModelConfig(
            tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
            rnn_hid_size=24, forward_impl=impl, compute_dtype="float32"))
        params = M.init_params(jax.random.PRNGKey(0), cfg.model)
        s, c, v = R.run_offline(params, cfg, skel,
                                jnp.asarray(s_init), imu)
        outs[impl] = np.asarray(s)
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["xla"], atol=2e-3)
