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
