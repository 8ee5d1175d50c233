"""Pallas kernels vs their lax reference implementations (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu.ops import pallas_kernels as PK


def test_fused_rnn_matches_scan():
    rng = np.random.default_rng(0)
    B, T, H = 4, 40, 64
    xin = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(H, H)) / np.sqrt(H)).astype(np.float32))

    ref = np.asarray(PK.rnn_reference(xin, w_hh))
    out = np.asarray(PK.fused_rnn(xin, w_hh, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_rnn_zero_input():
    B, T, H = 2, 8, 16
    xin = jnp.zeros((B, T, H), jnp.float32)
    w_hh = jnp.eye(H, dtype=jnp.float32)
    out = np.asarray(PK.fused_rnn(xin, w_hh, interpret=True))
    np.testing.assert_array_equal(out, np.zeros((B, T, H), np.float32))
