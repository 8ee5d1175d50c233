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


def test_fused_rnn_train_gradients_match_scan():
    """fused_rnn_train's custom VJP (one BPTT kernel, only the hiddens
    saved) must match jax.grad through the scan reference — exact in f64
    (the kernels promote their accumulation dtype for the interpret parity
    tests)."""
    import jax

    rng = np.random.default_rng(0)
    B, T, H = 3, 7, 16
    xin = jnp.asarray(rng.normal(size=(B, T, H)) * 0.5)
    w = jnp.asarray(rng.normal(size=(H, H)) * 0.3)

    np.testing.assert_array_equal(
        np.asarray(PK.fused_rnn_train(xin, w, True)),
        np.asarray(PK.rnn_reference(xin, w)))

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    g_ref = jax.grad(loss(PK.rnn_reference), argnums=(0, 1))(xin, w)
    g_k = jax.grad(loss(lambda x, w: PK.fused_rnn_train(x, w, True)),
                   argnums=(0, 1))(xin, w)
    np.testing.assert_allclose(np.asarray(g_k[0]), np.asarray(g_ref[0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_k[1]), np.asarray(g_ref[1]),
                               atol=1e-12)


def test_model_trains_with_pallas_rnn():
    """ModelConfig(rnn_impl='pallas') is differentiable end to end (the
    forward routes through fused_rnn_train's custom VJP)."""
    import jax
    from tip_tpu.models import tip_model as M

    cfg = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=1,
                        rnn_hid_size=24, rnn_impl="pallas")
    cfg_ref = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                            tf_layers=1, rnn_hid_size=24)
    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x_imu = jnp.asarray(rng.normal(size=(2, 6, 90)))
    x_s = jnp.asarray(rng.normal(size=(2, 6, cfg.size_s)))

    def loss(cfg_):
        return lambda p: jnp.sum(M.forward(p, x_imu, x_s, cfg_) ** 2)

    g_k = jax.grad(loss(cfg))(params)
    g_ref = jax.grad(loss(cfg_ref))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
