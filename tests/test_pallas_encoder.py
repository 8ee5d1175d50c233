"""Fused encoder-layer training kernels (ops/pallas_encoder.py).

All tests run the REAL kernel code path in interpret mode (the hash-PRNG
dropout is plain jnp, so interpret covers it) at f64, against
`encoder_layer_reference` — a jax.grad-able pure-JAX function that is
equation-identical to the kernels (same tiling, same masks, same
accumulation dtypes). The reference itself is anchored to the model's XLA
layer on the deterministic path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import pallas_encoder as PE

CFG = M.ModelConfig(tf_in_dim=64, tf_hid_size=128, n_heads=4, tf_layers=2,
                    rnn_hid_size=32, size_s=131)


def setup(dtype=jnp.float64, B=4, T=10):
    params = M.init_params(jax.random.PRNGKey(0), CFG, dtype=dtype)
    ws = PE.pack_layer_weights(params["layers"][0], dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.tf_in_dim),
                          dtype)
    return params, ws, x


def xla_layer(layer, x, cfg):
    mask = M.causal_mask(x.shape[1], x.dtype)
    a = M._attention(layer, x, mask, cfg, None, False)
    h = M._layer_norm(x + a, layer["ln1_s"], layer["ln1_b"])
    ff = jax.nn.relu(x=h @ layer["ff1"]["w"] + layer["ff1"]["b"]) \
        @ layer["ff2"]["w"] + layer["ff2"]["b"]
    return M._layer_norm(h + ff, layer["ln2_s"], layer["ln2_b"])


def test_forward_matches_xla_layer_deterministic():
    params, ws, x = setup()
    y_k = PE.encoder_layer_train(x, ws, 0, CFG.n_heads, 0.1, False, 2, True)
    y_x = xla_layer(params["layers"][0], x, CFG)
    assert float(jnp.abs(y_k - y_x).max()) < 1e-12


def test_forward_matches_reference_with_dropout():
    _, ws, x = setup()
    y_k = PE.encoder_layer_train(x, ws, 42, CFG.n_heads, 0.1, True, 2, True)
    y_r = PE.encoder_layer_reference(x, ws, 42, CFG.n_heads, 0.1, True, 2)
    assert float(jnp.abs(y_k - y_r).max()) < 1e-12
    # dropout actually happened (differs from the deterministic path)
    y_d = PE.encoder_layer_train(x, ws, 42, CFG.n_heads, 0.1, False, 2,
                                 True)
    assert float(jnp.abs(y_k - y_d).max()) > 1e-3
    # and is seed-deterministic
    y_k2 = PE.encoder_layer_train(x, ws, 42, CFG.n_heads, 0.1, True, 2,
                                  True)
    np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_k2))
    y_k3 = PE.encoder_layer_train(x, ws, 43, CFG.n_heads, 0.1, True, 2,
                                  True)
    assert float(jnp.abs(y_k - y_k3).max()) > 1e-3


@pytest.mark.parametrize("p,train,bt", [(0.1, True, 2), (0.0, False, 2),
                                        (0.3, True, 3)])
def test_gradients_match_reference_autodiff(p, train, bt):
    """The rematerialising backward kernel vs jax.grad of the reference —
    input grads and all 12 weight grads, WITH dropout active (masks must
    regenerate identically in the backward pass). B=6 with bt=3 also
    exercises the tile fallback."""
    _, ws, x = setup(B=6 if bt == 3 else 4)
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype)

    def loss_k(x, ws):
        y = PE.encoder_layer_train(x, ws, 42, CFG.n_heads, p, train, bt,
                                   True)
        return jnp.sum((y - tgt) ** 2)

    def loss_r(x, ws):
        y = PE.encoder_layer_reference(x, ws, 42, CFG.n_heads, p, train, bt)
        return jnp.sum((y - tgt) ** 2)

    gx_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(x, ws)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, ws)
    assert float(jnp.abs(gx_k - gx_r).max()) < 1e-10
    for i, (a, b) in enumerate(zip(gw_k, gw_r)):
        scale = max(1.0, float(jnp.abs(b).max()))
        assert float(jnp.abs(a - b).max()) / scale < 1e-12, i


def test_keep_mask_statistics_and_stream_separation():
    f = jnp.float64
    m1 = PE._keep_mask(jnp.int32(7), 0, (64, 256), 0.9, f)
    m2 = PE._keep_mask(jnp.int32(7), 1, (64, 256), 0.9, f)
    m3 = PE._keep_mask(jnp.int32(8), 0, (64, 256), 0.9, f)
    keep_frac = float((m1 > 0).mean())
    assert 0.88 < keep_frac < 0.92
    assert float((m1 != m2).mean()) > 0.1      # sites decorrelated
    assert float((m1 != m3).mean()) > 0.1      # seeds decorrelated
    # kept entries are scaled by 1/keep_prob
    kept = np.asarray(m1)[np.asarray(m1) > 0]
    np.testing.assert_allclose(kept, 1.0 / 0.9, rtol=1e-12)


def test_whole_model_forward_pallas_encoder_deterministic():
    """ModelConfig(encoder_impl='pallas') inference == the XLA forward."""
    cfg_x = CFG
    cfg_p = M.ModelConfig(**{**CFG.__dict__, "encoder_impl": "pallas"})
    params = M.init_params(jax.random.PRNGKey(3), cfg_x, dtype=jnp.float64)
    B, T = 4, 12
    x_imu = jax.random.normal(jax.random.PRNGKey(4), (B, T, 90),
                              jnp.float64)
    x_s = jax.random.normal(jax.random.PRNGKey(5), (B, T, 131),
                            jnp.float64) * 0.1
    y_x = M.forward(params, x_imu, x_s, cfg_x)
    y_p = M.forward(params, x_imu, x_s, cfg_p)
    assert float(jnp.abs(y_x - y_p).max()) < 1e-11


def test_whole_model_grads_pallas_encoder_no_dropout():
    """With every dropout disabled, training gradients through the pallas
    encoder equal the XLA path's exactly (the only intended divergence is
    the dropout stream)."""
    base = dict(CFG.__dict__)
    base.update(layer_dropout=0.0, past_dropout=0.0, in_dropout=0.0)
    cfg_x = M.ModelConfig(**base)
    cfg_p = M.ModelConfig(**{**base, "encoder_impl": "pallas"})
    params = M.init_params(jax.random.PRNGKey(3), cfg_x, dtype=jnp.float64)
    B, T = 4, 12
    x_imu = jax.random.normal(jax.random.PRNGKey(4), (B, T, 90),
                              jnp.float64)
    x_s = jax.random.normal(jax.random.PRNGKey(5), (B, T, 131),
                            jnp.float64) * 0.1
    tgt = jax.random.normal(jax.random.PRNGKey(6), (B, T, 131), jnp.float64)

    def loss(params, cfg):
        y = M.forward(params, x_imu, x_s, cfg, train=True,
                      rng=jax.random.PRNGKey(9))
        return jnp.mean((y - tgt) ** 2)

    from jax.flatten_util import ravel_pytree
    g_x = jax.grad(loss)(params, cfg_x)
    g_p = jax.grad(loss)(params, cfg_p)
    flat_x, _ = ravel_pytree(g_x)
    flat_p, _ = ravel_pytree(g_p)
    assert float(jnp.abs(flat_x - flat_p).max()) < 1e-10


def test_model_hash_dropout_impl():
    """ModelConfig(dropout_impl='hash'): deterministic per rng key, same
    marginal keep rate, equals the rng path when all rates are zero."""
    base = dict(CFG.__dict__)
    cfg_h = M.ModelConfig(**{**base, "dropout_impl": "hash"})
    params = M.init_params(jax.random.PRNGKey(0), cfg_h, dtype=jnp.float64)
    B, T = 4, 12
    x_imu = jax.random.normal(jax.random.PRNGKey(4), (B, T, 90),
                              jnp.float64)
    x_s = jax.random.normal(jax.random.PRNGKey(5), (B, T, 131),
                            jnp.float64) * 0.1
    k = jax.random.PRNGKey(9)
    y1 = M.forward(params, x_imu, x_s, cfg_h, train=True, rng=k)
    y2 = M.forward(params, x_imu, x_s, cfg_h, train=True, rng=k)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = M.forward(params, x_imu, x_s, cfg_h, train=True,
                   rng=jax.random.PRNGKey(10))
    assert float(jnp.abs(y1 - y3).max()) > 1e-3          # new step, new masks

    # rate-zero: hash and rng paths are the same computation
    z = dict(base)
    z.update(layer_dropout=0.0, past_dropout=0.0, in_dropout=0.0)
    cfg_h0 = M.ModelConfig(**{**z, "dropout_impl": "hash"})
    cfg_r0 = M.ModelConfig(**z)
    ya = M.forward(params, x_imu, x_s, cfg_h0, train=True, rng=k)
    yb = M.forward(params, x_imu, x_s, cfg_r0, train=True, rng=k)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-12)

    # marginal statistics of the nD mask generalisation
    from tip_tpu.ops.pallas_encoder import _keep_mask
    m4 = _keep_mask(jnp.int32(3), 210, (4, 8, 16, 32), 0.8, jnp.float32)
    assert 0.77 < float((m4 > 0).mean()) < 0.83
    # 2D case unchanged vs the kernel's stream (regression: the nD rewrite
    # must keep the linear index r*ncols + c)
    m2 = _keep_mask(jnp.int32(7), 0, (64, 256), 0.9, jnp.float32)
    r, c = 11, 57
    lin = _keep_mask(jnp.int32(7), 0, (1, 64 * 256), 0.9, jnp.float32)
    np.testing.assert_array_equal(np.asarray(m2).reshape(-1),
                                  np.asarray(lin)[0])
