"""Batched EXACT-semantics serving kernels (ops/fused_forward.py:
fused_recompute_batch / auto_fused_last).

The reference-parity "recompute" serving mode re-runs the full windowed
forward every tick (real_time_runner.py:413-426); these tests pin the
batched two-kernel path (gridded encoder + time-major RNN replay) to the
single-stream kernel, to the XLA model forward, and through the serving
pool end to end.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import fused_forward as FF

CFG = M.ModelConfig(tf_in_dim=64, tf_hid_size=96, n_heads=4, tf_layers=2,
                    rnn_hid_size=48, size_s=131)


def setup(B=8, T=40, dtype=jnp.float32):
    params = M.init_params(jax.random.PRNGKey(0), CFG, dtype=dtype)
    packed = tuple(FF.pack_weights(params, CFG, dtype=dtype))
    imu_dim = CFG.input_size_imu + 18
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.input_dim),
                          dtype)
    # NaN in a HISTORY channel (the reference zeroes only past-state NaNs)
    x = x.at[0, 5, imu_dim + 7].set(jnp.nan)
    k = jnp.asarray([T - 1, 3, 17, T - 1, 0, 25, 10, T - 1][:B], jnp.int32)
    return params, packed, x, k, imu_dim


import pytest


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_batch_matches_single_stream_kernel(dtype, tol):
    """Both dispatches of auto_fused_last must agree at the PRODUCTION
    packing dtype too (bf16): x enters the in-projection f32 in both, so
    residual differences are reduction-order only."""
    params, _, x, k, _ = setup()
    packed = tuple(FF.pack_weights(params, CFG, dtype=dtype))
    x = x.astype(jnp.float32)
    yb = FF.fused_recompute_batch(packed, x, k, CFG, bt=4, bt_rnn=4,
                                  interpret=True)
    ys = jnp.stack([FF.fused_forward_last(packed, x[b], k[b], CFG,
                                          interpret=True)
                    for b in range(x.shape[0])])
    assert float(jnp.abs(yb - ys).max()) < tol


def test_batch_matches_xla_forward_at_last_index():
    params, packed, x, k, imu_dim = setup()
    yb = FF.fused_recompute_batch(packed, x, k, CFG, bt=4, bt_rnn=4,
                                  interpret=True)
    y_m = M.forward(params, x[..., :imu_dim], x[..., imu_dim:], CFG)
    ym = jnp.stack([y_m[b, k[b]] for b in range(x.shape[0])])
    assert float(jnp.abs(yb - ym).max()) < 1e-5


def test_odd_batch_tile_fallback():
    """B=6 not divisible by the preferred tiles: the divisor fallback must
    keep exactness."""
    _, packed, x, k, _ = setup(B=6)
    yb = FF.fused_recompute_batch(packed, x, k, CFG, bt=4, bt_rnn=128,
                                  interpret=True)
    ys = jnp.stack([FF.fused_forward_last(packed, x[b], k[b], CFG,
                                          interpret=True)
                    for b in range(6)])
    assert float(jnp.abs(yb - ys).max()) < 1e-5


def test_custom_vmap_routes_to_batch():
    _, packed, x, k, _ = setup()
    f = FF.auto_fused_last(CFG, True, b_tile=4, b_tile_rnn=4)
    yv = jax.vmap(lambda xx, kk: f(packed, xx, kk))(x, k)
    yb = FF.fused_recompute_batch(packed, x, k, CFG, bt=4, bt_rnn=4,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(yv), np.asarray(yb))
    # single-stream call still works (no vmap)
    y0 = f(packed, x[0], k[0])
    assert float(jnp.abs(y0 - yb[0]).max()) < 1e-5


def test_stream_pool_exact_mode_through_fused_kernels():
    """StreamPool(serving_mode='recompute', forward_impl='fused') equals the
    XLA recompute pool tick for tick — exact serving at batch throughput."""
    import test_runner as TR
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import runner as R
    from tip_tpu.runtime.serving import StreamPool

    import dataclasses

    skel = kin.amass_skeleton()
    # f32 compute in BOTH pools: the fused kernels accumulate in f32, so
    # packing f32 (instead of the production bf16 default) isolates
    # batching/routing correctness from precision; residual differences are
    # reduction-order only, amplified by the autoregressive feedback
    mcfg_x = dataclasses.replace(TR.SMALL_MODEL, compute_dtype="float32")
    params = M.init_params(jax.random.PRNGKey(0), mcfg_x, dtype=jnp.float32)
    cfg_x = dataclasses.replace(TR.CFG, model=mcfg_x)
    cfg_f = dataclasses.replace(
        cfg_x, model=dataclasses.replace(mcfg_x, forward_impl="fused"))

    pool_x = StreamPool(params, cfg_x, skel, capacity=4, dtype=jnp.float32)
    pool_f = StreamPool(params, cfg_f, skel, capacity=4, dtype=jnp.float32)
    s_init = TR.make_s_init()
    for p in (pool_x, pool_f):
        for _ in range(3):
            p.add_stream(s_init)

    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation
    base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.2)
    worst = 0.0
    for t in range(12):
        base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.02) * base
        frame = np.concatenate([base.as_matrix().reshape(-1),
                                rng.normal(size=18) * 0.4]).astype(np.float32)
        batch = np.tile(frame, (4, 1))
        out_x = pool_x.step(batch)
        out_f = pool_f.step(batch)
        q_f = np.asarray(out_f["qdq"], np.float64)
        # identical streams -> identical rows (strict batch isolation)
        np.testing.assert_array_equal(q_f[0], q_f[1])
        np.testing.assert_array_equal(q_f[0], q_f[2])
        worst = max(worst, float(np.abs(
            np.asarray(out_x["qdq"][:3], np.float64) - q_f[:3]).max()))
    assert np.isfinite(worst) and worst < 2e-2, worst
