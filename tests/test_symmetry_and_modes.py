"""Train/test feature symmetry + stochastic inference mode + sharded serving.

Feature symmetry is SURVEY.md hard-part #4: the offline packing's acc
smoothing (uniform_filter1d 'nearest', preprocess_and_combine_syn_amass.py:82-85)
must coincide with the runner's online 11-frame trailing average + 5-frame
orientation delay for every interior frame, or the model sees different
statistics at train and test time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu.models import tip_model as M
from tip_tpu.ops import imu as imu_ops
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as R
from tip_tpu.runtime.serving import StreamPool
from tip_tpu.parallel import mesh as mesh_lib

import test_runner as TR


def test_online_smoothing_equals_offline_filter():
    """Runner's online smoothing == combine's uniform_filter1d for interior
    frames (the runner's 5-frame latency aligns them)."""
    T = 60
    imu = TR.make_stream(T)
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    carry = R.runner_init(TR.CFG, skel, jnp.asarray(TR.make_s_init()),
                          dtype=jnp.float64)

    online = []
    for t in range(T):
        prev_k = int(carry.k)
        carry, _ = R.runner_step(params, carry, jnp.asarray(imu[t]), TR.CFG,
                                 skel)
        if int(carry.k) > prev_k:
            slot = min(int(carry.k) - 1, 39)
            online.append(np.asarray(carry.imu_win[slot]))
    online = np.array(online)         # local features per smoothed frame

    # offline: centered 11-frame 'nearest' average then root-localisation
    smoothed = imu.copy()
    smoothed[:, 54:] = np.asarray(imu_ops.uniform_filter1d_nearest(
        jnp.asarray(imu[:, 54:]), cst.ACC_MOVING_AVE_LEN, axis=0))
    offline = np.asarray(imu_ops.imu_rotate_to_local(jnp.asarray(smoothed)))

    # online frame j corresponds to raw frame j (ori delayed by 5); interior
    # frames (both windows fully inside the stream) must match exactly
    n = len(online)
    for j in range(5, n - 5):
        np.testing.assert_allclose(online[j], offline[j], atol=1e-9,
                                   err_msg=f"frame {j}")


def test_stochastic_inference_mode():
    """Passing an rng reproduces the reference's dropout-at-inference mode
    (offline_testing_simple.py loads with past_state_dropout=0.8 and never
    calls eval()); deterministic mode stays repeatable."""
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    imu = TR.make_stream(12)
    s_init = jnp.asarray(TR.make_s_init())

    def run(rng=None):
        carry = R.runner_init(TR.CFG, skel, s_init, dtype=jnp.float64)
        outs = []
        for t in range(12):
            key = None if rng is None else jax.random.fold_in(rng, t)
            carry, out = R.runner_step(params, carry, jnp.asarray(imu[t]),
                                       TR.CFG, skel, rng=key)
            outs.append(np.asarray(out["qdq"]))
        return np.array(outs)

    det1, det2 = run(), run()
    np.testing.assert_array_equal(det1, det2)

    st1 = run(jax.random.PRNGKey(1))
    st2 = run(jax.random.PRNGKey(2))
    assert np.abs(st1 - st2).max() > 1e-6          # dropout changes outputs
    assert np.isfinite(st1).all()


def test_stream_pool_sharded_over_mesh():
    """The serving pool shards streams across the data axis of a mesh and
    matches the unsharded pool exactly."""
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)

    pool_a = StreamPool(params, TR.CFG, skel, capacity=8, dtype=jnp.float64)
    pool_b = StreamPool(params, TR.CFG, skel, capacity=8, dtype=jnp.float64,
                        mesh=mesh)
    s_init = TR.make_s_init()
    for p in (pool_a, pool_b):
        for _ in range(8):
            p.add_stream(s_init)

    local_rng = np.random.default_rng(3)   # own stream: never touch TR.RNG
    streams = np.stack([TR.make_stream(10, rng=local_rng) for _ in range(8)])

    for t in range(10):
        out_a = pool_a.step(streams[:, t])
        out_b = pool_b.step(streams[:, t])
        np.testing.assert_allclose(np.asarray(out_a["qdq"]),
                                   np.asarray(out_b["qdq"]), atol=1e-9)
    # streams really are distributed
    shards = pool_b._carries.s_and_c_win.sharding
    assert len(shards.device_set) == 8


def test_uniform_filter_even_window_matches_scipy():
    """Pin the even-window convention (TODO.md): scipy uniform_filter1d with
    even size centers with one extra sample on the LEFT; ours must match for
    every size, not just the odd ones the product uses."""
    from scipy.ndimage import uniform_filter1d

    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 4))
    for size in (2, 4, 6, 10, 11):
        ref = uniform_filter1d(x, size=size, axis=0, mode="nearest")
        got = np.asarray(imu_ops.uniform_filter1d_nearest(
            jnp.asarray(x), size, axis=0))
        np.testing.assert_allclose(got, ref, atol=1e-12,
                                   err_msg=f"size={size}")
