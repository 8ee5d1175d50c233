"""Multi-stream serving pool + observability utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as R
from tip_tpu.runtime.serving import StreamPool
from tip_tpu.utils.observability import LatencyHistogram, MetricsWriter

import test_runner as TR


def test_stream_pool_add_remove_and_isolation():
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    pool = StreamPool(params, TR.CFG, skel, capacity=4, dtype=jnp.float64)

    s_init = TR.make_s_init()
    a = pool.add_stream(s_init)
    b = pool.add_stream(s_init)
    assert (a, b) == (0, 1) and pool.n_active == 2

    T = 12
    stream_a = TR.make_stream(T)
    stream_b = TR.make_stream(T)
    batch = np.zeros((4, T, 72))
    batch[a] = stream_a
    batch[b] = stream_b

    outs = [pool.step(batch[:, t]) for t in range(T)]
    pooled_a = np.stack([np.asarray(o["qdq"][a]) for o in outs])
    pooled_b = np.stack([np.asarray(o["qdq"][b]) for o in outs])

    # slot isolation: each stream matches its own single-stream run
    for stream, pooled in ((stream_a, pooled_a), (stream_b, pooled_b)):
        s_traj, _, _ = R.run_offline(params, TR.CFG, skel,
                                     jnp.asarray(s_init), jnp.asarray(stream))
        np.testing.assert_allclose(pooled[:T - 1], np.asarray(s_traj)[1:T],
                                   atol=1e-7)

    # remove + re-add resets the slot
    pool.remove_stream(a)
    assert pool.n_active == 1
    c = pool.add_stream(s_init)
    assert c == a
    out = pool.step(batch[:, 0])
    np.testing.assert_allclose(np.asarray(out["qdq"][c]), s_init, atol=1e-9)

    pool.add_stream(s_init)
    pool.add_stream(s_init)
    try:
        pool.add_stream(s_init)
        assert False, "expected full pool"
    except RuntimeError:
        pass


def test_latency_histogram_and_metrics_writer(tmp_path):
    h = LatencyHistogram(capacity=128)
    for v in np.linspace(1e-3, 10e-3, 100):
        h.record(v)
    s = h.summary()
    assert s["count"] == 100
    assert 5.0 < s["p50_ms"] < 6.0
    assert s["p99_ms"] <= s["max_ms"] <= 10.01

    mpath = tmp_path / "m.jsonl"
    w = MetricsWriter(str(mpath))
    w.write(step=1, loss=0.5)
    w.write(step=2, loss=0.25)
    w.close()
    import json
    lines = [json.loads(x) for x in open(mpath)]
    assert lines[0]["step"] == 1 and lines[1]["loss"] == 0.25


def test_stream_pool_chunked_matches_unchunked():
    """chunk= processes the pool in lax.map sub-batches (large-pool VMEM
    blocking, PERF.md); results must be identical to the plain vmap tick."""
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    pool_a = StreamPool(params, TR.CFG, skel, capacity=4, dtype=jnp.float64)
    pool_b = StreamPool(params, TR.CFG, skel, capacity=4, dtype=jnp.float64,
                        chunk=2)
    s_init = TR.make_s_init()
    for p in (pool_a, pool_b):
        for _ in range(4):
            p.add_stream(s_init)
    T = 10
    batch = np.stack([TR.make_stream(T) for _ in range(4)])  # (4, T, 72)
    for t in range(T):
        oa = pool_a.step(batch[:, t])
        ob = pool_b.step(batch[:, t])
        np.testing.assert_allclose(np.asarray(ob["qdq"]),
                                   np.asarray(oa["qdq"]), atol=1e-12)


def test_stream_pool_failed_tick_recovery():
    """step() donates the carries, so a failed dispatch must rebuild the
    pool (sessions restart from their stored init poses) instead of leaving
    it pointing at deleted buffers."""
    import pytest

    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    pool = StreamPool(params, TR.CFG, skel, capacity=2, dtype=jnp.float64)
    s_init = TR.make_s_init()
    pool.add_stream(s_init)
    batch = np.stack([TR.make_stream(8)[0]] * 2)
    for _ in range(8):
        pool.step(batch)

    orig = pool._step

    def boom(*a, **k):
        raise RuntimeError("injected tick failure")

    pool._step = boom
    with pytest.raises(RuntimeError, match="injected"):
        pool.step(batch)
    pool._step = orig

    # the pool is usable and slot 0 restarted its session from s_init
    out = pool.step(batch)
    np.testing.assert_allclose(np.asarray(out["qdq"][0]), s_init, atol=1e-9)
    assert pool.n_active == 1


def test_stream_pool_concurrent_add_claims_unique_slots():
    """The free-slot scan+claim is inside the carry lock: concurrent
    add_stream calls must never be handed the same slot."""
    import threading

    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    N = 8
    pool = StreamPool(params, TR.CFG, skel, capacity=N, dtype=jnp.float64)
    s_init = TR.make_s_init()
    pool.add_stream(s_init)        # warm the jitted slot-write first
    pool.remove_stream(0)

    slots, errors = [], []
    barrier = threading.Barrier(N)

    def add():
        try:
            barrier.wait()
            slots.append(pool.add_stream(s_init))
        except Exception as e:     # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=add) for _ in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sorted(slots) == list(range(N))


def test_stream_pool_kv_cache_mode():
    """The pool serves the KV-cached runner unchanged (cache rides in the
    carry pytree)."""
    import dataclasses
    cfg = dataclasses.replace(TR.CFG, serving_mode="kv_cache")
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    pool = StreamPool(params, cfg, skel, capacity=2, dtype=jnp.float64)
    s_init = TR.make_s_init()
    pool.add_stream(s_init)
    pool.add_stream(s_init)
    T = 10
    batch = np.stack([TR.make_stream(T) for _ in range(2)])
    outs = [pool.step(batch[:, t]) for t in range(T)]
    q = np.stack([np.asarray(o["qdq"]) for o in outs])
    assert np.isfinite(q).all()
    # matches the single-stream cached offline run per slot
    for b in range(2):
        s_traj, _, _ = R.run_offline(params, cfg, skel, jnp.asarray(s_init),
                                     jnp.asarray(batch[b]))
        np.testing.assert_allclose(q[:-1, b], np.asarray(s_traj)[1:T],
                                   atol=1e-9)


def test_stream_pool_fused_batch_kernel():
    """StreamPool + forward_impl="fused": the pool tick dispatches through
    the batched Pallas kernel (custom_vmap) and matches the XLA pool."""
    import dataclasses

    small_f32 = dataclasses.replace(TR.SMALL_MODEL, compute_dtype="float32",
                                    forward_impl="fused")
    small_ref = dataclasses.replace(TR.SMALL_MODEL, compute_dtype="float32")
    skel = kin.amass_skeleton()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), small_ref))
    s_init = TR.make_s_init()
    T = 12
    batch = np.stack([TR.make_stream(T) for _ in range(2)])

    outs = {}
    for name, mcfg in (("xla", small_ref), ("fused", small_f32)):
        cfg = dataclasses.replace(TR.CFG, model=mcfg,
                                  serving_mode="kv_cache")
        pool = StreamPool(params, cfg, skel, capacity=2, dtype=jnp.float32)
        pool.add_stream(s_init)
        pool.add_stream(s_init)
        qs = [np.asarray(pool.step(batch[:, t])["qdq"]) for t in range(T)]
        outs[name] = np.stack(qs)
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["xla"], atol=5e-3)
