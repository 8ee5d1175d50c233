"""KV-cached streaming mode vs the windowed recompute path.

Key property under test (runtime/streaming_cache.py): while the 40-frame
window is still GROWING, past tokens' context never changes, so the cached
forward is bit-equal (f64) to the windowed recompute. Once the window
slides, cached representations keep their original context — a documented,
bounded divergence (the study summarised in PERF.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as R

import test_runner as TR

# first frame index at which the window has slid: 5 warmup frames + 40
_SLIDE_T = 5 + 40 + 1


@pytest.fixture(scope="module")
def setup():
    params = M.init_params(jax.random.PRNGKey(0), TR.SMALL_MODEL,
                           dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    return params, skel


def _run(params, skel, imu, s_init, serving_mode):
    cfg = R.RunnerConfig(model=TR.SMALL_MODEL, serving_mode=serving_mode)
    s, c, v = R.run_offline(params, cfg, skel, jnp.asarray(s_init),
                            jnp.asarray(imu))
    return np.asarray(s)


def test_kv_cache_exact_while_window_grows(setup):
    params, skel = setup
    T = 40                                  # k reaches 35 < window
    imu = TR.make_stream(T)
    s_init = TR.make_s_init()
    ref = _run(params, skel, imu, s_init, "recompute")
    got = _run(params, skel, imu, s_init, "kv_cache")
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_kv_cache_bounded_divergence_after_slide(setup):
    params, skel = setup
    T = 80
    imu = TR.make_stream(T)
    s_init = TR.make_s_init()
    ref = _run(params, skel, imu, s_init, "recompute")
    got = _run(params, skel, imu, s_init, "kv_cache")
    # exact up to (and including) the last pre-slide frame
    np.testing.assert_allclose(got[:_SLIDE_T], ref[:_SLIDE_T], atol=1e-9)
    assert np.isfinite(got).all()
    # diverges after the slide (it is a different mode); magnitude is not
    # asserted here — with random untrained weights the autoregressive loop
    # is chaotic and axis-angle decode can flip representation. The numeric
    # divergence study on a TRAINED model lives in PERF.md.
    assert np.abs(got - ref).max() > 1e-12


def test_rnn_carry_identical_until_slide_then_diverges(setup):
    """The carried hidden state computes the SAME recurrence as replay-from-
    zero while the encoder ring grows (append-only chain), so rnn_carry is
    exact until the window slides; afterwards it integrates history the
    replay forgets, so it must diverge from plain kv_cache."""
    params, skel = setup
    T = 80
    imu = TR.make_stream(T)
    s_init = TR.make_s_init()
    ref = _run(params, skel, imu, s_init, "recompute")
    cached = _run(params, skel, imu, s_init, "kv_cache")
    carry = _run(params, skel, imu, s_init, "kv_cache_rnn_carry")
    np.testing.assert_allclose(carry[:_SLIDE_T], ref[:_SLIDE_T], atol=1e-9)
    assert np.isfinite(carry).all()
    assert np.abs(carry[_SLIDE_T + 2:] - cached[_SLIDE_T + 2:]).max() > 1e-12


def test_mode_switch_rnn_carry_to_replay_is_exact(setup):
    """The rnn_carry kernel maintains the encoder ring even though it never
    replays it, precisely so a stream can switch to the replay mode
    mid-session (streaming_cache docstring). Pre-slide the two modes are
    exact twins, so (a) their cache rings must stay BIT-equal frame by
    frame (only the carried hidden may differ), and (b) a pre-slide switch
    must continue the all-kv_cache trajectory exactly for the rest of the
    stream — including past the slide. Post-slide the modes' trajectories
    (and hence histories and rings) legitimately diverge, so a post-slide
    switch is only well-defined, not comparable to either pure run."""
    params, skel = setup
    T = 70
    imu = TR.make_stream(T)
    s_init = jnp.asarray(TR.make_s_init())
    ref = _run(params, skel, imu, s_init, "kv_cache")

    cfg_a = R.RunnerConfig(model=TR.SMALL_MODEL,
                           serving_mode="kv_cache_rnn_carry")
    cfg_b = R.RunnerConfig(model=TR.SMALL_MODEL, serving_mode="kv_cache")

    # (a) side-by-side pre-slide: cache rings bit-equal every frame
    ca = R.runner_init(cfg_a, skel, s_init, dtype=jnp.float64)
    cb = R.runner_init(cfg_b, skel, s_init, dtype=jnp.float64)
    for t in range(_SLIDE_T - 1):
        ca, _ = R.runner_step(params, ca, jnp.asarray(imu[t]), cfg_a, skel)
        cb, _ = R.runner_step(params, cb, jnp.asarray(imu[t]), cfg_b, skel)
        for name in ("k", "v", "enc", "valid"):
            np.testing.assert_allclose(
                np.asarray(getattr(ca.cache, name)),
                np.asarray(getattr(cb.cache, name)), atol=1e-12,
                err_msg=f"{name} t={t}")
    # the carried hidden is the one intended difference once frames flow
    assert np.abs(np.asarray(ca.cache.h)).max() > 0.0
    assert np.abs(np.asarray(cb.cache.h)).max() == 0.0

    # (b) pre-slide switch: exact continuation of the all-kv_cache run,
    # asserted through and beyond the slide point
    T2_SWITCH = 20
    carry = R.runner_init(cfg_a, skel, s_init, dtype=jnp.float64)
    outs2 = [np.asarray(s_init)]
    for t in range(T - 1):
        cfg = cfg_a if t < T2_SWITCH else cfg_b
        carry, out = R.runner_step(params, carry, jnp.asarray(imu[t]), cfg,
                                   skel)
        outs2.append(np.asarray(out["qdq"]))
    np.testing.assert_allclose(np.stack(outs2), ref, atol=1e-9)

    # post-slide switch: well-defined (finite) by construction
    carry = R.runner_init(cfg_a, skel, s_init, dtype=jnp.float64)
    for t in range(T - 1):
        cfg = cfg_a if t < _SLIDE_T + 5 else cfg_b
        carry, out = R.runner_step(params, carry, jnp.asarray(imu[t]), cfg,
                                   skel)
        assert np.isfinite(np.asarray(out["qdq"])).all()


def test_kv_cache_vmaps_for_batched_serving(setup):
    """The cache is part of the carry pytree, so multi-stream vmap serving
    works unchanged."""
    params, skel = setup
    cfg = R.RunnerConfig(model=TR.SMALL_MODEL, serving_mode="kv_cache")
    step = R.make_multi_stream_step(cfg, skel)
    B, T = 3, 12
    s_init = TR.make_s_init()
    carry0 = R.runner_init(cfg, skel, jnp.asarray(s_init), dtype=jnp.float64)
    carries = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry0)
    streams = np.stack([TR.make_stream(T) for _ in range(B)])
    outs = []
    for t in range(T):
        # global pool tick: the kv-cache ring cursor shared by all streams
        carries, out = step(params, carries, jnp.asarray(streams[:, t]),
                            jnp.asarray(t, jnp.int32))
        outs.append(np.asarray(out["qdq"]))
    outs = np.stack(outs)                    # (T, B, 114)
    assert np.isfinite(outs).all()
    # each slot matches its own single-stream cached run (which uses the
    # per-stream cursor) -- the global-cursor layout is semantics-preserving
    for b in range(B):
        solo = _run(params, skel, streams[b], s_init, "kv_cache")
        np.testing.assert_allclose(outs[:-1, b], solo[1:T], atol=1e-9)


def test_kv_cache_pool_mid_stream_join(setup):
    # A stream joining a global-cursor pool mid-session (pool tick != 0)
    # must produce exactly its solo trajectory: the per-slot validity ring
    # masks the previous occupant tokens and the warmup holes.
    params, skel = setup
    cfg = R.RunnerConfig(model=TR.SMALL_MODEL, serving_mode="kv_cache")
    step = R.make_multi_stream_step(cfg, skel)
    B, T, JOIN = 2, 60, 7                 # join AFTER warmup; cursor wraps
    s_init = TR.make_s_init()
    carry0 = R.runner_init(cfg, skel, jnp.asarray(s_init), dtype=jnp.float64)
    carries = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry0)
    streams = np.stack([TR.make_stream(T + JOIN) for _ in range(B)])
    outs = []
    for t in range(T + JOIN):
        if t == JOIN:
            # stream 1 (re)joins: fresh carry written into its slot
            fresh = R.runner_init(cfg, skel, jnp.asarray(s_init),
                                  dtype=jnp.float64)
            carries = jax.tree_util.tree_map(
                lambda pool, x: pool.at[1].set(x), carries, fresh)
        carries, out = step(params, carries, jnp.asarray(streams[:, t]),
                            jnp.asarray(t, jnp.int32))
        outs.append(np.asarray(out["qdq"]))
    outs = np.stack(outs)
    solo = _run(params, skel, streams[1, JOIN:], s_init, "kv_cache")
    np.testing.assert_allclose(outs[JOIN:-1, 1], solo[1:T], atol=1e-9)


# ---------------------------------------------------------------------------
# fused Pallas cached step (interpret mode on CPU)
# ---------------------------------------------------------------------------

SMALL_F32 = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                          tf_layers=2, rnn_hid_size=24,
                          compute_dtype="float32")


def _token(rng, cfg):
    return jnp.asarray(
        rng.normal(size=(cfg.input_dim,)).astype(np.float32))


@pytest.mark.parametrize("rnn_carry", [False, True])
def test_fused_cached_step_matches_unfused(rnn_carry):
    from tip_tpu.ops import fused_forward as FF
    from tip_tpu.runtime import streaming_cache as SC

    cfg = SMALL_F32
    W = 8
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), cfg))
    packed = tuple(FF.pack_weights(params, cfg, dtype=jnp.float32))
    rng = np.random.default_rng(0)

    cache_a = SC.cache_init(cfg, W)
    cache_b = SC.cache_init(cfg, W)
    # stream past the slide point (k up to 2*W) to cover circular wrap
    for k in range(2 * W):
        x = _token(rng, cfg)
        cache_a, y_a = SC.cached_forward_step(params, cache_a, x,
                                              jnp.asarray(k, jnp.int32),
                                              cfg, rnn_carry=rnn_carry)
        cache_b, y_b = SC.fused_cached_forward_step(
            packed, cache_b, x, jnp.asarray(k, jnp.int32),
            jnp.asarray(True), cfg, rnn_carry=rnn_carry, interpret=True)
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a),
                                   atol=1e-4, err_msg=f"k={k}")
        for name in ("k", "v", "enc", "h"):
            np.testing.assert_allclose(
                np.asarray(getattr(cache_b, name)),
                np.asarray(getattr(cache_a, name)), atol=1e-4,
                err_msg=f"{name} k={k}")


def test_fused_cached_step_commit_flag():
    """commit=False must leave every ring (and the carried hidden)
    untouched — the warmup path needs no copy-on-select."""
    from tip_tpu.ops import fused_forward as FF
    from tip_tpu.runtime import streaming_cache as SC

    cfg = SMALL_F32
    W = 8
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(1), cfg))
    packed = tuple(FF.pack_weights(params, cfg, dtype=jnp.float32))
    rng = np.random.default_rng(1)

    cache = SC.cache_init(cfg, W)
    cache, _ = SC.fused_cached_forward_step(
        packed, cache, _token(rng, cfg), jnp.asarray(0, jnp.int32),
        jnp.asarray(True), cfg, rnn_carry=True, interpret=True)
    before = jax.tree_util.tree_map(np.asarray, cache)
    cache2, _ = SC.fused_cached_forward_step(
        packed, cache, _token(rng, cfg), jnp.asarray(1, jnp.int32),
        jnp.asarray(False), cfg, rnn_carry=True, interpret=True)
    for name in ("k", "v", "enc", "h"):
        np.testing.assert_array_equal(np.asarray(getattr(cache2, name)),
                                      getattr(before, name))


def test_runner_fused_kv_cache_end_to_end(setup):
    """serving_mode + forward_impl="fused" compose: the runner streams
    through the fused cached kernel and tracks the XLA cached path."""
    _, skel64 = setup
    skel = kin.amass_skeleton()          # f32 skeleton for the f32 path
    cfg_ref = R.RunnerConfig(model=SMALL_F32, serving_mode="kv_cache")
    cfg_fused = R.RunnerConfig(
        model=M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                            tf_layers=2, rnn_hid_size=24,
                            compute_dtype="float32", forward_impl="fused"),
        serving_mode="kv_cache")
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), SMALL_F32))
    T = 14
    imu = jnp.asarray(TR.make_stream(T).astype(np.float32))
    s_init = jnp.asarray(TR.make_s_init().astype(np.float32))
    s_ref, _, _ = R.run_offline(params, cfg_ref, skel, s_init, imu)
    s_fused, _, _ = R.run_offline(params, cfg_fused, skel, s_init, imu)
    assert np.isfinite(np.asarray(s_fused)).all()
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               atol=2e-3)


@pytest.mark.parametrize("rnn_carry", [False, True])
def test_fused_batch_matches_vmapped_xla(rnn_carry):
    """fused_cached_batch == vmap(cached_forward_step with the global
    cursor), including per-stream warmup (commit=False rows): outputs of
    committed frames match, and all valid-masked state matches. Rings differ
    only on invalid slots (the batched kernel writes unconditionally; the
    XLA path copy-selects), which no read ever consumes."""
    from tip_tpu.ops import fused_forward as FF
    from tip_tpu.runtime import streaming_cache as SC

    cfg = SMALL_F32
    W, B = 8, 4
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), cfg))
    packed = tuple(FF.pack_weights(params, cfg, dtype=jnp.float32))
    rng = np.random.default_rng(0)

    single = SC.cache_init(cfg, W)
    cache_a = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), single)
    cache_b = cache_a

    def xla_step(cache, x, slot, commit):
        new, y = SC.cached_forward_step(params, cache, x,
                                        jnp.asarray(0, jnp.int32), cfg,
                                        rnn_carry=rnn_carry,
                                        slot_override=slot)
        kept = jax.tree_util.tree_map(
            lambda n, o: jnp.where(commit, n, o), new, cache)
        return kept, y

    vstep = jax.jit(jax.vmap(xla_step, in_axes=(0, 0, None, 0)),
                    static_argnames=())

    # stream 0 active from t=0; stream 2 "joins" at t=3 (commit False before)
    joins = np.array([0, 0, 3, 5])
    T = 2 * W + 3
    for t in range(T):
        xs = jnp.asarray(rng.normal(size=(B, cfg.input_dim))
                         .astype(np.float32))
        commit = jnp.asarray(t >= joins)
        slot = jnp.asarray(t % W, jnp.int32)
        cache_a, y_a = vstep(cache_a, xs, slot, commit)
        cache_b, y_b = SC.fused_cached_batch(
            packed, cache_b, xs, slot, commit, cfg,
            rnn_carry=rnn_carry, b_tile=2, interpret=True)
        np.testing.assert_array_equal(np.asarray(cache_b.valid),
                                      np.asarray(cache_a.valid))
        act = np.asarray(commit)
        np.testing.assert_allclose(np.asarray(y_b)[act],
                                   np.asarray(y_a)[act], atol=2e-4,
                                   err_msg=f"t={t}")
        # valid-masked ring state must agree
        vmask = np.asarray(cache_a.valid)                    # (B, W)
        for name, axis in (("k", 2), ("v", 2), ("enc", 1)):
            a = np.asarray(getattr(cache_a, name))
            b = np.asarray(getattr(cache_b, name))
            m = vmask[:, None, :, None] if axis == 2 else vmask[:, :, None]
            np.testing.assert_allclose(np.where(m, b, 0.0),
                                       np.where(m, a, 0.0), atol=2e-4,
                                       err_msg=f"{name} t={t}")
        np.testing.assert_allclose(np.asarray(cache_b.h)[act],
                                   np.asarray(cache_a.h)[act], atol=2e-4)


def test_fused_batch_non_dividing_tile():
    """A preferred tile that does not divide the pool (e.g. the replay
    mode's 64-halving vs a 96-stream pool) must fall back to the largest
    divisor instead of failing a trace-time assertion (review finding)."""
    from tip_tpu.ops import fused_forward as FF
    from tip_tpu.runtime import streaming_cache as SC

    cfg = SMALL_F32
    W, B = 8, 6
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), cfg))
    packed = tuple(FF.pack_weights(params, cfg, dtype=jnp.float32))
    rng = np.random.default_rng(0)
    single = SC.cache_init(cfg, W)
    caches = {bt: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), single)
        for bt in (4, 2)}
    for t in range(3):
        xs = jnp.asarray(rng.normal(size=(B, cfg.input_dim))
                         .astype(np.float32))
        ys = {}
        for bt in (4, 2):        # 4 does not divide 6 -> falls back to 3
            caches[bt], ys[bt] = SC.fused_cached_batch(
                packed, caches[bt], xs, jnp.asarray(t % W, jnp.int32),
                jnp.ones(B, bool), cfg, rnn_carry=False, b_tile=bt,
                interpret=True)
        np.testing.assert_allclose(np.asarray(ys[4]), np.asarray(ys[2]),
                                   atol=1e-5)


def test_runner_pool_fused_batch_dispatch(setup):
    """forward_impl="fused" + a global pool tick dispatches the vmapped
    runner step through the BATCHED fused kernel (custom_vmap); trajectories
    must track the XLA cached pool path, including a mid-session join."""
    _, _ = setup
    skel = kin.amass_skeleton()
    mcfg = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                         tf_layers=2, rnn_hid_size=24,
                         compute_dtype="float32")
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), mcfg))
    B, T, JOIN = 2, 58, 9
    s_init = jnp.asarray(TR.make_s_init().astype(np.float32))
    streams = np.stack([TR.make_stream(T).astype(np.float32)
                        for _ in range(B)])

    outs = {}
    for impl in ("xla", "fused"):
        cfg = R.RunnerConfig(
            model=M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                                tf_layers=2, rnn_hid_size=24,
                                compute_dtype="float32", forward_impl=impl),
            serving_mode="kv_cache")
        step = R.make_multi_stream_step(cfg, skel)
        carry0 = R.runner_init(cfg, skel, s_init)
        carries = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry0)
        qs = []
        for t in range(T):
            if t == JOIN:
                fresh = R.runner_init(cfg, skel, s_init)
                carries = jax.tree_util.tree_map(
                    lambda pool, x: pool.at[1].set(x), carries, fresh)
            carries, out = step(params, carries,
                                jnp.asarray(streams[:, t]),
                                jnp.asarray(t, jnp.int32))
            qs.append(np.asarray(out["qdq"]))
        outs[impl] = np.stack(qs)
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["xla"], atol=5e-3)
