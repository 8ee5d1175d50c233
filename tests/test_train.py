"""Training step, sharding, schedule, sampler, and checkpoint tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.parallel import mesh as mesh_lib
from tip_tpu.train import data as data_lib
from tip_tpu.train import train as train_lib

TINY = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                     rnn_hid_size=24, past_dropout=0.0, layer_dropout=0.0)
CFG = train_lib.TrainConfig(model=TINY, batch_size=8, seq_len=8, lr=3e-3,
                            epochs=4, noise_input_hist=0.0, seed=0)
RNG = np.random.default_rng(0)


def synth_batch(b=8, t=8):
    x_imu = RNG.normal(size=(b, t, 90)).astype(np.float32)
    x_s = RNG.normal(size=(b, t, 131)).astype(np.float32)
    # learnable target: a fixed linear map of the imu features
    w = RNG.normal(size=(90, 131)) / np.sqrt(90)
    y = (x_imu @ w).astype(np.float32) * 0.3
    return jnp.asarray(x_imu), jnp.asarray(x_s), jnp.asarray(y)


def test_train_step_decreases_loss():
    state = train_lib.init_state(CFG)
    step = train_lib.make_train_step(CFG)
    x_imu, x_s, y = synth_batch()
    losses = []
    for _ in range(30):
        state, aux = step(state, x_imu, x_s, y)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    assert np.isfinite(losses).all()


def test_lr_schedule_matches_torch_cosine():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(lin.parameters(), lr=CFG.lr)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=CFG.epochs + CFG.cosine_extra)
    sched = train_lib.lr_schedule(CFG)
    for t in range(12):
        np.testing.assert_allclose(float(sched(t)), sch.get_last_lr()[0],
                                   rtol=1e-6)
        opt.step()
        sch.step()


def test_sharded_step_matches_single_device():
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    state_a = train_lib.init_state(CFG)
    state_b = train_lib.shard_state(train_lib.init_state(CFG), mesh)
    step_a = train_lib.make_train_step(CFG)
    step_b = train_lib.make_train_step(CFG, mesh)
    x_imu, x_s, y = synth_batch()
    bsh = mesh_lib.batch_sharding(mesh)
    xs = tuple(jax.device_put(a, bsh) for a in (x_imu, x_s, y))

    # fresh params for the grad comparison below
    params = train_lib.init_state(CFG).params
    state_a, aux_a = step_a(state_a, x_imu, x_s, y)
    state_b, aux_b = step_b(state_b, *xs)
    np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux_a["grad_norm"]),
                               float(aux_b["grad_norm"]), rtol=1e-4)

    # gradients must agree between single-device and mesh execution
    # (post-Adam params are ill-conditioned to compare: near-zero grads flip
    # the normalised update under fp reduction reordering)
    rng = jax.random.PRNGKey(7)
    g_single = jax.jit(jax.grad(
        lambda p: train_lib.loss_fn(p, x_imu, x_s, y, rng, CFG)[0]))(params)

    bsh2 = mesh_lib.batch_sharding(mesh)
    g_mesh = jax.jit(
        jax.grad(lambda p, a, b, c: train_lib.loss_fn(p, a, b, c, rng, CFG)[0]),
        in_shardings=(mesh_lib.param_shardings(mesh, params), bsh2, bsh2, bsh2),
    )(jax.device_put(params, mesh_lib.param_shardings(mesh, params)), *xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=3e-5)


def test_checkpoint_roundtrip(tmp_path):
    state = train_lib.init_state(CFG)
    step = train_lib.make_train_step(CFG)
    x_imu, x_s, y = synth_batch()
    state, _ = step(state, x_imu, x_s, y)

    train_lib.save_checkpoint(str(tmp_path / "ckpt"), state, 1)
    restored = train_lib.restore_checkpoint(str(tmp_path / "ckpt"), CFG)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # resume-exact: next step from restored == next step from original.
    # Compare the POST-update params (not just the loss, which is computed
    # from the pre-update params and would pass even with a zeroed
    # optimizer state) — this is what actually certifies opt_state
    # (Adam moments + schedule step) round-tripped.
    s1, aux1 = step(state, x_imu, x_s, y)
    s2, aux2 = step(restored, x_imu, x_s, y)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.opt_state),
                    jax.tree_util.tree_leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_sampler_semantics():
    # two segments with different downsample rates
    info = np.array([[0, 100, 10], [100, 130, 1]])
    N = 130
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=np.arange(N)[:, None].repeat(131, 1).astype(np.float32),
        info=info,
    )
    rng = np.random.default_rng(1)
    idx = data_lib.sample_epoch_indices(ds.info, seq_len=8, rng=rng)
    # segment 1: candidates 8..98 (n=91) -> round(9.1)=9; segment 2:
    # candidates 108..128 (n=21) -> 21
    assert len(idx) == 9 + 21
    assert ((idx >= 8) & (idx <= 128)).all()
    # no window crosses a segment start and targets stay in range
    for t in idx:
        seg = 0 if t < 100 else 1
        assert t - 8 >= info[seg, 0] and t + 1 <= info[seg, 1]

    x_imu, x_s, yb = data_lib.gather_batch(ds, idx[:4], 8)
    assert x_imu.shape == (4, 8, 90)
    assert x_s.shape == (4, 8, 131) and yb.shape == (4, 8, 131)
    # teacher forcing: y is x_s shifted by one frame
    np.testing.assert_array_equal(x_s[:, 1:], yb[:, :-1])
    np.testing.assert_array_equal(x_s[0, 0, 0], idx[0] - 8)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 40, 131)
    ge.dryrun_multichip(8)


def test_tp_shardings_are_per_head_clean():
    """q/k/v shard their output dim in whole-head chunks: with n_model
    dividing n_heads, every shard's column range is a multiple of head_dim,
    so attention computes its heads locally with no mid-head regather
    (VERDICT r1 #8). The RNN head replicates by policy."""
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    cfg = M.ModelConfig(tf_in_dim=64, tf_hid_size=128, n_heads=8,
                        tf_layers=2, rnn_hid_size=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    shardings = mesh_lib.param_shardings(mesh, params)

    n_model = mesh.devices.shape[1]
    assert cfg.n_heads % n_model == 0
    for layer in shardings["layers"]:
        for k in ("w_q", "w_k", "w_v"):
            assert layer[k].spec == jax.sharding.PartitionSpec(None, "model")
        for k in ("b_q", "b_k", "b_v"):
            assert layer[k].spec == jax.sharding.PartitionSpec("model")
        assert layer["out_proj"]["w"].spec == \
            jax.sharding.PartitionSpec("model", None)
    # per-head cleanliness: each shard owns whole heads
    shard_cols = cfg.tf_in_dim // n_model
    assert shard_cols % cfg.head_dim == 0
    # RNN + output head replicate (documented policy)
    for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s.spec,
                                   {"rnn": shardings["rnn"],
                                    "out": shardings["out"]},
                                   is_leaf=lambda x: hasattr(x, "spec"))):
        assert leaf == jax.sharding.PartitionSpec()


def test_train_loop_writes_structured_metrics(tmp_path):
    """train_loop's jsonl metrics stream (utils.observability.MetricsWriter):
    per-interval batch records carry loss/lr/grad_norm, per-epoch records
    carry mean_loss, and every record is wall-clock stamped."""
    import json

    N = 64
    info = np.array([[0, N, 1]], dtype=np.int64)
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=info,
    )
    cfg = train_lib.TrainConfig(model=TINY, batch_size=4, seq_len=8,
                                epochs=1, noise_input_hist=0.0, seed=0,
                                log_interval=1)
    mpath = tmp_path / "train_metrics.jsonl"
    train_lib.train_loop(cfg, ds, max_epochs=1, metrics_path=str(mpath),
                         log_fn=lambda r: None)
    records = [json.loads(x) for x in open(mpath)]
    assert records, "no metrics written"
    batch_recs = [r for r in records if "batch" in r and "loss" in r]
    epoch_recs = [r for r in records if "mean_loss" in r]
    assert batch_recs and epoch_recs
    for r in batch_recs:
        assert {"epoch", "batch", "loss", "lr", "grad_norm",
                "wall_s"} <= set(r)
        assert np.isfinite(r["loss"])
    assert np.isfinite(epoch_recs[-1]["mean_loss"])


def test_device_gather_matches_host_gather():
    """The in-jit window gather (DeviceDataset) must produce the same batch
    and the same train step result as the host-side gather."""
    N = 96
    info = np.array([[0, N, 1]], dtype=np.int64)
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=info,
    )
    T, B = 8, 4
    ends = np.array([10, 33, 57, 90])
    xh, sh, yh = data_lib.gather_batch(ds, ends, T)
    dds = data_lib.to_device(ds)
    xd, sd, yd = data_lib.device_gather(dds, jnp.asarray(ends, jnp.int32), T)
    np.testing.assert_allclose(np.asarray(xd), xh, atol=0)
    np.testing.assert_allclose(np.asarray(sd), sh, atol=0)
    np.testing.assert_allclose(np.asarray(yd), yh, atol=0)

    cfg = train_lib.TrainConfig(model=TINY, batch_size=B, seq_len=T,
                                noise_input_hist=0.0, seed=0)
    s0 = train_lib.init_state(cfg)
    step_h = train_lib.make_train_step(cfg)
    step_d = train_lib.make_train_step(cfg, device_data=dds)
    sh1, aux_h = step_h(s0, jnp.asarray(xh), jnp.asarray(sh), jnp.asarray(yh))
    sd1, aux_d = step_d(s0, jnp.asarray(ends, jnp.int32))
    np.testing.assert_allclose(float(aux_d["loss"]), float(aux_h["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sh1.params),
                    jax.tree_util.tree_leaves(sd1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_train_loop_gather_on_device(tmp_path):
    """train_loop(gather_on_device=True) runs end to end and learns."""
    N = 128
    info = np.array([[0, N, 1]], dtype=np.int64)
    w = RNG.normal(size=(72, 131)).astype(np.float32) / 9.0
    imu = RNG.normal(size=(N, 72)).astype(np.float32)
    ds = data_lib.PackedDataset(
        imu=imu,
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=(imu @ w) * 0.3,
        info=info,
    )
    cfg = train_lib.TrainConfig(model=TINY, batch_size=8, seq_len=8,
                                lr=3e-3, epochs=3, noise_input_hist=0.0,
                                seed=0, log_interval=1000)
    losses = []
    train_lib.train_loop(cfg, ds, max_epochs=3, gather_on_device=True,
                         log_fn=lambda r: losses.append(r.get("mean_loss")))
    vals = [l for l in losses if l is not None]
    assert len(vals) == 3 and np.isfinite(vals).all()
    assert vals[-1] < vals[0]


def test_sharded_step_falls_back_from_pallas_rnn():
    """rnn_impl='pallas' under a mesh silently uses the scan (Pallas has no
    SPMD partitioning rule); gradients are identical either way, so only
    speed changes — the step must compile and run on the virtual mesh."""
    import dataclasses

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    tiny = dataclasses.replace(TINY, rnn_impl="pallas")
    cfg = train_lib.TrainConfig(model=tiny, batch_size=8, seq_len=8,
                                noise_input_hist=0.0, seed=0)
    state = train_lib.shard_state(train_lib.init_state(cfg), mesh)
    step = train_lib.make_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(8, 8, d)).astype(np.float32))
          for d in (90, 131, 131)]
    bs = mesh_lib.batch_sharding(mesh)
    xs = [jax.device_put(x, bs) for x in xs]
    state, aux = step(state, *xs)
    assert np.isfinite(float(aux["loss"]))


def test_nan_loss_rollback_actually_rolls_back():
    """Exercise the non-finite-loss rollback branch (no other test feeds a
    NaN batch, so the jnp.where tree could have swapped operands without
    any failure — review finding). A poisoned batch must be flagged, leave
    params/opt_state/step bit-identical, and not poison later batches."""
    N = 64
    RNGL = np.random.default_rng(11)
    imu = RNGL.normal(size=(N, 72)).astype(np.float32)
    imu[30:40] = np.inf                     # poison a window range
    ds = data_lib.PackedDataset(
        imu=imu,
        acc_sum=RNGL.normal(size=(N, 18)).astype(np.float32),
        s=RNGL.normal(size=(N, 131)).astype(np.float32),
        info=np.array([[0, N, 1]], dtype=np.int64),
    )
    T, B = 8, 4
    cfg = train_lib.TrainConfig(model=TINY, batch_size=B, seq_len=T,
                                noise_input_hist=0.0, seed=0)
    dds = data_lib.to_device(ds)
    epoch_fn = train_lib.make_epoch_fn(cfg, dds)
    state0 = train_lib.init_state(cfg)

    # epoch of ONE poisoned batch: state must come back bit-identical
    bad_ends = np.full((1, B), 39, np.int32)       # windows inside the inf
    s_bad, aux_bad = epoch_fn(state0, jnp.asarray(bad_ends))
    assert bool(np.asarray(aux_bad["skipped"]).all())
    assert not np.isfinite(np.asarray(aux_bad["loss"])).any()
    assert int(s_bad.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                    jax.tree_util.tree_leaves(s_bad.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state0.opt_state),
                    jax.tree_util.tree_leaves(s_bad.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mixed epoch: [clean, poisoned, clean] -> only the middle is skipped,
    # the clean steps train and stay finite
    ends = np.array([[12, 13, 14, 15], [39, 39, 38, 37],
                     [50, 51, 52, 53]], np.int32).reshape(3, B)
    s_mix, aux = epoch_fn(state0, jnp.asarray(ends))
    np.testing.assert_array_equal(np.asarray(aux["skipped"]),
                                  [False, True, False])
    assert int(s_mix.step) == 2
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree_util.tree_leaves(s_mix.params))


def test_epoch_scan_matches_per_batch_steps():
    """make_epoch_fn (whole epoch as one lax.scan program) must reproduce
    the per-batch device-gather steps exactly, including the on-device
    non-finite-loss rollback."""
    N = 96
    info = np.array([[0, N, 1]], dtype=np.int64)
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=info,
    )
    T, B, NB = 8, 4, 5
    cfg = train_lib.TrainConfig(model=TINY, batch_size=B, seq_len=T,
                                noise_input_hist=0.0, seed=0)
    dds = data_lib.to_device(ds)
    rng = np.random.default_rng(2)
    ends = rng.integers(T, N - 1, size=(NB, B)).astype(np.int32)

    s_loop = train_lib.init_state(cfg)
    step_d = train_lib.make_train_step(cfg, device_data=dds)
    losses = []
    for i in range(NB):
        s_loop, aux = step_d(s_loop, jnp.asarray(ends[i]))
        losses.append(float(aux["loss"]))

    epoch_fn = train_lib.make_epoch_fn(cfg, dds)
    s_scan, aux_all = epoch_fn(train_lib.init_state(cfg), jnp.asarray(ends))
    np.testing.assert_allclose(np.asarray(aux_all["loss"]), losses,
                               rtol=1e-6)
    assert not np.asarray(aux_all["skipped"]).any()
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(s_scan.step) == NB


def test_epoch_scan_sharded_runs():
    """Epoch scan over the (data, model) mesh compiles and runs."""
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    N = 64
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=np.array([[0, N, 1]], dtype=np.int64),
    )
    cfg = train_lib.TrainConfig(model=TINY, batch_size=8, seq_len=8,
                                noise_input_hist=0.0, seed=0)
    dds = data_lib.to_device(ds, sharding=mesh_lib.replicated(mesh))
    state = train_lib.shard_state(train_lib.init_state(cfg), mesh)
    epoch_fn = train_lib.make_epoch_fn(cfg, dds, mesh=mesh)
    ends = np.random.default_rng(3).integers(8, N - 1, size=(3, 8))
    state, aux = epoch_fn(state, jnp.asarray(ends, jnp.int32))
    assert np.isfinite(np.asarray(aux["loss"])).all()
    assert int(state.step) == 3


def test_rbg_dropout_rng_runs_and_is_deterministic():
    """dropout_rng_impl="rbg" (TPU hardware generator fast path): finite,
    and deterministic for a fixed state."""
    import dataclasses
    cfg = dataclasses.replace(CFG, dropout_rng_impl="rbg")
    state = train_lib.init_state(cfg)
    step = train_lib.make_train_step(cfg)
    x_imu, x_s, y = synth_batch()
    s1, aux1 = step(state, x_imu, x_s, y)
    s2, aux2 = step(state, x_imu, x_s, y)
    assert np.isfinite(float(aux1["loss"]))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]))


def test_restore_across_optimizer_mismatch_params_only(tmp_path):
    """An AdamW checkpoint opened with an Adam TrainConfig (the common
    inference-tool case, e.g. cli/live_demo or cli/evaluate) restores
    params/step/rng with a fresh optimizer state and a warning, instead of
    failing on the opt_state structure mismatch."""
    import dataclasses
    import warnings

    cfg_w = dataclasses.replace(CFG, optimizer="AdamW")
    state = train_lib.init_state(cfg_w)
    step = train_lib.make_train_step(cfg_w)
    x_imu, x_s, y = synth_batch()
    state, _ = step(state, x_imu, x_s, y)
    train_lib.save_checkpoint(str(tmp_path / "ckpt"), state, 1)

    # training resume stays fail-loud on the mismatch
    import pytest
    with pytest.raises(ValueError):
        train_lib.restore_checkpoint(str(tmp_path / "ckpt"), CFG)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        restored = train_lib.restore_checkpoint(str(tmp_path / "ckpt"), CFG,
                                                params_only=True)
    assert any("optimizer-state structure" in str(x.message) for x in w)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # fresh optimizer state matches the Adam template's structure
    t = train_lib.init_state(CFG)
    assert (jax.tree_util.tree_structure(restored.opt_state)
            == jax.tree_util.tree_structure(t.opt_state))


def test_device_sampler_matches_host_sampler_semantics():
    """data.make_window_sampler + device_sample_epoch realise the same
    distribution family as the host sampler (reference
    training_data_loader.py:43-58): per segment exactly k_i =
    clamp(round(n_i/rate), 1, n_i) distinct ends, none crossing segment
    bounds, globally shuffled; and different keys draw different epochs."""
    info = np.array([[0, 100, 10], [100, 130, 1]])
    T = 8
    sampler = data_lib.make_window_sampler(info, seq_len=T)
    # segment 1: n=91 -> k=9; segment 2: n=21 -> k=21 (same as the host
    # sampler's counts, test_window_sampler_semantics)
    assert sampler.n_select == 9 + 21
    NB, B = 5, 6                        # need 30 = n_select
    ends = np.asarray(data_lib.device_sample_epoch(
        sampler, jax.random.PRNGKey(0), NB, B)).reshape(-1)
    assert len(ends) == 30 and len(set(ends.tolist())) == 30
    seg1 = ends[ends < 100]
    seg2 = ends[ends >= 100]
    assert len(seg1) == 9 and len(seg2) == 21
    assert ((seg1 >= T) & (seg1 <= 98)).all()
    assert ((seg2 >= 100 + T) & (seg2 <= 128)).all()
    ends2 = np.asarray(data_lib.device_sample_epoch(
        sampler, jax.random.PRNGKey(1), NB, B)).reshape(-1)
    assert not np.array_equal(np.sort(ends[ends < 100]),
                              np.sort(ends2[ends2 < 100])) or \
        not np.array_equal(ends, ends2)


def test_epoch_fn_with_device_sampler_runs_and_is_deterministic():
    """make_epoch_fn(sampler=...): the whole epoch — window sampling
    included — is one compiled program, a pure function of the train
    state (resume-exactness for free)."""
    N = 96
    info = np.array([[0, N, 1]], dtype=np.int64)
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=info,
    )
    T, B = 8, 4
    cfg = train_lib.TrainConfig(model=TINY, batch_size=B, seq_len=T,
                                noise_input_hist=0.0, seed=0)
    sampler = data_lib.make_window_sampler(info, T)
    NB = sampler.n_select // B
    dds = data_lib.to_device(ds)
    epoch_fn = train_lib.make_epoch_fn(cfg, dds, sampler=sampler,
                                       n_batches=NB)
    s1, aux1 = epoch_fn(train_lib.init_state(cfg))
    s1b, aux1b = epoch_fn(train_lib.init_state(cfg))
    assert int(s1.step) == NB
    assert np.isfinite(np.asarray(aux1["loss"])).all()
    np.testing.assert_array_equal(np.asarray(aux1["loss"]),
                                  np.asarray(aux1b["loss"]))
    # the next epoch draws a different schedule (rng advanced in-state)
    s2, aux2 = epoch_fn(s1)
    assert not np.array_equal(np.asarray(aux2["loss"]),
                              np.asarray(aux1["loss"]))


def test_epoch_fn_with_device_sampler_sharded_runs():
    """Device-sampled epoch over the (data, model) mesh compiles and runs
    (the sampled ends get the batch sharding constraint)."""
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    N = 64
    info = np.array([[0, N, 1]], dtype=np.int64)
    ds = data_lib.PackedDataset(
        imu=RNG.normal(size=(N, 72)).astype(np.float32),
        acc_sum=RNG.normal(size=(N, 18)).astype(np.float32),
        s=RNG.normal(size=(N, 131)).astype(np.float32),
        info=info,
    )
    cfg = train_lib.TrainConfig(model=TINY, batch_size=8, seq_len=8,
                                noise_input_hist=0.0, seed=0)
    sampler = data_lib.make_window_sampler(info, 8)
    NB = sampler.n_select // 8
    dds = data_lib.to_device(ds, sharding=mesh_lib.replicated(mesh))
    state = train_lib.shard_state(train_lib.init_state(cfg), mesh)
    epoch_fn = train_lib.make_epoch_fn(cfg, dds, mesh=mesh, sampler=sampler,
                                       n_batches=NB)
    state, aux = epoch_fn(state)
    assert np.isfinite(np.asarray(aux["loss"])).all()
    assert int(state.step) == NB
