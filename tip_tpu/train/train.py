"""pjit data-parallel training of the TIP state predictor.

Reference recipe (train_model.py:21-74,129-217 and README step 4): Adam(W),
cosine LR stepped per *batch* with T_max = epochs + 850, grad-clip 5.0,
uniform history-noise injection, per-epoch window re-sampling, loss =
jerk + pose/root-vel + SBP.  Re-designed for TPU:

  * one jitted train step over a (data, model) mesh: batch sharded over
    ``data``, params replicated (or tensor-sharded over ``model``); gradient
    all-reduce is inserted by the XLA partitioner;
  * full training state (params + optimizer moments + step + PRNG key)
    checkpointed with orbax for exact resume — fixing the reference's
    weights-only checkpoints ("TODO: better also to load Adam state",
    train_model.py:109-111);
  * bf16 matmuls optional via ModelConfig dtype at call sites (f32 default).
"""

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import numpy as np
import optax
from flax import struct

from tip_tpu.models import losses as L
from tip_tpu.models import tip_model as M
from tip_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: M.ModelConfig = M.ModelConfig()
    n_sbps: int = 5
    batch_size: int = 256
    seq_len: int = 40
    lr: float = 1e-4
    optimizer: str = "Adam"            # or "AdamW"
    weight_decay: float = 1e-4
    clip: float = 5.0
    epochs: int = 1100
    cosine_lr: bool = True
    cosine_extra: int = 850            # T_max = epochs + cosine_extra
    noise_input_hist: float = 0.15
    seed: int = 5104
    log_interval: int = 100
    # "threefry" (jax default, reproducible across backends) | "rbg" (TPU
    # hardware generator; the 16 dropout masks per step cost ~6 ms in
    # threefry at the paper batch size — rbg reclaims a third of that)
    dropout_rng_impl: str = "threefry"


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray      # () int32 — per-batch updates so far
    rng: jax.Array


def lr_schedule(cfg: TrainConfig):
    """torch CosineAnnealingLR semantics with eta_min=0, stepped per batch:
    lr(t) = lr0 * (1 + cos(pi * t / T_max)) / 2 — periodic beyond T_max,
    exactly as the reference's per-batch stepping produces."""
    t_max = cfg.epochs + cfg.cosine_extra

    def sched(step):
        if not cfg.cosine_lr:
            return cfg.lr
        return cfg.lr * (1.0 + jnp.cos(jnp.pi * step / t_max)) / 2.0

    return sched


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    if cfg.optimizer == "AdamW":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        opt = optax.adam(sched)
    chain = [opt]
    if cfg.clip > 0:
        chain = [optax.clip_by_global_norm(cfg.clip)] + chain
    return optax.chain(*chain)


def init_state(cfg: TrainConfig, key: Optional[jax.Array] = None) -> TrainState:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(key)
    params = M.init_params(k_init, cfg.model)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), rng=k_run)


def loss_fn(params, x_imu, x_s, y, rng, cfg: TrainConfig):
    """Composite loss (reference train_model.py:152-187)."""
    if cfg.dropout_rng_impl == "rbg":
        data = jax.random.key_data(rng)        # (2,) uint32 threefry data
        rng = jax.random.wrap_key_data(jnp.concatenate([data, data]),
                                       impl="rbg")
    k_noise, k_model = jax.random.split(rng)
    noise = (jax.random.uniform(k_noise, x_s.shape, x_s.dtype)
             - 0.5) * (2.0 * cfg.noise_input_hist)
    y_pred = M.forward(params, x_imu, x_s + noise, cfg.model,
                       train=True, rng=k_model)

    nc = cfg.n_sbps * 4
    l_jerk = L.loss_jerk(y_pred[:, :, :-3 - nc])
    yp = y_pred.reshape(-1, y_pred.shape[-1])
    yt = y.reshape(-1, y.shape[-1])
    l_q = L.loss_q_only_2axis(yt[:, :-nc], yp[:, :-nc])
    l_c = L.loss_constr_multi(yt[:, -nc:], yp[:, -nc:], cfg.n_sbps)
    total = l_q + l_c + l_jerk
    return total, {"loss": total, "loss_q": l_q, "loss_c": l_c,
                   "loss_jerk": l_jerk}


def _mesh_safe(cfg: TrainConfig, mesh) -> TrainConfig:
    """Pallas kernels have no SPMD partitioning rule, so under a mesh the
    fused-RNN training path would be replicated (or rejected) by GSPMD;
    fall back to the scan — its gradients are bit-identical to the kernel's
    (tests/test_pallas_kernels.py), so this changes speed only."""
    if mesh is not None and (cfg.model.rnn_impl == "pallas"
                             or cfg.model.encoder_impl == "pallas"):
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, rnn_impl="scan",
                                           encoder_impl="xla"))
    return cfg


def make_train_step(cfg: TrainConfig, mesh=None, device_data=None):
    """Jitted train step; with a mesh, the batch shards over the data axis and
    params follow parallel.mesh.param_shardings.

    device_data: optional train.data.DeviceDataset — the step then takes
    (state, ends) and gathers the teacher-forced windows IN the compiled
    program (host->device per step: a (B,) index vector instead of the
    materialised ~14 MB batch; the host-side gather was the measured
    training input bottleneck, PERF.md)."""
    from tip_tpu.train import data as data_lib

    cfg = _mesh_safe(cfg, mesh)
    opt = make_optimizer(cfg)

    def step_fn(state: TrainState, x_imu, x_s, y):
        rng, sub = jax.random.split(state.rng)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x_imu, x_s, y, sub, cfg)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        aux["lr"] = lr_schedule(cfg)(state.step)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, rng=rng), aux

    bs = mesh_lib.batch_sharding(mesh) if mesh is not None else None

    if device_data is not None:
        def gathered_step(state, ends):
            if bs is not None:
                ends = jax.lax.with_sharding_constraint(ends, bs)
            x_imu, x_s, y = data_lib.device_gather(device_data, ends,
                                                   cfg.seq_len)
            return step_fn(state, x_imu, x_s, y)

        if mesh is None:
            return jax.jit(gathered_step)
        return jax.jit(gathered_step, in_shardings=(None, bs))

    if mesh is None:
        return jax.jit(step_fn)

    def sharded_step(state, x_imu, x_s, y):
        x_imu = jax.lax.with_sharding_constraint(x_imu, bs)
        x_s = jax.lax.with_sharding_constraint(x_s, bs)
        y = jax.lax.with_sharding_constraint(y, bs)
        return step_fn(state, x_imu, x_s, y)

    return jax.jit(sharded_step, in_shardings=(None, bs, bs, bs))


def make_epoch_fn(cfg: TrainConfig, device_data, mesh=None, sampler=None,
                  n_batches=None):
    """Whole-epoch training as ONE compiled program.

    With the blobs in HBM (data.DeviceDataset), an epoch is a lax.scan of
    the train step over the epoch's (n_batches, B) window-end indices — one
    dispatch per epoch instead of one per batch, removing every host round
    trip from the hot loop. The reference re-materialises its sampled
    windows on the host every epoch (training_data_loader.py:43-58).

    The non-finite-loss guard (train_loop's failure detection) moves inside
    the scan: a poisoned update is dropped on-device and reported in the
    stacked aux as ``skipped``.

    Returns epoch_fn(state, ends (n, B) int32) -> (state, aux) with aux
    leaves stacked over batches.

    sampler: optional data.WindowSampler (with n_batches) — the epoch's
    window-end indices are then drawn INSIDE the compiled program from the
    train state's own PRNG (split once per epoch before the batch scan),
    and the returned function is epoch_fn(state) -> (state, aux). Nothing
    crosses the host boundary per epoch, so wall time == device time, and
    resume-exactness is automatic (the schedule is a pure function of the
    checkpointed rng).
    """
    from tip_tpu.train import data as data_lib

    cfg = _mesh_safe(cfg, mesh)
    opt = make_optimizer(cfg)
    bs = mesh_lib.batch_sharding(mesh) if mesh is not None else None

    def body(state, ends):
        if bs is not None:
            ends = jax.lax.with_sharding_constraint(ends, bs)
        x_imu, x_s, y = data_lib.device_gather(device_data, ends,
                                               cfg.seq_len)
        rng, sub = jax.random.split(state.rng)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x_imu, x_s, y, sub, cfg)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = TrainState(params=params, opt_state=opt_state,
                         step=state.step + 1, rng=rng)
        ok = jnp.isfinite(aux["loss"])
        kept = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new,
            TrainState(params=state.params, opt_state=state.opt_state,
                       step=state.step, rng=rng))
        aux["grad_norm"] = optax.global_norm(grads)
        aux["lr"] = lr_schedule(cfg)(state.step)
        aux["skipped"] = ~ok
        return kept, aux

    es = (NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
          if mesh is not None else None)

    if sampler is not None:
        assert n_batches is not None, "sampler requires n_batches"
        from tip_tpu.train import data as sdata

        def epoch_sampled(state):
            k_sample, rng = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            ends = sdata.device_sample_epoch(sampler, k_sample, n_batches,
                                             cfg.batch_size)
            if es is not None:
                ends = jax.lax.with_sharding_constraint(ends, es)
            return jax.lax.scan(body, state, ends)

        return jax.jit(epoch_sampled)

    def epoch_fn(state, ends):
        return jax.lax.scan(body, state, ends)

    if mesh is None:
        return jax.jit(epoch_fn)
    return jax.jit(epoch_fn, in_shardings=(None, es))


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place params per the TP sharding rules; optimizer moments (any
    opt-state subtree with the params' structure, e.g. Adam's mu/nu) follow
    the same shardings; everything else replicates."""
    p_shard = mesh_lib.param_shardings(mesh, state.params)
    rep = mesh_lib.replicated(mesh)
    p_struct = jax.tree_util.tree_structure(state.params)

    def place(o):
        if hasattr(o, "_fields"):                       # optax NamedTuple state
            return type(o)(*[place(getattr(o, f)) for f in o._fields])
        if isinstance(o, tuple):                        # chain state
            return tuple(place(e) for e in o)
        if jax.tree_util.tree_structure(o) == p_struct:
            return jax.device_put(o, p_shard)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), o)

    return TrainState(params=jax.device_put(state.params, p_shard),
                      opt_state=place(state.opt_state),
                      step=jax.device_put(state.step, rep),
                      rng=jax.device_put(state.rng, rep))


# ---------------------------------------------------------------------------
# checkpointing (orbax): full state, resume-exact
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    max_to_keep: int = 4):
    """Save full train state; retain only the newest ``max_to_keep`` steps
    (a 1100-epoch run otherwise accretes ~1.8 GB of 25-epoch snapshots —
    resume only ever reads the latest)."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep)) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step, "rng": state.rng}))
        mngr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, cfg: TrainConfig,
                       step: Optional[int] = None,
                       params_only: bool = False) -> TrainState:
    """Restore a TrainState. Training resume is fail-loud: every stored
    structure must match the config. ``params_only=True`` (inference
    consumers — cli/evaluate, cli/live_demo, cli/serve, warm starts) also
    accepts checkpoints whose OPTIMIZER-state structure differs (e.g. an
    AdamW checkpoint opened by an Adam-configured tool), restoring
    params/step/rng with a fresh optimizer state; a params-structure
    mismatch still raises."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    template = init_state(cfg)
    with ocp.CheckpointManager(
            ckpt_dir, item_handlers=ocp.StandardCheckpointHandler()) as mngr:
        step = step if step is not None else mngr.latest_step()
        try:
            restored = mngr.restore(step, args=ocp.args.StandardRestore(
                {"params": template.params, "opt_state": template.opt_state,
                 "step": template.step, "rng": template.rng}))
        except ValueError as e:
            if "not compatible with the stored shape" in str(e):
                raise ValueError(
                    f"checkpoint at {ckpt_dir} does not match the model "
                    f"config (size_s={cfg.model.size_s}, with_acc_sum="
                    f"{cfg.model.with_acc_sum}) — check the --five_sbp / "
                    f"--with_acc_sum flags used at training time. "
                    f"Original error: {e}") from e
            if "w_qkv" in str(e) and "MISSING" in str(e):
                raise ValueError(
                    f"checkpoint at {ckpt_dir} uses the old packed-qkv "
                    f"parameter layout; current checkpoints store q/k/v "
                    f"separately (head-clean tensor parallelism). Re-export "
                    f"the weights or retrain. Original error: {e}") from e
            if params_only and "tree structures do not match" in str(e):
                # Structure-free restore. A bare mngr.restore(step) would
                # replay the STORED shardings, which names the training
                # devices — a TPU-trained checkpoint then fails to open on
                # a CPU-only serving host ("Device TPU v5 lite0 was not
                # found"). Rebuild abstract targets from the on-disk
                # metadata with host-local placement instead, so inference
                # consumers stay device-portable.
                meta = mngr.item_metadata(step)
                meta_tree = getattr(meta, "tree", meta)
                host = jax.sharding.SingleDeviceSharding(
                    jax.local_devices()[0])
                raw = mngr.restore(step, args=ocp.args.StandardRestore(
                    jax.tree.map(
                        lambda mm: jax.ShapeDtypeStruct(
                            mm.shape, mm.dtype, sharding=host),
                        meta_tree)))
                if (jax.tree_util.tree_structure(raw["params"])
                        != jax.tree_util.tree_structure(template.params)):
                    # it wasn't (just) the optimizer: the model
                    # architecture differs — fail loud, never hand back
                    # wrong-architecture params
                    raise ValueError(
                        f"checkpoint at {ckpt_dir} stores a different "
                        f"PARAMETER structure than the model config — "
                        f"check tf_layers/with_rnn/size_s. Original "
                        f"error: {e}") from e
                # structure matching is not enough: a checkpoint with BOTH a
                # different optimizer and different param shapes (e.g. wrong
                # size_s) would otherwise sail through and fail later with a
                # confusing downstream shape error
                shape_mism = []

                def _chk_shape(path, raw_leaf, tmpl_leaf):
                    if tuple(jnp.shape(raw_leaf)) != tuple(tmpl_leaf.shape):
                        shape_mism.append(
                            f"params{jax.tree_util.keystr(path)}: checkpoint "
                            f"{tuple(jnp.shape(raw_leaf))} vs model "
                            f"{tuple(tmpl_leaf.shape)}")
                jax.tree_util.tree_map_with_path(
                    _chk_shape, raw["params"], template.params)
                if shape_mism:
                    raise ValueError(
                        f"checkpoint at {ckpt_dir} stores parameters whose "
                        f"SHAPES do not match the model config — check "
                        f"size_s/tf_in_dim/rnn_nhid flags. Mismatches: "
                        + "; ".join(shape_mism[:5])) from e
                import warnings
                warnings.warn(
                    f"checkpoint at {ckpt_dir} stores a different "
                    f"optimizer-state structure than "
                    f"TrainConfig(optimizer={cfg.optimizer!r}); restoring "
                    f"params/step/rng only (fresh optimizer state).",
                    stacklevel=2)
                params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
                return TrainState(params=params,
                                  opt_state=template.opt_state,
                                  step=jnp.asarray(raw["step"]),
                                  rng=jnp.asarray(raw["rng"]))
            raise
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"], rng=restored["rng"])


def train_loop(cfg: TrainConfig, dataset, *, mesh=None, ckpt_dir=None,
               log_fn=print, max_epochs: Optional[int] = None,
               warm_start: Optional[str] = None,
               metrics_path: Optional[str] = None,
               gather_on_device: bool = False):
    """Full training driver (reference train_model.py:242-244 epoch loop).

    dataset: tip_tpu.train.data.PackedDataset. Returns the final TrainState.
    warm_start: orbax checkpoint dir or reference .pt file — loads weights
    only, like the reference's --warm_start (train_model.py:109-111); unlike
    it, resuming *with* optimizer state is also available via
    restore_checkpoint.
    metrics_path: jsonl file receiving every structured training record
    (utils.observability.MetricsWriter) — the reference logs by piping
    stdout prints to a file (README.md:103); here the metrics are
    structured and machine-readable.
    gather_on_device: upload the blobs to HBM once and gather the windows
    inside the compiled step (data.DeviceDataset) — per-step host traffic
    drops to the index vector. Requires the blobs to fit in device memory.
    """
    from tip_tpu.train import data as data_lib

    writer = None
    if metrics_path is not None:
        from tip_tpu.utils.observability import MetricsWriter
        writer = MetricsWriter(metrics_path)
        console_log = log_fn

        def log_fn(record):
            writer.write(**record)
            console_log(record)

    state = init_state(cfg)
    if warm_start:
        if warm_start.endswith(".pt"):
            import torch
            params = M.params_from_torch_state_dict(
                torch.load(warm_start, map_location="cpu"), cfg.model)
        else:
            params = restore_checkpoint(warm_start, cfg,
                                        params_only=True).params
        state = state.replace(params=params)
    if mesh is not None:
        state = shard_state(state, mesh)
    device_data = None
    if gather_on_device:
        rep = mesh_lib.replicated(mesh) if mesh is not None else None
        device_data = data_lib.to_device(dataset, sharding=rep)
    step_fn = make_train_step(cfg, mesh, device_data=device_data)
    np_rng = np.random.default_rng(cfg.seed)

    def batches():
        if device_data is not None:
            idx = data_lib.sample_epoch_indices(dataset.info, cfg.seq_len,
                                                np_rng)
            for b in range(len(idx) // cfg.batch_size):
                yield (jnp.asarray(
                    idx[b * cfg.batch_size:(b + 1) * cfg.batch_size],
                    jnp.int32),)
        else:
            for batch in data_lib.epoch_batches(dataset, cfg.seq_len,
                                                cfg.batch_size, np_rng):
                yield tuple(jnp.asarray(a) for a in batch)

    epochs = max_epochs if max_epochs is not None else cfg.epochs
    bad_steps = 0
    for ep in range(1, epochs + 1):
        running = []
        for bi, batch in enumerate(batches()):
            prev_state = state
            state, aux = step_fn(state, *batch)
            loss = float(aux["loss"])
            if not np.isfinite(loss):
                # failure detection: drop the poisoned update, keep training
                bad_steps += 1
                log_fn({"epoch": ep, "batch": bi + 1,
                        "event": "non_finite_loss_skipped",
                        "bad_steps": bad_steps})
                state = prev_state
                if bad_steps > 20:
                    raise FloatingPointError(
                        "training diverged: >20 non-finite losses")
                continue
            running.append(loss)
            if (bi + 1) % cfg.log_interval == 0:
                log_fn({"epoch": ep, "batch": bi + 1,
                        "loss": float(np.mean(running[-cfg.log_interval:])),
                        "lr": float(aux["lr"]),
                        "grad_norm": float(aux["grad_norm"])})
        if ckpt_dir and (ep == 1 or ep % 10 == 0):
            save_checkpoint(ckpt_dir, state, ep)
        log_fn({"epoch": ep, "mean_loss": float(np.mean(running)) if running
                else None})
    if ckpt_dir:
        save_checkpoint(ckpt_dir, state, epochs)
    if writer is not None:
        writer.close()
    return state
