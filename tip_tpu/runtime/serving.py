"""Batched multi-stream serving: hundreds of IMU streams on one chip.

New capability vs the reference (single stream per process, SURVEY.md §2.8):
the runner carry is a fixed pytree, so a pool of streams is just a
stacked carry with a per-slot active mask — one vmapped, jitted step serves
the whole pool per tick; stream add/remove only touches one slot on the host.
"""

import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu import constants as cst
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as runner_lib


class StreamPool:
    """Fixed-capacity pool of independent streaming sessions."""

    def __init__(self, params, cfg: runner_lib.RunnerConfig,
                 skel: Optional[kin.Skeleton] = None, capacity: int = 64,
                 dtype=jnp.float32, mesh=None, chunk: Optional[int] = None):
        """mesh: optional jax Mesh — shards the pool (and each tick's IMU
        batch) over the ``data`` axis so one pool spans a whole pod slice
        (SURVEY.md §2.8 multi-stream sharding). capacity must divide evenly.

        chunk: optionally process the pool in sub-batches of this size per
        tick (lax.map). With the O(1)-per-frame cache-mode buffers the
        batched fused path now scales monotonically through at least 2048
        streams (PERF.md), so the default (no chunking) is right for the kv
        modes; chunking remains useful for very large recompute-mode pools.
        Must divide capacity.
        """
        if mesh is not None and cfg.model.rnn_impl == "pallas":
            # pallas_call has no SPMD partitioning rule; under a meshed pool
            # the fused RNN would be replicated or rejected by GSPMD. The
            # scan is numerically identical (tests/test_pallas_kernels.py)
            # — same fallback as train._mesh_safe.
            import dataclasses
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, rnn_impl="scan"))
        self.cfg = cfg
        self.capacity = capacity
        if chunk is not None:
            assert capacity % chunk == 0, "chunk must divide capacity"
        self.chunk = chunk
        self.params = params
        self.skel = skel or kin.amass_skeleton(dtype=dtype)
        self._dtype = dtype
        self._mesh = mesh
        if mesh is not None:
            from tip_tpu.parallel import mesh as mesh_lib
            n_data = mesh.devices.shape[0]
            assert capacity % n_data == 0, "capacity must divide the data axis"
            self._batch_sharding = mesh_lib.batch_sharding(mesh)
        else:
            self._batch_sharding = None

        self.active = np.zeros(capacity, bool)
        # per-slot init poses, kept host-side so a failed donated tick can
        # rebuild the pool (see step)
        self._s_inits = np.zeros((capacity, 2 * cst.N_DOFS), np.float64)

        # pre-pack the fused-kernel weights ONCE: the per-tick dispatch has
        # no scan for XLA to hoist the cast+concat of every weight out of
        self._packed = runner_lib.pack_fused_weights(params, cfg, dtype)

        def one(params, packed, carry, imu_t, tick):
            return runner_lib.runner_step(params, carry, imu_t, cfg,
                                          self.skel, tick=tick,
                                          packed_ws=packed)

        # tick: () int32 global pool counter, shared (unbatched) across the
        # pool — the kv-cache global ring cursor (streaming_cache)
        vstep = jax.vmap(one, in_axes=(None, None, 0, 0, None))
        if chunk is not None and chunk < capacity:
            n_chunks = capacity // chunk

            def batched(params, packed, carries, imu, tick):
                cs = jax.tree_util.tree_map(
                    lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]),
                    carries)
                xs = imu.reshape(n_chunks, chunk, imu.shape[-1])
                cs2, out = jax.lax.map(
                    lambda args: vstep(params, packed, args[0], args[1],
                                       tick),
                    (cs, xs))
                unchunk = lambda a: a.reshape((capacity,) + a.shape[2:])
                return (jax.tree_util.tree_map(unchunk, cs2),
                        jax.tree_util.tree_map(unchunk, out))
        else:
            batched = vstep
        # donate the carries: the kv-cache rings are updated by a
        # dynamic-update-slice per tick, which XLA can only perform in place
        # on a donated input — otherwise every tick copies the full
        # (capacity, L, W, d) rings before writing one row
        if self._batch_sharding is not None:
            bs = self._batch_sharding
            self._step = jax.jit(batched,
                                 in_shardings=(None, None, bs, bs, None),
                                 out_shardings=(bs, bs), donate_argnums=(2,))
        else:
            self._step = jax.jit(batched, donate_argnums=(2,))
        self._tick = 0
        self._slot_init = jax.jit(
            lambda s: runner_lib.runner_init(cfg, self.skel, s, dtype))
        # one donated dispatch for a slot write: in-place dynamic-update per
        # leaf instead of ~17 eager whole-pool copies (slot is traced, so
        # adds don't recompile per slot)
        self._slot_write = jax.jit(
            lambda pool, fresh, slot: jax.tree_util.tree_map(
                lambda p, x: jax.lax.dynamic_update_index_in_dim(
                    p, x.astype(p.dtype), slot, 0), pool, fresh),
            donate_argnums=(0,))
        # step() donates the carries to the device (in-place ring updates),
        # which invalidates the previous buffers — concurrent add_stream
        # (e.g. the serve daemon's accept threads racing its ticker) must
        # not read the pre-step reference, so every carry mutation AND the
        # free-slot scan/claim are serialized here
        self._carries_lock = threading.Lock()
        self._carries = self._empty_pool()

    def _empty_pool(self):
        """Stacked zero-session carries, sharded when a mesh is set (used at
        construction and by the failed-tick rebuild)."""
        single = self._slot_init(jnp.zeros(2 * cst.N_DOFS, self._dtype))
        carries = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.capacity,) + x.shape).copy(),
            single)
        if self._batch_sharding is not None:
            carries = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._batch_sharding), carries)
        return carries

    def add_stream(self, s_init: np.ndarray) -> int:
        """Returns the slot id; raises if the pool is full. Thread-safe with
        respect to a concurrent step() and other add_stream calls."""
        fresh = self._slot_init(jnp.asarray(s_init, self._dtype))
        with self._carries_lock:
            free = np.flatnonzero(~self.active)
            if len(free) == 0:
                raise RuntimeError("stream pool full")
            slot = int(free[0])
            self._carries = self._slot_write(
                self._carries, fresh, jnp.asarray(slot, jnp.int32))
            self.active[slot] = True
            self._s_inits[slot] = np.asarray(s_init, np.float64)
        return slot

    def remove_stream(self, slot: int):
        # active[] is part of the lock-protected pool membership (a remove
        # racing add_stream's free-slot scan or a failed-tick rebuild must
        # not observe a half-updated membership)
        with self._carries_lock:
            self.active[slot] = False

    @property
    def n_active(self) -> int:
        return int(self.active.sum())

    def _rebuild_carries(self):
        """Recreate the pool state from the stored per-slot init poses.
        Active streams restart their sessions (smoothing warmup + fresh
        cache) — degraded but well-defined recovery."""
        carries = self._empty_pool()
        for slot in np.flatnonzero(self.active):
            fresh = self._slot_init(jnp.asarray(self._s_inits[slot],
                                                self._dtype))
            carries = self._slot_write(carries, fresh,
                                       jnp.asarray(int(slot), jnp.int32))
        self._carries = carries

    def step(self, imu_batch: np.ndarray) -> Dict[str, np.ndarray]:
        """One 60 Hz tick for every slot. imu_batch: (capacity, 72); rows of
        inactive slots are ignored (computed but discarded).

        The carries are DONATED to the tick (in-place ring updates), so a
        failed dispatch would otherwise leave the pool pointing at deleted
        buffers; on error the pool state is rebuilt from the per-slot init
        poses (active sessions restart) before re-raising, keeping the pool
        usable for the next tick."""
        with self._carries_lock:
            try:
                self._carries, out = self._step(
                    self.params, self._packed, self._carries,
                    jnp.asarray(imu_batch, self._dtype),
                    jnp.asarray(self._tick, jnp.int32))
            except Exception:
                self._rebuild_carries()
                raise
            self._tick += 1
        return out
