"""Streaming inference runtime — the product's core loop.

TPU-native re-design of the reference's ``RTRunnerMin``
(real_time_runner_minimal.py:19-200): instead of a Python object mutating
unbounded lists every frame, the runner is a pure function

    step : (params, carry, imu_t) -> (carry', out_t)

over a fixed-size pytree carry (ring buffers + scalars).  This makes it
  * jit-able: one compiled program per frame, no host round trips;
  * scan-able: offline evaluation = ``lax.scan`` over the IMU stream;
  * vmap-able: batched multi-stream serving = ``vmap`` over carries.

Numerics match the reference step for step once past warmup (tested against
a numpy transcription in tests/test_runner.py):

  frame pipeline (reference real_time_runner_minimal.py:114-200):
  1. raw ring: acc smoothed over an 11-frame centered window; orientation
     delayed 5 frames (fixed 5-frame algorithmic latency) (:59-76);
  2. per-frame root-local IMU features + running 40-frame acc-sum (:131-141);
  3. model forward over the (<=40)-frame window; left-aligned with the output
     read at the last valid index — exactly equal to the reference's
     variable-length window because attention is causal and the RNN head
     starts from zero (see tests/test_model.py);
  4. exponential output filter (0.6^k over last 6 raw outputs) (:87-112);
  5. state assembly: root ori from IMU0, root xyz integrated from predicted
     velocity, 2-frame pose blend (:154-167);
  6. FK + feet-SBP root-drift correction with flat-ground z (:169-194);
  7. history push for the next frame's autoregressive input (:196).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tip_tpu import constants as cst
from tip_tpu.models import tip_model as M
from tip_tpu.ops import imu as imu_ops
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import rotations as rot
from tip_tpu.ops import sbp as sbp_ops


@dataclass(frozen=True)
class RunnerConfig:
    model: M.ModelConfig = M.ModelConfig()
    n_sbps: int = 5
    window: int = 40                      # max_input_l
    imu_n_smooth: int = cst.IMU_N_SMOOTH  # 5
    with_acc_sum: bool = True
    dt: float = cst.DT
    # exponential output filter weights 0.6^[5..0] (reference :57)
    filter_len: int = 6
    # "xla": level-parallel fk (ops/kinematics.fk); "pallas": the whole
    # pose->frames pipeline as one kernel (kinematics.fk_bullet_fused) —
    # single-stream fast path, ~35 us -> ~5 us
    fk_impl: str = "xla"
    # "fused": stages 6-7 (FK + SBP root correction + history 6D re-encode)
    # as ONE Pallas op (ops/fused_tail.py) — subsumes fk_impl="pallas" and
    # additionally fuses the SBP/history chains; 5-SBP layout only. "xla"
    # keeps the reference-shaped op graph. "auto" (default since round 5):
    # fused on a real TPU backend with the 5-SBP layout — the deployed
    # product path matches the bench headline (ADVICE r4) — and xla
    # otherwise (CPU hosts would pay Pallas interpret mode; exotic layouts
    # are unsupported by the kernel). Resolution happens at trace time via
    # resolved_tail_impl, never silently for an explicit "fused".
    tail_impl: str = "auto"
    # "recompute": windowed forward every frame (reference semantics);
    # "kv_cache": per-layer K/V rings, only the newest token runs through
    # the encoder (exact while the window grows; documented divergence once
    # it slides — runtime.streaming_cache); "kv_cache_rnn_carry": same plus
    # a carried RNN hidden (one RNN step/frame instead of a 40-step replay).
    serving_mode: str = "recompute"

    def __post_init__(self):
        # the per-frame acc-sum equals the sum over the model window only
        # when the two lengths coincide (reference constants: both 40)
        assert self.window == cst.ACC_SUM_WIN_LEN or not self.with_acc_sum, (
            "acc-sum feature requires window == ACC_SUM_WIN_LEN")
        assert self.tail_impl != "fused" or self.n_sbps == 5, (
            "tail_impl='fused' supports the 5-SBP layout only")

    @property
    def resolved_tail_impl(self) -> str:
        """'auto' -> 'fused' iff the kernel applies (5-SBP layout) and the
        backend is a real TPU; explicit values pass through unchanged."""
        if self.tail_impl != "auto":
            return self.tail_impl
        import jax
        on_tpu = jax.default_backend() == "tpu"
        return "fused" if (on_tpu and self.n_sbps == 5) else "xla"

    @property
    def smooth_win(self) -> int:
        return 2 * self.imu_n_smooth + 1   # 11

    @property
    def state_dim(self) -> int:
        return cst.state_dim(self.n_sbps)  # 131 for 5 SBPs


def _filter_coeff(cfg: RunnerConfig, dtype):
    return jnp.asarray(0.6 ** np.arange(cfg.filter_len)[::-1], dtype)


def _is_cached(cfg: RunnerConfig) -> bool:
    return cfg.serving_mode != "recompute"


@struct.dataclass
class RunnerCarry:
    """Fixed-shape runner state. All buffers are time-major rings.

    The big window buffers are mode-dependent (cfg is static, so each mode
    compiles its own layout). The recompute forward needs the full
    chronological windows; the kv-cache modes only ever read the newest
    history entry and the 40-frame-old acc, so they keep O(1)-write
    structures instead of O(window) shift-left pushes — the dominant
    non-model HBM traffic of batched cached serving (PERF.md):

      field        recompute                       kv-cache modes
      imu_win      (40, 72) features, left-aligned (40, 18) circular acc ring
      accsum_win   (40, 18) acc-sum, left-aligned  None
      s_and_c_win  (40, state_dim), left-aligned   (state_dim,) newest entry
      out_buf      (6, state_dim), newest last     (6, state_dim) circular
    """
    t: jnp.ndarray                 # () int32 — frames seen so far
    raw_imu: jnp.ndarray           # (11, 72) raw ring, newest last
    k: jnp.ndarray                 # () int32 — valid smoothed frames (<= 40)
    imu_win: jnp.ndarray           # see class docstring
    accsum_win: Optional[jnp.ndarray]  # acc-sum features (unscaled)
    acc_runsum: jnp.ndarray        # (18,) running 40-frame local-acc sum
    s_and_c_win: jnp.ndarray       # autoregressive history
    out_buf: jnp.ndarray           # (6, state_dim) raw outputs for the filter
    n_out: jnp.ndarray             # () int32 — outputs produced so far
    last_s: jnp.ndarray            # (114,) previous assembled state
    prev_pq: jnp.ndarray           # (20, 7) previous FK frames
    prev_root: jnp.ndarray         # (3,) previous root xyz (post-correction)
    c_locs: jnp.ndarray            # (n_sbps, 3)
    s_init: jnp.ndarray            # (114,) initial state (warmup output)
    cache: Optional["jnp.ndarray"] = None   # streaming_cache.KVCache when
    #                                         serving_mode != "recompute"


def state_to_history(s, c, n_sbps: int):
    """(114,) state + (n_sbps*4,) SBP vector -> (state_dim,) history entry.

    Reference record_state_aa_and_c (real_time_runner_minimal.py:78-85):
    channels [root_aa + 17 joint aa] as two-axis 6D (108) + root velocity (3)
    + SBP vector.
    """
    aa = s[3:3 + 54].reshape(18, 3)
    sixd = rot.aa_to_sixd(aa).reshape(108)
    root_v = s[cst.N_DOFS:cst.N_DOFS + 3]
    return jnp.concatenate([sixd, root_v, c])


def runner_init(cfg: RunnerConfig, skel: kin.Skeleton, s_init,
                dtype=jnp.float32) -> RunnerCarry:
    s_init = jnp.asarray(s_init, dtype)
    sd = cfg.state_dim
    hist0 = state_to_history(s_init, jnp.zeros(cfg.n_sbps * 4, dtype), cfg.n_sbps)
    pq0 = kin.fk_our_state(skel, s_init)
    cache = None
    if _is_cached(cfg):
        from tip_tpu.runtime import streaming_cache as SC
        cache = SC.cache_init(cfg.model, cfg.window, dtype)
        # O(1)-write buffers (see RunnerCarry docstring)
        imu_win = jnp.zeros((cfg.window, cst.ACC_SUM_DIM), dtype)
        accsum_win = None
        s_and_c = hist0
    else:
        imu_win = jnp.zeros((cfg.window, cst.IMU_DIM), dtype)
        accsum_win = jnp.zeros((cfg.window, cst.ACC_SUM_DIM), dtype)
        s_and_c = jnp.zeros((cfg.window, sd), dtype).at[0].set(hist0)
    return RunnerCarry(
        cache=cache,
        t=jnp.zeros((), jnp.int32),
        raw_imu=jnp.zeros((cfg.smooth_win, cst.IMU_DIM), dtype),
        k=jnp.zeros((), jnp.int32),
        imu_win=imu_win,
        accsum_win=accsum_win,
        acc_runsum=jnp.zeros((cst.ACC_SUM_DIM,), dtype),
        s_and_c_win=s_and_c,
        out_buf=jnp.zeros((cfg.filter_len, sd), dtype),
        n_out=jnp.zeros((), jnp.int32),
        last_s=s_init,
        prev_pq=pq0.astype(dtype),
        prev_root=s_init[:3],
        c_locs=jnp.full((cfg.n_sbps, 3), 100.0, dtype),
        s_init=s_init,
    )


def _push_left_aligned(win, k, x, window: int):
    """Append x to a left-aligned ring: write at slot k while k < window,
    else shift left and write at the end."""
    shifted = jnp.roll(win, -1, axis=0).at[window - 1].set(x)
    grown = win.at[jnp.minimum(k, window - 1)].set(x)
    return jnp.where(k < window, grown, shifted)


def _ring_push(buf, cursor, new_row, write_gate):
    """Circular-buffer push shared by the cache-mode acc ring and output-
    filter ring: read the old row at the cursor, write back either the new
    row or (when gated off) the old row — one dynamic-update-slice instead
    of an O(rows) shift. Returns (old_row, new_buf, slot)."""
    slot = jnp.asarray(cursor, jnp.int32) % buf.shape[0]
    zero = jnp.zeros((), jnp.int32)
    old_row = jax.lax.dynamic_slice(
        buf, (slot, zero), (1, buf.shape[1]))[0]
    row = jnp.where(write_gate, new_row, old_row)
    return old_row, jax.lax.dynamic_update_slice(buf, row[None], (slot, zero)), slot


def push_history(cfg: RunnerConfig, old_win, k_new, hist, active):
    """Append a history entry per the mode's layout (RunnerCarry docstring):
    recompute keeps the chronological left-aligned window the dense forward
    consumes; the cached modes only ever read the NEWEST entry, stored as a
    bare vector."""
    if _is_cached(cfg):
        return jnp.where(active, hist, old_win)
    return jnp.where(active, _push_left_aligned(old_win, k_new, hist,
                                                cfg.window), old_win)


class SensedFrame(tuple):
    """(raw, k_new, imu_win, accsum_win, acc_runsum, out_buf, n_out, active,
    s_t, c_t, cache) — output of the shared sensing/prediction front-end."""
    __slots__ = ()


def sense_and_predict(params, carry: RunnerCarry, cur_imu, cfg: RunnerConfig,
                      rng: Optional[jax.Array] = None, tick=None,
                      packed_ws=None):
    """Stages 1-5 shared by the minimal and full runners: raw-ring smoothing,
    local features + acc-sum, model forward, output filter, state assembly.
    Returns (buffer updates…, active flag, assembled s_t, SBP vector c_t).

    tick: optional () int32 GLOBAL pool tick for kv-cache serving — every
    stream of a synchronously-ticking pool then writes the same cache slot,
    so vmap lowers the ring update to one dynamic-update-slice instead of a
    per-stream scatter (see streaming_cache.cached_forward_step).

    packed_ws: optional pre-packed fused-kernel weights
    (ops.fused_forward.pack_weights, see pack_fused_weights). Packing is a
    cast+concat of every weight matrix: hoisted out of a lax.scan by XLA
    automatically, but a per-tick jit dispatch (StreamPool.step) would
    re-pack ~MBs every 60 Hz tick without this."""
    dtype = carry.imu_win.dtype
    cur_imu = jnp.asarray(cur_imu, dtype)
    n_sbps = cfg.n_sbps
    W = cfg.window

    # ---- 1. raw ring + smoothing (ref :59-76) --------------------------------
    first = carry.t == 0
    raw = jnp.where(first,
                    jnp.broadcast_to(cur_imu, carry.raw_imu.shape),
                    jnp.roll(carry.raw_imu, -1, axis=0).at[-1].set(cur_imu))
    # smoothed frame available from t >= imu_n_smooth
    have_smoothed = carry.t >= cfg.imu_n_smooth
    ori = raw[cfg.imu_n_smooth, :54]                  # 5-frame-delayed orientations
    acc = jnp.mean(raw[:, 54:72], axis=0)             # 11-frame average
    smoothed = jnp.concatenate([ori, acc])

    # ---- 2. per-frame local features + acc-sum (ref :131-141) ---------------
    local = imu_ops.imu_rotate_to_local(smoothed[None])[0]
    win_full = carry.k >= W
    k_new = jnp.where(have_smoothed, carry.k + 1, carry.k)
    if _is_cached(cfg):
        # circular acc ring: the only window read the cached modes need is
        # the 40-frame-old acc leaving the running sum. Cursor = global pool
        # tick when provided (all streams then write the same slot — one
        # dynamic-update-slice under vmap instead of a scatter), else the
        # per-stream smoothed count; either walks consecutive slots, so the
        # pre-write read at the cursor is exactly the entry W pushes ago.
        cur = tick if tick is not None else carry.k
        evicted, imu_win, _ = _ring_push(carry.imu_win, cur, local[54:72],
                                         have_smoothed)
        runsum = carry.acc_runsum + local[54:72] \
            - jnp.where(win_full, evicted, 0.0)
        accsum_win = None
    else:
        evicted = carry.imu_win[0, 54:72]             # leaves 40-window on push
        runsum = carry.acc_runsum + local[54:72] \
            - jnp.where(win_full, evicted, 0.0)
        imu_win = jnp.where(have_smoothed,
                            _push_left_aligned(carry.imu_win, carry.k, local, W),
                            carry.imu_win)
        accsum_win = jnp.where(
            have_smoothed,
            _push_left_aligned(carry.accsum_win, carry.k, runsum, W),
            carry.accsum_win)
    acc_runsum = jnp.where(have_smoothed, runsum, carry.acc_runsum)

    active = k_new >= 1          # model has at least one frame

    # ---- 3. model forward (ref :143-150) -------------------------------------
    cache = carry.cache
    if _is_cached(cfg):
        # KV-cached streaming: only the newest token runs the encoder
        # (runtime.streaming_cache; exact while the window grows)
        assert rng is None, "kv-cache serving is inference-only"
        from tip_tpu.runtime import streaming_cache as SC
        hist_t = carry.s_and_c_win               # newest entry (cache layout)
        parts = [local]
        if cfg.with_acc_sum:
            parts.append(runsum / cst.ACC_SUM_DOWN_SCALE)
        x_token = jnp.concatenate(parts + [hist_t])
        rnn_carry = cfg.serving_mode == "kv_cache_rnn_carry"
        if cfg.model.forward_impl == "fused":
            # whole cached step as ONE Pallas op (in-place ring updates;
            # the commit flag replaces the warmup copy-on-select). Under
            # the pool's vmap with a global tick this dispatches to the
            # BATCHED kernel via custom_vmap (streaming_cache).
            if packed_ws is not None:
                packed = tuple(packed_ws)
            else:
                from tip_tpu.ops import fused_forward as FF
                packed = tuple(FF.pack_weights(params, cfg.model,
                                               dtype=carry.cache.enc.dtype))
            step = SC.auto_fused_step(cfg.model, rnn_carry,
                                      jax.default_backend() != "tpu")
            slot = (tick if tick is not None else carry.k) % W
            cache, y_t = step(packed, carry.cache, x_token,
                              jnp.asarray(slot, jnp.int32), have_smoothed)
        else:
            # commit (the smoothed-frame flag) gates the written rows inside
            # the step — no full-cache copy-on-select out here
            cache, y_t = SC.cached_forward_step(
                params, carry.cache, x_token, carry.k, cfg.model,
                rnn_carry=rnn_carry, slot_override=tick,
                commit=have_smoothed)
        y_t = y_t.astype(dtype)
    else:
        last_idx = jnp.maximum(k_new - 1, 0)
        x_imu = imu_win
        if cfg.with_acc_sum:
            x_imu = jnp.concatenate(
                [imu_win, accsum_win / cst.ACC_SUM_DOWN_SCALE], axis=-1)
        if cfg.model.forward_impl == "fused":
            # whole-model Pallas kernel, single-output fast path
            # (ops/fused_forward.fused_forward_last) — inference only
            assert rng is None, "fused forward_impl is inference-only"
            from tip_tpu.ops import fused_forward as FF
            if packed_ws is not None:
                packed = tuple(packed_ws)
            else:
                pack_dtype = jnp.dtype(cfg.model.compute_dtype
                                       or jnp.bfloat16)
                packed = tuple(FF.pack_weights(params, cfg.model,
                                               dtype=pack_dtype))
            x_full = jnp.concatenate([x_imu, carry.s_and_c_win], axis=-1)
            # custom_vmap: single stream -> fused_forward_last; under the
            # serving pool's vmap the whole tick dispatches to the batched
            # exact-recompute kernels (FF.fused_recompute_batch)
            step = FF.auto_fused_last(cfg.model,
                                      jax.default_backend() != "tpu")
            y_t = step(packed, x_full, last_idx).astype(dtype)
        else:
            y = M.forward(params, x_imu[None], carry.s_and_c_win[None],
                          cfg.model, rng=rng, train=rng is not None)
            y_t = y[0, last_idx]                       # (state_dim,)

    # ---- 4. exponential output filter (ref :87-112) --------------------------
    coeff = _filter_coeff(cfg, dtype)
    if _is_cached(cfg):
        # circular: one row write instead of an O(filter_len) roll (cursor
        # logic mirrors the acc ring above). The filter sum gathers the ring
        # into chronological order first so the f64 summation order — and
        # therefore the bit-exact parity with the recompute mode — is
        # preserved.
        nf = cfg.filter_len
        ocur = tick if tick is not None else carry.n_out
        _, out_buf, oslot = _ring_push(carry.out_buf, ocur, y_t, active)
        order = (oslot + 1 + jnp.arange(nf, dtype=jnp.int32)) % nf
        filt_view = out_buf[order]                     # oldest..newest
    else:
        out_buf = jnp.where(active,
                            jnp.roll(carry.out_buf, -1, axis=0).at[-1].set(y_t),
                            carry.out_buf)
        filt_view = out_buf
    n_out = jnp.where(active, carry.n_out + 1, carry.n_out)
    if cfg.resolved_tail_impl == "fused":
        # decode-front kernel: filter + SBP decode + all 6D->quat decodes in
        # one op (ops/fused_tail.decode_fused); only the arctan2 step
        # (q -> axis-angle, no Mosaic lowering) stays in XLA.
        from tip_tpu.ops import fused_tail as FT
        dec = FT.decode_fused(y_t, filt_view, coeff,
                              n_out >= cfg.filter_len, local[:9],
                              filter_len=cfg.filter_len, n_sbps=n_sbps,
                              interpret=jax.default_backend() != "tpu")
        y_f = dec.y_f
        c_t = dec.c_t.reshape(-1)
        aa18 = rot.q_to_aa(dec.q_rows)             # (18, 3)
        root_aa = aa18[0]
        st_aa = aa18.reshape(54)                   # row 0 unused below
    else:
        y_smooth = jnp.sum(filt_view * coeff[:, None], axis=0) / jnp.sum(coeff)
        y_f = jnp.where(n_out >= cfg.filter_len, y_smooth, y_t)

        st_2axis = y_f[:-n_sbps * 4 - 3]               # (108,)
        c_t = y_f[-n_sbps * 4:]
        flags = (c_t[0::4] > 0.0).astype(dtype)
        offs = c_t.reshape(n_sbps, 4)[:, 1:] / 5.0
        c_t = jnp.concatenate([flags[:, None], offs], axis=1).reshape(-1)

        # ---- 5. state assembly (ref :154-167) ---------------------------------
        st_aa = rot.sixd_to_aa(st_2axis.reshape(18, 6)).reshape(54)
        root_aa = rot.matrix_to_aa(local[:9].reshape(3, 3))
    root_v = y_f[108:111]
    s_t = jnp.zeros(2 * cst.N_DOFS, dtype)
    s_t = s_t.at[cst.N_DOFS:cst.N_DOFS + 3].set(root_v)
    s_t = s_t.at[:3].set(carry.prev_root + root_v * cfg.dt)
    s_t = s_t.at[6:cst.N_DOFS].set(st_aa[3:])          # model joints
    s_t = s_t.at[3:6].set(root_aa)                     # root ori from IMU0
    has_last = carry.n_out >= 1                        # last_s was a real frame
    blended = s_t.at[6:].set((s_t[6:] + carry.last_s[6:]) / 2.0)
    s_t = jnp.where(has_last, blended, s_t)

    return SensedFrame((raw, k_new, imu_win, accsum_win, acc_runsum,
                        out_buf, n_out, active, s_t, c_t, cache))


def _fk(cfg: RunnerConfig, skel: kin.Skeleton, s_t):
    """Pose -> (CoM frames, joint frames) via the configured FK path."""
    if cfg.fk_impl == "pallas":
        return kin.fk_bullet_fused(skel, kin.our_pose_to_bullet(s_t),
                                   interpret=jax.default_backend() != "tpu")
    return kin.fk_our_state(skel, s_t, return_joint_frame=True)


def _tail(cfg: RunnerConfig, skel: kin.Skeleton, s_t, c_t, prev_pq):
    """Stage-6 FK + SBP root-correction inputs via the configured tail path.

    Returns (pq_com, pq_jf, vel_res, c_locs_raw, active, raw_residues,
    hist_sixd-or-None): vel_res is the clipped mean feet residue BEFORE the
    runner-specific z fix; c_locs_raw the world SBP positions before the
    -vel_res*dt shift; hist_sixd the (18, 6) two-axis history encode when
    the fused kernel produced it (ops/fused_tail.py), else None (the XLA
    path encodes it in state_to_history after the root correction — the
    correction only touches s_t[:3], which the encode never reads, so both
    orders are equivalent)."""
    if cfg.resolved_tail_impl == "fused":
        from tip_tpu.ops import fused_tail as FT
        to = FT.tail_fused(skel, s_t, c_t, prev_pq, dt=cfg.dt,
                           interpret=jax.default_backend() != "tpu")
        return (to.pq_com, to.pq_jf, to.vel_res, to.c_locs,
                to.active > 0.5, to.raw_res, to.hist_sixd)
    pq_g, pq_jf = _fk(cfg, skel, s_t)
    corr = sbp_ops.root_correction_from_constrs(
        prev_pq, pq_g, c_t, n_sbps=cfg.n_sbps,
        use_n_sbps=min(5, cfg.n_sbps), dt=cfg.dt)
    return (pq_g, pq_jf, corr.vel_res, corr.c_locs, corr.active,
            corr.raw_residues, None)


def pack_fused_weights(params, cfg: RunnerConfig, dtype=jnp.float32):
    """Pre-pack the fused-kernel weights with the dtype the runner's fused
    path would use (cache ring dtype for kv modes, compute_dtype/bf16 for
    the recompute fused forward). Pass the result as ``packed_ws`` to
    runner_step/full_runner_step to hoist the per-dispatch cast+concat of
    every weight matrix (a per-tick cost on non-scan drivers)."""
    if cfg.model.forward_impl != "fused":
        return None
    from tip_tpu.ops import fused_forward as FF
    if _is_cached(cfg):
        pd = (jnp.dtype(cfg.model.compute_dtype)
              if cfg.model.compute_dtype is not None else jnp.dtype(dtype))
    else:
        pd = jnp.dtype(cfg.model.compute_dtype or jnp.bfloat16)
    return tuple(FF.pack_weights(params, cfg.model, dtype=pd))


def runner_step(params, carry: RunnerCarry, cur_imu, cfg: RunnerConfig,
                skel: kin.Skeleton,
                rng: Optional[jax.Array] = None, tick=None, packed_ws=None):
    """One 60 Hz frame of the minimal runner (flat-ground assumption).
    Returns (carry', dict(qdq, viz_locs, ct))."""
    dtype = carry.imu_win.dtype
    n_sbps = cfg.n_sbps
    (raw, k_new, imu_win, accsum_win, acc_runsum, out_buf, n_out, active,
     s_t, c_t, cache) = sense_and_predict(params, carry, cur_imu, cfg, rng,
                                          tick=tick, packed_ws=packed_ws)

    # ---- 6. FK + SBP root correction (ref :169-194) ---------------------------
    (pq_g, pq_g_jf, vel_res, c_locs_raw, sbp_active, _,
     hist_sixd) = _tail(cfg, skel, s_t, c_t, carry.prev_pq)
    # flat-ground assumption: z correction pulls active feet SBPs to z=0
    z = (jnp.where(sbp_active[0], c_locs_raw[0, 2], 0.0)
         + jnp.where(sbp_active[1], c_locs_raw[1, 2], 0.0))
    vel_res = vel_res.at[2].set(z)

    c_locs = c_locs_raw - vel_res[None, :] * cfg.dt
    s_t = s_t.at[:3].add(-vel_res * cfg.dt)
    pq_g = pq_g.at[:, :3].add(-vel_res[None, :] * cfg.dt)

    # ---- 7. history push (ref :196) -------------------------------------------
    if hist_sixd is not None:
        hist = jnp.concatenate([hist_sixd.reshape(108),
                                s_t[cst.N_DOFS:cst.N_DOFS + 3], c_t])
    else:
        hist = state_to_history(s_t, c_t, n_sbps)
    s_and_c_win = push_history(cfg, carry.s_and_c_win, k_new, hist, active)

    # ---- outputs / carry (warmup: return s_init, freeze state) ----------------
    out_qdq = jnp.where(active, s_t, carry.s_init)
    out_viz = jnp.where(active, c_locs, jnp.full((n_sbps, 3), 100.0, dtype))
    out_ct = jnp.where(active, c_t, jnp.zeros_like(c_t))

    new_carry = RunnerCarry(
        t=carry.t + 1,
        raw_imu=raw,
        k=k_new,
        imu_win=imu_win,
        accsum_win=accsum_win,
        acc_runsum=acc_runsum,
        s_and_c_win=s_and_c_win,
        out_buf=out_buf,
        n_out=n_out,
        last_s=jnp.where(active, s_t, carry.last_s),
        prev_pq=jnp.where(active, pq_g, carry.prev_pq),
        prev_root=jnp.where(active, s_t[:3], carry.prev_root),
        c_locs=jnp.where(active, c_locs, carry.c_locs),
        s_init=carry.s_init,
        cache=cache,
    )
    return new_carry, {"qdq": out_qdq, "viz_locs": out_viz, "ct": out_ct}


@partial(jax.jit, static_argnames=("cfg",))
def run_offline(params, cfg: RunnerConfig, skel: kin.Skeleton, s_init,
                imu_seq):
    """Stream a recorded IMU sequence through the runner via lax.scan.

    Mirrors the offline driver loop (offline_testing_simple.py:109-155):
    s_traj_pred[0] = s_init, then s_traj_pred[t+1] = step(imu[t]).  The
    latency trim (IMU_n_smooth + 2 frames) is applied by the caller.

    Returns (s_traj (T, 114), c_traj (T, n_sbps*4), viz (T, n_sbps, 3)).
    """
    s_init = jnp.asarray(s_init)
    carry = runner_init(cfg, skel, s_init, dtype=s_init.dtype)

    def scan_step(c, imu_t):
        c, out = runner_step(params, c, imu_t, cfg, skel)
        return c, (out["qdq"], out["ct"], out["viz_locs"])

    _, (s_traj, c_traj, viz) = jax.lax.scan(scan_step, carry, imu_seq[:-1])
    s_init_row = jnp.asarray(s_init, s_traj.dtype)[None]
    s_traj = jnp.concatenate([s_init_row, s_traj], axis=0)
    c_traj = jnp.concatenate([jnp.zeros_like(c_traj[:1]), c_traj], axis=0)
    viz = jnp.concatenate([jnp.full_like(viz[:1], 100.0), viz], axis=0)
    return s_traj, c_traj, viz


def trim_latency(arr, trim: int):
    """Shift predictions earlier by ``trim`` frames, repeating the final frame
    (reference offline_testing_simple.py:148-153). Host-side numpy ok."""
    arr = np.asarray(arr).copy()
    arr[0:-trim] = arr[trim:]
    arr[-trim:] = arr[-trim - 1]
    return arr


def make_multi_stream_step(cfg: RunnerConfig, skel: kin.Skeleton):
    """vmap-batched runner step: serve many IMU streams on one chip.

    Returns step(params, carries, imu_batch, tick) with carries/imu batched
    on axis 0 and tick a () int32 global counter shared by all streams (the
    kv-cache global ring cursor; ignored by the recompute mode). New
    capability vs the reference (single-stream only) — see SURVEY.md §2.8.
    """
    def one(params, carry, imu_t, tick):
        return runner_step(params, carry, imu_t, cfg, skel, tick=tick)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, 0, None)))
