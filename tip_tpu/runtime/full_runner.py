"""Full streaming runner: terrain estimation + SBP-conditioned limb IK.

Equivalent of the reference's ``RTRunner`` (real_time_runner.py:24-500),
built on the shared sensing/prediction front-end of
``tip_tpu.runtime.runner``. Per frame, beyond the minimal runner:

  * the root z correction comes from the terrain height-region maps instead
    of the flat-ground SBP heights (ref :462-472);
  * each foot SBP runs an "establishing phase" tick counter before its
    height is committed to the map (ref :264-277);
  * optionally (multi_sbp flag) the pelvis SBP also feeds the terrain when
    far from the feet (ref :475-480), and accumulated per-limb velocity
    residues drive analytic two-joint IK corrections that are written into
    the autoregressive *history* only — feedback, not display (ref :334-382,
    483-495);
  * a ground-truth playback mode substitutes (s_gt, c_gt) for the model
    (ref :397-401) while still exercising FK/SBP/terrain.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tip_tpu.chars.amass import IK_CHAIN_BULLET, IK_CHAIN_NIMBLE
from tip_tpu.ops import ik as ik_ops
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import rotations as rot
from tip_tpu.runtime import terrain as terrain_lib
from tip_tpu.runtime.runner import (RunnerCarry, RunnerConfig, push_history,
                                    runner_init, sense_and_predict,
                                    state_to_history)

# SBP order: lankle, rankle, lwrist, rwrist, root (chars.amass.SBP_LINKS)
_TICK_LINKS = (0, 1, 4)     # lankle, rankle, root carry establishing ticks


@dataclass(frozen=True)
class FullRunnerConfig:
    base: RunnerConfig = RunnerConfig()
    terrain: terrain_lib.TerrainConfig = terrain_lib.TerrainConfig()
    multi_sbp: bool = False           # terrain-from-root + IK feedback
    playback_gt: bool = False

    def __post_init__(self):
        # the multi-SBP paths index the root SBP at slot 4
        # (raw_residues[4], c_locs_prev[4]); with a 2-SBP model jit's
        # index clamping would silently read the rankle SBP instead of
        # the reference's all-NaN no-op (real_time_runner.py:347-352) —
        # reject the combination outright
        if self.multi_sbp and self.base.n_sbps < 5:
            raise ValueError(
                f"multi_sbp needs the 5-SBP model (root SBP at slot 4); "
                f"got n_sbps={self.base.n_sbps}")


@struct.dataclass
class FullCarry:
    base: RunnerCarry
    terrain: terrain_lib.TerrainState
    ticks: jnp.ndarray          # (3,) int32 for (lankle, rankle, root); -1 idle
    ik_deltas: jnp.ndarray      # (2, 3) accumulated targets for (lankle, rankle)
    c_locs_prev: jnp.ndarray    # (n_sbps, 3)


def full_runner_init(cfg: FullRunnerConfig, skel: kin.Skeleton, s_init,
                     dtype=jnp.float32) -> FullCarry:
    base = runner_init(cfg.base, skel, s_init, dtype)
    return FullCarry(
        base=base,
        terrain=terrain_lib.terrain_init(cfg.terrain, dtype),
        ticks=jnp.full((3,), -1, jnp.int32),
        ik_deltas=jnp.zeros((2, 3), dtype),
        c_locs_prev=jnp.full((cfg.base.n_sbps, 3), 100.0, dtype),
    )


def _update_ticks(ticks, c_locs, c_locs_prev):
    """Establishing-phase countdown (reference
    update_sbp_establishing_height_ticks, real_time_runner.py:264-277)."""
    idx = jnp.asarray(_TICK_LINKS)
    active_now = jnp.linalg.norm(c_locs[idx], axis=1) < 100.0
    active_prev = jnp.linalg.norm(c_locs_prev[idx], axis=1) < 100.0
    t = jnp.where(ticks >= 0, ticks - 1, ticks)
    # contact just ended -> finalize immediately
    t = jnp.where((~active_now) & active_prev & (ticks >= 0), 0, t)
    return t


# static leg-chain index tables for the batched both-sides IK feedback
_IK_LEG_LINKS = np.array([IK_CHAIN_BULLET["lankle"],
                          IK_CHAIN_BULLET["rankle"]]) + 1      # (2,4) pq rows
_IK_LEG_JOINTS = np.array([IK_CHAIN_NIMBLE["lankle"],
                           IK_CHAIN_NIMBLE["rankle"]])         # (2,3)
# state channels rewritten: 3 + j*3 + {0,1,2} per (side, joint)
_IK_WRITE_IDX = (3 + _IK_LEG_JOINTS * 3)[:, :, None] + np.arange(3)  # (2,3,3)


def _ik_history_feedback(cfg: FullRunnerConfig, s_hist, pq_jf, raw_residues,
                         ik_deltas, dt):
    """Two-joint leg IK for BOTH ankles writing into the history state
    (reference correct_joint_q_for_history_feedback,
    real_time_runner.py:334-382). The reference corrects the legs one after
    the other, but the computations are independent (disjoint joints and
    delta rows), so both run through one vmapped IK — single-stream frame
    latency is dispatch-bound and this halves the IK op count."""
    root_res = raw_residues[4]
    sbp_res = raw_residues[:2]                                  # (2, 3)
    both = (~jnp.any(jnp.isnan(sbp_res), axis=1)) \
        & (~jnp.any(jnp.isnan(root_res)))

    delta = ik_deltas + jnp.where(
        both[:, None],
        (jnp.nan_to_num(sbp_res) - jnp.nan_to_num(root_res)[None, :]) * dt,
        0.0)
    corr = -delta
    n = jnp.linalg.norm(corr, axis=1)
    overflow = n > 0.5
    apply_ik = both & (~overflow) & (n > 0.05)

    quads = pq_jf[jnp.asarray(_IK_LEG_LINKS)]                   # (2, 4, 7)
    a_q, b_q, c_q = jax.vmap(ik_ops.leg_two_joint_ik_keep_foot)(
        quads[:, 0], quads[:, 1], quads[:, 2], quads[:, 3], corr)
    aa = jax.vmap(rot.q_to_aa)(
        jnp.stack([a_q, b_q, c_q], axis=1).reshape(6, 4)).reshape(2, 3, 3)

    idx = jnp.asarray(_IK_WRITE_IDX.reshape(-1))
    old = s_hist[idx].reshape(2, 3, 3)
    vals = jnp.where(apply_ik[:, None, None], aa, old)
    # cast keeps the scatter dtype-exact when x64 tests promote IK internals
    s_hist = s_hist.at[idx].set(vals.reshape(-1).astype(s_hist.dtype))
    new_deltas = jnp.where((both & ~overflow)[:, None], delta, 0.0)
    return s_hist, new_deltas, vals


def full_runner_step(params, carry: FullCarry, cur_imu,
                     cfg: FullRunnerConfig, skel: kin.Skeleton,
                     rng: Optional[jax.Array] = None,
                     s_gt=None, c_gt=None, packed_ws=None):
    """One frame (reference RTRunner.step, real_time_runner.py:384-500)."""
    b = carry.base
    bcfg = cfg.base
    dtype = b.imu_win.dtype
    n_sbps = bcfg.n_sbps

    (raw, k_new, imu_win, accsum_win, acc_runsum, out_buf, n_out, active,
     s_pred, c_pred, cache) = sense_and_predict(params, b, cur_imu, bcfg,
                                                rng, packed_ws=packed_ws)

    if cfg.playback_gt:
        s_t = jnp.asarray(s_gt, dtype)
        c_t = jnp.asarray(c_gt, dtype)
        active = jnp.asarray(True)
    else:
        s_t, c_t = s_pred, c_pred

    # ---- FK + SBP residues (ref :451-460) -------------------------------------
    from tip_tpu.runtime.runner import _tail
    (pq_g, pq_g_jf, vres_raw, c_locs_raw, _, raw_residues,
     hist_sixd) = _tail(bcfg, skel, s_t, c_t, b.prev_pq)
    # terrain, not SBP z, corrects root height (ref :462)
    vel_res = vres_raw.at[2].set(0.0)
    c_locs = c_locs_raw - vel_res[None, :] * bcfg.dt

    # ---- establishing ticks + terrain updates (ref :465-480) ------------------
    ticks = _update_ticks(carry.ticks, c_locs, carry.c_locs_prev)

    terrain = carry.terrain
    z_corr = jnp.asarray(0.0, dtype)
    tick_arm = []
    for slot, sbp_idx in ((0, 0), (1, 1)):             # lankle, rankle
        prev_loc = carry.c_locs_prev[sbp_idx]
        prev_active = jnp.linalg.norm(prev_loc) < 100.0
        tick = ticks[slot]
        do_update = prev_active & (tick == 0)
        arm = prev_active & (tick < 0)                  # start establishing
        terrain, d = terrain_lib.update_height_map(
            terrain, cfg.terrain, prev_loc, do_update)
        z_corr = z_corr - d * cfg.terrain.height_correction_force
        tick_arm.append((slot, arm, do_update))

    if cfg.multi_sbp:
        # pelvis feeds terrain when far from the feet (ref :475-480)
        dist = jnp.linalg.norm(
            pq_g[0, :2] - (pq_g[3, :2] + pq_g[6, :2]) / 2.0)
        prev_loc = carry.c_locs_prev[4]
        prev_active = (jnp.linalg.norm(prev_loc) < 100.0) \
            & (dist > cfg.terrain.pelvis_terrain_thres)
        tick = ticks[2]
        do_update = prev_active & (tick == 0)
        arm = prev_active & (tick < 0)
        terrain, _ = terrain_lib.update_height_map(
            terrain, cfg.terrain, prev_loc, do_update)
        tick_arm.append((2, arm, do_update))

    for slot, arm, done in tick_arm:
        ticks = ticks.at[slot].set(
            jnp.where(done, -1,
                      jnp.where(arm, cfg.terrain.establish_ticks,
                                ticks[slot])))

    vel_res = vel_res.at[2].add(z_corr)

    # ---- IK feedback into history (ref :483-495) -------------------------------
    s_hist = s_t
    ik_deltas = carry.ik_deltas
    ik_vals = None
    if cfg.multi_sbp:
        s_hist, ik_deltas, ik_vals = _ik_history_feedback(
            cfg, s_hist, pq_g_jf, raw_residues, ik_deltas, bcfg.dt)

    # ---- apply root correction (ref :489-494; playback skips it) ---------------
    if not cfg.playback_gt:
        s_t = s_t.at[:3].add(-vel_res * bcfg.dt)
        s_hist = s_hist.at[:3].add(-vel_res * bcfg.dt)
        pq_g = pq_g.at[:, :3].add(-vel_res[None, :] * bcfg.dt)

    # ---- history push + carry ---------------------------------------------------
    if hist_sixd is not None:
        # fused tail: the kernel encoded s_t's rows; only the 6 leg-joint
        # rows the IK feedback may have rewritten need re-encoding (the
        # root correction never touches channels the encode reads)
        if ik_vals is not None:
            rows = jnp.asarray(_IK_LEG_JOINTS.reshape(-1))
            hist_sixd = hist_sixd.at[rows].set(
                rot.aa_to_sixd(ik_vals.reshape(6, 3)).astype(
                    hist_sixd.dtype))
        from tip_tpu import constants as cst
        hist = jnp.concatenate([hist_sixd.reshape(108),
                                s_hist[cst.N_DOFS:cst.N_DOFS + 3], c_t])
    else:
        hist = state_to_history(s_hist, c_t, n_sbps)
    s_and_c_win = push_history(bcfg, b.s_and_c_win, k_new, hist, active)

    out_qdq = jnp.where(active, s_t, b.s_init)
    out_viz = jnp.where(active, c_locs, jnp.full((n_sbps, 3), 100.0, dtype))
    out_ct = jnp.where(active, c_t, jnp.zeros_like(c_t))
    # per-slot terrain-update flags (lankle, rankle, root): which
    # update_height_map calls committed this frame, centered on the
    # PREVIOUS frame's c_locs. Lets offline tooling reconstruct cell
    # establishment times without replaying the tick state machine
    # (eval_terrain.py).
    out_upd = jnp.zeros((3,), bool)
    for slot, _, done in tick_arm:
        out_upd = out_upd.at[slot].set(active & done)

    new_base = RunnerCarry(
        t=b.t + 1, raw_imu=raw, k=k_new, imu_win=imu_win,
        accsum_win=accsum_win, acc_runsum=acc_runsum,
        s_and_c_win=s_and_c_win, out_buf=out_buf, n_out=n_out,
        last_s=jnp.where(active & (not cfg.playback_gt), s_pred, b.last_s),
        prev_pq=jnp.where(active, pq_g, b.prev_pq),
        prev_root=jnp.where(active, s_t[:3], b.prev_root),
        c_locs=jnp.where(active, c_locs, b.c_locs),
        s_init=b.s_init,
        cache=cache,
    )
    new_carry = FullCarry(
        base=new_base,
        terrain=jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), terrain, carry.terrain),
        ticks=jnp.where(active, ticks, carry.ticks),
        ik_deltas=jnp.where(active, ik_deltas, carry.ik_deltas),
        c_locs_prev=jnp.where(active, c_locs, carry.c_locs_prev),
    )
    return new_carry, {"qdq": out_qdq, "viz_locs": out_viz, "ct": out_ct,
                       "upd": out_upd}


def run_offline_full(params, cfg: FullRunnerConfig, skel: kin.Skeleton,
                     s_init, imu_seq, s_gt=None, c_gt=None,
                     collect_updates: bool = False):
    """lax.scan driver for the full runner (offline eval / GT playback).

    collect_updates=True additionally returns the (T, 3) bool terrain-update
    flag track (see full_runner_step out["upd"]): row t's flags mean
    update_height_map committed at frame t with centers taken from the
    previous frame's c_locs — i.e. viz[t-1] rows (lankle, rankle, root).
    """
    s_init = jnp.asarray(s_init)
    carry = full_runner_init(cfg, skel, s_init, dtype=s_init.dtype)

    if cfg.playback_gt:
        def sstep(c, xs):
            imu_t, s_t, c_t = xs
            c, out = full_runner_step(params, c, imu_t, cfg, skel,
                                      s_gt=s_t, c_gt=c_t)
            return c, (out["qdq"], out["ct"], out["viz_locs"], out["upd"])
        xs = (imu_seq[:-1], s_gt[:-1], c_gt[:-1])
    else:
        def sstep(c, imu_t):
            c, out = full_runner_step(params, c, imu_t, cfg, skel)
            return c, (out["qdq"], out["ct"], out["viz_locs"], out["upd"])
        xs = imu_seq[:-1]

    final, (s_traj, c_traj, viz, upd) = jax.lax.scan(sstep, carry, xs)
    s_traj = jnp.concatenate([s_init[None].astype(s_traj.dtype), s_traj])
    c_traj = jnp.concatenate([jnp.zeros_like(c_traj[:1]), c_traj])
    viz = jnp.concatenate([jnp.full_like(viz[:1], 100.0), viz])
    if collect_updates:
        upd = jnp.concatenate([jnp.zeros_like(upd[:1]), upd])
        return s_traj, c_traj, viz, upd, final
    return s_traj, c_traj, viz, final
