"""Stationary-Body-Point (SBP) math.

Three pieces, all mask-based (no NaN control flow) so they jit/vmap/scan:

1. Label synthesis: per link, grid-search the local point whose world velocity
   (w x Rp + v) is minimal; accept if the combined residue is below V_THRES.
   Reference data_utils.get_rot_center_sample_based (data_utils.py:27-100).
2. Velocity residue of an active SBP (data_utils.py:397-412).
3. Root-drift correction from the active feet SBPs
   (data_utils.get_cur_step_root_correction_from_all_constr,
   data_utils.py:473-548).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu import constants as cst
from tip_tpu.ops import rotations as rot


def _grid(lp_x, lp_y, lp_z) -> np.ndarray:
    """Candidate local points; meshgrid order matches the reference so the
    argmin tie-break picks the same point (data_utils.py:70-71)."""
    xx, yy, zz = np.meshgrid(lp_x, lp_y, lp_z)
    return np.stack((xx.ravel(), yy.ravel(), zz.ravel()), axis=1)


# candidate grids per link type (data_utils.py:52-68); link indices follow
# chars.amass: wrists 14/18, feet 2/5, pelvis -1
GRID_WRIST = _grid(np.arange(-0.02, 0.03, 0.01),
                   np.arange(-0.02, 0.03, 0.01),
                   np.arange(-0.02, 0.03, 0.01))
GRID_FOOT = _grid(np.arange(-0.04, 0.05, 0.01),
                  np.arange(-0.04, 0.02, 0.01),
                  np.arange(-0.15, 0.18, 0.01))
GRID_PELVIS = _grid(np.arange(-0.15, 0.16, 0.01),
                    np.arange(-0.1, 0.15, 0.01),
                    np.arange(-0.12, -0.04, 0.01))


def grid_for_link(link: int) -> np.ndarray:
    if link in (14, 18):
        return GRID_WRIST
    if link in (2, 5):
        return GRID_FOOT
    if link == -1:
        return GRID_PELVIS
    raise ValueError(f"no SBP grid for link {link}")


class RotCenter(NamedTuple):
    sol: jnp.ndarray        # (3,) world-frame R·p of the best point (0 if inactive)
    active: jnp.ndarray     # () bool — residue below threshold
    vel: jnp.ndarray        # (3,) best point's world velocity (0 if inactive)


def rot_center_sample(x1, q1, x2, q2, dt, sol_prev, prev_active, grid,
                      v_thres: float = cst.V_THRES) -> RotCenter:
    """One grid search step (reference data_utils.py:27-100).

    Residue per candidate p: |w x (R2 p) + v| + 0.2 |temporal| + 0.02 |R2 p|,
    where the temporal term compares against the advected previous solution
    (sol_prev - v dt) and is zero when there was no previous solution.
    """
    v = (x2 - x1) / dt
    w = rot.angular_velocity_from_quats(q1, q2, dt)

    lps_r = rot.q_rotate(q2[None, :], grid)               # (N, 3) R2·p
    wx_lps = jnp.cross(jnp.broadcast_to(w, lps_r.shape), lps_r)
    lps_v = wx_lps + v[None, :]

    dist = lps_r - (sol_prev - v * dt)[None, :]
    dist_n = jnp.where(prev_active, jnp.linalg.norm(dist, axis=1), 0.0)

    residues = (jnp.linalg.norm(lps_v, axis=1)
                + 0.2 * dist_n
                + 0.02 * jnp.linalg.norm(lps_r, axis=1))
    idx = jnp.argmin(residues)
    active = residues[idx] < v_thres
    sol = jnp.where(active, lps_r[idx], 0.0)
    vel = jnp.where(active, lps_v[idx], 0.0)
    return RotCenter(sol=sol, active=active, vel=vel)


def link_contact_sequence(pq_link, dt: float, grid) -> jnp.ndarray:
    """SBP labels over a motion for one link: (T, 4) rows [flag, R·p or 0].

    Sequential scan over time (the temporal-consistency term couples frames);
    the grid dimension is vectorised. Mirrors
    data-gen-and-viz-bullet-new.get_link_contr_seq_from_raw_motion_info
    (:104-144): frame t uses (t-1, t+1) states with dt' = 2 dt; frames
    [0,1] and [T-2,T-1] stay zero.

    pq_link: (T, 7) world (p, q) of the link over time.
    """
    T = pq_link.shape[0]
    x = pq_link[:, :3]
    q = pq_link[:, 3:]

    def step(carry, inp):
        sol_prev, prev_active = carry
        x1, q1, x2, q2 = inp
        rc = rot_center_sample(x1, q1, x2, q2, 2.0 * dt, sol_prev,
                               prev_active, grid)
        row = jnp.concatenate([rc.active.astype(x1.dtype)[None], rc.sol])
        return (rc.sol, rc.active), row

    # frames t = 2 .. T-3 use (t-1) and (t+1): x1=x[1:T-3], x2=x[3:T-1]
    inputs = (x[1:T - 3], q[1:T - 3], x[3:T - 1], q[3:T - 1])
    init = (jnp.zeros(3, x.dtype), jnp.asarray(False))
    _, rows = jax.lax.scan(step, init, inputs)
    out = jnp.zeros((T, 4), x.dtype)
    return out.at[2:T - 2].set(rows)


def residue_from_contr(x1, q1, x2, q2, dt, sol):
    """World-velocity residue of a constrained point (data_utils.py:397-412).
    sol is the world-frame offset (R·p) from the link CoM."""
    v = (x2 - x1) / dt
    w = rot.angular_velocity_from_quats(q1, q2, dt)
    return jnp.cross(w, sol) + v


# pq row per SBP body: [lankle, rankle, lwrist, rwrist, root]; row = link + 1
SBP_PQ_ROWS = np.array([3, 6, 15, 19, 0], dtype=np.int32)


class RootCorrection(NamedTuple):
    vel_res: jnp.ndarray       # (3,) clipped mean feet residue
    c_locs: jnp.ndarray        # (5, 3) world SBP positions (100s if inactive)
    raw_residues: jnp.ndarray  # (5, 3) per-SBP residue (NaN rows if inactive)
    active: jnp.ndarray        # (5,) bool


def root_correction_from_constrs(pq_prev, pq_cur, constrs, n_sbps: int = 5,
                                 use_n_sbps: int = 5,
                                 dt: float = cst.DT) -> RootCorrection:
    """Root-velocity correction from active SBPs (data_utils.py:473-548).

    constrs: (n_sbps*4,) [flag, offset(3)] per SBP, offsets world-frame
    relative to the link position. Only the first two (feet) contribute to
    the returned vel_res; all are evaluated for viz/IK.
    """
    rows = SBP_PQ_ROWS[:n_sbps]
    x1 = pq_prev[rows, :3]
    q1 = pq_prev[rows, 3:]
    x2 = pq_cur[rows, :3]
    q2 = pq_cur[rows, 3:]

    c = constrs.reshape(n_sbps, 4)
    flags = c[:, 0] > 0.0
    use_mask = jnp.arange(n_sbps) < use_n_sbps
    active = flags & use_mask

    offs = c[:, 1:4]
    res = jax.vmap(residue_from_contr, in_axes=(0, 0, 0, 0, None, 0))(
        x1, q1, x2, q2, dt, offs)
    raw = jnp.where(active[:, None], res, jnp.nan)
    c_locs = jnp.where(active[:, None], x2 + offs, 100.0)

    feet_active = active[:2]
    n_feet = jnp.sum(feet_active)
    feet_res = jnp.where(feet_active[:, None], res[:2], 0.0)
    vel_res = jnp.where(n_feet > 0,
                        jnp.sum(feet_res, axis=0) / jnp.maximum(n_feet, 1),
                        0.0)
    vel_res = jnp.clip(vel_res, -0.5, 0.5)
    return RootCorrection(vel_res=vel_res, c_locs=c_locs, raw_residues=raw,
                          active=active)
