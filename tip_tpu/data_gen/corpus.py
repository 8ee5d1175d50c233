"""Procedural motion corpus: IK-planned human motions for training at scale.

The reference trains on AMASS mocap synthesized into virtual IMU streams
(data-gen-and-viz-bullet-new.py:38-312).  The AMASS source archives are not
present in this environment, so this module provides the corpus the
convergence recipe trains on: procedurally *planned* motions whose feet are
placed by analytic two-bone leg IK against the character's own bone
geometry.  That construction makes the labels honest where it matters:

  * stance feet are world-stationary by construction, so the SBP rot-center
    grid search (ops/sbp.py, reference data_utils.py:27-100) finds real
    contacts and the root-drift correction path trains on real signal;
  * stairs/ramp ground profiles put those contacts at varying heights, so
    the terrain estimation path (runtime/terrain.py) sees realistic input;
  * walks turn and change speed, so the root-velocity labels are varied.

Motion families: walking (flat / ramp / stairs / bumps ground, turning,
speed changes), idle stands with weight shifts and arm reaches, squats, and
free-form joint-swing fields (non-contact diversity).  All are emitted as
`smpl.SmplMotion` (y-up SMPL axis-angle convention, root slot pre-rotated
into z-up world exactly like an AMASS clip) and synthesized into training
pickles by `data_gen.amass_syn.synthesize`.

Geometry conventions (see tests/test_corpus.py for the FK proof):
  * character body frame is y-up SMPL: legs along -y, +z forward, +x left;
  * `kin.fk` composes joint rotations in the parent frame with all rest
    frames aligned to the root, so planning in pelvis-local coordinates
    yields local joint rotations directly;
  * bone vectors come from `kin.amass_skeleton()` joint offsets (scale 1;
    `synthesize`'s random body height is a uniform scale on top, which
    preserves stance-foot stationarity).
"""

import os
import pickle
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
from scipy.spatial.transform import Rotation

from tip_tpu import constants as cst
from tip_tpu.data_gen import smpl

# bullet joint indices of the leg chain (chars/amass.py joint order)
_LHIP, _LKNEE, _LANKLE = 0, 1, 2
_RHIP, _RKNEE, _RANKLE = 3, 4, 5

# world up conversion: SMPL y-up body -> z-up world (x->y, y->z, z->x)
_R_ZUP = Rotation.from_rotvec(np.full(3, 1.20919958))

FPS = 120.0                     # authoring rate; resampled to 60 Hz later
ANKLE_REST_H = 0.08             # ankle joint height when the foot is flat


def _norm(v, axis=-1, keepdims=True):
    return np.linalg.norm(v, axis=axis, keepdims=keepdims)


def _unit(v):
    return v / np.maximum(_norm(v), 1e-9)


def _frame(u, n):
    """(..., 3, 3) orthonormal basis with columns [u_hat, n ⊥ u, u x n]."""
    u = _unit(u)
    n = _unit(n - np.sum(n * u, -1, keepdims=True) * u)
    return np.stack([u, n, np.cross(u, n)], axis=-1)


@dataclass
class LegGeometry:
    hip_off: np.ndarray         # (3,) hip joint in root frame
    b1: np.ndarray              # (3,) thigh bone vector (hip frame)
    b2: np.ndarray              # (3,) shank bone vector (knee frame)
    l1: float
    l2: float


def leg_geometry():
    """Leg bone vectors from the character skeleton (scale 1)."""
    from tip_tpu.ops import kinematics as kin
    off = np.asarray(kin.amass_skeleton().joint_offset, np.float64)

    def leg(hip, knee, ankle):
        return LegGeometry(hip_off=off[hip], b1=off[knee], b2=off[ankle],
                           l1=float(np.linalg.norm(off[knee])),
                           l2=float(np.linalg.norm(off[ankle])))

    return leg(_LHIP, _LKNEE, _LANKLE), leg(_RHIP, _RKNEE, _RANKLE)


def solve_leg(geo: LegGeometry, pelvis_p, pelvis_R, ankle_w, foot_R_w):
    """Two-bone analytic leg IK, vectorized over frames.

    Args:
      pelvis_p: (T, 3) root position (world).
      pelvis_R: (T, 3, 3) root orientation (world <- body).
      ankle_w:  (T, 3) target ankle-joint world positions.
      foot_R_w: (T, 3, 3) target world foot orientations.
    Returns (hip_aa, knee_aa, ankle_aa), each (T, 3) local axis-angles.
    """
    # target in pelvis-local (= body) coordinates, relative to the hip
    v = np.einsum("tji,tj->ti", pelvis_R, ankle_w - pelvis_p) - geo.hip_off
    d = np.linalg.norm(v, axis=-1)
    d = np.clip(d, 0.35 * (geo.l1 + geo.l2), 0.999 * (geo.l1 + geo.l2))
    d_hat = _unit(v)

    # knee aims forward (+z in body frame) with a touch of outward toe
    fwd = np.array([0.12 * np.sign(geo.hip_off[0]), 0.0, 1.0])
    p_hat = _unit(fwd - np.sum(fwd * d_hat, -1, keepdims=True) * d_hat)

    cos_beta = (geo.l1 ** 2 + d ** 2 - geo.l2 ** 2) / (2 * geo.l1 * d)
    beta = np.arccos(np.clip(cos_beta, -1.0, 1.0))[:, None]
    u_hat = np.cos(beta) * d_hat + np.sin(beta) * p_hat    # thigh direction
    w_hat = _unit(d[:, None] * d_hat - geo.l1 * u_hat)     # shank direction

    # hip: map the rest thigh frame onto the target thigh frame
    n_t = _unit(np.cross(p_hat, d_hat))                    # bend normal
    b1_hat = geo.b1 / geo.l1
    n_r = _unit(np.cross(np.array([0.0, 0.0, 1.0]), b1_hat))
    A = _frame(np.broadcast_to(b1_hat, u_hat.shape), np.broadcast_to(n_r, u_hat.shape))
    B = _frame(u_hat, n_t)
    R_h = B @ np.swapaxes(A, -1, -2)

    # knee: minimal rotation (in the thigh frame) taking the rest shank
    # onto the IK shank direction
    w_local = np.einsum("tji,tj->ti", R_h, w_hat)
    b2_hat = geo.b2 / geo.l2
    axis = np.cross(np.broadcast_to(b2_hat, w_local.shape), w_local)
    s = np.linalg.norm(axis, axis=-1)
    c = np.clip(np.sum(b2_hat * w_local, -1), -1.0, 1.0)
    ang = np.arctan2(s, c)
    knee_aa = np.where(s[:, None] > 1e-9,
                       axis / np.maximum(s[:, None], 1e-9) * ang[:, None],
                       0.0)
    R_k = Rotation.from_rotvec(knee_aa).as_matrix()

    # ankle: local rotation achieving the requested world foot orientation
    R_shank_w = pelvis_R @ R_h @ R_k
    R_a = np.swapaxes(R_shank_w, -1, -2) @ foot_R_w

    return (Rotation.from_matrix(R_h).as_rotvec(), knee_aa,
            Rotation.from_matrix(R_a).as_rotvec())


# ---------------------------------------------------------------------------
# ground profiles (functions of path arclength)
# ---------------------------------------------------------------------------

def ground_profile(kind: str, rng) -> Callable[[np.ndarray], np.ndarray]:
    if kind == "flat":
        return lambda s: np.zeros_like(s)
    if kind == "ramp":
        slope = rng.uniform(0.06, 0.2) * rng.choice([-1.0, 1.0])
        return lambda s: slope * s
    if kind == "stairs":
        rise = rng.uniform(0.10, 0.17) * rng.choice([-1.0, 1.0])
        run = rng.uniform(0.30, 0.45)
        return lambda s: rise * np.floor(s / run)
    if kind == "bumps":
        n = rng.integers(2, 5)
        c = rng.uniform(0.5, 8.0, n)
        h = rng.uniform(-0.25, 0.25, n)
        w = rng.uniform(0.4, 1.2, n)
        return lambda s: np.sum(
            h * np.exp(-((s[..., None] - c) / w) ** 2), axis=-1)
    raise ValueError(kind)


def _smoothstep(x):
    x = np.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _yaw(psi):
    """(T,) -> (T, 3, 3) world yaw rotations."""
    return Rotation.from_euler("z", np.reshape(psi, (-1, 1))).as_matrix()


# ---------------------------------------------------------------------------
# upper body
# ---------------------------------------------------------------------------

def _upper_body_walk(T, t, fs, rng, arm_amp=None):
    """(T, 24, 3) with arms lowered + counter-swinging, breathing spine."""
    aa = np.zeros((T, 24, 3))
    arm_amp = rng.uniform(0.15, 0.45) if arm_amp is None else arm_amp
    swing = arm_amp * np.sin(2 * np.pi * fs * t)
    drop = rng.uniform(1.1, 1.35)
    elbow = rng.uniform(0.15, 0.5)
    J = cst.SMPL_JOINT_IDX
    # left arm forward when the right leg leads (counter-phase)
    aa[:, J["lshoulder"]] = (
        Rotation.from_euler("xz", np.stack([swing, np.full(T, -drop)], 1))
        .as_rotvec())
    aa[:, J["rshoulder"]] = (
        Rotation.from_euler("xz", np.stack([-swing, np.full(T, drop)], 1))
        .as_rotvec())
    aa[:, J["lelbow"], 1] = -elbow + 0.1 * swing
    aa[:, J["relbow"], 1] = elbow - 0.1 * swing
    # spine counter-yaw + slight forward lean; head steady with micro-motion
    yaw_amp = rng.uniform(0.03, 0.1)
    aa[:, J["lowerback"], 1] = -yaw_amp * np.sin(2 * np.pi * fs * t)
    aa[:, J["lowerback"], 0] = rng.uniform(0.0, 0.1)
    aa[:, J["upperback"], 1] = 0.5 * yaw_amp * np.sin(2 * np.pi * fs * t)
    aa[:, J["upperneck"], 0] = 0.03 * np.sin(2 * np.pi * 0.3 * t)
    return aa


def _reach_envelope(T, t, rng, n_events):
    """Sum of smooth bumps in [0, 1] marking reach/raise events."""
    env = np.zeros(T)
    for _ in range(n_events):
        c = rng.uniform(t[0] + 1.0, t[-1] - 1.0)
        w = rng.uniform(0.6, 1.5)
        env += np.exp(-((t - c) / w) ** 2)
    return np.clip(env, 0.0, 1.0)


# ---------------------------------------------------------------------------
# motion families
# ---------------------------------------------------------------------------

def _assemble(T, pelvis_p, pelvis_R, ankle_l, ankle_r, foot_R_l, foot_R_r,
              upper_aa):
    """Run both-leg IK and pack an SmplMotion."""
    geo_l, geo_r = leg_geometry()
    J = cst.SMPL_JOINT_IDX
    aa = upper_aa.copy()
    for geo, ankle, foot_R, names in (
            (geo_l, ankle_l, foot_R_l, ("lhip", "lknee", "lankle")),
            (geo_r, ankle_r, foot_R_r, ("rhip", "rknee", "rankle"))):
        hip_aa, knee_aa, ankle_aa = solve_leg(geo, pelvis_p, pelvis_R,
                                              ankle, foot_R)
        aa[:, J[names[0]]] = hip_aa
        aa[:, J[names[1]]] = knee_aa
        aa[:, J[names[2]]] = ankle_aa
    aa[:, 0] = Rotation.from_matrix(pelvis_R).as_rotvec()
    return smpl.SmplMotion(poses=aa, trans=pelvis_p.copy(), fps=FPS)


def make_walk(rng, duration_s: float = 12.0, terrain: str = "flat"):
    """Footstep-planned walk with turning, speed changes, and a ground
    profile; stance feet are pinned world-stationary via leg IK."""
    T = int(duration_s * FPS)
    t = np.arange(T) / FPS
    geo_l, _ = leg_geometry()
    leg_drop = -(geo_l.hip_off[1] + geo_l.b1[1] + geo_l.b2[1])  # ~0.87

    # --- path: piecewise-smooth speed and turn rate -----------------------
    n_seg = max(2, int(duration_s / 3.0))
    seg_t = np.linspace(0, duration_s, n_seg + 1)
    seg_speed = rng.uniform(0.35, 1.35, n_seg)
    seg_turn = rng.choice([0.0, 1.0], n_seg, p=[0.45, 0.55]) * \
        rng.uniform(-0.8, 0.8, n_seg)
    idx = np.clip(np.searchsorted(seg_t, t, "right") - 1, 0, n_seg - 1)
    # smooth with a 0.5 s moving average so accelerations stay human
    k = int(0.5 * FPS)
    kern = np.ones(k) / k
    speed = np.convolve(np.pad(seg_speed[idx], (k, k), mode="edge"),
                        kern, "same")[k:-k]
    turn = np.convolve(np.pad(seg_turn[idx], (k, k), mode="edge"),
                       kern, "same")[k:-k]
    psi = np.cumsum(turn) / FPS
    vel = speed[:, None] * np.stack([np.cos(psi), np.sin(psi)], 1)
    path = np.cumsum(vel, axis=0) / FPS                    # (T, 2)
    arclen = np.cumsum(speed) / FPS
    ground = ground_profile(terrain, rng)

    # --- footstep plan ----------------------------------------------------
    fs = rng.uniform(0.8, 1.2)                             # gait cycles/s
    duty = rng.uniform(0.56, 0.62)
    P = 1.0 / fs
    half_w = rng.uniform(0.07, 0.11)

    def interp(arr, tt):
        return np.interp(tt, t, arr)

    def plan_foot(phase, sign):
        """Strike times + placements for one foot; returns per-frame ankle
        targets (T, 3) and per-frame foot yaw (T,)."""
        strikes = np.arange(phase, duration_s + 2 * P, P)
        px = interp(path[:, 0], strikes)
        py = interp(path[:, 1], strikes)
        ps = interp(arclen, strikes)
        ppsi = interp(psi, strikes)
        lat = np.stack([-np.sin(ppsi), np.cos(ppsi)], 1) * sign * half_w
        place = np.stack([px, py], 1) + lat                # (K, 2)
        pz = ground(ps) + ANKLE_REST_H

        ankle = np.zeros((T, 3))
        fyaw = np.zeros(T)
        clearance = rng.uniform(0.04, 0.1)
        for k_ in range(len(strikes) - 1):
            t0, t1 = strikes[k_], strikes[k_ + 1]
            lift = t0 + duty * P
            m_st = (t >= t0 - 1e-9) & (t < lift)
            m_sw = (t >= lift) & (t < t1)
            ankle[m_st, :2] = place[k_]
            ankle[m_st, 2] = pz[k_]
            fyaw[m_st] = ppsi[k_]
            if m_sw.any():
                s = (t[m_sw] - lift) / max(t1 - lift, 1e-6)
                h = _smoothstep(s)[:, None]
                ankle[m_sw, :2] = (1 - h) * place[k_] + h * place[k_ + 1]
                ankle[m_sw, 2] = ((1 - h[:, 0]) * pz[k_] + h[:, 0] * pz[k_ + 1]
                                  + clearance * np.sin(np.pi * s))
                fyaw[m_sw] = (1 - s) * ppsi[k_] + s * ppsi[k_ + 1]
        m_pre = t < strikes[0]
        ankle[m_pre, :2] = place[0]
        ankle[m_pre, 2] = pz[0]
        fyaw[m_pre] = ppsi[0]
        return ankle, fyaw

    ankle_l, yaw_l = plan_foot(0.0, +1.0)
    ankle_r, yaw_r = plan_foot(P / 2.0, -1.0)

    # --- pelvis -----------------------------------------------------------
    crouch = rng.uniform(0.95, 0.985)
    bob = rng.uniform(0.01, 0.03)
    sway = rng.uniform(0.015, 0.035)
    g_smooth = np.convolve(np.pad(0.5 * (ankle_l[:, 2] + ankle_r[:, 2]),
                                  (k, k), mode="edge"), kern, "same")[k:-k]
    left_dir = np.stack([-np.sin(psi), np.cos(psi)], 1)
    pel_xy = (path + sway * np.sin(2 * np.pi * fs * t + np.pi / 2)[:, None]
              * left_dir)
    pel_z = (g_smooth + crouch * leg_drop
             + bob * np.sin(4 * np.pi * fs * t))
    # reachability cap: the pelvis must stay low enough that both stance
    # ankles remain inside leg reach (otherwise the IK clamp drags the
    # planted foot — kinematic foot slide). The natural consequence is the
    # inverted-pendulum dip at long strides.
    reach = 0.99 * (geo_l.l1 + geo_l.l2)
    hip_drop = -geo_l.hip_off[1]                 # hip below root when upright
    for ank in (ankle_l, ankle_r):
        horiz2 = np.sum((pel_xy - ank[:, :2]) ** 2, axis=1)
        cap = ank[:, 2] + hip_drop + np.sqrt(
            np.maximum(reach ** 2 - horiz2, 0.35 ** 2))
        pel_z = np.minimum(pel_z, cap)
    pel_z = np.convolve(np.pad(pel_z, (k, k), mode="edge"),
                        kern, "same")[k:-k] - 0.01
    pelvis_p = np.concatenate([pel_xy, pel_z[:, None]], 1)

    roll = rng.uniform(0.01, 0.04) * np.sin(2 * np.pi * fs * t)
    pitch = rng.uniform(0.0, 0.06)
    pelvis_R = (_yaw(psi)
                @ Rotation.from_euler("xy", np.stack(
                    [roll, np.full(T, pitch)], 1)).as_matrix()
                @ _R_ZUP.as_matrix())

    foot_R_l = _yaw(yaw_l) @ _R_ZUP.as_matrix()
    foot_R_r = _yaw(yaw_r) @ _R_ZUP.as_matrix()

    upper = _upper_body_walk(T, t, fs, rng)
    return _assemble(T, pelvis_p, pelvis_R, ankle_l, ankle_r,
                     foot_R_l, foot_R_r, upper)


def make_idle(rng, duration_s: float = 10.0):
    """Stand with weight shifts, torso/head motion, and arm reaches; feet
    planted (strong SBP signal at zero root velocity)."""
    T = int(duration_s * FPS)
    t = np.arange(T) / FPS
    geo_l, _ = leg_geometry()
    leg_drop = -(geo_l.hip_off[1] + geo_l.b1[1] + geo_l.b2[1])

    stance_w = rng.uniform(0.09, 0.16)
    yaw0 = rng.uniform(-np.pi, np.pi)
    left = np.array([-np.sin(yaw0), np.cos(yaw0)])
    c = rng.uniform(-1.0, 1.0, 2)
    ankle_l = np.tile(np.r_[c + stance_w * left, ANKLE_REST_H], (T, 1))
    ankle_r = np.tile(np.r_[c - stance_w * left, ANKLE_REST_H], (T, 1))

    # slow weight shift + bob; small pelvis yaw wander
    f1, f2 = rng.uniform(0.15, 0.45, 2)
    shift = rng.uniform(0.02, 0.06) * np.sin(2 * np.pi * f1 * t)
    dip = rng.uniform(0.0, 0.08) * (0.5 - 0.5 * np.cos(2 * np.pi * f2 * t))
    pel_xy = c + shift[:, None] * left
    pel_z = rng.uniform(0.94, 0.975) * leg_drop + ANKLE_REST_H - dip
    pelvis_p = np.concatenate([pel_xy, np.broadcast_to(
        pel_z[:, None] if np.ndim(pel_z) else np.full((T, 1), pel_z),
        (T, 1))], 1)
    yaw_osc = rng.uniform(0.0, 0.15) * np.sin(2 * np.pi * 0.2 * t)
    pelvis_R = _yaw(yaw0 + yaw_osc) @ _R_ZUP.as_matrix()
    foot_R = np.tile(_yaw(np.array([yaw0]))[0] @ _R_ZUP.as_matrix(),
                     (T, 1, 1))

    aa = np.zeros((T, 24, 3))
    J = cst.SMPL_JOINT_IDX
    drop = rng.uniform(1.15, 1.35)
    aa[:, J["lshoulder"], 2] = -drop
    aa[:, J["rshoulder"], 2] = drop
    # reaches: raise an arm along a random rotvec during each event
    for side, sgn in (("l", -1.0), ("r", 1.0)):
        env = _reach_envelope(T, t, rng, rng.integers(1, 4))
        ax = _unit(rng.normal(size=3))
        amp = rng.uniform(0.6, 1.4)
        base = aa[:, J[side + "shoulder"]]
        r = (Rotation.from_rotvec(np.outer(env * amp, ax))
             * Rotation.from_rotvec(base))
        aa[:, J[side + "shoulder"]] = r.as_rotvec()
        aa[:, J[side + "elbow"], 1] = sgn * rng.uniform(0.1, 0.6) * env
    aa[:, J["upperneck"]] = np.outer(
        0.15 * np.sin(2 * np.pi * rng.uniform(0.1, 0.3) * t),
        _unit(rng.normal(size=3)))
    aa[:, J["lowerback"], 0] = 0.05 * np.sin(2 * np.pi * f1 * t)

    return _assemble(T, pelvis_p, pelvis_R, ankle_l, ankle_r,
                     foot_R, foot_R, aa)


def make_squat(rng, duration_s: float = 9.0):
    """Repeated squats: feet planted, pelvis dips, arms raise forward."""
    T = int(duration_s * FPS)
    t = np.arange(T) / FPS
    geo_l, _ = leg_geometry()
    leg_drop = -(geo_l.hip_off[1] + geo_l.b1[1] + geo_l.b2[1])

    yaw0 = rng.uniform(-np.pi, np.pi)
    left = np.array([-np.sin(yaw0), np.cos(yaw0)])
    stance_w = rng.uniform(0.12, 0.18)
    ankle_l = np.tile(np.r_[stance_w * left, ANKLE_REST_H], (T, 1))
    ankle_r = np.tile(np.r_[-stance_w * left, ANKLE_REST_H], (T, 1))

    f = rng.uniform(0.2, 0.4)
    depth = rng.uniform(0.22, 0.42)
    dip = depth * 0.5 * (1 - np.cos(2 * np.pi * f * t))
    pel_z = 0.975 * leg_drop + ANKLE_REST_H - dip
    # hips shift slightly back while dipping
    back = np.stack([np.cos(yaw0), np.sin(yaw0)]) * (-0.25)
    pel_xy = np.outer(dip, back)
    pelvis_p = np.concatenate([pel_xy, pel_z[:, None]], 1)
    lean = 0.35 * dip / depth
    pelvis_R = (_yaw(np.full(T, yaw0))
                @ Rotation.from_euler("x", lean[:, None]).as_matrix()
                @ _R_ZUP.as_matrix())
    foot_R = np.tile(_yaw(np.array([yaw0]))[0] @ _R_ZUP.as_matrix(),
                     (T, 1, 1))

    aa = np.zeros((T, 24, 3))
    J = cst.SMPL_JOINT_IDX
    raise_amt = (dip / depth) * rng.uniform(0.8, 1.3)
    aa[:, J["lshoulder"]] = Rotation.from_euler("xz", np.stack(
        [raise_amt, -1.25 + 1.1 * raise_amt], 1)).as_rotvec()
    aa[:, J["rshoulder"]] = Rotation.from_euler("xz", np.stack(
        [raise_amt, 1.25 - 1.1 * raise_amt], 1)).as_rotvec()
    aa[:, J["lowerback"], 0] = -0.5 * lean     # spine counter-lean

    return _assemble(T, pelvis_p, pelvis_R, ankle_l, ankle_r,
                     foot_R, foot_R, aa)


def make_dance(rng, duration_s: float = 9.0):
    """Step-dance: feet do planned step-touch patterns around a spot with
    irregular timing (frequent short contacts at varied heights of the
    bumps profile), pelvis bounces and spins, big arm/torso swing fields.
    Fills the contact-statistics gap between gait (long stances) and
    freeform (no contacts)."""
    T = int(duration_s * FPS)
    t = np.arange(T) / FPS
    geo_l, _ = leg_geometry()
    leg_drop = -(geo_l.hip_off[1] + geo_l.b1[1] + geo_l.b2[1])

    center = rng.uniform(-1.0, 1.0, 2)
    spin = rng.uniform(-0.6, 0.6)
    psi = spin * t + rng.uniform(0.0, 0.25) * np.sin(
        2 * np.pi * rng.uniform(0.3, 0.8) * t)

    def plan_foot(sign, phase0):
        """Irregular step-touch sequence: randomized per-step period/duty,
        placements in an annulus around the center."""
        ankle = np.zeros((T, 3))
        fyaw = np.zeros(T)
        t0 = phase0
        prev = center + np.array([0.0, sign * 0.12])
        prev_z = ANKLE_REST_H
        yaw_prev = float(psi[0])
        ankle[:, :2] = prev
        ankle[:, 2] = prev_z
        fyaw[:] = yaw_prev
        while t0 < duration_s:
            period = rng.uniform(0.5, 1.1)
            duty = rng.uniform(0.45, 0.7)
            ang = rng.uniform(0, 2 * np.pi)
            r = rng.uniform(0.05, 0.3)
            place = center + r * np.array([np.cos(ang), np.sin(ang)]) \
                + np.array([0.0, sign * rng.uniform(0.08, 0.14)])
            pz = ANKLE_REST_H
            lift = t0 + duty * period
            t1 = t0 + period
            # foot yaw follows the body spin but only re-aims DURING swing
            # (held through stance, smoothly interpolated in flight — a
            # step change here becomes a one-frame gyro spike in the
            # synthesized ankle IMUs)
            yaw_new = float(np.interp(min(t1, duration_s - 1e-6), t, psi))
            m_st = (t >= t0) & (t < lift)
            m_sw = (t >= lift) & (t < t1)
            ankle[m_st, :2] = prev
            ankle[m_st, 2] = prev_z
            fyaw[m_st] = yaw_prev
            if m_sw.any():
                s = (t[m_sw] - lift) / max(t1 - lift, 1e-6)
                h = _smoothstep(s)[:, None]
                ankle[m_sw, :2] = (1 - h) * prev + h * place
                ankle[m_sw, 2] = (prev_z + (pz - prev_z) * h[:, 0]
                                  + rng.uniform(0.03, 0.12)
                                  * np.sin(np.pi * s))
                fyaw[m_sw] = yaw_prev + (yaw_new - yaw_prev) * _smoothstep(s)
            m_after = t >= t1
            ankle[m_after, :2] = place
            ankle[m_after, 2] = pz
            fyaw[m_after] = yaw_new
            prev, prev_z, t0, yaw_prev = place, pz, t1, yaw_new
        return ankle, fyaw

    ankle_l, yaw_l = plan_foot(+1.0, 0.0)
    ankle_r, yaw_r = plan_foot(-1.0, rng.uniform(0.2, 0.6))

    tempo = rng.uniform(0.8, 2.0)
    bounce = rng.uniform(0.03, 0.1)
    pel_xy = (0.5 * (ankle_l[:, :2] + ankle_r[:, :2])
              + rng.uniform(0.0, 0.04)
              * np.sin(2 * np.pi * tempo * t)[:, None]
              * np.stack([-np.sin(psi), np.cos(psi)], 1))
    k = int(0.3 * FPS)
    kern = np.ones(k) / k
    pel_xy = np.stack([np.convolve(np.pad(pel_xy[:, i], (k, k), mode="edge"),
                                   kern, "same")[k:-k] for i in range(2)], 1)
    pel_z = (rng.uniform(0.93, 0.97) * leg_drop + ANKLE_REST_H
             - bounce * 0.5 * (1 - np.cos(2 * np.pi * tempo * t)))
    pelvis_p = np.concatenate([pel_xy, pel_z[:, None]], 1)
    roll = rng.uniform(0.0, 0.08) * np.sin(2 * np.pi * tempo * t)
    pelvis_R = (_yaw(psi)
                @ Rotation.from_euler("xy", np.stack(
                    [roll, np.full(T, rng.uniform(0.0, 0.08))], 1)).as_matrix()
                @ _R_ZUP.as_matrix())
    foot_R_l = _yaw(yaw_l) @ _R_ZUP.as_matrix()
    foot_R_r = _yaw(yaw_r) @ _R_ZUP.as_matrix()

    upper = _upper_body_walk(T, t, tempo, rng,
                             arm_amp=rng.uniform(0.4, 0.8))
    J = cst.SMPL_JOINT_IDX
    for j in ("lowerback", "chest", "upperneck"):
        ax = _unit(rng.normal(size=3))
        upper[:, J[j]] += np.outer(
            rng.uniform(0.05, 0.25)
            * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t
                     + rng.uniform(0, 2 * np.pi)), ax)
    return _assemble(T, pelvis_p, pelvis_R, ankle_l, ankle_r,
                     foot_R_l, foot_R_r, upper)


def make_freeform(rng, duration_s: float = 8.0):
    """Random multi-joint swing field (the e2e demo family): keeps the
    corpus from collapsing onto gait statistics; mostly airborne feet."""
    T = int(duration_s * FPS)
    t = np.arange(T) / FPS
    poses = np.zeros((T, 24, 3))
    poses[:, 0] = _R_ZUP.as_rotvec()
    for j in (1, 2, 4, 5, 7, 8, 3, 6, 9, 12, 15, 16, 17, 18, 19):
        amp = rng.uniform(0.05, 0.45)
        f = rng.uniform(0.3, 1.2)
        ph = rng.uniform(0, 2 * np.pi)
        ax = _unit(rng.normal(size=3))
        poses[:, j] = np.outer(amp * np.sin(2 * np.pi * f * t + ph), ax)
    trans = np.zeros((T, 3))
    trans[:, 2] = 0.95 + 0.03 * np.sin(2 * np.pi * 0.9 * t)
    trans[:, 0] = rng.uniform(-0.5, 0.5) * t
    trans[:, 1] = rng.uniform(-0.3, 0.3) * t
    return smpl.SmplMotion(poses=poses, trans=trans, fps=FPS)


# corpus mix: (family, weight, kwargs sampler)
_FAMILIES = (
    ("walk_flat", 0.27, lambda rng: dict(terrain="flat")),
    ("walk_ramp", 0.11, lambda rng: dict(terrain="ramp")),
    ("walk_stairs", 0.17, lambda rng: dict(terrain="stairs")),
    ("walk_bumps", 0.08, lambda rng: dict(terrain="bumps")),
    ("idle", 0.11, lambda rng: dict()),
    ("squat", 0.09, lambda rng: dict()),
    ("dance", 0.10, lambda rng: dict()),
    ("freeform", 0.07, lambda rng: dict()),
)


def make_motion(rng, family: Optional[str] = None,
                duration_s: Optional[float] = None):
    """One random motion; family sampled from the corpus mix when None.
    duration_s overrides the per-family random duration (fixed-length
    held-out sets compile once per runner shape in the eval harness)."""
    if family is None:
        w = np.array([f[1] for f in _FAMILIES])
        family = _FAMILIES[rng.choice(len(_FAMILIES), p=w / w.sum())][0]
    kw = next(kws for n, _, kws in _FAMILIES if n == family)(rng)

    def dur(lo, hi):
        if duration_s is not None:
            return duration_s
        # quantize to 2 s steps: motion LENGTH diversity is not useful
        # signal, but every distinct length is a fresh XLA compile of the
        # whole FK/SBP synthesis pipeline (jit caches are per-shape)
        return float(rng.integers(int(lo) // 2, int(hi) // 2 + 1) * 2)

    if family.startswith("walk"):
        return family, make_walk(rng, duration_s=dur(8, 16), **kw)
    if family == "idle":
        return family, make_idle(rng, duration_s=dur(6, 12))
    if family == "squat":
        return family, make_squat(rng, duration_s=dur(6, 10))
    if family == "dance":
        return family, make_dance(rng, duration_s=dur(6, 12))
    return family, make_freeform(rng, duration_s=dur(5, 10))


def generate_corpus(out_dir: str, n_motions: int, seed: int = 0,
                    start: int = 0, duration_s: Optional[float] = None,
                    log=print) -> int:
    """Write `n_motions` synthesized training pickles into out_dir.

    Resumable/idempotent like the reference generator (existing outputs are
    skipped, data-gen-and-viz-bullet-new.py:245-247): motion i derives its
    RNG from (seed, i), so reruns and partial runs produce identical files.
    Returns the number of motions written this call.
    """
    from tip_tpu.data_gen import amass_syn
    os.makedirs(out_dir, exist_ok=True)
    wrote = 0
    for i in range(start, start + n_motions):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        w = np.array([f[1] for f in _FAMILIES])
        family = _FAMILIES[int(rng.choice(len(_FAMILIES), p=w / w.sum()))][0]
        path = os.path.join(out_dir, f"{family}_{i:04d}.pkl")
        if os.path.exists(path):
            continue
        _, motion = make_motion(rng, family, duration_s=duration_s)
        payload = amass_syn.synthesize(motion, rng=rng)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        wrote += 1
        if wrote % 25 == 0:
            log(f"corpus: {wrote} motions written (at index {i})")
    return wrote
