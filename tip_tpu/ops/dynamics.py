"""PD-family control torques for spherical-joint characters.

The reference carries the ScaDiver actuation surface: explicit PD force
computation (bullet_utils.compute_PD_forces, bullet_utils.py:330-364),
plus SPD / PD / CPD gain modes that delegate to PyBullet's in-engine
controllers (bullet_agent.actuate, bullet_agent.py:551-676; gains in
amass_char_info.py:225-280, cpd_ratio 0.0002 at :257).  All of it is
explicitly unused on TIP's kinematic hot path ("things related to dynamics
(not kinematics) are not used", bullet_agent.py:2) but is part of the
character-animation surface, so the new framework provides the torque math
as batched JAX ops:

  * `pd_torques` — explicit PD (compute_PD_forces): quaternion error is the
    axis-angle of (current⁻¹ ∘ desired), PyBullet's
    getAxisDifferenceQuaternion semantics;
  * `spd_torques` — stable PD (the mass-matrix-free form of Tan et al.'s
    SPD, which is what makes Bullet's STABLE_PD_CONTROL robust at large
    kp·dt): the position error is evaluated at the Δt-PREDICTED joint
    rotation, which adds an implicit kp·Δt damping term; the explicit kd
    damping stays on the current velocity (full SPD would also damp the
    next-step velocity estimate through the mass matrix — there is no
    dynamics engine here, see spd_torques' docstring);
  * `mode_gains` — the reference's per-mode gain quirks (SPD: kp/kd as-is;
    PD: 1.5·kp, 0.01·kd, bullet_agent.py:607-609; CPD/CP/V: cpd_ratio
    scaled, :610-614).

Documented divergence: Bullet's POSITION/VELOCITY constraint controllers
(CPD/CP/V modes) solve the servo inside the LCP contact solver; there is no
physics engine here, so those modes are represented by their gain tables +
explicit torque math only.
"""

import jax.numpy as jnp

from tip_tpu.ops import rotations as rot

# per-joint PD gains / force limits in bullet joint order
# (reference amass_char_info.py:225-280; kd = 0.1 kp)
KP = jnp.asarray([500., 400, 300, 500, 400, 300, 500, 500, 500, 200, 200,
                  400, 400, 300, 0, 400, 400, 300, 0])
KD = 0.1 * KP
MAX_FORCE = jnp.asarray([300., 200, 100, 300, 200, 100, 300, 300, 300, 100,
                         100, 200, 200, 150, 0, 200, 200, 150, 0])
CPD_RATIO = 2e-4                 # reference amass_char_info.py:257


def mode_gains(mode: str):
    """(kp, kd) per actuation mode (reference bullet_agent.py:602-614)."""
    if mode == "SPD":
        return KP, KD
    if mode == "PD":
        return 1.5 * KP, 0.01 * KD
    if mode in ("CPD", "CP", "V"):
        return CPD_RATIO * KP, CPD_RATIO * KD
    raise ValueError(f"unknown actuation mode {mode!r}")


def pd_torques(q_cur, q_des, w_cur, w_des, kp=KP, kd=KD,
               max_force=MAX_FORCE):
    """Batched spherical-joint PD torques.

    Args:
      q_cur/q_des: (..., J, 4) current/desired local joint quaternions (xyzw)
      w_cur/w_des: (..., J, 3) current/desired local angular velocities
    Returns (..., J, 3) torques, clipped to the per-joint force limits.
    """
    q_err = rot.q_to_aa(rot.q_mult(rot.q_conj(q_cur), q_des))
    tau = kp[..., :, None] * q_err + kd[..., :, None] * (w_des - w_cur)
    lim = max_force[..., :, None]
    return jnp.clip(tau, -lim, lim)


def spd_torques(q_cur, q_des, w_cur, w_des, dt: float, kp=KP, kd=KD,
                max_force=MAX_FORCE):
    """Stable-PD torques (mass-matrix-free SPD).

    The explicit PD above goes unstable once kp·dt² gets large relative to
    the link inertia; SPD (Tan, Liu & Turk 2011 — the algorithm behind
    PyBullet's STABLE_PD_CONTROL used by the reference's Actuation.SPD,
    bullet_agent.py:619-627) restores stability by evaluating the
    proportional error at the dt-PREDICTED rotation:

        tau = kp * log( (q_cur ⊕ dt·w_cur)⁻¹ ∘ q_des ) + kd * (w_des - w_cur)

    i.e. the controller damps the position error it would otherwise
    overshoot into.  (Bullet additionally solves through the joint-space
    mass matrix; without a dynamics engine the inertia term is identity —
    the predicted-state evaluation is what carries the stability property,
    see tests/test_dynamics.py.)

    Args mirror pd_torques plus the control timestep dt.
    """
    q_pred = rot.q_mult(q_cur, rot.aa_to_q(w_cur * dt))
    q_err = rot.q_to_aa(rot.q_mult(rot.q_conj(q_pred), q_des))
    tau = kp[..., :, None] * q_err + kd[..., :, None] * (w_des - w_cur)
    lim = max_force[..., :, None]
    return jnp.clip(tau, -lim, lim)
