"""PD control torques for spherical-joint characters.

The reference carries explicit PD force computation from ScaDiver
(bullet_utils.compute_PD_forces, bullet_utils.py:330-364; gains in
amass_char_info.py:225-280) — unused on TIP's kinematic hot path but part of
the character-animation surface. Provided here as a batched JAX op: the
quaternion error is the axis-angle of (current⁻¹ ∘ desired), matching
PyBullet's getAxisDifferenceQuaternion semantics.
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
