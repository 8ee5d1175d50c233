"""Analytic two-joint (two-bone) IK in quaternion space.

JAX re-design of reference data_utils.two_joint_ik /
leg_two_joint_ik_keep_foot_pointing (data_utils.py:551-630) — the
"orange-duck" construction: correct the a-b / b-c interior angles from the
triangle law of cosines, then swing the chain so the end effector reaches the
target; the leg variant additionally re-aims the ankle so the global foot
orientation is preserved.

All inputs are joint-frame (p, q) 7-vectors; quaternions xyzw.
"""

from typing import Tuple

import jax.numpy as jnp

from tip_tpu.ops import rotations as rot


def _normalize(v):
    return v / (jnp.linalg.norm(v) + 1e-4)   # same epsilon as reference :551-553


def _acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def two_joint_ik(pq_jf_pa, pq_jf_a, pq_jf_b, pq_jf_c, c_delta,
                 is_arm: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns new LOCAL quaternions for joints a (hip/shoulder) and b
    (knee/elbow) moving end effector c by world-space c_delta."""
    a, b, c = pq_jf_a[:3], pq_jf_b[:3], pq_jf_c[:3]
    a_q_g, b_q_g = pq_jf_a[3:], pq_jf_b[3:]
    parent_q_inv = rot.q_conj(pq_jf_pa[3:])

    target = c + c_delta

    eps = 0.01
    lab = jnp.linalg.norm(b - a)
    lcb = jnp.linalg.norm(c - b)
    lat = jnp.clip(jnp.linalg.norm(target - a), eps, lab + lcb - eps)

    ac_ab_0 = _acos(jnp.dot(_normalize(c - a), _normalize(b - a)))
    ba_bc_0 = _acos(jnp.dot(_normalize(a - b), _normalize(c - b)))
    ac_at_0 = _acos(jnp.dot(_normalize(c - a), _normalize(target - a)))

    ac_ab_1 = _acos((lcb * lcb - lab * lab - lat * lat) / (-2 * lab * lat))
    ba_bc_1 = _acos((lat * lat - lab * lab - lcb * lcb) / (-2 * lab * lcb))

    # bend axis: perpendicular to the chain, oriented by the T-pose
    # elbow/knee pointing direction in the a-joint frame
    v = jnp.where(is_arm, jnp.asarray([0.0, 0.0, -1.0]),
                  jnp.asarray([0.0, 0.0, 1.0]))
    d = rot.q_rotate(a_q_g, v)
    axis0_g = _normalize(jnp.cross(c - a, d))
    axis1_g = _normalize(jnp.cross(c - a, target - a))

    axis0_l = rot.q_rotate(parent_q_inv, axis0_g)
    axis1_l = rot.q_rotate(rot.q_conj(a_q_g), axis1_g)

    r0 = rot.aa_to_q(axis0_l * (ac_ab_1 - ac_ab_0))
    r1 = rot.aa_to_q(axis0_l * (ba_bc_1 - ba_bc_0))
    r2 = rot.aa_to_q(axis1_l * ac_at_0)

    a_q_l = rot.q_mult(parent_q_inv, a_q_g)
    b_q_l = rot.q_mult(rot.q_conj(a_q_g), b_q_g)
    a_q_l_1 = rot.q_mult(a_q_l, rot.q_mult(r0, r2))
    b_q_l_1 = rot.q_mult(b_q_l, r1)
    return a_q_l_1, b_q_l_1


def leg_two_joint_ik_keep_foot(pq_jf_pa, pq_jf_a, pq_jf_b, pq_jf_c, c_delta):
    """Leg variant: also returns the new LOCAL ankle quaternion that keeps the
    global foot orientation unchanged (data_utils.py:611-630)."""
    c_q_g = pq_jf_c[3:]
    pa_q_g = pq_jf_pa[3:]

    a_q_l_1, b_q_l_1 = two_joint_ik(pq_jf_pa, pq_jf_a, pq_jf_b, pq_jf_c,
                                    c_delta, is_arm=False)
    a_q_g_1 = rot.q_mult(pa_q_g, a_q_l_1)
    b_q_g_1 = rot.q_mult(a_q_g_1, b_q_l_1)
    c_q_l_1 = rot.q_mult(rot.q_conj(b_q_g_1), c_q_g)
    return a_q_l_1, b_q_l_1, c_q_l_1
