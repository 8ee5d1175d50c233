"""Two-joint IK: geometric correctness on the actual character legs/arms."""

import numpy as np

import jax.numpy as jnp

from tip_tpu.ops import ik as ik_ops
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import rotations as rot

RNG = np.random.default_rng(5)


def leg_chain_frames(s):
    """Joint-frame pq of (root, lhip, lknee, lankle) from a bullet pose."""
    skel = kin.amass_skeleton(dtype=jnp.float64)
    _, pq_jf = kin.fk_bullet_state(skel, jnp.asarray(s), True)
    return np.asarray(pq_jf), skel


def make_pose():
    s = np.zeros(57)
    s[2] = 0.9
    # bend the left leg a bit so the chain is away from singularities
    s[6:9] = [0.4, 0.05, 0.1]     # lhip
    s[9:12] = [0.7, 0.0, 0.0]     # lknee
    s[12:15] = [-0.2, 0.1, 0.0]   # lankle
    return s


def apply_leg_ik_and_refk(s, delta):
    pq_jf, skel = leg_chain_frames(s)
    a_q, b_q, c_q = ik_ops.leg_two_joint_ik_keep_foot(
        jnp.asarray(pq_jf[0]), jnp.asarray(pq_jf[1]), jnp.asarray(pq_jf[2]),
        jnp.asarray(pq_jf[3]), jnp.asarray(delta))
    s2 = s.copy()
    s2[6:9] = np.asarray(rot.q_to_aa(a_q))
    s2[9:12] = np.asarray(rot.q_to_aa(b_q))
    s2[12:15] = np.asarray(rot.q_to_aa(c_q))
    pq_jf2, _ = leg_chain_frames(s2)
    return pq_jf, pq_jf2


def test_leg_ik_reaches_target():
    s = make_pose()
    delta = np.array([0.05, -0.04, 0.06])
    pq0, pq1 = apply_leg_ik_and_refk(s, delta)
    target = pq0[3, :3] + delta
    err = np.linalg.norm(pq1[3, :3] - target)
    assert err < 5e-3, err


def test_leg_ik_keeps_foot_orientation():
    s = make_pose()
    delta = np.array([0.03, 0.02, -0.05])
    pq0, pq1 = apply_leg_ik_and_refk(s, delta)
    # lankle link (row 3) global orientation preserved
    d = rot.q_mult(rot.q_inv(jnp.asarray(pq0[3, 3:])), jnp.asarray(pq1[3, 3:]))
    ang = np.linalg.norm(np.asarray(rot.q_to_aa(d)))
    assert ang < 1e-5, ang


def test_zero_delta_is_identity():
    s = make_pose()
    pq0, pq1 = apply_leg_ik_and_refk(s, np.zeros(3))
    np.testing.assert_allclose(pq1[:, :3], pq0[:, :3], atol=1e-3)  # reference-matching 1e-4 normalize eps drifts ~3e-4


def test_arm_ik_reaches_target():
    skel = kin.amass_skeleton(dtype=jnp.float64)
    s = np.zeros(57)
    # bend left elbow (lshoulder joint 12, lelbow 13; chain lclavicle 11)
    s[6 + 12 * 3: 9 + 12 * 3] = [0.1, 0.3, 0.2]
    s[6 + 13 * 3: 9 + 13 * 3] = [0.0, -0.8, 0.1]
    _, pq = kin.fk_bullet_state(skel, jnp.asarray(s), True)
    pq = np.asarray(pq)
    # chain: lclavicle(11) parent, lshoulder(12)=a, lelbow(13)=b, lwrist(14)=c
    delta = np.array([-0.03, 0.05, 0.04])
    a_q, b_q = ik_ops.two_joint_ik(
        jnp.asarray(pq[12]), jnp.asarray(pq[13]), jnp.asarray(pq[14]),
        jnp.asarray(pq[15]), jnp.asarray(delta), is_arm=True)
    s2 = s.copy()
    s2[6 + 12 * 3: 9 + 12 * 3] = np.asarray(rot.q_to_aa(a_q))
    s2[6 + 13 * 3: 9 + 13 * 3] = np.asarray(rot.q_to_aa(b_q))
    _, pq2 = kin.fk_bullet_state(skel, jnp.asarray(s2), True)
    target = pq[15, :3] + delta
    err = np.linalg.norm(np.asarray(pq2)[15, :3] - target)
    assert err < 5e-3, err
