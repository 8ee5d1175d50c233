"""Evaluation metrics — the 7-metric suite of the reference harness.

Definitions from reference data_utils.py:314-391; consumed by the offline
evaluation driver the same way offline_testing_simple.py:439-445 does.
All functions take full trajectories and reduce to scalars.

  aa_*: (T, 57) bullet-format poses (xyz + root aa + 17 joint aa)
  pq_g_*: (T, 20, 7) global link (p, q) from FK; traj 2 is the prediction.
"""

import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu.ops import rotations as rot

_RAD2DEG = 180.0 / 3.1416          # the reference's constant (data_utils.py:327)


def loss_angle(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """Mean local joint angle error in degrees (data_utils.py:314-327)."""
    a1 = aa_1[:, 3:].reshape(-1, 3)
    a2 = aa_2[:, 3:].reshape(-1, 3)
    dq = rot.q_diff(rot.aa_to_q(a1), rot.aa_to_q(a2))
    dq = dq * jnp.sign(jnp.where(dq[:, 3:4] == 0, 1.0, dq[:, 3:4]))
    ang = jnp.linalg.norm(rot.q_to_aa(dq), axis=1)
    return jnp.mean(ang) * _RAD2DEG


def loss_j_pos(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """Mean root-relative joint position error in cm (data_utils.py:330-337)."""
    p1 = pq_g_1[:, 1:, :3] - pq_g_1[:, 0:1, :3]
    p2 = pq_g_2[:, 1:, :3] - pq_g_2[:, 0:1, :3]
    d = jnp.linalg.norm((p2 - p1).reshape(-1, 3), axis=1)
    return jnp.mean(d) * 100.0


def loss_global_angle(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """Mean global link angle error in degrees (data_utils.py:340-356)."""
    q1 = pq_g_1[..., 3:].reshape(-1, 4)
    q2 = pq_g_2[..., 3:].reshape(-1, 4)
    dq = rot.q_diff(q1, q2)
    dq = dq * jnp.sign(jnp.where(dq[:, 3:4] == 0, 1.0, dq[:, 3:4]))
    ang = jnp.linalg.norm(rot.q_to_aa(dq), axis=1)
    return jnp.mean(ang) * _RAD2DEG


def loss_max_jerk(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """Mean 3rd-difference jerk of predicted link positions x100
    (data_utils.py:359-368; despite the name it averages, not maxes)."""
    p = pq_g_2[..., :3]
    jerk = p[3:] - 3 * p[2:-1] + 3 * p[1:-2] - p[:-3]
    return jnp.mean(jnp.linalg.norm(jerk, axis=2)) * 100.0


def loss_root_jerk(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """Root jerk x100 (data_utils.py:371-378)."""
    p = pq_g_2[:, 0, :3]
    jerk = p[3:] - 3 * p[2:-1] + 3 * p[1:-2] - p[:-3]
    return jnp.mean(jnp.linalg.norm(jerk, axis=1)) * 100.0


def loss_sip(aa_1, aa_2, pq_g_1=None, pq_g_2=None):
    """SIP error: mean global orientation error of hips and shoulders in
    degrees — the standard sparse-IMU benchmark metric (named in the
    project north star; computed like loss_global_angle restricted to
    lhip/rhip/lshoulder/rshoulder links)."""
    rows = jnp.asarray([1, 4, 13, 17])     # link slots: joint idx + 1
    q1 = pq_g_1[:, rows, 3:].reshape(-1, 4)
    q2 = pq_g_2[:, rows, 3:].reshape(-1, 4)
    dq = rot.q_diff(q1, q2)
    dq = dq * jnp.sign(jnp.where(dq[:, 3:4] == 0, 1.0, dq[:, 3:4]))
    ang = jnp.linalg.norm(rot.q_to_aa(dq), axis=1)
    return jnp.mean(ang) * _RAD2DEG


def loss_root_dist_pos(aa_1, aa_2, pq_g_1=None, pq_g_2=None, t: float = 1.0):
    """Root drift after t seconds, meters (data_utils.py:381-391)."""
    ind = int(t / cst.DT) - 1
    ind = min(ind, pq_g_1.shape[0] - 1)
    d1 = pq_g_1[ind, 0, :3] - pq_g_1[0, 0, :3]
    d2 = pq_g_2[ind, 0, :3] - pq_g_2[0, 0, :3]
    return jnp.linalg.norm(d1 - d2)
