"""Batched rotation codecs in JAX.

Conventions match the reference pipeline (fairmotion / scipy / PyBullet):
  * quaternions are (x, y, z, w),
  * axis-angle is a rotation vector (axis * angle),
  * ``q_mult(a, b)`` satisfies ``to_matrix(q_mult(a,b)) == to_matrix(a) @ to_matrix(b)``.

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap/grad friendly (no data-dependent branches).

The 6D ("two-axis") codec reproduces the reference's exact decode rule
(/root/reference/data_utils.py:164-187): both columns are normalised with a
+1e-6 denominator and the third column is their cross product — the second
column is *not* re-orthogonalised against the first.
"""

import jax.numpy as jnp

_EPS = 1e-12


def _cos(x):
    """cos via sin(π/2 − x).

    The XLA CPU backend's float64 ``cos`` is only float32-accurate (~2⁻²⁶
    error, observed on jaxlib 0.9.0) while ``sin`` is correctly rounded;
    this keeps the rotation codecs exact enough for 1e-10 golden tests.
    """
    return jnp.sin(0.5 * jnp.pi - x)


def q_mult(q1, q2):
    """Hamilton product, xyzw. R(q1∘q2) = R(q1) @ R(q2)."""
    v1, w1 = q1[..., :3], q1[..., 3:4]
    v2, w2 = q2[..., :3], q2[..., 3:4]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([v, w], axis=-1)


def q_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def q_inv(q):
    """Inverse for unit quaternions (= conjugate)."""
    return q_conj(q)


def q_diff(q1, q2):
    """Relative rotation q1 ∘ q2⁻¹ (matches fairmotion quaternion.Q_diff usage
    in the angle metrics, where only the rotation magnitude is consumed)."""
    return q_mult(q1, q_inv(q2))


def q_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q."""
    qv, qw = q[..., :3], q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def q_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def _safe_norm(v):
    """norm(v) with a clean (zero) gradient at v = 0: the norm's derivative
    is undefined there and naive where-tricks only guard the primal — the
    NaN still leaks through sqrt's backward. Clamping the sum of squares at
    1e-24 (like the Pallas FK kernel) keeps the primal bit-identical for
    |v| >= 1e-12 and makes the gradient exactly 0 at the origin."""
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                1e-24))


def aa_to_q(aa):
    """Rotation vector -> quaternion (xyzw). grad-safe at zero rotation."""
    angle = _safe_norm(aa)
    half = 0.5 * angle
    # sin(θ/2)/θ with a 2nd-order Taylor fallback near zero
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - angle * angle / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([aa * k, _cos(half)], axis=-1)


def q_to_aa(q):
    """Quaternion (xyzw) -> rotation vector with angle in [0, π]. grad-safe
    at the identity quaternion."""
    q = q * jnp.sign(jnp.where(q[..., 3:4] == 0.0, 1.0, q[..., 3:4]))
    v = q[..., :3]
    s = _safe_norm(v)
    w = q[..., 3:4]
    angle = 2.0 * jnp.arctan2(s, w)
    small = s < 1e-6
    # θ/s = 2·atan2(s,w)/s ≈ 2/w · (1 − s²/(3w²)) for small s (w≈1)
    k = jnp.where(small,
                  2.0 / jnp.maximum(jnp.abs(w), 1e-6)
                  * (1.0 - s * s / (3.0 * jnp.maximum(w * w, 1e-6))),
                  angle / jnp.where(small, 1.0, s))
    return v * k


def q_to_matrix(q):
    """Quaternion (xyzw) -> 3x3 rotation matrix."""
    q = q_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_q(m):
    """3x3 rotation matrix -> quaternion (xyzw), branchless Shepperd method.

    Computes all four candidate quaternions (one per largest diagonal-ish
    element) and selects the numerically safest — no data-dependent control
    flow, safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22      # 4w²
    tx = 1.0 + m00 - m11 - m22      # 4x²
    ty = 1.0 - m00 + m11 - m22      # 4y²
    tz = 1.0 - m00 - m11 + m22      # 4z²

    def safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, _EPS))

    # candidate built from w
    qw_w = safe_sqrt(tw) / 2.0
    q_w = jnp.stack([(m21 - m12) / (4 * qw_w), (m02 - m20) / (4 * qw_w),
                     (m10 - m01) / (4 * qw_w), qw_w], axis=-1)
    # from x
    qx_x = safe_sqrt(tx) / 2.0
    q_x = jnp.stack([qx_x, (m01 + m10) / (4 * qx_x), (m02 + m20) / (4 * qx_x),
                     (m21 - m12) / (4 * qx_x)], axis=-1)
    # from y
    qy_y = safe_sqrt(ty) / 2.0
    q_y = jnp.stack([(m01 + m10) / (4 * qy_y), qy_y, (m12 + m21) / (4 * qy_y),
                     (m02 - m20) / (4 * qy_y)], axis=-1)
    # from z
    qz_z = safe_sqrt(tz) / 2.0
    q_z = jnp.stack([(m02 + m20) / (4 * qz_z), (m12 + m21) / (4 * qz_z),
                     qz_z, (m10 - m01) / (4 * qz_z)], axis=-1)

    t_all = jnp.stack([tw, tx, ty, tz], axis=-1)
    q_all = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)
    best = jnp.argmax(t_all, axis=-1)
    # one-hot select (exact: weights are 0/1 and candidates are finite) —
    # an elementwise-fusable alternative to take_along_axis, whose gather
    # costs ~10 us per call on the latency-bound streaming path
    onehot = (best[..., None] == jnp.arange(4)).astype(q_all.dtype)
    q = jnp.sum(q_all * onehot[..., None], axis=-2)
    q = q_normalize(q)
    # canonical sign: w >= 0 (matches scipy as_quat up to this convention)
    return q * jnp.sign(jnp.where(q[..., 3:4] == 0.0, 1.0, q[..., 3:4]))


def aa_to_matrix(aa):
    return q_to_matrix(aa_to_q(aa))


def matrix_to_aa(m):
    return q_to_aa(matrix_to_q(m))


# ---------------------------------------------------------------------------
# 6D ("two-axis") rotation codec — reference data_utils.py:164-187
# ---------------------------------------------------------------------------

def aa_to_sixd(aa):
    """Rotation vector(s) (..., 3) -> first two matrix *columns* (..., 6).

    Layout matches the reference: R[:, :2] flattened row-major, i.e.
    (r00, r01, r10, r11, r20, r21) — reference data_utils.py:182-187.
    """
    r = aa_to_matrix(aa)
    return r[..., :, :2].reshape(aa.shape[:-1] + (6,))


def sixd_to_matrix(sixd):
    """(..., 6) two-axis encoding -> full rotation matrix.

    Exact reference decode (data_utils.py:164-179): normalise both columns
    with +1e-6 in the denominator, third column = cross(col0, col1). No
    re-orthogonalisation of col1 — the result is only approximately a
    rotation for non-orthogonal inputs, as in the reference.
    """
    cols = sixd.reshape(sixd.shape[:-1] + (3, 2))
    a1 = cols[..., 0]
    a2 = cols[..., 1]
    a1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-6)
    a2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + 1e-6)
    a3 = jnp.cross(a1, a2)
    return jnp.stack([a1, a2, a3], axis=-1)


def sixd_to_aa(sixd):
    return matrix_to_aa(sixd_to_matrix(sixd))


def slerp(q0, q1, t):
    """Spherical interpolation between unit quaternions (xyzw)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0.0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    near = sin_t < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_t))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_t))
    return q_normalize(w0 * q0 + w1 * q1)


def angular_velocity_from_quats(q1, q2, dt):
    """Finite-difference angular velocity (world frame) between two quats.

    Reproduces the reference's formula (data_utils.py:35-37,397-401):
    sub = (q2 - q1) or (q2 + q1), whichever is smaller in norm-distance,
    w = (2 * sub ∘ q2⁻¹ / dt)[:3].
    """
    d_minus = jnp.linalg.norm(q2 - q1, axis=-1, keepdims=True)
    d_plus = jnp.linalg.norm(q2 + q1, axis=-1, keepdims=True)
    sub = jnp.where(d_minus < d_plus, q2 - q1, q2 + q1)
    dori = 2.0 * q_mult(sub, q_conj(q2))
    return dori[..., :3] / dt
