"""Rotation codec golden tests vs scipy (the reference's fairmotion backend)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp
from tip_tpu.ops import rotations as rot

RNG = np.random.default_rng(0)


def rand_aa(n=256):
    axis = RNG.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = RNG.uniform(0, np.pi - 1e-3, size=(n, 1))
    return axis * angle


def test_aa_q_roundtrip_vs_scipy():
    aa = rand_aa()
    q_ref = Rotation.from_rotvec(aa).as_quat()        # xyzw
    q = np.asarray(rot.aa_to_q(jnp.asarray(aa)))
    # scipy sign convention: w >= 0 for rotvec inputs with angle in [0, pi]
    np.testing.assert_allclose(q, q_ref, atol=1e-7)
    aa_back = np.asarray(rot.q_to_aa(jnp.asarray(q_ref)))
    np.testing.assert_allclose(aa_back, aa, atol=1e-7)


def test_small_angle_stability():
    aa = RNG.normal(size=(64, 3)) * 1e-9
    q = np.asarray(rot.aa_to_q(jnp.asarray(aa)))
    np.testing.assert_allclose(q[:, 3], 1.0, atol=1e-9)
    aa_back = np.asarray(rot.q_to_aa(rot.aa_to_q(jnp.asarray(aa))))
    np.testing.assert_allclose(aa_back, aa, atol=1e-9)


def test_matrix_roundtrip_vs_scipy():
    aa = rand_aa()
    m_ref = Rotation.from_rotvec(aa).as_matrix()
    m = np.asarray(rot.aa_to_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(m, m_ref, atol=1e-7)
    q = np.asarray(rot.matrix_to_q(jnp.asarray(m_ref)))
    q_ref = Rotation.from_matrix(m_ref).as_quat()
    # compare up to sign
    sign = np.sign(np.sum(q * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q_ref * sign, atol=1e-7)


def test_q_mult_composition():
    aa1, aa2 = rand_aa(128), rand_aa(128)
    q1, q2 = rot.aa_to_q(jnp.asarray(aa1)), rot.aa_to_q(jnp.asarray(aa2))
    m = np.asarray(rot.q_to_matrix(rot.q_mult(q1, q2)))
    m_ref = (Rotation.from_rotvec(aa1) * Rotation.from_rotvec(aa2)).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-7)


def test_q_rotate():
    aa = rand_aa(64)
    v = RNG.normal(size=(64, 3))
    out = np.asarray(rot.q_rotate(rot.aa_to_q(jnp.asarray(aa)), jnp.asarray(v)))
    ref = Rotation.from_rotvec(aa).apply(v)
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_sixd_codec_matches_reference_rule():
    """The 6D decode must reproduce data_utils.py:164-187 exactly, including
    the +1e-6 denominators and no re-orthogonalisation of column 1."""
    aa = rand_aa(64)
    sixd = np.asarray(rot.aa_to_sixd(jnp.asarray(aa)))
    # reference layout: R[:, :2] flattened row-major
    m_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(sixd, m_ref[:, :, :2].reshape(64, 6), atol=1e-7)

    # independent numpy transcription of the reference decode rule
    rm = sixd.reshape(-1, 3, 2)
    a1 = rm[:, :, 0] / (np.linalg.norm(rm[:, :, 0], axis=1, keepdims=True) + 1e-6)
    a2 = rm[:, :, 1] / (np.linalg.norm(rm[:, :, 1], axis=1, keepdims=True) + 1e-6)
    a3 = np.cross(a1, a2)
    m_expected = np.stack([a1, a2, a3], axis=2)

    m = np.asarray(rot.sixd_to_matrix(jnp.asarray(sixd)))
    np.testing.assert_allclose(m, m_expected, atol=1e-7)

    # noisy (non-orthogonal) input: still must match the reference rule
    noisy = sixd + RNG.normal(size=sixd.shape) * 0.05
    rm = noisy.reshape(-1, 3, 2)
    a1 = rm[:, :, 0] / (np.linalg.norm(rm[:, :, 0], axis=1, keepdims=True) + 1e-6)
    a2 = rm[:, :, 1] / (np.linalg.norm(rm[:, :, 1], axis=1, keepdims=True) + 1e-6)
    a3 = np.cross(a1, a2)
    m_expected = np.stack([a1, a2, a3], axis=2)
    m = np.asarray(rot.sixd_to_matrix(jnp.asarray(noisy)))
    np.testing.assert_allclose(m, m_expected, atol=1e-7)


def test_angular_velocity_formula():
    """w from quats must match the reference finite-difference construction
    (data_utils.py:35-37) and approximate the true angular velocity."""
    w_true = np.array([0.3, -1.2, 2.0])
    dt = 1.0 / 60.0
    r1 = Rotation.from_rotvec(rand_aa(1)[0])
    r2 = Rotation.from_rotvec(w_true * dt) * r1
    q1, q2 = r1.as_quat(), r2.as_quat()
    w = np.asarray(rot.angular_velocity_from_quats(
        jnp.asarray(q1), jnp.asarray(q2), dt))
    np.testing.assert_allclose(w, w_true, atol=1e-2)

    # sign-flip robustness: same result if q1 negated
    w_flip = np.asarray(rot.angular_velocity_from_quats(
        jnp.asarray(-q1), jnp.asarray(q2), dt))
    np.testing.assert_allclose(w_flip, w, atol=1e-7)


def test_slerp_endpoints_and_midpoint():
    aa1, aa2 = rand_aa(8), rand_aa(8)
    q0, q1 = rot.aa_to_q(jnp.asarray(aa1)), rot.aa_to_q(jnp.asarray(aa2))
    def assert_same_rotation(a, b):
        a, b = np.asarray(a), np.asarray(b)
        sign = np.sign(np.sum(a * b, axis=-1, keepdims=True))
        np.testing.assert_allclose(a, b * sign, atol=1e-7)

    assert_same_rotation(rot.slerp(q0, q1, 0.0), q0)
    assert_same_rotation(rot.slerp(q0, q1, 1.0), q1)
    # midpoint: equal angle to both ends
    qm = rot.slerp(q0, q1, 0.5)
    a0 = np.linalg.norm(np.asarray(rot.q_to_aa(rot.q_mult(rot.q_inv(q0), qm))), axis=-1)
    a1 = np.linalg.norm(np.asarray(rot.q_to_aa(rot.q_mult(rot.q_inv(qm), q1))), axis=-1)
    np.testing.assert_allclose(a0, a1, atol=1e-7)


def test_grad_finite_at_zero_rotation():
    """aa_to_q / q_to_aa must have finite (zero) gradients at the zero
    rotation / identity quaternion — the naive norm() derivative is NaN
    there and poisons any gradient through a T-pose joint (review finding;
    _safe_norm clamps the squared norm like the Pallas FK kernel)."""
    g = jax.grad(lambda a: jnp.sum(rot.aa_to_q(a)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all(), g
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    g2 = jax.grad(lambda q: jnp.sum(rot.q_to_aa(q)))(ident)
    assert np.isfinite(np.asarray(g2)).all(), g2
    # primal unchanged away from zero (the clamp is below 1e-12 norms)
    aa = jnp.asarray([0.3, -0.2, 0.9])
    np.testing.assert_allclose(
        np.asarray(rot.q_to_aa(rot.aa_to_q(aa))), np.asarray(aa), atol=1e-12)


def test_matrix_to_aa_scipy_parity_hard_angles():
    """Independent (scipy) coverage of matrix_to_aa in the regimes the
    runner-parity oracle shares our implementation for (review finding):
    tiny angles, near-pi, exact-pi about random axes, and random rotations.
    Compared as rotations (axis-angle at pi is sign-ambiguous)."""
    rng = np.random.default_rng(42)
    cases = [np.zeros(3), np.array([1e-9, 0, 0])]
    for _ in range(8):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        cases += [axis * (np.pi - 1e-7), axis * np.pi,
                  axis * rng.uniform(0.1, 3.0)]
    for aa in cases:
        m = Rotation.from_rotvec(aa).as_matrix()
        ours = np.array(rot.matrix_to_aa(jnp.asarray(m)))  # writable copy
        diff = (Rotation.from_rotvec(ours)
                * Rotation.from_rotvec(aa).inv()).magnitude()
        assert diff < 1e-6, (aa, ours, diff)
