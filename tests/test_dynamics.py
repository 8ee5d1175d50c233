"""PD torque op tests (reference bullet_utils.compute_PD_forces semantics)."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from tip_tpu.ops import dynamics as dyn
from tip_tpu.ops import rotations as rot

RNG = np.random.default_rng(17)


def test_pd_torque_direction_and_clipping():
    J = 19
    q_cur = Rotation.from_rotvec(RNG.normal(size=(J, 3)) * 0.2).as_quat()
    # desired = current rotated by a small known local delta
    delta = RNG.normal(size=(J, 3)) * 0.05
    q_des = np.stack([
        (Rotation.from_quat(q_cur[j]) * Rotation.from_rotvec(delta[j])).as_quat()
        for j in range(J)])
    w = np.zeros((J, 3))

    tau = np.asarray(dyn.pd_torques(jnp.asarray(q_cur), jnp.asarray(q_des),
                                    jnp.asarray(w), jnp.asarray(w)))
    kp = np.asarray(dyn.KP)
    np.testing.assert_allclose(tau, kp[:, None] * delta, atol=1e-4)

    # fixed wrists have zero gain and zero limit
    np.testing.assert_array_equal(tau[14], 0.0)
    np.testing.assert_array_equal(tau[18], 0.0)

    # clipping at the per-joint max force
    big = delta * 100
    q_des_big = np.stack([
        (Rotation.from_quat(q_cur[j]) * Rotation.from_rotvec(big[j])).as_quat()
        for j in range(J)])
    tau_big = np.asarray(dyn.pd_torques(jnp.asarray(q_cur),
                                        jnp.asarray(q_des_big),
                                        jnp.asarray(w), jnp.asarray(w)))
    lim = np.asarray(dyn.MAX_FORCE)[:, None]
    assert (np.abs(tau_big) <= lim + 1e-6).all()


def test_pd_damping_opposes_velocity():
    J = 19
    q = np.tile([0, 0, 0, 1.0], (J, 1))
    w_cur = RNG.normal(size=(J, 3))
    tau = np.asarray(dyn.pd_torques(jnp.asarray(q), jnp.asarray(q),
                                    jnp.asarray(w_cur),
                                    jnp.asarray(np.zeros((J, 3)))))
    kd = np.asarray(dyn.KD)
    np.testing.assert_allclose(tau, np.clip(-kd[:, None] * w_cur,
                                            -np.asarray(dyn.MAX_FORCE)[:, None],
                                            np.asarray(dyn.MAX_FORCE)[:, None]),
                               atol=1e-5)
