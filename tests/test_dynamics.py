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


def test_pd_torques_matches_manual_numpy():
    rng = np.random.default_rng(0)
    q_cur = Rotation.from_rotvec(rng.normal(size=(19, 3)) * 0.4).as_quat()
    q_des = Rotation.from_rotvec(rng.normal(size=(19, 3)) * 0.4).as_quat()
    w_cur = rng.normal(size=(19, 3))
    w_des = rng.normal(size=(19, 3))
    got = np.asarray(dyn.pd_torques(jnp.asarray(q_cur), jnp.asarray(q_des),
                                    jnp.asarray(w_cur), jnp.asarray(w_des)))
    err = (Rotation.from_quat(q_cur).inv() *
           Rotation.from_quat(q_des)).as_rotvec()
    kp = np.asarray(dyn.KP)[:, None]
    kd = np.asarray(dyn.KD)[:, None]
    lim = np.asarray(dyn.MAX_FORCE)[:, None]
    expect = np.clip(kp * err + kd * (w_des - w_cur), -lim, lim)
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_spd_reduces_to_pd_at_dt_zero():
    rng = np.random.default_rng(1)
    q_cur = jnp.asarray(
        Rotation.from_rotvec(rng.normal(size=(19, 3)) * 0.3).as_quat())
    q_des = jnp.asarray(
        Rotation.from_rotvec(rng.normal(size=(19, 3)) * 0.3).as_quat())
    w_cur = jnp.asarray(rng.normal(size=(19, 3)))
    w_des = jnp.asarray(rng.normal(size=(19, 3)))
    np.testing.assert_allclose(
        np.asarray(dyn.spd_torques(q_cur, q_des, w_cur, w_des, dt=0.0)),
        np.asarray(dyn.pd_torques(q_cur, q_des, w_cur, w_des)), atol=1e-5)


def test_spd_is_stable_where_explicit_pd_oscillates():
    """The SPD property (Tan et al. 2011, the algorithm behind the
    reference's Actuation.SPD / Bullet STABLE_PD_CONTROL,
    bullet_agent.py:619-627): with stiff gains and zero explicit damping,
    predicted-state evaluation converges to the target while plain PD
    oscillates undamped forever."""
    dt, inertia = 1.0 / 60.0, 1.0
    kp = jnp.asarray([2000.0])
    kd = jnp.asarray([0.0])
    lim = jnp.asarray([1e9])
    q_des = jnp.asarray(Rotation.identity().as_quat())[None]

    def simulate(torque_fn):
        theta, omega = 1.0, 0.0            # 1 rad offset about x
        for _ in range(600):               # 10 s @ 60 Hz, semi-implicit Euler
            q = jnp.asarray(
                Rotation.from_rotvec([theta, 0, 0]).as_quat())[None]
            w = jnp.asarray([[omega, 0.0, 0.0]])
            tau = float(torque_fn(q, w)[0, 0])
            omega += dt * tau / inertia
            theta += dt * omega
        return theta

    pd_final = simulate(lambda q, w: dyn.pd_torques(
        q, q_des, w, jnp.zeros((1, 3)), kp=kp, kd=kd, max_force=lim))
    spd_final = simulate(lambda q, w: dyn.spd_torques(
        q, q_des, w, jnp.zeros((1, 3)), dt=dt, kp=kp, kd=kd, max_force=lim))
    assert abs(spd_final) < 0.02, spd_final      # converged
    assert abs(pd_final) > 0.3, pd_final         # still oscillating


def test_mode_gains_reference_quirks():
    """bullet_agent.py:602-614: SPD uses the tables; PD uses 1.5 kp and
    0.01 kd; CPD/CP/V scale both by cpd_ratio=2e-4."""
    import pytest

    kp, kd = dyn.mode_gains("SPD")
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(dyn.KP))
    np.testing.assert_array_equal(np.asarray(kd), np.asarray(dyn.KD))
    kp, kd = dyn.mode_gains("PD")
    np.testing.assert_allclose(np.asarray(kp), 1.5 * np.asarray(dyn.KP))
    np.testing.assert_allclose(np.asarray(kd), 0.01 * np.asarray(dyn.KD))
    for mode in ("CPD", "CP", "V"):
        kp, kd = dyn.mode_gains(mode)
        np.testing.assert_allclose(np.asarray(kp),
                                   2e-4 * np.asarray(dyn.KP))
        np.testing.assert_allclose(np.asarray(kd),
                                   2e-4 * np.asarray(dyn.KD))
    with pytest.raises(ValueError):
        dyn.mode_gains("TQ")
