"""Direct metric-definition tests (beyond the zero-for-identity harness test)."""

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import metrics as M

RNG = np.random.default_rng(23)


def fk_traj(states):
    skel = kin.amass_skeleton(dtype=jnp.float64)
    return jax.vmap(lambda s: kin.fk_bullet_state(skel, s))(jnp.asarray(states))


def make_traj(T=20):
    s = np.zeros((T, 57))
    s[:, 2] = 0.9
    s[:, 6:] = RNG.normal(size=(T, 51)) * 0.2
    return s


def test_local_angle_error_known_offset():
    """Rotating ONE joint by a known angle yields angle/17 mean degrees."""
    t1 = make_traj()
    t2 = t1.copy()
    t2[:, 6] += 0.3            # lhip x-axis +0.3 rad on top of existing
    ang = float(M.loss_angle(jnp.asarray(t1), jnp.asarray(t2)))
    # axis-angle composition isn't additive, but for rotation about the same
    # mean axis the error is close to 0.3 rad on 1 of 17 joints
    expect = 0.3 / 17 * 180 / 3.1416
    assert abs(ang - expect) < 0.25 * expect, (ang, expect)


def test_sip_restricted_to_hips_and_shoulders():
    t1 = make_traj()
    pq1 = fk_traj(t1)

    # perturbing the lowerback changes global angle but NOT SIP links' parents
    # ... lowerback is not on the hip chains; shoulders hang off chest though.
    t2 = t1.copy()
    t2[:, 6 + 16 * 3] += 0.4       # bullet joint order slot: joint 16 = relbow
    pq2 = fk_traj(t2)
    sip = float(M.loss_sip(None, None, pq1, pq2))
    assert sip < 1e-6              # elbows don't touch SIP links

    t3 = t1.copy()
    # lhip is the first entry of the bullet-ordered aa block
    t3[:, 6:9] = t3[:, 6:9] + np.array([0.4, 0, 0])
    pq3 = fk_traj(t3)
    sip3 = float(M.loss_sip(None, None, pq1, pq3))
    assert sip3 > 2.0              # hip rotation shows up


def test_global_angle_vs_local_angle():
    """Rotating the hip changes the global orientation of the whole leg chain:
    global angle error > local angle error."""
    t1 = make_traj()
    t2 = t1.copy()
    t2[:, 6:9] += 0.3
    pq1, pq2 = fk_traj(t1), fk_traj(t2)
    g = float(M.loss_global_angle(jnp.asarray(t1), jnp.asarray(t2), pq1, pq2))
    l = float(M.loss_angle(jnp.asarray(t1), jnp.asarray(t2), pq1, pq2))
    assert g > l


def test_root_drift_metric():
    t1 = make_traj(200)
    t2 = t1.copy()
    t2[:, 0] += np.linspace(0, 1.0, 200)     # 1 m drift over 200 frames
    pq1, pq2 = fk_traj(t1), fk_traj(t2)
    d2 = float(M.loss_root_dist_pos(None, None, pq1, pq2, t=2.0))
    # at 2 s (frame 119): drift = 119/199 m
    np.testing.assert_allclose(d2, 119 / 199, atol=1e-6)
