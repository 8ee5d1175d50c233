"""Streaming runner parity vs a numpy oracle.

The oracle below is an independent numpy/scipy transcription of the
reference's RTRunnerMin semantics (real_time_runner_minimal.py:19-200):
Python-list buffers, variable-length model windows, NaN-based SBP plumbing.
Only the transformer forward (separately validated against torch in
test_model.py), the FK core (validated against a scipy oracle in
test_kinematics.py), and the matrix->axis-angle decode (rot.matrix_to_aa,
validated against scipy including near/at-pi rotations in
test_rotations.py::test_matrix_to_aa_scipy_parity_hard_angles) are shared.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as R

RNG = np.random.default_rng(3)

SMALL_MODEL = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                            tf_layers=2, rnn_hid_size=24, with_acc_sum=True)
CFG = R.RunnerConfig(model=SMALL_MODEL)


# ---------------------------------------------------------------------------
# numpy oracle (reference semantics, list buffers, NaN plumbing)
# ---------------------------------------------------------------------------

class OracleRunnerMin:
    def __init__(self, params, skel, s_init, max_input_l=40):
        self.params = params
        self.skel = skel
        self.n_sbps = 5
        self.s_init = np.asarray(s_init, np.float64)
        self.last_s = None
        self.raw, self.smoothed, self.acc_sums = [], [], []
        self.s_and_c = [self._hist(self.s_init, np.zeros(20))]
        self.pq_buf = [np.asarray(kin.fk_our_state(skel, jnp.asarray(self.s_init)))]
        self.max_input_l = max_input_l
        self.coeff = 0.6 ** np.arange(6)[::-1]
        self.out_buf = []
        self.c_locs = np.ones((5, 3)) * 100.0

    @staticmethod
    def _hist(s, c):
        aa = s[3:57].reshape(18, 3)
        r = Rotation.from_rotvec(aa).as_matrix()[:, :, :2].reshape(18, 6)
        return np.concatenate([r.reshape(-1), s[57:60], c])

    @staticmethod
    def _sixd_to_aa(sixd):
        rm = sixd.reshape(-1, 3, 2)
        a1 = rm[:, :, 0] / (np.linalg.norm(rm[:, :, 0], axis=1, keepdims=True) + 1e-6)
        a2 = rm[:, :, 1] / (np.linalg.norm(rm[:, :, 1], axis=1, keepdims=True) + 1e-6)
        a3 = np.cross(a1, a2)
        m = np.stack([a1, a2, a3], axis=2)
        # matrix -> rotvec via the (scipy-validated) shared codec: an untrained
        # model emits non-orthonormal 6D junk for which scipy's from_matrix
        # takes a different +/-pi branch than any fixed-formula decode.
        from tip_tpu.ops import rotations as rot_ops
        return np.asarray(rot_ops.matrix_to_aa(jnp.asarray(m)))

    @staticmethod
    def _local(batch):
        out = batch.copy()
        root_r = batch[:, :9].reshape(-1, 3, 3)
        inv = np.linalg.inv(root_r)
        other_r = batch[:, 9:54].reshape(-1, 5, 3, 3)
        out[:, 9:54] = np.einsum("bij,bnjk->bnik", inv, other_r).reshape(-1, 45)
        other_a = batch[:, 57:72].reshape(-1, 5, 3)
        out[:, 57:72] = np.einsum("bij,bnj->bni", inv, other_a).reshape(-1, 15)
        return out

    @staticmethod
    def _ang_vel(q1, q2, dt):
        sub = q2 - q1 if np.linalg.norm(q2 - q1) < np.linalg.norm(q2 + q1) else q2 + q1
        conj = q2 * np.array([-1.0, -1, -1, 1])
        v1, w1 = sub[:3], sub[3]
        v2, w2 = conj[:3], conj[3]
        prod = np.concatenate([w1 * v2 + w2 * v1 + np.cross(v1, v2),
                               [w1 * w2 - v1 @ v2]])
        return 2.0 * prod[:3] / dt

    def _residue(self, x1, q1, x2, q2, dt, sol):
        w = self._ang_vel(q1, q2, dt)
        v = (x2 - x1) / dt
        return np.cross(w, sol) + v

    def step(self, cur_imu, prev_root_xyz):
        if not self.raw:
            self.raw.extend([cur_imu.copy()] * 5)
        self.raw.append(cur_imu.copy())
        if len(self.raw) >= 11:
            win = np.array(self.raw[-11:])
            self.smoothed.append(np.concatenate([
                self.raw[-6][:54], np.mean(win[:, 54:72], axis=0)]))
        if len(self.smoothed) < 1:
            return self.s_init.copy()

        in_imu = self._local(np.array(self.smoothed[-self.max_input_l:]))
        self.acc_sums.append(np.sum(in_imu[-40:, 54:72], axis=0))
        sums = np.array(self.acc_sums[-self.max_input_l:]) / 15.0
        in_imu = np.concatenate([in_imu, sums], axis=1)
        in_s = np.array(self.s_and_c[-len(in_imu):])

        # pad to a fixed 40-frame window (single compile shape); reading the
        # output at the last valid index is exactly the variable-length result
        # (proven by test_left_aligned_padding_equals_short_window)
        k = len(in_imu)
        pad_imu = np.zeros((40, in_imu.shape[1])); pad_imu[:k] = in_imu
        pad_s = np.zeros((40, in_s.shape[1])); pad_s[:k] = in_s
        y = np.asarray(M.forward(self.params, jnp.asarray(pad_imu[None]),
                                 jnp.asarray(pad_s[None]), SMALL_MODEL))[0, k - 1]

        self.out_buf.append(y)
        if len(self.out_buf) >= 6:
            y = (np.array(self.out_buf[-6:]) * self.coeff[:, None]
                 ).sum(0) / self.coeff.sum()
        st_2axis, c_t = y[:-20].copy(), y[-20:].copy()
        c_t[0::4] = (c_t[0::4] > 0) * 1.0
        c_t[1::4] /= 5.0
        c_t[2::4] /= 5.0
        c_t[3::4] /= 5.0

        root_v = st_2axis[-3:]
        st_aa = self._sixd_to_aa(st_2axis[:-3]).reshape(-1)
        s_t = np.zeros(114)
        s_t[57:60] = root_v
        s_t[:3] = prev_root_xyz + root_v / 60.0
        s_t[6:57] = st_aa[3:]
        s_t[3:6] = Rotation.from_matrix(in_imu[-1, :9].reshape(3, 3)).as_rotvec()
        if self.last_s is not None:
            s_t[6:] = (s_t[6:] + self.last_s[6:]) / 2.0
        self.last_s = s_t.copy()

        pq_g = np.array(kin.fk_our_state(self.skel, jnp.asarray(s_t)))
        pg_prev = self.pq_buf[-1]

        bodies_row = [3, 6, 15, 19, 0]
        viz = np.ones((5, 3)) * 100.0
        resid = np.full((5, 3), np.nan)
        for i in range(5):
            contr = c_t[4 * i:4 * i + 4]
            row = bodies_row[i]
            if contr[0] == 1.0:
                x1, q1 = pg_prev[row, :3], pg_prev[row, 3:]
                x2, q2 = pq_g[row, :3], pq_g[row, 3:]
                resid[i] = self._residue(x1, q1, x2, q2, 1 / 60.0, contr[1:4])
                viz[i] = x2 + contr[1:4]
        if np.isnan(resid[:2]).all():
            vel_res = np.zeros(3)
        else:
            vel_res = np.nanmean(resid[:2], axis=0)
        vel_res = np.clip(vel_res, -0.5, 0.5)
        vel_res[2] = 0.0
        if np.linalg.norm(viz[0]) < 100:
            vel_res[2] += viz[0][2]
        if np.linalg.norm(viz[1]) < 100:
            vel_res[2] += viz[1][2]

        self.c_locs = viz - vel_res * (1 / 60.0)
        s_t[:3] -= vel_res / 60.0
        pq_g[:, :3] -= vel_res[None, :] / 60.0
        self.pq_buf.append(pq_g)
        self.s_and_c.append(self._hist(s_t, c_t))
        return s_t


def make_stream(T=60, rng=None):
    """Plausible IMU stream: smooth random orientations + small accs.
    Pass an explicit rng to avoid consuming (or worse, rebinding) the
    shared module RNG — later tests' data must not depend on test order."""
    r = rng if rng is not None else RNG
    imu = np.zeros((T, 72))
    base = Rotation.from_rotvec(r.normal(size=(6, 3)) * 0.3)
    for t in range(T):
        delta = Rotation.from_rotvec(r.normal(size=(6, 3)) * 0.02)
        base = delta * base
        imu[t, :54] = base.as_matrix().reshape(6, 9).reshape(-1)
        imu[t, 54:] = r.normal(size=18) * 0.5
    return imu


def make_s_init():
    s = np.zeros(114)
    s[2] = 0.9
    s[3:6] = [1.20919958, 1.20919958, 1.20919958]
    s[6:57] = RNG.normal(size=51) * 0.1
    return s


@pytest.fixture(scope="module")
def setup():
    params = M.init_params(jax.random.PRNGKey(0), SMALL_MODEL, dtype=jnp.float64)
    skel = kin.amass_skeleton(dtype=jnp.float64)
    return params, skel


def test_runner_matches_oracle(setup):
    params, skel = setup
    T = 30
    imu = make_stream(T)
    s_init = make_s_init()

    oracle = OracleRunnerMin(params, skel, s_init)
    s_ref = np.zeros((T, 114))
    s_ref[0] = s_init
    for t in range(T - 1):
        s_ref[t + 1] = oracle.step(imu[t], s_ref[t, :3])

    s_traj, c_traj, viz = R.run_offline(params, CFG, skel,
                                        jnp.asarray(s_init),
                                        jnp.asarray(imu))
    s_traj = np.asarray(s_traj)
    # warmup frames return s_init in both
    np.testing.assert_allclose(s_traj[:6], np.tile(s_init, (6, 1)), atol=1e-9)
    np.testing.assert_allclose(s_traj, s_ref, atol=1e-6)


def test_runner_long_window_saturation(setup):
    """Past the 40-frame window the rings must keep matching the oracle."""
    params, skel = setup
    T = 55
    imu = make_stream(T)
    s_init = make_s_init()

    oracle = OracleRunnerMin(params, skel, s_init)
    s_ref = np.zeros((T, 114))
    s_ref[0] = s_init
    for t in range(T - 1):
        s_ref[t + 1] = oracle.step(imu[t], s_ref[t, :3])

    s_traj, _, _ = R.run_offline(params, CFG, skel, jnp.asarray(s_init),
                                 jnp.asarray(imu))
    np.testing.assert_allclose(np.asarray(s_traj), s_ref, atol=1e-6)


def test_multi_stream_vmap_equals_single(setup):
    params, skel = setup
    T, B = 12, 3
    streams = np.stack([make_stream(T) for _ in range(B)])
    s_init = make_s_init()

    step_b = R.make_multi_stream_step(CFG, skel)
    carries = jax.vmap(lambda _: R.runner_init(CFG, skel, jnp.asarray(s_init),
                                               dtype=jnp.float64))(jnp.arange(B))
    outs = []
    for t in range(T):
        carries, out = step_b(params, carries, jnp.asarray(streams[:, t]),
                              jnp.asarray(t, jnp.int32))
        outs.append(np.asarray(out["qdq"]))
    batched = np.stack(outs, axis=1)               # (B, T, 114)

    for b in range(B):
        s_traj, _, _ = R.run_offline(params, CFG, skel, jnp.asarray(s_init),
                                     jnp.asarray(streams[b]))
        # run_offline outputs are shifted by one (s[t+1] = step(imu[t]))
        np.testing.assert_allclose(batched[b, :T - 1], np.asarray(s_traj)[1:T],
                                   atol=1e-7)
