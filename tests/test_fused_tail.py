"""Parity tests for the fused runner tail (ops/fused_tail.py).

The kernel fuses stage 6-7 of the streaming runner — FK + SBP
root-correction inputs + the axis-angle -> 6D history re-encode
(reference real_time_runner_minimal.py:169-196, data_utils.py:397-412,
473-548, record_state_aa_and_c :78-85) — into one Pallas op. These tests
pin it (interpret mode) against the XLA ops it replaces, then against the
XLA tail end-to-end through both runners.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tip_tpu import constants as cst
from tip_tpu.ops import fused_tail as FT
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import rotations as rot
from tip_tpu.ops import sbp as sbp_ops


def _rand_inputs(rng):
    s = (rng.normal(size=114) * 0.4).astype(np.float32)
    s[2] += 0.9
    ct = rng.normal(size=(5, 4)).astype(np.float32)
    ct[:, 0] = (ct[:, 0] > 0).astype(np.float32)   # decoded flags
    ct[:, 1:] *= 0.05                              # decoded offsets
    return s, ct.reshape(-1)


def test_tail_kernel_matches_xla_ops():
    """Every kernel output equals its XLA formula to float rounding,
    across random poses with mixed active/inactive SBP sets."""
    skel = kin.amass_skeleton()
    rng = np.random.default_rng(3)
    for _ in range(6):
        s, ct = _rand_inputs(rng)
        prev_s = s + rng.normal(size=114).astype(np.float32) * 0.01
        prev_pq = kin.fk_our_state(skel, jnp.asarray(prev_s))

        ref_com, ref_jf = kin.fk_our_state(skel, jnp.asarray(s),
                                           return_joint_frame=True)
        corr = sbp_ops.root_correction_from_constrs(
            prev_pq, ref_com, jnp.asarray(ct), 5, 5, cst.DT)
        ref_hist = rot.aa_to_sixd(jnp.asarray(s)[3:57].reshape(18, 3))

        out = FT.tail_fused(skel, jnp.asarray(s), jnp.asarray(ct), prev_pq,
                            dt=cst.DT, interpret=True)
        np.testing.assert_allclose(np.asarray(out.pq_com),
                                   np.asarray(ref_com), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out.pq_jf),
                                   np.asarray(ref_jf), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out.hist_sixd),
                                   np.asarray(ref_hist), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out.vel_res),
                                   np.asarray(corr.vel_res), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.c_locs),
                                   np.asarray(corr.c_locs), atol=2e-5)
        # residues are (x2-x1)/dt finite differences — rounding amplified
        # by 60/s, hence the looser tolerance
        np.testing.assert_allclose(np.asarray(out.raw_res),
                                   np.asarray(corr.raw_residues), atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out.active) > 0.5, np.asarray(corr.active))


def test_decode_kernel_matches_xla_ops():
    """decode_fused (output filter + SBP decode + 6D->quat + root
    matrix->quat in one op) equals the runner's stage-4/5 XLA formulas,
    including the pre-filter frames and zero-flag SBPs."""
    rng = np.random.default_rng(11)
    D, nf, n_sbps = 131, 6, 5
    for use_filter in (False, True):
        y_t = rng.normal(size=D).astype(np.float32)
        filt = rng.normal(size=(nf, D)).astype(np.float32)
        coeff = (0.6 ** np.arange(nf)[::-1]).astype(np.float32)
        m9 = rot.aa_to_matrix(jnp.asarray(
            rng.normal(size=3).astype(np.float32))).reshape(9)

        out = FT.decode_fused(jnp.asarray(y_t), jnp.asarray(filt),
                              jnp.asarray(coeff), use_filter, m9,
                              filter_len=nf, n_sbps=n_sbps, interpret=True)

        y_ref = (filt * coeff[:, None]).sum(0) / coeff.sum() \
            if use_filter else y_t
        np.testing.assert_allclose(np.asarray(out.y_f), y_ref, atol=2e-6)

        ct = y_ref[-n_sbps * 4:]
        ct_ref = np.concatenate(
            [(ct[0::4] > 0.0).astype(np.float32)[:, None],
             ct.reshape(n_sbps, 4)[:, 1:] / 5.0], axis=1)
        np.testing.assert_allclose(np.asarray(out.c_t), ct_ref, atol=2e-6)

        q_ref = np.concatenate([
            np.asarray(rot.matrix_to_q(m9.reshape(3, 3)))[None],
            np.asarray(rot.matrix_to_q(rot.sixd_to_matrix(
                jnp.asarray(y_ref[:108].reshape(18, 6)))))[1:]])
        np.testing.assert_allclose(np.asarray(out.q_rows), q_ref, atol=2e-6)


def _tiny_model():
    from tip_tpu.models import tip_model as M
    cfg_m = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                          tf_layers=2, rnn_hid_size=24)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), cfg_m))
    return cfg_m, params


def test_runner_tail_impl_fused_matches_xla():
    """RunnerConfig(tail_impl="fused") tracks the XLA tail through a short
    autoregressive stream (minimal runner)."""
    import test_runner as TR
    from tip_tpu.runtime import runner as R

    skel = kin.amass_skeleton()
    cfg_m, params = _tiny_model()
    imu = jnp.asarray(TR.make_stream(14).astype(np.float32))
    s_init = jnp.asarray(TR.make_s_init().astype(np.float32))
    outs = {}
    for impl in ("xla", "fused"):
        cfg = R.RunnerConfig(model=cfg_m, tail_impl=impl)
        s, c, _ = R.run_offline(params, cfg, skel, s_init, imu)
        outs[impl] = (np.asarray(s), np.asarray(c))
    np.testing.assert_allclose(outs["fused"][0], outs["xla"][0], atol=5e-5)
    np.testing.assert_allclose(outs["fused"][1], outs["xla"][1], atol=5e-5)


def test_full_runner_tail_impl_fused_matches_xla():
    """Fused tail through the FULL runner (terrain + multi-SBP IK history
    feedback): the IK-rewritten history rows are re-encoded in XLA and
    patched over the kernel's rows — end-to-end trajectories must match."""
    import test_runner as TR
    from tip_tpu.runtime import full_runner as FR
    from tip_tpu.runtime import runner as R
    from tip_tpu.runtime import terrain as terrain_lib

    skel = kin.amass_skeleton()
    cfg_m, params = _tiny_model()
    imu = jnp.asarray(TR.make_stream(14).astype(np.float32))
    s_init = jnp.asarray(TR.make_s_init().astype(np.float32))
    outs = {}
    for impl in ("xla", "fused"):
        cfg = FR.FullRunnerConfig(
            base=R.RunnerConfig(model=cfg_m, tail_impl=impl),
            terrain=terrain_lib.TerrainConfig(), multi_sbp=True)
        s, c, v, _ = FR.run_offline_full(params, cfg, skel, s_init, imu)
        outs[impl] = (np.asarray(s), np.asarray(c), np.asarray(v))
    for a, b in zip(outs["fused"], outs["xla"]):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_tail_impl_fused_requires_5_sbps():
    from tip_tpu.runtime import runner as R
    import pytest
    with pytest.raises(AssertionError):
        R.RunnerConfig(n_sbps=2, tail_impl="fused")


def test_tail_impl_auto_resolution():
    """'auto' (the default since round 5): fused only on a real TPU with
    the 5-SBP layout; explicit values pass through. These tests run on the
    forced-CPU backend, so auto must resolve to xla here — CPU hosts would
    otherwise pay Pallas interpret mode (ADVICE r4 / DEPLOY.md)."""
    import jax

    from tip_tpu.runtime import runner as R
    assert R.RunnerConfig().tail_impl == "auto"
    expected = "fused" if jax.default_backend() == "tpu" else "xla"
    assert R.RunnerConfig().resolved_tail_impl == expected
    # an exotic layout never resolves to the 5-SBP-only kernel
    assert R.RunnerConfig(n_sbps=2).resolved_tail_impl == "xla"
    assert R.RunnerConfig(tail_impl="xla").resolved_tail_impl == "xla"
    assert R.RunnerConfig(tail_impl="fused").resolved_tail_impl == "fused"
