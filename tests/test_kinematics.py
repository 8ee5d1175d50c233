"""FK core tests: independent numpy oracle + URDF data-table cross-check."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from tip_tpu.chars import amass_skeleton as amass_data
from tip_tpu.chars.amass import AMASS_CHAR, FIXED_JOINTS
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops import rotations as rot
from tip_tpu.utils.urdf import parse_urdf

RNG = np.random.default_rng(1)
REF_URDF = "/root/reference/data/amass.urdf"


def numpy_fk_oracle(root_p, root_q, joint_aa, scale=1.0):
    """Independent matrix-based FK (recursive, numpy/scipy) as a test oracle."""
    J = 19
    parent = amass_data.PARENT
    joff = amass_data.JOINT_OFFSET * scale
    coff = amass_data.COM_OFFSET * scale
    R = [None] * J
    P = [None] * J
    R_root = Rotation.from_quat(root_q).as_matrix()
    for j in range(J):
        if parent[j] == -1:
            Rp, Pp = R_root, root_p
        else:
            Rp, Pp = R[parent[j]], P[parent[j]]
        P[j] = Pp + Rp @ joff[j]
        if j in FIXED_JOINTS:
            R[j] = Rp
        else:
            R[j] = Rp @ Rotation.from_rotvec(joint_aa[j]).as_matrix()
    p_jf = np.stack([root_p] + P)
    R_all = np.stack([R_root] + R)
    p_com = p_jf + np.einsum("nij,nj->ni", R_all, coff)
    q_all = Rotation.from_matrix(R_all).as_quat()
    return p_com, p_jf, q_all


def random_bullet_state(scale=0.4):
    s = np.zeros(57)
    s[:3] = RNG.normal(size=3)
    s[3:6] = RNG.normal(size=3) * scale
    s[6:] = RNG.normal(size=51) * scale
    return s


def joint_aa_from_bullet(state):
    """Expand 17 active aa to 19 slots (zeros at fixed wrists)."""
    aa = np.zeros((19, 3))
    act = [i for i in range(19) if i not in FIXED_JOINTS]
    aa[act] = state[6:].reshape(17, 3)
    return aa


def test_data_table_matches_reference_urdf():
    u = parse_urdf(REF_URDF, prefer_native=False)
    assert u.joint_names == list(AMASS_CHAR.joint_names)
    np.testing.assert_array_equal(u.parent, amass_data.PARENT)
    np.testing.assert_allclose(u.joint_offset, amass_data.JOINT_OFFSET)
    np.testing.assert_allclose(u.com_offset, amass_data.COM_OFFSET)
    np.testing.assert_array_equal(u.is_fixed, amass_data.IS_FIXED)
    np.testing.assert_allclose(u.link_mass, amass_data.LINK_MASS)
    np.testing.assert_allclose(u.joint_rpy, 0.0)


@pytest.mark.parametrize("scale", [1.0, 1.7 / 1.6])
def test_fk_matches_numpy_oracle(scale):
    skel = kin.amass_skeleton(scale=scale, dtype=jnp.float64)
    for _ in range(5):
        s = random_bullet_state()
        pq_com, pq_jf = kin.fk_bullet_state(skel, jnp.asarray(s),
                                            return_joint_frame=True)
        pq_com, pq_jf = np.asarray(pq_com), np.asarray(pq_jf)

        root_q = Rotation.from_rotvec(s[3:6]).as_quat()
        p_com, p_jf, q_all = numpy_fk_oracle(s[:3], root_q,
                                             joint_aa_from_bullet(s), scale)
        np.testing.assert_allclose(pq_com[:, :3], p_com, atol=1e-6)
        np.testing.assert_allclose(pq_jf[:, :3], p_jf, atol=1e-6)
        # quats up to sign
        sign = np.sign(np.sum(pq_com[:, 3:] * q_all, axis=1, keepdims=True))
        np.testing.assert_allclose(pq_com[:, 3:], q_all * sign, atol=1e-6)
        np.testing.assert_allclose(pq_jf[:, 3:], pq_com[:, 3:], atol=0)


def test_fk_identity_pose_geometry():
    """T-pose (all zeros): positions are pure chains of joint offsets."""
    skel = kin.amass_skeleton(dtype=jnp.float64)
    s = np.zeros(57)
    pq_com, pq_jf = kin.fk_bullet_state(skel, jnp.asarray(s), True)
    pq_jf = np.asarray(pq_jf)
    # lankle joint frame = sum of offsets along the left leg chain
    expect = (amass_data.JOINT_OFFSET[0] + amass_data.JOINT_OFFSET[1]
              + amass_data.JOINT_OFFSET[2])
    np.testing.assert_allclose(pq_jf[1 + 2, :3], expect, atol=1e-7)
    # all orientations identity
    np.testing.assert_allclose(np.asarray(pq_com)[:, 3:7],
                               np.tile([0, 0, 0, 1.0], (20, 1)), atol=1e-7)


def test_fk_batched_vmap_consistency():
    skel = kin.amass_skeleton(dtype=jnp.float64)
    states = np.stack([random_bullet_state() for _ in range(4)])
    single = np.stack([
        np.asarray(kin.fk_bullet_state(skel, jnp.asarray(s))) for s in states])
    batched = np.asarray(jax.vmap(lambda s: kin.fk_bullet_state(skel, s))(
        jnp.asarray(states)))
    np.testing.assert_allclose(batched, single, atol=1e-7)


def test_our_pose_to_bullet_mapping():
    """nimble->bullet gather must match the reference index tables."""
    s = RNG.normal(size=114)
    out = np.asarray(kin.our_pose_to_bullet(jnp.asarray(s)))
    assert out.shape == (57,)
    np.testing.assert_allclose(out[:6], s[:6])
    # transcribe reference data_utils.our_pose_2_bullet_format directly
    expected = list(s[:6])
    for idx in AMASS_CHAR.non_root_active_idx:
        start = (AMASS_CHAR.nimble_state_map[idx] - 1) * 3 + 6
        expected += list(s[start:start + 3])
    np.testing.assert_allclose(out, np.array(expected))


def test_fixed_wrist_follows_elbow():
    skel = kin.amass_skeleton(dtype=jnp.float64)
    s = random_bullet_state()
    _, pq_jf = kin.fk_bullet_state(skel, jnp.asarray(s), True)
    pq_jf = np.asarray(pq_jf)
    # lwrist (link 14) orientation == lelbow (link 13) orientation
    np.testing.assert_allclose(pq_jf[15, 3:], pq_jf[14, 3:], atol=1e-7)


def test_fused_fk_matches_xla_fk():
    """The single-op Pallas FK (fk_bullet_fused) equals the level-parallel
    XLA fk to float rounding, including fixed-wrist handling."""
    skel = kin.amass_skeleton()
    rng = np.random.default_rng(0)
    for _ in range(5):
        state = rng.normal(size=57).astype(np.float32) * 0.4
        ref_com, ref_jf = kin.fk_bullet_state(
            skel, jnp.asarray(state), return_joint_frame=True)
        got_com, got_jf = kin.fk_bullet_fused(skel, jnp.asarray(state),
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(got_com), np.asarray(ref_com),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_jf), np.asarray(ref_jf),
                                   atol=2e-6)


def test_runner_fk_impl_pallas_matches_xla():
    """RunnerConfig(fk_impl="pallas") routes stage 6 through the fused FK
    kernel; a short stream must track the XLA FK path to float rounding."""
    import test_runner as TR
    from tip_tpu.models import tip_model as M
    from tip_tpu.runtime import runner as R

    skel = kin.amass_skeleton()
    cfg_m = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4,
                          tf_layers=2, rnn_hid_size=24)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32),
        M.init_params(jax.random.PRNGKey(0), cfg_m))
    T = 12
    imu = jnp.asarray(TR.make_stream(T).astype(np.float32))
    s_init = jnp.asarray(TR.make_s_init().astype(np.float32))
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = R.RunnerConfig(model=cfg_m, fk_impl=impl)
        s, _, _ = R.run_offline(params, cfg, skel, s_init, imu)
        outs[impl] = np.asarray(s)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=5e-5)


_ROBUST_URDF = """<?xml version="1.0"?>
<robot name="t">
  <link name="base"><inertial><origin xyz="0 0 0"/><mass value="1"/></inertial></link>
  <link name="a"><inertial><origin xyz="0.1 0 0"/><mass value="2"/></inertial></link>
  <link name="b"><inertial><origin xyz="0 0.2 0"/><mass value="3"/></inertial></link>
  <!-- child joint listed BEFORE its parent joint: forward reference -->
  <joint name="j_ab" type="spherical">
    <origin xyz="0 0 0.5"/><parent link="a"/><child link="b"/>
  </joint>
  <joint name="j_base_a" type="spherical">
    <origin xyz="0 0 1"/><parent link="base"/><child link="a"/>
  </joint>
  <transmission name="tr">
    <joint name="j_base_a"><hardwareInterface/></joint>
  </transmission>
</robot>
"""


def test_urdf_parsers_forward_refs_and_ignored_blocks(tmp_path):
    """Review findings: (a) <joint> inside <transmission> must not become a
    kinematic joint; (b) a child joint listed before its parent joint parses
    in both parsers; (c) _levels handles the resulting order."""
    from tip_tpu.utils import urdf as urdf_lib

    p = tmp_path / "robust.urdf"
    p.write_text(_ROBUST_URDF)
    for parser in (urdf_lib._parse_python,
                   urdf_lib._parse_native):
        sk = parser(str(p))
        if sk is None:            # native .so not built in this checkout
            continue
        assert sk.joint_names == ["j_ab", "j_base_a"], parser
        np.testing.assert_array_equal(sk.parent, [1, -1])
        np.testing.assert_allclose(sk.link_mass, [1.0, 3.0, 2.0])
    # level grouping works with the child-before-parent joint order
    assert kin._levels((1, -1)) == ((1,), (0,))


def test_urdf_parsers_reject_undeclared_link(tmp_path):
    """A typo'd <child link=...> must be a parse error in BOTH parsers, not
    a silently default-constructed zero-mass link (review finding)."""
    from tip_tpu.utils import urdf as urdf_lib

    bad = _ROBUST_URDF.replace('<child link="b"/>', '<child link="bb"/>')
    p = tmp_path / "bad.urdf"
    p.write_text(bad)
    with pytest.raises(ValueError):
        urdf_lib._parse_python(str(p))
    assert urdf_lib._parse_native(str(p)) is None
