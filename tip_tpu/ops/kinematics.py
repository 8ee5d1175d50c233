"""Batched forward kinematics for fixed-topology skeletons.

Replaces the reference's use of PyBullet as an FK engine
(reference bullet_agent.py + bullet_utils.py:50-159 + the FK driver
data_utils.py:262-306) with a pure-JAX tree walk:

  * the skeleton tree is static (traced once), so FK unrolls into a fixed
    sequence of quaternion composes — no dynamic control flow, fully
    jit/vmap/grad-compatible;
  * two frame conventions are produced, matching PyBullet's link states:
    the *joint frame* (URDF link frame, ls[4]/ls[5]) and the *CoM frame*
    (joint frame shifted by the inertial origin, ls[0]/ls[1]); the reference
    consumes CoM frames for IMU/SBP work and joint frames for IK.

Quaternions are xyzw throughout.
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from tip_tpu.chars import amass_skeleton as _amass
from tip_tpu.chars.amass import AMASS_CHAR
from tip_tpu.ops import rotations as rot


@struct.dataclass
class Skeleton:
    """Flat skeleton arrays; static under jit (all leaves are arrays).

    ``scale`` mirrors PyBullet's globalScaling (reference
    data-gen-and-viz-bullet-new.py:249-261 uses scale = body_height/1.6):
    it multiplies every translational offset.
    """
    parent: np.ndarray = struct.field(pytree_node=False)     # (J,) int
    is_fixed: np.ndarray = struct.field(pytree_node=False)   # (J,) bool
    joint_offset: jnp.ndarray                                 # (J, 3) scaled
    com_offset: jnp.ndarray                                   # (J+1, 3) scaled
    link_mass: jnp.ndarray                                    # (J+1,)

    @property
    def n_joints(self) -> int:
        return len(self.parent)


def amass_skeleton(scale: float = 1.0, dtype=jnp.float32) -> Skeleton:
    """The AMASS humanoid (19 joints: 17 spherical + 2 fixed wrists)."""
    return Skeleton(
        parent=tuple(int(p) for p in _amass.PARENT),
        is_fixed=tuple(bool(f) for f in _amass.IS_FIXED),
        joint_offset=jnp.asarray(_amass.JOINT_OFFSET * scale, dtype=dtype),
        com_offset=jnp.asarray(_amass.COM_OFFSET * scale, dtype=dtype),
        link_mass=jnp.asarray(_amass.LINK_MASS, dtype=dtype),
    )


def skeleton_from_urdf(urdf, scale: float = 1.0, dtype=jnp.float32) -> Skeleton:
    """Build a Skeleton from a parsed URDF (tip_tpu.utils.urdf.UrdfSkeleton)."""
    assert np.allclose(urdf.joint_rpy, 0.0), "non-zero joint rpy not supported yet"
    return Skeleton(
        parent=tuple(int(p) for p in urdf.parent),
        is_fixed=tuple(bool(f) for f in urdf.is_fixed),
        joint_offset=jnp.asarray(urdf.joint_offset * scale, dtype=dtype),
        com_offset=jnp.asarray(urdf.com_offset * scale, dtype=dtype),
        link_mass=jnp.asarray(urdf.link_mass, dtype=dtype),
    )


def _levels(parent) -> Tuple[Tuple[int, ...], ...]:
    """Group joints by tree depth so each level runs as one batched op.

    Order-independent: a URDF may list a child joint before its parent
    (the native parser resolves such forward references), so depths are
    computed by fixpoint rather than assuming parents appear first."""
    n = len(parent)
    depth = {j: 0 for j, p in enumerate(parent) if p == -1}
    while len(depth) < n:
        progressed = False
        for j, p in enumerate(parent):
            if j not in depth and p in depth:
                depth[j] = depth[p] + 1
                progressed = True
        if not progressed:
            missing = [j for j in range(n) if j not in depth]
            raise ValueError(
                f"skeleton parent table has a cycle or dangling parents "
                f"for joints {missing} (parent={tuple(parent)})")
    out = []
    for d in range(max(depth.values()) + 1):
        out.append(tuple(j for j in range(n) if depth[j] == d))
    return tuple(out)


def fk(skel: Skeleton, root_p, root_q, joint_q) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics, level-parallel.

    The tree walk is batched per depth level (7 levels for the AMASS
    character instead of 19 sequential joints) — on TPU the cost of the tiny
    quaternion ops is dominated by fixed per-op latency, so fewer/wider
    steps run ~2.5x faster with identical math.

    Args:
      root_p: (..., 3) root position (root link frame == root CoM frame for
        the AMASS character, whose root inertial origin is zero).
      root_q: (..., 4) root orientation, xyzw.
      joint_q: (..., J, 4) local joint rotations (identity for fixed joints).

    Returns:
      pq_com: (..., J+1, 7) CoM-frame (p, q) per link, root first — the layout
        of the reference's viz_current_frame_and_store_fk_info_include_fixed
        (data_utils.py:262-306).
      pq_jf:  (..., J+1, 7) joint-frame (p, q) per link, root first.
    """
    J = skel.n_joints
    lead = root_p.shape[:-1]
    fixed = np.asarray(skel.is_fixed)

    # world state indexed by link slot: 0 = root, j+1 = joint j
    q_all = jnp.zeros(lead + (J + 1, 4), root_q.dtype)
    p_jf = jnp.zeros(lead + (J + 1, 3), root_p.dtype)
    q_all = q_all.at[..., 0, :].set(root_q)
    p_jf = p_jf.at[..., 0, :].set(root_p)

    for joints in _levels(skel.parent):
        jj = np.asarray(joints, np.int32)
        par_slots = np.asarray([skel.parent[j] + 1 for j in joints], np.int32)
        q_par = q_all[..., par_slots, :]                    # (..., n, 4)
        p_par = p_jf[..., par_slots, :]
        offs = skel.joint_offset[jj]
        p_new = p_par + rot.q_rotate(q_par, offs)
        ident = jnp.zeros_like(joint_q[..., jj, :]).at[..., 3].set(1.0)
        q_loc = jnp.where(jnp.asarray(fixed[jj])[:, None],
                          ident, joint_q[..., jj, :])
        q_new = rot.q_mult(q_par, q_loc)
        q_all = q_all.at[..., jj + 1, :].set(q_new)
        p_jf = p_jf.at[..., jj + 1, :].set(p_new)

    p_com = p_jf + rot.q_rotate(q_all, skel.com_offset)  # broadcast (J+1,3)

    pq_jf = jnp.concatenate([p_jf, q_all], axis=-1)
    pq_com = jnp.concatenate([p_com, q_all], axis=-1)
    return pq_com, pq_jf


# ---------------------------------------------------------------------------
# Pose-format conversions (nimble-ordered state <-> bullet-ordered q <-> FK)
# ---------------------------------------------------------------------------

# gather: active bullet joint i (0..16 over non-fixed joints) -> nimble aa slot
_B2N = AMASS_CHAR.bullet_from_nimble_gather                 # (17,)
_ACTIVE = np.array(AMASS_CHAR.non_root_active_idx, np.int32)  # (17,)


def our_pose_to_bullet(s):
    """Nimble-ordered state (..., 114) -> bullet-ordered pose q (..., 57).

    Matches reference data_utils.our_pose_2_bullet_format (data_utils.py:246-259):
    [root xyz, root aa, 17 x joint aa in bullet joint order].
    """
    joints = s[..., 6:6 + 51].reshape(s.shape[:-1] + (17, 3))
    reordered = joints[..., _B2N, :].reshape(s.shape[:-1] + (51,))
    return jnp.concatenate([s[..., :6], reordered], axis=-1)


def bullet_pose_to_joint_quats(state_bullet):
    """Bullet pose q (..., 57) -> (root_p, root_q, joint_q (..., 19, 4)).

    Fixed wrists get identity local rotations.
    """
    root_p = state_bullet[..., :3]
    root_q = rot.aa_to_q(state_bullet[..., 3:6])
    aa = state_bullet[..., 6:].reshape(state_bullet.shape[:-1] + (17, 3))
    q_active = rot.aa_to_q(aa)                           # (..., 17, 4)

    # scatter the 17 active quats into 19 slots, identity at fixed wrists
    J = 19
    ident = jnp.zeros(state_bullet.shape[:-1] + (J, 4), q_active.dtype)
    ident = ident.at[..., 3].set(1.0)
    joint_q = ident.at[..., _ACTIVE, :].set(q_active)
    return root_p, root_q, joint_q


def fk_bullet_state(skel: Skeleton, state_bullet, return_joint_frame=False):
    """FK from a bullet-format pose vector; reference
    viz_current_frame_and_store_fk_info_include_fixed equivalent."""
    root_p, root_q, joint_q = bullet_pose_to_joint_quats(state_bullet)
    pq_com, pq_jf = fk(skel, root_p, root_q, joint_q)
    if return_joint_frame:
        return pq_com, pq_jf
    return pq_com


def fk_our_state(skel: Skeleton, s, return_joint_frame=False):
    """FK straight from a nimble-ordered 114-d state."""
    return fk_bullet_state(skel, our_pose_to_bullet(s), return_joint_frame)


# ---------------------------------------------------------------------------
# Fused Pallas FK: the whole pose -> link-frames pipeline as one op
# ---------------------------------------------------------------------------
# The XLA level-parallel fk() above costs ~35 us per frame on the streaming
# path — not FLOPs (a few hundred) but per-op latency across ~50 small
# quaternion ops. This kernel unrolls the 19-joint tree walk (plus the
# axis-angle -> quaternion decode of the pose vector) into ONE op with every
# intermediate in registers. Used for single-stream serving (vmap over it
# serialises — batched paths keep the XLA fk).

import functools as _functools

import jax as _jax
from jax.experimental import pallas as _pl
from jax.experimental.pallas import tpu as _pltpu


# structural constants: Mosaic rejects lane-offset concatenates, so vector
# assembly/permutation is done with tiny constant matmuls instead
import numpy as _np

_ROLL1 = _np.zeros((3, 3), _np.float32)   # (x,y,z) -> (y,z,x)
_ROLL1[[1, 2, 0], [0, 1, 2]] = 1.0
_ROLL2 = _ROLL1 @ _ROLL1                   # (x,y,z) -> (z,x,y)
_E_V4 = _np.zeros((3, 4), _np.float32)     # embed vector part of a quat
_E_V4[[0, 1, 2], [0, 1, 2]] = 1.0
_E_W4 = _np.zeros((1, 4), _np.float32)     # embed scalar part
_E_W4[0, 3] = 1.0
_E_P7 = _np.zeros((3, 7), _np.float32)     # embed position into a (p,q) row
_E_P7[[0, 1, 2], [0, 1, 2]] = 1.0
_E_Q7 = _np.zeros((4, 7), _np.float32)     # embed quat into a (p,q) row
_E_Q7[[0, 1, 2, 3], [3, 4, 5, 6]] = 1.0


def _k_cross(a, b, c):
    """(1,3) x (1,3) via roll-matmuls (no lane concat)."""
    r1, r2 = c["r1"], c["r2"]
    return (a @ r1) * (b @ r2) - (a @ r2) * (b @ r1)


def _k_vw(v, w, c):
    """Assemble (1,4) quat from (1,3) vector + (1,1) scalar parts."""
    return v @ c["ev4"] + w @ c["ew4"]


def _k_aa_to_q(aa, c):
    a2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(a2, 1e-24))
    half = 0.5 * angle
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(half) / angle)
    w = jnp.sin(0.5 * jnp.pi - half)          # cos via sin (rotations._cos)
    return _k_vw(aa * k, w, c)


def _k_qmul(q1, q2, c):
    v1, w1 = q1[:, :3], q1[:, 3:4]
    v2, w2 = q2[:, :3], q2[:, 3:4]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + _k_cross(v1, v2, c)
    return _k_vw(v, w, c)


def _k_qrot(q, v, c):
    qv, qw = q[:, :3], q[:, 3:4]
    t = 2.0 * _k_cross(qv, v, c)
    return v + qw * t + _k_cross(qv, t, c)


def _fk_kernel(state_ref, joff_ref, coff_ref, r1_ref, r2_ref, ev4_ref,
               ew4_ref, ep7_ref, eq7_ref, com_ref, jf_ref,
               *, parent, is_fixed, active):
    """state: (1, 57) bullet pose. Outputs (20, 7) CoM / joint frames.
    The r1/r2/e* inputs are the structural constant matrices (pallas
    requires array constants to arrive as inputs)."""
    c = {"r1": r1_ref[:], "r2": r2_ref[:],
         "ev4": ev4_ref[:], "ew4": ew4_ref[:]}
    ep7 = ep7_ref[:]
    eq7 = eq7_ref[:]
    s = state_ref[:]                                   # (1, 57)
    root_p = s[:, 0:3]
    q_root = _k_aa_to_q(s[:, 3:6], c)

    # local joint quaternions: 17 active spherical joints decoded from aa,
    # fixed wrists identity — scattered statically in the unrolled walk
    q_loc = {}
    for i, j in enumerate(active):
        q_loc[int(j)] = _k_aa_to_q(s[:, 6 + 3 * i: 9 + 3 * i], c)

    q_all = [None] * (len(parent) + 1)
    p_all = [None] * (len(parent) + 1)
    q_all[0] = q_root
    p_all[0] = root_p
    for j, par in enumerate(parent):
        ps = par + 1
        off = joff_ref[j:j + 1, :]
        p_all[j + 1] = p_all[ps] + _k_qrot(q_all[ps], off, c)
        if is_fixed[j]:
            q_all[j + 1] = q_all[ps]
        else:
            q_all[j + 1] = _k_qmul(q_all[ps], q_loc[j], c)

    for li in range(len(parent) + 1):
        p_com = p_all[li] + _k_qrot(q_all[li], coff_ref[li:li + 1, :], c)
        jf_ref[li:li + 1, :] = p_all[li] @ ep7 + q_all[li] @ eq7
        com_ref[li:li + 1, :] = p_com @ ep7 + q_all[li] @ eq7


@_functools.partial(_jax.jit, static_argnames=("interpret",))
def fk_bullet_fused(skel: Skeleton, state_bullet, interpret: bool = False):
    """Fused-kernel equivalent of fk_bullet_state(..., return_joint_frame=
    True) for a single (57,) bullet pose. Matches the XLA path to float
    rounding (tested in tests/test_kinematics.py)."""
    spec = _pl.BlockSpec(memory_space=_pl.ANY if interpret else _pltpu.VMEM)
    kern = _functools.partial(
        _fk_kernel, parent=tuple(skel.parent), is_fixed=tuple(skel.is_fixed),
        active=tuple(int(a) for a in _ACTIVE))
    dt = state_bullet.dtype
    consts = tuple(jnp.asarray(m, dt)
                   for m in (_ROLL1, _ROLL2, _E_V4, _E_W4, _E_P7, _E_Q7))
    pq_com, pq_jf = _pl.pallas_call(
        kern,
        out_shape=[_jax.ShapeDtypeStruct((skel.n_joints + 1, 7), dt)] * 2,
        in_specs=[spec] * (3 + len(consts)),
        out_specs=[spec] * 2,
        interpret=interpret,
    )(state_bullet[None], skel.joint_offset, skel.com_offset, *consts)
    return pq_com, pq_jf
