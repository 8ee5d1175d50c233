"""Fused runner tail: FK + SBP root-correction + history re-encode as ONE op.

Single-stream frame latency is dispatch-bound (PERF.md): after the fused
cached-step model kernel, the remaining ~0.11 ms/frame is ~30 small XLA
fusions of non-model plumbing. The heaviest chain — pose decode -> 19-joint
FK tree walk -> per-SBP velocity residues -> root-drift correction ->
axis-angle->6D history re-encode (reference real_time_runner_minimal.py:
169-196 / real_time_runner.py:451-495 + record_state_aa_and_c :78-85) —
is fused here into one Pallas kernel, extending ops/kinematics._fk_kernel
(whose quaternion helpers and no-lane-concat constant-matmul tricks it
reuses). The history block re-uses the FK walk's own joint quaternions, so
the 18 axis-angle decodes are not repeated.

The quat -> axis-angle direction (arctan2) has no Mosaic lowering, so the
upstream state-assembly stage (6D -> aa) stays in XLA; this kernel starts
from the assembled 114-d state — everything it computes is arctan-free
(aa -> quat -> matrix columns only).

Opt-in via RunnerConfig(tail_impl="fused") (n_sbps == 5 layouts only);
parity with the XLA path is pinned in tests/test_fused_tail.py.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu import constants as cst
from tip_tpu.chars.amass import AMASS_CHAR
from tip_tpu.ops import kinematics as kin
from tip_tpu.ops.kinematics import (_E_P7, _E_Q7, _E_V4, _E_W4, _ROLL1,
                                    _ROLL2, _k_aa_to_q, _k_cross, _k_qmul,
                                    _k_qrot, _k_vw)
from tip_tpu.ops.sbp import SBP_PQ_ROWS

_B2N = tuple(int(i) for i in AMASS_CHAR.bullet_from_nimble_gather)  # (17,)
_ACTIVE = tuple(int(a) for a in AMASS_CHAR.non_root_active_idx)     # (17,)
# nimble aa slot m (0..16) -> FK joint index whose local quat decodes it
_NIMBLE_TO_JOINT = {_B2N[i]: _ACTIVE[i] for i in range(17)}

_EYE6 = np.eye(6, dtype=np.float32)
_EYE3 = np.eye(3, dtype=np.float32)
_E_F4 = np.zeros((1, 4), np.float32)       # SBP flag -> lane 0 of a (1,4) row
_E_F4[0, 0] = 1.0
_E_OFF4 = np.zeros((3, 4), np.float32)     # SBP offsets -> lanes 1..3
_E_OFF4[[0, 1, 2], [1, 2, 3]] = 1.0


class DecodeOut(NamedTuple):
    y_f: jnp.ndarray        # (131,) filtered model output
    c_t: jnp.ndarray        # (5, 4) decoded SBP rows [flag, offsets/5]
    q_rows: jnp.ndarray     # (18, 4) quats: row 0 = root (from IMU ori),
    #                         rows 1..17 = model joints 1..17 (6D-decoded)


class TailOut(NamedTuple):
    pq_com: jnp.ndarray     # (20, 7) CoM link frames (pre-correction)
    pq_jf: jnp.ndarray      # (20, 7) joint frames
    hist_sixd: jnp.ndarray  # (18, 6) two-axis encode of s[3:57] (row-major cols)
    vel_res: jnp.ndarray    # (3,) clipped mean feet residue (pre z-fix)
    c_locs: jnp.ndarray     # (5, 3) world SBP positions (100s if inactive)
    raw_res: jnp.ndarray    # (5, 3) per-SBP residue (NaN rows if inactive)
    active: jnp.ndarray     # (5,) float 0/1 — SBP flag set


def _k_qconj(q, c):
    return _k_vw(-q[:, :3], q[:, 3:4], c)


def _k_norm(x):
    """Row L2 norm, (1, n) -> (1, 1)."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def _k_angvel(q1, q2, dt, c):
    """World angular velocity between quats (rotations.
    angular_velocity_from_quats, reference data_utils.py:35-37,397-401)."""
    d_minus = _k_norm(q2 - q1)
    d_plus = _k_norm(q2 + q1)
    sub = jnp.where(d_minus < d_plus, q2 - q1, q2 + q1)
    dori = 2.0 * _k_qmul(sub, _k_qconj(q2, c), c)
    return dori[:, :3] / dt


def _k_sixd_row(q, e6):
    """Unit-normalised quat (1,4) -> first-two-matrix-columns row (1, 6)
    [r00, r01, r10, r11, r20, r21] (rotations.aa_to_sixd layout)."""
    qn = q / jnp.maximum(_k_norm(q), 1e-12)        # rotations.q_normalize
    x, y, z, w = qn[:, 0:1], qn[:, 1:2], qn[:, 2:3], qn[:, 3:4]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    return (r00 * e6[0:1] + r01 * e6[1:2] + r10 * e6[2:3]
            + r11 * e6[3:4] + r20 * e6[4:5] + r21 * e6[5:6])


def _k_vec3(s0, s1, s2, e3):
    """Assemble a (1, 3) row from three (1, 1) scalars."""
    return s0 * e3[0:1] + s1 * e3[1:2] + s2 * e3[2:3]


def _k_matrix_to_q(m, c, e3):
    """Branchless Shepperd matrix -> quat (rotations.matrix_to_q), on a
    dict m of (1, 1) entries m[(r, c)]. The XLA version's argmax one-hot
    becomes a first-max-wins where chain (identical tie-break)."""
    m00, m01, m02 = m[(0, 0)], m[(0, 1)], m[(0, 2)]
    m10, m11, m12 = m[(1, 0)], m[(1, 1)], m[(1, 2)]
    m20, m21, m22 = m[(2, 0)], m[(2, 1)], m[(2, 2)]
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    # one candidate per largest diagonal-ish element; the sqrt sits at the
    # candidate's own component (rotations.matrix_to_q:140-154)
    hw = jnp.sqrt(jnp.maximum(tw, 1e-12)) / 2.0
    q_w = _k_vw(_k_vec3((m21 - m12) / (4 * hw), (m02 - m20) / (4 * hw),
                        (m10 - m01) / (4 * hw), e3), hw, c)
    hx = jnp.sqrt(jnp.maximum(tx, 1e-12)) / 2.0
    q_x = _k_vw(_k_vec3(hx, (m01 + m10) / (4 * hx), (m02 + m20) / (4 * hx),
                        e3), (m21 - m12) / (4 * hx), c)
    hy = jnp.sqrt(jnp.maximum(ty, 1e-12)) / 2.0
    q_y = _k_vw(_k_vec3((m01 + m10) / (4 * hy), hy, (m12 + m21) / (4 * hy),
                        e3), (m02 - m20) / (4 * hy), c)
    hz = jnp.sqrt(jnp.maximum(tz, 1e-12)) / 2.0
    q_z = _k_vw(_k_vec3((m02 + m20) / (4 * hz), (m12 + m21) / (4 * hz), hz,
                        e3), (m10 - m01) / (4 * hz), c)

    is_w = (tw >= tx) & (tw >= ty) & (tw >= tz)
    is_x = (~is_w) & (tx >= ty) & (tx >= tz)
    is_y = (~is_w) & (~is_x) & (ty >= tz)
    q = jnp.where(is_w, q_w, jnp.where(is_x, q_x, jnp.where(is_y, q_y, q_z)))
    q = q / jnp.maximum(_k_norm(q), 1e-12)
    w = q[:, 3:4]
    return q * jnp.sign(jnp.where(w == 0.0, 1.0, w))


def _k_sixd_to_q(sixd, c, e3):
    """Reference 6D decode (rotations.sixd_to_matrix: +1e-6 norms, third
    column = cross) followed by matrix -> quat; sixd is (1, 6)."""
    a1 = _k_vec3(sixd[:, 0:1], sixd[:, 2:3], sixd[:, 4:5], e3)
    a2 = _k_vec3(sixd[:, 1:2], sixd[:, 3:4], sixd[:, 5:6], e3)
    a1 = a1 / (_k_norm(a1) + 1e-6)
    a2 = a2 / (_k_norm(a2) + 1e-6)
    a3 = _k_cross(a1, a2, c)
    m = {}
    for col, a in enumerate((a1, a2, a3)):
        for row in range(3):
            m[(row, col)] = a[:, row:row + 1]
    return _k_matrix_to_q(m, c, e3)


def _decode_kernel(yt_ref, filt_ref, coeff_ref, flag_ref, local9_ref,
                   r1_ref, r2_ref, ev4_ref, ew4_ref, e3_ref, ef4_ref,
                   eoff4_ref, yf_ref, ct_ref, q_ref, *, filter_len,
                   n_sbps):
    c = {"r1": r1_ref[:], "r2": r2_ref[:],
         "ev4": ev4_ref[:], "ew4": ew4_ref[:]}
    e3 = e3_ref[:]
    ef4 = ef4_ref[:]
    eoff4 = eoff4_ref[:]
    y_t = yt_ref[:]                                 # (1, D)
    coeff = coeff_ref[:]                            # (1, filter_len)

    # ---- exponential output filter (runner stage 4, ref :87-112) ---------
    y_smooth = jnp.dot(coeff, filt_ref[:],
                       preferred_element_type=y_t.dtype) \
        / jnp.sum(coeff, axis=-1, keepdims=True)
    use_filter = flag_ref[:] > 0.5                  # n_out >= filter_len
    y_f = jnp.where(use_filter, y_smooth, y_t)
    yf_ref[:] = y_f

    # ---- SBP decode (ref :104-112): flag > 0, offsets / 5 ---------------
    base = y_f.shape[1] - 4 * n_sbps
    for k in range(n_sbps):
        fl = jnp.where(y_f[:, base + 4 * k: base + 4 * k + 1] > 0.0,
                       1.0, 0.0)
        offs = y_f[:, base + 4 * k + 1: base + 4 * k + 4] / 5.0
        ct_ref[k:k + 1, :] = fl @ ef4 + offs @ eoff4

    # ---- rotation decode (runner stage 5 head) ----------------------------
    # root orientation from the IMU0 matrix (ref :154-167)
    l9 = local9_ref[:]
    m = {(r, cc): l9[:, 3 * r + cc: 3 * r + cc + 1]
         for r in range(3) for cc in range(3)}
    q_ref[0:1, :] = _k_matrix_to_q(m, c, e3)
    # model joints 1..17 from the two-axis channels (the model's root row 0
    # is discarded by the assembly, which takes root ori from the IMU)
    for j in range(1, 18):
        q_ref[j:j + 1, :] = _k_sixd_to_q(y_f[:, 6 * j: 6 * j + 6], c, e3)


@functools.partial(jax.jit, static_argnames=("filter_len", "n_sbps",
                                             "interpret"))
def decode_fused(y_t, filt_view, coeff, use_filter, local9,
                 filter_len: int = 6, n_sbps: int = 5,
                 interpret: bool = False) -> DecodeOut:
    """Fused-kernel equivalent of runner stages 4-5's heavy math — the
    exponential output filter, SBP flag/offset decode, the 17-joint 6D ->
    quaternion decode, and the root IMU-matrix -> quaternion — as one op.

    The final quat -> axis-angle step (arctan2: no Mosaic lowering) and the
    state assembly/blend stay in XLA. Parity pinned in
    tests/test_fused_tail.py.

    Args:
      y_t: (D,) raw model output of this frame.
      filt_view: (filter_len, D) chronological output ring (oldest first).
      coeff: (filter_len,) filter weights (runner._filter_coeff).
      use_filter: () bool/float — n_out >= filter_len.
      local9: (9,) row-major root IMU rotation matrix (local[:9]).
    """
    dtd = y_t.dtype
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    kern = functools.partial(_decode_kernel, filter_len=filter_len,
                             n_sbps=n_sbps)
    consts = tuple(jnp.asarray(mm, dtd) for mm in
                   (_ROLL1, _ROLL2, _E_V4, _E_W4, _EYE3, _E_F4, _E_OFF4))
    D = y_t.shape[0]
    flag = jnp.asarray(use_filter, dtd).reshape(1, 1)
    outs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((1, D), dtd),             # y_f
            jax.ShapeDtypeStruct((n_sbps, 4), dtd),        # c_t rows
            jax.ShapeDtypeStruct((18, 4), dtd),            # q_rows
        ],
        in_specs=[spec] * (5 + len(consts)),
        out_specs=[spec] * 3,
        interpret=interpret,
    )(y_t[None], filt_view, jnp.asarray(coeff, dtd)[None], flag,
      local9[None], *consts)
    y_f, ct, q = outs
    return DecodeOut(y_f=y_f[0], c_t=ct, q_rows=q)


def _tail_kernel(s_ref, ct_ref, prev_pq_ref, joff_ref, coff_ref, r1_ref,
                 r2_ref, ev4_ref, ew4_ref, ep7_ref, eq7_ref, e6_ref,
                 com_ref, jf_ref, hist_ref, vres_ref, clocs_ref, rres_ref,
                 act_ref, *, parent, is_fixed, dt, n_sbps):
    c = {"r1": r1_ref[:], "r2": r2_ref[:],
         "ev4": ev4_ref[:], "ew4": ew4_ref[:]}
    ep7 = ep7_ref[:]
    eq7 = eq7_ref[:]
    e6 = e6_ref[:]
    s = s_ref[:]                                    # (1, 114) nimble state
    ct = ct_ref[:]                                  # (1, n_sbps*4) decoded SBPs

    # ---- FK walk (ops/kinematics._fk_kernel, nimble-indexed decode) ------
    root_p = s[:, 0:3]
    q_root = _k_aa_to_q(s[:, 3:6], c)
    q_loc = {}
    for i, j in enumerate(_ACTIVE):
        m = _B2N[i]                                 # nimble aa slot
        q_loc[j] = _k_aa_to_q(s[:, 6 + 3 * m: 9 + 3 * m], c)

    n_links = len(parent) + 1
    q_all = [None] * n_links
    p_all = [None] * n_links
    p_com = [None] * n_links
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

    for li in range(n_links):
        p_com[li] = p_all[li] + _k_qrot(q_all[li], coff_ref[li:li + 1, :], c)
        jf_ref[li:li + 1, :] = p_all[li] @ ep7 + q_all[li] @ eq7
        com_ref[li:li + 1, :] = p_com[li] @ ep7 + q_all[li] @ eq7

    # ---- per-SBP residues + root correction (ops/sbp.py, ref
    # data_utils.py:397-412,473-548) ---------------------------------------
    feet_sum = jnp.zeros_like(root_p)
    n_feet = jnp.zeros_like(s[:, 0:1])
    for k in range(n_sbps):
        row = int(SBP_PQ_ROWS[k])
        x1 = prev_pq_ref[row:row + 1, 0:3]
        q1 = prev_pq_ref[row:row + 1, 3:7]
        x2 = p_com[row]
        q2 = q_all[row]
        flag = ct[:, 4 * k: 4 * k + 1] > 0.0        # (1, 1) bool
        offs = ct[:, 4 * k + 1: 4 * k + 4]
        v = (x2 - x1) / dt
        w = _k_angvel(q1, q2, dt, c)
        res = _k_cross(w, offs, c) + v
        fl = jnp.where(flag, 1.0, 0.0)
        clocs_ref[k:k + 1, :] = jnp.where(flag, x2 + offs, 100.0)
        rres_ref[k:k + 1, :] = jnp.where(flag, res, jnp.nan)
        act_ref[k:k + 1, :] = fl
        if k < 2:                                   # feet drive the mean
            feet_sum = feet_sum + fl * res
            n_feet = n_feet + fl
    mean = feet_sum / jnp.maximum(n_feet, 1.0)      # 0 when no feet active
    vres_ref[0:1, :] = jnp.clip(mean, -0.5, 0.5)

    # ---- history re-encode (state_to_history / rotations.aa_to_sixd):
    # reuse the walk's own joint quats — s[3:57].reshape(18,3) rows are
    # [root aa, nimble joints 0..16] and each decoded quat already exists.
    hist_ref[0:1, :] = _k_sixd_row(q_root, e6)
    for m in range(17):
        hist_ref[m + 1:m + 2, :] = _k_sixd_row(q_loc[_NIMBLE_TO_JOINT[m]], e6)


@functools.partial(jax.jit, static_argnames=("dt", "interpret"))
def tail_fused(skel: kin.Skeleton, s_t, c_t, prev_pq, dt: float = cst.DT,
               interpret: bool = False) -> TailOut:
    """Fused-kernel equivalent of stages 6-7 of the runner (minus the
    mode-dependent z fix and the -vel_res*dt shifts, which stay in XLA so
    the minimal/full runners keep their distinct ground models):

        pq_com, pq_jf = kinematics.fk_our_state(skel, s_t, True)
        corr = sbp.root_correction_from_constrs(prev_pq, pq_com, c_t)
        hist_sixd = rotations.aa_to_sixd(s_t[3:57].reshape(18, 3))

    for a single (114,) nimble state and the 5-SBP layout. Matches the XLA
    path to float rounding (tests/test_fused_tail.py).
    """
    n_sbps = 5
    assert c_t.shape == (n_sbps * 4,), c_t.shape
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    dtd = s_t.dtype
    kern = functools.partial(
        _tail_kernel, parent=tuple(skel.parent),
        is_fixed=tuple(skel.is_fixed), dt=float(dt), n_sbps=n_sbps)
    consts = tuple(jnp.asarray(m, dtd) for m in
                   (_ROLL1, _ROLL2, _E_V4, _E_W4, _E_P7, _E_Q7, _EYE6))
    n_links = skel.n_joints + 1
    outs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((n_links, 7), dtd),       # pq_com
            jax.ShapeDtypeStruct((n_links, 7), dtd),       # pq_jf
            jax.ShapeDtypeStruct((18, 6), dtd),            # hist_sixd
            jax.ShapeDtypeStruct((1, 3), dtd),             # vel_res
            jax.ShapeDtypeStruct((n_sbps, 3), dtd),        # c_locs
            jax.ShapeDtypeStruct((n_sbps, 3), dtd),        # raw_res
            jax.ShapeDtypeStruct((n_sbps, 1), dtd),        # active
        ],
        in_specs=[spec] * (3 + 2 + len(consts)),
        out_specs=[spec] * 7,
        interpret=interpret,
    )(s_t[None], c_t[None], prev_pq, skel.joint_offset, skel.com_offset,
      *consts)
    pq_com, pq_jf, hist_sixd, vres, clocs, rres, act = outs
    return TailOut(pq_com=pq_com, pq_jf=pq_jf, hist_sixd=hist_sixd,
                   vel_res=vres[0], c_locs=clocs, raw_res=rres,
                   active=act[:, 0])
