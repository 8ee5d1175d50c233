"""IMU feature transforms.

Feature layout of one frame (72,): [root_R(9), 5 x sensor_R(9)=45,
root_acc(3), 5 x sensor_acc(3)=15] — reference data layout established in
data-gen-and-viz-bullet-new.py:147-218.
"""

import jax.numpy as jnp

from tip_tpu import constants as cst


def imu_rotate_to_local(imu):
    """Rotate the 5 non-root sensors into the root sensor's frame.

    Reference data_utils.imu_rotate_to_local (data_utils.py:190-219): the root
    rotation and root acceleration stay global; the other five rotation
    matrices and accelerations are premultiplied by root_R⁻¹.  Orientations
    are exact rotation matrices here (built from quaternions, never averaged),
    so the inverse is the transpose.

    Args: imu (..., 72). Returns same shape.
    """
    lead = imu.shape[:-1]
    root_r = imu[..., :9].reshape(lead + (3, 3))
    other_r = imu[..., 9:54].reshape(lead + (5, 3, 3))
    root_acc = imu[..., 54:57]
    other_acc = imu[..., 57:72].reshape(lead + (5, 3))

    inv = jnp.swapaxes(root_r, -1, -2)
    other_r_local = jnp.einsum("...ij,...njk->...nik", inv, other_r)
    other_acc_local = jnp.einsum("...ij,...nj->...ni", inv, other_acc)

    return jnp.concatenate([
        root_r.reshape(lead + (9,)),
        other_r_local.reshape(lead + (45,)),
        root_acc,
        other_acc_local.reshape(lead + (15,)),
    ], axis=-1)


def uniform_filter1d_nearest(x, size: int, axis: int = 0):
    """Centered moving average with 'nearest' edge padding along ``axis``.

    Matches scipy.ndimage.uniform_filter1d(mode='nearest') as used for the
    train-time acc smoothing (preprocess_and_combine_syn_amass.py:82-85).
    For even ``size`` scipy centers with one extra sample on the left.
    """
    x = jnp.moveaxis(x, axis, 0)
    left = size // 2
    right = size - 1 - left
    pad = [(left, right)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(xp, axis=0)
    zero = jnp.zeros_like(c[:1])
    c = jnp.concatenate([zero, c], axis=0)
    out = (c[size:] - c[:-size]) / size
    return jnp.moveaxis(out, 0, axis)


def windowed_acc_sum(local_acc, win: int = cst.ACC_SUM_WIN_LEN,
                     scale: float = cst.ACC_SUM_DOWN_SCALE):
    """Running windowed sum of local accelerations, scaled down.

    Matches the offline packing rule (preprocess_and_combine_syn_amass.py:91-95):
    b[t] = sum(acc[max(0, t-win+1) : t+1]) / scale. local_acc: (T, 18).
    """
    b = jnp.cumsum(local_acc, axis=0)
    shifted = jnp.concatenate([jnp.zeros_like(b[:win]), b[:-win]], axis=0)
    return (b - shifted) / scale


def central_diff_acc(pos, dt_fin: float = cst.DT_FIN_ACC,
                     half_n: int = cst.ACC_FD_N):
    """Virtual accelerometer from positions via +/-half_n-frame second
    difference, with edge rows clamped (reference
    data-gen-and-viz-bullet-new.py:192-216).

    pos: (T, ..., 3) sensor world positions at 60 Hz. Returns same shape.
    """
    acc = jnp.zeros_like(pos)
    core = (pos[2 * half_n:] + pos[:-2 * half_n] - 2 * pos[half_n:-half_n]) \
        / (dt_fin ** 2)
    acc = acc.at[half_n:-half_n].set(core)
    acc = acc.at[:half_n].set(acc[half_n])
    acc = acc.at[-half_n:].set(acc[-half_n - 1])
    return acc
