"""Pack per-motion pickles into flat training blobs.

Equivalent of the reference's preprocess_and_combine_syn_amass.py:16-178,
producing byte-compatible npy blobs:

  imu_<tag>.npy      (N, 72)   root-local IMU features (acc pre-smoothed with
                               an 11-frame 'nearest' moving average + constant
                               per-sequence bias noise — train/test symmetry
                               with the runner's online smoothing)
  sum_imu_<tag>.npy  (N, 18)   windowed acc-sum / 15
  s_<tag>.npy        (N, 131)  [108 two-axis pose, 3 root vel, 20 SBP]
  info_<tag>.npy     (M, 3)    [start, end, downsample] segment table

Per motion: crop 4 frames at each end; DIP sequences get NaN root velocity
(no translation ground truth -> excluded from the loss).
"""

import os
import pickle
import re
import time
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu.ops import imu as imu_ops
from tip_tpu.ops import rotations as rot


@jax.jit
def _features_jax(imu, bias, s_aa):
    """The whole per-motion jax chain as ONE compiled dispatch — the eager
    op-by-op version cost ~7 s/motion through this rig's ~30 ms-RTT device
    tunnel (~50 dispatches). Numerically identical to the unfused calls."""
    acc = imu_ops.uniform_filter1d_nearest(
        imu[:, 54:72], cst.ACC_MOVING_AVE_LEN, axis=0) + bias
    imu_f = jnp.concatenate([imu[:, :54], acc], axis=1)
    imu_local = imu_ops.imu_rotate_to_local(imu_f)
    acc_sum = imu_ops.windowed_acc_sum(imu_local[:, 54:72])
    sixd = rot.aa_to_sixd(s_aa)
    return imu_local, acc_sum, sixd


def process_motion(payload: dict, is_dip: bool,
                   rng: np.random.Generator):
    """One motion pkl -> (imu_local (T,72), acc_sum (T,18), s_2axis_c (T,131))
    or None if too short."""
    imu = np.array(payload["imu"], np.float64)
    s = np.array(payload["nimble_qdq"], np.float64)
    c = np.array(payload["constrs"], np.float64)

    if is_dip:
        s[:, cst.N_DOFS:cst.N_DOFS + 3] = np.nan

    assert abs(len(imu) - len(s)) <= 1
    m_len = min(len(imu), len(s))
    if m_len <= cst.ACC_SUM_WIN_LEN:
        return None
    imu, s, c = imu[4:m_len - 4], s[4:m_len - 4], c[4:m_len - 4]

    # train-time acc smoothing matches the runner's online filter; constant
    # per-sequence accelerometer bias noise (reference :82-86)
    bias = rng.uniform(-cst.BIAS_NOISE_ACC, cst.BIAS_NOISE_ACC, 18)
    s_q = s[:, 3:cst.N_DOFS + 3]
    imu_local, acc_sum, sixd = _features_jax(
        jnp.asarray(imu), jnp.asarray(bias),
        jnp.asarray(s_q[:, :54].reshape(-1, 18, 3)))
    imu_local, acc_sum = np.asarray(imu_local), np.asarray(acc_sum)

    # state channels: [root aa + 17 joint aa, root vel] -> two-axis + c
    s_2axis = np.concatenate(
        [np.asarray(sixd).reshape(len(s_q), 108), s_q[:, 54:57]], axis=1)
    out_s = np.concatenate([s_2axis, c], axis=1)
    return (imu_local.astype(np.float32), acc_sum.astype(np.float32),
            out_s.astype(np.float32))


def combine(dataset_dirs: Sequence[str], downsample_rates: Sequence[int],
            out_prefix: str, name_contains: Optional[List[str]] = None,
            seed: int = 42):
    """Walk per-motion pkl dirs and write the four blobs.

    DIP dirs are recognised by 'preprocessed_DIP_IMU' in the path (reference
    :41). Returns the info table."""
    rng = np.random.default_rng(seed)
    assert len(dataset_dirs) == len(downsample_rates)

    imus, sums, states, info = [], [], [], []
    start_f = end_f = 0
    count = 0
    t0 = time.time()

    for d, rate in zip(dataset_dirs, downsample_rates):
        is_dip = "preprocessed_DIP_IMU" in d
        files = []
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            if not (p.endswith(".pkl") and os.path.isfile(p)):
                continue
            if name_contains and not any(
                    re.search(nc, p, re.IGNORECASE) for nc in name_contains):
                continue
            files.append(p)

        for p in files:
            with open(p, "rb") as f:
                payload = pickle.load(f)
            res = process_motion(payload, is_dip, rng)
            if res is None:
                print("too short:", p)
                continue
            imu_local, acc_sum, out_s = res
            count += 1
            end_f += len(imu_local)
            imus.append(imu_local)
            sums.append(acc_sum)
            states.append(out_s)
            info.append([start_f, end_f, rate])
            start_f = end_f

    if not imus:
        raise ValueError(
            f"no motions to pack: nothing under {list(dataset_dirs)} "
            f"survived the name_contains filter "
            f"({name_contains or 'none'}) and the min-length check — "
            f"check the directories and filters")
    info = np.array(info, np.int64)
    np.save(f"{out_prefix}_imu.npy", np.concatenate(imus))
    np.save(f"{out_prefix}_sum_imu.npy", np.concatenate(sums))
    np.save(f"{out_prefix}_s.npy", np.concatenate(states))
    np.save(f"{out_prefix}_info.npy", info)
    print(f"packed {count} motions, {end_f} frames in {time.time()-t0:.1f}s")
    return info
