"""Secondary benchmark: batched multi-stream throughput (IMU frames/s/chip).

Target (BASELINE.json): >= 10,000 frames/s/chip. Runs B concurrent streams
through the full runner step (vmap) for T frames (lax.scan), all on device.
Prints one JSON line per batch size.
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

    skel = kin.amass_skeleton()

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958, 1.20919958, 1.20919958]

    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    T = 120
    base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.3)
    frames = []
    for _ in range(T):
        base = Rotation.from_rotvec(rng.normal(size=(6, 3)) * 0.02) * base
        frames.append(np.concatenate([base.as_matrix().reshape(-1),
                                      rng.normal(size=18) * 0.5]))
    stream = np.stack(frames).astype(np.float32)

    # batched serving uses the lax.scan RNN (the Pallas kernel wins on
    # single-stream latency but serialises under vmap); bf16 compute adds ~8%
    configs = [(64, None), (256, None), (512, None), (256, "bfloat16")]
    for B, compute_dtype in configs:
        cfg = R.RunnerConfig(model=M.ModelConfig(compute_dtype=compute_dtype))
        params = M.init_params(jax.random.PRNGKey(0), cfg.model)
        streams = jnp.asarray(np.broadcast_to(stream, (B, T, 72))
                              .transpose(1, 0, 2).copy())    # (T, B, 72)

        @jax.jit
        def run(params, streams):
            carry0 = R.runner_init(cfg, skel, jnp.asarray(s_init))
            carries = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry0)

            def sstep(cs, x_b):
                cs, out = jax.vmap(
                    lambda c, x: R.runner_step(params, c, x, cfg, skel)
                )(cs, x_b)
                return cs, out["qdq"][:, :3]

            _, o = jax.lax.scan(sstep, carries, streams)
            return o

        jax.block_until_ready(run(params, streams))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, streams))
            times.append(time.perf_counter() - t0)
        fps = B * T / min(times)
        print(json.dumps({
            "metric": "batched_throughput",
            "batch": B,
            "compute_dtype": compute_dtype or "float32",
            "value": round(fps, 0),
            "unit": "frames/s/chip",
            "vs_target_10k": round(fps / 1e4, 2),
        }))


if __name__ == "__main__":
    main()
