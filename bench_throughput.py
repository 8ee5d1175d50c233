"""Secondary benchmark: batched multi-stream throughput (IMU frames/s/chip).

Target (BASELINE.json): >= 10,000 frames/s/chip. Runs B concurrent streams
through the runner step (vmap) for T frames (lax.scan), all on device.
Covers the serving modes (runtime/streaming_cache.py): "recompute" (the
reference-parity windowed forward), "kv_cache" (per-layer K/V rings, exact
until the window slides), and "kv_cache_rnn_carry" (carried RNN hidden,
one RNN step/frame). ``chunk`` applies optional lax.map VMEM
blocking (the kv modes scale monotonically without it, PERF.md).

Prints one JSON line per configuration.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_stream
    from tip_tpu.models import tip_model as M
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import runner as R

    skel = kin.amass_skeleton()

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958, 1.20919958, 1.20919958]

    T = 120
    stream = make_stream(T)

    # (batch, compute_dtype, serving_mode, chunk, forward_impl)
    configs = [
        (256, None, "recompute", None, "xla"),
        (256, "bfloat16", "recompute", None, "xla"),
        (512, "bfloat16", "recompute", None, "xla"),
        # EXACT-semantics serving via the batched fused windowed-recompute
        # kernels — measured ~10% below the XLA rows above (the honest
        # negative result, PERF.md round-3 study); kept for regression
        # tracking
        (512, "bfloat16", "recompute", None, "fused"),
        (256, "bfloat16", "kv_cache", None, "xla"),
        (256, "bfloat16", "kv_cache_rnn_carry", None, "xla"),
        (256, "bfloat16", "kv_cache_rnn_carry", None, "fused"),
        (512, "bfloat16", "kv_cache_rnn_carry", None, "fused"),
        (1024, "bfloat16", "kv_cache_rnn_carry", None, "fused"),
        (512, "bfloat16", "kv_cache", None, "fused"),
        (2048, "bfloat16", "kv_cache_rnn_carry", None, "fused"),
        (4096, "bfloat16", "kv_cache_rnn_carry", None, "fused"),
    ]
    for B, compute_dtype, mode, chunk, fwd in configs:
        cfg = R.RunnerConfig(model=M.ModelConfig(compute_dtype=compute_dtype,
                                                 forward_impl=fwd),
                             serving_mode=mode)
        params = M.init_params(jax.random.PRNGKey(0), cfg.model)
        streams = jnp.asarray(np.broadcast_to(stream, (B, T, 72))
                              .transpose(1, 0, 2).copy())    # (T, B, 72)

        ticks = jnp.arange(T, dtype=jnp.int32)

        @jax.jit
        def run(params, streams, ticks, cfg=cfg, B=B, chunk=chunk):
            carry0 = R.runner_init(cfg, skel, jnp.asarray(s_init))
            carries = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry0)
            # tick: global ring cursor, unbatched across the pool — turns
            # the kv-cache per-stream ring scatter into one
            # dynamic-update-slice (streaming_cache)
            vstep = jax.vmap(
                lambda c, x, tk: R.runner_step(params, c, x, cfg, skel,
                                               tick=tk),
                in_axes=(0, 0, None))

            def sstep(cs, xs):
                x_b, tk = xs
                if chunk and chunk < B:
                    csc = jax.tree_util.tree_map(
                        lambda a: a.reshape((B // chunk, chunk) + a.shape[1:]),
                        cs)
                    xc = x_b.reshape(B // chunk, chunk, 72)
                    cs2, out = jax.lax.map(
                        lambda args: vstep(args[0], args[1], tk), (csc, xc))
                    cs2 = jax.tree_util.tree_map(
                        lambda a: a.reshape((B,) + a.shape[2:]), cs2)
                    return cs2, out["qdq"].reshape(B, -1)[:, :3]
                cs2, out = vstep(cs, x_b, tk)
                return cs2, out["qdq"][:, :3]

            _, o = jax.lax.scan(sstep, carries, (streams, ticks))
            return o

        jax.block_until_ready(run(params, streams, ticks))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, streams, ticks))
            times.append(time.perf_counter() - t0)
        fps = B * T / min(times)
        print(json.dumps({
            "metric": "batched_throughput",
            "batch": B,
            "compute_dtype": compute_dtype or "float32",
            "serving_mode": mode,
            "forward_impl": fwd,
            "chunk": chunk,
            "value": round(fps, 0),
            "unit": "frames/s/chip",
            "vs_target_10k": round(fps / 1e4, 2),
        }))


if __name__ == "__main__":
    main()
