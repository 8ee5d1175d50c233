"""Long-stream soak: 10+ minutes of 60 Hz streaming through the FULL runner.

Backs the O(window)-memory claim (COVERAGE.md §2.8): the reference's Python
runner grows unbounded raw buffers over long sessions (a real leak,
real_time_runner_minimal.py:131,139,144 slices but never frees); this
framework's carry is a fixed pytree, so a 36k-frame stream must run in
constant device memory with finite outputs and no terrain-table overflow.

Run on the TPU:  python scripts/soak.py [--frames 36000] [--chunk 3600]
Prints one JSON line with drift/latency/terrain stats (recorded in PERF.md).
"""

import argparse
import json
import resource
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36000)   # 10 min @ 60 Hz
    ap.add_argument("--chunk", type=int, default=3600)
    ap.add_argument("--serving_mode", default="recompute",
                    choices=["recompute", "kv_cache", "kv_cache_rnn_carry"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, ".")
    from bench import make_stream
    from tip_tpu.models import tip_model as M
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import full_runner as FR
    from tip_tpu.runtime import runner as R
    from tip_tpu.runtime import terrain as terrain_lib

    base_cfg = R.RunnerConfig(model=M.ModelConfig(rnn_impl="pallas"),
                              serving_mode=args.serving_mode)
    fcfg = FR.FullRunnerConfig(base=base_cfg,
                               terrain=terrain_lib.TerrainConfig(),
                               multi_sbp=True)
    params = M.init_params(jax.random.PRNGKey(0), base_cfg.model)
    skel = kin.amass_skeleton()

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958, 1.20919958, 1.20919958]

    @jax.jit
    def run_chunk(params, carry, chunk):
        def sstep(c, x):
            c, out = FR.full_runner_step(params, c, x, fcfg, skel)
            return c, out["qdq"][:3]             # root track only

        return jax.lax.scan(sstep, carry, chunk)

    carry = FR.full_runner_init(fcfg, skel, jnp.asarray(s_init))
    n_chunks = args.frames // args.chunk
    roots = []
    rss = []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        chunk = jnp.asarray(make_stream(args.chunk, seed=i))
        carry, r = run_chunk(params, carry, chunk)
        roots.append(np.asarray(r))
        rss.append(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
        print(f"chunk {i + 1}/{n_chunks}  "
              f"t={carry.base.t}  rss={rss[-1] // 1024} MB", flush=True)
    wall = time.perf_counter() - t0

    roots = np.concatenate(roots)
    n_regions = int(carry.terrain.n_regions)
    ok = (np.isfinite(roots).all()
          and n_regions <= fcfg.terrain.max_regions
          and bool(np.isfinite(np.asarray(carry.terrain.region_height)).all())
          and bool(np.isfinite(np.asarray(carry.base.last_s)).all()))
    # host RSS growth after the first chunk (compile) must be ~flat
    rss_growth_mb = (rss[-1] - rss[1]) / 1024 if len(rss) > 2 else 0.0

    print(json.dumps({
        "metric": "soak_full_runner",
        "serving_mode": args.serving_mode,
        "frames": args.frames,
        "ok": ok,
        "per_frame_ms": round(wall / args.frames * 1e3, 4),
        "root_drift_final_m": round(float(np.linalg.norm(roots[-1][:2])), 3),
        "root_abs_max_m": round(float(np.abs(roots).max()), 3),
        "terrain_regions_used": n_regions,
        "terrain_capacity": fcfg.terrain.max_regions,
        "rss_growth_mb_after_warmup": round(rss_growth_mb, 1),
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
