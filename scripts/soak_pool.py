"""Serving-pool churn soak: StreamPool under continuous add/remove.

Complements scripts/soak.py (single full-runner stream): this drives the
BATCHED serving stack — donated carries, the carry lock, the global ring
cursor, slot recycling — for thousands of ticks with clients joining and
leaving every few ticks. Asserted properties:

  * per-slot ISOLATION: a sentinel stream (slot 0, never churned) is
    compared tick-by-tick against a second, churn-free pool fed the same
    frames and global ticks — the batched kernel's rows must be
    independent, so the trajectories must agree to fp tolerance despite
    hundreds of add/remove cycles around the sentinel;
  * donation-failure RECOVERY: mid-run, one injected failure DELETES the
    donated carry buffers before raising (simulating a dispatch that died
    after donation invalidated them); the pool must rebuild and keep
    serving without touching the deleted buffers;
  * all active-slot outputs finite; current host RSS (from /proc/self/statm,
    not the ru_maxrss high-water mark) reported before/after.

Run on the TPU: python scripts/soak_pool.py [--ticks 3000] [--capacity 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_now_mb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=3000)
    ap.add_argument("--capacity", type=int, default=64)
    ap.add_argument("--serving_mode", default="kv_cache_rnn_carry")
    ap.add_argument("--forward_impl", default="fused")
    ap.add_argument("--block_each_tick", action="store_true",
                    help="block on every tick's outputs and record a "
                         "client-visible per-tick latency histogram "
                         "(p50/p99). NOTE: on this rig each blocked tick "
                         "pays the ~30 ms host<->TPU tunnel RTT, which "
                         "dominates the device-side step (see "
                         "bench_throughput.py for the amortized device "
                         "time); the histogram's value here is the CHURN "
                         "tail — whether add/remove/rebuild events stall "
                         "ticks — not the absolute level.")
    ap.add_argument("--device_time_window", type=int, default=0,
                    metavar="W",
                    help="certify the churn-tick latency in DEVICE time "
                         "(VERDICT r4): dispatch W ticks back-to-back "
                         "without blocking (donation chains them on "
                         "device), sync at window boundaries, and record "
                         "wall/W per window — the tunnel RTT is paid once "
                         "per window instead of per tick. Windows cover "
                         "the second (single-pool, production-shape) half "
                         "only, where the isolation oracle's extra pool "
                         "is quiet; churn keeps running inside windows. "
                         "Try W=30 (0.5 s of 60 Hz stream).")
    args = ap.parse_args()

    import jax

    from bench import make_stream
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
    # churn-free reference pool: only the sentinel, same ticks/frames — the
    # per-slot isolation oracle
    ref_pool = StreamPool(params, cfg, skel, capacity=args.capacity)

    s_init = np.zeros(114, np.float32)
    s_init[2] = 0.9
    s_init[3:6] = [1.20919958] * 3

    rng = np.random.default_rng(0)
    stream = make_stream(600).astype(np.float32)
    idle = np.zeros(72, np.float32)
    idle[0] = idle[4] = idle[8] = 1.0
    batch = np.tile(idle, (args.capacity, 1))
    ref_batch = np.tile(idle, (args.capacity, 1))

    assert pool.add_stream(s_init) == 0          # sentinel, never churned
    assert ref_pool.add_stream(s_init) == 0
    for _ in range(args.capacity // 2 - 1):
        pool.add_stream(s_init)

    import jax.numpy as jnp

    @jax.jit
    def _iso_update(acc, a, b):
        return jnp.maximum(acc, jnp.abs(a - b).max())

    iso_dev = jnp.zeros((), jnp.float32)

    from tip_tpu.utils.observability import LatencyHistogram
    hist = LatencyHistogram(capacity=args.ticks)
    dev_windows = []                    # --device_time_window samples (s/tick)

    ok = True
    drops = adds = 0
    injected_recovered = False
    iso_max = 0.0
    inject_at = args.ticks // 2
    t0 = time.time()
    rss_warm = None
    rss_single_phase = None
    for t in range(args.ticks):
        if t % 8 == 3 and pool.n_active > 4:
            active_nonsentinel = np.flatnonzero(pool.active[1:]) + 1
            if len(active_nonsentinel):
                slot = int(rng.choice(active_nonsentinel))
                pool.remove_stream(slot)
                batch[slot] = idle
                drops += 1
        if t % 8 == 7 and pool.n_active < args.capacity:
            pool.add_stream(s_init)
            adds += 1

        for slot in np.flatnonzero(pool.active):
            batch[slot] = stream[(t + slot) % len(stream)]
        ref_batch[0] = batch[0]

        if t == inject_at:
            # simulate a dispatch that failed AFTER donation invalidated
            # the buffers: delete them, then raise — the rebuild must not
            # touch the deleted carries
            orig = pool._step

            def boom(params_, packed_, carries_, imu_, tick_):
                for leaf in jax.tree_util.tree_leaves(carries_):
                    leaf.delete()
                raise RuntimeError("injected post-donation failure")

            pool._step = boom
            try:
                pool.step(batch)
            except RuntimeError:
                injected_recovered = True
            pool._step = orig

        W = args.device_time_window
        k = t - inject_at - 1          # 0-based tick index, single-pool half
        if args.block_each_tick:
            t_tick = time.perf_counter()
            out = pool.step(batch)
            jax.block_until_ready(out["qdq"])
            hist.record(time.perf_counter() - t_tick)
        else:
            # windowed device timing: W ticks dispatched back-to-back
            # (donation chains them on device), one sync per window — the
            # tunnel RTT amortises over W while churn keeps running inside
            # the window
            if W and k >= 0 and k % W == 0:
                if k == 0:
                    jax.block_until_ready(out["qdq"])   # drain the backlog
                t_win = time.perf_counter()
            out = pool.step(batch)
            if W and k >= 0 and k % W == W - 1:
                jax.block_until_ready(out["qdq"])
                dev_windows.append((time.perf_counter() - t_win) / W)

        # isolation oracle phase (first half, up to the injection which
        # restarts the churn pool's sessions): the sentinel must track a
        # churn-free reference pool fed the same frames/ticks. The diff
        # accumulates ON DEVICE (fetched every 500 ticks), and the
        # reference pool stops after this phase: interleaving executables
        # that exchange device buffers leaks host memory in this rig's
        # tunnel client (PERF.md soak_pool diagnosis — single-pool serving,
        # the production shape, is measured flat). The second half is
        # therefore also the production-configuration RSS measurement.
        if t < inject_at:
            ref_out = ref_pool.step(ref_batch)
            iso_dev = _iso_update(iso_dev, out["qdq"][0], ref_out["qdq"][0])

        if t % 500 == 0 or t == args.ticks - 1:
            q = np.asarray(out["qdq"])[pool.active]
            if not np.isfinite(q).all():
                ok = False
                print(f"tick {t}: non-finite output!")
            iso_max = float(iso_dev)
            if iso_max > 1e-4:
                ok = False
                print(f"tick {t}: sentinel isolation broken "
                      f"(max diff {iso_max})")
            if t == 500:
                rss_warm = rss_now_mb()
            if rss_single_phase is None and t >= inject_at + 500:
                rss_single_phase = rss_now_mb()
            print(f"tick {t}  active={pool.n_active}  "
                  f"churn={adds + drops}  iso_max={iso_max:.2e}  "
                  f"rss={rss_now_mb():.0f} MB", flush=True)

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
        "sentinel_isolation_max_diff": iso_max,
        "injected_post_donation_failure_recovered": injected_recovered,
        "ok": ok,
        "ms_per_tick_incl_host": round(wall / args.ticks * 1e3, 3),
        "rss_now_growth_mb_after_warmup": round(
            rss_now_mb() - (rss_warm or rss_now_mb()), 1),
        # growth during the single-pool (production-shape) phase only;
        # null when the run was too short to enter that phase
        "rss_growth_mb_single_pool_phase": (
            round(rss_now_mb() - rss_single_phase, 1)
            if rss_single_phase is not None else None),
        # client-visible per-tick latency under churn (RTT-inclusive on
        # this rig; see --block_each_tick help)
        "tick_latency": ({k: round(v, 3) for k, v in hist.summary().items()}
                         if args.block_each_tick else None),
        # churn-tick latency in DEVICE time (ms/tick; RTT amortised over
        # --device_time_window-tick pipelined windows, single-pool phase)
        "tick_device_ms": ({
            "window": args.device_time_window,
            "n_windows": len(dev_windows),
            "p50": round(float(np.percentile(dev_windows, 50)) * 1e3, 4),
            "p95": round(float(np.percentile(dev_windows, 95)) * 1e3, 4),
            "max": round(float(np.max(dev_windows)) * 1e3, 4),
        } if dev_windows else None),
    }))
    assert ok


if __name__ == "__main__":
    main()
