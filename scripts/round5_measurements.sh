#!/bin/bash
# Round-5 measurement battery — run AFTER round4c_campaign.sh completes
# (CLAUDE.md: one TPU process at a time; this chains them strictly).
#
# Produces, under artifacts/r5/ (committed at the end of the round):
#   * stall-proofed bench.py headline + the two clean tail=xla baselines
#     ADVICE r4 asked to re-run under the same protocol as the fused sides
#   * the scaled-shape (d=1024/hd=64) MFU datapoint next to the paper shape
#   * pool churn-tick latency in device time (soak_pool windowed mode)
#   * the on-device-sampler wall-time A/B (50 epochs each arm, same data)
#   * the sensor-corruption ladder regenerated against the stage-R
#     flagship (the committed corpus_run_v2/corruption.json predates the
#     burst-length label fix and its checkpoint no longer exists)
set -u
A=/root/repo/artifacts
R5=$A/r5
mkdir -p "$R5"
cd /root/repo

stage() { echo "=== $1 ($(date -u +%H:%M:%S))"; }

stage "bench: full runner, fused tail (driver headline)"
python bench.py > "$R5/bench_full_fused.json" \
    2> "$R5/bench_full_fused.err" || exit 1
stage "bench: full runner, xla tail (clean baseline)"
python bench.py --tail_impl xla > "$R5/bench_full_xla.json" \
    2> "$R5/bench_full_xla.err" || exit 1
stage "bench: minimal, kv-carry, fused tail"
python bench.py --mode minimal --serving_mode kv_cache_rnn_carry \
    > "$R5/bench_min_kv_fused.json" 2> "$R5/bench_min_kv_fused.err" || exit 1
stage "bench: minimal, kv-carry, xla tail (clean baseline)"
python bench.py --mode minimal --serving_mode kv_cache_rnn_carry \
    --tail_impl xla > "$R5/bench_min_kv_xla.json" \
    2> "$R5/bench_min_kv_xla.err" || exit 1
stage "bench: minimal recompute, fused tail"
python bench.py --mode minimal > "$R5/bench_min_fused.json" \
    2> "$R5/bench_min_fused.err" || exit 1

stage "train-step MFU: scaled d=1024/hd=64 next to the paper shape"
python scripts/bench_train_step.py --scaled --steps 50 \
    > "$R5/mfu_scaled.jsonl" 2> "$R5/mfu_scaled.err" || exit 1

stage "pool churn latency in device time (3000 ticks, 30-tick windows)"
python scripts/soak_pool.py --ticks 3000 --device_time_window 30 \
    > "$R5/soak_device_time.log" 2>&1 || exit 1

stage "sampler A/B arm 1: 50 epochs, device-side window sampling"
rm -rf "$A/sampler_ab_device"
python scripts/train_convergence.py --out "$A/sampler_ab_device" \
    --epochs 50 --phase train --data_prefix "$A/corpus_run_v2/packed" \
    --dropout_impl hash --sampler device \
    > "$R5/sampler_device.log" 2>&1 || exit 1
stage "sampler A/B arm 2: 50 epochs, host sampling (status quo)"
rm -rf "$A/sampler_ab_host"
python scripts/train_convergence.py --out "$A/sampler_ab_host" \
    --epochs 50 --phase train --data_prefix "$A/corpus_run_v2/packed" \
    --dropout_impl hash --sampler host \
    > "$R5/sampler_host.log" 2>&1 || exit 1

stage "corruption ladder vs the stage-R flagship checkpoint"
python scripts/eval_corruption.py --out "$A/corpus_run_v2_repro" \
    --test_dir "$A/corpus_run_v2/corpus_test" --n_motions 20 \
    > "$R5/corruption_repro.log" 2>&1 || exit 1

stage "battery complete"
