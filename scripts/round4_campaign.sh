#!/bin/bash
# Round-4 quality campaign — strictly sequential TPU stages (this rig wedges
# under concurrent tunnel users, see CLAUDE.md). Every stage is resumable:
# train restores the latest orbax checkpoint, evals cache per-mode results
# keyed by checkpoint step, so re-running this script continues where it
# stopped. Corpus + packing are pre-generated on CPU (see artifacts/*.log).
#
# Stages (VERDICT-r3 "next round" items 1,2,5):
#   B  flagship: corpus v2 (contact-rich), 1100 epochs, hash dropout
#   G  sensor-corruption degradation ladder on the flagship checkpoint
#   D  rbg-dropout cross-check at convergence (same packed data)
#   F  leave-one-family-out (no dance), eval on the v2 dance clips
set -u
A=/root/repo/artifacts
cd /root/repo

# guard: data is pre-generated on CPU (corpus through the tunnel is ~90 s
# per motion vs ~4 s on host — never let the TPU process fall back to it)
test -f "$A/corpus_run_v2/packed_imu.npy" || { echo "v2 data not packed"; exit 1; }

echo "=== stage B: flagship hash run ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_v2" \
    --epochs 1100 --n_train 300 --n_test 40 --dropout_impl hash \
    >> "$A/stageB_hash.log" 2>&1 || exit 1

echo "=== stage G: corruption sweep ($(date -u +%H:%M:%S))"
python scripts/eval_corruption.py --out "$A/corpus_run_v2" \
    >> "$A/stageG_corruption.log" 2>&1 || exit 1

echo "=== stage D: rbg cross-check ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_v2_rbg" \
    --data_prefix "$A/corpus_run_v2/packed" \
    --test_dir "$A/corpus_run_v2/corpus_test" \
    --epochs 1100 --dropout_impl rng \
    >> "$A/stageD_rbg.log" 2>&1 || exit 1

test -f "$A/corpus_run_lofo/packed_imu.npy" || { echo "LOFO data not packed"; exit 1; }

echo "=== stage F: leave-one-family-out (no dance) ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_lofo" \
    --epochs 1100 --n_train 300 --n_test 40 --exclude dance \
    --eval_family dance --test_dir "$A/corpus_run_v2/corpus_test" \
    >> "$A/stageF_lofo.log" 2>&1 || exit 1

echo "=== campaign complete ($(date -u +%H:%M:%S))"
