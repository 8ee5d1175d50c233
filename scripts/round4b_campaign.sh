#!/bin/bash
# Round-4b TPU campaign — the round-4a host move wiped the gitignored
# checkpoints/packed blobs mid-stage-F, so this finishes the campaign on
# the new host. Strictly sequential TPU stages (CLAUDE.md: one TPU process
# at a time), every stage resumable. CPU data prep (corpus regen, v3
# supplement pack) happens BEFORE this script; it must not run while any
# stage is on the chip.
#
# Stages:
#   F   leave-one-family-out (no dance) — restarted from scratch (the 4a
#       run died at epoch ~720 with only metrics surviving); closes the
#       "Pending: stage E/F" row in RESULTS.md
#   T   fused-tail kernel latency matrix (bench.py --tail_impl fused) —
#       the PERF.md numbers deferred in round 4a
#   H   corpus v3 freeform-boost: v2 corpus + 60 enriched freeform2
#       training motions, SAME v2 held-out set -> paired A/B against the
#       archived flagship results.json (the RESULTS.md quality tail)
#   R   flagship v2 reproducibility retrain: same data/seeds/config in a
#       fresh dir; results are diffed against the archived results.json
#       and the final checkpoint is force-added to git so the flagship
#       model survives future host moves
set -u
A=/root/repo/artifacts
cd /root/repo

test -f "$A/corpus_run_lofo/packed_imu.npy" || { echo "LOFO data not packed"; exit 1; }

echo "=== stage F: leave-one-family-out (no dance) ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_lofo" \
    --epochs 1100 --n_train 300 --n_test 40 --exclude dance \
    --eval_family dance --test_dir "$A/corpus_run_v2/corpus_test" \
    --dropout_impl hash \
    >> "$A/stageF_lofo.log" 2>&1 || exit 1

echo "=== stage T: fused-tail bench matrix ($(date -u +%H:%M:%S))"
{
  for mode in minimal full; do
    for tail in xla fused; do
      echo "--- mode=$mode serving=kv_cache_rnn_carry tail=$tail"
      python bench.py --mode $mode --serving_mode kv_cache_rnn_carry --tail_impl $tail
      echo "--- mode=$mode serving=recompute tail=$tail"
      python bench.py --mode $mode --tail_impl $tail
    done
  done
} >> "$A/stageT_fused_tail.log" 2>&1 || exit 1

test -f "$A/corpus_run_v3/packed_imu.npy" || { echo "v3 data not packed"; exit 1; }

echo "=== stage H: corpus v3 freeform-boost ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_v3" \
    --epochs 1100 --phase train --data_prefix "$A/corpus_run_v3/packed" \
    --dropout_impl hash \
    >> "$A/stageH_v3.log" 2>&1 || exit 1
python scripts/train_convergence.py --out "$A/corpus_run_v3" \
    --epochs 1100 --phase eval --test_dir "$A/corpus_run_v2/corpus_test" \
    >> "$A/stageH_v3.log" 2>&1 || exit 1

echo "=== stage R: flagship v2 reproducibility retrain ($(date -u +%H:%M:%S))"
python scripts/train_convergence.py --out "$A/corpus_run_v2_repro" \
    --epochs 1100 --data_prefix "$A/corpus_run_v2/packed" \
    --test_dir "$A/corpus_run_v2/corpus_test" --dropout_impl hash \
    >> "$A/stageR_repro.log" 2>&1 || exit 1

echo "=== campaign complete ($(date -u +%H:%M:%S))"
