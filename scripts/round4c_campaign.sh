#!/bin/bash
# Round-4c campaign — the SECOND host move of round 4 (between the 4a/4b
# builder sessions) again wiped every gitignored blob: v2 corpus+pack+ckpt,
# LOFO pack, v3 pack. Only git-tracked artifacts survived (results.json,
# train_metrics.jsonl, corruption.json, corpus_run_v3/corpus_extra).
#
# This script re-derives all data ON CPU (deterministic seeds; the corpus
# generator skips existing files) and then runs the remaining TPU stages
# strictly sequentially (CLAUDE.md: one TPU process at a time; CPU python
# beside a TPU job wedges the tunnel — hence prep BEFORE any TPU stage).
# Stage T (fused-tail bench matrix) is run separately before this script.
#
# Stages:
#   prep  v2 corpus (300 train seed=100 + 40 test seed=900, 12.5 s clips)
#         + pack; LOFO corpus (no dance) + pack; v3 pack (v2 base +
#         tracked corpus_extra freeform2 supplement)
#   F     leave-one-family-out (no dance), eval incl. dance family —
#         closes the "Pending: stage E/F" row in RESULTS.md
#   H     corpus v3 freeform-boost A/B vs the archived v2 results.json
#   R     flagship v2 reproducibility retrain; final checkpoint is
#         force-added to git so the flagship survives future host moves
set -u
A=/root/repo/artifacts
cd /root/repo
TC="python scripts/train_convergence.py"

echo "=== prep: v2 corpus regen ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_v2" --phase corpus --n_train 300 --n_test 40 \
    --platform cpu >> "$A/regen_v2.log" 2>&1 || exit 1
$TC --out "$A/corpus_run_v2" --phase pack --platform cpu \
    >> "$A/regen_v2.log" 2>&1 || exit 1

echo "=== prep: LOFO corpus regen ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_lofo" --phase corpus --n_train 300 --n_test 40 \
    --exclude dance --test_dir "$A/corpus_run_v2/corpus_test" \
    --platform cpu >> "$A/regen_lofo.log" 2>&1 || exit 1
$TC --out "$A/corpus_run_lofo" --phase pack --platform cpu \
    >> "$A/regen_lofo.log" 2>&1 || exit 1

echo "=== prep: v3 pack (v2 base + tracked freeform2 supplement) ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_v3" --phase pack \
    --base_train_dir "$A/corpus_run_v2/corpus_train" \
    --supplement freeform2:60:0 --platform cpu \
    >> "$A/regen_v3.log" 2>&1 || exit 1

echo "=== stage F: leave-one-family-out (no dance) ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_lofo" --epochs 1100 --phase train \
    --data_prefix "$A/corpus_run_lofo/packed" --dropout_impl hash \
    >> "$A/stageF_lofo.log" 2>&1 || exit 1
$TC --out "$A/corpus_run_lofo" --epochs 1100 --phase eval \
    --test_dir "$A/corpus_run_v2/corpus_test" \
    >> "$A/stageF_lofo.log" 2>&1 || exit 1
git add -f "$A/corpus_run_lofo/results.json" 2>/dev/null

echo "=== stage H: corpus v3 freeform-boost ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_v3" --epochs 1100 --phase train \
    --data_prefix "$A/corpus_run_v3/packed" --dropout_impl hash \
    >> "$A/stageH_v3.log" 2>&1 || exit 1
$TC --out "$A/corpus_run_v3" --epochs 1100 --phase eval \
    --test_dir "$A/corpus_run_v2/corpus_test" \
    >> "$A/stageH_v3.log" 2>&1 || exit 1
git add -f "$A/corpus_run_v3/results.json" 2>/dev/null

echo "=== stage R: flagship v2 reproducibility retrain ($(date -u +%H:%M:%S))"
$TC --out "$A/corpus_run_v2_repro" --epochs 1100 --phase train \
    --data_prefix "$A/corpus_run_v2/packed" --dropout_impl hash \
    >> "$A/stageR_repro.log" 2>&1 || exit 1
$TC --out "$A/corpus_run_v2_repro" --epochs 1100 --phase eval \
    --test_dir "$A/corpus_run_v2/corpus_test" \
    >> "$A/stageR_repro.log" 2>&1 || exit 1
# the repro run's final checkpoint becomes the in-tree flagship model:
# force-add it so the next host move cannot orphan the quality claims
git add -f "$A"/corpus_run_v2_repro/ckpt "$A"/corpus_run_v2_repro/results.json \
    "$A"/corpus_run_v2_repro/train_metrics.jsonl 2>/dev/null

echo "=== campaign complete ($(date -u +%H:%M:%S))"
