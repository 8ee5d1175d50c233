#!/bin/bash
# Waits for the in-flight round5_campaign.sh (by PID), then runs the
# round-5 measurement battery and commits its artifacts. Launched detached
# so a builder-session restart cannot orphan the sequence (CLAUDE.md: the
# TPU tolerates exactly one python process; this chains them strictly).
set -u
CAMPAIGN_PID="${1:?usage: round5_chain.sh <campaign_pid>}"
A=/root/repo/artifacts
cd /root/repo

while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do sleep 60; done
echo "=== campaign pid $CAMPAIGN_PID gone ($(date -u +%H:%M:%S))"
sleep 30   # let the chip settle after the last stage's teardown

if ! grep -q "campaign complete" "$A/r5_campaign.log"; then
  echo "campaign did NOT reach completion marker; running battery anyway" >&2
fi

bash scripts/round5_measurements.sh >> "$A/r5_measurements.log" 2>&1
rc=$?
echo "=== measurements rc=$rc ($(date -u +%H:%M:%S))"

git add -f artifacts/r5 "$A/r5_measurements.log" \
    "$A/corpus_run_v2_repro/corruption.json" 2>/dev/null
git commit -q -m "round-5 measurement battery: clean bench baselines, scaled MFU, device-time churn, sampler A/B, corruption ladder vs stage-R flagship" \
  || echo "(nothing to commit from battery)"
echo "=== chain done ($(date -u +%H:%M:%S))"
