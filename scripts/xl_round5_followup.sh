#!/usr/bin/env bash
# Round-5 follow-up driver: waits for the running xl_chain.sh to finish,
# retries it if a stage died (every stage is resumable), then runs the
# host-feed measurement (VERDICT r4 weak #5) and the s2h0 confident-mode
# experiment (VERDICT r4 next #7). Detached-launch friendly: all state on
# disk, idempotent, safe to re-run.
#
# Usage: scripts/xl_round5_followup.sh <chain_pid> [s2h0_deadline_HH:MM]
#   <chain_pid> is the PID of the already-running xl_chain.sh to wait on
#   (no process-name matching anywhere: PIDs only).
#   s2h0 is skipped (not killed) if it would START after the deadline
#   (default 23:00) so the round-end bench.py gets the TPU back.
set -uo pipefail
cd "$(dirname "$0")/.."

CHAIN_PID="${1:?usage: xl_round5_followup.sh <chain_pid> [deadline]}"
DEADLINE="${2:-23:00}"
LOG=log/xl_followup.log
say() { echo "[followup $(date '+%F %T')] $*" | tee -a "$LOG"; }

say "waiting for xl_chain.sh (pid $CHAIN_PID) to finish"
while [[ -d "/proc/$CHAIN_PID" ]]; do sleep 60; done

attempt=0
until grep -q "chain complete" log/xl_chain.log 2>/dev/null; do
  attempt=$((attempt + 1))
  if (( attempt > 3 )); then
    say "chain failed ${attempt}x; giving up on remaining stages"
    break
  fi
  say "chain exited without completing; resuming (attempt $attempt)"
  bash scripts/xl_chain.sh >> log/xl_chain.log 2>&1
done
say "chain status: $(tail -1 log/xl_chain.log 2>/dev/null)"

# Host-feed throughput on the (now quiet) box: the real loader against
# the XL campaign config, all three feed-knob combinations.
if [[ ! -f benchmarks/host_feed_r5.json ]]; then
  say "measuring host feed (bench_loader)"
  timeout 2400 python -m x_as_supervision_tpu.tools.bench_loader \
    --config config/Campaign_XL_SurS1.yaml --batches 12 --worker 12 \
    > benchmarks/host_feed_r5.json 2> >(tail -5 >> "$LOG") \
    && say "host feed written: benchmarks/host_feed_r5.json" \
    || say "host feed measurement FAILED"
fi

# Confident-mode experiment: S2's finetune + hypothesis-0 pull.
now=$(date +%H:%M)
if [[ -f benchmarks/campaign/xl_eval_s2h0_confident.txt ]]; then
  say "s2h0 already complete"
elif [[ "$now" > "$DEADLINE" ]]; then
  say "past s2h0 start deadline ($now > $DEADLINE); skipping"
else
  say "stage: s2h0 (confident-mode experiment)"
  bash scripts/run_campaign_xl.sh s2h0 >> "$LOG" 2>&1 \
    && say "s2h0 complete" || say "s2h0 FAILED"
fi
say "followup done"
