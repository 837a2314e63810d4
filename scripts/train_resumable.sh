#!/usr/bin/env bash
# Crash-resilient training driver: run train.py, and if it dies (e.g. the
# dev tunnel's host-RAM growth OOM-kills it mid-run — see PERF.md round
# 3), resume from the newest checkpoint in the SAME run dir until the
# configured epochs complete. Exercises the checkpoint-resume path the
# reference handles by SLURM resubmission (reference README.md:38).
#
# Usage: scripts/train_resumable.sh <config.yaml> <log_dir> [extra args…]
set -uo pipefail
cd "$(dirname "$0")/.."

CFG="$1"; LOGDIR="$2"; shift 2

for attempt in $(seq 1 12); do
  RUN=$(ls -dt "${LOGDIR}"/*/ 2>/dev/null | head -1 || true)
  CKPT=""
  if [[ -n "${RUN}" ]]; then
    CKPT=$(ls -d "${RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
  fi
  if [[ -n "${CKPT}" ]]; then
    echo "[resumable] attempt ${attempt}: resuming from ${CKPT}"
    python train.py --config "${CFG}" --checkpoint "${CKPT}" \
      --log_dir "${LOGDIR}" "$@"
  else
    echo "[resumable] attempt ${attempt}: fresh start"
    python train.py --config "${CFG}" --log_dir "${LOGDIR}" "$@"
  fi
  rc=$?
  if [[ $rc -eq 0 ]]; then
    echo "[resumable] finished after ${attempt} attempt(s)"
    exit 0
  fi
  echo "[resumable] train.py exited rc=${rc}; retrying from checkpoint"
  sleep 5
done
echo "[resumable] giving up after 12 attempts"
exit 1
