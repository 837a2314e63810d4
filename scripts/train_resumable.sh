#!/usr/bin/env bash
# Crash- AND hang-resilient training driver: run train.py, and if it dies
# (e.g. the dev tunnel's host-RAM growth OOM-kills it mid-run — PERF.md
# round 3) or wedges (observed round 4: a checkpoint-save RPC through the
# tunnel hung forever with the process asleep), resume from the newest
# checkpoint in the SAME run dir until the configured epochs complete.
# Exercises the checkpoint-resume path the reference handles by SLURM
# resubmission (reference README.md:38).
#
# Usage: scripts/train_resumable.sh <config.yaml> <log_dir> [extra args…]
#
# Hang detection: train.py runs in the background; every POLL seconds the
# driver checks the newest TB event file under <log_dir>. If no scalar
# has been written for STALL_SECS while the process has been up longer
# than GRACE_SECS (first-compile allowance), the exact child pid is
# killed and the loop resumes from the last checkpoint. Stale orbax
# .orbax-checkpoint-tmp dirs are cleared before each attempt (an
# interrupted save must not block the next one).
#   XAS_STALL_SECS  (default 1200)   XAS_GRACE_SECS  (default 3000)
#
# Finetune bootstrap: XAS_INIT_CKPT=<ckpt> makes every attempt that finds
# NO checkpoint of its own in <log_dir> start `--finetune --checkpoint
# $XAS_INIT_CKPT` instead of a fresh init (an S1->S2 stage must not drop
# its S1 initialization when it crashes before its first save); once the
# run has saved, retries resume its own newest checkpoint as usual.
set -uo pipefail
cd "$(dirname "$0")/.."

CFG="$1"; LOGDIR="$2"; shift 2

STALL_SECS=${XAS_STALL_SECS:-1200}
GRACE_SECS=${XAS_GRACE_SECS:-3000}
POLL=60

for attempt in $(seq 1 12); do
  RUN=$(ls -dt "${LOGDIR}"/*/ 2>/dev/null | head -1 || true)
  CKPT=""
  if [[ -n "${RUN}" ]]; then
    rm -rf "${RUN}"*.orbax-checkpoint-tmp
    CKPT=$(ls -d "${RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
  fi
  if [[ -n "${CKPT}" ]]; then
    echo "[resumable] attempt ${attempt}: resuming from ${CKPT}"
    python train.py --config "${CFG}" --checkpoint "${CKPT}" \
      --log_dir "${LOGDIR}" "$@" &
  elif [[ -n "${XAS_INIT_CKPT:-}" ]]; then
    echo "[resumable] attempt ${attempt}: finetune from ${XAS_INIT_CKPT}"
    python train.py --config "${CFG}" --finetune \
      --checkpoint "${XAS_INIT_CKPT}" --log_dir "${LOGDIR}" "$@" &
  else
    echo "[resumable] attempt ${attempt}: fresh start"
    python train.py --config "${CFG}" --log_dir "${LOGDIR}" "$@" &
  fi
  child=$!
  start=$(date +%s)
  while kill -0 "${child}" 2>/dev/null; do
    sleep "${POLL}"
    now=$(date +%s)
    (( now - start < GRACE_SECS )) && continue
    ev=$(ls -t "${LOGDIR}"/*/tensorboard/events* 2>/dev/null | head -1 \
      || true)
    [[ -z "${ev}" ]] && continue
    age=$(( now - $(stat -c %Y "${ev}") ))
    if (( age > STALL_SECS )); then
      echo "[resumable] no TB write for ${age}s — killing hung pid" \
           "${child}"
      kill "${child}" 2>/dev/null
      sleep 10
      kill -9 "${child}" 2>/dev/null
      break
    fi
  done
  wait "${child}"
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
