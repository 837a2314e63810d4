#!/usr/bin/env bash
# Round-4 XL accuracy campaign: converged S1 -> S2 on the scaled
# self-rendered dataset (10,080 train samples, all 15 H36M action buckets;
# tools/render_campaign.py --train_set campaign_train_xl), evaluated with
# BOTH the H36M protocol (MPJPE family) and the MPI protocol (PCK/AUC via
# dataset_params.eval_protocol).
#
# Usage: scripts/run_campaign_xl.sh [s1|s2|s1ext|s2h0|eval|confident]
# (default: all stages except s1ext/s2h0/confident). s2h0 is the
# confident-mode experiment: S2's exact finetune with an added 0.5-weight
# hypothesis-0 pull (config/Campaign_XL_SurS2h0.yaml). s1ext is the
# matched-compute control: the converged S1 checkpoint finetuned 5 MORE
# epochs with S1's own losses under S2's exact optimizer schedule
# (config/Campaign_XL_SurS1ext.yaml) — S1ext vs S2 then differ ONLY in
# the unsupervised loss terms. confident re-runs the oracle-free
# (--multi_hypo confident) eval rows for S1 and S2.
#
# Every location and the per-CLI extra args are env-overridable so the
# whole driver can run against a scaled-down fixture (exercised end to
# end by tests/test_campaign_driver.py on a tiny CPU render):
#   XAS_CAMPAIGN_CFG_DIR    config directory        (default: config)
#   XAS_CAMPAIGN_PREFIX     config filename prefix  (default: Campaign_XL_Sur
#                           -> ${PREFIX}S1.yaml / S2.yaml / S1ext.yaml)
#   XAS_CAMPAIGN_LOG_ROOT   run-dir root            (default: log)
#   XAS_CAMPAIGN_OUT        eval artifact dir       (default: benchmarks/campaign)
#   XAS_CAMPAIGN_TRAIN_ARGS extra train.py args     (default: --seed 0 --worker 12)
#   XAS_CAMPAIGN_EVAL_ARGS  extra eval.py args      (default: none)
# The *_ARGS values are split on single spaces — arg values containing
# spaces (e.g. quoted paths) are not supported. Expanding the
# possibly-empty arrays under `set -u` needs bash >= 4.4.
set -uo pipefail
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
CFG_DIR="${XAS_CAMPAIGN_CFG_DIR:-config}"
PREFIX="${XAS_CAMPAIGN_PREFIX:-Campaign_XL_Sur}"
LOG_ROOT="${XAS_CAMPAIGN_LOG_ROOT:-log}"
OUT="${XAS_CAMPAIGN_OUT:-benchmarks/campaign}"
IFS=' ' read -r -a TRAIN_ARGS <<< "${XAS_CAMPAIGN_TRAIN_ARGS:---seed 0 --worker 12}"
IFS=' ' read -r -a EVAL_ARGS <<< "${XAS_CAMPAIGN_EVAL_ARGS:- }"
mkdir -p "$OUT" "$LOG_ROOT"

# MPI-protocol (PCK@0.15m / AUC) config twin, generated on the fly.
make_mpi_twin() {  # <src-yaml> <dst-yaml>
  python - "$1" "$2" <<'EOF'
import sys
import yaml
src, dst = sys.argv[1], sys.argv[2]
cfg = yaml.safe_load(open(src))
cfg["dataset_params"]["eval_protocol"] = "mpi"
yaml.safe_dump(cfg, open(dst, "w"), sort_keys=False)
EOF
}

if [[ "$STAGE" == "s1" || "$STAGE" == "all" ]]; then
  scripts/train_resumable.sh "$CFG_DIR/${PREFIX}S1.yaml" \
    "$LOG_ROOT/campaign_xl_s1" "${TRAIN_ARGS[@]}" || exit 1
fi

S1_RUN=$(ls -dt "$LOG_ROOT"/campaign_xl_s1/*/ 2>/dev/null | head -1 || true)
S1_CKPT=""
if [[ -n "${S1_RUN}" ]]; then
  S1_CKPT=$(ls -d "${S1_RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
fi
echo "S1 ckpt: ${S1_CKPT:-<none>}"

# The finetune stages are meaningless without the S1 init: an empty
# XAS_INIT_CKPT reads as "unset" to train_resumable.sh, which would
# silently train the matched-compute control FROM SCRATCH.
if [[ ( "$STAGE" == "s2" || "$STAGE" == "s1ext" || "$STAGE" == "s2h0" ) \
      && -z "$S1_CKPT" ]]; then
  echo "[campaign] no S1 checkpoint under $LOG_ROOT/campaign_xl_s1;" \
       "run the s1 stage first" >&2
  exit 1
fi

if [[ "$STAGE" == "s2" || "$STAGE" == "all" ]]; then
  # Crash- and hang-resilient finetune via the shared driver: while
  # campaign_xl_s2 has no checkpoint of its own, every retry
  # re-initializes from the S1 checkpoint (XAS_INIT_CKPT — a plain fresh
  # restart would silently drop the S1 init); once S2 has saved, retries
  # resume its own newest checkpoint. Hang detection (TB-staleness
  # watchdog) comes with the driver.
  XAS_INIT_CKPT="${S1_CKPT}" \
    scripts/train_resumable.sh "$CFG_DIR/${PREFIX}S2.yaml" \
      "$LOG_ROOT/campaign_xl_s2" "${TRAIN_ARGS[@]}" || exit 1
fi

# S1-initialized finetune variant (the matched-compute control S1ext,
# the confident-mode experiment S2h0): train from the S1 checkpoint,
# then eval best + MPI-protocol + confident rows.
finetune_variant() {  # <Variant> (config suffix, e.g. S1ext / S2h0)
  local v=$1 lv
  lv=$(echo "$v" | tr '[:upper:]' '[:lower:]')
  XAS_INIT_CKPT="${S1_CKPT}" \
    scripts/train_resumable.sh "$CFG_DIR/${PREFIX}${v}.yaml" \
      "$LOG_ROOT/campaign_xl_${lv}" "${TRAIN_ARGS[@]}" || exit 1
  local run ckpt
  run=$(ls -dt "$LOG_ROOT/campaign_xl_${lv}"/*/ 2>/dev/null | head -1 || true)
  ckpt=$(ls -d "${run}"*_ckpt 2>/dev/null | sort | tail -1 || true)
  make_mpi_twin "$CFG_DIR/${PREFIX}${v}.yaml" \
    "$LOG_ROOT/${PREFIX}${v}_mpi.yaml" || exit 1
  python eval.py --config "$CFG_DIR/${PREFIX}${v}.yaml" \
    --checkpoint "${ckpt}" --multi_hypo best "${EVAL_ARGS[@]}" || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_${lv}.txt"
  python eval.py --config "$LOG_ROOT/${PREFIX}${v}_mpi.yaml" \
    --checkpoint "${ckpt}" --multi_hypo best "${EVAL_ARGS[@]}" || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_${lv}_mpi.txt"
  python eval.py --config "$CFG_DIR/${PREFIX}${v}.yaml" \
    --checkpoint "${ckpt}" --multi_hypo confident "${EVAL_ARGS[@]}" || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_${lv}_confident.txt"
}

if [[ "$STAGE" == "s1ext" ]]; then
  finetune_variant S1ext
fi
if [[ "$STAGE" == "s2h0" ]]; then
  finetune_variant S2h0
  exit 0
fi

S2_RUN=$(ls -dt "$LOG_ROOT"/campaign_xl_s2/*/ 2>/dev/null | head -1 || true)
S2_CKPT=""
if [[ -n "${S2_RUN}" ]]; then
  S2_CKPT=$(ls -d "${S2_RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
fi
echo "S2 ckpt: ${S2_CKPT:-<none>}"

eval_stage() {  # <stage-number> <ckpt> <run-dir>  (quoted args, no word split)
  local s=$1 ckpt=$2 run=$3
  if [[ -z "$ckpt" ]]; then
    echo "[campaign] stage S${s}: no checkpoint yet, skipping eval"
    return 0
  fi
  python eval.py --config "$CFG_DIR/${PREFIX}S${s}.yaml" \
    --checkpoint "$ckpt" --multi_hypo best "${EVAL_ARGS[@]}" || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_s${s}.txt"
  make_mpi_twin "$CFG_DIR/${PREFIX}S${s}.yaml" \
    "$LOG_ROOT/${PREFIX}S${s}_mpi.yaml" || exit 1
  python eval.py --config "$LOG_ROOT/${PREFIX}S${s}_mpi.yaml" \
    --checkpoint "$ckpt" --multi_hypo best "${EVAL_ARGS[@]}" || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_s${s}_mpi.txt"
}
if [[ "$STAGE" == "confident" ]]; then
  eval_confident() {  # <stage-number> <ckpt> <run-dir>
    local s=$1 ckpt=$2 run=$3
    if [[ -z "$ckpt" ]]; then
      echo "[campaign] stage S${s}: no checkpoint yet, skipping confident"
      return 0
    fi
    python eval.py --config "$CFG_DIR/${PREFIX}S${s}.yaml" \
      --checkpoint "$ckpt" --multi_hypo confident "${EVAL_ARGS[@]}" || exit 1
    cp "${run}eval/eval_result.txt" "$OUT/xl_eval_s${s}_confident.txt"
  }
  eval_confident 1 "${S1_CKPT}" "${S1_RUN}"
  eval_confident 2 "${S2_CKPT}" "${S2_RUN}"
  exit 0
fi

if [[ "$STAGE" != "s1ext" ]]; then
  eval_stage 1 "${S1_CKPT}" "${S1_RUN}"
  eval_stage 2 "${S2_CKPT}" "${S2_RUN}"
fi

for f in xl_eval_s1 xl_eval_s2 xl_eval_s1_mpi xl_eval_s2_mpi; do
  if [[ -f "$OUT/$f.txt" ]]; then echo "=== $f ==="; cat "$OUT/$f.txt"; fi
done
exit 0
