#!/usr/bin/env bash
# Round-4 XL accuracy campaign: converged S1 -> S2 on the scaled
# self-rendered dataset (10,080 train samples, all 15 H36M action buckets;
# tools/render_campaign.py --train_set campaign_train_xl), evaluated with
# BOTH the H36M protocol (MPJPE family) and the MPI protocol (PCK/AUC via
# dataset_params.eval_protocol).
#
# Usage: scripts/run_campaign_xl.sh [s1|s2|s1ext|eval|confident]
# (default: all stages except s1ext/confident). s1ext is the
# matched-compute control: the converged S1 checkpoint finetuned 5 MORE
# epochs with S1's own losses under S2's exact optimizer schedule
# (config/Campaign_XL_SurS1ext.yaml) — S1ext vs S2 then differ ONLY in
# the unsupervised loss terms. confident re-runs the oracle-free
# (--multi_hypo confident) eval rows for S1 and S2.
set -uo pipefail
cd "$(dirname "$0")/.."
STAGE="${1:-all}"
OUT=benchmarks/campaign
mkdir -p "$OUT"

if [[ "$STAGE" == "s1" || "$STAGE" == "all" ]]; then
  scripts/train_resumable.sh config/Campaign_XL_SurS1.yaml log/campaign_xl_s1 \
    --seed 0 --worker 12 || exit 1
fi

S1_RUN=$(ls -dt log/campaign_xl_s1/*/ 2>/dev/null | head -1 || true)
S1_CKPT=""
if [[ -n "${S1_RUN}" ]]; then
  S1_CKPT=$(ls -d "${S1_RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
fi
echo "S1 ckpt: ${S1_CKPT:-<none>}"

if [[ "$STAGE" == "s2" || "$STAGE" == "all" ]]; then
  # Crash- and hang-resilient finetune via the shared driver: while
  # campaign_xl_s2 has no checkpoint of its own, every retry
  # re-initializes from the S1 checkpoint (XAS_INIT_CKPT — a plain fresh
  # restart would silently drop the S1 init); once S2 has saved, retries
  # resume its own newest checkpoint. Hang detection (TB-staleness
  # watchdog) comes with the driver.
  XAS_INIT_CKPT="${S1_CKPT}" \
    scripts/train_resumable.sh config/Campaign_XL_SurS2.yaml \
      log/campaign_xl_s2 --seed 0 --worker 12 || exit 1
fi

if [[ "$STAGE" == "s1ext" ]]; then
  XAS_INIT_CKPT="${S1_CKPT}" \
    scripts/train_resumable.sh config/Campaign_XL_SurS1ext.yaml \
      log/campaign_xl_s1ext --seed 0 --worker 12 || exit 1
  EXT_RUN=$(ls -dt log/campaign_xl_s1ext/*/ 2>/dev/null | head -1 || true)
  EXT_CKPT=$(ls -d "${EXT_RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
  python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("config/Campaign_XL_SurS1ext.yaml"))
cfg["dataset_params"]["eval_protocol"] = "mpi"
yaml.safe_dump(cfg, open("/tmp/Campaign_XL_SurS1ext_mpi.yaml", "w"),
               sort_keys=False)
EOF
  python eval.py --config config/Campaign_XL_SurS1ext.yaml \
    --checkpoint "${EXT_CKPT}" --multi_hypo best || exit 1
  cp "${EXT_RUN}eval/eval_result.txt" "$OUT/xl_eval_s1ext.txt"
  python eval.py --config /tmp/Campaign_XL_SurS1ext_mpi.yaml \
    --checkpoint "${EXT_CKPT}" --multi_hypo best || exit 1
  cp "${EXT_RUN}eval/eval_result.txt" "$OUT/xl_eval_s1ext_mpi.txt"
  python eval.py --config config/Campaign_XL_SurS1ext.yaml \
    --checkpoint "${EXT_CKPT}" --multi_hypo confident || exit 1
  cp "${EXT_RUN}eval/eval_result.txt" "$OUT/xl_eval_s1ext_confident.txt"
fi

S2_RUN=$(ls -dt log/campaign_xl_s2/*/ 2>/dev/null | head -1 || true)
S2_CKPT=""
if [[ -n "${S2_RUN}" ]]; then
  S2_CKPT=$(ls -d "${S2_RUN}"*_ckpt 2>/dev/null | sort | tail -1 || true)
fi
echo "S2 ckpt: ${S2_CKPT:-<none>}"

# MPI-protocol (PCK@0.15m / AUC) config twin, generated on the fly
python - <<'EOF'
import yaml
for s in (1, 2):
    cfg = yaml.safe_load(open(f"config/Campaign_XL_SurS{s}.yaml"))
    cfg["dataset_params"]["eval_protocol"] = "mpi"
    yaml.safe_dump(cfg, open(f"/tmp/Campaign_XL_SurS{s}_mpi.yaml", "w"),
                   sort_keys=False)
EOF

eval_stage() {  # <stage-number> <ckpt> <run-dir>  (quoted args, no word split)
  local s=$1 ckpt=$2 run=$3
  if [[ -z "$ckpt" ]]; then
    echo "[campaign] stage S${s}: no checkpoint yet, skipping eval"
    return 0
  fi
  python eval.py --config "config/Campaign_XL_SurS${s}.yaml" \
    --checkpoint "$ckpt" --multi_hypo best || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_s${s}.txt"
  python eval.py --config "/tmp/Campaign_XL_SurS${s}_mpi.yaml" \
    --checkpoint "$ckpt" --multi_hypo best || exit 1
  cp "${run}eval/eval_result.txt" "$OUT/xl_eval_s${s}_mpi.txt"
}
if [[ "$STAGE" == "confident" ]]; then
  eval_confident() {  # <stage-number> <ckpt> <run-dir>
    local s=$1 ckpt=$2 run=$3
    if [[ -z "$ckpt" ]]; then
      echo "[campaign] stage S${s}: no checkpoint yet, skipping confident"
      return 0
    fi
    python eval.py --config "config/Campaign_XL_SurS${s}.yaml" \
      --checkpoint "$ckpt" --multi_hypo confident || exit 1
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
