#!/usr/bin/env bash
# S1 -> S2 accuracy campaign driver (self-rendered data; see
# tools/render_campaign.py and PERF.md round 3).
#
# Stage 2 only — assumes the S1 run under log/campaign_s1 has finished.
# Usage: scripts/run_campaign.sh [--skip-eval-s1]
set -euo pipefail
cd "$(dirname "$0")/.."

S1_RUN=$(ls -dt log/campaign_s1/*/ | head -1)
S1_CKPT=$(ls -d "${S1_RUN}"*_ckpt | sort | tail -1)
echo "S1 run: ${S1_RUN} ckpt: ${S1_CKPT}"

if [[ "${1:-}" != "--skip-eval-s1" ]]; then
  python eval.py --config config/Campaign_SurS1.yaml \
    --checkpoint "${S1_CKPT}" --multi_hypo best
  cp "${S1_RUN}eval/eval_result.txt" log/campaign_eval_s1.txt
fi

# first attempt initializes from the S1 checkpoint (finetune mode);
# crash retries resume campaign_s2's own newest checkpoint (train mode)
python train.py --config config/Campaign_SurS2.yaml --finetune \
  --checkpoint "${S1_CKPT}" --seed 0 --log_dir log/campaign_s2 --worker 12 \
  || scripts/train_resumable.sh config/Campaign_SurS2.yaml log/campaign_s2 \
       --seed 0 --worker 12

S2_RUN=$(ls -dt log/campaign_s2/*/ | head -1)
S2_CKPT=$(ls -d "${S2_RUN}"*_ckpt | sort | tail -1)
python eval.py --config config/Campaign_SurS2.yaml \
  --checkpoint "${S2_CKPT}" --multi_hypo best
cp "${S2_RUN}eval/eval_result.txt" log/campaign_eval_s2.txt

echo "=== S1 ==="; cat log/campaign_eval_s1.txt
echo "=== S2 ==="; cat log/campaign_eval_s2.txt
