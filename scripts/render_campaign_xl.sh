#!/usr/bin/env bash
# Canonical XL campaign render (the committed seed record — VERDICT r4
# weak #1: campaign artifacts must be reproducible).
#
# Idempotent regenerate-or-reuse: hm36 folders and pseudo segments are
# independently seeded and skipped when already complete on disk, so
# re-running after an interruption — or after deleting any subset of the
# dataset — converges to the same bit-identical dataset as one
# uninterrupted run (pinned at probe scale by
# tests/test_render_manifest.py). The result is verified against the
# committed reference manifest when one exists; on first run the produced
# manifest becomes the reference.
#
#   XAS_CAMPAIGN_DATA   dataset root (default: data/campaign_xl — the
#                       path the Campaign_XL_*.yaml configs point at)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${XAS_CAMPAIGN_DATA:-data/campaign_xl}"
REF="benchmarks/campaign/xl_manifest.json"

python -m x_as_supervision_tpu.tools.render_campaign \
  --out "$OUT" \
  --train_set campaign_train_xl --valid_set campaign_valid_xl \
  --train_frames 336 --valid_frames 80 \
  --pseudo_segments 375 --pseudo_frames 48 --sample_times 12 \
  --img_size 384 --seed 0 --platform cpu

if [[ -f "$REF" ]]; then
  python -m x_as_supervision_tpu.tools.campaign_manifest "$OUT" \
    --check --manifest "$REF"
else
  cp "$OUT/manifest.json" "$REF"
  echo "recorded new reference manifest at $REF"
fi
