#!/usr/bin/env bash
# Full XL campaign chain for the matched-compute control (VERDICT r4
# missing #1): reproducible render -> S1 to plateau -> S1ext control ->
# S2 finetune -> confident-mode rows. Stage order puts the control
# (s1ext) immediately after s1 so a wall-clock cut still leaves the
# unconfounded S1 vs S1ext comparison on disk.
#
# Everything is resumable: the render skips complete folders/segments,
# and each train stage runs under scripts/train_resumable.sh. Re-running
# this script after any interruption continues where it stopped.
set -uo pipefail
cd "$(dirname "$0")/.."

stamp() { date "+%F %T"; }
say() { echo "[xl_chain $(stamp)] $*"; }

say "stage: render"
scripts/render_campaign_xl.sh || { say "render FAILED"; exit 1; }

say "stage: s1"
scripts/run_campaign_xl.sh s1 || { say "s1 FAILED"; exit 1; }

say "stage: s1ext (matched-compute control)"
scripts/run_campaign_xl.sh s1ext || { say "s1ext FAILED"; exit 1; }

say "stage: s2"
scripts/run_campaign_xl.sh s2 || { say "s2 FAILED"; exit 1; }

say "stage: confident"
scripts/run_campaign_xl.sh confident || { say "confident FAILED"; exit 1; }

say "chain complete"
