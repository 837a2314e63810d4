#!/bin/bash
# Per-host training launcher (TPU-native).
# Usage: ./train.sh <num_hosts> <config_path> [extra_tag] [coordinator_addr]
# One python process per TPU host; JAX discovers all local chips and the
# global mesh spans hosts via --coordinator (jax.distributed). Coordinator
# 'auto' = TPU-metadata discovery (pods); an explicit addr pairs with
# XAS_NUM_PROCESSES/XAS_PROCESS_ID for non-TPU clusters (torchrun
# RANK/WORLD_SIZE analogue). XAS_EXTRA_ARGS is forwarded verbatim.
# Mirrors the reference's torchrun launcher UX (reference scripts/train.sh).
set -e
num_hosts=$1
config_path=$2
extra_tag_info=$3
coordinator=$4

cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

if [[ $config_path == *"TikTok"* ]] || [[ $config_path == *"MPII"* ]]; then
    entry=train2d3d.py
else
    entry=train.py
fi

command="python $entry --config $config_path"
if [[ -n $extra_tag_info ]]; then
    command+=" --extra_tag $extra_tag_info"
fi
if [[ -n $coordinator ]]; then
    command+=" --coordinator $coordinator"
fi
if [[ -n ${XAS_NUM_PROCESSES:-} ]]; then
    # fail fast on a missing rank rather than letting argparse mis-parse
    # an empty --process_id value
    command+=" --num_processes $XAS_NUM_PROCESSES --process_id ${XAS_PROCESS_ID:?XAS_PROCESS_ID must be set with XAS_NUM_PROCESSES}"
fi
if [[ -n ${XAS_EXTRA_ARGS:-} ]]; then
    command+=" $XAS_EXTRA_ARGS"
fi

echo "Running command: $command"
eval $command
