#!/bin/bash
# Per-host training launcher (TPU-native).
# Usage: ./train.sh <num_hosts> <config_path> [extra_tag] [coordinator_addr]
# One python process per TPU host; JAX discovers all local chips and the
# global mesh spans hosts via --coordinator (jax.distributed).
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

echo "Running command: $command"
eval $command
