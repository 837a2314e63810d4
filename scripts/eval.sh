#!/bin/bash
# Usage: ./eval.sh <num_hosts> <config> <checkpoint> [best|confident]
set -e
num_hosts=$1; config_path=$2; ckpt=$3; hypo=${4:-best}
cd "$(dirname "$0")/.."
if [[ $config_path == *"TikTok"* ]] || [[ $config_path == *"MPII"* ]]; then
    entry=eval2d.py
else
    entry=eval.py
fi
command="python $entry --config $config_path --checkpoint $ckpt --multi_hypo $hypo"
echo "Running command: $command"
eval $command
