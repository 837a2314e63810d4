#!/bin/bash
# S1 -> S2 finetune. Usage: ./finetune.sh <num_hosts> <config> <s1_checkpoint> [tag]
set -e
num_hosts=$1; config_path=$2; ckpt=$3; extra_tag_info=$4
cd "$(dirname "$0")/.."
command="python train.py --config $config_path --checkpoint $ckpt --finetune"
[[ -n $extra_tag_info ]] && command+=" --extra_tag $extra_tag_info"
echo "Running command: $command"
eval $command
