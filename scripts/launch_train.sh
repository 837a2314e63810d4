#!/bin/bash
# Cluster launcher. Usage: ./launch_train.sh <queue_or_tpu_name> <num_hosts> <config> [tag]
# On a TPU pod: run scripts/train.sh on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all`), passing host 0's address
# as the coordinator. Single-host: runs locally.
# Mirrors the reference's SLURM launcher UX (reference scripts/launch_train.sh).
set -e
target=$1
num_hosts=$2
config_path=$3
extra_tag_info=$4

mkdir -p launch_output
echo "target: $target num_hosts: $num_hosts"
if [[ $num_hosts -le 1 ]]; then
    bash "$(dirname "$0")/train.sh" 1 "$config_path" "$extra_tag_info" \
        2>&1 | tee launch_output/log.out.$$
else
    echo "multi-host: run on every worker:" \
         "scripts/train.sh $num_hosts $config_path $extra_tag_info <host0-addr>:8476"
fi
