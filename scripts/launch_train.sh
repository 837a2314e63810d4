#!/bin/bash
# Cluster launcher — actually dispatches the multi-host job (the SLURM
# sbatch equivalent; reference scripts/launch_train.sh:19-20).
#
# Usage: ./launch_train.sh <target> <num_hosts> <config> [tag]
#
#   <target> selects the dispatch mode:
#     * "local"          — single host, run scripts/train.sh here (num_hosts
#                          must be 1), OR num_hosts>1: fan out num_hosts
#                          local processes with explicit ranks joining one
#                          jax.distributed job (CPU smoke / CI path; covered
#                          by tests/test_launcher_integration.py)
#     * a hostfile path  — one hostname per line ('#' comments allowed):
#                          ssh fan-out, line 0 is the coordinator host
#     * anything else    — a TPU pod name: gcloud ssh --worker=all; process
#                          identity and peers come from the TPU metadata
#
# Environment:
#   XAS_COORD_PORT  coordinator port (default 8476)
#   XAS_EXTRA_ARGS  extra flags forwarded to train.py (e.g. "--seed 0")
#   XAS_REPO_DIR    repo path on the remote hosts (default: this repo's path)
set -e
target=$1
num_hosts=$2
config_path=$3
extra_tag_info=$4

port=${XAS_COORD_PORT:-8476}
repo_dir=${XAS_REPO_DIR:-$(cd "$(dirname "$0")/.." && pwd)}
scripts_dir="$(cd "$(dirname "$0")" && pwd)"

mkdir -p launch_output
echo "target: $target num_hosts: $num_hosts"

if [[ $num_hosts -le 1 ]]; then
    bash "$scripts_dir/train.sh" 1 "$config_path" "$extra_tag_info" \
        2>&1 | tee launch_output/log.out.$$
elif [[ $target == local ]]; then
    # local fan-out: num_hosts processes with explicit ranks (the torchrun
    # --nproc-per-node analogue for hosts without TPU metadata)
    coordinator="localhost:${port}"
    pids=()
    for ((i = 0; i < num_hosts; i++)); do
        XAS_NUM_PROCESSES=$num_hosts XAS_PROCESS_ID=$i \
            bash "$scripts_dir/train.sh" "$num_hosts" "$config_path" \
                "$extra_tag_info" "$coordinator" \
                > "launch_output/log.host$i.$$" 2>&1 &
        pids+=($!)
    done
    status=0
    for pid in "${pids[@]}"; do
        wait "$pid" || status=$?
    done
    tail -5 launch_output/log.host0.$$ || true
    exit $status
elif [[ -f $target ]]; then
    # hostfile ssh fan-out: first host is the coordinator
    mapfile -t hosts < <(grep -v '^\s*#' "$target" | grep -v '^\s*$')
    if [[ ${#hosts[@]} -ne $num_hosts ]]; then
        echo "hostfile has ${#hosts[@]} hosts, expected $num_hosts" >&2
        exit 1
    fi
    coordinator="${hosts[0]}:${port}"
    pids=()
    for ((i = 0; i < num_hosts; i++)); do
        ssh -o BatchMode=yes "${hosts[$i]}" \
            "cd '$repo_dir' && XAS_NUM_PROCESSES=$num_hosts XAS_PROCESS_ID=$i \
             XAS_EXTRA_ARGS='${XAS_EXTRA_ARGS:-}' \
             bash scripts/train.sh $num_hosts '$config_path' \
                 '$extra_tag_info' '$coordinator'" \
            > "launch_output/log.host$i.$$" 2>&1 &
        pids+=($!)
    done
    status=0
    for pid in "${pids[@]}"; do
        wait "$pid" || status=$?
    done
    exit $status
else
    # TPU pod: one process per worker VM; jax discovers identity + peers
    # from the TPU metadata (coordinator 'auto' = bare
    # jax.distributed.initialize())
    gcloud compute tpus tpu-vm ssh "$target" --worker=all --command="
        cd '$repo_dir' && XAS_EXTRA_ARGS='${XAS_EXTRA_ARGS:-}' \
        bash scripts/train.sh $num_hosts '$config_path' \
            '$extra_tag_info' auto" \
        2>&1 | tee launch_output/log.out.$$
fi
