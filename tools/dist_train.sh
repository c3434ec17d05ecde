#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh analogue).
# On TPU pods, jax.distributed auto-detects the topology; start the same
# command once per host:
#   tools/dist_train.sh CONFIG NUM_PROCESSES PROCESS_ID COORDINATOR [ARGS...]
CONFIG=$1
NPROC=$2
PROC_ID=$3
COORD=$4
shift 4
python "$(dirname "$0")/train.py" "$CONFIG" \
    --num-processes "$NPROC" --process-id "$PROC_ID" \
    --coordinator "$COORD" "$@"
