#!/usr/bin/env bash
# Multi-host sharded evaluation launcher (reference tools/dist_test.sh
# analogue — there torch.distributed.launch + multi_gpu_test; here one
# process per TPU host joins a jax.distributed runtime and
# single_device_test rank-strides the val set, all-gathering results).
# Start the same command once per host:
#   tools/dist_test.sh CONFIG CHECKPOINT NUM_PROCESSES PROCESS_ID COORDINATOR [ARGS...]
CONFIG=$1
CHECKPOINT=$2
NPROC=$3
PROC_ID=$4
COORD=$5
shift 5
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" \
    --num-processes "$NPROC" --process-id "$PROC_ID" \
    --coordinator "$COORD" "$@"
