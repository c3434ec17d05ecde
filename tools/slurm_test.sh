#!/usr/bin/env bash
# Slurm launcher for multi-host sharded evaluation (reference
# tools/slurm_test.sh analogue). One task per TPU host; the val set is
# rank-strided across hosts and results are all-gathered.
#   tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [PY_ARGS...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NTASKS=${NTASKS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
COORD_PORT=${COORD_PORT:-8476}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=("${@:5}")

srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NTASKS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c 'COORD=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):"$0"; \
        CONFIG=$1; CHECKPOINT=$2; shift 2; \
        python -u tools/test.py "$CONFIG" "$CHECKPOINT" \
        --num-processes "$SLURM_NTASKS" --process-id "$SLURM_PROCID" \
        --coordinator "$COORD" "$@"' \
    "${COORD_PORT}" "${CONFIG}" "${CHECKPOINT}" "${PY_ARGS[@]}"
