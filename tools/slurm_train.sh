#!/usr/bin/env bash
# Slurm launcher for multi-host TPU training (reference
# tools/slurm_train.sh analogue: srun one task per host; the coordinator
# is task 0's node). SLURM_PROCID/SLURM_NTASKS map to
# --process-id/--num-processes.
#   GPUS in the reference == tasks; here NTASKS = number of TPU hosts.
#   tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [PY_ARGS...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
        CONFIG=$1; WORK_DIR=$2; shift 2; \
        python -u tools/train.py "$CONFIG" --work-dir="$WORK_DIR" \
        --num-processes "$SLURM_NTASKS" --process-id "$SLURM_PROCID" \
        --coordinator "$COORD" "$@"' \
    "${COORD_PORT}" "${CONFIG}" "${WORK_DIR}" "${PY_ARGS[@]}"
