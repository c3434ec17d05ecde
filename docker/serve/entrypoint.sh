#!/usr/bin/env bash
# Entrypoint for the tpudet serving image — the analogue of the reference's
# docker/serve/entrypoint.sh (which execs torchserve). Arguments: config
# [checkpoint], passed straight to the model server CLI.
set -euo pipefail

if [ "$#" -lt 1 ]; then
    echo "usage: <config.py> [checkpoint.msgpack]" >&2
    exit 64
fi

exec python /tpudet/tools/deployment/serve.py "$@" \
    --port "${TPUDET_SERVE_PORT:-8080}" \
    --batch "${TPUDET_SERVE_BATCH:-8}" \
    --img-size "${TPUDET_SERVE_IMG_SIZE:-640}" \
    --max-batch-delay "${TPUDET_SERVE_MAX_BATCH_DELAY:-10}"
