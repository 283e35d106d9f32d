#!/bin/bash
# Throughput benchmark wrapper (reference speed_test.sh parity).
set -e
DATASET=${DATASET:-"AutoPETII"}
MODEL_LIST=${MODEL_LIST:-}
EXTRA=""
[ -n "$MODEL_LIST" ] && EXTRA="--model_list $MODEL_LIST"
python speed_test.py --dataset "$DATASET" $EXTRA
