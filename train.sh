#!/bin/bash
# Training wrapper (reference train.sh parity): env-var overrides +
# dataset -> model-config routing.
set -e

DATASET_NAME=${DATASET_NAME:-"AutoPETII"}
MODEL_NAME=${MODEL_NAME:-"VeloxSeg"}
TRAIN_CONFIG=${TRAIN_CONFIG:-"./config/train_config_bs4.json"}
NUM_WORKERS=${NUM_WORKERS:-8}
GPU_ID=${GPU_ID:-0}
MODEL_INDEX=${MODEL_INDEX:-}
CHECKPOINT_PATH=${CHECKPOINT_PATH:-}

case "$DATASET_NAME" in
  AutoPETII)   MODEL_CONFIG="./config/models_config_autopetii.json" ;;
  Hecktor2022) MODEL_CONFIG="./config/models_config_hecktor2022.json" ;;
  BraTS2021)   MODEL_CONFIG="./config/models_config_brats2021.json" ;;
  *) echo "Unknown dataset: $DATASET_NAME"; exit 1 ;;
esac

EXTRA=""
[ -n "$MODEL_INDEX" ] && EXTRA="$EXTRA --model_index $MODEL_INDEX"
[ -n "$CHECKPOINT_PATH" ] && EXTRA="$EXTRA --checkpoint_path $CHECKPOINT_PATH"

python run_train.py \
    --dataset_name "$DATASET_NAME" \
    --model_name "$MODEL_NAME" \
    --train_config "$TRAIN_CONFIG" \
    --model_config "$MODEL_CONFIG" \
    --num_workers "$NUM_WORKERS" \
    --gpu_id "$GPU_ID" $EXTRA
