#!/bin/bash
# Inference wrapper (reference test.sh parity).
set -e

DATASET_NAME=${DATASET_NAME:-"AutoPETII"}
MODEL_NAME=${MODEL_NAME:-"VeloxSeg"}
TRAIN_CONFIG=${TRAIN_CONFIG:-"./config/train_config_bs4.json"}
TEST_CONFIG=${TEST_CONFIG:-"./config/test_config.json"}
TRAIN_DATE=${TRAIN_DATE:-}
CHECKPOINT_INDEX=${CHECKPOINT_INDEX:-"val_best"}
NUM_WORKERS=${NUM_WORKERS:-8}
GPU_ID=${GPU_ID:-0}
USE_HD95=${USE_HD95:-}

case "$DATASET_NAME" in
  AutoPETII)   MODEL_CONFIG="./config/models_config_autopetii.json" ;;
  Hecktor2022) MODEL_CONFIG="./config/models_config_hecktor2022.json" ;;
  BraTS2021)   MODEL_CONFIG="./config/models_config_brats2021.json" ;;
  *) echo "Unknown dataset: $DATASET_NAME"; exit 1 ;;
esac

EXTRA=""
[ -n "$TRAIN_DATE" ] && EXTRA="$EXTRA --train_date $TRAIN_DATE"
[ -n "$USE_HD95" ] && EXTRA="$EXTRA --use_hd95 $USE_HD95"

python run_test.py \
    --dataset_name "$DATASET_NAME" \
    --model_name "$MODEL_NAME" \
    --train_config "$TRAIN_CONFIG" \
    --model_config "$MODEL_CONFIG" \
    --test_config "$TEST_CONFIG" \
    --checkpoint_index "$CHECKPOINT_INDEX" \
    --num_workers "$NUM_WORKERS" \
    --gpu_id "$GPU_ID" $EXTRA
