#!/bin/bash
# EMDR2 on TriviaQA (reference examples/openqa/emdr2_trivia.sh:
# save/eval interval 250, otherwise the NQ recipe).
set -euo pipefail
DATA_DIR=${DATA_DIR:-data}
export TRAIN_DATA=${TRAIN_DATA:-$DATA_DIR/trivia-train.csv}
export VALID_DATA=${VALID_DATA:-$DATA_DIR/trivia-dev.csv}
export CHECKPOINT_PATH=${CHECKPOINT_PATH:-checkpoints/emdr2-trivia}
exec bash "$(dirname "$0")/emdr2_nq.sh" \
    --save-interval 250 --eval-interval 250 "$@"
