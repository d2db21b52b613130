#!/bin/bash
# DPR-style dense retriever training on NQ (reference
# examples/dense-retriever/*.sh).
set -euo pipefail
DATA_DIR=${DATA_DIR:-data}
python -m emdr2_tpu.tasks.run \
    --task RETRIEVER \
    --vocab-file "${VOCAB_FILE:-$DATA_DIR/bert-large-uncased-vocab.txt}" \
    --train-data "${TRAIN_DATA:-$DATA_DIR/nq-dpr-train.json}" \
    --valid-data "${VALID_DATA:-$DATA_DIR/nq-dpr-dev.json}" \
    --dp "${DP:-8}" \
    --batch-size 16 \
    --epochs 40 \
    --train-hard-neg 1 \
    --seq-length-ret 256 --seq-length-query 64 \
    --lr 2e-5 --lr-decay-style linear --warmup 0.01 \
    --weight-decay 0.1 --clip-grad 1.0 \
    --retriever-score-scaling \
    --log-interval 20 "$@"
