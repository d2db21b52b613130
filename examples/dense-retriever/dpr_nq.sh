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
    --save "${CHECKPOINT_PATH:-checkpoints/dpr-nq}" \
    --load "${CHECKPOINT_PATH:-checkpoints/dpr-nq}" \
    --save-interval 500 \
    --val-av-rank-other-neg 30 --val-av-rank-hard-neg 30 \
    --report-topk-accuracies 1 5 20 100 \
    --evidence-data-path "${EVIDENCE:-$DATA_DIR/wikipedia-evidence}" \
    --embedding-path "${EMBEDDINGS_OUT:-$DATA_DIR/dpr-evidence-embeddings}" \
    --qa-file-dev "${QA_FILE_DEV:-$DATA_DIR/nq-dev.csv}" \
    --qa-file-test "${QA_FILE_TEST:-$DATA_DIR/nq-test.csv}" \
    --log-interval 20 "$@"
