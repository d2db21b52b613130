#!/bin/bash
# DPR-style dense retriever training on TriviaQA (reference
# examples/dense-retriever/mss_dpr_trivia.sh: epochs 40, 7 hard negatives,
# global batch 128 = 8 per rank x 16 ranks; here batch-size is per-dp-shard,
# so 16 x dp=8 reproduces the same global batch).
set -euo pipefail
DATA_DIR=${DATA_DIR:-data}
python -m emdr2_tpu.tasks.run \
    --task RETRIEVER \
    --vocab-file "${VOCAB_FILE:-$DATA_DIR/bert-large-uncased-vocab.txt}" \
    --train-data "${TRAIN_DATA:-$DATA_DIR/trivia-dpr-train.json}" \
    --valid-data "${VALID_DATA:-$DATA_DIR/trivia-dpr-dev.json}" \
    --dp "${DP:-8}" \
    --batch-size 16 \
    --epochs 40 \
    --train-hard-neg 7 \
    --seq-length-ret 256 --seq-length-query 64 \
    --lr 2e-5 --lr-decay-style linear --warmup 0.01 \
    --weight-decay 0.1 --clip-grad 1.0 \
    --retriever-score-scaling \
    --save "${CHECKPOINT_PATH:-checkpoints/dpr-trivia}" \
    --load "${CHECKPOINT_PATH:-checkpoints/dpr-trivia}" \
    --save-interval 500 \
    --val-av-rank-other-neg 30 --val-av-rank-hard-neg 30 \
    --report-topk-accuracies 1 5 20 100 \
    --evidence-data-path "${EVIDENCE:-$DATA_DIR/wikipedia-evidence}" \
    --embedding-path "${EMBEDDINGS_OUT:-$DATA_DIR/dpr-trivia-evidence-embeddings}" \
    --qa-file-dev "${QA_FILE_DEV:-$DATA_DIR/trivia-dev.csv}" \
    --qa-file-test "${QA_FILE_TEST:-$DATA_DIR/trivia-test.csv}" \
    --log-interval 20 "$@"
