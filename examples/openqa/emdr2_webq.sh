#!/bin/bash
# EMDR2 on WebQuestions (reference examples/openqa/emdr2_webq.sh:90-99:
# batch 4, 20 epochs, half the trainer ranks).
set -euo pipefail
DATA_DIR=${DATA_DIR:-data}
VOCAB_FILE=${VOCAB_FILE:-$DATA_DIR/bert-large-uncased-vocab.txt}
EVIDENCE=${EVIDENCE:-$DATA_DIR/wikipedia-evidence}
EMBEDDINGS=${EMBEDDINGS:-$DATA_DIR/mss-emdr2-evidence-embeddings}
CHECKPOINT_PATH=${CHECKPOINT_PATH:-checkpoints/emdr2-webq}
DP=${DP:-4}

python -m emdr2_tpu.tasks.run \
    --task OPENQA \
    --vocab-file "$VOCAB_FILE" \
    --train-data "${TRAIN_DATA:-$DATA_DIR/webq-train.csv}" \
    --valid-data "${VALID_DATA:-$DATA_DIR/webq-dev.csv}" \
    --evidence-data-path "$EVIDENCE" \
    --embedding-path "$EMBEDDINGS" \
    --save "$CHECKPOINT_PATH" \
    --dp "$DP" \
    --batch-size 4 \
    --epochs 20 \
    --topk-retrievals 50 \
    --seq-length 512 --seq-length-ret 256 --seq-length-dec 32 \
    --lr 2e-5 --lr-decay-style linear --warmup 0.01 \
    --weight-decay 0.1 --clip-grad 1.0 \
    --retriever-score-scaling --update-retriever --allow-trivial-doc \
    --async-indexer --index-reload-interval 500 \
    --embed-devices "${EMBED_DEVICES:-12}" \
    --fid-flash-attention --remat --prefetch-depth 1 \
    --log-interval 20 --save-interval 500 --eval-interval 500 \
    --max-decode-len 32 "$@"
