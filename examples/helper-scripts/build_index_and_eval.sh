#!/bin/bash
# Offline index build + recall evaluation (reference
# examples/helper-scripts/*.sh + create_doc_index.py + evaluate_open_retrieval.py).
set -euo pipefail
DATA_DIR=${DATA_DIR:-data}
VOCAB_FILE=${VOCAB_FILE:-$DATA_DIR/bert-large-uncased-vocab.txt}
EVIDENCE=${EVIDENCE:-$DATA_DIR/wikipedia-evidence}
EMBEDDINGS=${EMBEDDINGS:-$DATA_DIR/evidence-embeddings}
CKPT=${CKPT:-checkpoints/emdr2-nq}

# 1. pre-tokenize the evidence TSV (once)
if [ ! -f "${EVIDENCE}_text.idx" ]; then
  python -m emdr2_tpu.tools.build_evidence \
      --input "$DATA_DIR/psgs_w100.tsv" --output-prefix "$EVIDENCE" \
      --vocab-file "$VOCAB_FILE" --workers 16
fi

# 2. embed the corpus with the trained retriever
python -m emdr2_tpu.tools.create_doc_index \
    --evidence-data-path "$EVIDENCE" --vocab-file "$VOCAB_FILE" \
    --embedding-path "$EMBEDDINGS" --load "$CKPT" --batch-size 256

# 3. recall@k on dev/test
python -m emdr2_tpu.tools.evaluate_retrieval \
    --qa-data "$DATA_DIR"/nq-{dev,test}.csv \
    --evidence-data-path "$EVIDENCE" --embedding-path "$EMBEDDINGS" \
    --vocab-file "$VOCAB_FILE" --load "$CKPT" \
    --topk 100 --report-topk-accuracies 1 5 20 100
