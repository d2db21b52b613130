#!/bin/bash
# EMDR2 end-to-end training on Natural Questions — flagship recipe.
# Hyperparameter parity with /root/reference/examples/openqa/emdr2_nq.sh:
# BERT-base retriever + T5-base reader, top-50 retrieval, global batch 64,
# 10 epochs, lr 2e-5 linear warmup 1%, async index refresh every 500 steps.
#
# The reference launches 16 processes (8 trainers + 8 indexers); here one
# program drives the whole mesh: the first DP chips form the train mesh and
# the next EMBED_DEVICES chips form the disjoint embedder sub-mesh (the
# reference's indexer group). On a 16-chip slice, DP=8 EMBED_DEVICES=8
# reproduces the reference topology exactly.

set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
VOCAB_FILE=${VOCAB_FILE:-$DATA_DIR/bert-large-uncased-vocab.txt}
EVIDENCE=${EVIDENCE:-$DATA_DIR/wikipedia-evidence}        # tools.build_evidence output prefix
EMBEDDINGS=${EMBEDDINGS:-$DATA_DIR/mss-emdr2-evidence-embeddings}  # or reference .pkl
TRAIN_DATA=${TRAIN_DATA:-$DATA_DIR/nq-train.csv}
VALID_DATA=${VALID_DATA:-$DATA_DIR/nq-dev.csv}
CHECKPOINT_PATH=${CHECKPOINT_PATH:-checkpoints/emdr2-nq}
DP=${DP:-8}
EMBED_DEVICES=${EMBED_DEVICES:-8}

python -m emdr2_tpu.tasks.run \
    --task OPENQA \
    --vocab-file "$VOCAB_FILE" \
    --train-data "$TRAIN_DATA" \
    --valid-data "$VALID_DATA" \
    --evidence-data-path "$EVIDENCE" \
    --embedding-path "$EMBEDDINGS" \
    --save "$CHECKPOINT_PATH" \
    --load "$CHECKPOINT_PATH" \
    --dp "$DP" \
    --batch-size ${BATCH_PER_CHIP:-8} \
    `# per-dp-shard batch (reference: 8 per 40GB A100). On 16GB v5e use` \
    `# BATCH_PER_CHIP=4 with dp=16 for the same global batch 64 — measured` \
    `# peak 11.9GB + 2GB index shard/chip; B=8 needs a >=24GB chip (v5p)` \
    --epochs 10 \
    --topk-retrievals 50 \
    --seq-length 512 \
    --seq-length-ret 256 \
    --seq-length-dec 32 \
    --lr 2e-5 \
    --lr-decay-style linear \
    --warmup 0.01 \
    --weight-decay 0.1 \
    --clip-grad 1.0 \
    --retriever-score-scaling \
    --update-retriever \
    --allow-trivial-doc \
    --async-indexer \
    --embed-devices "$EMBED_DEVICES" \
    --fid-flash-attention \
    --remat \
    --no-remat-towers \
    `# keep remat on the reader but store the dual-encoder towers'` \
    `# activations: measured -51 ms/step for +1.55 GB HBM (fits on v5e` \
    `# WITH the int8 index; use plain --remat on bf16-index layouts)` \
    --index-reload-interval 500 \
    --index-quantize int8 \
    `# halves the index HBM (2 GB -> 1 GB/chip at 21M/16) with recall` \
    `# 1.000000 vs exact search over the stored rows: the default exact` \
    `# re-rank (ops/mips.py rescore) removes the query-quantization error` \
    --prefetch-depth 1 \
    `# overlap stage A+B (retrieval + host postprocess) with the jitted` \
    `# step: ms/iter ~= ms/step instead of serializing ~42 ms of input prep` \
    --log-interval 20 \
    --save-interval 500 \
    --eval-interval 500 \
    --max-decode-len 32 \
    --beam-size 1 "$@"
