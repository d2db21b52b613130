"""RETRIEVER task wiring: DPR training + optional post-train index/recall.

Replaces ``/root/reference/tasks/openqa/dense_retriever/run.py`` and the
train/eval orchestration in ``train_dense_retriever.py:316-487``.
"""

from __future__ import annotations

import jax


def run_retriever(args, cfg) -> int:
    from emdr2_tpu.data.tokenizer import build_tokenizers
    from emdr2_tpu.parallel import build_mesh
    from emdr2_tpu.tasks.dense_retriever import DPRDataset, DPRTask

    assert args.train_data, "--train-data (DPR json) required"
    bert_tok, _ = build_tokenizers(args.vocab_file)

    import dataclasses
    enc = dataclasses.replace(cfg.retriever.encoder,
                              vocab_size=bert_tok.padded_vocab_size)
    rcfg = dataclasses.replace(cfg.retriever, encoder=enc)
    mesh = build_mesh(cfg.mesh)

    train_ds = DPRDataset(args.train_data[0], bert_tok,
                          query_seq_len=cfg.retriever.query_seq_len,
                          ctx_seq_len=cfg.retriever.seq_len,
                          hard_negs=args.train_hard_neg,
                          seed=cfg.train.seed)
    valid_ds = (DPRDataset(args.valid_data[0], bert_tok,
                           query_seq_len=cfg.retriever.query_seq_len,
                           ctx_seq_len=cfg.retriever.seq_len,
                           hard_negs=args.train_hard_neg)
                if args.valid_data else None)

    B = cfg.train.batch_size * cfg.mesh.dp
    steps_per_epoch = len(train_ds) // B
    total = cfg.train.train_iters or cfg.train.epochs * steps_per_epoch
    task = DPRTask(rcfg, cfg.train.optimizer, mesh, total_train_iters=total,
                   score_scaling=cfg.retriever_score_scaling)
    task.init(jax.random.PRNGKey(cfg.train.seed),
              train_ds.batch(list(range(B))))

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    it = 0
    for epoch in range(cfg.train.epochs):
        for batch in train_ds.epoch_batches(B, seed=cfg.train.seed + epoch):
            rng, sub = jax.random.split(rng)
            m = task.train_step(batch, sub)
            it += 1
            if it % cfg.train.log_interval == 0:
                print(f" iteration {it:8d}/{total} | loss {m['loss']:.4f} "
                      f"| correct {m['correct_prediction_count']:.0f}/{B}")
        if valid_ds is not None:
            batches = list(valid_ds.epoch_batches(B, seed=0, shuffle=False))
            v = task.validate(batches)
            print(f" epoch {epoch} | top1 {v['top1_accuracy']:.4f} "
                  f"| av_rank {v['average_rank']:.2f}")
    return 0
