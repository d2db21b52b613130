"""RETRIEVER task wiring: DPR training, checkpointing, post-train recall.

Replaces ``/root/reference/tasks/openqa/dense_retriever/run.py`` and the
train/eval orchestration in ``train_dense_retriever.py:316-391``: interval +
end-of-epoch checkpoint saves (:305-309), resume from ``--load``, per-epoch
30+30-negative av-rank/top-k validation (:429-487), and — after training —
a full evidence index build and recall@k evaluation on the dev/test QA files
(:371-391). Checkpoints nest the dual encoder under ``params/retriever`` so
checkpoint surgery and the OPENQA pretrained-init path consume them directly
(the DPR -> EMDR2 two-stage pipeline).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def run_retriever(args, cfg) -> int:
    from emdr2_tpu.data.tokenizer import build_tokenizers
    from emdr2_tpu.parallel import build_mesh
    from emdr2_tpu.tasks.dense_retriever import DPRDataset, DPRTask
    from emdr2_tpu.training import checkpointing as ck

    assert args.train_data, "--train-data (DPR json) required"
    bert_tok, _ = build_tokenizers(args.vocab_file)

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
                           evaluate=True,
                           val_av_rank_other_neg=args.val_av_rank_other_neg,
                           val_av_rank_hard_neg=args.val_av_rank_hard_neg)
                if args.valid_data else None)

    B = cfg.train.batch_size * cfg.mesh.dp
    steps_per_epoch = len(train_ds) // B
    total = cfg.train.train_iters or cfg.train.epochs * steps_per_epoch
    task = DPRTask(rcfg, cfg.train.optimizer, mesh, total_train_iters=total,
                   score_scaling=cfg.retriever_score_scaling)
    task.init(jax.random.PRNGKey(cfg.train.seed),
              train_ds.batch(list(range(min(B, len(train_ds))))))

    if args.load and ck.latest_iteration(args.load) is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, task.get_state())
        state, it = ck.load_checkpoint(args.load, abstract)
        task.set_state(state)
        print(f"resumed retriever from {args.load} at iteration {it}")

    def save(iteration, async_save: bool = False):
        if args.save:
            # interval saves ride in the background; the end-of-epoch save
            # is synchronous (drains in-flight) so resume/post-train eval
            # always see a durable checkpoint
            ck.save_checkpoint(args.save, task.get_state(), iteration,
                               async_save=async_save and cfg.train.async_save)
            ck.remove_stale_checkpoints(args.save, keep_last=2)

    # eval-only escape: run the post-train evaluation on loaded weights
    if not getattr(args, "eval_only", False):
        rng = jax.random.PRNGKey(cfg.train.seed + 1)
        it = task.step
        start_epoch = it // max(steps_per_epoch, 1)
        start_offset = it % max(steps_per_epoch, 1)
        # per-epoch loop with interval + end-of-epoch saves
        # (train_dense_retriever.py:296-309)
        for epoch in range(start_epoch, cfg.train.epochs):
            for bi, batch in enumerate(
                    train_ds.epoch_batches(B, seed=cfg.train.seed + epoch)):
                if epoch == start_epoch and bi < start_offset:
                    continue  # resume skip
                rng, sub = jax.random.split(rng)
                m = task.train_step(batch, sub)
                it += 1
                if it % cfg.train.log_interval == 0:
                    print(f" iteration {it:8d}/{total} | loss {m['loss']:.4f}"
                          f" | correct {m['correct_prediction_count']:.0f}/{B}")
                if it % cfg.train.save_interval == 0:
                    save(it, async_save=True)
                if it >= total:
                    break
            if valid_ds is not None:
                batches = list(valid_ds.epoch_batches(
                    B, seed=0, shuffle=False, drop_last=False))
                v = task.validate(batches,
                                  report_topk=args.report_topk_accuracies)
                stats = " | ".join(f"{k} {val:.4f}" for k, val in v.items())
                print(f" epoch {epoch} | {stats}")
            save(it)
            if it >= total:
                break

    # ---- post-training: build the full index + recall on dev/test QA files
    # (train_dense_retriever.py:371-391)
    if args.evidence_data_path and (args.qa_file_dev or args.qa_file_test):
        _post_train_eval(args, cfg, rcfg, mesh, bert_tok, task)
    return 0


def _post_train_eval(args, cfg, rcfg, mesh, bert_tok, task) -> None:
    from emdr2_tpu.config import IndexConfig
    from emdr2_tpu.data.evidence import EvidenceCorpus
    from emdr2_tpu.data.qa_dataset import read_qa_csv
    from emdr2_tpu.models.bert import DualEncoder
    from emdr2_tpu.retrieval import ShardedEvidenceIndex
    from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
    from emdr2_tpu.retrieval.evaluate import OpenRetrievalEvaluator

    corpus = EvidenceCorpus.load(args.evidence_data_path + "_text",
                                 args.evidence_data_path + "_title")
    builder = EvidenceIndexBuilder(
        cfg, mesh, task.model, corpus, bert_tok.cls_id, bert_tok.sep_id,
        bert_tok.pad_id, embed_method=DualEncoder.embed_context)
    print(f" building evidence index over {len(corpus)} passages ...")
    store = builder.build_store(task.params, path=args.embedding_path)

    icfg = dataclasses.replace(
        cfg.index, embed_dim=rcfg.embed_dim,
        topk=max(cfg.index.topk, args.report_topk_accuracies[-1]))
    index = ShardedEvidenceIndex(mesh, icfg,
                                 np.asarray(store.embeddings, np.float32),
                                 passage_ids=np.asarray(store.ids))
    evaluator = OpenRetrievalEvaluator(
        mesh, task.model, task.params, index, bert_tok,
        query_seq_len=rcfg.query_seq_len,
        embed_method=DualEncoder.embed_query)

    def doc_text(pid: int) -> str:
        return bert_tok.detokenize(corpus.doc_tokens(int(pid)))

    for name, path in (("DEV", args.qa_file_dev), ("TEST", args.qa_file_test)):
        if not path:
            continue
        examples = read_qa_csv(path)
        result = evaluator.evaluate_recall(
            examples, k=icfg.topk, doc_text_fn=doc_text,
            match_type=getattr(args, "match", "string"),
            report_at=args.report_topk_accuracies)
        stats = " | ".join(f"{k} {v:.4f}" for k, v in result.items())
        print(f" {name} retrieval | {stats}")
