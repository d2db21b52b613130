"""OPENQA task wiring: datasets, model, index, refresh, train loop, EM eval.

Replaces ``/root/reference/tasks/openqa/e2eqa/run.py`` (providers) + the
startup choreography of ``train_e2eqa.py:556-641``.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def _padded_vocab_cfg(cfg, bert_tok, t5_tok):
    enc = dataclasses.replace(cfg.retriever.encoder,
                              vocab_size=bert_tok.padded_vocab_size)
    t5c = dataclasses.replace(cfg.reader.transformer,
                              vocab_size=t5_tok.padded_vocab_size)
    return cfg.replace(
        retriever=dataclasses.replace(cfg.retriever, encoder=enc),
        reader=dataclasses.replace(cfg.reader, transformer=t5c))


def run_openqa(args, cfg) -> int:
    from emdr2_tpu.data.evidence import EvidenceCorpus
    from emdr2_tpu.data.qa_dataset import OpenQADataset
    from emdr2_tpu.data.tokenizer import build_tokenizers
    from emdr2_tpu.parallel import build_meshes
    from emdr2_tpu.retrieval import EmbeddingStore, ShardedEvidenceIndex
    from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
    from emdr2_tpu.tasks.e2eqa import E2EQATask
    from emdr2_tpu.training import checkpointing as ck
    from emdr2_tpu.training import engine
    from emdr2_tpu.training.async_refresh import AsyncIndexRefresher

    assert args.train_data and args.evidence_data_path, (
        "--train-data and --evidence-data-path are required for OPENQA")

    bert_tok, t5_tok = build_tokenizers(args.vocab_file)
    cfg = _padded_vocab_cfg(cfg, bert_tok, t5_tok)
    mesh, embed_mesh = build_meshes(cfg.mesh)

    corpus = EvidenceCorpus.load(args.evidence_data_path + "_text",
                                 args.evidence_data_path + "_title")
    train_ds = OpenQADataset(args.train_data, t5_tok,
                             max_seq_length=cfg.retriever.query_seq_len,
                             decoder_seq_length=cfg.reader.decoder_seq_len,
                             seed=cfg.train.seed)
    valid_ds = (OpenQADataset(args.valid_data, t5_tok,
                              max_seq_length=cfg.retriever.query_seq_len,
                              decoder_seq_length=cfg.reader.decoder_seq_len)
                if args.valid_data else None)

    # evidence embeddings: precomputed store (MSS) or reference pickle
    if args.embedding_path is None:
        raise SystemExit("--embedding-path required (precomputed evidence "
                         "embeddings; build one with tools.create_doc_index)")
    if args.embedding_path.endswith(".pkl"):
        store = EmbeddingStore.load_reference_pickle(args.embedding_path)
    else:
        store = EmbeddingStore.load(args.embedding_path)
    index = ShardedEvidenceIndex(mesh, cfg.index,
                                 np.asarray(store.embeddings, np.float32),
                                 passage_ids=np.asarray(store.ids))

    B = cfg.train.batch_size * cfg.mesh.dp
    total_iters = (cfg.train.train_iters if cfg.train.train_iters
                   else cfg.train.epochs * (len(train_ds) // B))
    task = E2EQATask(cfg, mesh, t5_tok, corpus, index,
                     total_train_iters=total_iters)
    task.init_state(jax.random.PRNGKey(cfg.train.seed), B)

    resumed = False
    if args.load and ck.latest_iteration(args.load) is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, task.state)
        task.state, it = ck.load_checkpoint(args.load, abstract)
        resumed = True
        print(f"resumed from {args.load} at iteration {it}")
    if not resumed and (getattr(args, "pretrained_dpr_load", None)
                        or getattr(args, "pretrained_t5_load", None)):
        # iteration-0 init from pretrained DPR / T5 checkpoints
        # (init_state_dict_from_dpr_and_t5, training.py:156-158)
        def abstract_of(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

        params = dict(task.state.params)
        if args.pretrained_dpr_load:
            params["retriever"] = ck.load_retriever_params(
                args.pretrained_dpr_load, abstract_of(params["retriever"]))
            print(f"initialized retriever from {args.pretrained_dpr_load}")
        if args.pretrained_t5_load:
            params["reader"] = ck.load_reader_params(
                args.pretrained_t5_load, abstract_of(params["reader"]))
            print(f"initialized reader from {args.pretrained_t5_load}")
        params = jax.device_put(params, task.param_sharding.params)
        task.state = task.state._replace(params=params)

    from emdr2_tpu.parallel.distributed import is_coordinator

    eval_bs = getattr(args, "eval_batch_size", None)

    if getattr(args, "eval_only", False):
        assert valid_ds is not None, "--eval-only needs --valid-data"
        # no training follows, so no fp32 master copy is needed: bf16
        # param storage (bit-identical decode, models/decoding.py
        # bf16_eval_params) halves param HBM and makes room for the
        # larger eval batches / the cross-K/V slab. The bit-identical
        # guarantee only holds when compute is bf16 (params are cast there
        # anyway), so gate the cast on the configured compute dtype.
        import jax.numpy as jnp
        if cfg.reader.transformer.dtype == jnp.bfloat16:
            from emdr2_tpu.models.decoding import bf16_eval_params
            task.state = task.state._replace(
                params=bf16_eval_params(task.state.params))
        em, n = task.evaluate_em(valid_ds, batch_size=eval_bs,
                                 beam_size=args.beam_size,
                                 max_decode_len=args.max_decode_len,
                                 sample=getattr(args, "sampling", False),
                                 kv_quant="int8" if getattr(
                                     args, "decode_kv_int8", False)
                                 else None)
        if is_coordinator():
            print(f" eval-only | EM {em:.2f} over {n}")
        return 0

    refresher = None
    if args.async_indexer:
        # the embedder jits onto its own disjoint sub-mesh when configured
        # (--embed-devices N), the train mesh otherwise. The sub-mesh case
        # needs a model whose flash kernels are bound to THAT mesh
        # (shard_map over a foreign mesh is a device-assignment error)
        from emdr2_tpu.models import EMDR2Model
        from emdr2_tpu.parallel.mesh import bind_mesh
        builder_model = (task.model if embed_mesh is None
                         else EMDR2Model(bind_mesh(cfg, embed_mesh)))
        builder = EvidenceIndexBuilder(
            cfg, embed_mesh if embed_mesh is not None else mesh,
            builder_model,
            corpus, t5_tok.cls_id, t5_tok.sep_id, t5_tok.pad_id)
        # zero-copy (device-resident) embedding only when the embedder owns
        # a DISJOINT sub-mesh: there the fresh slab accumulates on the
        # embedder's chips and the train chips pay only the swap transient.
        # On a shared mesh the bf16 slab (~2 GB/chip at flagship scale)
        # would sit next to the live index AND the step's workspace for the
        # whole embedding pass — an OOM on a 16 GB v5e — so the host-array
        # path (accumulate in host RAM, one upload at swap) is used instead.
        refresher = AsyncIndexRefresher(
            builder, index, reload_interval=cfg.train.index_reload_interval,
            zero_copy=embed_mesh is not None)  # multi-host: per-host blocks
        # stay on the embedder devices; the swap is intra-host d2d only

    def eval_cb(iteration):
        # collective: every process participates in the mesh-sharded decode
        # (engine.train invokes the callback on all processes in lockstep).
        # Returns the metrics dict so engine.train writes EM to TensorBoard.
        if valid_ds is None:
            return None
        em, n = task.evaluate_em(valid_ds, batch_size=eval_bs,
                                 beam_size=args.beam_size,
                                 max_decode_len=args.max_decode_len,
                                 sample=getattr(args, "sampling", False),
                                 kv_quant="int8" if getattr(
                                     args, "decode_kv_int8", False)
                                 else None)
        if is_coordinator():
            print(f" iteration {iteration} | valid EM {em:.2f} over {n}")
        return {"valid_em": em, "valid_n": n}

    final = engine.train(task, train_ds, cfg, refresher=refresher,
                         save_dir=args.save, eval_callback=eval_cb,
                         prefetch_depth=getattr(args, "prefetch_depth", 0),
                         timeout_minutes=getattr(args, "timeout_minutes", None))
    if valid_ds is not None:
        em, n = task.evaluate_em(valid_ds, batch_size=eval_bs,
                                 beam_size=args.beam_size,
                                 max_decode_len=args.max_decode_len,
                                 sample=getattr(args, "sampling", False),
                                 kv_quant="int8" if getattr(
                                     args, "decode_kv_int8", False)
                                 else None)
        if is_coordinator():
            print(f" final ({final} iters) | valid EM {em:.2f} over {n}")
    return 0
