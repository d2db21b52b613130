"""Unified task CLI: ``python -m emdr2_tpu.tasks.run --task OPENQA|RETRIEVER``.

Replaces ``/root/reference/tasks/run.py`` + the argparse tree in
``megatron/arguments.py``: flags map onto the dataclass config
(``emdr2_tpu.config``), no global singletons. Flag names follow the
reference where a direct counterpart exists (see examples/*.sh).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("emdr2_tpu", description=__doc__)
    p.add_argument("--task", choices=["OPENQA", "RETRIEVER"], required=True)

    g = p.add_argument_group("model")
    g.add_argument("--hidden-size", type=int, default=768)
    g.add_argument("--num-layers", type=int, default=12)
    g.add_argument("--num-attention-heads", type=int, default=12)
    g.add_argument("--ffn-hidden-size", type=int, default=3072)
    g.add_argument("--seq-length", type=int, default=512,
                   help="reader sequence length")
    g.add_argument("--seq-length-ret", type=int, default=256,
                   help="retriever context length")
    g.add_argument("--seq-length-query", type=int, default=64)
    g.add_argument("--seq-length-dec", type=int, default=32)
    g.add_argument("--remat", action="store_true",
                   help="activation checkpointing in the transformer stacks")
    g.add_argument("--remat-policy", choices=["nothing", "dots_no_batch"],
                   default="nothing",
                   help="what the per-layer checkpoint saves: 'nothing' = "
                        "full recompute (minimum HBM), 'dots_no_batch' = "
                        "save projection/MLP matmul outputs so backward "
                        "only recomputes attention (needs HBM headroom)")
    g.add_argument("--no-remat-towers", action="store_true",
                   help="keep --remat on the reader but store the dual-"
                        "encoder towers' activations (no recompute): "
                        "measured -51 ms/step for +1.55 GB HBM on v5e at "
                        "the flagship shape (BENCH r4) — the towers are "
                        "the cheapest pass to buy back")
    g.add_argument("--fid-flash-attention", action="store_true",
                   help="Pallas flash kernel for FiD decoder cross-attention "
                        "AND all padding-masked encoder self-attention "
                        "over K*512 keys (no [Lq, Lk] score materialization; "
                        "replaces the reference's activation-checkpointing "
                        "survival strategy, transformer.py:621-646)")
    g.add_argument("--flash-key-chunk", type=int, default=512)

    g = p.add_argument_group("emdr2")
    g.add_argument("--topk-retrievals", type=int, default=50)
    g.add_argument("--update-retriever", action="store_true", default=True)
    g.add_argument("--no-update-retriever", dest="update_retriever",
                   action="store_false")
    g.add_argument("--retriever-score-scaling", action="store_true",
                   default=True)
    g.add_argument("--ret-kldiv", action="store_true")
    g.add_argument("--allow-trivial-doc", action="store_true", default=True)
    g.add_argument("--async-indexer", action="store_true")
    g.add_argument("--index-reload-interval", type=int, default=500)
    g.add_argument("--index-quantize", choices=["none", "int8"],
                   default="none",
                   help="int8: store the MIPS index as int8 rows + per-128-"
                        "row fp32 scales — halves index HBM at ~the same "
                        "search throughput (~0.1%% score error)")

    g = p.add_argument_group("training")
    g.add_argument("--batch-size", type=int, default=8,
                   help="per-dp-shard batch size")
    g.add_argument("--epochs", type=int, default=10)
    g.add_argument("--train-iters", type=int, default=None)
    g.add_argument("--lr", type=float, default=2e-5)
    g.add_argument("--min-lr", type=float, default=0.0)
    g.add_argument("--lr-decay-style", default="linear",
                   choices=["linear", "cosine", "exponential", "constant"])
    g.add_argument("--warmup", type=float, default=0.01)
    g.add_argument("--weight-decay", type=float, default=0.1)
    g.add_argument("--clip-grad", type=float, default=1.0)
    g.add_argument("--seed", type=int, default=1234)
    g.add_argument("--rng-impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="jax PRNG implementation. Dropout masks no longer "
                        "generate rng bits (PackedDropout hashes the key "
                        "words + element coordinates), so this now only "
                        "affects key derivation and any residual "
                        "jax.random draws; threefry2x32 gives bit-exact "
                        "key-derivation reproducibility across backends")
    g.add_argument("--log-interval", type=int, default=20)
    g.add_argument("--save-interval", type=int, default=500)
    g.add_argument("--eval-interval", type=int, default=500)
    g.add_argument("--exit-interval", type=int, default=None)
    g.add_argument("--sync-save", action="store_true",
                   help="block the train loop on interval checkpoint saves "
                        "(the reference's behavior). Default: interval saves "
                        "stage to host and write in the background; the "
                        "tracker file advances only once the checkpoint is "
                        "durable, and exit/final saves are always "
                        "synchronous")
    g.add_argument("--timeout-minutes", type=float, default=None,
                   help="checkpoint and exit cleanly after this wall-clock "
                        "budget (ADLR-autoresume equivalent)")
    g.add_argument("--prefetch-depth", type=int, default=0,
                   help="host-side input prefetch depth (0 = off)")
    g.add_argument("--beam-size", type=int, default=1)
    g.add_argument("--sampling", action="store_true",
                   help="multinomial-sampling decode for EM eval instead of "
                        "greedy (SampleOrGreedySearch sampling mode, "
                        "search_strategy.py:213-217); only with beam-size 1")
    g.add_argument("--max-decode-len", type=int, default=32)
    g.add_argument("--decode-kv-int8", action="store_true",
                   help="store the precomputed cross-K/V slab int8 during "
                        "EM eval decode (ops/decode_attention.py): halves "
                        "the slab HBM (what lets decode coexist with the "
                        "train state / larger eval batches) at parity "
                        "step latency vs bf16; greedy/beam token streams "
                        "match the bf16 path on the tested models "
                        "(tests/test_decode_int8.py)")
    g.add_argument("--eval-batch-size", type=int, default=None,
                   help="global batch for the EM-eval decode (default: the "
                        "train batch). Eval holds no optimizer state, so "
                        "larger batches amortize the FiD encode phase — "
                        "measured sweep in the README decode table; pair "
                        "with --decode-kv-int8 to fit the cross-K/V slab "
                        "on 16 GB parts")
    g.add_argument("--train-hard-neg", type=int, default=1)
    g.add_argument("--val-av-rank-hard-neg", type=int, default=30,
                   help="hard negatives per query in av-rank validation "
                        "(train_data_utils.py:177-182)")
    g.add_argument("--val-av-rank-other-neg", type=int, default=30)
    g.add_argument("--report-topk-accuracies", type=int, nargs="+",
                   default=[1, 5, 20, 100])
    g.add_argument("--match", default="string",
                   choices=["string", "regex"],
                   help="answer-matching mode for recall evaluation")
    g.add_argument("--eval-only", action="store_true",
                   help="skip training; run EM eval on --valid-data from "
                        "--load (tools/evaluate_orqa.py equivalent)")

    g = p.add_argument_group("mesh")
    g.add_argument("--dp", type=int, default=None,
                   help="data-parallel axis size (default: all devices "
                        "not reserved for the embedder)")
    g.add_argument("--tp", type=int, default=1)
    g.add_argument("--embed-devices", type=int, default=0,
                   help="devices reserved for the async embedder sub-mesh "
                        "(the reference's indexer group: 8 of 16 GPUs, "
                        "--max-training-rank)")
    g.add_argument("--coordinator-address", default=None,
                   help="multi-host: host:port of process 0 "
                        "(MASTER_ADDR:MASTER_PORT equivalent)")
    g.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count (WORLD_SIZE)")
    g.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's id (RANK)")

    g = p.add_argument_group("data")
    g.add_argument("--vocab-file", required=True)
    g.add_argument("--train-data", nargs="+", default=None)
    g.add_argument("--valid-data", nargs="+", default=None)
    g.add_argument("--evidence-data-path", default=None,
                   help="prefix of the pre-tokenized evidence (expects "
                        "<prefix>_text/_title mmap datasets)")
    g.add_argument("--embedding-path", default=None,
                   help="EmbeddingStore prefix for precomputed evidence "
                        "embeddings (or reference .pkl to ingest)")
    g.add_argument("--save", default=None, help="checkpoint dir")
    g.add_argument("--load", default=None, help="resume checkpoint dir")
    g.add_argument("--qa-file-dev", default=None,
                   help="QA csv for post-train retrieval recall (RETRIEVER)")
    g.add_argument("--qa-file-test", default=None)
    g.add_argument("--pretrained-dpr-load", default=None,
                   help="init the retriever subtree from a DPR checkpoint "
                        "at iteration 0 (reference --pretrained-dpr-load)")
    g.add_argument("--pretrained-t5-load", default=None,
                   help="init the reader subtree from a T5 checkpoint "
                        "at iteration 0 (reference --pretrained-t5-load)")

    return p


def make_config(args):
    from emdr2_tpu import config as C

    enc = C.TransformerConfig(
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        num_heads=args.num_attention_heads, ffn_size=args.ffn_hidden_size,
        num_tokentypes=2,
        remat=args.remat and not getattr(args, "no_remat_towers", False),
        remat_policy=args.remat_policy,
        fid_flash_attention=args.fid_flash_attention,
        flash_key_chunk=args.flash_key_chunk)
    t5c = dataclasses.replace(enc, num_tokentypes=0, remat=args.remat)
    cfg = C.EMDR2Config(
        retriever=C.RetrieverConfig(
            encoder=enc, embed_dim=args.hidden_size,
            seq_len=args.seq_length_ret, query_seq_len=args.seq_length_query),
        reader=C.ReaderConfig(
            transformer=t5c, seq_len=args.seq_length,
            decoder_seq_len=args.seq_length_dec),
        index=C.IndexConfig(
            embed_dim=args.hidden_size, topk=args.topk_retrievals,
            allow_trivial_doc=args.allow_trivial_doc,
            quantize=args.index_quantize),
        mesh=C.MeshConfig(
            dp=args.dp or max(1, (len(jax.devices()) - args.embed_devices)
                              // args.tp),
            tp=args.tp, embed_devices=args.embed_devices),
        train=C.TrainConfig(
            batch_size=args.batch_size, train_iters=args.train_iters,
            epochs=args.epochs, seed=args.seed,
            log_interval=args.log_interval, save_interval=args.save_interval,
            eval_interval=args.eval_interval, exit_interval=args.exit_interval,
            index_reload_interval=args.index_reload_interval,
            async_save=not getattr(args, "sync_save", False),
            optimizer=C.OptimizerConfig(
                lr=args.lr, min_lr=args.min_lr,
                weight_decay=args.weight_decay, clip_grad=args.clip_grad,
                lr_decay_style=args.lr_decay_style, warmup=args.warmup)),
        update_retriever=args.update_retriever,
        retriever_score_scaling=args.retriever_score_scaling,
        use_kl_div_loss=args.ret_kldiv,
    )
    # pad model vocabs to the tokenizer's padded size at task setup
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from emdr2_tpu.utils.platform import (enable_compilation_cache,
                                          respect_jax_platforms_env)
    respect_jax_platforms_env()
    enable_compilation_cache()
    # must be set before any key creation; raw uint32 keys are interpreted
    # under the impl active at use time, so this cannot be flipped mid-run
    jax.config.update("jax_default_prng_impl", args.rng_impl)
    # multi-host rendezvous BEFORE any device use (the reference's
    # init_distributed TCP rendezvous, initialize.py:76-110)
    from emdr2_tpu.parallel.distributed import init_distributed
    if init_distributed(args.coordinator_address, args.num_processes,
                        args.process_id):
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    if args.task == "OPENQA":
        from emdr2_tpu.tasks.openqa_main import run_openqa
        return run_openqa(args, make_config(args))
    else:
        from emdr2_tpu.tasks.retriever_main import run_retriever
        return run_retriever(args, make_config(args))


if __name__ == "__main__":
    sys.exit(main())
