"""Full three-stage train-iteration benchmark at per-chip scale.

bench.py measures stage C (the fused differentiable step) in isolation; this
tool measures the OTHER two stages of one EMDR2 training iteration
(tasks/e2eqa.py docstring, SURVEY.md §3.2) on a synthetic per-chip world:

  stage A (jit)   query CLS embed -> fused MIPS top-(K+1) over the in-HBM
                  1.31M x 768 shard -> host row->passage-id lookup
  stage B (host)  C++ postprocess: B*K reader/teacher/context row builds
                  with neighbor-window budget logic

The synthetic corpus is 1,310,720 pre-tokenized passages (the 21M/16
per-chip share) with paired titles so neighbor windows exist; it is built
once into .bench_cache/ and mmap'd afterwards. Run manually:

    python -m emdr2_tpu.tools.bench_pipeline [--batch 4] [--topk 50]

Prints one JSON line with per-stage ms. The point: both stages together are
~1% of the 2s stage-C step (and the prefetch pipeline hides them entirely),
so the bench.py train-step number is the honest full-iteration number.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pathlib
import time

import numpy as np


def build_world(cache: pathlib.Path, n_docs: int, doc_len=30, title_len=4):
    from emdr2_tpu.data.indexed_dataset import (MMapIndexedDataset,
                                                MMapIndexedDatasetBuilder)

    text_p = str(cache / f"text_{n_docs}")
    title_p = str(cache / f"title_{n_docs}")
    if not os.path.exists(text_p + ".idx"):
        rng = np.random.RandomState(0)
        toks = rng.randint(5, 25000, size=(n_docs, doc_len)).astype(np.int32)
        with MMapIndexedDatasetBuilder(text_p) as b:
            for row in toks:
                b.add_item(row)
        # two docs share each title -> 2-passage neighbor windows
        ttoks = rng.randint(5, 25000, size=(n_docs // 2, title_len)
                            ).astype(np.int32)
        with MMapIndexedDatasetBuilder(title_p) as b:
            for i in range(n_docs):
                b.add_item(ttoks[i // 2])
    from emdr2_tpu.data.evidence import EvidenceCorpus
    return EvidenceCorpus(MMapIndexedDataset(text_p),
                          MMapIndexedDataset(title_p))


def bench_refresh(n_docs: int, iters: int = 3):
    """Index hot-swap wall time at the per-chip shard scale (1.31M x 768).

    Times BOTH refresh paths of ``ShardedEvidenceIndex``:
      - ``update()``        — host np.ndarray in, ~2 GB H2D per chip (the
                              multi-host / host-snapshot path)
      - ``swap_device_array`` — already-on-device slab, device-to-device
                              (the zero-copy async-embedder path,
                              training/async_refresh.py:131)
    The reference's equivalent is delete-shards / re-unpickle a 32 GB
    pickle / re-shard over 16 GPUs (emdr2_index.py:232-266), i.e. minutes;
    here the swap must be invisible next to a ~1.4 s train step.
    """
    import jax
    import jax.numpy as jnp

    from emdr2_tpu.config import IndexConfig
    from emdr2_tpu.parallel.mesh import build_mesh
    from emdr2_tpu.retrieval.index import ShardedEvidenceIndex

    mesh = build_mesh()
    cfg = IndexConfig()
    d = cfg.embed_dim
    rng = np.random.RandomState(0)
    host = rng.standard_normal((n_docs, d)).astype(np.float32)
    index = ShardedEvidenceIndex(mesh, cfg, host)

    def fence():
        # force the swapped-in slab to exist on device (async dispatch +
        # the remote-device tunnel make block_until_ready alone unreliable
        # as a timing fence; a tiny host fetch of a dependent value is)
        np.asarray(jnp.sum(index.embeddings[:1, :1]))

    # host-array path — measured ONCE: it is H2D-bandwidth-bound (~2 GB/chip
    # at flagship scale) and exists for multi-host / snapshot refresh; the
    # async embedder uses the zero-copy path below
    fence()
    t0 = time.time()
    index.update(host)
    fence()
    host_ms = (time.time() - t0) * 1000

    # zero-copy path: fresh slab produced on device (as the embedder
    # sub-mesh does), then swapped
    sharding = index._sharding
    make = jax.jit(
        lambda k: jax.random.normal(k, (index.n_padded, d), jnp.bfloat16),
        out_shardings=sharding)
    slabs = [make(jax.random.PRNGKey(i)) for i in range(iters)]
    jax.block_until_ready(slabs)
    t0 = time.time()
    for s in slabs:
        index.swap_device_array(s)
        fence()
    dev_ms = (time.time() - t0) / iters * 1000

    return {"rows": index.n_padded,
            "update_host_ms": round(host_ms, 1),
            "swap_device_ms": round(dev_ms, 1)}


def bench_embed(corpus, batch_size: int = 512):
    """Corpus-embedding throughput of the async refresher's hot loop.

    Times ``EvidenceIndexBuilder.embed_corpus_device`` (the zero-copy
    refresh path, training/async_refresh.py) end-to-end over a synthetic
    pre-tokenized corpus: C++ row formatting + H2D + context-tower forward
    + device-resident placement. This is the number that decides whether
    the BASELINE "overlapped refresh" cadence is feasible: the reference's
    8 indexer GPUs re-embed all 21M passages once per refresh
    (indexer_emdr2.py:77-114), so passages/s/chip bounds how stale the
    index gets at a given `--index-reload-interval`.
    """
    import jax

    from emdr2_tpu.config import EMDR2Config, bert_base
    from emdr2_tpu.models.bert import BertEncoder
    from emdr2_tpu.parallel.mesh import build_mesh
    from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder

    mesh = build_mesh()
    cfg = EMDR2Config()
    # the context tower alone (BertEncoder == one DualEncoder tower): same
    # math as EMDR2Model.embed_context without initializing 440M params
    enc = BertEncoder(bert_base(
        fid_flash_attention=jax.default_backend() != "cpu"))
    ids0 = np.zeros((2, cfg.retriever.seq_len), np.int32)
    params = enc.init({"params": jax.random.PRNGKey(0)}, ids0)["params"]
    builder = EvidenceIndexBuilder(
        cfg, mesh, enc, corpus, cls_id=2, sep_id=3, pad_id=0,
        batch_size=batch_size, embed_method=BertEncoder.embed)

    n = len(corpus)
    dev = max(1, len(mesh.devices.ravel()))
    out_rows = -(-n // dev) * dev
    # pass 1 compiles + warms; pass 2 is the measurement
    buf = builder.embed_corpus_device(params, out_rows)
    np.asarray(jax.device_get(buf[0, 0]))   # fence (see bench_refresh)
    t0 = time.time()
    buf = builder.embed_corpus_device(params, out_rows)
    np.asarray(jax.device_get(buf[0, 0]))
    wall = time.time() - t0
    # the builder dp-shards every batch over the whole mesh, so n/wall is
    # AGGREGATE mesh throughput; per-chip is that divided by the device
    # count (on the 1-chip bench host the two coincide)
    pps = n / wall / dev
    return {
        "batch_size": builder.batch_size,
        "n_docs": n,
        "mesh_devices": dev,
        "passages_per_sec_per_chip": round(pps, 1),
        "ms_per_batch": round(wall / -(-n // builder.batch_size) * 1e3, 2),
        # per-chip share of the reference's 16-GPU layout (21M/16 rows)
        "shard_1p31M_refresh_s": round(1_310_720 / pps, 1),
        # full 21M corpus on the flagship 8-chip embedder sub-mesh
        "full_21M_8chip_refresh_s": round(21_015_324 / (8 * pps), 1),
    }


def bench_overlap(corpus, B: int, K: int, iters: int = 8):
    """Full-iteration throughput with the prefetch pipeline engaged.

    One EMDR2 training iteration = stage A (query embed + fused MIPS over
    the resident 1.31M-row shard + host id readback) + stage B (C++ token
    postprocess) + stage C (the flagship fused grad step). The engine's
    ``prefetch_depth>0`` path builds batch N+1 on a background thread while
    step N runs (training/prefetch.py); this bench measures the REAL
    overlapped ms/iter against the serial A->B->C loop and the bare step,
    at flagship scale on one chip — the VERDICT r2 item-5 'ms/iter ≈
    ms/step' evidence.
    """
    import sys

    import jax
    import jax.numpy as jnp
    from emdr2_tpu.config import EMDR2Config, bert_base
    from emdr2_tpu.data.postprocess import postprocess_retrieved
    from emdr2_tpu.models import EMDR2Batch
    from emdr2_tpu.models.bert import BertEncoder
    from emdr2_tpu.ops import mips_topk
    from emdr2_tpu.training.prefetch import BatchPrefetcher

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import bench as bench_mod

    compiled, state, proto = bench_mod.make_flagship_step(B, K)
    cfg = EMDR2Config()
    icfg = cfg.index
    kq = K + 1
    rng = np.random.RandomState(3)
    n_docs = len(corpus)

    enc = BertEncoder(bert_base(fid_flash_attention=True))
    Lq = proto.query_bert_ids.shape[1]
    qids_h = rng.randint(5, 25000, size=(B, Lq)).astype(np.int32)
    # bf16 params: stage A is the SELECTION path only (scores are recomputed
    # in fp32-master params inside the grad step), and the v5e has no room
    # for an extra fp32 tower next to the flagship state + the 2 GB shard
    # (measured: fp32 here OOMs the first step)
    enc_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        enc.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(qids_h)))
    enc_params = jax.block_until_ready(enc_params)

    # int8 index shard (--index-quantize int8): the flagship step + a bf16
    # 2 GB shard alone fill a 16 GB v5e (README coexistence row), so the
    # overlap layout — which additionally keeps the stage-A query tower
    # resident — uses the quantized index (1 GB, recall ~1.0 at
    # cands_per_group=2). Built in row chunks to bound the fp32 transient.
    from emdr2_tpu.ops.mips import quantize_int8
    g, dim = icfg.group_size, icfg.embed_dim
    assert n_docs % g == 0, (
        f"--n-docs must be a multiple of the quantization group size {g}")
    quant = jax.jit(lambda x: quantize_int8(x.astype(jnp.float32), g))
    # ~8 group-aligned chunks, covering every row for any aligned n_docs
    chunk = max(g, n_docs // 8 // g * g)
    parts = [quant(jax.random.normal(jax.random.PRNGKey(100 + i),
                                     (min(chunk, n_docs - s), dim),
                                     jnp.bfloat16))
             for i, s in enumerate(range(0, n_docs, chunk))]
    shard = jnp.concatenate([p[0] for p in parts])
    scales = jnp.concatenate([p[1] for p in parts])
    del parts
    jax.block_until_ready((shard, scales))

    @jax.jit
    def stage_a(p, q, s, sc):
        emb = enc.apply(p, q, method=BertEncoder.embed)
        return mips_topk(emb.astype(jnp.bfloat16), s, kq,
                         chunk_rows=icfg.chunk_rows,
                         group_size=icfg.group_size,
                         query_tile=icfg.query_tile,
                         cands_per_group=icfg.cands_per_group,
                         shard_scales=sc,
                         interpret=jax.default_backend() == "cpu")

    qt5 = rng.randint(5, 25000, size=(B, 64)).astype(np.int32)
    qlens = np.full(B, 24, np.int32)
    uids = -np.arange(1, B + 1)

    class _Task:
        def build_device_batch(self, qids):
            _, rows = stage_a(enc_params, jnp.asarray(qids), shard, scales)
            pids = np.asarray(rows) + 1          # row -> 1-based passage id
            post = postprocess_retrieved(
                query_uids=uids, query_t5_ids=qt5, query_t5_lens=qlens,
                topk_passage_ids=pids, corpus=corpus, topk=K,
                retriever_seq_len=cfg.retriever.seq_len,
                reader_seq_len=cfg.reader.seq_len,
                cls_id=2, sep_id=3, pad_id=0)
            return EMDR2Batch(
                query_bert_ids=jnp.asarray(qids),
                context_bert_ids=jnp.asarray(post.context_bert_ids),
                context_bert_types=jnp.asarray(post.context_bert_types),
                reader_ids=jnp.asarray(post.reader_ids),
                reader_one_ctx_ids=jnp.asarray(post.reader_one_ctx_ids),
                dec_ids=proto.dec_ids, labels=proto.labels,
                loss_mask=proto.loss_mask)

    task = _Task()

    # bare step (the bench.py number, in-session for comparability)
    state, m = compiled(state, proto)
    np.asarray(m["loss"])
    t0 = time.time()
    for _ in range(3):
        state, m = compiled(state, proto)
    np.asarray(m["loss"])
    step_ms = (time.time() - t0) / 3 * 1000

    # serial A -> B -> C
    b0 = task.build_device_batch(qids_h)         # warm stage-A compile
    state, m = compiled(state, b0)
    np.asarray(m["loss"])
    t0 = time.time()
    for _ in range(iters):
        state, m = compiled(state, task.build_device_batch(qids_h))
    np.asarray(m["loss"])
    serial_ms = (time.time() - t0) / iters * 1000

    # overlapped: prefetch thread builds batch N+1 during step N
    feed = BatchPrefetcher(task, iter([qids_h] * (iters + 1)), depth=1)
    state, m = compiled(state, next(feed))       # first batch: no overlap
    np.asarray(m["loss"])
    t0 = time.time()
    n = 0
    for db in feed:
        state, m = compiled(state, db)
        n += 1
    np.asarray(m["loss"])
    overlap_ms = (time.time() - t0) / n * 1000

    return {"step_ms": round(step_ms, 1),
            "serial_iter_ms": round(serial_ms, 1),
            "overlap_iter_ms": round(overlap_ms, 1),
            "overlap_overhead_ms": round(overlap_ms - step_ms, 1)}


def bench_decode(B: int, K: int, max_decode_len: int = 32, iters: int = 5,
                 include_beam: bool = True, breakdown: bool = False,
                 bf16_params: bool = False, kv_quant: str = None):
    """Generation latency at flagship size: retrieval-conditioned FiD encode
    (K contexts) + KV-cached greedy decode of ``max_decode_len`` tokens —
    the per-batch cost of ``evaluate_em`` / ``QAPipeline.ask``. The
    reference re-runs the decoder over the whole prefix every step
    (search_strategy.py:200-227); this path decodes incrementally.

    ``breakdown=True`` additionally times the encode phase (FiD encoder +
    per-layer cross-K/V precompute) separately from the token loop and
    reports the encode-phase MFU (VERDICT r3 weak #7)."""
    import sys

    import jax
    import jax.numpy as jnp
    from emdr2_tpu.models import EMDR2Batch, EMDR2Model
    from emdr2_tpu.models.decoding import DecoderSession, greedy_decode

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import bench as bench_mod

    cfg = bench_mod.flagship_step_config(B, K)
    model = EMDR2Model(cfg)
    rng = np.random.RandomState(0)

    def ids(*shape):
        return jnp.asarray(rng.randint(2, 30000, size=shape), jnp.int32)

    Ld = cfg.reader.decoder_seq_len
    batch = EMDR2Batch(
        query_bert_ids=ids(B, cfg.retriever.query_seq_len),
        context_bert_ids=ids(B, K, cfg.retriever.seq_len),
        context_bert_types=jnp.zeros((B, K, cfg.retriever.seq_len), jnp.int32),
        reader_ids=ids(B, K, cfg.reader.seq_len),
        reader_one_ctx_ids=ids(B, K, cfg.reader.seq_len),
        dec_ids=jnp.zeros((B, Ld), jnp.int32),
        labels=jnp.zeros((B, Ld), jnp.int32),
        loss_mask=jnp.zeros((B, Ld), jnp.float32),
    )
    # Init at B=1/K=2: flax init traces the FULL training forward (incl.
    # the B*K-row teacher) at the init batch's shape, and at B>=16/K=50
    # that one-shot program alone kills the tunnel's remote-compile helper.
    # Param shapes don't depend on B/K, so init tiny and benchmark big.
    init_batch = EMDR2Batch(
        query_bert_ids=batch.query_bert_ids[:1],
        context_bert_ids=batch.context_bert_ids[:1, :2],
        context_bert_types=batch.context_bert_types[:1, :2],
        reader_ids=batch.reader_ids[:1, :2],
        reader_one_ctx_ids=batch.reader_one_ctx_ids[:1, :2],
        dec_ids=batch.dec_ids[:1],
        labels=batch.labels[:1],
        loss_mask=batch.loss_mask[:1],
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, init_batch)["params"]
    if bf16_params:
        # eval holds no optimizer state and needs no fp32 master weights —
        # bf16 kernel storage frees ~0.76 GB at 440M params (embedding
        # tables stay fp32), which is what lets B=8 eval batches fit on a
        # 16 GB v5e. bf16_eval_params is the shipping QAPipeline path:
        # BIT-identical token streams (tests/test_decoding.py)
        from emdr2_tpu.models.decoding import bf16_eval_params
        params = bf16_eval_params(params)
    session = DecoderSession(model, params, max_decode_len,
                             kv_quant=kv_quant)
    greedy_decode(session, batch, bos_id=1, eos_id=0)     # compile+warm
    t0 = time.time()
    for _ in range(iters):
        hyps = greedy_decode(session, batch, bos_id=1, eos_id=0)
    dt = (time.time() - t0) / iters
    assert len(hyps) == B

    out = {"decode_ms_per_batch": round(dt * 1000, 1),
           "questions_per_sec_per_chip": round(B / dt, 2)}
    if breakdown:
        # encode phase alone (jits already warm from the full decode above)
        def fence(x):
            # slice ON DEVICE before the host fetch — device_get of the
            # leaf would pull the whole ~200 MB cross-K/V array through
            # the tunnel and bill it to the encode timing
            np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
        kvs, ef = session.encode(batch)
        fence(kvs)
        t0 = time.time()
        for _ in range(iters):
            # free the previous slab BEFORE re-encoding: two live copies of
            # the [B, nh, 25.6k, hd] x 2 x layers cross-K/V (4.7 GB at B=4)
            # thrash HBM and the measurement reads allocator churn, not the
            # encode (first attempt measured 1671 ms vs 467 ms full decode)
            kvs = ef = None
            kvs, ef = session.encode(batch)
        fence(kvs)
        enc_dt = (time.time() - t0) / iters
        del kvs, ef
        # analytic encode FLOPs: B*K*Lr tokens through the T5 encoder
        # (qkv/proj/mlp GEMMs + attention scores) + the per-layer cross-K/V
        # projections of the [B, K*Lr, H] hidden states
        t = cfg.reader.transformer
        H, F, L = t.hidden_size, t.ffn_size, cfg.reader.seq_len
        toks = B * K * L
        per_tok = t.num_layers * 2 * (H * 3 * H + H * H + 2 * H * F
                                      + 2 * L * H)
        kv_flops = t.num_layers * 2 * toks * H * 2 * H
        enc_flops = toks * per_tok + kv_flops
        peak = bench_mod.PEAK_FLOPS.get(
            jax.devices()[0].device_kind, 197e12)
        out["encode_ms"] = round(enc_dt * 1000, 1)
        out["token_loop_ms"] = round((dt - enc_dt) * 1000, 1)
        out["encode_model_tflops"] = round(enc_flops / 1e12, 1)
        out["encode_mfu"] = round(enc_flops / enc_dt / peak, 3)
    if not include_beam:   # bench.py budget: skip the beam-loop compile
        return out

    # beam-5: the device-resident lax.while_loop beam (same session/cache
    # machinery; VERDICT r2 item 4 target: within ~2x of greedy)
    from emdr2_tpu.models.decoding import beam_search_decode
    beam_search_decode(session, batch, bos_id=1, eos_id=0, beam_size=5)
    t0 = time.time()
    for _ in range(iters):
        hb = beam_search_decode(session, batch, bos_id=1, eos_id=0,
                                beam_size=5)
    dtb = (time.time() - t0) / iters
    assert len(hb) == B
    out["beam5_ms_per_batch"] = round(dtb * 1000, 1)
    out["beam5_vs_greedy"] = round(dtb / dt, 2)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--n-docs", type=int, default=1_310_720)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--decode", action="store_true",
                   help="also measure FiD encode + greedy decode latency")
    p.add_argument("--decode-sweep", action="store_true",
                   help="eval-batch-size sweep of the decode path with the "
                        "encode/token-loop breakdown (B in 4/8/16/32)")
    p.add_argument("--decode-sweep-row", default=None,
                   help="internal: run ONE decode-sweep row ('B:bf16:kvq') "
                        "in this process and print its JSON")
    p.add_argument("--overlap", action="store_true",
                   help="also measure the full overlapped iteration "
                        "(prefetch pipeline: stage A+B hidden under step C)")
    p.add_argument("--refresh", action="store_true",
                   help="also measure index hot-swap wall time at shard "
                        "scale (host update vs zero-copy device swap)")
    p.add_argument("--embed", action="store_true",
                   help="measure corpus-embedding throughput of the "
                        "refresher's zero-copy path (passages/s/chip)")
    p.add_argument("--embed-batch", type=int, default=512)
    args = p.parse_args(argv)

    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import bench  # noqa: F401 — applies the shared jax compilation-cache
    # + hardware-RNG config on import (single source with bench.py)
    import jax

    import jax.numpy as jnp
    from emdr2_tpu.config import EMDR2Config, bert_base
    from emdr2_tpu.data.postprocess import postprocess_retrieved
    from emdr2_tpu.models.bert import BertEncoder
    from emdr2_tpu.ops import mips_topk

    cache = pathlib.Path(__file__).resolve().parents[2] / ".bench_cache"
    cache.mkdir(exist_ok=True)

    if args.decode_sweep_row:
        # internal child mode: ONE row in this process (see --decode-sweep
        # for why rows can't share a process), JSON on the last stdout line
        b, bf16, kvq = args.decode_sweep_row.split(":")
        try:
            row = bench_decode(int(b), args.topk, include_beam=False,
                               breakdown=True, bf16_params=bf16 == "1",
                               kv_quant=kvq or None)
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(json.dumps(row))
        return

    if args.decode_sweep:
        # eval has no optimizer/index HBM pressure, so larger batches can
        # amortize the encode phase (VERDICT r3 weak #7): sweep B, report
        # the breakdown, print one JSON line. fp32 params OOM past B=4 on
        # 16 GB (the cross-K/V slab is 1.18 GB/example at K=50), so B>=8
        # runs with bf16 param storage (see bench_decode bf16_params)
        result = {"topk": args.topk, "decode_sweep": {}}
        # (B, bf16 param storage, int8 cross-K/V): measured r5 (README
        # decode table, BENCH_DECODE.jsonl) — throughput is ~flat in B
        # (8.58 q/s at B=4 fp32, 8.94 at B=8 bf16: encode FLOPs and the
        # per-step slab read both scale linearly, nothing amortizes); fp32
        # params OOM past B=4 (0.94 GB/example bf16 cross-K/V at K=50);
        # int8 K/V is throughput-neutral at B<=8 — its value is the halved
        # slab HBM. B>=16 needs BOTH the K-block encode (the monolithic
        # 25.6k-key encode hit a compile wall; DecoderSession.
        # encode_chunk_rows) and int8 K/V (the bf16 slab alone is 0.94 GB/
        # example: 15 GB at B=16); with both, the program compiles on CPU
        # but the shared tunnel's remote-compile helper dies on programs
        # that size (HTTP 500 subprocess exit — the same infra wall that
        # stops the train sweep at B>=6), so B>=16 records an error row
        # rather than silently skipping.
        # One fresh PROCESS per row: a big-slab row's freed-but-fragmented
        # HBM (and any OOM'd row's leaked buffers) otherwise spuriously
        # RESOURCE_EXHAUSTs every subsequent row — the in-process sweep
        # OOM'd B8_kvint8, which runs fine standalone (907 ms, r4).
        import subprocess
        for B, bf16, kvq in ((4, False, None), (4, False, "int8"),
                             (8, True, None), (8, True, "int8"),
                             (16, True, "int8"), (32, True, "int8")):
            key = (f"B{B}" + ("_bf16params" if bf16 else "")
                   + ("_kvint8" if kvq else ""))
            r = subprocess.run(
                [sys.executable, "-m", "emdr2_tpu.tools.bench_pipeline",
                 "--decode-sweep-row", f"{B}:{int(bf16)}:{kvq or ''}",
                 "--topk", str(args.topk), "--iters", str(args.iters)],
                cwd="/root/repo", capture_output=True, text=True)
            lines = [ln for ln in r.stdout.strip().splitlines() if ln]
            try:
                result["decode_sweep"][key] = json.loads(lines[-1])
            except (IndexError, json.JSONDecodeError):
                result["decode_sweep"][key] = {
                    "error": f"row process died rc={r.returncode}: "
                             f"{r.stderr.strip().splitlines()[-1:] }"[:160]}
            print(f"  {key} -> {result['decode_sweep'][key]}",
                  file=sys.stderr, flush=True)
        print(json.dumps(result))
        return

    if args.overlap or args.refresh or args.embed:
        # exclusive modes: each owns most of HBM at flagship scale, so they
        # run instead of (not alongside) the standalone stage-A/B pass
        result = {"n_docs": args.n_docs, "batch": args.batch,
                  "topk": args.topk}
        if args.overlap:
            t0 = time.time()
            corpus = build_world(cache, args.n_docs)
            corpus.neighbour_table()
            result["world_setup_s"] = round(time.time() - t0, 1)
            result["overlap"] = bench_overlap(corpus, args.batch, args.topk)
        if args.refresh:
            result["refresh"] = bench_refresh(args.n_docs)
        if args.embed:
            # a 65,536-row corpus is plenty to saturate the tower; the
            # throughput number projects linearly to the 1.31M shard
            corpus = build_world(cache, min(args.n_docs, 65_536))
            result["embed"] = bench_embed(corpus, args.embed_batch)
            # the top-level n_docs reflects what was actually embedded
            result["n_docs"] = result["embed"]["n_docs"]
        print(json.dumps(result))
        return

    t0 = time.time()
    corpus = build_world(cache, args.n_docs)
    corpus.neighbour_table()            # built once, cached on the corpus
    setup_s = time.time() - t0

    cfg = EMDR2Config()
    B, K = args.batch, args.topk
    kq = K + 1                          # trivial-doc drop fetches K+1
    rng = np.random.RandomState(1)

    # stage A: query embed (flagship BERT-base query tower) + fused MIPS
    enc = BertEncoder(bert_base(fid_flash_attention=True))
    qids = jnp.asarray(rng.randint(5, 25000, size=(B, 64)), jnp.int32)
    params = enc.init({"params": jax.random.PRNGKey(0)}, qids)
    shard = jax.random.normal(jax.random.PRNGKey(1),
                              (args.n_docs, 768), jnp.bfloat16)

    @jax.jit
    def stage_a(params, qids, shard):
        q = enc.apply(params, qids, method=BertEncoder.embed)
        return mips_topk(q.astype(jnp.bfloat16), shard, kq,
                         chunk_rows=cfg.index.chunk_rows,
                         group_size=cfg.index.group_size,
                         query_tile=cfg.index.query_tile,
                         cands_per_group=cfg.index.cands_per_group,
                         interpret=jax.default_backend() == "cpu")

    def run_a():
        vals, rows = stage_a(params, qids, shard)
        rows_h = np.asarray(rows)       # host readback, as the task does
        return rows_h + 1               # row -> 1-based passage id

    pids = run_a()
    t0 = time.time()
    for _ in range(args.iters):
        pids = run_a()
    a_ms = (time.time() - t0) / args.iters * 1000

    # stage B: C++ postprocess of the retrieved ids
    qt5 = rng.randint(5, 25000, size=(B, 64)).astype(np.int32)
    qlens = np.full(B, 24, np.int32)
    uids = -np.arange(1, B + 1)
    post = functools.partial(
        postprocess_retrieved, query_uids=uids, query_t5_ids=qt5,
        query_t5_lens=qlens, corpus=corpus, topk=K,
        retriever_seq_len=cfg.retriever.seq_len,
        reader_seq_len=cfg.reader.seq_len, cls_id=2, sep_id=3, pad_id=0)
    post(topk_passage_ids=pids)
    t0 = time.time()
    for _ in range(args.iters):
        post(topk_passage_ids=pids)
    b_ms = (time.time() - t0) / args.iters * 1000

    result = {
        "n_docs": args.n_docs, "batch": B, "topk": K,
        "stage_a_retrieve_ms": round(a_ms, 2),
        "stage_b_postprocess_ms": round(b_ms, 2),
        "world_setup_s": round(setup_s, 1),
    }
    if args.decode:
        result["decode"] = bench_decode(B, K)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
