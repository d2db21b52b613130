#!/usr/bin/env python
"""Headline benchmark: top-20 MIPS queries/sec/chip over the EMDR2 evidence
corpus scale (21M passages sharded over 16 chips -> 1.31M x 768 bf16 per
chip), plus the flagship train-step measurement (B=4/K=50/seq 512, flash
attention + remat) as supplementary keys.

Baseline target (BASELINE.md): >= 10,000 MIPS queries/sec/chip. The reference
has no published throughput numbers; 10k/s is the driver-provided north star.
The reference's hot path is the full train step (VERDICT r1, missing #6) —
``train_step`` reports ms/step, examples/s/chip, and hardware FLOPs
utilization (HLO flops incl. remat recompute / peak bf16 flops) for it.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "train_step": {...}}.
"""

import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# amortize the ~10 min flagship-step XLA compile across bench runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# hardware RNG for dropout masks — the CLI default (tasks/run.py --rng-impl);
# threefry mask generation alone costs ~133 ms of the flagship step
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from emdr2_tpu.config import IndexConfig
from emdr2_tpu.ops import mips_topk

BASELINE_QPS = 10_000.0
# TPU v5e (the bench chip): 197 TFLOP/s peak bf16
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12}


def bench_mips(on_cpu: bool):
    from emdr2_tpu.ops.mips import row_alignment

    cfg = IndexConfig()
    d, k, nq = cfg.embed_dim, 20, 512
    # per-chip shard of the 21M-passage corpus on a 16-chip system,
    # kernel-aligned as ShardedEvidenceIndex lays it out
    align = row_alignment(cfg.chunk_rows, cfg.group_size)
    n = ((21_015_324 // 16) // align) * align

    if on_cpu:  # smoke-scale fallback so the bench still runs anywhere
        n, nq = 8192, 64

    e = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (nq, d), jnp.bfloat16)

    # cands_per_group=2 (the training default): measured recall vs exact at
    # this shard scale is 1.000000 for k=20 and k=51 (BENCH notes r2) —
    # throughput below is for the exact-recall configuration.
    f = jax.jit(functools.partial(
        mips_topk, k=k, chunk_rows=cfg.chunk_rows, group_size=cfg.group_size,
        query_tile=cfg.query_tile, cands_per_group=cfg.cands_per_group,
        interpret=on_cpu))

    np.asarray(f(q, e)[0])  # compile + warmup, forced to completion

    iters = 5 if on_cpu else 20
    t0 = time.time()
    for _ in range(iters):
        out = f(q, e)
    np.asarray(out[0])  # drain the queue
    dt = (time.time() - t0) / iters

    # int8 index variant (--index-quantize int8): HALF the index HBM at
    # recall 1.000000 vs exact fp32 over the stored index — the default
    # exact re-rank (ops/mips.py `rescore`) scores the approximate winners
    # against the full-precision queries (BENCH notes r4)
    from emdr2_tpu.ops.mips import quantize_int8
    q8, scales = jax.jit(
        lambda x: quantize_int8(x.astype(jnp.float32), cfg.group_size))(e)
    f8 = jax.jit(functools.partial(
        mips_topk, k=k, chunk_rows=cfg.chunk_rows, group_size=cfg.group_size,
        query_tile=cfg.query_tile, cands_per_group=cfg.cands_per_group,
        interpret=on_cpu))
    np.asarray(f8(q, q8, shard_scales=scales)[0])
    t0 = time.time()
    for _ in range(iters):
        out = f8(q, q8, shard_scales=scales)
    np.asarray(out[0])
    int8_qps = nq / ((time.time() - t0) / iters)

    # int8 at k=51 — the flagship K=50+1 retrieval (trivial doc included,
    # tasks/e2eqa.py) — exercises the blocked two-stage re-rank window
    # selection (ops/mips.py _blocked_window_topk; VERDICT r4 weak #7)
    f51 = jax.jit(functools.partial(
        mips_topk, k=51, chunk_rows=cfg.chunk_rows, group_size=cfg.group_size,
        query_tile=cfg.query_tile, cands_per_group=cfg.cands_per_group,
        interpret=on_cpu))
    np.asarray(f51(q, q8, shard_scales=scales)[0])
    t0 = time.time()
    for _ in range(iters):
        out = f51(q, q8, shard_scales=scales)
    np.asarray(out[0])
    int8_k51_qps = nq / ((time.time() - t0) / iters)
    return nq / dt, int8_qps, int8_k51_qps


def flagship_step_config(B: int = 4, K: int = 50,
                         remat_policy: str = "nothing",
                         remat_towers: bool = False,
                         hidden_dropout: float = None,
                         attention_dropout: float = None):
    """The flagship NQ recipe exactly as examples/openqa/emdr2_nq.sh runs it:
    BERT-base retriever + T5-base FiD reader, seq 512/256/32, flash attention
    everywhere, bf16 compute / fp32 params+adam. Per-layer remat on the
    reader; the dual-encoder towers STORE their activations by default
    (``--no-remat-towers``): measured -51 ms/step for +1.55 GB temp HBM at
    this shape — the cheapest backward pass to buy back with the headroom
    the online-logsumexp teacher head freed (README remat-policy table).
    ``remat_towers=True`` restores full remat (the minimum-HBM layout)."""
    from emdr2_tpu.config import EMDR2Config

    drops = {}
    if hidden_dropout is not None:
        drops["hidden_dropout"] = hidden_dropout
    if attention_dropout is not None:
        drops["attention_dropout"] = attention_dropout
    cfg = EMDR2Config()
    return cfg.replace(
        retriever=dataclasses.replace(
            cfg.retriever,
            encoder=dataclasses.replace(cfg.retriever.encoder,
                                        remat=remat_towers,
                                        remat_policy=remat_policy,
                                        fid_flash_attention=True, **drops)),
        reader=dataclasses.replace(
            cfg.reader,
            transformer=dataclasses.replace(
                cfg.reader.transformer, remat=True,
                remat_policy=remat_policy,
                fid_flash_attention=True, **drops)),
        index=dataclasses.replace(cfg.index, topk=K),
    )


def make_flagship_step(B: int = 4, K: int = 50,
                       remat_policy: str = "nothing",
                       remat_towers: bool = False,
                       hidden_dropout: float = None,
                       attention_dropout: float = None):
    """(compiled_step, state, batch) for the flagship shape — shared by
    bench.py and warmup so the persistent compile cache always hits."""
    from emdr2_tpu.models import EMDR2Batch, EMDR2Model
    from emdr2_tpu.training import step as step_lib

    cfg = flagship_step_config(B, K, remat_policy, remat_towers,
                               hidden_dropout, attention_dropout)
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
        dec_ids=ids(B, Ld),
        labels=ids(B, Ld),
        loss_mask=jnp.ones((B, Ld), jnp.float32),
    )
    model = EMDR2Model(cfg)
    tx = step_lib.make_optimizer(cfg.train.optimizer, 10000)
    state = jax.jit(functools.partial(
        step_lib.create_train_state, model, batch, tx))(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    step_fn = jax.jit(step_lib.make_train_step(model, tx, cfg, eos_id=102),
                      donate_argnums=(0,))
    compiled = step_fn.lower(state, batch).compile()
    return compiled, state, batch


def layer_self_flops(S, H, F):
    """Matmul FLOPs of one self-attention transformer layer over S tokens:
    qkv + scores(QK) + mix(PV) + out + mlp(in+out). Shared by
    model_flops_per_step and tools/bench_step_breakdown (single source for
    the README roofline table)."""
    return 8 * S * H * H + 4 * S * S * H + 4 * S * H * F


def decoder_stack_flops(S, Lk, H, F, n_layers):
    """Self + cross-attention decoder stack over S tokens and Lk keys:
    cross = q/out projections + fused kv projection over Lk + QK/PV."""
    cross = (4 * S * H * H + 4 * Lk * H * H + 4 * S * Lk * H)
    return n_layers * (layer_self_flops(S, H, F) + cross)


def model_flops_per_step(cfg, B: int, K: int) -> float:
    """Analytic matmul FLOPs of one train step — the MODEL's useful work.

    ``hw_flops_util`` (HLO cost analysis of the compiled module) counts the
    remat recompute as work and overstates utilization; THIS number is what
    classic MFU is measured against. Counts fwd+2x-bwd for the
    gradient-carrying passes (query/context towers, FiD encoder, student
    decoder + LM head) and fwd only for the stop-gradient teacher
    (models/emdr2.py:150-152). Attention scores, projections, MLPs, and LM
    heads; embedding lookups/layernorms/softmaxes excluded (sub-1%).
    """
    enc = cfg.retriever.encoder
    t5 = cfg.reader.transformer
    Lq = cfg.retriever.query_seq_len
    Lc = cfg.retriever.seq_len
    Lr = cfg.reader.seq_len
    Ld = cfg.reader.decoder_seq_len

    layer_self = layer_self_flops
    decoder_stack = decoder_stack_flops

    def stack_self(S, H, F, n_layers):
        return n_layers * layer_self(S, H, F)

    He, Fe = enc.hidden_size, enc.ffn_size
    Ht, Ft = t5.hidden_size, t5.ffn_size
    V = t5.vocab_size

    query_tower = B * stack_self(Lq, He, Fe, enc.num_layers)
    ctx_tower = B * K * stack_self(Lc, He, Fe, enc.num_layers)
    fid_encoder = B * K * stack_self(Lr, Ht, Ft, t5.num_layers)
    student_dec = (B * decoder_stack(Ld, K * Lr, Ht, Ft, t5.num_layers)
                   + 2 * B * Ld * Ht * V)              # LM head
    teacher = (B * K * stack_self(Lr, Ht, Ft, t5.num_layers)      # encoder
               + B * K * decoder_stack(Ld, Lr, Ht, Ft, t5.num_layers)
               + 2 * B * K * Ld * Ht * V)
    grad_carrying = query_tower + ctx_tower + fid_encoder + student_dec
    return 3.0 * grad_carrying + 1.0 * teacher


def bench_train_step(B: int = 4, K: int = 50):
    compiled, state, batch = make_flagship_step(B, K)
    ca = compiled.cost_analysis()
    if not isinstance(ca, dict):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))

    state, m = compiled(state, batch)  # warmup
    np.asarray(m["loss"])
    # The steps chain through the donated train state, so one host fetch of
    # the last step's loss bounds the whole sequence. (block_until_ready is
    # not a reliable fence through the remote-device tunnel; an explicit
    # host transfer is.)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, m = compiled(state, batch)
    np.asarray(m["loss"])
    dt = (time.time() - t0) / iters

    kind = getattr(jax.devices()[0], "device_kind", "")
    peak = PEAK_FLOPS.get(kind)
    out = {
        "config": (f"B={B} K={K} seq512 flash bf16, reader remat + "
                   "towers stored (emdr2_nq.sh recipe)"),
        # measured 16 GB frontier (bench_train_sweep, BENCH_SWEEP.jsonl):
        # B=4/towers is optimal — B=5 compiles only under full remat and
        # loses per-example (2.67 vs 2.74 ex/s), B>=6 exceeds HBM
        "batch_frontier": "B=4 measured-best on 16 GB (see BENCH_SWEEP.jsonl)",
        "ms_per_step": round(dt * 1000, 1),
        "examples_per_sec_per_chip": round(B / dt, 2),
        "hlo_tflops_per_step": round(flops / 1e12, 1),
        "device": kind,
    }
    if peak is None:
        # unknown device: report the assumed peak so the utilization number
        # is interpretable rather than silently wrong
        peak = 197e12
        out["unknown_device_assumed_peak_tflops"] = peak / 1e12
    out["hw_flops_util"] = round(flops / dt / peak, 3)
    # classic MFU: analytic model FLOPs (no remat recompute) over peak
    mflops = model_flops_per_step(flagship_step_config(B, K), B, K)
    out["model_tflops_per_step"] = round(mflops / 1e12, 1)
    out["model_flops_util"] = round(mflops / dt / peak, 3)
    return out


def main():
    on_cpu = jax.default_backend() == "cpu"
    qps, int8_qps, int8_k51_qps = bench_mips(on_cpu)

    train = {"skipped": "cpu backend"}
    decode = {"skipped": "cpu backend"}
    if not on_cpu:
        try:
            train = bench_train_step()
        except Exception as e:  # never lose the headline number
            train = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            from emdr2_tpu.tools.bench_pipeline import bench_decode
            # greedy-only: the beam loop costs another long compile; its
            # number lives in `bench_pipeline --decode` (README table).
            # breakdown adds the encode/token-loop split + encode MFU for
            # the record at the cost of one extra warm-jit timing loop
            decode = bench_decode(4, 50, iters=3, include_beam=False,
                                  breakdown=True)
        except Exception as e:
            decode = {"error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps({
        "metric": "mips_top20_queries_per_sec_per_chip_21M",
        "value": round(qps, 1),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        # int8 index: half the HBM, exact re-ranked (recall 1.000000 vs
        # exact fp32 over the stored index, measured BENCH r4)
        "mips_int8_queries_per_sec_per_chip": round(int8_qps, 1),
        # k=51 = the flagship K=50+1 retrieval; blocked two-stage re-rank
        # window (recall 1.000000 vs exact over the stored rows, measured
        # by tools/bench_mips_rescore on the same shard scale)
        "mips_int8_k51_queries_per_sec_per_chip": round(int8_k51_qps, 1),
        "train_step": train,
        "decode": decode,
    }))


if __name__ == "__main__":
    main()
