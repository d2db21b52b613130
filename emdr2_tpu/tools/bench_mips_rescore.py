"""Measure the int8 large-k re-rank: recall + q/s at the 1.31M flagship shard.

The flagship K=50+1 retrieval sits on the k>20 side of the int8 path's
re-rank window, where the exact top-M=128 selection over the ~20k-column
candidate buffer cost 34% of throughput (30.2k q/s at k=51 vs 45.8k at
k=20, VERDICT r4 weak #7). ``_blocked_window_topk`` replaces that selection
with a two-stage blocked top-k; this tool measures, on the real chip at the
1.31M x 768 shard:

- recall of the full int8+re-rank search vs EXACT fp32 search over the
  stored (dequantized) rows, for k in {20, 51};
- q/s for the blocked selection vs the old exact-top-M selection.

Prints one JSON line per configuration.

    python -m emdr2_tpu.tools.bench_mips_rescore [--iters 20]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np


def exact_reference_ids(q, q8, scales, k, chunks=16):
    """Exact fp32 top-k over the STORED rows (dequantized int8) — the recall
    reference. Row-chunked so the [nq, N] score matrix never materializes."""
    nq = q.shape[0]
    n = q8.shape[0]
    step = n // chunks
    group = n // scales.shape[0]

    # q/q8/scales are explicit jit ARGS, not closure captures: a captured
    # concrete array lands in the jaxpr as a constvar and the ~1 GB int8
    # shard then rides along with the serialized HLO, which breaks the
    # remote-compile transport (observed: Broken pipe at this compile)
    @jax.jit
    def chunk_topk(qq, rows8, sc_all, lo, lo_sc):
        rows = jax.lax.dynamic_slice_in_dim(rows8, lo, step, 0)
        sc = jax.lax.dynamic_slice_in_dim(sc_all, lo_sc, step // group, 0)
        rows_f = rows.astype(jnp.float32) * jnp.repeat(sc, group)[:, None]
        s = jnp.einsum("qd,nd->qn", qq, rows_f,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(s, k)

    best_v = np.full((nq, k), -np.inf, np.float32)
    best_i = np.zeros((nq, k), np.int64)
    for c in range(chunks):
        v, i = chunk_topk(q, q8, scales, c * step, (c * step) // group)
        v, i = np.asarray(v), np.asarray(i, np.int64) + c * step
        av = np.concatenate([best_v, v], 1)
        ai = np.concatenate([best_i, i], 1)
        pos = np.argsort(-av, axis=1)[:, :k]
        best_v = np.take_along_axis(av, pos, 1)
        best_i = np.take_along_axis(ai, pos, 1)
    return best_i


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--nq", type=int, default=512)
    args = p.parse_args(argv)

    from emdr2_tpu.config import IndexConfig
    from emdr2_tpu.ops import mips
    from emdr2_tpu.ops.mips import mips_topk, quantize_int8, row_alignment

    cfg = IndexConfig()
    d = cfg.embed_dim
    align = row_alignment(cfg.chunk_rows, cfg.group_size)
    n = ((21_015_324 // 16) // align) * align

    e = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (args.nq, d), jnp.float32)
    q8, scales = jax.jit(
        lambda x: quantize_int8(x.astype(jnp.float32), cfg.group_size))(e)
    del e
    jax.block_until_ready((q8, scales))

    refs = {k: exact_reference_ids(q, q8, scales, k) for k in (20, 51)}

    blocked_impl = mips._blocked_window_topk
    variants = {
        "blocked": blocked_impl,
        "exact_topk": lambda cv, m, **kw: jax.lax.top_k(cv, m)[1],
    }
    for k in (20, 51):
        for name, impl in variants.items():
            mips._blocked_window_topk = impl
            f = jax.jit(functools.partial(
                mips_topk, k=k, chunk_rows=cfg.chunk_rows,
                group_size=cfg.group_size, query_tile=cfg.query_tile,
                cands_per_group=cfg.cands_per_group))
            vals, idx = f(q, q8, shard_scales=scales)
            idx_np = np.asarray(idx, np.int64)
            recall = float(np.mean([
                len(set(idx_np[i]) & set(refs[k][i])) / k
                for i in range(args.nq)]))
            t0 = time.time()
            for _ in range(args.iters):
                out = f(q, q8, shard_scales=scales)
            np.asarray(out[0])
            qps = args.nq / ((time.time() - t0) / args.iters)
            print(json.dumps({
                "k": k, "window_select": name,
                "recall_vs_exact_fp32_over_stored": round(recall, 6),
                "qps_per_chip": round(qps, 1),
                "n_rows": n,
            }), flush=True)
    mips._blocked_window_topk = blocked_impl


if __name__ == "__main__":
    main()
