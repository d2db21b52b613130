"""Sweep the flash-attention kernel tunables on real hardware.

The flagship step's two Pallas attention kernels have one first-order
tunable each:

- the FiD cross-attention kv-slab kernel chunks the 25,600-key axis by
  ``cfg.flash_key_chunk`` (default 512, ``config.TransformerConfig``);
- the fused-QKV self-attention slab kernel has no chunk (single-block L)
  but its per-grid-cell batch-row granularity interacts with Mosaic's
  pipelining, so we time it alongside as a regression canary.

This tool times fwd+bwd at the flagship shapes across chunk candidates and
prints one JSON line per configuration — run it on the TPU when picking a
new default:

    python -m emdr2_tpu.tools.bench_kernel_sweep [--iters 20]

(See README "Where the flagship step time goes" for how these kernels sit
inside the 1,351 ms step.)
"""

from __future__ import annotations

import argparse
import json
import time


def _time(fn, *args, iters: int, fetch):
    fn(*args)  # compile + warm
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--chunks", type=int, nargs="*",
                   default=[256, 512, 1024, 1600, 3200])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emdr2_tpu.ops.fid_attention import (fid_cross_attention,
                                             flash_self_attention)

    B, K = args.batch, args.topk
    L, nh, hd = 512, 12, 64
    H = nh * hd
    Lq, Lk = 32, K * L
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    def fetch(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    # ---- cross-attention kv-slab shape (decoder over K*512 keys) ----------
    q = jnp.asarray(rng.randn(B, Lq, nh, hd), dt)
    k = jnp.asarray(rng.randn(B, Lk, nh, hd), dt)
    v = jnp.asarray(rng.randn(B, Lk, nh, hd), dt)
    bias = jnp.zeros((B, Lk), jnp.float32)

    def make_fb(chunk):
        def loss(q, k, v):
            return fid_cross_attention(q, k, v, bias, None, chunk, None,
                                       0.0).astype(jnp.float32).sum()
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    results = []
    for chunk in args.chunks:
        if Lk % chunk:
            continue
        try:
            ms = _time(make_fb(chunk), q, k, v, iters=args.iters, fetch=fetch)
        except Exception as e:  # Mosaic allocation failures at big chunks
            results.append({"kernel": "cross", "key_chunk": chunk,
                            "error": str(e)[:120]})
            print(json.dumps(results[-1]), flush=True)
            continue
        results.append({"kernel": "cross", "key_chunk": chunk,
                        "fwd_bwd_ms": round(ms, 3)})
        print(json.dumps(results[-1]), flush=True)

    # ---- self-attention slab at the encoder shape --------------------------
    qkv = jnp.asarray(rng.randn(B * K, L, 3 * H), dt)
    sbias = jnp.zeros((B * K, L), jnp.float32)

    def sloss(qkv):
        return flash_self_attention(qkv, sbias, None, nh, None,
                                    0.0).astype(jnp.float32).sum()

    ms = _time(jax.jit(jax.value_and_grad(sloss)), qkv,
               iters=max(2, args.iters // 4), fetch=fetch)
    results.append({"kernel": "self_slab", "shape": f"{B*K}x{L}x{nh}h",
                    "fwd_bwd_ms": round(ms, 3)})
    print(json.dumps(results[-1]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
