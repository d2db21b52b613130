"""int8-stored cross-attention for the incremental decode token loop.

The KV-cached token loop is HBM-bandwidth-bound: at the flagship FiD shape
(K=50 contexts x 512 tokens = 25.6k keys, 12 decoder layers) every decode
step re-reads the whole precomputed cross-K/V slab — 3.8 GB in bf16 at
B=4 — and the measured ~6 ms/step sits near that read roofline (README
decode table). This module stores the slab in int8 with per-(batch, head,
key-row) scales and dequantizes INSIDE the kernel's VMEM working set, so
HBM only ever sees 1 byte/element.

What that buys, measured (r4): the slab's HBM *footprint* halves — which
is what lets decode coexist with the train state during training-time eval
and enables B=8 eval batches — while step LATENCY is parity with the bf16
path (230 vs 221 ms/32-token loop at B=4, within chip noise), not the 2x
the byte count alone would suggest: at hd=64 the per-head dequant converts
and the R=1-row matmuls cost roughly what the saved bytes buy back.
(Measured variants that did NOT help: feeding int8 operands straight to
the MXU dot — Mosaic materializes the bf16 copies anyway, scoped-VMEM OOM
at bigger head blocks; vectorizing the online-softmax across the head
block to use all 8 VPU sublanes — parity with the per-head loop.)

  - ``quantize_kv_rows``: [.., Lk, hd] -> (int8 rows, fp32 row scales).
    Symmetric per-row absmax quantization; the scale axis is the key row,
    so dequantization folds into the score columns (for K) and the prob
    columns (for V) — never into the [Lk, hd] slab itself.
  - ``decode_cross_attention_int8``: flash-style online-softmax attention
    (same structure as ops/fid_attention._fwd_kernel, minus dropout and the
    backward — generation is inference-only) reading int8 K/V chunks.
    Scores: s = (q @ k8^T) * (scale * kscale); context: acc += (p * vscale)
    @ v8 — both dequant multiplies act on [rows, chunk] temporaries, not on
    the big slab.

Accuracy: per-row absmax int8 keeps relative error ~0.4% on scores and on
the value rows; measured greedy decode token streams match the bf16 path
(tests/test_decode_int8.py pins argmax-equality on a tiny model and
tolerance on the attention output). The quantization is OPT-IN
(``--decode-kv-int8`` / ``DecoderSession(kv_quant="int8")``).

There is no reference counterpart: the reference re-runs its decoder over
the full prefix each step in fp16 (search_strategy.py:200-227).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024


DEFAULT_KEY_CHUNK = 3200


def padded_rows(Lk: int, key_chunk: int = DEFAULT_KEY_CHUNK) -> int:
    """Key-row count the quantized slab must be padded to so the kernel's
    chunking divides evenly: the next lane multiple (128) when one chunk
    covers everything, else the next ``key_chunk`` multiple. (25600 — the
    flagship K=50 x 512 — is already a 3200-multiple: zero padding.)"""
    if Lk <= key_chunk:
        return -(-Lk // 128) * 128
    return -(-Lk // key_chunk) * key_chunk


def quantize_kv_rows(x):
    """[..., Lk, hd] float -> (int8 [..., Lk, hd], fp32 scales [..., Lk]).

    Symmetric absmax per key row: x ~= x8 * scale[..., None]. All-zero rows
    (e.g. chunk padding) get scale 1 so the round-trip stays exactly zero.
    """
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)                      # [..., Lk]
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    x8 = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return x8, scale


def _pick_block_bh(nh: int, rows: int, chunk: int, hd: int) -> int:
    """Largest divisor of nh fitting the int8 working set in VMEM: per head
    a double-buffered int8 K + V chunk, the tiny q/out rows, the fp32
    score/prob temporaries, and the scale/bias vectors."""
    for bh in sorted((d for d in range(1, nh + 1) if nh % d == 0),
                     reverse=True):
        per = (bh * chunk * hd * 1 * 2 * 2          # k8+v8, double-buffered
               + bh * chunk * hd * 2 * 2            # their bf16 dequant
                                                    # copies (Mosaic holds
                                                    # both live per head —
                                                    # measured: omitting
                                                    # this line picks bh=12
                                                    # at the flagship shape
                                                    # and overflows scoped
                                                    # VMEM 19.35M > 16M)
               + bh * rows * hd * (2 + 4 * 2)       # q bf16 + out/acc fp32
               + bh * 4 * rows * chunk * 4          # s/p temporaries fp32
               + bh * chunk * 4 * 2 * 2)            # kscale/vscale blocks
        if per <= _VMEM_BUDGET:
            return bh
    return 1


def _int8_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
                 acc_ref, m_ref, l_ref, *, scale: float, block_bh: int):
    """One grid cell: ``block_bh`` (batch*head) slices x one int8 key chunk.

    Online-softmax accumulation across the (innermost, sequential) chunk
    axis, the structure of fid_attention._fwd_kernel; K/V arrive int8 and
    convert to the compute dtype HERE, on the VMEM-resident chunk."""
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    for g in range(block_bh):
        q = q_ref[g]                                   # [R, hd] bf16
        k = k_ref[g].astype(q.dtype)                   # [C, hd] int8 -> bf16
        v = v_ref[g].astype(q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # dequant on the [R, C] scores: column c scales by kscale[c]
        s = s * (ks_ref[g] * scale) + bias_ref[0]      # [R, C] * [1, C]

        m_prev = m_ref[g]                              # [R, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                         # [R, C]
        corr = jnp.exp(m_prev - m_new)
        l_ref[g] = l_ref[g] * corr + jnp.sum(p, axis=1, keepdims=True)
        # dequant V by folding vscale into the prob columns — [R, C] work
        # instead of scaling the [C, hd] chunk
        pv = (p * vs_ref[g]).astype(q.dtype)
        acc_ref[g] = acc_ref[g] * corr + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[g] = m_new

    @pl.when(j == n_chunks - 1)
    def _():
        for g in range(block_bh):
            l = l_ref[g]
            safe_l = jnp.where(l > 0, l, 1.0)          # fully-masked rows
            o_ref[g] = (acc_ref[g] / safe_l).astype(o_ref.dtype)


def decode_cross_attention_int8(q, k8, kscale, v8, vscale, kv_bias,
                                key_chunk: int = 3200,
                                interpret: Optional[bool] = None):
    """Flash decode attention over int8-stored K/V.

    q        [B, R, nh, hd]   query rows (R = beams x new tokens; bf16)
    k8, v8   [B, nh, Lk, hd]  int8 rows (``quantize_kv_rows`` layout, the
                              pre-headed order DecoderSession.cross_kvs emits)
    kscale,  [B, nh, Lk]      fp32 per-row scales
    vscale
    kv_bias  [B, Lk]          key-side additive bias (0 / -1e9 padding mask)
    -> [B, R, nh, hd] in q.dtype

    ``key_chunk`` defaults larger than the training kernels' (3200 vs 512):
    R is tiny here, so VMEM holds many keys per program, and fewer grid
    steps keep the per-program overhead off the HBM-read roofline.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, R, nh, hd = q.shape
    Lk = k8.shape[2]
    assert k8.shape == v8.shape == (B, nh, Lk, hd), (k8.shape, (B, nh, Lk, hd))
    assert kscale.shape == vscale.shape == (B, nh, Lk)
    assert kv_bias.shape == (B, Lk)
    key_chunk = min(key_chunk, Lk)
    assert Lk % key_chunk == 0, (
        f"Lk={Lk} must be a multiple of key_chunk={key_chunk}; pad the "
        "quantized slab (with -1e9 bias rows) at quantization time")
    n_chunks = Lk // key_chunk
    bbh = _pick_block_bh(nh, R, key_chunk, hd)
    grid = (B * nh // bbh, n_chunks)

    qt = q.transpose(0, 2, 1, 3).reshape(B * nh, R, hd)
    kt = k8.reshape(B * nh, Lk, hd)
    vt = v8.reshape(B * nh, Lk, hd)
    kst = kscale.reshape(B * nh, 1, Lk)
    vst = vscale.reshape(B * nh, 1, Lk)

    out = pl.pallas_call(
        functools.partial(_int8_kernel, scale=hd ** -0.5, block_bh=bbh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bbh, R, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((bbh, 1, key_chunk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((bbh, 1, key_chunk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, 1, key_chunk),
                         lambda b, j, _nh=nh, _bbh=bbh: (b * _bbh // _nh, 0, j)),
        ],
        out_specs=pl.BlockSpec((bbh, R, hd), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nh, R, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bbh, R, hd), jnp.float32),
            pltpu.VMEM((bbh, R, 1), jnp.float32),
            pltpu.VMEM((bbh, R, 1), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qt, kt, kst, vt, vst, kv_bias[:, None, :])
    return out.reshape(B, nh, R, hd).transpose(0, 2, 1, 3)


def decode_cross_attention_int8_sharded(q, k8, kscale, v8, vscale, kv_bias,
                                        mesh, key_chunk: int = 3200):
    """shard_mapped form: batch rows over dp, heads over tp (the same
    composition as the training kernels — pallas_call has no GSPMD rule, so
    calling it unwrapped under a multi-device jit would all-gather the
    whole slab; see ops/fid_attention.py's wrapper rationale)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp_ax, tp_ax = mesh.axis_names

    def _c(x, *axes):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*axes)))

    q = _c(q, dp_ax, None, tp_ax, None)
    k8 = _c(k8, dp_ax, tp_ax, None, None)
    v8 = _c(v8, dp_ax, tp_ax, None, None)
    kscale = _c(kscale, dp_ax, tp_ax, None)
    vscale = _c(vscale, dp_ax, tp_ax, None)
    kv_bias = _c(kv_bias, dp_ax, None)

    def local(q_l, k_l, ks_l, v_l, vs_l, b_l):
        return decode_cross_attention_int8(q_l, k_l, ks_l, v_l, vs_l, b_l,
                                           key_chunk)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dp_ax, None, tp_ax, None), P(dp_ax, tp_ax, None, None),
                  P(dp_ax, tp_ax, None), P(dp_ax, tp_ax, None, None),
                  P(dp_ax, tp_ax, None), P(dp_ax, None)),
        out_specs=P(dp_ax, None, tp_ax, None),
        check_vma=False)(q, k8, kscale, v8, vscale, kv_bias)


def decode_cross_attention_int8_on(mesh, q, k8, kscale, v8, vscale, kv_bias,
                                   key_chunk: int = 3200):
    """Mesh dispatcher (mirrors fid_attention's *_on entry points)."""
    if mesh is not None:
        return decode_cross_attention_int8_sharded(
            q, k8, kscale, v8, vscale, kv_bias, mesh, key_chunk)
    return decode_cross_attention_int8(q, k8, kscale, v8, vscale, kv_bias,
                                       key_chunk)


def decode_cross_attention_int8_reference(q, k8, kscale, v8, vscale, kv_bias):
    """Dense XLA reference (tests): dequantize outright, softmax, mix."""
    kf = k8.astype(jnp.float32) * kscale[..., None]        # [B, nh, Lk, hd]
    vf = v8.astype(jnp.float32) * vscale[..., None]
    qf = q.astype(jnp.float32) * (q.shape[-1] ** -0.5)
    s = jnp.einsum("brnd,bnkd->bnrk", qf, kf)
    s = s + kv_bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnrk,bnkd->brnd", p, vf).astype(q.dtype)
