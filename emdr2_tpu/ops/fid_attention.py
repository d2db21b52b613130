"""Flash-style attention kernels for the EMDR2 reader/retriever (Pallas,
custom VJP). Replaces the reference's materialized-score attention + CUDA
fused-softmax pair (``/root/reference/megatron/model/emdr2_model.py:148-183``,
``model/transformer.py:111-408``, ``megatron/fused_kernels/``); no
[Lq, Lk] score tensor ever reaches HBM, in forward or backward.

Three kernels, two production entry points:

1. ``flash_self_attention`` — **fused-QKV slab self-attention** for every
   padding-masked encoder (T5 encoder over B*K sequences, both BERT towers).
   Consumes the fused projection as a flat [B, L, 3H] slab (a free view of
   the ``FusedDense`` [B, L, 3, H] output; heads sliced in VMEM) and its
   VJP emits the combined dqkv slab: zero split/head-transpose relayouts.
   Single-key-chunk specialization — backward recomputes the row
   max/normalizer, nothing but (qkv, out) is saved.
2. ``flash_cross_attention`` — **kv-slab FiD cross-attention**: 32 decoder
   query positions over K*512 (up to 25,600) encoder positions, chunked with
   online softmax (saved per-head lse). Consumes the query [B, Lq, H] and
   fused key_value [B, Lk, 2H] projections; backward emits dq + the combined
   dkv slab (produced lanes-major and restored with one transpose — key-side
   grads contract over the tiny Lq, so [hd, Lk] is the only MXU-friendly
   output layout). The reference paid ~314 MB of fp32 scores per layer here
   and survived on activation checkpointing (SURVEY.md §5.7).
3. ``fid_cross_attention`` — the general [B, L, nh, hd] per-head form; the
   long-self-attention fallback (L > flash_key_chunk) and the independent
   implementation the slab kernels are tested against.

Masking is *key-side only* (kv_bias [B, Lk] fp32, 0 or -1e9): padded query
positions produce outputs that downstream consumers ignore (CLS readout,
key-masked cross-attention, loss masks) — parity holds at every consumed
position.

Attention dropout (``--attention-dropout``, reference transformer.py:283-332)
runs *inside* the kernels: the keep mask is a counter-based hash of
(seed, batch*head, chunk, row, col), so forward and backward regenerate the
exact same mask with no [Lq, Lk] materialization and no host RNG state.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(seed_ref, bh, rate: float, lq: int, c: int, j=None):
    """[lq, c] bool keep mask from a murmur3-style integer hash of
    (seed, batch*head index, chunk, row, col). Pure function of its
    coordinates, so the backward kernel regenerates the identical mask.
    Shares the finalizer/primes with PackedDropout (ops/hashing)."""
    from emdr2_tpu.ops.hashing import murmur_fin

    j = (pl.program_id(1) if j is None else j).astype(jnp.uint32)
    r = jax.lax.broadcasted_iota(jnp.uint32, (lq, c), 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, (lq, c), 1)
    x = (r * jnp.uint32(0x9E3779B1)) ^ (col * jnp.uint32(0x85EBCA77))
    x = x ^ (seed_ref[0].astype(jnp.uint32)
             + bh.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
             + j * jnp.uint32(0x165667B1))
    x = murmur_fin(x)
    return x >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale: float, rate: float,
                block_bh: int):
    """One grid cell: ``block_bh`` (batch*head) slices x one key chunk.

    Batching heads into one program amortizes grid-step overhead — the
    per-(b,h) variant ran 4800 programs of <1 us compute each at the FiD
    encoder shape and was grid-bound at ~22 TF/s."""
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    for g in range(block_bh):
        q = q_ref[g]                                 # [Lq, hd]
        k = k_ref[g]                                 # [C, hd]
        v = v_ref[g]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[0]                  # [Lq, C] + [1, C]

        m_prev = m_ref[g]                            # [Lq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                       # [Lq, C]
        corr = jnp.exp(m_prev - m_new)               # [Lq, 1]
        # normalizer l uses the UNdropped probs; dropout zeroes only the
        # value-accumulation term (softmax -> dropout -> @v ordering parity)
        l_ref[g] = l_ref[g] * corr + jnp.sum(p, axis=1, keepdims=True)
        if rate:
            bh = pl.program_id(0) * block_bh + g
            p_acc = jnp.where(_keep_mask(seed_ref, bh, rate, *p.shape), p, 0.0)
        else:
            p_acc = p
        acc_ref[g] = acc_ref[g] * corr + jax.lax.dot_general(
            p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[g] = m_new

    @pl.when(j == n_chunks - 1)
    def _():
        for g in range(block_bh):
            l = l_ref[g] * (1.0 - rate) if rate else l_ref[g]
            safe_l = jnp.where(l > 0, l, 1.0)        # fully-masked rows -> 0
            o_ref[g] = (acc_ref[g] / safe_l).astype(o_ref.dtype)
            lse_ref[g] = m_ref[g] + jnp.log(jnp.where(
                l_ref[g] > 0, l_ref[g], 1.0))


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                delta_ref, dq_ref, dk_ref, dv_ref, dq_acc,
                *, scale: float, rate: float, block_bh: int):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    for g in range(block_bh):
        q = q_ref[g]                                 # [Lq, hd]
        k = k_ref[g]                                 # [C, hd]
        v = v_ref[g]
        do = do_ref[g].astype(jnp.float32)           # [Lq, hd]
        lse = lse_ref[g]                             # [Lq, 1]
        delta = delta_ref[g]                         # [Lq, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[0]
        p = jnp.exp(s - lse)                         # [Lq, C] normalized

        if rate:
            bh = pl.program_id(0) * block_bh + g
            keep = _keep_mask(seed_ref, bh, rate, *p.shape)
            inv_keep = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p, 0.0) * inv_keep  # dropped probs P_d
        else:
            pd = p

        # Key-side gradients are produced TRANSPOSED ([hd, C], keys in
        # lanes): contracting over the tiny Lq dim with Lk-major outputs is
        # a pathological layout on the MXU — measured ~100x slower both here
        # and in plain XLA. The caller transposes the result once.
        # dv^T_c = do^T @ P_d
        dv_ref[g] = jax.lax.dot_general(
            do, pd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dP_d = do @ v^T ; dP = keep * dP_d / (1-rate) ; ds = P*(dP - delta)
        # (delta = rowsum(do * out) = rowsum(P_d * dP_d), valid with dropout)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate:
            dp = jnp.where(keep, dp, 0.0) * inv_keep
        ds = p * (dp - delta)                        # [Lq, C]
        # dk^T_c = q^T @ ds * scale
        dk_ref[g] = (jax.lax.dot_general(
            q.astype(jnp.float32), ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        # dq += ds @ k * scale
        dq_acc[g] = dq_acc[g] + jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(j == n_chunks - 1)
    def _():
        for g in range(block_bh):
            dq_ref[g] = dq_acc[g].astype(dq_ref.dtype)


def _prep(q, k, v, kv_bias, key_chunk):
    B, Lq, nh, hd = q.shape
    Lk = k.shape[1]
    assert k.shape == v.shape == (B, Lk, nh, hd)
    assert kv_bias.shape == (B, Lk)
    assert Lk % key_chunk == 0, (Lk, key_chunk)
    # [B, L, nh, hd] -> [B*nh, L, hd]
    qt = q.transpose(0, 2, 1, 3).reshape(B * nh, Lq, hd)
    kt = k.transpose(0, 2, 1, 3).reshape(B * nh, Lk, hd)
    vt = v.transpose(0, 2, 1, 3).reshape(B * nh, Lk, hd)
    return qt, kt, vt, B, Lq, Lk, nh, hd


_VMEM_BUDGET = 11 * 1024 * 1024


def _pick_block_bh(nh: int, Lq: int, chunk: int, hd: int, itemsize: int,
                   n_bufs: int, n_temps: int) -> int:
    """Largest divisor of nh whose VMEM working set fits the budget.

    Divisibility keeps every (batch*head) block inside ONE batch row, so the
    per-batch kv_bias block is constant across the block (see the bias index
    map). ``n_bufs``: double-buffered [*, hd] tensors in the kernel (q/k/v/
    out for fwd; q/k/v/do/dq/dk/dv for bwd). ``n_temps``: live [Lq, C] fp32
    temporaries per head iteration (s/p for fwd; s/p/dp/ds for bwd) — Mosaic
    only partially reuses them across the unrolled head loop, so they also
    bound the block (measured: the bwd kernel at 6 heads x 4 temps fails to
    allocate, 3 x 4 compiles).
    """
    for bh in sorted((d for d in range(1, nh + 1) if nh % d == 0),
                     reverse=True):
        if n_temps * bh > 12:
            continue
        per = bh * (Lq + chunk) * hd * itemsize * n_bufs \
            + bh * Lq * hd * 4 * 2     # fp32 accumulator scratch
        temp = n_temps * Lq * chunk * 4
        if per + temp <= _VMEM_BUDGET:
            return bh
    # A single head overflows the PLANNING budget, which is deliberately
    # conservative (11 MB) vs the vmem_limit_bytes the kernels actually
    # compile with (64-96 MB) — Mosaic also spills some temporaries. Let
    # bh=1 through and leave the final verdict to the Mosaic allocator
    # unless the working set exceeds the real compile-time limit, where an
    # opaque allocation error is certain: fail there with a shape-contract
    # message instead.
    per1 = (Lq + chunk) * hd * itemsize * n_bufs + Lq * hd * 4 * 2
    temp1 = n_temps * Lq * chunk * 4
    if per1 + temp1 > 48 * 1024 * 1024:
        raise ValueError(
            f"flash-attention working set for one head (Lq={Lq}, "
            f"key_chunk={chunk}, hd={hd}) cannot fit VMEM "
            f"({per1 + temp1} B needed); reduce the key chunk "
            f"(cfg.flash_key_chunk) or fall back to materialized attention")
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fid_cross_attention(q, k, v, kv_bias, seed=None, key_chunk: int = 512,
                        interpret: Optional[bool] = None,
                        dropout_rate: float = 0.0):
    """Returns [B, Lq, nh, hd]; differentiable w.r.t. q, k, v.

    ``seed``: uint32 scalar array feeding the in-kernel dropout mask; ignored
    (may be None) when ``dropout_rate`` == 0.
    """
    out, _ = _fid_fwd(q, k, v, kv_bias, seed, key_chunk, interpret,
                      dropout_rate)
    return out


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.uint32)
    return jnp.asarray(seed, jnp.uint32).reshape((1,))


def _fid_forward(q, k, v, kv_bias, seed, key_chunk, interpret, rate):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    qt, kt, vt, B, Lq, Lk, nh, hd = _prep(q, k, v, kv_bias, key_chunk)
    scale = hd ** -0.5
    n_chunks = Lk // key_chunk
    bbh = _pick_block_bh(nh, Lq, key_chunk, hd, q.dtype.itemsize,
                         n_bufs=4, n_temps=2)
    grid = (B * nh // bbh, n_chunks)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, block_bh=bbh),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bbh, Lq, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, key_chunk),
                         lambda b, j, _nh=nh, _bbh=bbh: (b * _bbh // _nh, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((bbh, Lq, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, Lq, 1), lambda b, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nh, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * nh, Lq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bbh, Lq, hd), jnp.float32),
            pltpu.VMEM((bbh, Lq, 1), jnp.float32),
            pltpu.VMEM((bbh, Lq, 1), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(_seed_arr(seed), qt, kt, vt, kv_bias[:, None, :])
    return out, lse


def _fid_fwd(q, k, v, kv_bias, seed, key_chunk, interpret, rate):
    out, lse = _fid_forward(q, k, v, kv_bias, seed, key_chunk, interpret,
                            rate)
    B, Lq, nh, hd = q.shape
    out_b = out.reshape(B, nh, Lq, hd).transpose(0, 2, 1, 3)
    return out_b, (q, k, v, kv_bias, seed, out_b, lse)


def _fid_bwd(key_chunk, interpret, rate, res, g):
    q, k, v, kv_bias, seed, out, lse = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    qt, kt, vt, B, Lq, Lk, nh, hd = _prep(q, k, v, kv_bias, key_chunk)
    gt = g.transpose(0, 2, 1, 3).reshape(B * nh, Lq, hd)
    ot = out.transpose(0, 2, 1, 3).reshape(B * nh, Lq, hd)
    delta = jnp.sum(gt.astype(jnp.float32) * ot.astype(jnp.float32),
                    axis=-1, keepdims=True)          # [BH, Lq, 1]
    scale = hd ** -0.5
    n_chunks = Lk // key_chunk
    bbh = _pick_block_bh(nh, Lq, key_chunk, hd, q.dtype.itemsize,
                         n_bufs=7, n_temps=4)
    grid = (B * nh // bbh, n_chunks)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, block_bh=bbh),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bbh, Lq, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((bbh, key_chunk, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, key_chunk),
                         lambda b, j, _nh=nh, _bbh=bbh: (b * _bbh // _nh, 0, j)),
            pl.BlockSpec((bbh, Lq, 1), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, Lq, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, Lq, 1), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bbh, Lq, hd), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bbh, hd, key_chunk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((bbh, hd, key_chunk), lambda b, j: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nh, Lq, hd), q.dtype),
            jax.ShapeDtypeStruct((B * nh, hd, Lk), k.dtype),   # transposed
            jax.ShapeDtypeStruct((B * nh, hd, Lk), v.dtype),   # transposed
        ],
        scratch_shapes=[pltpu.VMEM((bbh, Lq, hd), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(_seed_arr(seed), qt, kt, vt, kv_bias[:, None, :], lse, gt, delta)

    dq = dq.reshape(B, nh, Lq, hd).transpose(0, 2, 1, 3)
    # dk/dv arrive as [BH, hd, Lk]; one XLA transpose back to [B, Lk, nh, hd]
    dk = dk.reshape(B, nh, hd, Lk).transpose(0, 3, 1, 2)
    dv = dv.reshape(B, nh, hd, Lk).transpose(0, 3, 1, 2)
    return dq, dk, dv, None, None


fid_cross_attention.defvjp(_fid_fwd, _fid_bwd)


# --------------------------------------------------------------------------
# Fused-QKV self-attention slab kernel.
#
# The general kernel's [B, L, nh, hd] contract forces split + head-transpose
# relayouts of the fused QKV projection on every call — profiled at ~16% of
# the flagship train step (split 127 ms + transpose 125 ms + reshape 62 ms
# per step, counted across forward, remat recompute, and backward). This
# kernel consumes the Dense(3H) output [B, L, 3H] DIRECTLY: heads are sliced
# out of the slab in VMEM, and the backward pass emits the combined dqkv
# gradient slab [B, L, 3H] — exactly the cotangent the projection's VJP
# wants. Zero HBM relayouts in either direction.
#
# Self-attention specific simplifications vs the general kernel:
# - single key chunk (Lk == Lq == L <= flash_key_chunk for every encoder in
#   the model), so no online accumulation and no saved lse: the backward
#   kernel recomputes the row max/normalizer in-register;
# - dk/dv contract over L (512), not the tiny decoder Lq, so key-side grads
#   come out in natural [L, hd] layout — no transposed-output trick.
# --------------------------------------------------------------------------


def _self_fwd_kernel(seed_ref, qkv_ref, bias_ref, o_ref,
                     *, scale: float, rate: float, nh: int, hd: int):
    slab = qkv_ref[0]                                # [L, 3H]
    bias = bias_ref[0]                               # [1, L]
    H = nh * hd
    b = pl.program_id(0)
    outs = []
    for h in range(nh):
        q = slab[:, h * hd:(h + 1) * hd]
        k = slab[:, H + h * hd:H + (h + 1) * hd]
        v = slab[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias                         # [L, L]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if rate:
            keep = _keep_mask(seed_ref, b * nh + h, rate, *p.shape,
                              j=jnp.uint32(0))
            pd = jnp.where(keep, p, 0.0)
            l_eff = l * (1.0 - rate)
        else:
            pd, l_eff = p, l
        safe = jnp.where(l_eff > 0, l_eff, 1.0)
        outs.append((jax.lax.dot_general(
            pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / safe).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def _self_bwd_kernel(seed_ref, qkv_ref, bias_ref, o_ref, do_ref, dqkv_ref,
                     *, scale: float, rate: float, nh: int, hd: int):
    slab = qkv_ref[0]                                # [L, 3H]
    bias = bias_ref[0]
    out = o_ref[0]
    do = do_ref[0].astype(jnp.float32)
    H = nh * hd
    b = pl.program_id(0)
    dqs, dks, dvs = [], [], []
    for h in range(nh):
        q = slab[:, h * hd:(h + 1) * hd]
        k = slab[:, H + h * hd:H + (h + 1) * hd]
        v = slab[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        out_h = out[:, h * hd:(h + 1) * hd].astype(jnp.float32)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        inv_l = 1.0 / jnp.where(l > 0, l, 1.0)
        P = p * inv_l                                # normalized probs

        delta = jnp.sum(do_h * out_h, axis=1, keepdims=True)   # [L, 1]
        # dP_d = do @ v^T ; dP = keep * dP_d / (1-rate)
        dp = jax.lax.dot_general(do_h, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate:
            keep = _keep_mask(seed_ref, b * nh + h, rate, *p.shape,
                              j=jnp.uint32(0))
            inv_keep = 1.0 / (1.0 - rate)
            dp = jnp.where(keep, dp, 0.0) * inv_keep
            Pd = jnp.where(keep, P, 0.0) * inv_keep  # dropped probs
        else:
            Pd = P
        ds = P * (dp - delta)                        # [L, L]
        dqs.append((jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ).astype(dqkv_ref.dtype))
        # contract over the query rows (L) -> natural [L, hd] layout
        dks.append((jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ).astype(dqkv_ref.dtype))
        dvs.append(jax.lax.dot_general(
            Pd, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype))
    dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_self_attention(qkv, kv_bias, seed=None, nh: int = 12,
                         interpret: Optional[bool] = None,
                         dropout_rate: float = 0.0):
    """Padding-masked self-attention on a fused QKV slab.

    qkv [B, L, 3H] (the Dense(3*H) output, features ordered [q | k | v]),
    kv_bias [B, L] fp32 key-side additive bias. Returns [B, L, H];
    differentiable w.r.t. qkv (the VJP emits the combined dqkv slab).
    Requires L <= the VMEM-friendly single-chunk size (every encoder in the
    model: 512/256/64); use ``fid_cross_attention`` otherwise.
    """
    out, _ = _self_fwd(qkv, kv_bias, seed, nh, interpret, dropout_rate)
    return out


def _self_fwd(qkv, kv_bias, seed, nh, interpret, rate):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, L, H3 = qkv.shape
    assert H3 % (3 * nh) == 0, (H3, nh)
    H = H3 // 3
    hd = H // nh
    assert kv_bias.shape == (B, L)
    scale = hd ** -0.5

    out = pl.pallas_call(
        functools.partial(_self_fwd_kernel, scale=scale, rate=rate,
                          nh=nh, hd=hd),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, H3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), qkv.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the unrolled head loop keeps several [L, L] fp32 temporaries
            # live; the default 16M scoped-vmem budget is too small at L=512
            vmem_limit_bytes=int(64e6)),
        interpret=interpret,
    )(_seed_arr(seed), qkv, kv_bias[:, None, :])
    return out, (qkv, kv_bias, seed, out)


def _self_bwd(nh, interpret, rate, res, g):
    qkv, kv_bias, seed, out = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, L, H3 = qkv.shape
    H = H3 // 3
    hd = H // nh
    scale = hd ** -0.5

    dqkv = pl.pallas_call(
        functools.partial(_self_bwd_kernel, scale=scale, rate=rate,
                          nh=nh, hd=hd),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, H3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H3), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H3), qkv.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(96e6)),
        interpret=interpret,
    )(_seed_arr(seed), qkv, kv_bias[:, None, :], out, g)
    return dqkv, None, None


flash_self_attention.defvjp(_self_fwd, _self_bwd)


# --------------------------------------------------------------------------
# Cross-attention kv-slab kernel.
#
# Same slab idea for FiD decoder cross-attention: the query projection
# [B, Lq, H] and the fused key/value projection [B, Lk, 2H] are consumed
# directly (heads sliced in VMEM), chunked along the (up to 25,600-key) Lk
# axis with online softmax. The backward emits dq [B, Lq, H] plus the
# combined dkv slab TRANSPOSED as [B, 2H, Lk] — key-side grads contract over
# the tiny Lq, so lane-major-keys is the only MXU-friendly layout (see the
# general kernel's note); the caller pays ONE transpose back instead of the
# split + 4 head-transposes of the [B, Lk, nh, hd] contract.
# --------------------------------------------------------------------------


def _xslab_fwd_kernel(seed_ref, q_ref, kv_ref, bias_ref, o_ref, lse_ref,
                      acc_ref, m_ref, l_ref,
                      *, scale: float, rate: float, nh: int, hd: int):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    b = pl.program_id(0)
    H = nh * hd

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    qs = q_ref[0]                                    # [Lq, H]
    kvs = kv_ref[0]                                  # [C, 2H]
    bias = bias_ref[0]                               # [1, C]
    for h in range(nh):
        q = qs[:, h * hd:(h + 1) * hd]
        k = kvs[:, h * hd:(h + 1) * hd]
        v = kvs[:, H + h * hd:H + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias                         # [Lq, C]
        m_prev = m_ref[h]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=1, keepdims=True)
        if rate:
            keep = _keep_mask(seed_ref, b * nh + h, rate, *p.shape)
            p = jnp.where(keep, p, 0.0)
        acc_ref[h] = acc_ref[h] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    @pl.when(j == n_chunks - 1)
    def _():
        outs, lses = [], []
        for h in range(nh):
            l = l_ref[h] * (1.0 - rate) if rate else l_ref[h]
            safe_l = jnp.where(l > 0, l, 1.0)
            outs.append((acc_ref[h] / safe_l).astype(o_ref.dtype))
            lses.append(m_ref[h] + jnp.log(jnp.where(
                l_ref[h] > 0, l_ref[h], 1.0)))
        o_ref[0] = jnp.concatenate(outs, axis=1)     # [Lq, H]
        lse_ref[0] = jnp.concatenate(lses, axis=1)   # [Lq, nh]


def _xslab_bwd_kernel(seed_ref, q_ref, kv_ref, bias_ref, lse_ref, o_ref,
                      do_ref, dq_ref, dkv_ref, dq_acc,
                      *, scale: float, rate: float, nh: int, hd: int):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    b = pl.program_id(0)
    H = nh * hd

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qs = q_ref[0]                                    # [Lq, H]
    kvs = kv_ref[0]                                  # [C, 2H]
    bias = bias_ref[0]
    out = o_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                 # [Lq, nh]
    dk_ts, dv_ts = [], []
    for h in range(nh):
        q = qs[:, h * hd:(h + 1) * hd]
        k = kvs[:, h * hd:(h + 1) * hd]
        v = kvs[:, H + h * hd:H + (h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        out_h = out[:, h * hd:(h + 1) * hd].astype(jnp.float32)
        lse_h = lse[:, h:h + 1]                      # [Lq, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
        p = jnp.exp(s - lse_h)                       # normalized probs
        delta = jnp.sum(do_h * out_h, axis=1, keepdims=True)
        dp = jax.lax.dot_general(do_h, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate:
            keep = _keep_mask(seed_ref, b * nh + h, rate, *p.shape)
            inv_keep = 1.0 / (1.0 - rate)
            dp = jnp.where(keep, dp, 0.0) * inv_keep
            pd = jnp.where(keep, p, 0.0) * inv_keep
        else:
            pd = p
        ds = p * (dp - delta)                        # [Lq, C]
        dq_acc[h] = dq_acc[h] + jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # transposed key-side grads: [hd, C]
        dk_ts.append((jax.lax.dot_general(
            q.astype(jnp.float32), ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ).astype(dkv_ref.dtype))
        dv_ts.append(jax.lax.dot_general(
            do_h, pd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dkv_ref.dtype))
    dkv_ref[0] = jnp.concatenate(dk_ts + dv_ts, axis=0)   # [2H, C]

    @pl.when(j == n_chunks - 1)
    def _():
        dq_ref[0] = jnp.concatenate(
            [dq_acc[h] for h in range(nh)], axis=1).astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_cross_attention(q, kv, kv_bias, seed=None, nh: int = 12,
                          key_chunk: int = 512,
                          interpret: Optional[bool] = None,
                          dropout_rate: float = 0.0):
    """FiD cross-attention on projection slabs.

    q [B, Lq, H] (the query Dense output), kv [B, Lk, 2H] (the fused
    key_value Dense output, features ordered [k | v]), kv_bias [B, Lk].
    Returns [B, Lq, H]; differentiable w.r.t. q and kv (the VJP emits dq and
    the combined dkv slab).
    """
    out, _ = _xslab_fwd(q, kv, kv_bias, seed, nh, key_chunk, interpret,
                        dropout_rate)
    return out


def _xslab_forward(q, kv, kv_bias, seed, nh, key_chunk, interpret, rate):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Lq, H = q.shape
    Lk = kv.shape[1]
    assert kv.shape == (B, Lk, 2 * H)
    assert kv_bias.shape == (B, Lk)
    assert Lk % key_chunk == 0, (Lk, key_chunk)
    hd = H // nh
    scale = hd ** -0.5
    n_chunks = Lk // key_chunk

    out, lse = pl.pallas_call(
        functools.partial(_xslab_fwd_kernel, scale=scale, rate=rate,
                          nh=nh, hd=hd),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, key_chunk, 2 * H), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, key_chunk), lambda b, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lq, nh), lambda b, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, H), q.dtype),
            jax.ShapeDtypeStruct((B, Lq, nh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nh, Lq, hd), jnp.float32),
            pltpu.VMEM((nh, Lq, 1), jnp.float32),
            pltpu.VMEM((nh, Lq, 1), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(64e6)),
        interpret=interpret,
    )(_seed_arr(seed), q, kv, kv_bias[:, None, :])
    return out, lse


def _xslab_fwd(q, kv, kv_bias, seed, nh, key_chunk, interpret, rate):
    out, lse = _xslab_forward(q, kv, kv_bias, seed, nh, key_chunk,
                              interpret, rate)
    return out, (q, kv, kv_bias, seed, out, lse)


def _xslab_bwd(nh, key_chunk, interpret, rate, res, g):
    q, kv, kv_bias, seed, out, lse = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Lq, H = q.shape
    Lk = kv.shape[1]
    hd = H // nh
    scale = hd ** -0.5
    n_chunks = Lk // key_chunk

    dq, dkv_t = pl.pallas_call(
        functools.partial(_xslab_bwd_kernel, scale=scale, rate=rate,
                          nh=nh, hd=hd),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, key_chunk, 2 * H), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, key_chunk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, Lq, nh), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lq, H), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 2 * H, key_chunk), lambda b, j: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, H), q.dtype),
            jax.ShapeDtypeStruct((B, 2 * H, Lk), kv.dtype),   # transposed
        ],
        scratch_shapes=[pltpu.VMEM((nh, Lq, hd), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(96e6)),
        interpret=interpret,
    )(_seed_arr(seed), q, kv, kv_bias[:, None, :], lse, out, g)
    # one transpose back to the projection-VJP layout
    dkv = jnp.swapaxes(dkv_t, 1, 2)
    return dq, dkv, None, None


flash_cross_attention.defvjp(_xslab_fwd, _xslab_bwd)


def fid_cross_attention_reference(q, k, v, kv_bias):
    """Plain-XLA reference with identical semantics (tests + fallback)."""
    hd = q.shape[-1]
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = s + kv_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------- sharding
#
# ``pallas_call`` has no GSPMD partitioning rule: called unwrapped inside a
# jit over a multi-device mesh, the SPMD partitioner replicates its operands
# — an all-gather of the WHOLE global qkv/kv slab onto every device, erasing
# both dp and tp sharding for the attention block. These wrappers shard_map
# the kernels over the mesh instead (the composition JAX prescribes for
# Pallas): batch rows over dp, heads over tp, each shard running the kernel
# on its own [rows/dp, L, ...] x [nh/tp] slice — the zero-gather head-sharded
# attention of the Megatron TP design (ref mpu/layers.py:170-363), expressed
# as shardings instead of process groups.
#
# Head slicing on the slabs: the fused projections come in as [.., n, H]
# (``layers.FusedDense``) with the H axis head-sharded over tp at the
# SOURCE — a tp shard holds a self-contained [q_h | k_h | v_h] sub-slab for
# its nh/tp heads, so the constraint below matches the natural projection
# output sharding and inserts no collective at all (a flat Dense(n*H)
# layout tp-shards across the q/k/v boundary and would force a per-layer
# feature all-gather here).


def _shard_seed(seed, axis_names):
    """Decorrelate in-kernel dropout masks across shards: the kernel hashes
    LOCAL (batch*head) indices, which repeat on every shard."""
    s = seed
    for i, ax in enumerate(axis_names):
        mult = jnp.uint32(0x9E3779B1 if i % 2 == 0 else 0x85EBCA77)
        s = s + jax.lax.axis_index(ax).astype(jnp.uint32) * mult
    return s


def _constrain(x, mesh, *axes):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*axes)))


def flash_self_attention_sharded(qkv4, kv_bias, seed, nh, mesh,
                                 dropout_rate: float = 0.0):
    """``flash_self_attention`` shard_mapped over ``mesh``: rows over dp,
    heads over tp. qkv4 [B, L, 3, H] (FusedDense layout) -> [B, L, H] with
    the H axis tp-sharded (feeds the row-parallel output projection with no
    further resharding). Caller guarantees B % dp == 0 and nh % tp == 0."""
    from jax.sharding import PartitionSpec as P
    dp_ax, tp_ax = mesh.axis_names
    tp = mesh.shape[tp_ax]
    B, L, _, H = qkv4.shape
    nh_local = nh // tp
    qkv4 = _constrain(qkv4, mesh, dp_ax, None, None, tp_ax)
    kv_bias = _constrain(kv_bias, mesh, dp_ax, None)
    seed_arr = _seed_arr(seed)

    def local(qkv4_l, bias_l, seed_l):
        slab = qkv4_l.reshape(qkv4_l.shape[0], L, 3 * qkv4_l.shape[-1])
        s = (None if dropout_rate == 0.0
             else _shard_seed(seed_l, (dp_ax, tp_ax)))
        return flash_self_attention(slab, bias_l, s, nh_local, None,
                                    dropout_rate)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dp_ax, None, None, tp_ax), P(dp_ax, None), P()),
        out_specs=P(dp_ax, None, tp_ax),
        check_vma=False)(qkv4, kv_bias, seed_arr)


def flash_cross_attention_sharded(q, kv4, kv_bias, seed, nh, mesh,
                                  key_chunk: int = 512,
                                  dropout_rate: float = 0.0):
    """``flash_cross_attention`` shard_mapped over ``mesh``. q [B, Lq, H]
    (head-major: tp-shardable on its last axis), kv4 [B, Lk, 2, H]
    (FusedDense layout); returns [B, Lq, H] with H tp-sharded."""
    from jax.sharding import PartitionSpec as P
    dp_ax, tp_ax = mesh.axis_names
    tp = mesh.shape[tp_ax]
    Lk = kv4.shape[1]
    nh_local = nh // tp
    q = _constrain(q, mesh, dp_ax, None, tp_ax)
    kv4 = _constrain(kv4, mesh, dp_ax, None, None, tp_ax)
    kv_bias = _constrain(kv_bias, mesh, dp_ax, None)
    seed_arr = _seed_arr(seed)

    def local(q_l, kv4_l, bias_l, seed_l):
        slab = kv4_l.reshape(kv4_l.shape[0], Lk, 2 * kv4_l.shape[-1])
        s = (None if dropout_rate == 0.0
             else _shard_seed(seed_l, (dp_ax, tp_ax)))
        return flash_cross_attention(q_l, slab, bias_l, s, nh_local,
                                     key_chunk, None, dropout_rate)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dp_ax, None, tp_ax), P(dp_ax, None, None, tp_ax),
                  P(dp_ax, None), P()),
        out_specs=P(dp_ax, None, tp_ax),
        check_vma=False)(q, kv4, kv_bias, seed_arr)


def fid_cross_attention_sharded(q, k, v, kv_bias, seed, mesh,
                                key_chunk: int = 512,
                                dropout_rate: float = 0.0):
    """``fid_cross_attention`` (general per-head form) shard_mapped over
    ``mesh``: rows over dp, the nh axis over tp. q/k/v [B, L, nh, hd] ->
    [B, Lq, nh, hd] with nh tp-sharded."""
    from jax.sharding import PartitionSpec as P
    dp_ax, tp_ax = mesh.axis_names
    q = _constrain(q, mesh, dp_ax, None, tp_ax, None)
    k = _constrain(k, mesh, dp_ax, None, tp_ax, None)
    v = _constrain(v, mesh, dp_ax, None, tp_ax, None)
    kv_bias = _constrain(kv_bias, mesh, dp_ax, None)
    seed_arr = _seed_arr(seed)

    def local(q_l, k_l, v_l, bias_l, seed_l):
        s = (None if dropout_rate == 0.0
             else _shard_seed(seed_l, (dp_ax, tp_ax)))
        return fid_cross_attention(q_l, k_l, v_l, bias_l, s, key_chunk,
                                   None, dropout_rate)

    spec = P(dp_ax, None, tp_ax, None)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, P(dp_ax, None), P()),
        out_specs=spec,
        check_vma=False)(q, k, v, kv_bias, seed_arr)


# ---- mesh dispatchers --------------------------------------------------------
# Single entry points selecting the shard_mapped or plain kernel form, so
# model code (models/layers.py Attention) carries ONE call per site instead
# of repeating the mesh-or-not branch + slab reshape at every site. A new
# call site that forgets the sharded form would silently reintroduce the
# whole-slab all-gather these wrappers exist to prevent — routing the
# choice here makes that impossible.

def flash_self_attention_on(mesh, qkv4, kv_bias, seed, nh,
                            dropout_rate: float = 0.0):
    """Fused-QKV self-attention slab kernel; ``mesh=None`` = single-device
    form. qkv4 [B, L, 3, H] (FusedDense layout) -> [B, L, H]."""
    if mesh is not None:
        return flash_self_attention_sharded(qkv4, kv_bias, seed, nh, mesh,
                                            dropout_rate)
    slab = qkv4.reshape(qkv4.shape[:-2] + (3 * qkv4.shape[-1],))
    return flash_self_attention(slab, kv_bias, seed, nh, None, dropout_rate)


def flash_cross_attention_on(mesh, q, kv4, kv_bias, seed, nh,
                             key_chunk: int = 512,
                             dropout_rate: float = 0.0):
    """kv-slab cross-attention kernel; ``mesh=None`` = single-device form.
    q [B, Lq, H], kv4 [B, Lk, 2, H] -> [B, Lq, H]."""
    if mesh is not None:
        return flash_cross_attention_sharded(q, kv4, kv_bias, seed, nh,
                                             mesh, key_chunk, dropout_rate)
    slab = kv4.reshape(kv4.shape[:-2] + (2 * kv4.shape[-1],))
    return flash_cross_attention(q, slab, kv_bias, seed, nh, key_chunk,
                                 None, dropout_rate)


def fid_cross_attention_on(mesh, q, k, v, kv_bias, seed,
                           key_chunk: int = 512,
                           dropout_rate: float = 0.0):
    """General per-head flash attention; ``mesh=None`` = single-device form.
    q/k/v [B, L, nh, hd] -> [B, Lq, nh, hd]."""
    if mesh is not None:
        return fid_cross_attention_sharded(q, k, v, kv_bias, seed, mesh,
                                           key_chunk, dropout_rate)
    return fid_cross_attention(q, k, v, kv_bias, seed, key_chunk, None,
                               dropout_rate)
