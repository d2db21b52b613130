"""Core transformer building blocks (Flax linen).

Capability parity with the reference Megatron trunk
(``/root/reference/megatron/model/transformer.py``): pre-LN blocks, fused QKV
self-attention, decoder cross-attention, tanh-GELU MLP, learned absolute
position embeddings, optional tokentype embeddings, residual-scaled output
init. Architecture is TPU-first:

- masks are additive biases fused into the softmax by XLA — this replaces the
  reference's two CUDA fused-softmax kernels (``megatron/fused_kernels/``);
- tensor parallelism is expressed as *logical axis metadata* on every kernel
  (``nn.with_logical_partitioning``) resolved against a device mesh at jit
  time — replacing the mpu Column/RowParallelLinear machinery
  (``mpu/layers.py:170-363``) with compiler-inserted collectives. The fused
  qkv/key_value projections store [D, n, H] (``FusedDense``) so a tp shard
  is head-blocked at the source, and the Pallas flash kernels shard_map over
  the bound ``cfg.mesh`` (rows over dp, heads over tp) with zero gathers —
  head-sharded attention exactly like the mpu design, minus the process
  groups;
- incremental decoding uses a KV cache variable collection (the reference
  re-runs the decoder over the whole prefix each step,
  ``search_strategy.py:200-227`` — a deliberate improvement here);
- activation checkpointing is ``jax.checkpoint`` policy at the layer level
  (replacing ``mpu/random.py:264-319``).

Logical axes used: "batch", "length", "embed", "mlp", "heads", "kv", "vocab".
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emdr2_tpu.config import TransformerConfig

with_lp = nn.with_logical_partitioning
sharding_constraint = nn.with_logical_constraint


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def scaled_init(std: float, num_layers: int):
    """Output-layer init scaled by 1/sqrt(2*num_layers)
    (reference ``model/utils.py:33-41``)."""
    return nn.initializers.normal(stddev=std / (2.0 * num_layers) ** 0.5)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximated GELU, matching the reference's fused bias-gelu
    (``model/fused_bias_gelu.py:31-60``). XLA fuses this into the matmul."""
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — ``torch.nn.functional.gelu``, the reference's
    DEFAULT activation (``transformer.py:80-83``, ``bert_model.py:87-91``):
    ``--bias-gelu-fusion`` / ``--openai-gelu`` are opt-in flags that no
    flagship script passes, so every published checkpoint was trained with
    erf GELU. Verified numerically against the live reference model in
    ``tests/test_reference_parity.py``."""
    return jax.nn.gelu(x, approximate=False)


def gelu(x: jnp.ndarray, variant: str) -> jnp.ndarray:
    return gelu_erf(x) if variant == "erf" else gelu_tanh(x)


def _kernel_mesh(cfg, rows: int):
    """The mesh to shard_map a flash kernel over, or None for the plain
    call. ``pallas_call`` has no GSPMD partitioning rule — unwrapped on a
    multi-device mesh, the partitioner all-gathers the whole slab onto
    every device (see ops/fid_attention.py sharding section). Falls back to
    the unsharded call when rows/heads don't divide the mesh."""
    mesh = cfg.mesh
    if mesh is None or mesh.devices.size <= 1:
        return None
    dp_ax, tp_ax = mesh.axis_names
    if cfg.num_heads % mesh.shape[tp_ax] or rows % mesh.shape[dp_ax]:
        return None
    return mesh


class PackedDropout(nn.Module):
    """Inverted dropout whose mask is a fusible counter hash — no
    materialized rng bits at all.

    ``nn.Dropout`` lowers each site to an ``rng-bit-generator`` emitting a
    u32 PER ELEMENT; the bits tensor is a separate HLO op (not fusible into
    the elementwise apply), so every site pays ~8 B/element of pure mask
    HBM traffic on top of the apply. An earlier revision halved that by
    packing two u16 draws per generated word (recovering ~41 ms/step at
    flagship shape); this version eliminates the bits tensor entirely: the
    keep mask is a murmur3-style integer hash of (key data, per-axis
    element coordinates) — the same counter-hash construction the flash
    kernels use for in-kernel attention dropout
    (``ops/fid_attention._keep_mask``). Pure elementwise integer math on
    ``broadcasted_iota``, so XLA fuses the whole mask into the consuming
    select: ~15 VPU ops/element instead of an HBM round-trip, and the
    remat-backward regenerates the identical mask from the same rng key.

    The keep probability quantizes to 2^-32ths and the inverted-dropout
    scale uses the QUANTIZED rate, so this is an *exact* dropout at a rate
    within 2.4e-10 of the configured one (the reference's fp32-uniform
    comparison has its own 2^-24 quantization; it uses plain torch dropout,
    transformer.py:469-478). Measured on the flagship step: see README
    (dropout cost rows).
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        t = round(self.rate * 4294967296.0)
        if t <= 0 or t >= 2**32:
            return nn.Dropout(self.rate)(x, deterministic=False)
        key = self.make_rng("dropout")
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        from emdr2_tpu.ops.hashing import MIX_PRIMES, murmur_fin
        kd = key.astype(jnp.uint32).reshape(-1)
        # fold the key words into one u32 seed (flax already folds the
        # module path into the key, so every dropout site gets its own)
        seed = kd[0]
        for i in range(1, kd.shape[0]):
            seed = seed * jnp.uint32(MIX_PRIMES[0]) ^ kd[i]
        h = jnp.broadcast_to(seed, x.shape)
        for axis in range(x.ndim):
            idx = jax.lax.broadcasted_iota(jnp.uint32, x.shape, axis)
            h = h ^ (idx * jnp.uint32(MIX_PRIMES[axis % len(MIX_PRIMES)]))
        keep = murmur_fin(h) >= jnp.uint32(t)
        scale = jnp.asarray(4294967296.0 / (4294967296 - t), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


class LayerNorm(nn.Module):
    """LayerNorm in fp32 regardless of compute dtype (stability at bf16)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", with_lp(nn.initializers.ones, ("embed",)),
                           (x.shape[-1],), jnp.float32)
        bias = self.param("bias", with_lp(nn.initializers.zeros, ("embed",)),
                          (x.shape[-1],), jnp.float32)
        return (y * scale + bias).astype(orig_dtype)


class Dense(nn.Module):
    """Linear layer with logical-axis partitioning on the kernel."""

    features: int
    kernel_axes: tuple
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", with_lp(self.kernel_init, self.kernel_axes),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", with_lp(nn.initializers.zeros, (self.kernel_axes[-1],)),
                (self.features,), jnp.float32,
            )
            y = y + bias.astype(self.dtype)
        return y


class FusedDense(nn.Module):
    """``n_split`` fused projections in one matmul (the qkv / key_value
    slabs). The kernel is stored [D, n_split, H] with logical axes
    ("embed", None, "heads"): a tp shard of the heads axis holds a
    self-contained [q_h | k_h | v_h] block for its nh/tp heads, so the
    head-sliced flash kernels shard over tp with ZERO resharding — a flat
    Dense(n*H) tp-shards across the q/k/v boundary and forces a per-layer
    feature all-gather before the kernel. This is the mpu column-parallel
    attention design (ref ``mpu/layers.py:170-363``) expressed as sharding
    metadata. Output [..., n_split, H]; ``reshape(..., n_split*H)`` is a
    free view recovering the flat [q | k | v] slab layout."""

    n_split: int
    features: int  # H
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", with_lp(self.kernel_init, ("embed", None, "heads")),
            (x.shape[-1], self.n_split, self.features), jnp.float32)
        y = jnp.einsum("...d,dnh->...nh", x.astype(self.dtype),
                       kernel.astype(self.dtype),
                       preferred_element_type=self.dtype)
        bias = self.param(
            "bias", with_lp(nn.initializers.zeros, (None, "heads")),
            (self.n_split, self.features), jnp.float32)
        return y + bias.astype(self.dtype)


class Embeddings(nn.Module):
    """Word + learned absolute position + optional tokentype embeddings.

    Parity with the reference Embedding (``model/language_model.py:98-181``).
    Uses setup-style params so ``attend`` (tied LM-head projection,
    ``t5_model.py:54-81``) can coexist with ``__call__``.
    """

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.word_embeddings = self.param(
            "word_embeddings", with_lp(normal_init(cfg.init_std), ("vocab", "embed")),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        self.position_embeddings = self.param(
            "position_embeddings", with_lp(normal_init(cfg.init_std), (None, "embed")),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        if cfg.num_tokentypes > 0:
            self.tokentype_embeddings = self.param(
                "tokentype_embeddings", with_lp(normal_init(cfg.init_std), (None, "embed")),
                (cfg.num_tokentypes, cfg.hidden_size), jnp.float32,
            )
        self.dropout = PackedDropout(cfg.hidden_dropout)

    def __call__(self, ids, position_offset: int = 0, tokentype_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        x = jnp.take(self.word_embeddings, ids, axis=0)
        positions = position_offset + jnp.arange(ids.shape[-1])
        x = x + jnp.take(self.position_embeddings, positions, axis=0)
        if cfg.num_tokentypes > 0:
            if tokentype_ids is None:
                tokentype_ids = jnp.zeros_like(ids)
            x = x + jnp.take(self.tokentype_embeddings, tokentype_ids, axis=0)
        x = x.astype(cfg.dtype)
        return self.dropout(x, deterministic=deterministic)

    def attend(self, hidden):
        """Project hidden states onto the (tied) embedding matrix — used by
        the T5 LM head (``t5_model.py:54-81`` ties the word embedding)."""
        return jnp.dot(hidden, self.word_embeddings.T.astype(hidden.dtype),
                       preferred_element_type=jnp.float32)


class Attention(nn.Module):
    """Multi-head attention: fused-QKV self-attention or cross-attention.

    Parity with ``ParallelAttention`` (``transformer.py:111-408``): scale by
    1/sqrt(head_dim), additive mask bias, attention dropout. Fused into the
    softmax by XLA instead of the reference's hand-written CUDA kernels.
    Supports incremental decoding via the "cache" variable collection.
    """

    config: TransformerConfig
    cross_attention: bool = False

    @nn.compact
    def __call__(self, x, kv=None, bias=None, deterministic: bool = True,
                 decode: bool = False, precomputed_kv=None, kv_bias=None):
        """``precomputed_kv``: the encoder-state K/V projection, computed
        ONCE before the decode loop (see ``decoding.DecoderSession``) — the
        reference instead re-runs the whole prefix every step with no
        caching (search_strategy.py:200-227). Two accepted forms: a
        ``(k, v)`` tuple pre-headed in [B, nh, Lk, hd] (the fast path — no
        per-step relayout of the key slab), or a fused [..., Lk, 2, H] /
        [..., Lk, 2H] slab array.

        ``kv_bias`` [B, Lk]: key-side-only additive bias; when provided on a
        non-decode path (cross-attention OR padding-only self-attention) with
        ``cfg.fid_flash_attention``, the flash kernel runs instead of
        materialized-score attention — attention dropout then runs inside the
        kernel from a seed drawn off the "dropout" rng.
        """
        cfg = self.config
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

        use_flash = (not decode and kv_bias is not None and bias is None
                     and cfg.fid_flash_attention)

        def dropout_seed():
            rate = 0.0 if deterministic else cfg.attention_dropout
            seed = None
            if rate > 0.0:
                seed = jax.random.bits(self.make_rng("dropout"), (),
                                       jnp.uint32)
            return rate, seed

        def out_proj(o):
            return Dense(h, ("heads", "embed"), dtype=cfg.dtype,
                         kernel_init=scaled_init(cfg.init_std, cfg.num_layers),
                         name="out")(o)

        if self.cross_attention:
            q = Dense(h, ("embed", "heads"), dtype=cfg.dtype,
                      kernel_init=normal_init(cfg.init_std), name="query")(x)
            if isinstance(precomputed_kv, (tuple, list)):
                # Incremental-decode fast path: (k, v) arrive pre-split and
                # pre-headed in [Bk, nh, Lk, hd] (DecoderSession.cross_kvs),
                # so both matmuls below are contiguous batched GEMMs — no
                # per-step relayout of the 25.6k-key slab inside the token
                # loop (measured 22.6 -> ~6 ms/step at flagship shape).
                #
                # Beam grouping: when the query batch is g x the K/V batch
                # (beam search runs B*beam rows against per-EXAMPLE encoder
                # states), the g beams of an example are folded into extra
                # query rows of one GEMM — K/V are read ONCE per step
                # regardless of beam width, instead of beam-times (the
                # repeat-the-slab form cost 64 ms/step at beam 5 vs the
                # ~6 ms greedy step; the K/V read is the whole roofline).
                if len(precomputed_kv) == 4:
                    # int8-stored K/V (DecoderSession kv_quant="int8"):
                    # halve the per-step slab read via the flash decode
                    # kernel, which dequantizes per key row inside VMEM
                    # (ops/decode_attention.py). Same beam folding as the
                    # bf16 path: g beams become extra query rows.
                    from emdr2_tpu.ops.decode_attention import (
                        decode_cross_attention_int8_on)
                    k8, ks, v8, vs = precomputed_kv
                    Bq, Lq = x.shape[0], x.shape[-2]
                    kvB = k8.shape[0]
                    g = Bq // kvB
                    Lk8 = k8.shape[2]
                    qh = q.reshape(kvB, g * Lq, nh, hd)   # kernel scales q
                    if bias is not None:
                        # decode-step cross bias is pure key-side padding —
                        # identical across beams and query rows — so one
                        # [kvB, Lk] row per example feeds the kernel
                        kvb = bias.astype(jnp.float32).reshape(
                            (kvB, g) + bias.shape[1:])[:, 0, 0, 0, :]
                    else:
                        kvb = jnp.zeros((kvB, Lk8), jnp.float32)
                    if kvb.shape[-1] < Lk8:   # slab was chunk-padded
                        kvb = jnp.pad(kvb,
                                      ((0, 0), (0, Lk8 - kvb.shape[-1])),
                                      constant_values=-1e9)
                    ctx = decode_cross_attention_int8_on(
                        _kernel_mesh(cfg, kvB), qh, k8, ks, v8, vs, kvb)
                    return out_proj(ctx.reshape(Bq, Lq, h))
                k, v = precomputed_kv
                Bq, Lq = x.shape[0], x.shape[-2]
                g, kvB = Bq // k.shape[0], k.shape[0]
                qh = q.reshape(kvB, g, Lq, nh, hd) * (hd ** -0.5)
                scores = jnp.einsum("bgqnd,bnkd->bgnqk", qh,
                                    k.astype(cfg.dtype),
                                    preferred_element_type=jnp.float32)
                if bias is not None:   # [Bq, 1, Lq, Lk] -> [kvB, g, 1, Lq, Lk]
                    b5 = bias.astype(jnp.float32).reshape(
                        (kvB, g) + bias.shape[1:])
                    scores = scores + b5
                probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
                probs = PackedDropout(cfg.attention_dropout)(
                    probs, deterministic=deterministic)
                ctx = jnp.einsum("bgnqk,bnkd->bgqnd", probs,
                                 v.astype(cfg.dtype))
                return out_proj(ctx.reshape(Bq, Lq, h))
            if precomputed_kv is None:
                kv_proj = FusedDense(2, h, dtype=cfg.dtype,
                                     kernel_init=normal_init(cfg.init_std),
                                     name="key_value")(kv)  # [.., Lk, 2, H]
            else:
                kv_proj = precomputed_kv.astype(cfg.dtype)
                if kv_proj.shape[-1] == 2 * h:  # flat [.., Lk, 2H] slab
                    kv_proj = kv_proj.reshape(kv_proj.shape[:-1] + (2, h))
            if use_flash:
                # kv-slab kernel: consumes the query/key_value projections
                # directly, VJP emits dq + the combined dkv slab — no
                # split/head-transpose relayouts of the [Lk, 2H] projection
                Lk = kv_proj.shape[-3]
                key_chunk = min(cfg.flash_key_chunk, Lk)
                rem = Lk % key_chunk
                kvb = kv_bias.astype(jnp.float32)
                if rem:
                    # pad keys to a chunk multiple; they carry -1e9 bias
                    pad = key_chunk - rem
                    kv_proj = jnp.pad(
                        kv_proj, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    kvb = jnp.pad(kvb, ((0, 0), (0, pad)),
                                  constant_values=-1e9)
                rate, seed = dropout_seed()
                from emdr2_tpu.ops.fid_attention import (
                    flash_cross_attention_on)
                o = flash_cross_attention_on(
                    _kernel_mesh(cfg, q.shape[0]), q, kv_proj, kvb, seed,
                    nh, key_chunk, rate)
                return out_proj(o.astype(cfg.dtype))
            k, v = kv_proj[..., 0, :], kv_proj[..., 1, :]
        else:
            qkv = FusedDense(3, h, dtype=cfg.dtype,
                             kernel_init=normal_init(cfg.init_std),
                             name="qkv")(x)              # [.., L, 3, H]
            if use_flash and x.shape[-2] <= cfg.flash_key_chunk:
                # fused-QKV slab kernel: consumes the projection directly
                # and its VJP emits the combined dqkv slab — no split/
                # head-transpose relayouts in fwd, remat recompute, or bwd
                # (profiled at ~16% of the flagship step for the general
                # [B, L, nh, hd] contract)
                from emdr2_tpu.ops.fid_attention import (
                    flash_self_attention_on)
                rate, seed = dropout_seed()
                o = flash_self_attention_on(
                    _kernel_mesh(cfg, qkv.shape[0]), qkv,
                    kv_bias.astype(jnp.float32), seed, nh, rate)
                return out_proj(o.astype(cfg.dtype))
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

        def heads(t):
            return t.reshape(t.shape[:-1] + (nh, hd))

        q, k, v = heads(q), heads(k), heads(v)

        if use_flash:
            key_chunk = min(cfg.flash_key_chunk, k.shape[-3])
            rem = k.shape[-3] % key_chunk
            if rem:
                # pad the key axis to a chunk multiple; padded keys carry a
                # -1e9 bias so they contribute nothing to the softmax
                pad = key_chunk - rem
                widths = [(0, 0)] * k.ndim
                widths[-3] = (0, pad)
                k = jnp.pad(k, widths)
                v = jnp.pad(v, widths)
                kv_bias = jnp.pad(kv_bias, ((0, 0), (0, pad)),
                                  constant_values=-1e9)
        if kv_bias is not None and not use_flash:
            # fall back to materialized attention with the key-side bias
            kb = kv_bias.astype(jnp.float32)[:, None, None, :]
            bias = kb if bias is None else bias + kb
        if use_flash:
            # flash attention (FiD cross-attn, or self-attn with a long or
            # chunked key axis): no [Lq, Lk] score materialization;
            # attention dropout happens inside the kernel (identical mask in
            # fwd and bwd)
            from emdr2_tpu.ops.fid_attention import fid_cross_attention_on
            rate, seed = dropout_seed()
            out = fid_cross_attention_on(
                _kernel_mesh(cfg, q.shape[0]) if q.ndim == 4 else None,
                q, k, v, kv_bias.astype(jnp.float32), seed, key_chunk, rate)
            out = out.astype(cfg.dtype).reshape(out.shape[:-2] + (h,))
            return out_proj(out)

        if decode and not self.cross_attention:
            # Incremental KV cache (flax decode pattern). The reference has no
            # KV cache at all (search_strategy.py:200-227 note in SURVEY §3.6).
            is_init = not self.has_variable("cache", "cached_key")
            max_len = cfg.max_position_embeddings
            ck = self.variable("cache", "cached_key", jnp.zeros,
                               x.shape[:-2] + (max_len, nh, hd), cfg.dtype)
            cv = self.variable("cache", "cached_value", jnp.zeros,
                               x.shape[:-2] + (max_len, nh, hd), cfg.dtype)
            ci = self.variable("cache", "cache_index",
                               lambda: jnp.zeros((), jnp.int32))
            if not is_init:
                idx = ci.value
                ck.value = jax.lax.dynamic_update_slice_in_dim(ck.value, k, idx, -3)
                cv.value = jax.lax.dynamic_update_slice_in_dim(cv.value, v, idx, -3)
                ci.value = idx + q.shape[-3]
                k, v = ck.value, cv.value
                # mask out cache slots beyond the current index
                kpos = jnp.arange(max_len)
                valid = kpos < ci.value          # [max_len]
                cache_bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
                bias = cache_bias[None, None, None, :] if bias is None else (
                    bias + cache_bias[None, None, None, :])

        q = q * (hd ** -0.5)
        scores = jnp.einsum("...qnd,...knd->...nqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        probs = PackedDropout(cfg.attention_dropout)(
            probs, deterministic=deterministic)
        out = jnp.einsum("...nqk,...knd->...qnd", probs, v,
                         preferred_element_type=cfg.dtype)
        out = out.reshape(out.shape[:-2] + (h,))
        out = Dense(h, ("heads", "embed"), dtype=cfg.dtype,
                    kernel_init=scaled_init(cfg.init_std, cfg.num_layers),
                    name="out")(out)
        return out


class MLP(nn.Module):
    """h -> ffn -> gelu -> h (``ParallelMLP``, transformer.py:58-108)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        y = Dense(cfg.ffn_size, ("embed", "mlp"), dtype=cfg.dtype,
                  kernel_init=normal_init(cfg.init_std), name="wi")(x)
        y = gelu(y, cfg.gelu_variant)
        y = Dense(cfg.hidden_size, ("mlp", "embed"), dtype=cfg.dtype,
                  kernel_init=scaled_init(cfg.init_std, cfg.num_layers),
                  name="wo")(y)
        return y


class TransformerLayer(nn.Module):
    """Pre-LN block: [cross-attn for decoders] + self-attn + MLP with
    dropout-residual adds (``ParallelTransformerLayer``, transformer.py:422-563)."""

    config: TransformerConfig
    has_cross_attention: bool = False

    @nn.compact
    def __call__(self, x, enc_out=None, self_bias=None, cross_bias=None,
                 deterministic: bool = True, decode: bool = False,
                 cross_kv=None, kv_bias=None):
        cfg = self.config

        def resid(y, r):
            y = PackedDropout(cfg.hidden_dropout)(y, deterministic=deterministic)
            return r + y

        h = LayerNorm(cfg.layernorm_epsilon, cfg.dtype, name="ln_self")(x)
        # encoder-only stacks: the key-side pad bias feeds self-attention
        # (flash path); decoder stacks route kv_bias to cross-attention
        h = Attention(cfg, name="self_attention")(
            h, bias=self_bias, deterministic=deterministic, decode=decode,
            kv_bias=None if self.has_cross_attention else kv_bias)
        x = resid(h, x)

        if self.has_cross_attention:
            h = LayerNorm(cfg.layernorm_epsilon, cfg.dtype, name="ln_cross")(x)
            h = Attention(cfg, cross_attention=True, name="cross_attention")(
                h, kv=enc_out, bias=cross_bias, deterministic=deterministic,
                decode=decode, precomputed_kv=cross_kv, kv_bias=kv_bias)
            x = resid(h, x)

        h = LayerNorm(cfg.layernorm_epsilon, cfg.dtype, name="ln_mlp")(x)
        h = MLP(cfg, name="mlp")(h, deterministic=deterministic)
        x = resid(h, x)
        return x


class TransformerStack(nn.Module):
    """A stack of layers + final LayerNorm (``ParallelTransformer``,
    transformer.py:566-699). ``config.remat`` enables per-layer activation
    checkpointing (replacing mpu/random.py:264-319)."""

    config: TransformerConfig
    has_cross_attention: bool = False

    @nn.compact
    def __call__(self, x, enc_out=None, self_bias=None, cross_bias=None,
                 deterministic: bool = True, decode: bool = False,
                 cross_kvs=None, kv_bias=None):
        cfg = self.config
        layer_cls = TransformerLayer
        if cfg.remat and not decode:
            policy = {
                "nothing": jax.checkpoint_policies.nothing_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }[cfg.remat_policy]
            layer_cls = nn.remat(
                TransformerLayer,
                static_argnums=(5, 6),
                policy=policy,
            )
        n_unique = cfg.num_unique_layers or cfg.num_layers
        assert cfg.num_layers % n_unique == 0
        assert n_unique == cfg.num_layers or not decode, (
            "KV-cached decoding is incompatible with layer-param sharing")
        layers = [layer_cls(cfg, self.has_cross_attention, name=f"layer_{u}")
                  for u in range(n_unique)]
        for i in range(cfg.num_layers):
            # layer-parameter sharing (transformer.py:611-616): grouped
            # cycles through the unique layers, spaced repeats each in a row
            if cfg.param_sharing_style == "grouped":
                u = i % n_unique
            else:  # spaced
                u = i // (cfg.num_layers // n_unique)
            x = layers[u](
                x, enc_out, self_bias, cross_bias, deterministic, decode,
                cross_kvs[u] if cross_kvs is not None else None, kv_bias)
        x = LayerNorm(cfg.layernorm_epsilon, cfg.dtype, name="ln_final")(x)
        return x
