"""Megatron-style T5 reader (encoder/decoder with learned absolute positions).

Parity target: ``/root/reference/megatron/model/t5_model.py:84-202`` and the
language-model shell (``model/language_model.py:45-428``): shared word
embeddings between encoder and decoder, learned (not relative-bias) position
embeddings, a tied LM head with a trainable bias (``T5LMHead``, t5_model.py:
54-81), ``output_enc_hidden`` to return encoder states, and
``enc_hidden_states`` injection that skips the encoder entirely
(language_model.py:324-330) — the hook Fusion-in-Decoder uses to cross-attend
over K independently-encoded passages.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emdr2_tpu.config import TransformerConfig
from emdr2_tpu.data import masks
from emdr2_tpu.models.layers import (
    Embeddings,
    TransformerStack,
    sharding_constraint,
    with_lp,
)


def _vocab_parallel_gold_log_probs(x, emb, bias, labels, mesh):
    """Gold-token log-probs over a tp-sharded tied LM head, vocab-gather-free.

    Parity: ``/root/reference/megatron/mpu/cross_entropy.py:25-110`` —
    per-shard max -> pmax, per-shard sum-exp -> psum, per-shard masked gold
    pick -> psum. ``x`` [rows, L, H] (rows dp-sharded), ``emb`` [V, H] and
    ``bias`` [V] vocab-sharded over tp. Returns [rows, L] fp32 gold - lse.
    """
    from jax.sharding import PartitionSpec as P
    dp_ax, tp_ax = mesh.axis_names

    def local(xs, ws, bs, lb):
        v_local = ws.shape[0]
        start = jax.lax.axis_index(tp_ax) * v_local
        lg = jnp.dot(xs, ws.T.astype(xs.dtype),
                     preferred_element_type=jnp.float32) + bs
        # max shift is an autodiff constant (cancels in the logsumexp
        # derivative); pmax has no VJP rule, so it must only ever see the
        # stop-gradient'd value
        m = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(lg), axis=-1), tp_ax)
        se = jax.lax.psum(
            jnp.sum(jnp.exp(lg - m[..., None]), axis=-1), tp_ax)
        lse = m + jnp.log(se)
        local_lb = lb - start
        in_range = (local_lb >= 0) & (local_lb < v_local)
        picked = jnp.take_along_axis(
            lg, jnp.clip(local_lb, 0, v_local - 1)[..., None], axis=-1
        )[..., 0]
        gold = jax.lax.psum(jnp.where(in_range, picked, 0.0), tp_ax)
        return gold - lse

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dp_ax, None, None), P(tp_ax, None), P(tp_ax),
                  P(dp_ax, None)),
        out_specs=P(dp_ax, None), check_vma=False)(x, emb, bias, labels)


class T5Model(nn.Module):
    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.shared_embeddings = Embeddings(cfg)
        self.encoder = TransformerStack(cfg)
        self.decoder = TransformerStack(cfg, has_cross_attention=True)
        # T5LMHead bias (t5_model.py:54-81); the projection is tied to the
        # word embedding.
        self.lm_bias = self.param(
            "lm_bias", with_lp(nn.initializers.zeros, ("vocab",)),
            (cfg.vocab_size,), jnp.float32,
        )

    def encode(self, enc_ids, deterministic: bool = True):
        """Encoder-only forward -> [B, L, H] hidden states
        (``output_enc_hidden`` path, t5_model.py:121-127)."""
        cfg = self.config
        x = self.shared_embeddings(enc_ids, deterministic=deterministic)
        x = sharding_constraint(x, ("batch", "length", "embed"))
        # key-side-only pad bias: [B,L] instead of [B,1,L,L] (see
        # masks.padding_bias — identical at every consumed position); routes
        # through the flash self-attention kernel when configured
        return self.encoder(x, kv_bias=masks.padding_bias(enc_ids),
                            deterministic=deterministic)

    def _decode_hidden(self, dec_ids, enc_hidden, enc_dec_mask,
                       deterministic: bool = True, decode_step: bool = False,
                       position_offset: int = 0, cross_kvs=None):
        """Shared decoder forward (embedding, bias construction, stack) ->
        [B, L, H] pre-head hidden states. Both the logits head (``decode``)
        and the teacher's chunked gold head (``decode_gold_log_probs``)
        consume this, so their attention masking can never diverge."""
        cfg = self.config
        x = self.shared_embeddings(dec_ids, position_offset=position_offset,
                                   deterministic=deterministic)
        self_bias = None
        if not decode_step:
            self_bias = masks.mask_to_bias(
                masks.self_attention_mask(dec_ids, causal=True))[:, None, :, :]
        kv_bias = None
        cross_bias = None
        if cfg.fid_flash_attention and not decode_step:
            # flash path: key-side-only bias (query-side padding rows are
            # ignored by the loss mask anyway); the big [B,1,Ld,Lk] bias is
            # never built
            kv_bias = masks.mask_to_bias(enc_dec_mask[:, 0, :])
        else:
            cross_bias = masks.mask_to_bias(enc_dec_mask)[:, None, :, :]
        x = self.decoder(x, enc_out=enc_hidden, self_bias=self_bias,
                         cross_bias=cross_bias, deterministic=deterministic,
                         decode=decode_step, cross_kvs=cross_kvs,
                         kv_bias=kv_bias)
        return sharding_constraint(x, ("batch", "length", "embed"))

    def decode(self, dec_ids, enc_hidden, enc_dec_mask,
               deterministic: bool = True, decode_step: bool = False,
               position_offset: int = 0, cross_kvs=None):
        """Decoder forward over injected encoder states -> [B, L, V] logits.

        ``enc_dec_mask`` is [B, Ldec, Lenc] bool (True=may attend); during
        incremental decoding (``decode_step``) Ldec is the new suffix length
        and self-attention causality comes from the KV-cache index.
        """
        x = self._decode_hidden(dec_ids, enc_hidden, enc_dec_mask,
                                deterministic, decode_step, position_offset,
                                cross_kvs)
        return self.shared_embeddings.attend(x) + self.lm_bias

    def decode_gold_log_probs(self, dec_ids, enc_hidden, enc_dec_mask,
                              labels, deterministic: bool = True):
        """Decoder forward -> gold-token log-probs [*, L], with the LM head
        computed as an ONLINE logsumexp over vocab chunks, so the [*, L, V]
        logits tensor is never materialized (fp32 it is 0.79 GB at the
        flagship teacher shape [200, 32, 30720] — the reference materializes
        it outright, emdr2_model.py:205-211). Used by the stop-gradient
        teacher; exact up to summation order vs the dense head.
        """
        cfg = self.config
        x = self._decode_hidden(dec_ids, enc_hidden, enc_dec_mask,
                                deterministic)

        emb = self.shared_embeddings.word_embeddings          # [V, H] fp32
        V = emb.shape[0]
        mesh = cfg.mesh
        tp_sharded_vocab = (mesh is not None
                            and mesh.shape[mesh.axis_names[-1]] > 1)
        if tp_sharded_vocab:
            # vocab-parallel head (parity: mpu/cross_entropy.py:25-110): each
            # tp shard matmuls only its own V/tp embedding rows, the lse and
            # gold pick combine with psum/pmax — the [*, L, V] logits tensor
            # exists only as per-shard [*, L, V/tp] chunks, no vocab gather
            dp = mesh.shape[mesh.axis_names[0]]
            tp = mesh.shape[mesh.axis_names[-1]]
            if V % tp == 0 and x.shape[0] % dp == 0:
                return _vocab_parallel_gold_log_probs(
                    x, emb, self.lm_bias, labels, mesh)
        if V % 4 or tp_sharded_vocab:
            # dense fallback: odd vocab, or a tp-sharded vocab axis with
            # shapes that don't divide over the mesh (chunk slices would cut
            # across the shard boundary and force gathers)
            logits = (self.shared_embeddings.attend(x)
                      + self.lm_bias).astype(jnp.float32)
            lse = jax.nn.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(
                logits, labels[..., None], axis=-1)[..., 0]
            return picked - lse

        n_c = 4
        chunk = V // n_c
        w = emb.reshape(n_c, chunk, emb.shape[1])
        b = self.lm_bias.reshape(n_c, chunk)
        bases = jnp.arange(n_c, dtype=jnp.int32) * chunk

        def body(carry, wb):
            m, s, picked = carry
            wc, bc, base = wb
            lc = jnp.dot(x, wc.T.astype(x.dtype),
                         preferred_element_type=jnp.float32) + bc
            m_new = jnp.maximum(m, jnp.max(lc, axis=-1))
            s = (s * jnp.exp(m - m_new)
                 + jnp.sum(jnp.exp(lc - m_new[..., None]), axis=-1))
            in_chunk = (labels >= base) & (labels < base + chunk)
            idx = jnp.clip(labels - base, 0, chunk - 1)
            val = jnp.take_along_axis(lc, idx[..., None], axis=-1)[..., 0]
            picked = jnp.where(in_chunk, val, picked)
            return (m_new, s, picked), None

        init = (jnp.full(labels.shape, -jnp.inf, jnp.float32),
                jnp.zeros(labels.shape, jnp.float32),
                jnp.zeros(labels.shape, jnp.float32))
        (m, s, picked), _ = jax.lax.scan(body, init, (w, b, bases))
        return picked - (jnp.log(s) + m)

    def __call__(self, enc_ids, dec_ids, deterministic: bool = True,
                 enc_hidden=None, enc_dec_mask=None, output_enc_hidden=False):
        """Full seq2seq forward (t5_model.py:108-154). Returns logits, or
        encoder hidden states when ``output_enc_hidden``."""
        if enc_hidden is None:
            enc_hidden = self.encode(enc_ids, deterministic)
        if output_enc_hidden:
            return enc_hidden
        if enc_dec_mask is None:
            enc_dec_mask = masks.attention_mask(dec_ids, enc_ids)
        return self.decode(dec_ids, enc_hidden, enc_dec_mask, deterministic)
