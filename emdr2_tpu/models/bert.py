"""BERT encoder and DPR-style dual encoder.

Parity targets: ``/root/reference/megatron/model/bert_model.py:104-201`` and
``model/dualencoder_model.py:27-194``. The retrieval embedding is the raw
CLS-token hidden state — no pooler head (dualencoder_model.py:176-179).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from emdr2_tpu.config import RetrieverConfig, TransformerConfig
from emdr2_tpu.data import masks
from emdr2_tpu.models.layers import (Dense, Embeddings, LayerNorm,
                                     TransformerStack, gelu,
                                     normal_init, sharding_constraint,
                                     with_lp)


class BertEncoder(nn.Module):
    """BERT trunk: embeddings (word+pos+tokentype) + pre-LN transformer.

    ``__call__`` returns all hidden states; ``embed`` returns the CLS vector;
    ``attend`` projects hidden states onto the tied word-embedding matrix
    (used by ``BertPretrainModel``'s LM head).
    """

    config: TransformerConfig

    def setup(self):
        self.embeddings = Embeddings(self.config, name="embeddings")
        self.encoder = TransformerStack(self.config, name="encoder")

    def __call__(self, ids, tokentype_ids=None, deterministic: bool = True):
        x = self.embeddings(ids, tokentype_ids=tokentype_ids,
                            deterministic=deterministic)
        x = sharding_constraint(x, ("batch", "length", "embed"))
        # key-side-only pad bias: [B,L] instead of [B,1,L,L] (see
        # masks.padding_bias — identical at every consumed position); routes
        # through the flash self-attention kernel when configured
        x = self.encoder(x, kv_bias=masks.padding_bias(ids),
                         deterministic=deterministic)
        return x

    def embed(self, ids, tokentype_ids=None, deterministic: bool = True):
        """CLS-token raw hidden state as the retrieval embedding
        (dualencoder_model.py:176-179)."""
        hidden = self(ids, tokentype_ids, deterministic)
        return hidden[:, 0, :]

    def attend(self, hidden):
        return self.embeddings.attend(hidden)


class BertPretrainModel(nn.Module):
    """BERT with the pretraining heads (``bert_model.py:104-201``):

    - masked-LM head (``BertLMHead``, :61-103): dense -> gelu -> LayerNorm
      -> projection onto the TIED word-embedding matrix + vocab bias;
    - binary (NSP/ICT-style) head (:126-131): tanh pooler over the CLS
      state -> Dense(2).

    Unused by the EMDR2/DPR tasks (the dual encoder reads raw CLS states,
    dualencoder_model.py:176-179) — provided so the reference's BERT
    pretraining objective surface is available. Returns
    ``(lm_logits [B, L, V] fp32, binary_logits [B, 2] fp32 or None)``.
    """

    config: TransformerConfig
    add_binary_head: bool = True

    def setup(self):
        cfg = self.config
        self.bert = BertEncoder(cfg, name="bert")
        self.lm_dense = Dense(cfg.hidden_size, ("embed", "embed"),
                              dtype=cfg.dtype,
                              kernel_init=normal_init(cfg.init_std),
                              name="lm_dense")
        self.lm_layernorm = LayerNorm(cfg.layernorm_epsilon, cfg.dtype,
                                      name="lm_layernorm")
        self.lm_bias = self.param(
            "lm_bias", with_lp(nn.initializers.zeros, ("vocab",)),
            (cfg.vocab_size,), jnp.float32)
        if self.add_binary_head:
            # tanh pooler over CLS (language_model.py Pooler) + 2-way head
            self.pooler = Dense(cfg.hidden_size, ("embed", "embed"),
                                dtype=cfg.dtype,
                                kernel_init=normal_init(cfg.init_std),
                                name="pooler")
            self.binary_head = Dense(2, ("embed", None), dtype=cfg.dtype,
                                     kernel_init=normal_init(cfg.init_std),
                                     name="binary_head")

    def __call__(self, ids, tokentype_ids=None, deterministic: bool = True):
        hidden = self.bert(ids, tokentype_ids, deterministic)
        h = self.lm_dense(hidden)
        h = gelu(h, self.config.gelu_variant)
        h = self.lm_layernorm(h)
        lm_logits = (self.bert.attend(h)
                     + self.lm_bias.astype(jnp.float32))
        binary = None
        if self.add_binary_head:
            pooled = jnp.tanh(self.pooler(hidden[:, 0, :]))
            binary = self.binary_head(pooled).astype(jnp.float32)
        return lm_logits, binary


class DualEncoder(nn.Module):
    """Separate query/context towers (``DualEncoderModel``,
    dualencoder_model.py:27-143). Either tower can be used alone (the async
    indexer builds a context-only model, ``indexer_emdr2.py:58-69``); weights
    for both towers are typically cloned from one BERT checkpoint at init.
    """

    config: RetrieverConfig

    def setup(self):
        self.query_model = BertEncoder(self.config.encoder)
        self.context_model = BertEncoder(self.config.encoder)

    def __call__(self, query_ids=None, context_ids=None,
                 query_types=None, context_types=None,
                 deterministic: bool = True):
        """Returns (query_embeds, context_embeds); either may be None.

        Parity with forward (dualencoder_model.py:56-74) / ``embed_text``
        (:76-82): embeddings are fp32 CLS states; token types carry the
        [CLS] title [SEP] text [SEP] segmentation.
        """
        q = c = None
        if query_ids is not None:
            q = self.embed_query(query_ids, query_types, deterministic)
        if context_ids is not None:
            c = self.embed_context(context_ids, context_types, deterministic)
        return q, c

    def embed_query(self, ids, tokentype_ids=None, deterministic: bool = True):
        return self.query_model.embed(
            ids, tokentype_ids=tokentype_ids,
            deterministic=deterministic).astype(jnp.float32)

    def embed_context(self, ids, tokentype_ids=None,
                      deterministic: bool = True):
        return self.context_model.embed(
            ids, tokentype_ids=tokentype_ids,
            deterministic=deterministic).astype(jnp.float32)
