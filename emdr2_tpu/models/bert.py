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
from emdr2_tpu.models.layers import Embeddings, TransformerStack, sharding_constraint


class BertEncoder(nn.Module):
    """BERT trunk: embeddings (word+pos+tokentype) + pre-LN transformer.

    ``__call__`` returns all hidden states; ``embed`` returns the CLS vector.
    """

    config: TransformerConfig

    @nn.compact
    def __call__(self, ids, tokentype_ids=None, deterministic: bool = True):
        cfg = self.config
        x = Embeddings(cfg, name="embeddings")(
            ids, tokentype_ids=tokentype_ids, deterministic=deterministic)
        x = sharding_constraint(x, ("batch", "length", "embed"))
        # key-side-only pad bias: [B,L] instead of [B,1,L,L] (see
        # masks.padding_bias — identical at every consumed position); routes
        # through the flash self-attention kernel when configured
        x = TransformerStack(cfg, name="encoder")(
            x, kv_bias=masks.padding_bias(ids), deterministic=deterministic)
        return x

    def embed(self, ids, tokentype_ids=None, deterministic: bool = True):
        """CLS-token raw hidden state as the retrieval embedding
        (dualencoder_model.py:176-179)."""
        hidden = self(ids, tokentype_ids, deterministic)
        return hidden[:, 0, :]


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
