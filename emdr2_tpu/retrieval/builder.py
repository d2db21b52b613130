"""Evidence index builder: embed the corpus with the context encoder.

Replaces ``IndexBuilder`` (``/root/reference/megatron/indexer_emdr2.py:
38-114``): the reference iterates the 21M-row TSV with a distributed batch
sampler, embeds on each indexer GPU, pickles per-rank shards and merges on
rank 0. Here the corpus is pre-tokenized, batches are dp-sharded device
arrays, and the result is either an ``EmbeddingStore`` (offline build,
config 2) or a host array handed straight to
``ShardedEvidenceIndex.update()`` (online refresh — no disk round trip).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emdr2_tpu.config import EMDR2Config
from emdr2_tpu.data.evidence import EvidenceCorpus
from emdr2_tpu.data.postprocess import context_bert_format
from emdr2_tpu.retrieval.datastore import EmbeddingStore


class EvidenceIndexBuilder:
    """Embeds every corpus passage as [CLS] title [SEP] text [SEP] through
    the context tower (parity with orqa_wiki_dataset.py:68-81 formatting and
    indexer_emdr2.py:77-114 iteration)."""

    def __init__(self, cfg: EMDR2Config, mesh: Mesh, model,
                 corpus: EvidenceCorpus,
                 cls_id: int, sep_id: int, pad_id: int,
                 batch_size: int = 128, embed_method=None):
        """``embed_method``: the bound flax method that maps (ids, types) to
        context embeddings; defaults to ``EMDR2Model.embed_context``. Pass
        ``DualEncoder.embed_context`` to build an index from a standalone
        DPR model (the reference's post-train IndexBuilder path,
        train_dense_retriever.py:371-391)."""
        self.cfg = cfg
        self.mesh = mesh
        self.model = model
        self.embed_method = embed_method
        self.corpus = corpus
        self.cls_id, self.sep_id, self.pad_id = cls_id, sep_id, pad_id
        # round to a dp multiple
        dp = mesh.shape["dp"]
        self.batch_size = max(dp, (batch_size // dp) * dp)
        self._embed_fn = None

    def _format_rows(self, doc_ids: np.ndarray):
        L = self.cfg.retriever.seq_len
        try:  # C++ fast path (emdr2_tpu/native/store_ops.cpp)
            from emdr2_tpu.native import batch_context_format
            return batch_context_format(
                self.corpus.titles, self.corpus.passages, doc_ids, L,
                self.cls_id, self.sep_id, self.pad_id)
        except Exception:
            pass
        ids = np.full((len(doc_ids), L), self.pad_id, np.int32)
        types = np.full((len(doc_ids), L), self.pad_id, np.int32)
        for r, doc_id in enumerate(doc_ids):
            tokens = (self.corpus.title_tokens(int(doc_id)) + [self.sep_id]
                      + self.corpus.doc_tokens(int(doc_id)))
            row_ids, row_types = context_bert_format(
                tokens, L, self.cls_id, self.sep_id, self.pad_id)
            ids[r], types[r] = row_ids, row_types
        return ids, types

    def place_params(self, params):
        """Put a param snapshot onto this builder's mesh, replicated — one
        transfer per refresh instead of one per embed batch. When the builder
        runs on a disjoint embedder sub-mesh (``parallel.build_meshes``),
        this is the weight-transport channel that replaces the reference's
        checkpoint-through-disk hand-off (async_indexer.py:100-108).
        Params already resolved against this mesh pass through untouched
        (keeps tp-sharded params sharded on the same-mesh path)."""
        leaves = jax.tree_util.tree_leaves(params)
        if leaves and all(
                isinstance(getattr(leaf, "sharding", None), NamedSharding)
                and leaf.sharding.mesh == self.mesh for leaf in leaves):
            return params
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def _embed(self, params, ids, types):
        if self._embed_fn is None:
            from emdr2_tpu.models import EMDR2Model

            dp = NamedSharding(self.mesh, P("dp"))
            method = self.embed_method or EMDR2Model.embed_context

            def f(params, ids, types):
                return self.model.apply({"params": params}, ids, types,
                                        method=method)

            self._embed_fn = jax.jit(f, in_shardings=(None, dp, dp),
                                     out_shardings=dp)
        return self._embed_fn(params, ids, types)

    def embed_corpus(self, params,
                     progress: Optional[Callable[[int, int], None]] = None
                     ) -> np.ndarray:
        """Embed every passage; returns [N, d] fp16 host array ordered by
        doc id (row i = doc_id i+1), with full-coverage guaranteed by
        construction (the reference asserts it, indexer_emdr2.py:107-110)."""
        assert jax.process_count() == 1, (
            "embed_corpus gathers the full matrix to one host; multi-host "
            "index refresh needs per-host shard assembly (planned) — run "
            "the embedder on a single-host sub-mesh for now")
        n = len(self.corpus)
        d = self.cfg.index.embed_dim
        out = np.zeros((n, d), np.float16)
        bs = self.batch_size
        # commit the params to this builder's mesh once (host snapshots and
        # cross-mesh arrays alike); per-batch _embed calls then reuse them
        params = self.place_params(params)
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            doc_ids = np.arange(start + 1, stop + 1)
            if stop - start < bs:  # pad tail batch to keep shapes static
                doc_ids = np.concatenate(
                    [doc_ids, np.full(bs - (stop - start), stop, np.int64)])
            ids, types = self._format_rows(doc_ids)
            emb = self._embed(params, jnp.asarray(ids), jnp.asarray(types))
            out[start:stop] = np.asarray(emb)[: stop - start].astype(np.float16)
            if progress is not None:
                progress(stop, n)
        return out

    def build_store(self, params, path: Optional[str] = None) -> EmbeddingStore:
        emb = self.embed_corpus(params)
        store = EmbeddingStore(emb.shape[1], np.float16)
        store.ids = np.arange(1, len(emb) + 1, dtype=np.int64)
        store.embeddings = emb
        if path is not None:
            store.save(path)
        return store
