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
        (keeps tp-sharded params sharded on the same-mesh path). Device
        arrays living on a DIFFERENT mesh bounce through host first:
        multi-controller JAX cannot reshard across disjoint device sets
        directly (the async refresher's weight snapshots are host arrays
        anyway — this covers direct callers)."""
        leaves = jax.tree_util.tree_leaves(params)
        if leaves and all(
                isinstance(getattr(leaf, "sharding", None), NamedSharding)
                and leaf.sharding.mesh == self.mesh for leaf in leaves):
            return params
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            params)
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
                     progress: Optional[Callable[[int, int], None]] = None,
                     row_partition: Optional[tuple] = None) -> np.ndarray:
        """Embed passages with the context tower; rows ordered by doc id
        (row i = doc_id i+1), full coverage by construction (the reference
        asserts it, indexer_emdr2.py:107-110).

        Single-process (``row_partition=None``): returns the full [N, d]
        fp16 host array.

        Multi-host (``row_partition=(start, stop)``, 0-based rows — the
        refresher passes ``ShardedEvidenceIndex.process_row_range()``): this
        process embeds ONLY rows [start, stop) and returns that [stop-start,
        d] block. Every process must pass an equal-sized partition so the
        globally-jitted embed steps stay in lockstep; rows >= len(corpus)
        (index tail padding) come back zeroed. Replaces the reference's
        per-rank pickle shards + rank-0 merge (indexer_emdr2.py:77-114) with
        per-host blocks the index swaps in without any gather.
        """
        procs = jax.process_count()
        n = len(self.corpus)
        if row_partition is None:
            assert procs == 1, (
                "multi-host embed_corpus needs row_partition= — pass "
                "index.process_row_range() so each host assembles only its "
                "own index-shard rows")
            start_g, stop_g = 0, n
        else:
            start_g, stop_g = row_partition
        n_local = stop_g - start_g
        d = self.cfg.index.embed_dim
        out = np.zeros((n_local, d), np.float16)
        per = self.batch_size // procs   # this process's rows per step
        # commit the params to this builder's mesh once (host snapshots and
        # cross-mesh arrays alike); per-batch _embed calls then reuse them
        params = self.place_params(params)
        from emdr2_tpu.parallel.distributed import (host_local_rows,
                                                    make_global_array)
        from jax.sharding import PartitionSpec as P
        steps = -(-n_local // per) if n_local else 0
        for s in range(steps):
            lo = start_g + s * per
            hi = min(lo + per, stop_g)
            doc_ids = np.arange(lo + 1, hi + 1)
            if hi - lo < per:  # pad tail batch to keep shapes static
                doc_ids = np.concatenate(
                    [doc_ids, np.full(per - (hi - lo), max(hi, 1), np.int64)])
            # rows past the corpus (index tail padding) embed doc n instead
            # and are zeroed below — the index masks them regardless
            doc_ids = np.clip(doc_ids, 1, n)
            ids, types = self._format_rows(doc_ids)
            ids_g = make_global_array(self.mesh, ids, P("dp"))
            types_g = make_global_array(self.mesh, types, P("dp"))
            emb = host_local_rows(self._embed(params, ids_g, types_g))
            take = min(hi, n) - lo  # real-corpus rows only (global rows < n)
            if take > 0:
                out[lo - start_g: lo - start_g + take] = (
                    emb[:take].astype(np.float16))
            if progress is not None:
                progress(hi - start_g, n_local)
        return out

    def embed_corpus_device(self, params, out_rows: int,
                            progress: Optional[Callable[[int, int], None]] = None
                            ) -> "jax.Array":
        """Embed the corpus into a DEVICE-RESIDENT [out_rows, d] buffer,
        rows sharded over this builder's whole mesh — the zero-copy refresh
        path: the refresher hands the buffer straight to
        ``ShardedEvidenceIndex.swap_device_array`` (device-to-device), never
        bouncing ~2 GB/chip of embeddings through the host the way the
        host-array path does (and the reference's 32 GB disk pickle did,
        async_indexer.py:116-144).

        ``out_rows``: the index's padded row count (``index.n_padded``).
        Rows in [len(corpus), out_rows) may hold duplicate embeddings of the
        last document — the index masks them in-kernel via n_valid.

        Multi-host: every process runs the same globally-jitted loop in
        lockstep over the GLOBAL embed mesh, each feeding its dp slice of
        every batch; the returned global array's per-process row blocks are
        process-contiguous, so the index's local-repartition swap
        (``ShardedEvidenceIndex.swap_device_array``) moves them to the train
        mesh with intra-host d2d copies only — the pod-scale zero-copy
        refresh (VERDICT r3 item 4)."""
        import jax.numpy as jnp
        from emdr2_tpu.parallel.distributed import make_global_array
        procs = jax.process_count()
        rank = jax.process_index()
        n = len(self.corpus)
        assert out_rows >= n, (out_rows, n)
        d = self.cfg.index.embed_dim
        dtype = self.cfg.index.dtype
        sharding = NamedSharding(self.mesh, P(self.mesh.axis_names, None))
        buf = jax.jit(lambda: jnp.zeros((out_rows, d), dtype),
                      out_shardings=sharding)()
        if not hasattr(self, "_place_fns"):
            self._place_fns = {}
        bs = self.batch_size
        per = bs // procs                # this process's rows per batch
        params = self.place_params(params)
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            doc_ids = np.arange(start + 1, stop + 1)
            if stop - start < bs:  # pad tail batch to keep shapes static
                doc_ids = np.concatenate(
                    [doc_ids, np.full(bs - (stop - start), stop, np.int64)])
            local_ids = doc_ids[rank * per: (rank + 1) * per]
            ids, types = self._format_rows(local_ids)
            ids_g = make_global_array(self.mesh, ids, P("dp"))
            types_g = make_global_array(self.mesh, types, P("dp"))
            emb = self._embed(params, ids_g, types_g)
            # update size shrinks only when the buffer tail is closer than
            # one batch (dynamic_update_slice clamps starts — never let the
            # write window slide backwards over real rows)
            size = min(bs, out_rows - start)
            if size not in self._place_fns:
                self._place_fns[size] = jax.jit(
                    lambda b, e, s, _n=size: jax.lax.dynamic_update_slice_in_dim(
                        b, e[:_n].astype(b.dtype), s, axis=0),
                    donate_argnums=(0,), out_shardings=sharding)
            buf = self._place_fns[size](buf, emb, start)
            if progress is not None:
                progress(stop, n)
        return buf

    def build_store(self, params, path: Optional[str] = None) -> EmbeddingStore:
        emb = self.embed_corpus(params)
        store = EmbeddingStore(emb.shape[1], np.float16)
        store.ids = np.arange(1, len(emb) + 1, dtype=np.int64)
        store.embeddings = emb
        if path is not None:
            store.save(path)
        return store
