"""Sharded in-HBM evidence index with fused MIPS search and hot-swap refresh.

Replaces ``FaissMIPSIndex`` and ``DistributedBruteForceIndex``
(``/root/reference/megatron/data/emdr2_index.py:103-305``) and the online
retriever wrapper's collective choreography
(``model/emdr2_model.py:379-470``). The [N, d] embedding matrix lives sharded
row-wise across ALL devices of the mesh (as in the reference, where all 16
GPUs hold shards); search is one jitted shard_map program:

    all_gather queries over dp -> per-device Pallas fused top-k over the
    local shard -> all_gather the (vals, ids) candidates over the whole mesh
    -> static top-k merge -> each dp row keeps its own query block.

``update()`` swaps in a freshly-embedded matrix without touching disk —
replacing the reference's delete-shards / re-unpickle-32GB / re-shard cycle
(emdr2_index.py:232-266).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emdr2_tpu.config import IndexConfig
from emdr2_tpu.ops.mips import mips_topk, row_alignment


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedEvidenceIndex:
    """Flat MIPS index over evidence embeddings, sharded over a mesh.

    row_to_passage_id maps index rows back to corpus passage ids on the host
    (vectorized np.take — replacing the reference's O(nq*k) ``.item()`` loop,
    emdr2_index.py:297-303).
    """

    def __init__(self, mesh: Mesh, cfg: IndexConfig,
                 embeddings: np.ndarray,
                 passage_ids: Optional[np.ndarray] = None):
        self.mesh = mesh
        self.cfg = cfg
        self.n_devices = mesh.devices.size
        n, d = embeddings.shape
        assert d == cfg.embed_dim, (d, cfg.embed_dim)
        self.n_real = n
        # pad rows so every device holds an equal kernel-aligned shard
        # (alignment avoids an in-jit whole-shard pad copy, ops/mips.py)
        align = row_alignment(cfg.chunk_rows, cfg.group_size)
        shard_rows = _round_up(
            _round_up(n, self.n_devices) // self.n_devices, align)
        self.n_padded = shard_rows * self.n_devices
        self.shard_rows = shard_rows

        self._sharding = NamedSharding(mesh, P(mesh.axis_names, None))
        self.embeddings = self._to_device(embeddings)
        if passage_ids is None:
            passage_ids = np.arange(1, n + 1, dtype=np.int64)
        assert passage_ids.shape == (n,)
        self.row_to_passage_id = passage_ids
        self._search_fns = {}

    # ---- device placement ----------------------------------------------------

    def _to_device(self, embeddings: np.ndarray) -> jax.Array:
        n, d = embeddings.shape
        dtype = self.cfg.dtype

        def shard_cb(index):
            # index is a tuple of slices into the padded [n_padded, d] array
            rows = index[0]
            start, stop = rows.start or 0, rows.stop or self.n_padded
            block = np.zeros((stop - start, d), np.float32)
            src_stop = min(stop, n)
            if src_stop > start:
                block[: src_stop - start] = embeddings[start:src_stop]
            return jnp.asarray(block, dtype)

        return jax.make_array_from_callback(
            (self.n_padded, d), self._sharding, shard_cb)

    def update(self, embeddings: np.ndarray,
               passage_ids: Optional[np.ndarray] = None) -> None:
        """Hot-swap the index contents (same shape) with fresh embeddings —
        the per-refresh path (replaces update_index, emdr2_index.py:232-239).
        """
        assert embeddings.shape[0] == self.n_real
        old = self.embeddings
        self.embeddings = self._to_device(embeddings)
        if passage_ids is not None:
            self.row_to_passage_id = passage_ids
        old.delete()

    def process_row_range(self) -> Tuple[int, int]:
        """This process's contiguous [start, stop) slice of the PADDED index
        row space. Mesh axes flatten row-major over ``jax.devices()`` (which
        orders devices by owning process), so each process's addressable
        shards cover one contiguous block of rows; equal-sized across
        processes by construction (n_padded divides evenly over devices)."""
        procs = jax.process_count()
        assert self.n_padded % procs == 0
        rows = self.n_padded // procs
        p = jax.process_index()
        return p * rows, (p + 1) * rows

    def update_from_process_local(self, local_rows: np.ndarray,
                                  passage_ids: Optional[np.ndarray] = None
                                  ) -> None:
        """Hot-swap from per-process row blocks: each process passes ONLY
        the rows of its ``process_row_range()`` (what its local devices
        hold) and no cross-host traffic happens at all — the multi-host
        refresh path replacing the reference's rank-0 pickle merge +
        re-shard cycle (indexer_emdr2.py:107-114, emdr2_index.py:232-266).
        Accepts either the full padded block or the block truncated at
        n_real (the builder's real-corpus rows); missing tail rows are
        zero-filled (they are masked in search via n_valid)."""
        start, stop = self.process_row_range()
        d = self.cfg.embed_dim
        assert local_rows.shape[1] == d
        assert local_rows.shape[0] <= stop - start
        dtype = self.cfg.dtype

        def shard_cb(index):
            rows = index[0]
            s = rows.start or 0
            e = rows.stop if rows.stop is not None else self.n_padded
            assert start <= s and e <= stop, (
                "addressable shard outside this process's row range — "
                "device order is not process-contiguous")
            block = np.zeros((e - s, d), np.float32)
            have = min(e, start + local_rows.shape[0]) - s
            if have > 0:
                block[:have] = local_rows[s - start: s - start + have]
            return jnp.asarray(block, dtype)

        old = self.embeddings
        self.embeddings = jax.make_array_from_callback(
            (self.n_padded, d), self._sharding, shard_cb)
        if passage_ids is not None:
            self.row_to_passage_id = passage_ids
        old.delete()

    def swap_device_array(self, new_embeddings: jax.Array) -> None:
        """Swap in an already-on-device (correctly sharded) matrix — the
        zero-copy path used by the async embedder sub-mesh."""
        assert new_embeddings.shape == (self.n_padded, self.cfg.embed_dim)
        old = self.embeddings
        self.embeddings = jax.device_put(new_embeddings, self._sharding)
        if old is not new_embeddings:
            old.delete()

    # ---- search ----------------------------------------------------------------

    def _build_search(self, k: int, queries_sharded: bool):
        mesh = self.mesh
        axes = mesh.axis_names          # e.g. ("dp", "tp")
        dp_axis = axes[0]
        cfg = self.cfg
        shard_rows = self.shard_rows
        interpret = jax.default_backend() == "cpu"
        n_real = self.n_real
        n_padded = self.n_padded

        def local_search(q_local, shard_local):
            # flattened device rank in row-major (dp, tp) order
            rank = jax.lax.axis_index(axes)
            if queries_sharded:
                # queries arrive sharded over dp, replicated over tp
                q_all = jax.lax.all_gather(q_local, dp_axis, tiled=True)
            else:
                q_all = q_local
            # rows past n_real are zero-padding: mask them in-kernel via
            # n_valid (per-rank real row count) so they can never displace
            # real candidates from the group selection; skipped (None) when
            # the index has no tail padding to avoid the mask's ~8% cost
            n_valid = (jnp.clip(n_real - rank * shard_rows, 0, shard_rows)
                       if n_padded != n_real else None)
            vals, idx = mips_topk(
                q_all, shard_local, k, exact=cfg.exact,
                chunk_rows=cfg.chunk_rows, group_size=cfg.group_size,
                query_tile=cfg.query_tile,
                cands_per_group=getattr(cfg, "cands_per_group", 2),
                n_valid=n_valid, interpret=interpret)
            idx = idx + rank * shard_rows
            # guard padded rows (zero vectors can outscore negatives):
            vals = jnp.where(idx < n_real, vals, -3.0e38)

            av = jax.lax.all_gather(vals, axes)       # [W, nq, k]
            ai = jax.lax.all_gather(idx, axes)
            w = av.shape[0]
            nq = av.shape[1]
            av = jnp.transpose(av, (1, 0, 2)).reshape(nq, w * k)
            ai = jnp.transpose(ai, (1, 0, 2)).reshape(nq, w * k)
            mvals, mpos = jax.lax.top_k(av, k)
            mids = jnp.take_along_axis(ai, mpos, axis=1)
            if queries_sharded:
                b = q_local.shape[0]
                start = jax.lax.axis_index(dp_axis) * b
                mvals = jax.lax.dynamic_slice_in_dim(mvals, start, b, 0)
                mids = jax.lax.dynamic_slice_in_dim(mids, start, b, 0)
            return mvals, mids

        q_spec = P(dp_axis, None) if queries_sharded else P()
        out_spec = (q_spec, q_spec)
        f = jax.shard_map(
            local_search, mesh=mesh,
            in_specs=(q_spec, P(axes, None)),
            out_specs=out_spec, check_vma=False)
        return jax.jit(f)

    def search(self, query_embeds: jax.Array, k: Optional[int] = None,
               queries_sharded: bool = False
               ) -> Tuple[jax.Array, jax.Array]:
        """Top-k search. query_embeds [nq, d] (replicated, or dp-sharded with
        ``queries_sharded=True``). Returns (scores [nq, k] fp32,
        global row ids [nq, k] int32), sharded like the queries."""
        k = k if k is not None else self.cfg.topk
        key = (k, queries_sharded)
        if key not in self._search_fns:
            self._search_fns[key] = self._build_search(k, queries_sharded)
        q = jnp.asarray(query_embeds, self.cfg.dtype)
        return self._search_fns[key](q, self.embeddings)

    def lookup_passage_ids(self, rows) -> np.ndarray:
        """Vectorized row -> passage-id mapping on host."""
        return np.take(self.row_to_passage_id, np.asarray(rows), mode="clip")
