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
from emdr2_tpu.ops.mips import mips_topk, quantize_int8, row_alignment


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

        assert cfg.quantize in ("none", "int8"), cfg.quantize
        self.quantized = cfg.quantize == "int8"
        if self.quantized:
            # scales are one-per-group_size-rows; the kernel-aligned shard
            # layout guarantees divisibility
            assert shard_rows % cfg.group_size == 0, (shard_rows,
                                                      cfg.group_size)
        self._sharding = NamedSharding(mesh, P(mesh.axis_names, None))
        self._scale_sharding = NamedSharding(mesh, P(mesh.axis_names))
        self._quantize_jit = None
        # (embeddings, scales) live as ONE tuple swapped by a single
        # attribute assignment: search() (which may run on the prefetch
        # thread, training/prefetch.py) snapshots the pair once, so a
        # concurrent refresh can never pair new scales with old int8 rows.
        # No eager .delete() on the old pair either — the prefetch thread
        # may still be dispatching a search on it; the buffers free when
        # the last reference dies (refcount), i.e. at worst one batch later.
        self._data: Tuple[jax.Array, Optional[jax.Array]] = (
            self._to_device(embeddings))
        if passage_ids is None:
            passage_ids = np.arange(1, n + 1, dtype=np.int64)
        assert passage_ids.shape == (n,)
        self.row_to_passage_id = passage_ids
        self._search_fns = {}

    @property
    def embeddings(self) -> jax.Array:
        return self._data[0]

    @property
    def scales(self) -> Optional[jax.Array]:
        return self._data[1]

    # ---- device placement ----------------------------------------------------

    def _to_device(self, embeddings: np.ndarray
                   ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Host embeddings -> a fresh (device rows, device scales) pair.
        Pure: does not touch ``self._data`` (callers swap it atomically)."""
        n, d = embeddings.shape
        dtype = self.cfg.dtype
        new_scales = None

        if self.quantized:
            g = self.cfg.group_size
            # quantize once on host (pad the tail group with zeros — they
            # quantize to 0 and the group scale comes from the real rows)
            n_q = _round_up(n, g)
            src = embeddings
            if n_q != n:
                src = np.zeros((n_q, d), np.float32)
                src[:n] = embeddings
            q8, scales = quantize_int8(np.asarray(src, np.float32), g)
            new_scales = self._scales_to_device(scales)
            embeddings, dtype, n = q8, jnp.int8, n_q

        # cast to the index dtype on HOST so the H2D transfer moves the
        # final bytes (uploading fp32 and casting on device moves twice the
        # bytes AND pays a device-side cast; measured 4.7x on the refresh
        # bench over the tunnel link: 43.5 s -> 9.3 s at 131k x 768)
        np_dtype = np.dtype(dtype)

        def shard_cb(index):
            # index is a tuple of slices into the padded [n_padded, d] array
            rows = index[0]
            start, stop = rows.start or 0, rows.stop or self.n_padded
            block = np.zeros((stop - start, d), np_dtype)
            src_stop = min(stop, n)
            if src_stop > start:
                block[: src_stop - start] = embeddings[start:src_stop]
            return jnp.asarray(block)

        return (jax.make_array_from_callback(
            (self.n_padded, d), self._sharding, shard_cb), new_scales)

    def _scales_to_device(self, scales: np.ndarray) -> jax.Array:
        """Place host per-group scales, padded with 1.0 (all-pad groups must
        keep NEG_INF-masked candidates hugely negative after scaling)."""
        g = self.cfg.group_size
        n_groups = self.n_padded // g

        def cb(index):
            rows = index[0]
            start = rows.start or 0
            stop = rows.stop if rows.stop is not None else n_groups
            block = np.ones(stop - start, np.float32)
            have = min(stop, scales.shape[0]) - start
            if have > 0:
                block[:have] = scales[start:start + have]
            return jnp.asarray(block)

        return jax.make_array_from_callback(
            (n_groups,), self._scale_sharding, cb)

    def _scales_from_local(self, local_scales: np.ndarray,
                           start_group: int) -> jax.Array:
        """Per-process variant of :meth:`_scales_to_device`: ``local_scales``
        covers this process's full group range starting at ``start_group``;
        other processes build their own blocks — no cross-host traffic."""
        n_groups = self.n_padded // self.cfg.group_size

        def cb(index):
            rows = index[0]
            s = rows.start or 0
            e = rows.stop if rows.stop is not None else n_groups
            return jnp.asarray(
                local_scales[s - start_group: e - start_group],
                jnp.float32)

        return jax.make_array_from_callback(
            (n_groups,), self._scale_sharding, cb)

    def _dummy_scales(self) -> jax.Array:
        """One-fp32-per-device placeholder fed to the search program when the
        index is unquantized (shard_map needs a concrete operand; the kernel
        never reads it and XLA dead-code-eliminates it)."""
        if getattr(self, "_dummy", None) is None:
            self._dummy = jax.make_array_from_callback(
                (self.n_devices,), self._scale_sharding,
                lambda index: jnp.ones(1, jnp.float32))
        return self._dummy

    def update(self, embeddings: np.ndarray,
               passage_ids: Optional[np.ndarray] = None) -> None:
        """Hot-swap the index contents (same shape) with fresh embeddings —
        the per-refresh path (replaces update_index, emdr2_index.py:232-239).
        """
        assert embeddings.shape[0] == self.n_real
        if passage_ids is not None:
            self.row_to_passage_id = passage_ids
        self._data = self._to_device(embeddings)   # atomic pair swap

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

        new_scales = None
        if self.quantized:
            g = self.cfg.group_size
            # quantize this process's full row block (zero tail rows form
            # all-zero groups -> scale 1.0, quantize_int8's contract)
            full = np.zeros((stop - start, d), np.float32)
            full[: local_rows.shape[0]] = local_rows
            q8, local_scales = quantize_int8(full, g)
            new_scales = self._scales_from_local(local_scales, start // g)
            local_rows, dtype = q8, jnp.int8

        np_dtype = np.dtype(dtype)   # cast on host: upload the final bytes

        def shard_cb(index):
            rows = index[0]
            s = rows.start or 0
            e = rows.stop if rows.stop is not None else self.n_padded
            assert start <= s and e <= stop, (
                "addressable shard outside this process's row range — "
                "device order is not process-contiguous")
            block = np.zeros((e - s, d), np_dtype)
            have = min(e, start + local_rows.shape[0]) - s
            if have > 0:
                block[:have] = local_rows[s - start: s - start + have]
            return jnp.asarray(block)

        if passage_ids is not None:
            self.row_to_passage_id = passage_ids
        self._data = (jax.make_array_from_callback(
            (self.n_padded, d), self._sharding, shard_cb), new_scales)

    def _reshard_local(self, arr: jax.Array) -> jax.Array:
        """Move an embed-mesh-sharded slab onto this index's mesh with
        PER-PROCESS-LOCAL device-to-device copies only — the multi-host
        zero-copy swap. Works because both shardings are row-wise,
        equal-per-device, and device order is process-contiguous, so each
        process's row block is identical under both meshes: every target
        shard's rows already live on this host's source devices. Each copy
        is a single-device slice + device_put (no collectives — safe to run
        from any thread, no cross-controller enqueue-order hazard)."""
        shape = (self.n_padded, self.cfg.embed_dim)
        src = sorted(arr.addressable_shards,
                     key=lambda s: s.index[0].start or 0)
        tgt_map = self._sharding.addressable_devices_indices_map(shape)
        pieces = []
        devs = []
        for dev, idx in tgt_map.items():
            rows = idx[0]
            ts = rows.start or 0
            te = rows.stop if rows.stop is not None else self.n_padded
            parts = []
            for sh in src:
                ss = sh.index[0].start or 0
                se = sh.index[0].stop if sh.index[0].stop is not None \
                    else self.n_padded
                lo, hi = max(ts, ss), min(te, se)
                if lo < hi:
                    parts.append(jax.device_put(
                        sh.data[lo - ss: hi - ss], dev))
            got = sum(p.shape[0] for p in parts)
            assert got == te - ts, (
                f"target rows [{ts},{te}) only {got} rows on local embed "
                "devices — embed/train meshes are not process-aligned")
            pieces.append(parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=0))
            devs.append(dev)
        return jax.make_array_from_single_device_arrays(
            shape, self._sharding, pieces)

    def swap_device_array(self, new_embeddings: jax.Array) -> None:
        """Swap in an already-on-device (correctly sharded) matrix — the
        zero-copy path used by the async embedder sub-mesh. With an int8
        index the float slab is quantized in one jitted device pass
        (reads bf16, writes int8 + per-group scales; still no host bounce).

        Multi-host: the slab arrives sharded over the (disjoint, process-
        aligned) embed mesh; ``_reshard_local`` moves it with intra-host
        d2d copies — no host bounce, no cross-host traffic.
        """
        assert new_embeddings.shape == (self.n_padded, self.cfg.embed_dim)
        if jax.process_count() > 1 and not (
                isinstance(new_embeddings.sharding, NamedSharding)
                and new_embeddings.sharding.mesh == self.mesh):
            new_embeddings = self._reshard_local(new_embeddings)
        if self.quantized:
            if self._quantize_jit is None:
                g = self.cfg.group_size
                self._quantize_jit = jax.jit(
                    lambda e: quantize_int8(e, g),
                    out_shardings=(self._sharding, self._scale_sharding))
            q8, sc = self._quantize_jit(
                jax.device_put(new_embeddings, self._sharding))
            self._data = (q8, sc)                  # atomic pair swap
            return
        self._data = (jax.device_put(new_embeddings, self._sharding), None)

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
        quantized = self.quantized

        def local_search(q_local, shard_local, scales_local):
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
                n_valid=n_valid, interpret=interpret,
                shard_scales=scales_local if quantized else None)
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
            in_specs=(q_spec, P(axes, None), P(axes)),
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
        # int8 index: keep queries fp32 — mips_topk quantizes them per-query
        # inside; casting to the storage dtype first would double the error
        q = jnp.asarray(
            query_embeds, jnp.float32 if self.quantized else self.cfg.dtype)
        # snapshot the (rows, scales) pair ONCE: search may run on the
        # prefetch thread concurrently with a refresh swapping self._data
        emb, scales = self._data
        if scales is None:
            scales = self._dummy_scales()
        return self._search_fns[key](q, emb, scales)

    def lookup_passage_ids(self, rows) -> np.ndarray:
        """Vectorized row -> passage-id mapping on host."""
        return np.take(self.row_to_passage_id, np.asarray(rows), mode="clip")
