"""Asynchronous evidence-index refresh.

Replaces the reference's trainer/indexer process split
(``/root/reference/tasks/openqa/e2eqa/async_indexer.py`` + the trainer-side
protocol in ``train_e2eqa.py:437-508``): 8 GPUs run a perpetual re-embedding
loop, shipping embeddings through a 32 GB pickle and weights through torch
checkpoints, with 1-element Gloo broadcasts (``NEW_INDEX_READY`` /
``NEW_CHKPT_READY``) as the control plane.

TPU-native, single-program design: a background thread drives the embedder
work on the builder's mesh. With ``MeshConfig.embed_devices > 0`` that mesh
is a truly disjoint device sub-mesh (``parallel.build_meshes``) — the
embedder's jitted program is compiled against devices the train step never
touches, so re-embedding runs concurrently with training at the hardware
level, exactly like the reference's 8 dedicated indexer GPUs. Data plane is
memory — retriever weights are handed to the worker as a host snapshot and
committed to the embed mesh once per refresh
(``EvidenceIndexBuilder.place_params``), finished embeddings are handed back
as a host array hot-swapped into the ShardedEvidenceIndex — and the control
plane is two events mirroring the reference's READY/CHKPT ordering:

    trainer                         embedder thread
    -------                         ---------------
    publish_weights(params) ----->  wait weights
    ... train steps ...             embed corpus with those weights
    maybe_swap(): index ready? <--- publish embeddings, wait next weights
      yes: index.update(emb)
           publish_weights(fresh)

The trainer's index and the embedder's weights are always one refresh
interval stale — by design (the paper's stale-index approximation,
SURVEY.md §3.4).
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Optional

import jax
import numpy as np

from emdr2_tpu.retrieval.builder import EvidenceIndexBuilder
from emdr2_tpu.retrieval.index import ShardedEvidenceIndex


class AsyncIndexRefresher:
    def __init__(self, builder: EvidenceIndexBuilder,
                 index: ShardedEvidenceIndex,
                 reload_interval: int,
                 extract_retriever: Callable[[Any], Any] = lambda p: p,
                 on_refresh: Optional[Callable[[int], None]] = None,
                 zero_copy: bool = False):
        """``extract_retriever`` maps the train-state params to the params
        pytree the builder's embed fn expects (identity when the builder
        wraps the full EMDR2 model).

        ``zero_copy``: keep the freshly-embedded matrix on the builder's
        devices and swap it into the index with device-to-device transfers
        (``swap_device_array``) instead of bouncing ~2 GB/chip through the
        host. Multi-host capable (VERDICT r3 item 4): each host's embedder
        devices accumulate their process-contiguous block of the global
        slab, and the swap repartitions onto the train mesh with intra-host
        d2d copies only (``ShardedEvidenceIndex._reshard_local``)."""
        self.builder = builder
        self.index = index
        self.reload_interval = reload_interval
        self.extract = extract_retriever
        self.on_refresh = on_refresh
        self.zero_copy = zero_copy
        if jax.process_count() > 1:
            # Multi-controller hazard: the worker thread issues globally-
            # jitted collectives. If those run on devices the trainer also
            # uses, each process may enqueue the two programs in a different
            # order -> cross-host collective deadlock. A single controller
            # orders all launches itself, so single-process sharing is safe;
            # multi-host requires hardware disjointness (the reference gets
            # this for free from its 8-trainer/8-indexer rank split).
            shared = (set(builder.mesh.devices.flat)
                      & set(index.mesh.devices.flat))
            if shared:
                raise ValueError(
                    "multi-host async refresh needs a disjoint embedder "
                    "sub-mesh (--embed-devices N): the embedder's mesh "
                    f"shares {len(shared)} device(s) with the train mesh, "
                    "and two controllers issuing collectives on shared "
                    "devices in different orders can deadlock. Use "
                    "--embed-devices or the synchronous refresher.")

        self._weights = None
        self._weights_ready = threading.Event()
        self._result: Optional[np.ndarray] = None
        self._result_lock = threading.Lock()
        self._stop = threading.Event()
        self._last_reload_step = 0
        self.refresh_count = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False
        self.error: Optional[BaseException] = None

    # ------------------------------------------------------------- trainer

    def start(self, params) -> None:
        """Publish initial weights and start the embedder loop (the
        reference's initial NEW_CHKPT_READY broadcast, train_e2eqa.py:444-447)."""
        self._publish_weights(params)
        self._thread.start()
        self._started = True

    def _publish_weights(self, params) -> None:
        # snapshot: device->device copy so the trainer can donate/overwrite
        # its own params freely afterwards
        snap = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            self.extract(params))
        self._weights = snap
        self._weights_ready.set()

    def maybe_swap(self, step: int, params) -> bool:
        """Call every train step. At interval boundaries, if the embedder
        finished, hot-swap the index and hand over fresh weights. Never
        blocks training (parity with the is_completed() poll,
        train_e2eqa.py:477-508 — minus the 5-second sleeps)."""
        if self.error is not None:
            raise RuntimeError("async embedder failed") from self.error
        if step - self._last_reload_step < self.reload_interval:
            return False
        with self._result_lock:
            ready = self._result is not None
        if jax.process_count() > 1:
            # Readiness is a per-process wall-clock race (each host's
            # embedder thread finishes at its own time). Swapping must
            # happen at the SAME iteration on every controller — the swap
            # feeds the engine's collective checkpoint save, and
            # _last_reload_step/_publish_weights must stay in lockstep so
            # all hosts embed the next index from the same weight version.
            # Agree via a collective restricted to the TRAIN mesh (safe:
            # called from the main thread at a deterministic step on every
            # process, and multi-host requires the embedder on a DISJOINT
            # sub-mesh, so this never races the worker thread's embed
            # collectives — multihost_utils.process_allgather would build
            # an all-device mesh and reintroduce exactly that enqueue-order
            # race). The reference gets this ordering from its blocking
            # Gloo broadcasts (async_indexer.py:116-144).
            ready = self._all_ready_on_train_mesh(ready)
        if not ready:
            return False
        with self._result_lock:
            emb, self._result = self._result, None
        if emb is None:
            return False
        if isinstance(emb, jax.Array):      # zero-copy: device-resident
            self.index.swap_device_array(emb)
        elif jax.process_count() > 1:
            # emb holds only this process's index-shard rows — swapped in
            # with zero cross-host traffic
            self.index.update_from_process_local(emb)
        else:
            self.index.update(emb)
        self._last_reload_step = step
        self.refresh_count += 1
        self._publish_weights(params)
        if self.on_refresh is not None:
            self.on_refresh(step)
        return True

    def _all_ready_on_train_mesh(self, ready: bool) -> bool:
        """Global AND of the per-process readiness flags, computed as one
        jitted min over a train-mesh-sharded int array (one element per
        train device, each process filling its own shards)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.index.mesh
        shape = tuple(mesh.shape[a] for a in mesh.axis_names)
        sh = NamedSharding(mesh, P(*mesh.axis_names))
        flag = np.int32(1 if ready else 0)
        arr = jax.make_array_from_callback(
            shape, sh,
            lambda idx: np.full([1] * len(shape), flag, np.int32))
        if getattr(self, "_agree_fn", None) is None:
            import jax.numpy as jnp
            self._agree_fn = jax.jit(
                jnp.min, out_shardings=NamedSharding(mesh, P()))
        return bool(np.asarray(self._agree_fn(arr)))

    def stop(self, wait: bool = True) -> None:
        self._stop.set()
        self._weights_ready.set()  # unblock the worker
        if wait and self._started:
            self._thread.join(timeout=600)

    def wait_for_result(self, timeout: Optional[float] = None) -> bool:
        """Block until an embedding pass finishes (used by --exit-interval
        style shutdown, train_e2eqa.py:531-544, and by tests)."""
        import time
        deadline = None if timeout is None else time.time() + timeout
        while True:
            with self._result_lock:
                if self._result is not None:
                    return True
            if self.error is not None:
                raise RuntimeError("async embedder failed") from self.error
            if deadline is not None and time.time() > deadline:
                return False
            time.sleep(0.02)

    # ------------------------------------------------------------- worker

    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                self._weights_ready.wait()
                if self._stop.is_set():
                    return
                self._weights_ready.clear()
                params = self._weights
                # multi-host: the embed mesh is guaranteed device-disjoint
                # from the train mesh (enforced in __init__), so the
                # worker's lockstep globally-jitted collectives can never
                # interleave with the trainer's across controllers.
                if self.zero_copy:
                    # device-resident global slab (multi-host: every process
                    # drives the same SPMD loop; its block stays on its own
                    # embedder devices until the local-repartition swap)
                    emb = self.builder.embed_corpus_device(
                        params, out_rows=self.index.n_padded)
                    jax.block_until_ready(emb)
                elif jax.process_count() > 1:
                    # host path: each process embeds only its own
                    # index-shard row range into host RAM
                    emb = self.builder.embed_corpus(
                        params,
                        row_partition=self.index.process_row_range())
                else:
                    emb = self.builder.embed_corpus(params)
                with self._result_lock:
                    self._result = emb
                # wait for the next weight drop (reference: blocking wait on
                # NEW_CHKPT_READY, async_indexer.py:131-144)
        except BaseException as e:  # surface to the trainer thread
            self.error = e


class SynchronousRefresher:
    """Degenerate variant: re-embed inline at each boundary (no overlap) —
    useful on single-chip hardware and as the correctness baseline the async
    path is tested against."""

    def __init__(self, builder: EvidenceIndexBuilder,
                 index: ShardedEvidenceIndex, reload_interval: int,
                 extract_retriever: Callable[[Any], Any] = lambda p: p):
        self.builder = builder
        self.index = index
        self.reload_interval = reload_interval
        self.extract = extract_retriever
        self._last_reload_step = 0
        self.refresh_count = 0

    def start(self, params) -> None:
        pass

    def maybe_swap(self, step: int, params) -> bool:
        if step - self._last_reload_step < self.reload_interval:
            return False
        if jax.process_count() > 1:
            emb = self.builder.embed_corpus(
                self.extract(params),
                row_partition=self.index.process_row_range())
            self.index.update_from_process_local(emb)
        else:
            emb = self.builder.embed_corpus(self.extract(params))
            self.index.update(emb)
        self._last_reload_step = step
        self.refresh_count += 1
        return True

    def stop(self, wait: bool = True) -> None:
        pass
