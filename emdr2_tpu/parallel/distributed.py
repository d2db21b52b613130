"""Multi-host (pod-scale) execution support.

Replaces the reference's torch.distributed TCP rendezvous
(``/root/reference/megatron/initialize.py:76-110``: MASTER_ADDR/PORT env,
``init_process_group``) and its MP-group input broadcast
(``megatron/mpu/data.py:33-117``) with the JAX single-program multi-process
model:

- ``init_distributed`` wires ``jax.distributed.initialize`` so N processes
  (one per host) form one global device mesh; collectives ride ICI/DCN, and
  on the CPU backend (tests) they ride Gloo.
- Each process feeds ONLY its slice of the global batch
  (``DistributedBatchSampler`` order) and assembles global device arrays
  with ``jax.make_array_from_process_local_data`` — the TPU-native analog
  of per-rank DataLoaders + broadcast_data.
- Host-side readback of sharded results goes through ``host_local_rows``
  (this process's addressable shards, in row order) — the analog of each
  rank keeping its slice after the MIPS broadcast
  (``emdr2_model.py:454-455``).

Single-process behavior is the identity: every helper degrades to the
obvious local operation, so the same task code runs unchanged on one chip,
one host, or a pod.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX. No-op (returns False) unless a
    multi-process launch is requested via arguments or the standard env vars
    (EMDR2_COORDINATOR / EMDR2_NUM_PROCESSES / EMDR2_PROCESS_ID — the analog
    of MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE, initialize.py:95-110).

    On TPU pods, ``jax.distributed.initialize()`` can usually infer
    everything from the environment; pass ``num_processes`` explicitly to
    force initialization with inference.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "EMDR2_COORDINATOR")
    if num_processes is None and "EMDR2_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["EMDR2_NUM_PROCESSES"])
    if process_id is None and "EMDR2_PROCESS_ID" in os.environ:
        process_id = int(os.environ["EMDR2_PROCESS_ID"])
    if num_processes is None or num_processes <= 1:
        return False
    # CPU backend (tests / virtual meshes): cross-process collectives need
    # the Gloo implementation
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in platforms or jax.config.jax_platforms == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns single-writer side effects (tracker
    files, logs) — the reference's rank-0 (``print_rank_0``,
    checkpointing.py:135-142)."""
    return jax.process_index() == 0


def make_global_array(mesh: Mesh, local: np.ndarray,
                      spec: P = P("dp")) -> jax.Array:
    """Assemble a globally-sharded array from this process's local rows
    (``jax.make_array_from_process_local_data``). With one process this is
    just a device_put with the given sharding."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)  # no host round-trip
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


def make_global_batch(mesh: Mesh, tree: Any, spec: P = P("dp")) -> Any:
    """Tree-mapped ``make_global_array`` over a batch pytree."""
    return jax.tree_util.tree_map(
        lambda x: make_global_array(mesh, x, spec), tree)


def host_local_rows(global_array: jax.Array) -> np.ndarray:
    """This process's rows of a leading-axis-sharded global array, in row
    order. Arrays replicated over a secondary mesh axis (tp) produce one
    addressable shard per replica; duplicates are dropped by row range.
    With one process, equivalent to ``np.asarray(global_array)``."""
    if jax.process_count() == 1:
        return np.asarray(global_array)
    by_start = {}
    for s in global_array.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)])
