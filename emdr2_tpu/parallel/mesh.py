"""Device mesh construction and logical-axis partitioning rules.

Replaces the reference's process-group machinery
(``/root/reference/megatron/mpu/initialize.py:53-315``): instead of NCCL/Gloo
groups built from ranks, one ``jax.sharding.Mesh`` carries named axes and all
parallelism is expressed as shardings resolved against it:

- ``dp``  — data parallelism: batch sharding; gradient psum is inserted by
            the compiler (replacing LocalDDP all-reduce,
            ``model/distributed.py:26-76``). The evidence index is also
            sharded over ``dp`` (x ``tp``), replacing the MIPS group
            (``mpu/initialize.py:104-142``).
- ``tp``  — tensor parallelism: mlp/heads/vocab sharding (replacing the
            dormant mpu Column/RowParallel layers, ``mpu/layers.py``).

The trainer/indexer rank split (``init_emdr2_groups``, ``:255-263``) maps to
sub-meshes of the same program — see ``training/async_refresh.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emdr2_tpu.config import MeshConfig

# logical axis -> mesh axis. Activations: batch over dp. Params: mlp/heads/
# vocab over tp (Megatron-style column/row split); embed replicated.
LOGICAL_RULES = (
    ("batch", "dp"),
    ("length", None),
    ("embed", None),
    ("mlp", "tp"),
    ("heads", "tp"),
    ("kv", None),
    ("vocab", "tp"),
)


def build_mesh(cfg: Optional[MeshConfig] = None,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a [dp, tp] mesh. With cfg=None, uses all devices as dp x 1."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(dp=len(devices), tp=1)
    dp, tp = cfg.dp, cfg.tp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, cfg.axis_names)


def build_meshes(cfg: MeshConfig,
                 devices: Optional[Sequence[jax.Device]] = None
                 ) -> tuple:
    """Build the train mesh and (optionally) a disjoint embedder sub-mesh.

    Replaces the reference's trainer/indexer rank split
    (``/root/reference/megatron/mpu/initialize.py:255-263``: TRAIN group
    ``[0, max_training_rank)``, INDEX group ``[max_training_rank, world)``):
    the first ``dp*tp`` devices form the train mesh, the next
    ``cfg.embed_devices`` form an embedder mesh shaped ``(embed_devices, 1)``
    with the same axis names, so the index builder's ``P("dp")`` shardings
    resolve unchanged. Returns ``(train_mesh, embed_mesh_or_None)``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_train = cfg.dp * cfg.tp
    n_embed = cfg.embed_devices
    assert n_train + n_embed <= len(devices), (
        f"mesh wants {n_train} train + {n_embed} embed devices, "
        f"only {len(devices)} available")
    train_mesh = build_mesh(cfg, devices[:n_train])
    if n_embed == 0:
        return train_mesh, None
    embed_grid = np.asarray(devices[n_train: n_train + n_embed]).reshape(
        n_embed, 1)
    return train_mesh, Mesh(embed_grid, cfg.axis_names)


def bind_mesh(cfg, mesh: Optional[Mesh]):
    """Attach ``mesh`` to every transformer config inside an ``EMDR2Config``
    or ``RetrieverConfig`` so the Pallas attention kernels can shard_map
    themselves over it (see ``ops.fid_attention``: ``pallas_call`` has no
    GSPMD partitioning rule — without the wrap, the partitioner replicates
    its operands, all-gathering whole qkv/kv slabs onto every device).

    A model jitted on a DIFFERENT mesh (e.g. the disjoint embedder sub-mesh)
    must be rebound to that mesh first — shard_map over a foreign mesh is a
    device-assignment error.
    """
    import dataclasses
    if hasattr(cfg, "encoder"):                      # RetrieverConfig
        return dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, mesh=mesh))
    enc = dataclasses.replace(cfg.retriever.encoder, mesh=mesh)
    t5c = dataclasses.replace(cfg.reader.transformer, mesh=mesh)
    return cfg.replace(
        retriever=dataclasses.replace(cfg.retriever, encoder=enc),
        reader=dataclasses.replace(cfg.reader, transformer=t5c))


def param_shardings(mesh: Mesh, abstract_variables):
    """Map a pytree of flax logical-partitioning metadata to NamedShardings.

    ``abstract_variables`` is the output of ``jax.eval_shape(model.init, ...)``
    with flax's logical annotations attached.
    """
    logical_spec = nn.get_partition_spec(abstract_variables)
    return nn.logical_to_mesh_sharding(logical_spec, mesh, LOGICAL_RULES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """Sharding for host-fed batch arrays; first axis over dp by default."""
    if not axes:
        axes = ("dp",)
    return NamedSharding(mesh, P(*axes))


def index_sharding(mesh: Mesh) -> NamedSharding:
    """Evidence index rows sharded over every device (dp x tp flattened),
    matching the reference where all 16 GPUs hold index shards
    (``emdr2_index.py:252-256``)."""
    return NamedSharding(mesh, P(("dp", "tp")))
