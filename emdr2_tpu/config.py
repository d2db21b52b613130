"""Configuration system for emdr2_tpu.

The reference uses a single argparse tree with global singletons
(``/root/reference/megatron/arguments.py:24-148``, ``global_vars.py:35-250``).
We replace that with plain frozen dataclasses composed into one ``EMDR2Config``,
passed explicitly — no process-global state, which keeps everything jit- and
test-friendly.

Defaults reproduce the flagship NQ recipe
(``/root/reference/examples/openqa/emdr2_nq.sh:38-103``): BERT-base retriever,
T5-base reader, top-50 retrieval, seq lengths 512/256/32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


def _field(**kw):
    return dataclasses.field(**kw)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Shared transformer trunk hyperparameters.

    Mirrors the reference model args (``/root/reference/megatron/arguments.py:166-216``):
    pre-LN blocks, learned absolute position embeddings, gelu MLP.
    """

    vocab_size: int = 30592          # 30522 padded to a multiple of 128 (tokenizer.py:57-70)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_size: int = 3072
    max_position_embeddings: int = 512
    num_tokentypes: int = 0          # BERT uses 2; T5 uses 0
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layernorm_epsilon: float = 1e-5
    init_std: float = 0.02           # init_method_std (arguments.py:200)
    # MLP / LM-head activation. "erf" (exact, torch F.gelu) is the
    # reference's DEFAULT and what every published checkpoint was trained
    # with — --bias-gelu-fusion (the tanh approximation,
    # fused_bias_gelu.py:31-60) is opt-in and no flagship script passes it
    # (transformer.py:80-83, bert_model.py:87-91). "tanh" provided for
    # checkpoints trained with the fusion flag.
    gelu_variant: str = "erf"        # erf | tanh
    # output-layer init is always scaled by 1/sqrt(2*num_layers)
    # (model/utils.py:33-41) — see models/layers.py:scaled_init
    dtype: jnp.dtype = jnp.bfloat16  # compute dtype; params always fp32
    # Dormant-at-runtime TP in the reference (dualencoder_model.py:15 asserts MP==1)
    # is first-class here: logical axis names resolved against the mesh.
    remat: bool = False              # activation checkpointing (transformer.py:621-646)
    # What the per-layer checkpoint saves. "nothing" (the default) is the
    # reference-equivalent full recompute — minimum HBM, backward re-runs
    # the forward (~4/3x model FLOPs). "dots_no_batch" saves the projection
    # and MLP matmul outputs (dots with no batch dims) so the backward only
    # recomputes attention — ~25% less recompute for ~seq*hidden-per-layer
    # extra HBM; use when the chip has headroom (e.g. v5p, or B below 4).
    remat_policy: str = "nothing"    # nothing | dots_no_batch
    # Layer parameter sharing (transformer.py:594-616): None = no sharing.
    num_unique_layers: Optional[int] = None
    param_sharing_style: str = "grouped"  # grouped | spaced
    # Flash-style Pallas kernel for FiD decoder cross-attention (training
    # path): avoids materializing [B, nh, Ld, K*512] scores. Attention
    # dropout runs INSIDE the kernel (identical counter-based mask in
    # forward and backward).
    fid_flash_attention: bool = False
    flash_key_chunk: int = 512
    # The device mesh the flash kernels shard_map over (``pallas_call`` has
    # no GSPMD partitioning rule — unwrapped, the partitioner replicates its
    # operands, all-gathering the whole qkv/kv slab onto every device).
    # Bound by tasks via ``parallel.mesh.bind_mesh``; None = unsharded call
    # (single chip, or CPU tests without a mesh).
    mesh: Optional[object] = None

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads


def bert_base(**overrides) -> TransformerConfig:
    return dataclasses.replace(
        TransformerConfig(num_tokentypes=2, max_position_embeddings=512), **overrides
    )


def t5_base(**overrides) -> TransformerConfig:
    # T5 tokenizer = BERT wordpiece + [BOS]/[EOS] + 100 sentinels, padded to 128
    # (reference global_vars.py:103-109, tokenizer/tokenizer.py:135-179) -> 30624 -> pad 30720.
    return dataclasses.replace(
        TransformerConfig(vocab_size=30720, num_tokentypes=0, max_position_embeddings=512),
        **overrides,
    )


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    """Dual-encoder retriever (reference ``model/dualencoder_model.py``)."""

    encoder: TransformerConfig = _field(default_factory=bert_base)
    embed_dim: int = 768             # CLS hidden state used raw (dualencoder_model.py:176-179)
    seq_len: int = 256               # retriever context length (emdr2_nq.sh:48)
    query_seq_len: int = 64


@dataclasses.dataclass(frozen=True)
class ReaderConfig:
    """T5 Fusion-in-Decoder reader (reference ``model/t5_model.py``)."""

    transformer: TransformerConfig = _field(default_factory=t5_base)
    seq_len: int = 512               # query + extended context (emdr2_nq.sh:47)
    decoder_seq_len: int = 32        # (emdr2_nq.sh:49)


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    """Sharded flat MIPS index over evidence embeddings.

    Replaces the reference's FAISS / DistributedBruteForceIndex
    (``/root/reference/megatron/data/emdr2_index.py:103-305``): the [N, d]
    matrix lives sharded over device HBM and is searched by a fused Pallas
    dot-product+top-k kernel with an all_gather candidate merge.
    """

    embed_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    topk: int = 50                   # --topk-retrievals (emdr2_nq.sh:96)
    allow_trivial_doc: bool = True   # else fetch K+1 and drop the source doc (emdr2_model.py:389-391)
    # Pallas kernel tuning (swept on v5e at the 1.3M-row shard scale with
    # cands_per_group=2: 50.7k q/s/chip, 5x the >=10k/s baseline target;
    # qt=512 was optimal for the top-1-candidate variant, qt=256 for top-2).
    chunk_rows: int = 8192           # evidence rows per kernel tile
    group_size: int = 128            # candidate group-max reduction factor
    query_tile: int = 256
    # candidates kept per group: 2 = near-exact (misses need a 3-way
    # group collision, <1e-4 expected per query at k=51/N=1.3M); 1 = fastest
    cands_per_group: int = 2
    exact: bool = False              # exact top-k (tests / CPU) vs fused candidate kernel
    # "int8": store the index as int8 rows + one fp32 scale per group_size
    # rows (ops/mips.quantize_int8) — HALVES index HBM (2 GB -> 1 GB/chip at
    # the 21M/16 shard scale) at ~the same search throughput (the VPU
    # reduction, not the MXU scan, bounds the kernel). Costs ~0.1% relative
    # score error; measured top-20 recall ~0.975 on random (worst-case,
    # tightly-packed-score) data vs the bf16 kernel's 1.000. Opt-in for
    # memory-constrained deployments (bigger corpus shard per chip).
    quantize: str = "none"           # "none" | "int8"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.

    The reference splits 16 GPUs into a trainer group and an indexer group
    (``mpu/initialize.py:255-263``). Here one global mesh carries named axes
    and the embedder work runs on a sub-mesh slice of the same program.
    """

    dp: int = 1                      # data-parallel axis size
    tp: int = 1                      # tensor-parallel axis size
    axis_names: Tuple[str, str] = ("dp", "tp")
    # Devices reserved for the async embedder sub-mesh (the reference's
    # indexer group: 8 of 16 GPUs, ``mpu/initialize.py:255-263``). The train
    # mesh takes the first dp*tp devices; the embedder takes the next
    # ``embed_devices`` — fully disjoint, so re-embedding never steals a
    # cycle from the train step. 0 = no sub-mesh (embedder shares devices).
    embed_devices: int = 0


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + clip + LR schedule (reference ``training.py:73-101``,
    ``learning_rates.py:23-123``). bf16 compute / fp32 params replaces the
    reference's FP16_Optimizer + dynamic loss scaling (``fp16/``)."""

    lr: float = 2e-5
    min_lr: float = 0.0
    weight_decay: float = 0.1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    clip_grad: float = 1.0
    lr_decay_style: str = "linear"   # linear|cosine|exponential|constant
    warmup: float = 0.01             # fraction of total iters (emdr2_nq.sh:84)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8              # per-replica (emdr2_nq.sh:45)
    train_iters: Optional[int] = None  # derived from epochs x len(loader) if None
    epochs: int = 10
    seed: int = 1234
    log_interval: int = 20
    save_interval: int = 500
    eval_interval: int = 500
    exit_interval: Optional[int] = None
    index_reload_interval: int = 500  # steps between index refreshes (emdr2_nq.sh:102)
    async_save: bool = True          # interval saves stage + write in the
    # background (tracker updated only after the checkpoint is durable);
    # exit/timeout/final saves are always synchronous. --sync-save disables.
    optimizer: OptimizerConfig = _field(default_factory=OptimizerConfig)


@dataclasses.dataclass(frozen=True)
class EMDR2Config:
    """Top-level joint model + training configuration."""

    retriever: RetrieverConfig = _field(default_factory=RetrieverConfig)
    reader: ReaderConfig = _field(default_factory=ReaderConfig)
    index: IndexConfig = _field(default_factory=IndexConfig)
    mesh: MeshConfig = _field(default_factory=MeshConfig)
    train: TrainConfig = _field(default_factory=TrainConfig)
    # EMDR2 objective flags (reference tasks args, tasks/run.py:12-45)
    update_retriever: bool = True    # train the retriever through topk_log_probs
    retriever_score_scaling: bool = True  # divide scores by sqrt(d) (emdr2_model.py:137-141)
    use_kl_div_loss: bool = False    # KL variant (train_e2eqa.py:184-214)

    def replace(self, **kw) -> "EMDR2Config":
        return dataclasses.replace(self, **kw)


def tiny_config(**overrides) -> EMDR2Config:
    """A tiny configuration for unit tests and compile checks."""
    enc = TransformerConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, ffn_size=128,
        max_position_embeddings=128, num_tokentypes=2, hidden_dropout=0.0,
        attention_dropout=0.0, dtype=jnp.float32,
    )
    t5c = dataclasses.replace(enc, vocab_size=640, num_tokentypes=0)
    cfg = EMDR2Config(
        retriever=RetrieverConfig(encoder=enc, embed_dim=64, seq_len=32, query_seq_len=16),
        reader=ReaderConfig(transformer=t5c, seq_len=48, decoder_seq_len=8),
        index=IndexConfig(embed_dim=64, topk=4, chunk_rows=256, group_size=8,
                          query_tile=8, dtype=jnp.float32),
        train=TrainConfig(batch_size=2, epochs=1),
    )
    return cfg.replace(**overrides) if overrides else cfg
