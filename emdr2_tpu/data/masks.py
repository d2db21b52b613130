"""Attention mask utilities.

Behavioral parity with the reference mask helpers
(``/root/reference/megatron/data/mask_creation_utils.py:5-42``): a token id is
"real" iff ``id >= 1`` (id 0 = pad), and masks mark *allowed* attention with
True. Unlike the reference (which builds int64 masks on CPU per batch), these
are pure jnp functions meant to be traced inside the jitted step — masks are
bool and fuse into the attention softmax.
"""

from __future__ import annotations

import jax.numpy as jnp


def padding_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """[..., L] token ids -> [..., L] bool, True where the token is real.

    Parity: ``token >= 1`` (mask_creation_utils.py:11).
    """
    return ids >= 1


def attention_mask(source_ids: jnp.ndarray, target_ids: jnp.ndarray) -> jnp.ndarray:
    """[B, S], [B, T] -> [B, S, T] bool; True = position may attend.

    Parity with ``make_attention_mask_3d`` (mask_creation_utils.py:17-26).
    """
    return padding_mask(source_ids)[..., :, None] & padding_mask(target_ids)[..., None, :]


def causal_mask(length: int) -> jnp.ndarray:
    """[L, L] lower-triangular bool mask (make_history_mask, :29-42)."""
    idx = jnp.arange(length)
    return idx[None, :] <= idx[:, None]


def self_attention_mask(ids: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
    """[B, L] ids -> [B, L, L] allowed-attention mask, optionally causal.

    The reference composes pad and history masks by elementwise product
    (e.g. ``t5_model.py:33-41`` consumes pre-built 3D masks).
    """
    mask = attention_mask(ids, ids)
    if causal:
        mask = mask & causal_mask(ids.shape[-1])[None, :, :]
    return mask


def padding_bias(ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] token ids -> [B, L] additive bias masking pad *keys*.

    For padding-only (non-causal) self-attention the full [B, 1, L, L] bias of
    ``mask_to_bias(self_attention_mask(ids))`` is redundant: the mask is the
    outer product pad[i] & pad[j], and query-side pad rows are never consumed
    downstream (CLS readout, key-masked cross-attention, loss masks). Keeping
    only the key side is identical at every consumed position, shrinks the
    bias from O(B*L^2) to O(B*L) — at the flagship FiD shape (B*K=400, L=512)
    a 400 MB fp32 buffer that never gets built — and is the exact input the
    flash attention kernel consumes (``ops/fid_attention.py``).
    """
    return mask_to_bias(padding_mask(ids), dtype)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Bool allowed-mask -> additive attention bias (0 or large negative).

    Replaces the reference's fused scale-mask-softmax CUDA kernels
    (``megatron/fused_kernels/``): on TPU the additive bias folds into the
    attention softmax and XLA fuses it; a finite large-negative (not -inf)
    keeps fully-masked rows NaN-free.
    """
    return jnp.where(mask, jnp.zeros((), dtype), jnp.asarray(-1e9, dtype))
