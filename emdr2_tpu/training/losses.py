"""Loss functions: EMDR2 marginalized NLL, KL-divergence variant, reader CE,
and the DPR in-batch-negative contrastive loss.

Parity targets (all numerics verified against numpy goldens in
``tests/test_losses.py``):

- ``emdr2_loss``         <- ``get_loss_and_retriever_utility``
                            (``/root/reference/tasks/openqa/e2eqa/train_e2eqa.py:72-123``)
- ``kl_div_retriever_loss`` <- ``get_kl_div_retriever`` (:184-214)
- ``reader_cross_entropy``  <- CE with ignore_index=0 (:154-160)
- ``dpr_in_batch_loss``     <- contrastive NLL over Q.C^T
                            (``tasks/openqa/dense_retriever/train_dense_retriever.py:130-196``)

TPU-first differences from the reference: the teacher per-document gold
log-probs arrive pre-gathered as [B, K, L] (the model fuses the [B,K,L,V]
gather, ``models/emdr2.py``), and the DPR gradient-preserving all_gather is
``jax.lax.all_gather`` inside the jitted step — the autodiff of all_gather is
exactly the "copy locally, preserve local gradient slice" trick the reference
hand-writes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class EMDR2LossAux(NamedTuple):
    lm_loss: jnp.ndarray
    retriever_loss: jnp.ndarray
    retriever_utility: jnp.ndarray
    null_block_lm_loss: jnp.ndarray


def reader_cross_entropy(lm_logits: jnp.ndarray, labels: jnp.ndarray,
                         loss_mask: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """Token CE averaged over unmasked positions (train_e2eqa.py:154-160).

    lm_logits [B, L, V] fp32, labels [B, L], loss_mask [B, L] float.
    With a ``mesh`` whose last (tp) axis is >1 and divides the shapes, the
    CE routes through ``vocab_parallel_cross_entropy`` so each tp shard
    softmaxes only its own vocab columns (no vocab-axis gather).
    """
    if mesh is not None and mesh.shape[mesh.axis_names[-1]] > 1:
        dp = mesh.shape[mesh.axis_names[0]]
        tp = mesh.shape[mesh.axis_names[-1]]
        if lm_logits.shape[-1] % tp == 0 and lm_logits.shape[0] % dp == 0:
            nll = vocab_parallel_cross_entropy(lm_logits, labels, mesh)
            return jnp.sum(nll * loss_mask) / jnp.sum(loss_mask)
    log_probs = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return -jnp.sum(gold * loss_mask) / jnp.sum(loss_mask)


def emdr2_retriever_loss(gold_log_probs: jnp.ndarray,
                         topk_log_probs: jnp.ndarray,
                         labels: jnp.ndarray,
                         loss_mask: jnp.ndarray,
                         eos_id: int) -> EMDR2LossAux:
    """The EMDR2 marginalized objective (train_e2eqa.py:72-123).

    gold_log_probs [B, K, L]: per-document teacher gold token log-probs
        (stop-gradient w.r.t. params — enforced by the model).
    topk_log_probs [B, K]: retriever doc log-probs (gradient flows here).

    loss = -sum_t mask_t * logsumexp_k(topk_log_probs_k + gold_lp_{k,t}) / sum mask

    Also returns the REALM-style retriever utility (marginal minus last-doc
    log-prob, EOS/sentinel positions masked, :110-119) and the null-block LM
    loss (:121).
    """
    gold_log_probs = gold_log_probs.astype(jnp.float32)
    topk_log_probs = topk_log_probs.astype(jnp.float32)

    # [B, K, L]
    joint = topk_log_probs[:, :, None] + gold_log_probs
    # [B, L]
    marginal = jax.nn.logsumexp(joint, axis=1)

    denom = jnp.sum(loss_mask)
    loss = -jnp.sum(marginal * loss_mask) / denom

    # Retriever utility: marginal vs the LAST retrieved doc as the baseline
    # ("null block"), with EOS and sentinel ids (>= eos_id) masked out.
    utility = marginal - gold_log_probs[:, -1, :]
    util_mask = loss_mask * (labels < eos_id)
    utility = jnp.sum(utility * util_mask) / jnp.maximum(jnp.sum(util_mask), 1.0)

    null_block = -jnp.sum(gold_log_probs[:, -1, :] * loss_mask) / denom
    return EMDR2LossAux(jnp.zeros(()), loss, utility, null_block)


def kl_div_retriever_loss(gold_log_probs: jnp.ndarray,
                          topk_log_probs: jnp.ndarray,
                          loss_mask: jnp.ndarray) -> jnp.ndarray:
    """KL variant (train_e2eqa.py:184-214): teacher doc distribution =
    softmax over K of length-normalized gold log-probs; loss =
    KL(teacher || retriever) with batchmean reduction (matching
    ``F.kl_div(input=log_probs, target=probs)`` = sum_k p_k(log p_k - log q_k) / B).
    """
    gold_log_probs = gold_log_probs.astype(jnp.float32)
    topk_log_probs = topk_log_probs.astype(jnp.float32)
    # [B, K]
    row_tokens = jnp.sum(loss_mask, axis=1)
    denom = jnp.maximum(row_tokens, 1.0)  # guard the division
    teacher_scores = (jnp.sum(gold_log_probs * loss_mask[:, None, :], axis=2)
                      / denom[:, None])
    teacher_probs = jax.nn.softmax(teacher_scores, axis=1)
    teacher_log_probs = jax.nn.log_softmax(teacher_scores, axis=1)
    kl = jnp.sum(teacher_probs * (teacher_log_probs - topk_log_probs), axis=1)
    # a row with zero unmasked tokens carries no supervision: exclude it
    # entirely (a clamped denominator alone would leave a uniform teacher,
    # still pushing the retriever toward uniform for that query)
    kl = jnp.where(row_tokens > 0, kl, 0.0)
    return jnp.sum(kl) / jnp.maximum(jnp.sum(row_tokens > 0), 1)


def emdr2_total_loss(lm_logits, topk_log_probs, gold_log_probs, labels,
                     loss_mask, eos_id: int, update_retriever: bool = True,
                     use_kl_div: bool = False, mesh=None):
    """net_loss = reader CE + retriever loss (train_e2eqa.py:163-181).
    ``mesh`` routes the reader CE vocab-parallel under tp>1 (see
    ``reader_cross_entropy``)."""
    # replace masked labels with 0 as the reference does (:86)
    safe_labels = jnp.where(loss_mask > 0, labels, 0)
    lm_loss = reader_cross_entropy(lm_logits, safe_labels, loss_mask, mesh)
    if not update_retriever:
        zero = jnp.zeros(())
        return lm_loss, EMDR2LossAux(lm_loss, zero, zero, zero)
    if use_kl_div:
        ret_loss = kl_div_retriever_loss(gold_log_probs, topk_log_probs, loss_mask)
        aux = EMDR2LossAux(lm_loss, ret_loss, jnp.zeros(()), jnp.zeros(()))
    else:
        aux = emdr2_retriever_loss(gold_log_probs, topk_log_probs, safe_labels,
                                   loss_mask, eos_id)
        aux = aux._replace(lm_loss=lm_loss)
        ret_loss = aux.retriever_loss
    return lm_loss + ret_loss, aux


def dpr_in_batch_loss(query_embeds: jnp.ndarray,
                      context_embeds: jnp.ndarray,
                      hidden_size: int,
                      score_scaling: bool = False,
                      labels: Optional[jnp.ndarray] = None,
                      axis_name: Optional[str] = None):
    """DPR contrastive NLL with global in-batch negatives
    (train_dense_retriever.py:130-196).

    query_embeds [b, d]; context_embeds [c, d] where c >= b (positives first,
    then hard negatives — reference layout :117-120). When ``axis_name`` is
    given (inside shard_map/pjit with a mapped axis), embeddings are
    all-gathered over the data axis with gradients preserved — jax's
    all_gather autodiff implements the reference's detach-and-replace-own-
    slice trick (:134-158) natively.

    Returns (loss, correct_prediction_count). NOTE: the reference multiplies
    the loss by world_size (:193) to undo DDP grad averaging; with psum-mean
    semantics we instead return the plain mean — caller decides.
    """
    b = query_embeds.shape[0]
    c = context_embeds.shape[0]
    if axis_name is not None:
        # TPU-native form: queries stay local (NLL rows are independent, so
        # computing other shards' rows — as the reference does — is redundant);
        # contexts all-gather over the data axis for global in-batch negatives.
        # all_gather's autodiff reduce-scatters the grad back, which IS the
        # reference's detach-and-replace-own-slice trick (:134-158).
        all_c = jax.lax.all_gather(context_embeds, axis_name)   # [W, c, d]
        world = all_c.shape[0]
        rank = jax.lax.axis_index(axis_name)
        all_c = all_c.reshape(world * c, -1)
        if labels is None:
            # rank i's positives sit at global columns i*c + [0, b)
            labels = rank * c + jnp.arange(b)
    else:
        all_c = context_embeds
        if labels is None:
            labels = jnp.arange(b)

    scores = jnp.matmul(query_embeds, all_c.T, preferred_element_type=jnp.float32)
    if score_scaling:
        scores = scores / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    log_probs = jax.nn.log_softmax(scores, axis=1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    loss = jnp.mean(nll)
    correct = jnp.sum(jnp.argmax(log_probs, axis=1) == labels).astype(jnp.float32)
    if axis_name is not None:
        # global mean over all W*b rows == mean of equal-size per-shard means
        loss = jax.lax.pmean(loss, axis_name)
        correct = jax.lax.psum(correct, axis_name)
    return loss, correct


def vocab_parallel_cross_entropy(logits, labels, mesh):
    """Token CE over VOCAB-SHARDED logits without gathering the vocab axis.

    Parity with ``mpu/cross_entropy.py:25-110`` (the reference's
    _VocabParallelCrossEntropy autograd fn): per-shard max -> global max,
    per-shard sum-exp -> psum, per-shard masked gold pick -> psum; each tp
    shard touches only its own V/tp logit columns. ``reader_cross_entropy``
    routes here automatically whenever the bound mesh has tp>1 and the
    shapes divide; the teacher head has the matching gather-free path in
    ``models/t5.py:_vocab_parallel_gold_log_probs``.

    ``logits`` [B, L, V] with the last axis tp-sharded (the natural layout
    of the tied LM head under a tp-sharded "vocab" logical axis),
    ``labels`` [B, L] int. Returns per-token -log p [B, L] fp32, dp-sharded.
    """
    from jax.sharding import PartitionSpec as P
    dp_ax, tp_ax = mesh.axis_names
    if logits.shape[-1] % mesh.shape[tp_ax]:
        raise ValueError(
            f"vocab axis {logits.shape[-1]} must divide over tp="
            f"{mesh.shape[tp_ax]} (pad the vocab to a tp multiple)")

    def local(lg, lb):
        r = jax.lax.axis_index(tp_ax)
        v_local = lg.shape[-1]
        start = r * v_local
        lg = lg.astype(jnp.float32)
        # the max shift is a constant for autodiff (it cancels in the
        # logsumexp derivative); pmax has no VJP rule, so it must only ever
        # see the stop-gradient'd value
        m = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(lg), axis=-1), tp_ax)  # global max
        se = jax.lax.psum(
            jnp.sum(jnp.exp(lg - m[..., None]), axis=-1), tp_ax)
        lse = m + jnp.log(se)
        local_lb = lb - start
        in_range = (local_lb >= 0) & (local_lb < v_local)
        picked = jnp.take_along_axis(
            lg, jnp.clip(local_lb, 0, v_local - 1)[..., None], axis=-1
        )[..., 0]
        gold = jax.lax.psum(jnp.where(in_range, picked, 0.0), tp_ax)
        return lse - gold

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dp_ax, None, tp_ax), P(dp_ax, None)),
        out_specs=P(dp_ax, None), check_vma=False)(logits, labels)
