"""Optimizer, train state, and the jitted EMDR2 train step.

Replaces the reference engine path (``/root/reference/megatron/training.py:
73-230``): apex FusedAdam + FP16_Optimizer + dynamic loss scaling + LocalDDP
all-reduce + manual clip become one optax chain (global-norm clip -> adamw
with the AnnealingLR schedule) inside a single pjit'd step — bf16 compute with
fp32 params/optimizer state needs no loss scaling, and the gradient psum over
the dp axis is inserted by XLA from the shardings.

Weight-decay mask parity: LayerNorm params and all biases are excluded
(``model/utils.py:64-83``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from emdr2_tpu.config import EMDR2Config, OptimizerConfig
from emdr2_tpu.models import EMDR2Batch, EMDR2Model
from emdr2_tpu.training.losses import emdr2_total_loss
from emdr2_tpu.training.schedules import schedule_from_config


class TrainState(NamedTuple):
    step: jnp.ndarray          # int32 scalar
    params: Any                # fp32 param pytree
    opt_state: Any
    rng: jax.Array             # dropout PRNG key


def _no_decay(path: Tuple, _leaf) -> bool:
    """True for params that should NOT be weight-decayed: biases and
    LayerNorm scale (reference model/utils.py:64-83)."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if names and names[-1] in ("bias", "lm_bias"):
        return True
    return any(str(n).startswith("ln_") or str(n) == "scale" for n in names)


def decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _no_decay(path, leaf), params)


def make_optimizer(cfg: OptimizerConfig, total_iters: int
                   ) -> optax.GradientTransformation:
    schedule = schedule_from_config(cfg, total_iters)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    )


def _minimal_init_batch(b: EMDR2Batch) -> EMDR2Batch:
    """B=1/K=2 shape-minimal copy of a sample batch, for flax init.

    Param shapes don't depend on the batch dims, but ``model.init`` TRACES
    the full forward (incl. the B*K-row teacher) at the sample batch's
    shape — at B>=6/K=50 that one-shot init program alone exceeds the XLA
    compiler's scheduling budget on a 16 GB chip (it crashes the compile
    helper before the train step is even built). Initializing at B=1/K=2
    makes init O(1) in B/K; the resulting params are bit-identical (every
    initializer draws from the param shape, which is unchanged)."""
    return EMDR2Batch(
        query_bert_ids=b.query_bert_ids[:1],
        context_bert_ids=b.context_bert_ids[:1, :2],
        context_bert_types=b.context_bert_types[:1, :2],
        reader_ids=b.reader_ids[:1, :2],
        reader_one_ctx_ids=b.reader_one_ctx_ids[:1, :2],
        dec_ids=b.dec_ids[:1],
        labels=b.labels[:1],
        loss_mask=b.loss_mask[:1],
    )


def create_train_state(model: EMDR2Model, sample_batch: EMDR2Batch,
                       tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init({"params": params_rng},
                           _minimal_init_batch(sample_batch))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=dropout_rng,
    )


def abstract_train_state(model: EMDR2Model, sample_batch: EMDR2Batch,
                         tx: optax.GradientTransformation,
                         rng: jax.Array):
    """eval_shape'd TrainState (with flax logical metadata) for sharding
    resolution without materializing params."""
    return jax.eval_shape(
        functools.partial(create_train_state, model, sample_batch, tx), rng)


def make_train_step(model: EMDR2Model, tx: optax.GradientTransformation,
                    cfg: EMDR2Config, eos_id: int,
                    donate: bool = True) -> Callable:
    """Build the fused train step: forward (retriever scores + FiD reader +
    stop-grad teacher) -> joint loss -> grad -> clip -> adamw.

    The returned function is pure and jit-able; callers jit it with the
    desired shardings (see tasks/e2eqa.py).
    """
    mesh = cfg.reader.transformer.mesh   # bound mesh -> vocab-parallel CE

    def step_fn(state: TrainState, batch: EMDR2Batch):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            out = model.apply({"params": params}, batch,
                              deterministic=False,
                              rngs={"dropout": dropout_rng})
            total, aux = emdr2_total_loss(
                out.lm_logits, out.topk_log_probs, out.gold_log_probs,
                batch.labels, batch.loss_mask, eos_id=eos_id,
                update_retriever=cfg.update_retriever,
                use_kl_div=cfg.use_kl_div_loss, mesh=mesh)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=state.rng,
        )
        metrics = {
            "loss": total,
            "lm_loss": aux.lm_loss,
            "retriever_loss": aux.retriever_loss,
            "retriever_utility": aux.retriever_utility,
            "null_block_lm_loss": aux.null_block_lm_loss,
            "grad_norm": grad_norm,
        }
        return new_state, metrics

    return step_fn


def make_eval_forward(model: EMDR2Model, cfg: EMDR2Config, eos_id: int):
    """Deterministic forward returning the same metrics (training.py:324-377
    generic evaluate equivalent)."""

    def eval_fn(state: TrainState, batch: EMDR2Batch):
        out = model.apply({"params": state.params}, batch, deterministic=True)
        total, aux = emdr2_total_loss(
            out.lm_logits, out.topk_log_probs, out.gold_log_probs,
            batch.labels, batch.loss_mask, eos_id=eos_id,
            update_retriever=cfg.update_retriever,
            use_kl_div=cfg.use_kl_div_loss,
            mesh=cfg.reader.transformer.mesh)
        return {"loss": total, "lm_loss": aux.lm_loss,
                "retriever_loss": aux.retriever_loss}

    return eval_fn
