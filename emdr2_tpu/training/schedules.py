"""Learning-rate schedules.

Exact functional port of the reference ``AnnealingLR``
(``/root/reference/megatron/learning_rates.py:23-71``): warmup is linear over
``warmup_iter`` steps, then linear/cosine/exponential/constant decay measured
over ``total_iters`` (note the reference's quirk: decay progress is
``(step - warmup)/total``, NOT ``/(total - warmup)`` — kept for step-count-
exact parity, SURVEY.md §7 hard part 6), floored at ``min_lr``.
"""

from __future__ import annotations

import jax.numpy as jnp

from emdr2_tpu.config import OptimizerConfig


def annealing_lr(start_lr: float, warmup_iter: int, total_iters: int,
                 decay_style: str = "linear", min_lr: float = 0.0):
    """Returns an optax-compatible schedule fn: step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.asarray(warmup_iter, jnp.float32)
        total = jnp.asarray(total_iters, jnp.float32)
        capped = jnp.minimum(step, total - w)

        warmup_lr = start_lr * capped / jnp.maximum(w, 1.0)

        progress = capped - w
        if decay_style == "linear":
            lr = start_lr * (total - progress) / total
        elif decay_style == "cosine":
            lr = start_lr / 2.0 * (jnp.cos(jnp.pi * progress / total) + 1.0)
        elif decay_style == "exponential":
            lr = start_lr * jnp.exp(-0.693 * progress / total)
        elif decay_style == "constant":
            lr = jnp.asarray(start_lr, jnp.float32)
        else:
            raise ValueError(f"unknown decay style {decay_style}")
        lr = jnp.maximum(lr, min_lr)
        return jnp.where((warmup_iter > 0) & (step <= w), warmup_lr, lr)

    return schedule


def schedule_from_config(cfg: OptimizerConfig, total_iters: int):
    warmup_iter = int(cfg.warmup * total_iters)
    return annealing_lr(cfg.lr, warmup_iter, total_iters,
                        decay_style=cfg.lr_decay_style, min_lr=cfg.min_lr)
