"""Optimizer and LR schedules: optax AdamW with no-decay groups, warmup
linear / cosine / step schedules.

Parity with the reference's optimizer setup
(reference: src/train/trainer.py:111-162): AdamW with weight decay applied
to everything *except* biases and LayerNorm weights (:114-126), and the
three HF-style schedules — linear warmup→linear decay, linear
warmup→cosine decay, and StepLR(total/3, gamma=0.1) (:142-160).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import TrainingConfig


def no_decay_mask(params) -> Any:
    """True where weight decay applies. Biases, LayerNorm/BatchNorm scales,
    and other rank-<=1 leaves are excluded (the functional equivalent of the
    reference's name-based ['bias', 'LayerNorm.weight'] groups,
    src/train/trainer.py:114)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def create_learning_rate_schedule(config: TrainingConfig,
                                  total_steps: int) -> Callable:
    """reference: src/train/trainer.py:136-162."""
    lr = config.learning_rate
    warmup = min(config.warmup_steps, max(total_steps - 1, 1))
    if config.lr_scheduler == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, lr, warmup),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup, 1)),
        ], [warmup])
    if config.lr_scheduler == "cosine":
        return optax.join_schedules([
            optax.linear_schedule(0.0, lr, warmup),
            optax.cosine_decay_schedule(lr, max(total_steps - warmup, 1)),
        ], [warmup])
    # StepLR: decay x0.1 three times over training (reference :156-160)
    step_size = max(total_steps // 3, 1)
    return optax.piecewise_constant_schedule(
        lr, {step_size: 0.1, 2 * step_size: 0.1, 3 * step_size: 0.1})


def create_optimizer(config: TrainingConfig, total_steps: int,
                     params=None) -> optax.GradientTransformation:
    """AdamW + no-decay mask (+ optional global-norm clipping; the legacy
    stack clamps gradients, train.py:107-110)."""
    schedule = create_learning_rate_schedule(config, total_steps)
    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=config.weight_decay,
        mask=no_decay_mask if params is None else no_decay_mask(params),
        mu_dtype=jnp.bfloat16
        if getattr(config, "adam_mu_dtype", "float32") == "bfloat16"
        else None,
    )
    if config.grad_clip_norm and config.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.grad_clip_norm), tx)
    return tx, schedule
