"""train/optim: LR schedule shapes (warmup linear/cosine/step, reference
src/train/trainer.py:136-162) and the no-decay mask (biases + norm scales
excluded from weight decay, :114-126)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_captioning_ml_project_tpu.config import TrainingConfig
from image_captioning_ml_project_tpu.train.optim import (
    create_learning_rate_schedule,
    create_optimizer,
    no_decay_mask,
)


def _cfg(sched, lr=1e-2, warmup=10):
    c = TrainingConfig()
    c.learning_rate = lr
    c.warmup_steps = warmup
    c.lr_scheduler = sched
    return c


def test_linear_schedule_shape():
    s = create_learning_rate_schedule(_cfg("linear"), total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)  # peak at warmup
    assert float(s(5)) < 1e-2  # rising
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-9)  # decayed out
    assert float(s(60)) < float(s(10))


def test_cosine_schedule_shape():
    s = create_learning_rate_schedule(_cfg("cosine"), total_steps=110)
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)
    # cosine decay reaches ~0 at the horizon and is monotone after warmup
    assert float(s(110)) < 1e-4
    vals = [float(s(t)) for t in range(10, 111, 20)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_step_schedule_decays_3x():
    s = create_learning_rate_schedule(_cfg("step"), total_steps=90)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(s(31)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(61)), 1e-4, rtol=1e-5)


def test_warmup_clamped_to_horizon():
    # warmup_steps (2000 default) longer than a tiny run must not produce a
    # schedule that never decays
    s = create_learning_rate_schedule(_cfg("linear", warmup=2000),
                                      total_steps=10)
    assert float(s(9)) <= 1e-2


def test_no_decay_mask_rank_rule():
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
              "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
              "embed": {"embedding": jnp.ones((7, 4))}}
    mask = no_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["embed"]["embedding"] is True


def test_create_optimizer_runs_and_clips():
    cfg = _cfg("cosine")
    cfg.weight_decay = 0.01
    cfg.grad_clip_norm = 1.0
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    tx, sched = create_optimizer(cfg, total_steps=100, params=params)
    state = tx.init(params)
    huge = {"w": jnp.full((3, 3), 1e3), "b": jnp.full((3,), 1e3)}
    updates, _ = tx.update(huge, state, params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(u ** 2) for u in
                               jax.tree_util.tree_leaves(updates))))
    assert np.isfinite(gnorm)
