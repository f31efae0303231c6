"""Inference-time weight pre-cast.

Every model module computes with ``dtype=bfloat16`` under AMP (flax
linen casts the float32 params to the module dtype at use — the
reference's fp16 autocast analogue, src/train/trainer.py:70-71). That
per-use cast is traced into every jitted inference program: the
ViT+Transformer decode profile showed ~33 ms/run of ``convert`` fusions
(736 instances) just re-casting the same f32 weights every batch.

For decode-only phases (eval CLI, demo, validation decode, serving) the
weights are frozen, so casting **once** outside the jitted program and
feeding bf16 leaves is bit-identical — ``f32 -> bf16`` at use equals
pre-cast bf16 — and removes the per-batch cast traffic entirely.
Training keeps f32 master weights (the cast inside the train step is
fused into the first use and the params change every step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(tree, dtype=jnp.bfloat16):
    """Cast float32 leaves of a param/variable pytree to ``dtype``.

    Non-float and already-cast leaves pass through untouched. Exact for
    inference under a module ``dtype`` equal to ``dtype``: modules cast
    params at use, so pre-cast weights produce bit-identical outputs
    while skipping the per-call convert ops.

    Known non-bit-identical exceptions (params a module consumes at f32
    precision, so pre-casting rounds them once — bf16-ulp-level deltas,
    standard for bf16 serving): Swin's relative-position bias table
    (added to f32 scores, models/swin.py), CLIP's ``logit_scale``
    (models/clip_text.py), and the ``fold_normalize`` shift-bias
    derivation (models/encoders.PatchEmbed). The flagship CLIP+GPT-2 and
    ViT+Transformer decode paths consume every param through a cast and
    are exactly preserved.
    """
    def _cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
