"""Inference-time weight pre-cast.

Every model module computes with ``dtype=bfloat16`` under AMP (the
reference's fp16 autocast analogue, src/train/trainer.py:70-71). Most
flax modules cast their f32 params to the module dtype at use
(``promote_dtype`` in Dense/Conv/Embed), and that per-use cast is traced
into every jitted inference program: the ViT+Transformer decode profile
showed ~10 ms/run of ``convert`` fusions re-casting the same frozen
weights every batch.

For decode-only phases (eval CLI, demo, validation decode, serving) the
weights are frozen, so casting **once** outside the jitted program and
feeding bf16 leaves is bit-identical *for cast-at-use params* — and
removes the per-batch cast traffic. Training keeps f32 master weights.

Not every param is cast-at-use, and those must stay f32 to preserve bit
identity (verified empirically: a bf16-pre-cast LayerNorm differs in low
bits, a Dense does not):

- LayerNorm/BatchNorm/GroupNorm ``scale``/``bias``: flax's
  ``_normalize`` keeps them at f32 precision when
  ``force_float32_reductions=True`` (the default) — the result, not the
  operands, is cast to the module dtype.
- BatchNorm running statistics (the ``batch_stats`` collection): used
  as-is at f32 under ``use_running_average``.
- CLIP's ``logit_scale`` (consumed raw, models/clip_text.py) and Swin's
  ``relative_position_bias_table`` (added to f32 scores,
  models/swin.py).

``cast_float_params`` therefore skips norm-parameter dicts (exactly the
dicts whose keys are ⊆ {scale, bias} with ``scale`` present — Dense/Conv
dicts always carry ``kernel``, Embed carries ``embedding``) and the
named raw-f32 leaves. The big matrices — the actual convert-fusion cost
— are all cast-at-use and get pre-cast.

One residual (opt-in) exception: ``config.fold_normalize`` derives its
shift bias from the patch kernel *at f32* (models/encoders.PatchEmbed),
so with a pre-cast kernel that derivation starts from bf16-rounded
values — bf16-ulp-level, and only when fold_normalize is on.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

# leaves individual modules consume at f32 regardless of module dtype
_RAW_F32_LEAVES = frozenset({"logit_scale", "relative_position_bias_table"})


def _is_norm_param_dict(node: Mapping) -> bool:
    # any non-empty subset of {scale, bias}: use_scale=False /
    # use_bias=False norms must also keep their surviving leaf f32
    # (flax's _normalize consumes both at f32). Skipping a cast is always
    # bit-identity-safe (the per-call cast still runs); casting a norm
    # leaf is not.
    keys = set(node.keys())
    return bool(keys) and keys <= {"scale", "bias"} and all(
        not isinstance(v, Mapping) for v in node.values())


def cast_float_params(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast cast-at-use float32 leaves of a param/variable pytree to
    ``dtype``; norm-layer scale/bias, ``batch_stats`` collections, and
    raw-f32 leaves stay untouched (see module docstring). Bit-identical
    to the per-call cast for every model family."""
    def _walk(node, in_batch_stats=False):
        if isinstance(node, Mapping):
            if _is_norm_param_dict(node) and not in_batch_stats:
                return dict(node)
            return {
                k: (node[k] if k in _RAW_F32_LEAVES
                    and not isinstance(node[k], Mapping)
                    else _walk(node[k], in_batch_stats
                               or k == "batch_stats"))
                for k in node
            }
        if in_batch_stats:
            return node
        if hasattr(node, "dtype") and node.dtype == jnp.float32:
            return node.astype(dtype)
        return node

    return _walk(tree)
