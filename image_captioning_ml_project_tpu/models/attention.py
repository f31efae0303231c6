"""Cross-attention zoo: soft (additive), multi-head, adaptive (visual
sentinel), and attention-on-attention.

Behavioral contract matches the reference's four mechanisms
(reference: src/models/attention.py:38-360) — same projections, same masking
semantics (``key_padding_mask`` True == padding, filled with -1e9), same
2D-query squeeze convention (src/models/attention.py:66-70) — but implemented
as functional Flax modules whose math XLA fuses into the surrounding
computation. The scaled-dot-product core can optionally be routed through a
fused Pallas TPU kernel (``use_pallas=True``, see
``image_captioning_ml_project_tpu.ops.pallas_attention``).

All variants share the signature::

    context, weights = attn(query, key, value, key_padding_mask=None,
                            memory_state=None, cell_state=None)

query: [B, D] or [B, Q, D]; key/value: [B, S, D];
key_padding_mask: bool [B, S], True marks padding keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import AttentionConfig, AttentionType

_NEG_INF = -1e9


def _maybe_expand_query(query: jnp.ndarray) -> Tuple[jnp.ndarray, bool]:
    """2D-query squeeze convention (reference: src/models/attention.py:66-70)."""
    if query.ndim == 2:
        return query[:, None, :], True
    return query, False


def _mask_scores(scores: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Fill padded-key scores with -1e9. ``scores[..., S]``;
    mask [B, S] broadcast over intermediate dims."""
    if key_padding_mask is None:
        return scores
    mask = key_padding_mask
    while mask.ndim < scores.ndim:
        mask = jnp.expand_dims(mask, 1)
    return jnp.where(mask, _NEG_INF, scores)


class SoftAttention(nn.Module):
    """Additive (Bahdanau) attention of Show-Attend-Tell
    (reference: src/models/attention.py:38-118).

    score(q, k) = energy(tanh(W_q q + W_k k)) / temperature
    """

    config: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, **kwargs):
        query, squeeze = _maybe_expand_query(query)
        h = self.config.hidden_dim

        q_proj = nn.Dense(h, dtype=self.dtype, name="query_proj")(query)
        k_proj = nn.Dense(h, dtype=self.dtype, name="key_proj")(key)
        energy = nn.Dense(1, dtype=self.dtype, name="energy")

        if self.config.use_pallas:
            from ..ops.pallas_attention import fused_additive_scores

            # Materialize energy params via a dummy call on first init.
            _ = energy(q_proj[:, :1, :])
            scores = fused_additive_scores(
                q_proj, k_proj,
                energy.variables["params"]["kernel"],
                energy.variables["params"]["bias"],
                key_padding_mask, self.config.temperature)
        else:
            # [B, Q, 1, H] + [B, 1, S, H] -> [B, Q, S, H]
            attn_sum = jnp.tanh(q_proj[:, :, None, :] + k_proj[:, None, :, :])
            scores = energy(attn_sum)[..., 0]
            scores = scores / self.config.temperature
            scores = _mask_scores(scores, key_padding_mask)

        weights = jax.nn.softmax(scores, axis=-1)  # [B, Q, S]
        context = jnp.einsum("bqs,bsd->bqd", weights, value)

        if squeeze:
            return context[:, 0], weights[:, 0]
        return context, weights


class MultiHeadAttention(nn.Module):
    """Scaled dot-product multi-head cross-attention
    (reference: src/models/attention.py:121-218). Returns head-averaged
    weights for visualization parity (src/models/attention.py:211)."""

    config: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, **kwargs):
        query, squeeze = _maybe_expand_query(query)
        h = self.config.hidden_dim
        n_heads = self.config.num_heads
        assert h % n_heads == 0, "hidden_dim must be divisible by num_heads"
        head_dim = h // n_heads
        B, Q, _ = query.shape
        S = key.shape[1]

        def split_heads(x):
            return x.reshape(x.shape[0], x.shape[1], n_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(h, dtype=self.dtype, name="query_proj")(query))
        k = split_heads(nn.Dense(h, dtype=self.dtype, name="key_proj")(key))
        v = split_heads(nn.Dense(h, dtype=self.dtype, name="value_proj")(value))

        scale = 1.0 / (self.config.temperature * (head_dim ** 0.5))

        if self.config.use_pallas:
            from ..ops.pallas_attention import fused_sdpa

            context4, weights4 = fused_sdpa(q, k, v, key_padding_mask, scale)
        else:
            scores = jnp.einsum("bhqd,bhsd->bhqs", q, k,
                                preferred_element_type=jnp.float32) * scale
            if key_padding_mask is not None:
                scores = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, scores)
            weights4 = jax.nn.softmax(scores, axis=-1)  # [B, Hd, Q, S]
            context4 = jnp.einsum("bhqs,bhsd->bhqd", weights4.astype(v.dtype), v)

        context = context4.transpose(0, 2, 1, 3).reshape(B, Q, h)
        context = nn.Dense(h, dtype=self.dtype, name="output_proj")(context)
        weights = weights4.mean(axis=1)  # head average, [B, Q, S]

        weights = weights.astype(context.dtype)  # same dtype on both paths
        if squeeze:
            return context[:, 0], weights[:, 0]
        return context, weights


class AdaptiveAttention(nn.Module):
    """Adaptive attention with visual sentinel (Lu et al., 2017)
    (reference: src/models/attention.py:221-294). Requires the LSTM's
    ``memory_state``/``cell_state`` [B, H] to form the sentinel."""

    config: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        base_cls = MultiHeadAttention if self.config.num_heads > 1 else SoftAttention
        self.base_attention = base_cls(self.config, dtype=self.dtype)
        h = self.config.hidden_dim
        self.sentinel_gate = nn.Dense(h, dtype=self.dtype)
        self.sentinel_proj = nn.Dense(h, dtype=self.dtype)
        self.adaptive_weight = nn.Dense(1, dtype=self.dtype)

    def __call__(self, query, key, value, key_padding_mask=None,
                 memory_state=None, cell_state=None, **kwargs):
        assert memory_state is not None and cell_state is not None, (
            "AdaptiveAttention requires memory_state and cell_state")
        query, squeeze = _maybe_expand_query(query)
        B, Q, _ = query.shape

        mem = jnp.broadcast_to(memory_state[:, None, :], query.shape)
        gate = jax.nn.sigmoid(self.sentinel_gate(jnp.concatenate([query, mem], axis=-1)))
        cell = jnp.broadcast_to(cell_state[:, None, :], query.shape)
        sentinel = self.sentinel_proj(gate * jnp.tanh(cell))

        context, weights = self.base_attention(
            query, key, value, key_padding_mask=key_padding_mask)

        w = jax.nn.sigmoid(self.adaptive_weight(
            jnp.concatenate([context, sentinel], axis=-1)))
        final = w * context + (1.0 - w) * sentinel

        if squeeze:
            return final[:, 0], weights[:, 0]
        return final, weights


class AttentionOnAttention(nn.Module):
    """Attention on Attention (Huang et al., 2019)
    (reference: src/models/attention.py:297-360): an information vector and a
    gate computed from [context; transformed query], multiplied elementwise."""

    config: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        base_cls = MultiHeadAttention if self.config.num_heads > 1 else SoftAttention
        self.base_attention = base_cls(self.config, dtype=self.dtype)
        h = self.config.hidden_dim
        self.query_proj = nn.Dense(h, dtype=self.dtype)
        self.info_vector_proj = nn.Dense(h, dtype=self.dtype)
        self.info_gate_proj = nn.Dense(h, dtype=self.dtype)

    def __call__(self, query, key, value, key_padding_mask=None, **kwargs):
        query, squeeze = _maybe_expand_query(query)

        context, weights = self.base_attention(
            query, key, value, key_padding_mask=key_padding_mask)

        concat = jnp.concatenate([context, self.query_proj(query)], axis=-1)
        info = jnp.tanh(self.info_vector_proj(concat))
        gate = jax.nn.sigmoid(self.info_gate_proj(concat))
        filtered = info * gate

        if squeeze:
            return filtered[:, 0], weights[:, 0]
        return filtered, weights


def build_attention(config: AttentionConfig, dtype=jnp.float32) -> nn.Module:
    """Factory (reference: src/models/attention.py:363-375)."""
    if config.attention_type == AttentionType.SOFT:
        return SoftAttention(config, dtype=dtype)
    if config.attention_type == AttentionType.MULTI_HEAD:
        return MultiHeadAttention(config, dtype=dtype)
    if config.attention_type == AttentionType.ADAPTIVE:
        return AdaptiveAttention(config, dtype=dtype)
    if config.attention_type == AttentionType.AOA:
        return AttentionOnAttention(config, dtype=dtype)
    raise ValueError(f"Unsupported attention type: {config.attention_type}")
