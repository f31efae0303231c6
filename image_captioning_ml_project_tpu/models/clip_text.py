"""CLIP text tower and image-text scorer (HF CLIPModel-compatible).

Supports the reference's CLIP-reranking inference option
(reference: src/config.py:107-109 ``use_clip_reranking``/``num_candidates``;
README.md:370-379 describes generate-N-then-rerank). The reference never
shipped the reranker implementation; here it is complete: a Flax CLIP text
transformer (causal, EOT pooling) plus the projection heads, weight-portable
from HF ``CLIPModel`` checkpoints, scoring candidate captions against the
image in one jitted pass (see :mod:`..inference.reranking`).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .encoders import CLIPLayer, CLIPVisionBackbone

_NEG_INF = -1e9


class CLIPTextBackbone(nn.Module):
    """HF CLIPTextModel-compatible: token + position embeddings, causal
    pre-LN transformer with quick-gelu MLPs, final LayerNorm, EOT pooling
    (the hidden state at each sequence's highest token id — CLIP's EOT token
    is the largest vocabulary id)."""

    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_ratio: int = 4
    max_positions: int = 77
    # HF convention: pool at the first occurrence of eos_token_id (49407
    # for the real CLIP vocab); None falls back to argmax(input_ids), which
    # is equivalent when EOT is the largest id and appears once.
    eos_token_id: int = 49407
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T = input_ids.shape
        h = self.hidden_size
        x = nn.Embed(self.vocab_size, h, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (self.max_positions, h))
        x = x + pos[:T].astype(x.dtype)[None]

        causal = jnp.tril(jnp.ones((T, T), dtype=bool))
        bias = jnp.where(causal, 0.0, _NEG_INF)[None, None]
        for i in range(self.num_layers):
            x = CLIPLayer(h, self.num_heads, h * self.mlp_ratio,
                          dtype=self.dtype, name=f"layer_{i}")(x, attn_bias=bias)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="final_layernorm")(x)
        if self.eos_token_id is None or self.eos_token_id == 2:
            # HF compatibility branch (modeling_clip.py): OpenAI CLIP hub
            # configs ship the legacy-wrong eos_token_id=2, which never
            # appears in tokenized text — matching it would pool position 0
            # for every caption and make reranking a silent no-op. EOT is
            # the highest id in the CLIP vocab, so argmax finds it.
            eot = jnp.argmax(input_ids, axis=-1)
        else:
            eot = jnp.argmax(
                (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(B), eot]
        return x, pooled


class CLIPScorer(nn.Module):
    """Full CLIP similarity scorer: vision tower + text tower + projections
    + logit scale. ``score(images, input_ids)`` → cosine-similarity logits
    [B_img, B_txt]."""

    vision_hidden: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    patch_size: int = 32
    text_vocab: int = 49408
    text_hidden: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_eos_token_id: int = 49407
    text_max_positions: int = 77
    projection_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.vision = CLIPVisionBackbone(
            hidden_size=self.vision_hidden, num_layers=self.vision_layers,
            num_heads=self.vision_heads, patch_size=self.patch_size,
            dtype=self.dtype)
        self.text = CLIPTextBackbone(
            vocab_size=self.text_vocab, hidden_size=self.text_hidden,
            num_layers=self.text_layers, num_heads=self.text_heads,
            eos_token_id=self.text_eos_token_id,
            max_positions=self.text_max_positions,
            dtype=self.dtype)
        self.visual_projection = nn.Dense(self.projection_dim, use_bias=False,
                                          dtype=self.dtype)
        self.text_projection = nn.Dense(self.projection_dim, use_bias=False,
                                        dtype=self.dtype)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(2.6592), ())

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.vision(images)
        feat = self.visual_projection(pooled)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.text(input_ids)
        feat = self.text_projection(pooled)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def __call__(self, images: jnp.ndarray,
                 input_ids: jnp.ndarray) -> jnp.ndarray:
        img = self.encode_image(images)
        txt = self.encode_text(input_ids)
        return jnp.exp(self.logit_scale) * img @ txt.T


def port_clip_text(sd: Mapping[str, Any], num_layers: int) -> Dict[str, Any]:
    """HF CLIPTextModel(.text_model) state_dict → CLIPTextBackbone params."""
    import numpy as np

    def t(w):
        return np.ascontiguousarray(np.asarray(w).T)

    def dense(prefix):
        return {"kernel": t(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    p = "text_model"
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": np.asarray(sd[f"{p}.embeddings.token_embedding.weight"])},
        "position_embeddings":
            np.asarray(sd[f"{p}.embeddings.position_embedding.weight"]),
        "final_layernorm": ln(f"{p}.final_layer_norm"),
    }
    for i in range(num_layers):
        src = f"{p}.encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm1": ln(f"{src}.layer_norm1"),
            "layer_norm2": ln(f"{src}.layer_norm2"),
            "attention": {
                "query": dense(f"{src}.self_attn.q_proj"),
                "key": dense(f"{src}.self_attn.k_proj"),
                "value": dense(f"{src}.self_attn.v_proj"),
                "out": dense(f"{src}.self_attn.out_proj"),
            },
            "fc1": dense(f"{src}.mlp.fc1"),
            "fc2": dense(f"{src}.mlp.fc2"),
        }
    return {"params": params}


def port_clip_model(sd: Mapping[str, Any], vision_layers: int,
                    text_layers: int) -> Dict[str, Any]:
    """HF CLIPModel state_dict → CLIPScorer params."""
    import numpy as np

    from .hf_port import port_clip_vision

    vision = port_clip_vision(sd, vision_layers)["params"]
    text = port_clip_text(sd, text_layers)["params"]
    return {"params": {
        "vision": vision,
        "text": text,
        "visual_projection": {
            "kernel": np.ascontiguousarray(
                np.asarray(sd["visual_projection.weight"]).T)},
        "text_projection": {
            "kernel": np.ascontiguousarray(
                np.asarray(sd["text_projection.weight"]).T)},
        "logit_scale": np.asarray(sd["logit_scale"]),
    }}
