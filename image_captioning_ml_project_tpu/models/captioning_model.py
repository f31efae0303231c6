"""Composed image-captioning model: encoder → (Q-Former) → decoder.

Capability parity with the reference's composition
(reference: src/models/captioning_model.py:13-245): the optional BLIP-2
style Q-Former compresses vision features to ``q_former_num_queries``
learned queries which replace the features downstream
(src/models/captioning_model.py:80-90), and the decoder consumes the uniform
encoder-feature dict.

The whole model is one Flax module: a single jitted forward for training and
the uniform ``init_cache``/``step`` interface (delegated to the decoder) for
the jit decode engine in :mod:`..inference.decoding`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .decoders import CachedMHA, build_decoder
from .encoders import build_encoder


class PreLNSelfAttentionLayer(nn.Module):
    """torch TransformerEncoderLayer(norm_first=True, gelu) semantics,
    incl. its residual-branch + FFN dropouts (torch default 0.1) applied
    only when ``deterministic=False``."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = nn.Dropout(self.dropout)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = CachedMHA(self.hidden_dim, self.num_heads, dtype=self.dtype,
                      name="self_attn").full(y, y)
        x = x + drop(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="linear1")(y)
        y = drop(nn.gelu(y, approximate=False), deterministic=deterministic)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear2")(y)
        return x + drop(y, deterministic=deterministic)


class PreLNCrossAttentionLayer(nn.Module):
    """torch TransformerDecoderLayer(norm_first=True, gelu) semantics,
    incl. its residual-branch + FFN dropouts (torch default 0.1) applied
    only when ``deterministic=False``."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_key_padding_mask=None,
                 deterministic: bool = True):
        drop = nn.Dropout(self.dropout)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = CachedMHA(self.hidden_dim, self.num_heads, dtype=self.dtype,
                      name="self_attn").full(y, y)
        x = x + drop(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        mha = CachedMHA(self.hidden_dim, self.num_heads, dtype=self.dtype,
                        name="cross_attn")
        y = mha.attend_precomputed(y, *mha.project_kv(memory),
                                   key_padding_mask=memory_key_padding_mask)
        x = x + drop(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        y = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="linear1")(y)
        y = drop(nn.gelu(y, approximate=False), deterministic=deterministic)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear2")(y)
        return x + drop(y, deterministic=deterministic)


class QFormer(nn.Module):
    """BLIP-2 style query transformer
    (reference: src/models/captioning_model.py:153-245): learnable queries →
    pre-LN self-attention stack → pre-LN cross-attention stack over vision
    features."""

    query_dim: int = 768
    vision_dim: int = 768
    num_queries: int = 32
    num_layers: int = 2
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vision_features, vision_attention_mask=None,
                 deterministic: bool = True):
        B = vision_features.shape[0]
        queries = self.param(
            "query_tokens", nn.initializers.normal(stddev=0.02),
            (1, self.num_queries, self.query_dim))
        if self.vision_dim != self.query_dim:
            vision_features = nn.Dense(self.query_dim, dtype=self.dtype,
                                       name="vision_proj")(vision_features)
        x = jnp.broadcast_to(
            queries.astype(vision_features.dtype),
            (B, self.num_queries, self.query_dim))
        for i in range(self.num_layers):
            x = PreLNSelfAttentionLayer(
                self.query_dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, name=f"encoder_{i}")(
                x, deterministic=deterministic)
        mem_pad = None
        if vision_attention_mask is not None:
            mem_pad = ~vision_attention_mask.astype(bool)
        for i in range(self.num_layers):
            x = PreLNCrossAttentionLayer(
                self.query_dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, name=f"decoder_{i}")(
                x, vision_features, memory_key_padding_mask=mem_pad,
                deterministic=deterministic)
        return {"queries": x}


class ImageCaptioningModel(nn.Module):
    """Full captioning model (reference: src/models/captioning_model.py:13-150)."""

    config: Config
    dtype: Any = jnp.float32

    def setup(self):
        mc = self.config.model
        self.encoder = build_encoder(mc.encoder, dtype=self.dtype)
        self.decoder = build_decoder(
            config=mc.decoder,
            attention_config=mc.attention,
            vocab_size=mc.vocab_size,
            pad_token_id=mc.pad_token_id,
            bos_token_id=mc.bos_token_id,
            eos_token_id=mc.eos_token_id,
            dtype=self.dtype,
        )
        if mc.use_q_former:
            self.q_former = QFormer(
                query_dim=mc.projection_dim,
                vision_dim=mc.encoder.feature_dim,
                num_queries=mc.q_former_num_queries,
                num_layers=mc.q_former_num_layers,
                num_heads=mc.q_former_num_heads,
                # the reference's torch layers carry their default 0.1
                # dropout; mirror the decoder's configured rate
                dropout=mc.decoder.dropout,
                dtype=self.dtype,
            )

    def encode(self, images: Union[jnp.ndarray, Dict[str, jnp.ndarray]],
               train: bool = False) -> Dict[str, jnp.ndarray]:
        """images [B, H, W, 3] (NHWC) or an object-region feature dict →
        encoder-feature dict, with Q-Former queries replacing features when
        configured (reference: src/models/captioning_model.py:80-90)."""
        encoder_features = self.encoder(images, train=train)
        if self.config.model.use_q_former:
            out = self.q_former(encoder_features["features"],
                                encoder_features["attention_mask"],
                                deterministic=not train)
            q = out["queries"]
            encoder_features = dict(
                encoder_features,
                features=q,
                attention_mask=jnp.ones(q.shape[:2], dtype=jnp.bool_),
            )
        return encoder_features

    def __call__(self, images, captions: jnp.ndarray,
                 caption_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        encoder_features = self.encode(images, train=train)
        out = self.decoder(encoder_features, captions,
                           caption_lengths=caption_lengths,
                           deterministic=not train)
        # expose pooled image/text features for contrastive/ITM losses
        out["pooled_features"] = encoder_features["pooled_features"]
        if "hidden_states" in out:
            mask = (captions != self.config.model.pad_token_id)
            m = mask.astype(out["hidden_states"].dtype)[..., None]
            out["text_features"] = (
                (out["hidden_states"] * m).sum(axis=1)
                / jnp.maximum(m.sum(axis=1), 1.0))
        return out

    def generate(self, images, max_length: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Greedy generation (decoder-native). Beam/nucleus decoding is the
        decode engine's job (inference.decoding) via init_cache/step."""
        if max_length is None:
            max_length = self.config.inference.max_length
        encoder_features = self.encode(images)
        return self.decoder.generate(encoder_features, max_length)

    # -- uniform decode interface (delegates to the decoder) ----------------

    def init_cache(self, images, max_length: int):
        encoder_features = self.encode(images)
        return self.decoder.init_cache(encoder_features, max_length)

    def step(self, state, tokens):
        return self.decoder.step(state, tokens)
