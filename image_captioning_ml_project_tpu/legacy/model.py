"""Legacy "Show, Attend and Tell" model (ResNet-101 + LSTM + gated soft
attention), TPU-native.

Capability parity with the reference's legacy stack
(reference: models/encoder.py:5-16, models/decoder.py:7-176):

* Encoder: ResNet backbone minus head + adaptive average pool to a fixed
  ``encoded_image_size`` grid → [B, E*E, 2048] (reference:
  models/encoder.py:8-16 pools to 14x14).
* Decoder per step (reference: models/decoder.py:148-173): **ReLU** additive
  soft attention at 512 dims over the 2048-dim grid (enc_att/dec_att/att,
  :33-37), sigmoid gate ``f_beta(h)`` scaling the context (:45, 160-161),
  LSTMCell over [embedding; gated context] (:41-42), h/c initialised from
  the mean-pooled encoder output (:137-139). Per-timestep shrinking batches
  (:149) are replaced by masking under static shapes.
* The doubly-stochastic attention regularization the legacy trainer adds
  (train.py:101) consumes this model's returned alphas.

The BERT-embedding variant (reference: models/decoder.py:60-118) is
supported by passing precomputed word-level embeddings (see
:mod:`.bert_embedder`) instead of token ids.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import EncoderConfig
from ..models.encoders import ResNetBackbone
from ..models.lstm import FusedLSTMCell


def adaptive_avg_pool_2d(x: jnp.ndarray, output_size: int) -> jnp.ndarray:
    """NHWC adaptive average pooling to (output_size, output_size)
    (torch AdaptiveAvgPool2d semantics, reference: models/encoder.py:10)."""
    B, H, W, C = x.shape
    S = output_size

    def pool_axis(arr, in_len, axis):
        # torch: start = floor(i*in/out), end = ceil((i+1)*in/out);
        # in_len/S are static Python ints, so the segments are static slices.
        segs = []
        for i in range(S):
            s = (i * in_len) // S
            e = ((i + 1) * in_len + S - 1) // S
            segs.append(jnp.take(arr, jnp.arange(s, e), axis=axis).mean(
                axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    x = pool_axis(x, H, 1)
    x = pool_axis(x, W, 2)
    return x


class LegacyEncoder(nn.Module):
    """ResNet backbone + adaptive pool to [B, E, E, 2048]
    (reference: models/encoder.py:5-16)."""

    encoded_image_size: int = 14
    encoder_config: Optional[EncoderConfig] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.encoder_config or EncoderConfig()
        x = ResNetBackbone(
            embedding_size=cfg.resnet_embedding_size,
            hidden_sizes=tuple(cfg.resnet_hidden_sizes),
            depths=tuple(cfg.resnet_depths),
            layer_type=cfg.resnet_layer_type,
            dtype=self.dtype,
            name="backbone",
        )(images, train=train)
        return adaptive_avg_pool_2d(x, self.encoded_image_size)


class LegacyDecoder(nn.Module):
    """Gated-soft-attention LSTM decoder (reference: models/decoder.py:7-176)."""

    vocab_size: int
    encoder_dim: int = 2048
    attention_dim: int = 512
    decoder_dim: int = 512
    embed_dim: int = 512
    dropout: float = 0.5
    use_bert: bool = False  # embeddings supplied externally when True
    dtype: Any = jnp.float32

    def setup(self):
        self.enc_att = nn.Dense(self.attention_dim, dtype=self.dtype)
        self.dec_att = nn.Dense(self.attention_dim, dtype=self.dtype)
        self.att = nn.Dense(1, dtype=self.dtype)
        self.decode_step = FusedLSTMCell(self.decoder_dim, dtype=self.dtype)
        self.h_lin = nn.Dense(self.decoder_dim, dtype=self.dtype)
        self.c_lin = nn.Dense(self.decoder_dim, dtype=self.dtype)
        self.f_beta = nn.Dense(self.encoder_dim, dtype=self.dtype)
        self.fc = nn.Dense(self.vocab_size, dtype=self.dtype)
        if not self.use_bert:
            self.embedding = nn.Embed(self.vocab_size, self.embed_dim,
                                      dtype=self.dtype)
        self.drop = nn.Dropout(rate=self.dropout)

    def _attend(self, encoder_out: jnp.ndarray, h: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ReLU additive attention (reference: models/decoder.py:152-158)."""
        att = self.att(nn.relu(
            self.enc_att(encoder_out) + self.dec_att(h)[:, None, :]))[..., 0]
        alpha = jax.nn.softmax(att, axis=1)
        context = (encoder_out * alpha[..., None]).sum(axis=1)
        return context, alpha

    def init_hidden(self, encoder_out: jnp.ndarray):
        """h/c from the mean encoder output (reference: :137-139)."""
        avg = encoder_out.mean(axis=1)
        return self.h_lin(avg), self.c_lin(avg)

    def __call__(self, encoder_out: jnp.ndarray,
                 encoded_captions: Optional[jnp.ndarray] = None,
                 caption_embeddings: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward.

        encoder_out: [B, E, E, 2048] or [B, N, 2048];
        encoded_captions: [B, T] token ids (ignored when
        ``caption_embeddings`` [B, T, embed] is given — the BERT path).
        Returns logits for steps 0..T-2 (predicting tokens 1..T-1, matching
        the reference's ``dec_len = len - 1`` convention, :124)."""
        B = encoder_out.shape[0]
        encoder_out = encoder_out.reshape(B, -1, self.encoder_dim)

        if caption_embeddings is not None:
            embeddings = caption_embeddings
        else:
            embeddings = self.embedding(encoded_captions)
        T = embeddings.shape[1] - 1  # dec_len = caption_length - 1

        h, c = self.init_hidden(encoder_out)

        def body(mdl, carry, emb_t):
            h, c = carry
            context, alpha = mdl._attend(encoder_out, h)
            gate = jax.nn.sigmoid(mdl.f_beta(h))
            gated = gate * context
            (h, c), _ = mdl.decode_step(
                (h, c), jnp.concatenate([emb_t, gated], axis=-1))
            preds = mdl.fc(mdl.drop(h, deterministic=deterministic))
            return (h, c), (preds, alpha)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        _, (predictions, alphas) = scan(self, (h, c), embeddings[:, :T])
        return {"predictions": predictions, "alphas": alphas}

    def generate(self, encoder_out: jnp.ndarray, max_length: int,
                 start_token_id: int = 1,
                 embedding_table: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy decode; returns (tokens [B, L], alphas [B, L, N]).
        Position 0 is the start token. With ``use_bert`` there is no
        learned embedding table — pass ``embedding_table`` [V, embed]
        (e.g. ``BertCaptionEmbedder.vocab_table``) to map generated
        tokens back to embeddings."""
        B = encoder_out.shape[0]
        encoder_out = encoder_out.reshape(B, -1, self.encoder_dim)
        h, c = self.init_hidden(encoder_out)
        current = jnp.full((B,), start_token_id, dtype=jnp.int32)
        if self.use_bert and embedding_table is None:
            raise ValueError(
                "use_bert decoder has no learned embedding table; pass "
                "embedding_table (BertCaptionEmbedder.vocab_table) to "
                "generate()")

        def body(carry, _):
            h, c, current = carry
            emb = (embedding_table[current] if embedding_table is not None
                   else self.embedding(current))
            context, alpha = self._attend(encoder_out, h)
            gate = jax.nn.sigmoid(self.f_beta(h))
            (h, c), _ = self.decode_step(
                (h, c), jnp.concatenate([emb, gate * context], axis=-1))
            preds = self.fc(h)
            nxt = jnp.argmax(preds, axis=-1).astype(jnp.int32)
            return (h, c, nxt), (current, alpha)

        _, (tokens, alphas) = jax.lax.scan(body, (h, c, current), None,
                                           length=max_length)
        return tokens.transpose(1, 0), alphas.transpose(1, 0, 2)


class ShowAttendTell(nn.Module):
    """Composed legacy model: encoder + decoder."""

    vocab_size: int
    encoded_image_size: int = 14
    encoder_config: Optional[EncoderConfig] = None
    use_bert: bool = False
    embed_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = LegacyEncoder(self.encoded_image_size,
                                     self.encoder_config, dtype=self.dtype)
        enc_cfg = self.encoder_config or EncoderConfig()
        self.decoder = LegacyDecoder(
            vocab_size=self.vocab_size, use_bert=self.use_bert,
            encoder_dim=enc_cfg.resnet_hidden_sizes[-1],
            embed_dim=768 if self.use_bert else self.embed_dim,
            dtype=self.dtype)

    def __call__(self, images, encoded_captions=None, caption_embeddings=None,
                 train: bool = False):
        enc = self.encoder(images, train=train)
        return self.decoder(enc, encoded_captions, caption_embeddings,
                            deterministic=not train)

    def generate(self, images, max_length: int, start_token_id: int = 1,
                 embedding_table=None):
        enc = self.encoder(images)
        B = enc.shape[0]
        return self.decoder.generate(
            enc.reshape(B, -1, self.decoder.encoder_dim), max_length,
            start_token_id, embedding_table=embedding_table)
