"""Training losses: shifted cross-entropy, doubly-stochastic attention
regularization, CLIP-style contrastive, and image-text matching.

Parity with the reference's loss surface
(reference: src/train/losses.py:15-263 plus the legacy stack's attention
regularization, train.py:101), as pure functions + one small Flax module for
the ITM classifier head.

Data-parallel note (SURVEY.md §2.3): the contrastive loss builds a global
B×B similarity matrix (reference: src/train/losses.py:57). Under
``jit`` over a batch sharded on the mesh's data axis, XLA inserts the
all-gather for the ``image @ text.T`` contraction automatically — no manual
collective is needed; the loss is computed over the *global* batch exactly
as in the single-device reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def shifted_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                          pad_token_id: int,
                          target_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """Language-modeling CE: predict targets[t+1] from logits[t]
    (reference: src/train/losses.py:235-243).

    ``target_mask`` [B, T] (1 = supervised token, e.g. the tokenizer's
    attention mask) takes precedence over pad-id masking — required for
    GPT-2 style tokenizers where pad == eos, so the terminating EOS stays a
    training target instead of being stripped with the padding."""
    shift_logits = logits[:, :-1]
    shift_targets = targets[:, 1:]
    if target_mask is not None:
        mask = target_mask[:, 1:].astype(jnp.float32)
    else:
        mask = (shift_targets != pad_token_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def attention_regularization(attention_weights: jnp.ndarray,
                             token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Doubly-stochastic regularization ``((1 - sum_t alpha)^2).mean()``
    (reference legacy stack: train.py:101). attention_weights [B, T, S];
    token_mask [B, T] marks real caption steps."""
    if token_mask is not None:
        attention_weights = attention_weights * token_mask[:, :, None]
    total = attention_weights.sum(axis=1)  # [B, S]
    return ((1.0 - total) ** 2).mean()


def contrastive_loss(image_features: jnp.ndarray, text_features: jnp.ndarray,
                     temperature: float = 0.07) -> jnp.ndarray:
    """Symmetric InfoNCE (reference: src/train/losses.py:34-75)."""
    img = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txt = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    logits = img @ txt.T / temperature
    labels = jnp.arange(logits.shape[0])
    logp_i2t = jax.nn.log_softmax(logits, axis=-1)
    logp_t2i = jax.nn.log_softmax(logits.T, axis=-1)
    loss_i2t = -jnp.take_along_axis(logp_i2t, labels[:, None], axis=-1).mean()
    loss_t2i = -jnp.take_along_axis(logp_t2i, labels[:, None], axis=-1).mean()
    return (loss_i2t + loss_t2i) / 2.0


def itm_negative_indices(rng: jax.Array, batch_size: int, num_neg: int):
    """Indices for ITM mismatched pairs: adjacent entries of one full-batch
    permutation, so ``img_idx[i] != txt_idx[i]`` whenever batch_size >= 2 —
    ``jnp.roll`` over a truncated slice degenerates to identity at
    num_neg == 1, labeling a true positive as negative."""
    perm = jax.random.permutation(rng, batch_size)
    return perm[:num_neg], perm[(jnp.arange(num_neg) + 1) % batch_size]


class ITMHead(nn.Module):
    """Image-text matching binary classifier
    (reference: src/train/losses.py:100-108): MLP over [img; txt] → 2."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_features, text_features, deterministic=True):
        x = jnp.concatenate([image_features, text_features], axis=-1)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=0.1)(x, deterministic=deterministic)
        return nn.Dense(2, dtype=self.dtype)(x)


class CombinedLoss(nn.Module):
    """CE + weighted contrastive + weighted ITM (+ attention regularization)
    as one module so the ITM head's parameters live in the train state
    (reference: src/train/losses.py:169-263; weights at
    src/train/trainer.py:74-82)."""

    pad_token_id: int
    use_contrastive: bool = False
    use_itm: bool = False
    contrastive_weight: float = 0.1
    itm_weight: float = 0.1
    temperature: float = 0.07
    hidden_dim: int = 768
    attention_reg_weight: float = 0.0
    negative_ratio: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        if self.use_itm:
            self.itm_head = ITMHead(self.hidden_dim, dtype=self.dtype)
        if self.use_contrastive or self.use_itm:
            # project (possibly differently sized) image/text features to a
            # common embedding dim — encoder feature_dim and decoder
            # hidden_dim are independent config knobs
            self.image_feat_proj = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.text_feat_proj = nn.Dense(self.hidden_dim, dtype=self.dtype)

    def __call__(self, logits, targets, image_features=None,
                 text_features=None, attention_weights=None,
                 target_mask=None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        ce = shifted_cross_entropy(logits, targets, self.pad_token_id,
                                   target_mask=target_mask)
        total = ce
        out = {"ce_loss": ce}
        if (self.use_contrastive or self.use_itm) and \
                image_features is not None and text_features is not None:
            image_features = self.image_feat_proj(image_features)
            text_features = self.text_feat_proj(text_features)

        if (self.use_contrastive and image_features is not None
                and text_features is not None):
            cl = contrastive_loss(image_features, text_features, self.temperature)
            total = total + self.contrastive_weight * cl
            out["contrastive_loss"] = cl

        if (self.use_itm and image_features is not None
                and text_features is not None):
            B = image_features.shape[0]
            num_neg = int(B * self.negative_ratio)
            # eval paths apply the loss without an "itm" rng: fall back to a
            # fixed key (deterministic negatives are fine for val loss)
            rng = (self.make_rng("itm") if self.has_rng("itm")
                   else jax.random.PRNGKey(0))
            perm_rng, drop_rng = jax.random.split(rng)
            # reference negatives: src/train/losses.py:139-151 (same
            # single-negative hazard, fixed in itm_negative_indices)
            neg_idx, neg_txt_idx = itm_negative_indices(perm_rng, B, num_neg)
            all_img = jnp.concatenate(
                [image_features, image_features[neg_idx]], axis=0)
            all_txt = jnp.concatenate(
                [text_features, text_features[neg_txt_idx]], axis=0)
            labels = jnp.concatenate(
                [jnp.ones(B, dtype=jnp.int32), jnp.zeros(num_neg, dtype=jnp.int32)])
            itm_logits = self.itm_head(all_img, all_txt,
                                       deterministic=deterministic)
            logp = jax.nn.log_softmax(itm_logits, axis=-1)
            il = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
            total = total + self.itm_weight * il
            out["itm_loss"] = il

        if self.attention_reg_weight > 0.0 and attention_weights is not None:
            # attention_weights[t] is the attention used to predict
            # targets[t+1] (same alignment as shifted_cross_entropy), so
            # the step mask is the shifted target validity — the final
            # step (whose prediction is never supervised) is masked out.
            # target_mask takes precedence for pad==eos tokenizers, same
            # as the CE path.
            if target_mask is not None:
                valid = target_mask.astype(jnp.float32)
            else:
                valid = (targets != self.pad_token_id).astype(jnp.float32)
            token_mask = jnp.concatenate(
                [valid[:, 1:], jnp.zeros_like(valid[:, :1])], axis=1)
            ar = attention_regularization(attention_weights, token_mask)
            total = total + self.attention_reg_weight * ar
            out["attention_reg_loss"] = ar

        out["total_loss"] = total
        return out
