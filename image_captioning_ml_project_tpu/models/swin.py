"""Swin Transformer vision backbone (HF transformers SwinModel-compatible).

Capability parity with the reference's SwinEncoder
(reference: src/models/encoders.py:140-182): features = final-stage tokens
projected to feature_dim, pooled = mean of projected tokens
(src/models/encoders.py:171-172), all-ones attention mask.

Window attention uses static window partitioning (pure reshapes — XLA turns
these into free layout changes on TPU), relative position bias tables, and
cyclic shifts via ``jnp.roll``. Stochastic depth is omitted (HF applies it
only in training; inference numerics are identical).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import EncoderConfig


def _relative_position_index(window_size: int) -> np.ndarray:
    """Standard Swin relative position index, shape [w*w, w*w]."""
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size),
                                  indexing="ij"))  # [2, w, w]
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)  # [w*w, w*w]


def _shift_attn_mask(H: int, W: int, window_size: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [num_windows, w*w, w*w] additive."""
    img_mask = np.zeros((H, W))
    h_slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    w_slices = h_slices
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    # partition into windows
    m = img_mask.reshape(H // window_size, window_size, W // window_size, window_size)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_reverse(x: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class SwinWindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: [nW_total, w*w, C]; attn_mask: [nW, w*w, w*w] or None."""
        nWt, N, C = x.shape
        nh = self.num_heads
        hd = C // nh

        def heads(y):
            return y.reshape(nWt, N, nh, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(C, dtype=self.dtype, name="query")(x))
        k = heads(nn.Dense(C, dtype=self.dtype, name="key")(x))
        v = heads(nn.Dense(C, dtype=self.dtype, name="value")(x))
        scores = jnp.einsum("whqd,whkd->whqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window_size - 1) ** 2, nh))
        index = _relative_position_index(self.window_size).reshape(-1)
        bias = table[index].reshape(N, N, nh).transpose(2, 0, 1)  # [nh, N, N]
        scores = scores + bias[None].astype(scores.dtype)

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            scores = scores.reshape(nWt // nW, nW, nh, N, N)
            scores = scores + attn_mask[None, :, None, :, :].astype(scores.dtype)
            scores = scores.reshape(nWt, nh, N, N)

        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("whqk,whkd->whqd", w, v).transpose(0, 2, 1, 3).reshape(nWt, N, C)
        return nn.Dense(C, dtype=self.dtype, name="out")(out)


class SwinLayer(nn.Module):
    num_heads: int
    window_size: int
    shift_size: int
    input_resolution: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H*W, C] with H = W = input_resolution. Resolutions not
        divisible by the window are zero-padded right/bottom before
        partitioning and cropped after (HF SwinLayer.maybe_pad — padded
        rows participate in boundary windows exactly as in HF)."""
        H = W = self.input_resolution
        w = min(self.window_size, H)
        shift = 0 if w >= H else self.shift_size
        B, L, C = x.shape

        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layernorm_before")(x)
        x = x.reshape(B, H, W, C)
        pad = (-H) % w
        Hp = H + pad
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Hp, w, shift))
        else:
            mask = None
        xw = window_partition(x, w)
        xw = SwinWindowAttention(C, self.num_heads, w, dtype=self.dtype,
                                 name="attention")(xw, mask)
        x = window_reverse(xw, w, B, Hp, Hp)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad:
            x = x[:, :H, :W]
        x = res + x.reshape(B, L, C)

        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layernorm_after")(x)
        y = nn.Dense(C * self.mlp_ratio, dtype=self.dtype, name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="output")(y)
        return res + y


class SwinPatchMerging(nn.Module):
    input_resolution: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        H = W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2:  # HF maybe_pad: odd resolutions pad right/bottom
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        # HF gather order: [0::2,0::2], [1::2,0::2], [0::2,1::2], [1::2,1::2]
        x = jnp.concatenate([
            x[:, 0::2, 0::2, :], x[:, 1::2, 0::2, :],
            x[:, 0::2, 1::2, :], x[:, 1::2, 1::2, :],
        ], axis=-1).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinBackbone(nn.Module):
    """HF SwinModel-compatible backbone (any square input resolution —
    non-window-multiple patch grids pad like HF's maybe_pad)."""

    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        B = images.shape[0]
        from .encoders import PatchEmbed
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(images)
        res = x.shape[1]
        x = x.reshape(B, -1, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="embed_norm")(x)

        for stage_idx, (depth, nh) in enumerate(zip(self.depths, self.num_heads)):
            for layer_idx in range(depth):
                x = SwinLayer(
                    num_heads=nh, window_size=self.window_size,
                    shift_size=0 if layer_idx % 2 == 0 else self.window_size // 2,
                    input_resolution=res, mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype,
                    name=f"stage_{stage_idx}_block_{layer_idx}",
                )(x)
            if stage_idx < len(self.depths) - 1:
                x = SwinPatchMerging(res, dtype=self.dtype,
                                     name=f"stage_{stage_idx}_downsample")(x)
                res = (res + 1) // 2  # odd resolutions merge padded (HF)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layernorm")(x)
        return x  # [B, tokens, 8*embed_dim]


class SwinEncoder(nn.Module):
    """Swin image encoder (reference: src/models/encoders.py:140-182)."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.config
        x = SwinBackbone(
            embed_dim=cfg.swin_embed_dim,
            depths=tuple(cfg.swin_depths),
            num_heads=tuple(cfg.swin_num_heads),
            window_size=cfg.swin_window_size,
            mlp_ratio=cfg.mlp_ratio,
            dtype=self.dtype,
            name="backbone",
        )(images)
        if cfg.freeze:
            x = jax.lax.stop_gradient(x)
        features = x
        final_dim = cfg.swin_embed_dim * (2 ** (len(cfg.swin_depths) - 1))
        if final_dim != cfg.feature_dim:
            features = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="proj")(features)
        # pooled = mean of (projected) patch features, reference :171-172
        pooled = features.mean(axis=1)
        B, S = features.shape[:2]
        return {
            "features": features,
            "pooled_features": pooled,
            "attention_mask": jnp.ones((B, S), dtype=jnp.bool_),
        }
