"""Vision encoder zoo: ResNet, ViT, Swin, CLIP-vision, and object-region
features.

Capability parity with the reference's encoder zoo
(reference: src/models/encoders.py:17-312): every encoder returns the uniform
dict ``{"features": [B,S,D], "pooled_features": [B,D], "attention_mask":
[B,S]}`` (reference: src/models/encoders.py:28-33), supports optional
backbone freezing (57-58) and output-dim projection (50-54).

TPU-first design decisions:

* **NHWC layout** — images are ``[B, H, W, 3]`` (XLA's native conv layout on
  TPU), not torch's NCHW.
* Architectures are shape-compatible with the HuggingFace torch models the
  reference loads (ViTModel / CLIPVisionModel / ResNetModel /SwinModel), so
  pretrained weights port 1:1 via
  :mod:`image_captioning_ml_project_tpu.models.hf_port`; numerics are
  verified against tiny random HF models in tests/test_encoders.py.
* ``freeze=True`` stops gradients at the backbone boundary
  (the projection stays trainable), the functional equivalent of the
  reference's ``requires_grad=False`` loop.

Intended-behavior fixes over the reference (SURVEY.md §2.4): the reference's
ResNet path applies a Linear over a 4-D NCHW tensor's last axis (width) and
returns a 4-D pooled tensor (src/models/encoders.py:62-81); here spatial maps
are flattened to a token sequence and pooled features are projected to
``feature_dim`` like every other encoder.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import EncoderConfig, EncoderType


def quick_gelu(x):
    """CLIP's activation (HF 'quick_gelu')."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# ResNet (HF transformers ResNetModel-compatible, bottleneck + basic layers)
# ---------------------------------------------------------------------------


class ResNetConvLayer(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            name="convolution",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="normalization",
        )(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


class ResNetShortCut(nn.Module):
    out_channels: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="convolution")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="normalization")(x)
        return x


class ResNetBottleNeckLayer(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        should_shortcut = self.in_channels != self.out_channels or self.stride != 1
        reduces = self.out_channels // self.reduction
        residual = x
        x = ResNetConvLayer(reduces, kernel_size=1, dtype=self.dtype,
                            name="layer_0")(x, train)
        x = ResNetConvLayer(reduces, kernel_size=3, stride=self.stride,
                            dtype=self.dtype, name="layer_1")(x, train)
        x = ResNetConvLayer(self.out_channels, kernel_size=1, activation=None,
                            dtype=self.dtype, name="layer_2")(x, train)
        if should_shortcut:
            residual = ResNetShortCut(self.out_channels, stride=self.stride,
                                      dtype=self.dtype, name="shortcut")(residual, train)
        return nn.relu(x + residual)


class ResNetBasicLayer(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        should_shortcut = self.in_channels != self.out_channels or self.stride != 1
        residual = x
        x = ResNetConvLayer(self.out_channels, kernel_size=3, stride=self.stride,
                            dtype=self.dtype, name="layer_0")(x, train)
        x = ResNetConvLayer(self.out_channels, kernel_size=3, activation=None,
                            dtype=self.dtype, name="layer_1")(x, train)
        if should_shortcut:
            residual = ResNetShortCut(self.out_channels, stride=self.stride,
                                      dtype=self.dtype, name="shortcut")(residual, train)
        return nn.relu(x + residual)


class ResNetBackbone(nn.Module):
    """HF ResNetModel-compatible backbone in NHWC.

    embedder: 7x7/2 conv + BN + relu + 3x3/2 maxpool; then one stage per
    entry of ``hidden_sizes`` (first stage stride 1, rest stride 2, matching
    HF's downsample_in_first_stage=False default).
    """

    embedding_size: int = 64
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    depths: Sequence[int] = (3, 4, 6, 3)
    layer_type: str = "bottleneck"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNetConvLayer(self.embedding_size, kernel_size=7, stride=2,
                            dtype=self.dtype, name="embedder")(x, train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        layer_cls = ResNetBottleNeckLayer if self.layer_type == "bottleneck" else ResNetBasicLayer
        in_ch = self.embedding_size
        for stage_idx, (size, depth) in enumerate(zip(self.hidden_sizes, self.depths)):
            stride = 1 if stage_idx == 0 else 2
            for layer_idx in range(depth):
                x = layer_cls(
                    in_channels=in_ch if layer_idx == 0 else size,
                    out_channels=size,
                    stride=stride if layer_idx == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage_{stage_idx}_layer_{layer_idx}",
                )(x, train)
            in_ch = size
        return x  # [B, H', W', hidden_sizes[-1]]


class ResNetEncoder(nn.Module):
    """ResNet image encoder (reference: src/models/encoders.py:37-91).

    features = flattened spatial map projected to feature_dim;
    pooled = global average pool (the HF pooler) projected to feature_dim.
    """

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x = ResNetBackbone(
            embedding_size=cfg.resnet_embedding_size,
            hidden_sizes=tuple(cfg.resnet_hidden_sizes),
            depths=tuple(cfg.resnet_depths),
            layer_type=cfg.resnet_layer_type,
            dtype=self.dtype,
            name="backbone",
        )(images, train=train and not cfg.freeze)
        if cfg.freeze:
            x = jax.lax.stop_gradient(x)
        B, H, W, C = x.shape
        features = x.reshape(B, H * W, C)
        pooled = features.mean(axis=1)  # HF pooler: AdaptiveAvgPool2d(1,1)
        if C != cfg.feature_dim:
            proj = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="proj")
            features = proj(features)
            pooled = proj(pooled)
        return {
            "features": features,
            "pooled_features": pooled,
            "attention_mask": jnp.ones((B, features.shape[1]), dtype=jnp.bool_),
        }


# ---------------------------------------------------------------------------
# ViT (HF transformers ViTModel-compatible)
# ---------------------------------------------------------------------------


class TransformerSelfAttention(nn.Module):
    """Standard pre/post-projected self-attention used by ViT/CLIP backbones.

    ``fused_qkv`` computes the three projections as ONE ``[h, 3h]`` matmul
    (param ``qkv`` instead of ``query``/``key``/``value``): measured 1.5×
    faster than three ``[h, h]`` dots at the b128/seq-50 training shapes
    (docs/performance.md) — wider N tiles the MXU better. Numerically
    identical (each output column block is the same dot);
    ``fuse_qkv_params`` migrates unfused param trees (HF ports,
    checkpoints) into this layout."""

    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, attn_bias=None):
        h, nh = self.hidden_size, self.num_heads
        hd = h // nh
        B, S, _ = x.shape

        def heads(y):
            return y.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

        if self.fused_qkv:
            qkv = nn.Dense(3 * h, dtype=self.dtype, name="qkv")(x)
            q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads(nn.Dense(h, dtype=self.dtype, name="query")(x))
            k = heads(nn.Dense(h, dtype=self.dtype, name="key")(x))
            v = heads(nn.Dense(h, dtype=self.dtype, name="value")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        if attn_bias is not None:
            scores = scores + attn_bias
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, h)
        return nn.Dense(h, dtype=self.dtype, name="out")(out)


class ViTLayer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layernorm_before")(x)
        y = TransformerSelfAttention(self.hidden_size, self.num_heads,
                                     dtype=self.dtype,
                                     fused_qkv=self.fused_qkv,
                                     name="attention")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layernorm_after")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(y)
        return x + y


class PatchEmbed(nn.Module):
    """Stride-P patch embedding as space-to-depth + one MXU matmul.

    Numerically identical to the HF patch convolution (kernel == stride,
    VALID padding) but avoids the C=3 NHWC conv whose input tiles use
    3/128 lanes on TPU. The parameter keeps the flax conv kernel layout
    ``(P, P, C, H)`` under the same ``kernel``/``bias`` names, so HF weight
    ports (hf_port) and existing checkpoints are untouched: the patch
    vector is flattened in (kh, kw, c) order, matching the kernel reshape
    ``(P*P*C, H)``.

    **Folded normalization** (config.fold_normalize): when handed raw
    ``uint8`` images, the ImageNet affine ``(x/255 - mean)/std`` (the
    reference transform, src/main.py:143-144) is folded into the matmul —
    the kernel's per-input-channel columns absorb ``1/(255*std_c)`` and
    the whole-patch shift ``sum_pc (-mean_c/std_c) * W[p,c,:]`` lands as a
    constant token bias. The normalized image is never materialized and
    the patch dot reads uint8-exact bf16 pixels (integers 0-255 are exact
    in bf16). Valid precisely because the patch conv is stride==kernel
    VALID (no padding pixels exist to break the affine fold).
    """

    hidden_size: int
    patch_size: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, Hi, Wi, C = images.shape
        P = self.patch_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (P, P, C, self.hidden_size))
        fold = jnp.issubdtype(images.dtype, jnp.integer)
        if fold:
            from ..data.coco import IMAGENET_MEAN, IMAGENET_STD

            scale = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, jnp.float32))
            shift = -(jnp.asarray(IMAGENET_MEAN, jnp.float32)
                      / jnp.asarray(IMAGENET_STD, jnp.float32))
            kmat = (kernel * scale[None, None, :, None]).astype(self.dtype)
            # every patch token sees the same shifted constant: fold it
            # into a bias vector (present even for bias-free CLIP embeds)
            shift_bias = jnp.einsum(
                "c,pqch->h", shift, kernel.astype(jnp.float32))
        else:
            kmat = kernel.astype(self.dtype)
        gh, gw = Hi // P, Wi // P
        x = images[:, :gh * P, :gw * P]  # conv-VALID drops the remainder
        x = x.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh, gw, P * P * C).astype(self.dtype)
        y = jnp.dot(x, kmat.reshape(P * P * C, self.hidden_size))
        if fold:
            y = y + shift_bias.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.hidden_size,))
            y = y + bias.astype(self.dtype)
        return y


class ViTBackbone(nn.Module):
    """HF ViTModel-compatible: patch conv + CLS + learned pos embeddings,
    pre-LN encoder, final LayerNorm, tanh pooler on CLS."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 16
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32
    remat: bool = False
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, images):
        B = images.shape[0]
        h = self.hidden_size
        x = PatchEmbed(h, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(images)
        x = x.reshape(B, -1, h)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, h))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, h)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, x.shape[1], h))
        x = x + pos.astype(x.dtype)
        layer_cls = nn.remat(ViTLayer) if self.remat else ViTLayer
        for i in range(self.num_layers):
            x = layer_cls(h, self.num_heads, h * self.mlp_ratio,
                          dtype=self.dtype, fused_qkv=self.fused_qkv,
                          name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        pooled = jnp.tanh(nn.Dense(h, dtype=self.dtype, name="pooler")(x[:, 0]))
        return x, pooled


class ViTEncoder(nn.Module):
    """ViT image encoder (reference: src/models/encoders.py:94-137):
    features = patch tokens (CLS dropped, :122), pooled = tanh-pooler CLS,
    both projected to feature_dim."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x, pooled = ViTBackbone(
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            patch_size=cfg.patch_size,
            dtype=self.dtype,
            remat=getattr(cfg, "remat", False),
            fused_qkv=getattr(cfg, "fused_qkv", False),
            name="backbone",
        )(images)
        if cfg.freeze:
            x = jax.lax.stop_gradient(x)
            pooled = jax.lax.stop_gradient(pooled)
        features = x[:, 1:, :]  # drop CLS
        if cfg.hidden_size != cfg.feature_dim:
            proj = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="proj")
            features = proj(features)
            pooled = proj(pooled)
        B, S = features.shape[:2]
        return {
            "features": features,
            "pooled_features": pooled,
            "attention_mask": jnp.ones((B, S), dtype=jnp.bool_),
        }


# ---------------------------------------------------------------------------
# CLIP vision tower (HF transformers CLIPVisionModel-compatible)
# ---------------------------------------------------------------------------


class CLIPLayer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x, attn_bias=None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        y = TransformerSelfAttention(self.hidden_size, self.num_heads,
                                     dtype=self.dtype,
                                     fused_qkv=self.fused_qkv,
                                     name="attention")(
            y, attn_bias=attn_bias)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(y)
        return x + y


class CLIPVisionBackbone(nn.Module):
    """HF CLIPVisionModel-compatible vision transformer: class embedding +
    bias-free patch conv + learned pos embeddings, pre-layernorm, pre-LN
    encoder with quick-gelu MLPs, post-layernorm on the CLS token."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 32
    dtype: Any = jnp.float32
    remat: bool = False
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        B = images.shape[0]
        h = self.hidden_size
        x = PatchEmbed(h, self.patch_size, use_bias=False, dtype=self.dtype,
                       name="patch_embed")(images)
        x = x.reshape(B, -1, h)
        cls = self.param("class_embedding", nn.initializers.zeros, (h,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, h)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (x.shape[1], h))
        x = x + pos.astype(x.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layernorm")(x)
        # nn.remat keeps module names/param paths; only the backward changes
        layer_cls = nn.remat(CLIPLayer) if self.remat else CLIPLayer
        layers = [layer_cls(h, self.num_heads, h * self.mlp_ratio,
                            dtype=self.dtype, fused_qkv=self.fused_qkv,
                            name=f"layer_{i}")
                  for i in range(self.num_layers)]
        if self._use_fold(train, x.shape[1], h):
            x = self._fold_forward(x, layers)
        else:
            for layer in layers:
                x = layer(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return x, pooled

    def _use_fold(self, train: bool, num_tokens: int, h: int) -> bool:
        """Whether to run the encoder through the whole-stack Pallas
        kernel (ops/pallas_encoder.fused_encoder_stack — measured 5.74 ->
        5.27 ms/batch on the flagship decode program's profile). Kernel
        has no VJP, so it only ever engages on inference forwards
        (``train=False``; no existing call site differentiates one — a
        future one fails loudly at trace time; ICT_ENCODER_FOLD=0
        reverts). Initialization always takes the XLA path (the fold
        reads the per-layer params, which do not exist yet during init);
        ICT_ENCODER_FOLD=force engages it in interpret mode too (the CPU
        parity tests)."""
        from ..ops.pallas_encoder import (encoder_fold_mode,
                                          fused_encoder_supported)

        mode = encoder_fold_mode()
        if mode == "0" or train or self.remat or self.is_initializing():
            return False
        if jax.default_backend() == "tpu":
            return fused_encoder_supported(num_tokens, h,
                                           h * self.mlp_ratio, self.dtype)
        return mode == "force"

    def _fold_forward(self, x, layers):
        """All layers as ONE pallas_call: pad the token axis to a 16-row
        bf16 sublane tile (padded positions are masked out of every
        softmax), stack the per-layer weights (Dense kernels/biases cast
        to the module dtype exactly as promote_dtype would; LayerNorm
        scale/bias stay f32 — flax uses them unpromoted in the f32
        statistics path), run the kernel, drop the padding."""
        from ..ops.pallas_encoder import fused_encoder_stack

        B, T, h = x.shape
        tpad = -(-T // 16) * 16
        dt = self.dtype
        cols = {k: [] for k in ("wqkv", "bqkv", "wo", "bo", "g1", "b1",
                                "g2", "b2", "wfc", "bfc", "wpj", "bpj")}
        for layer in layers:
            pp = layer.variables["params"]
            att = pp["attention"]
            if "qkv" in att:
                kw, kb = att["qkv"]["kernel"], att["qkv"]["bias"]
            else:
                # unfused q/k/v params: one [h, 3h] matmul is numerically
                # identical (each output column block is the same dot)
                kw = jnp.concatenate([att["query"]["kernel"],
                                      att["key"]["kernel"],
                                      att["value"]["kernel"]], axis=1)
                kb = jnp.concatenate([att["query"]["bias"],
                                      att["key"]["bias"],
                                      att["value"]["bias"]])
            cols["wqkv"].append(kw.astype(dt))
            cols["bqkv"].append(kb.astype(dt))
            cols["wo"].append(att["out"]["kernel"].astype(dt))
            cols["bo"].append(att["out"]["bias"].astype(dt))
            cols["g1"].append(pp["layer_norm1"]["scale"])
            cols["b1"].append(pp["layer_norm1"]["bias"])
            cols["g2"].append(pp["layer_norm2"]["scale"])
            cols["b2"].append(pp["layer_norm2"]["bias"])
            cols["wfc"].append(pp["fc1"]["kernel"].astype(dt))
            cols["bfc"].append(pp["fc1"]["bias"].astype(dt))
            cols["wpj"].append(pp["fc2"]["kernel"].astype(dt))
            cols["bpj"].append(pp["fc2"]["bias"].astype(dt))
        stack = {k: jnp.stack(v) for k, v in cols.items()}
        xp = jnp.pad(x, ((0, 0), (0, tpad - T), (0, 0)))
        out = fused_encoder_stack(xp, stack, T, num_heads=self.num_heads,
                                  ln_eps=1e-5)
        return out[:, :T]


class CLIPEncoder(nn.Module):
    """CLIP-vision encoder (reference: src/models/encoders.py:185-230):
    features = patch tokens of the (un-post-layernormed) last hidden state,
    pooled = post-layernormed CLS, both projected to feature_dim."""

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x, pooled = CLIPVisionBackbone(
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            patch_size=cfg.patch_size,
            dtype=self.dtype,
            remat=getattr(cfg, "remat", False),
            fused_qkv=getattr(cfg, "fused_qkv", False),
            name="backbone",
        )(images, train=train)
        if cfg.freeze:
            x = jax.lax.stop_gradient(x)
            pooled = jax.lax.stop_gradient(pooled)
        features = x[:, 1:, :]
        if cfg.hidden_size != cfg.feature_dim:
            proj = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="proj")
            features = proj(features)
            pooled = proj(pooled)
        B, S = features.shape[:2]
        return {
            "features": features,
            "pooled_features": pooled,
            "attention_mask": jnp.ones((B, S), dtype=jnp.bool_),
        }


# ---------------------------------------------------------------------------
# Object region features (Bottom-Up Top-Down)
# ---------------------------------------------------------------------------


class ObjectRegionEncoder(nn.Module):
    """Pre-extracted detector-region encoder
    (reference: src/models/encoders.py:233-296): projects region features,
    fuses a small geometry MLP over (x, y, w, h) boxes, masked mean-pool.

    Input is a dict with ``region_features`` [B, N, input_dim],
    ``region_boxes`` [B, N, 4], ``region_mask`` [B, N] (True = valid).
    """

    config: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features_dict: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        region_features = features_dict["region_features"]
        region_boxes = features_dict.get("region_boxes")
        mask = features_dict["region_mask"]

        if cfg.region_feature_dim != cfg.feature_dim:
            features = nn.Dense(cfg.feature_dim, dtype=self.dtype,
                                name="proj")(region_features)
        else:
            features = region_features

        if region_boxes is not None:
            geo = nn.Dense(64, dtype=self.dtype, name="geo_proj_0")(region_boxes)
            geo = nn.relu(geo)
            geo = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="geo_proj_1")(geo)
            features = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="combine")(
                jnp.concatenate([features, geo], axis=-1))

        # Masked mean-pool (reference: src/models/encoders.py:284-290)
        m = mask.astype(features.dtype)[..., None]
        pooled = (features * m).sum(axis=1) / (m.sum(axis=1) + 1e-10)
        return {
            "features": features,
            "pooled_features": pooled,
            "attention_mask": mask.astype(jnp.bool_),
        }


def build_encoder(config: EncoderConfig, dtype=jnp.float32) -> nn.Module:
    """Factory (reference: src/models/encoders.py:299-312)."""
    from .swin import SwinEncoder  # local import: sizeable module

    # use_object_features routes the whole stack through the region
    # pipeline regardless of encoder_type (main.py/_object_mode do the
    # same) — checked FIRST so e.g. VIT + use_object_features doesn't
    # build an image encoder that then receives region-feature dicts
    if (config.encoder_type == EncoderType.OBJECT_REGION
            or config.use_object_features):
        return ObjectRegionEncoder(config, dtype=dtype)
    if config.encoder_type == EncoderType.RESNET:
        return ResNetEncoder(config, dtype=dtype)
    if config.encoder_type == EncoderType.VIT:
        return ViTEncoder(config, dtype=dtype)
    if config.encoder_type == EncoderType.SWIN:
        return SwinEncoder(config, dtype=dtype)
    if config.encoder_type == EncoderType.CLIP:
        return CLIPEncoder(config, dtype=dtype)
    raise ValueError(f"Unsupported encoder type: {config.encoder_type}")
