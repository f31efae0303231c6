"""HuggingFace torch checkpoint → Flax parameter porting.

The reference loads pretrained HF torch models directly
(reference: src/models/encoders.py:47,104,150,195 and
src/models/decoders.py:513). The TPU rebuild keeps its own Flax
architectures (XLA-compiled, NHWC) and ports HF weights into them with the
converters below. Conventions:

* torch ``nn.Linear.weight`` is ``[out, in]`` → flax ``kernel`` ``[in, out]``
  (transpose);
* torch ``nn.Conv2d.weight`` is ``[out, in, kh, kw]`` → flax ``[kh, kw, in,
  out]`` (permute 2,3,1,0);
* BatchNorm running stats go to the ``batch_stats`` collection.

All converters accept a flat ``state_dict``-like mapping of name → numpy
array (call ``{k: v.numpy() for k, v in model.state_dict().items()}`` on the
torch side) and return ``{"params": ..., "batch_stats": ...}`` trees matching
the modules in :mod:`.encoders`, :mod:`.swin`, and :mod:`.gpt2`.

Numerics are validated end-to-end against tiny random HF torch models in
tests/test_encoders.py and tests/test_decoders.py.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight -> flax Dense kernel."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight -> flax Conv kernel (NHWC)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _batchnorm(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _self_attention(sd, prefix_q, prefix_k, prefix_v, prefix_o):
    """Map q/k/v/out linears to a TransformerSelfAttention block."""
    return {
        "query": _dense(sd, prefix_q),
        "key": _dense(sd, prefix_k),
        "value": _dense(sd, prefix_v),
        "out": _dense(sd, prefix_o),
    }


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


def port_resnet(sd: Mapping[str, np.ndarray], depths) -> Dict[str, Any]:
    """HF ResNetModel state_dict -> {params, batch_stats} for ResNetEncoder's
    ``backbone`` submodule."""

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_layer(dst: str, src: str):
        p, s = _batchnorm(sd, f"{src}.normalization")
        params[dst] = {
            "convolution": {"kernel": _conv(sd[f"{src}.convolution.weight"])},
            "normalization": p,
        }
        stats[dst] = {"normalization": s}

    conv_layer("embedder", "embedder.embedder")

    for s_idx, depth in enumerate(depths):
        for l_idx in range(depth):
            src = f"encoder.stages.{s_idx}.layers.{l_idx}"
            dst = f"stage_{s_idx}_layer_{l_idx}"
            sub_p: Dict[str, Any] = {}
            sub_s: Dict[str, Any] = {}
            i = 0
            while f"{src}.layer.{i}.convolution.weight" in sd:
                p, st = _batchnorm(sd, f"{src}.layer.{i}.normalization")
                sub_p[f"layer_{i}"] = {
                    "convolution": {"kernel": _conv(sd[f"{src}.layer.{i}.convolution.weight"])},
                    "normalization": p,
                }
                sub_s[f"layer_{i}"] = {"normalization": st}
                i += 1
            if f"{src}.shortcut.convolution.weight" in sd:
                p, st = _batchnorm(sd, f"{src}.shortcut.normalization")
                sub_p["shortcut"] = {
                    "convolution": {"kernel": _conv(sd[f"{src}.shortcut.convolution.weight"])},
                    "normalization": p,
                }
                sub_s["shortcut"] = {"normalization": st}
            params[dst] = sub_p
            stats[dst] = sub_s

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


def port_vit(sd: Mapping[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    """HF ViTModel state_dict -> params for ViTEncoder's ``backbone``."""
    params: Dict[str, Any] = {
        "cls_token": sd["embeddings.cls_token"],
        "position_embeddings": sd["embeddings.position_embeddings"],
        "patch_embed": {
            "kernel": _conv(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "layernorm": _layernorm(sd, "layernorm"),
        "pooler": _dense(sd, "pooler.dense"),
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": _layernorm(sd, f"{src}.layernorm_before"),
            "layernorm_after": _layernorm(sd, f"{src}.layernorm_after"),
            "attention": _self_attention(
                sd,
                f"{src}.attention.attention.query",
                f"{src}.attention.attention.key",
                f"{src}.attention.attention.value",
                f"{src}.attention.output.dense",
            ),
            "intermediate": _dense(sd, f"{src}.intermediate.dense"),
            "output": _dense(sd, f"{src}.output.dense"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------


def port_clip_vision(sd: Mapping[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    """HF CLIPVisionModel state_dict -> params for CLIPEncoder's ``backbone``."""
    p = "vision_model"
    params: Dict[str, Any] = {
        "class_embedding": sd[f"{p}.embeddings.class_embedding"],
        "position_embeddings": sd[f"{p}.embeddings.position_embedding.weight"],
        "patch_embed": {
            "kernel": _conv(sd[f"{p}.embeddings.patch_embedding.weight"]),
        },
        # HF's attribute is literally spelled "pre_layrnorm"
        "pre_layernorm": _layernorm(sd, f"{p}.pre_layrnorm"),
        "post_layernorm": _layernorm(sd, f"{p}.post_layernorm"),
    }
    for i in range(num_layers):
        src = f"{p}.encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm1": _layernorm(sd, f"{src}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{src}.layer_norm2"),
            "attention": _self_attention(
                sd,
                f"{src}.self_attn.q_proj",
                f"{src}.self_attn.k_proj",
                f"{src}.self_attn.v_proj",
                f"{src}.self_attn.out_proj",
            ),
            "fc1": _dense(sd, f"{src}.mlp.fc1"),
            "fc2": _dense(sd, f"{src}.mlp.fc2"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------


def port_swin(sd: Mapping[str, np.ndarray], depths) -> Dict[str, Any]:
    """HF SwinModel state_dict -> params for SwinEncoder's ``backbone``."""
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "embed_norm": _layernorm(sd, "embeddings.norm"),
        "layernorm": _layernorm(sd, "layernorm"),
    }
    for s_idx, depth in enumerate(depths):
        for b_idx in range(depth):
            src = f"encoder.layers.{s_idx}.blocks.{b_idx}"
            params[f"stage_{s_idx}_block_{b_idx}"] = {
                "layernorm_before": _layernorm(sd, f"{src}.layernorm_before"),
                "layernorm_after": _layernorm(sd, f"{src}.layernorm_after"),
                "attention": {
                    "query": _dense(sd, f"{src}.attention.self.query"),
                    "key": _dense(sd, f"{src}.attention.self.key"),
                    "value": _dense(sd, f"{src}.attention.self.value"),
                    "out": _dense(sd, f"{src}.attention.output.dense"),
                    "relative_position_bias_table":
                        sd[f"{src}.attention.self.relative_position_bias_table"],
                },
                "intermediate": _dense(sd, f"{src}.intermediate.dense"),
                "output": _dense(sd, f"{src}.output.dense"),
            }
        if f"encoder.layers.{s_idx}.downsample.reduction.weight" in sd:
            params[f"stage_{s_idx}_downsample"] = {
                "norm": _layernorm(sd, f"encoder.layers.{s_idx}.downsample.norm"),
                "reduction": {
                    "kernel": _t(sd[f"encoder.layers.{s_idx}.downsample.reduction.weight"])
                },
            }
    return {"params": params}


def resize_token_embeddings(params: Dict[str, Any], new_vocab_size: int,
                            table_key: str = "wte",
                            init_std: float = 0.02,
                            seed: int = 0) -> Dict[str, Any]:
    """Resize a ported embedding table to a new vocabulary size — HF
    ``resize_token_embeddings`` semantics (reference use:
    src/models/decoders.py:515-517): existing rows are kept; new rows are
    normal(0, init_std); extra rows are truncated. With a tied LM head
    (our GPT-2) the output head resizes implicitly."""
    table = np.asarray(params[table_key]["embedding"])
    old, dim = table.shape
    if new_vocab_size == old:
        return params
    if new_vocab_size < old:
        new_table = table[:new_vocab_size]
    else:
        rng = np.random.RandomState(seed)
        extra = rng.normal(0.0, init_std,
                           (new_vocab_size - old, dim)).astype(table.dtype)
        new_table = np.concatenate([table, extra], axis=0)
    out = dict(params)
    out[table_key] = dict(params[table_key], embedding=new_table)
    return out


# ---------------------------------------------------------------------------
# GPT-2
# ---------------------------------------------------------------------------


def port_gpt2(sd: Mapping[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    """HF GPT2LMHeadModel state_dict -> params for the Flax GPT2 backbone.

    HF GPT-2 uses Conv1D layers whose weights are already ``[in, out]`` — no
    transpose needed (unlike nn.Linear).
    """
    prefix = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    params: Dict[str, Any] = {
        "wte": {"embedding": sd[f"{prefix}wte.weight"]},
        "wpe": {"embedding": sd[f"{prefix}wpe.weight"]},
        "ln_f": _layernorm(sd, f"{prefix}ln_f"),
    }
    for i in range(num_layers):
        src = f"{prefix}h.{i}"
        params[f"block_{i}"] = {
            "ln_1": _layernorm(sd, f"{src}.ln_1"),
            "ln_2": _layernorm(sd, f"{src}.ln_2"),
            "attn": {
                "c_attn": {"kernel": sd[f"{src}.attn.c_attn.weight"],
                           "bias": sd[f"{src}.attn.c_attn.bias"]},
                "c_proj": {"kernel": sd[f"{src}.attn.c_proj.weight"],
                           "bias": sd[f"{src}.attn.c_proj.bias"]},
            },
            "mlp": {
                "c_fc": {"kernel": sd[f"{src}.mlp.c_fc.weight"],
                         "bias": sd[f"{src}.mlp.c_fc.bias"]},
                "c_proj": {"kernel": sd[f"{src}.mlp.c_proj.weight"],
                           "bias": sd[f"{src}.mlp.c_proj.bias"]},
            },
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# Fused-QKV layout migration
# ---------------------------------------------------------------------------


def fuse_qkv_params(params):
    """Migrate unfused attention param trees into the ``fused_qkv`` layout.

    Recursively replaces every ``{"query", "key", "value", ...}`` dict (the
    TransformerSelfAttention layout produced by the ports above and by
    unfused checkpoints) with ``{"qkv": concat, ...}``: kernels concatenate
    on the output axis, biases likewise — the single ``[h, 3h]`` matmul
    computes the identical projections (models/encoders.py). Leaves every
    other subtree untouched; returns a new tree.
    """
    if not isinstance(params, Mapping):
        return params
    if all(k in params for k in ("query", "key", "value")):
        fused = dict(params)
        q, k, v = (fused.pop(n) for n in ("query", "key", "value"))
        fused["qkv"] = {
            "kernel": np.concatenate(
                [np.asarray(q["kernel"]), np.asarray(k["kernel"]),
                 np.asarray(v["kernel"])], axis=-1),
            "bias": np.concatenate(
                [np.asarray(q["bias"]), np.asarray(k["bias"]),
                 np.asarray(v["bias"])], axis=-1),
        }
        return {kk: fuse_qkv_params(vv) if kk != "qkv" else vv
                for kk, vv in fused.items()}
    return {kk: fuse_qkv_params(vv) for kk, vv in params.items()}
