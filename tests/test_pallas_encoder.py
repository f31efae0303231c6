"""Whole-stack CLIP-encoder kernel (ops/pallas_encoder.py): parity vs the
XLA layer loop through the real CLIPEncoder module (interpret mode on CPU
— the same kernel code Mosaic compiles on TPU), the train/init gating,
and the support gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import EncoderConfig, EncoderType
from image_captioning_ml_project_tpu.models.encoders import CLIPEncoder


def _np(x):
    return np.asarray(x)


@pytest.fixture
def tiny_clip():
    cfg = EncoderConfig(encoder_type=EncoderType.CLIP, hidden_size=64,
                        num_layers=3, num_heads=4, patch_size=8,
                        feature_dim=64, freeze=False)
    enc = CLIPEncoder(config=cfg)
    images = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(1), images)
    return enc, variables, images


@pytest.mark.parametrize("fused_qkv", [False, True])
def test_encoder_fold_matches_xla(tiny_clip, monkeypatch, fused_qkv):
    """ICT_ENCODER_FOLD=force routes the inference forward through the
    whole-stack kernel; outputs must match the XLA layer loop (both the
    patch features and the post-layernormed pooled CLS)."""
    enc, variables, images = tiny_clip
    if fused_qkv:
        import dataclasses

        from image_captioning_ml_project_tpu.models.hf_port import (
            fuse_qkv_params)

        cfg = dataclasses.replace(enc.config, fused_qkv=True)
        enc = CLIPEncoder(config=cfg)
        variables = jax.tree_util.tree_map(
            jnp.asarray, fuse_qkv_params(variables))

    monkeypatch.setenv("ICT_ENCODER_FOLD", "0")
    ref = enc.apply(variables, images, train=False)
    monkeypatch.setenv("ICT_ENCODER_FOLD", "force")
    got = enc.apply(variables, images, train=False)
    np.testing.assert_allclose(_np(ref["features"]), _np(got["features"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(_np(ref["pooled_features"]),
                               _np(got["pooled_features"]),
                               atol=1e-4, rtol=1e-4)


def test_encoder_fold_train_path_unfolded(tiny_clip, monkeypatch):
    """train=True must NEVER fold (the kernel has no VJP): the training
    forward stays differentiable even with the fold forced on."""
    enc, variables, images = tiny_clip
    monkeypatch.setenv("ICT_ENCODER_FOLD", "force")

    def loss(params):
        out = enc.apply({"params": params}, images, train=True)
        return jnp.sum(out["pooled_features"] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(_np(l)).all() for l in leaves)


def test_encoder_fold_dispatches(tiny_clip, monkeypatch):
    """Spy on the kernel entry: force mode must reach
    fused_encoder_stack on the inference forward."""
    import image_captioning_ml_project_tpu.ops.pallas_encoder as pe

    calls = []
    real = pe.fused_encoder_stack

    def spy(*args, **kwargs):
        calls.append(args[0].shape)
        return real(*args, **kwargs)

    monkeypatch.setattr(pe, "fused_encoder_stack", spy)
    enc, variables, images = tiny_clip
    monkeypatch.setenv("ICT_ENCODER_FOLD", "force")
    enc.apply(variables, images, train=False)
    assert calls, "encoder stack kernel never dispatched"


def test_encoder_fold_supported_shapes():
    from image_captioning_ml_project_tpu.ops.pallas_encoder import (
        fused_encoder_supported)

    assert fused_encoder_supported(50, 768, 3072)     # flagship CLIP
    assert not fused_encoder_supported(50, 64, 256)   # narrow test width
    assert not fused_encoder_supported(50, 768, 3000)  # unaligned MLP
