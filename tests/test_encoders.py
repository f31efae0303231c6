"""Encoder golden-parity tests.

Each Flax encoder backbone is compared against the corresponding tiny random
HF torch model with weights ported through hf_port — the strategy SURVEY.md
§4 calls "golden-value tests porting small HF weight slices". No network:
HF models are constructed from small random configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_captioning_ml_project_tpu.config import EncoderConfig, EncoderType
from image_captioning_ml_project_tpu.models import hf_port
from image_captioning_ml_project_tpu.models.encoders import (
    CLIPEncoder,
    ObjectRegionEncoder,
    ResNetEncoder,
    ViTEncoder,
    build_encoder,
)
from image_captioning_ml_project_tpu.models.swin import SwinEncoder


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(images_nchw):
    return np.ascontiguousarray(images_nchw.transpose(0, 2, 3, 1))


IMG = 32


@pytest.mark.slow
def test_resnet_backbone_matches_hf(rng):
    from transformers import ResNetConfig, ResNetModel

    hf_cfg = ResNetConfig(embedding_size=8, hidden_sizes=[16, 32],
                          depths=[1, 2], layer_type="bottleneck")
    torch_model = ResNetModel(hf_cfg).eval()

    cfg = EncoderConfig(encoder_type=EncoderType.RESNET, feature_dim=12,
                        resnet_hidden_sizes=(16, 32), resnet_depths=(1, 2),
                        resnet_embedding_size=8)
    enc = ResNetEncoder(cfg)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), _nhwc(x))

    ported = hf_port.port_resnet(_sd(torch_model), depths=[1, 2])
    # embedding_size in our module is fixed at 64 by default; check port shape
    params = dict(variables["params"])
    params["backbone"] = ported["params"]
    batch_stats = {"backbone": ported["batch_stats"]}

    # our encoder config uses embedding size 64 internally: rebuild with 8
    enc = ResNetEncoder(cfg)
    out = enc.apply({"params": params, "batch_stats": batch_stats}, _nhwc(x),
                    train=False)

    with torch.no_grad():
        hf_out = torch_model(torch.tensor(x))
    hf_feats = hf_out.last_hidden_state.numpy()  # [B, C, H, W]
    B, C, H, W = hf_feats.shape
    hf_tokens = hf_feats.reshape(B, C, H * W).transpose(0, 2, 1)
    hf_pooled = hf_out.pooler_output.numpy().reshape(B, C)

    # Undo our projection to compare backbone outputs directly: compare
    # pre-projection by projecting hf tokens with our proj params.
    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out["features"]), hf_tokens @ proj_k + proj_b,
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pooled_features"]), hf_pooled @ proj_k + proj_b,
        rtol=2e-3, atol=2e-4)


def test_vit_backbone_matches_hf(rng):
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(hidden_size=24, num_hidden_layers=2,
                       num_attention_heads=3, intermediate_size=96,
                       image_size=IMG, patch_size=8)
    torch_model = ViTModel(hf_cfg).eval()

    cfg = EncoderConfig(encoder_type=EncoderType.VIT, feature_dim=16,
                        hidden_size=24, num_layers=2, num_heads=3,
                        mlp_ratio=4, patch_size=8, image_size=IMG)
    enc = ViTEncoder(cfg)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), _nhwc(x))
    params = dict(variables["params"])
    params["backbone"] = hf_port.port_vit(_sd(torch_model), num_layers=2)["params"]

    out = ViTEncoder(cfg).apply({"params": params}, _nhwc(x))

    with torch.no_grad():
        hf_out = torch_model(torch.tensor(x))
    hf_patch = hf_out.last_hidden_state.numpy()[:, 1:, :]
    hf_pooled = hf_out.pooler_output.numpy()

    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    np.testing.assert_allclose(np.asarray(out["features"]),
                               hf_patch @ proj_k + proj_b, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pooled_features"]),
                               hf_pooled @ proj_k + proj_b, rtol=1e-3, atol=1e-4)


def test_clip_backbone_matches_hf(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(hidden_size=24, num_hidden_layers=2,
                              num_attention_heads=3, intermediate_size=96,
                              image_size=IMG, patch_size=8)
    torch_model = CLIPVisionModel(hf_cfg).eval()

    cfg = EncoderConfig(encoder_type=EncoderType.CLIP, feature_dim=16,
                        hidden_size=24, num_layers=2, num_heads=3,
                        mlp_ratio=4, patch_size=8, image_size=IMG)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    enc = CLIPEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), _nhwc(x))
    params = dict(variables["params"])
    params["backbone"] = hf_port.port_clip_vision(_sd(torch_model), num_layers=2)["params"]

    out = CLIPEncoder(cfg).apply({"params": params}, _nhwc(x))

    with torch.no_grad():
        hf_out = torch_model(torch.tensor(x))
    hf_patch = hf_out.last_hidden_state.numpy()[:, 1:, :]
    hf_pooled = hf_out.pooler_output.numpy()

    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    np.testing.assert_allclose(np.asarray(out["features"]),
                               hf_patch @ proj_k + proj_b, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pooled_features"]),
                               hf_pooled @ proj_k + proj_b, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("img", [
    IMG,  # patch grid divisible by the window
    40,   # grid 10: window-pad to 12 (HF maybe_pad), then odd-res merge
])
@pytest.mark.slow
def test_swin_backbone_matches_hf(rng, img):
    from transformers import SwinConfig, SwinModel

    hf_cfg = SwinConfig(image_size=img, patch_size=4, embed_dim=8,
                        depths=[2, 2], num_heads=[2, 4], window_size=4,
                        drop_path_rate=0.0)
    torch_model = SwinModel(hf_cfg).eval()

    cfg = EncoderConfig(encoder_type=EncoderType.SWIN, feature_dim=12,
                        image_size=img, swin_embed_dim=8, swin_depths=(2, 2),
                        swin_num_heads=(2, 4), swin_window_size=4, mlp_ratio=4)
    x = rng.randn(2, 3, img, img).astype(np.float32)
    enc = SwinEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), _nhwc(x))
    params = dict(variables["params"])
    params["backbone"] = hf_port.port_swin(_sd(torch_model), depths=[2, 2])["params"]

    out = SwinEncoder(cfg).apply({"params": params}, _nhwc(x))

    with torch.no_grad():
        hf_out = torch_model(torch.tensor(x))
    hf_tokens = hf_out.last_hidden_state.numpy()

    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    expected = hf_tokens @ proj_k + proj_b
    np.testing.assert_allclose(np.asarray(out["features"]), expected,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pooled_features"]),
                               expected.mean(axis=1), rtol=1e-3, atol=1e-4)


def test_object_region_encoder(rng):
    cfg = EncoderConfig(encoder_type=EncoderType.OBJECT_REGION, feature_dim=16,
                        region_feature_dim=32, max_objects=6)
    feats = {
        "region_features": rng.randn(2, 6, 32).astype(np.float32),
        "region_boxes": rng.rand(2, 6, 4).astype(np.float32),
        "region_mask": np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=bool),
    }
    enc = ObjectRegionEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats)
    out = enc.apply(variables, feats)
    assert out["features"].shape == (2, 6, 16)
    assert out["pooled_features"].shape == (2, 16)
    # Masked mean-pool: padding rows must not influence pooled features.
    feats2 = dict(feats)
    feats2["region_features"] = feats["region_features"].copy()
    feats2["region_features"][0, 3:] = 999.0  # padded rows
    out2 = enc.apply(variables, feats2)
    np.testing.assert_allclose(np.asarray(out["pooled_features"][0]),
                               np.asarray(out2["pooled_features"][0]),
                               rtol=1e-5, atol=1e-5)


def test_build_encoder_factory():
    for et in [EncoderType.RESNET, EncoderType.VIT, EncoderType.SWIN,
               EncoderType.CLIP, EncoderType.OBJECT_REGION]:
        mod = build_encoder(EncoderConfig(encoder_type=et))
        assert mod is not None
    with pytest.raises(ValueError):
        build_encoder(EncoderConfig(encoder_type=EncoderType.CONVNEXT))


def test_freeze_stops_backbone_gradients(rng):
    cfg = EncoderConfig(encoder_type=EncoderType.VIT, feature_dim=12,
                        hidden_size=16, num_layers=1, num_heads=2,
                        patch_size=8, image_size=16, freeze=True)
    enc = ViTEncoder(cfg)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out = enc.apply({"params": params}, x)
        return (out["pooled_features"] ** 2).sum()

    grads = jax.grad(loss)(variables["params"])
    backbone_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["backbone"]))
    proj_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["proj"]))
    assert backbone_norm == 0.0
    assert proj_norm > 0.0


class TestFusedQKV:
    """fused_qkv computes the identical projections as one [h, 3h] matmul
    (models/encoders.TransformerSelfAttention; migration:
    hf_port.fuse_qkv_params)."""

    @pytest.mark.parametrize("encoder_type", ["vit", "clip"])
    def test_fused_matches_unfused_bitwise(self, encoder_type):
        from image_captioning_ml_project_tpu.models.hf_port import (
            fuse_qkv_params)

        cfg = EncoderConfig(
            encoder_type=EncoderType(encoder_type), hidden_size=64,
            num_layers=2, num_heads=4, patch_size=16, image_size=32,
            feature_dim=48)
        cls = {"vit": ViTEncoder, "clip": CLIPEncoder}[encoder_type]
        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        m_u = cls(cfg)
        vars_u = m_u.init(jax.random.PRNGKey(1), imgs)
        out_u = m_u.apply(vars_u, imgs)

        cfg_f = EncoderConfig(**{**cfg.__dict__, "fused_qkv": True})
        m_f = cls(cfg_f)
        vars_f = {"params": fuse_qkv_params(vars_u["params"])}
        # the fused model's own init produces the fused tree shape
        ref_shapes = jax.tree_util.tree_map(
            jnp.shape, m_f.init(jax.random.PRNGKey(2), imgs)["params"])
        mig_shapes = jax.tree_util.tree_map(jnp.shape, vars_f["params"])
        assert ref_shapes == mig_shapes
        out_f = m_f.apply(vars_f, imgs)
        for k in ("features", "pooled_features"):
            assert jnp.array_equal(out_u[k], out_f[k]), k


class TestFoldNormalize:
    """config.fold_normalize: raw uint8 images through the ViT/CLIP patch
    embed with the ImageNet affine folded into the matmul
    (models/encoders.PatchEmbed) — same result as normalizing first, the
    normalized image never materialized."""

    @pytest.mark.parametrize("encoder_type", ["vit", "clip"])
    def test_folded_matches_normalized(self, encoder_type):
        from image_captioning_ml_project_tpu.data.coco import (
            normalize_images)

        cfg = EncoderConfig(
            encoder_type=EncoderType(encoder_type), hidden_size=64,
            num_layers=2, num_heads=4, patch_size=16, image_size=32,
            feature_dim=48)
        cls = {"vit": ViTEncoder, "clip": CLIPEncoder}[encoder_type]
        u8 = jax.random.randint(
            jax.random.PRNGKey(0), (2, 32, 32, 3), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        m = cls(cfg)
        variables = m.init(jax.random.PRNGKey(1), normalize_images(u8))
        out_norm = m.apply(variables, normalize_images(u8))
        out_fold = m.apply(variables, u8)  # same params, raw uint8 input
        for k in ("features", "pooled_features"):
            np.testing.assert_allclose(
                out_fold[k], out_norm[k], rtol=2e-4, atol=2e-4)

    def test_trainer_prepare_inputs_passthrough(self):
        from image_captioning_ml_project_tpu.config import get_default_config
        from image_captioning_ml_project_tpu.train.trainer import CaptioningTrainer

        c = get_default_config()
        c.model.encoder.encoder_type = EncoderType.VIT
        c.fold_normalize = True
        t = CaptioningTrainer.__new__(CaptioningTrainer)  # _prepare_inputs only needs .config
        t.config = c
        u8 = jnp.zeros((2, 32, 32, 3), dtype=jnp.uint8)
        out = t._prepare_inputs(u8)
        assert out.dtype == jnp.uint8  # untouched: the model folds it
        c.fold_normalize = False
        assert t._prepare_inputs(u8).dtype == jnp.float32

    def test_non_foldable_encoder_still_normalizes(self):
        from image_captioning_ml_project_tpu.config import get_default_config
        from image_captioning_ml_project_tpu.train.trainer import CaptioningTrainer

        c = get_default_config()
        c.model.encoder.encoder_type = EncoderType.RESNET
        c.fold_normalize = True
        t = CaptioningTrainer.__new__(CaptioningTrainer)  # only needs .config for this check
        t.config = c
        assert not t._fold_normalize()
