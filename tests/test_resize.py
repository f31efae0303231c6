"""Device-resident resize (ops/resize.py): PIL agreement, identity
exactness, padded-canvas safety, and dataset/trainer plumbing of the
decode-only host path (VERDICT r2 task 3)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from PIL import Image

from image_captioning_ml_project_tpu.data.coco import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_image_square,
)
from image_captioning_ml_project_tpu.ops.resize import (
    resize_normalize,
    resize_square,
)


def _smooth_image(rng, side):
    """Low-frequency test image (resize filters agree best away from
    aliasing edges; PIL uses fixed-point accumulation so bit-exactness is
    impossible either way)."""
    small = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    return np.asarray(Image.fromarray(small).resize((side, side),
                                                    Image.BILINEAR))


@pytest.mark.parametrize("side", [224, 300, 447])
def test_resize_matches_pil(rng, side):
    out_size = 224
    img = _smooth_image(rng, side)
    canvas = np.zeros((448, 448, 3), dtype=np.uint8)
    canvas[:side, :side] = img

    got = np.asarray(resize_square(jnp.asarray(canvas)[None],
                                   jnp.asarray([side]), out_size))[0]
    want = np.asarray(Image.fromarray(img).resize((out_size, out_size),
                                                  Image.BILINEAR),
                      dtype=np.float32)
    err = np.abs(got - want).mean()
    assert err < 1.0, f"mean abs error vs PIL {err:.3f} (side {side})"
    assert np.abs(got - want).max() < 4.0


def test_resize_identity_is_exact(rng):
    """side == out_size: the triangle filter degenerates to identity."""
    img = rng.randint(0, 256, (224, 224, 3)).astype(np.uint8)
    canvas = np.zeros((448, 448, 3), dtype=np.uint8)
    canvas[:224, :224] = img
    got = np.asarray(resize_square(jnp.asarray(canvas)[None],
                                   jnp.asarray([224]), 224))[0]
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-3)


def test_resize_ignores_canvas_padding(rng):
    """Garbage outside the [0, side) square must not leak into the output."""
    img = _smooth_image(rng, 300)
    canvas = np.full((448, 448, 3), 255, dtype=np.uint8)  # hostile padding
    canvas[:300, :300] = img
    clean = np.zeros_like(canvas)
    clean[:300, :300] = img
    a = np.asarray(resize_square(jnp.asarray(canvas)[None],
                                 jnp.asarray([300]), 224))
    b = np.asarray(resize_square(jnp.asarray(clean)[None],
                                 jnp.asarray([300]), 224))
    np.testing.assert_array_equal(a, b)


def test_resize_normalize_matches_host_normalize(rng):
    img = _smooth_image(rng, 224)
    canvas = np.zeros((448, 448, 3), dtype=np.uint8)
    canvas[:224, :224] = img
    got = np.asarray(resize_normalize(jnp.asarray(canvas)[None],
                                      jnp.asarray([224]), 224))[0]
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_load_image_square_jpeg(tmp_path, rng):
    """Draft decode keeps the centered square and reports its side."""
    img = _smooth_image(rng, 500)[:, :400]  # 500 x 400 landscape-ish
    p = tmp_path / "img.jpg"
    Image.fromarray(img).save(p, quality=95)
    canvas, side = load_image_square(str(p), 224, 448)
    assert canvas.shape == (448, 448, 3)
    assert 224 <= side <= 448
    # content occupies exactly the [0, side) square
    assert canvas[:side, :side].any()
    assert not canvas[side:].any() and not canvas[:, side:].any()


@pytest.mark.slow
def test_evaluate_cli_with_device_resize(tmp_path):
    """evaluate() end-to-end with config.device_resize: canvases flow
    through _batch_inputs/_prepare_inputs, decode covers every image."""
    import json
    import os

    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.main import evaluate

    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=6, captions_per_image=2,
                        image_size=48)
    with open(os.path.join(root,
                           "annotations/captions_train2014.json")) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)
    cfg = get_default_config()
    cfg.data_root = root
    cfg.image_size = 32
    cfg.device_resize = True
    cfg.output_dir = str(tmp_path / "out")
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.model.encoder.encoder_type = EncoderType.VIT
    for f_ in ("feature_dim", "hidden_size"):
        setattr(cfg.model.encoder, f_, 16)
    cfg.model.encoder.num_layers = 1
    cfg.model.encoder.num_heads = 2
    cfg.model.encoder.patch_size = 8
    cfg.model.encoder.image_size = 32
    cfg.model.decoder.decoder_type = DecoderType.LSTM
    cfg.model.decoder.hidden_dim = 16
    cfg.model.decoder.num_layers = 1
    cfg.model.decoder.max_length = 12
    cfg.model.attention.attention_type = AttentionType.SOFT
    cfg.model.attention.hidden_dim = 16
    cfg.model.projection_dim = 16
    cfg.model.vocab_size = vocab.vocab_size
    cfg.model.pad_token_id = vocab.pad_token_id
    cfg.model.bos_token_id = vocab.bos_token_id
    cfg.model.eos_token_id = vocab.eos_token_id
    cfg.inference.max_length = 8
    cfg.inference.num_candidates = 4
    cfg.inference.decoding_strategy = "greedy"

    metrics = evaluate(cfg, tokenizer=vocab)
    assert "CIDEr" in metrics and np.isfinite(metrics["CIDEr"])


def test_device_resize_dataset_and_trainer(tmp_path):
    """End-to-end plumbing: device_resize datasets emit canvas batches, the
    trainer resizes on device, and eval decodes every image."""
    import json
    import os

    from image_captioning_ml_project_tpu.data.coco import (
        COCOCaptionDataset, build_coco_datasets, iterate_batches)
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab

    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=4, captions_per_image=2,
                        image_size=64)
    with open(os.path.join(root,
                           "annotations/captions_train2014.json")) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)
    ds = COCOCaptionDataset(
        root_dir=root, annotation_file="annotations/captions_val2014.json",
        image_dir="val2014", tokenizer=vocab, image_size=32, max_length=16,
        is_training=False, device_resize=True)
    batch = next(iterate_batches(ds, 4, drop_last=False, pad_last=True))
    assert batch["image"].shape == (4, ds.canvas_size, ds.canvas_size, 3)
    assert batch["image_size"].shape == (4,)

    from image_captioning_ml_project_tpu.ops.resize import resize_normalize

    out = resize_normalize(jnp.asarray(batch["image"]),
                           jnp.asarray(batch["image_size"]), 32)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
