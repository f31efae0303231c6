"""Data layer tests: tokenizers, COCO dataset semantics (train per-caption /
eval grouped with fixed ref padding), object features, batching, prefetch
sharding over the virtual 8-device mesh."""

import numpy as np
import pytest

from image_captioning_ml_project_tpu.data.coco import (
    COCOCaptionDataset,
    ObjectDetectionFeaturesDataset,
    build_coco_datasets,
    collate,
    iterate_batches,
    normalize_images,
)
from image_captioning_ml_project_tpu.data.synthetic import (
    make_synthetic_coco,
    make_synthetic_object_features,
)
from image_captioning_ml_project_tpu.data.tokenizer import (
    WordVocab,
    word_tokenize,
)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_synthetic_coco(str(root), num_images=6, captions_per_image=3,
                               image_size=48)


@pytest.fixture(scope="module")
def vocab(coco_root):
    import json, os

    with open(os.path.join(coco_root, "annotations/captions_train2014.json")) as f:
        ann = json.load(f)
    return WordVocab.build([a["caption"] for a in ann["annotations"]], threshold=1)


def test_word_tokenize():
    assert word_tokenize("A man, riding a horse!") == [
        "a", "man", ",", "riding", "a", "horse", "!"]


def test_vocab_specials_and_roundtrip(vocab, tmp_path):
    assert vocab.pad_token_id == 0
    assert vocab.bos_token_id == 1
    assert vocab.eos_token_id == 2
    assert vocab.unk_token_id == 3
    ids, mask = vocab.encode("a man riding", max_length=8)
    assert ids[0] == 1  # <start>
    assert mask.sum() == 5  # start + 3 words + end
    assert ids[mask.sum() - 1] == 2  # <end>
    assert (ids[mask.sum():] == 0).all()
    assert vocab.decode(ids) == "a man riding"

    path = str(tmp_path / "vocab.json")
    vocab.save(path)
    v2 = WordVocab.load(path)
    assert v2.word2idx == vocab.word2idx


def test_vocab_threshold():
    v = WordVocab.build(["cat cat cat", "dog"], threshold=2)
    assert "cat" in v.word2idx
    assert "dog" not in v.word2idx
    ids, _ = v.encode("dog", 4)
    assert ids[1] == v.unk_token_id


def test_train_dataset_per_caption_rows(coco_root, vocab):
    ds = COCOCaptionDataset(coco_root, "annotations/captions_train2014.json",
                            "train2014", vocab, image_size=32, max_length=16,
                            is_training=True)
    assert len(ds) == 6 * 3  # one row per annotation
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].dtype == np.uint8
    assert s["caption_tokens"].shape == (16,)


def test_eval_dataset_grouped_fixed_refs(coco_root, vocab):
    ds = COCOCaptionDataset(coco_root, "annotations/captions_val2014.json",
                            "val2014", vocab, image_size=32, max_length=16,
                            is_training=False, max_ref_captions=5)
    assert len(ds) == 6  # grouped per image
    s = ds[0]
    assert s["caption_tokens"].shape == (5, 16)
    assert s["ref_mask"].sum() == 3  # 3 real refs, 2 padded
    assert len(s["captions"]) == 3


def test_iterate_batches_fixed_shapes(coco_root, vocab):
    ds = COCOCaptionDataset(coco_root, "annotations/captions_train2014.json",
                            "train2014", vocab, image_size=32, max_length=16,
                            is_training=True)
    batches = list(iterate_batches(ds, batch_size=4, shuffle=True, seed=1))
    assert len(batches) == len(ds) // 4
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["caption_tokens"].shape == (4, 16)
        assert isinstance(b["caption"], list)


def test_object_features_dataset(coco_root, vocab, tmp_path):
    ann = f"{coco_root}/annotations/captions_train2014.json"
    feat_dir = make_synthetic_object_features(str(tmp_path / "feats"), ann,
                                              max_objects=8, feature_dim=32)
    ds = ObjectDetectionFeaturesDataset(feat_dir, ann, vocab, max_objects=8,
                                        max_length=16, feature_dim=32)
    s = ds[0]
    assert s["region_features"].shape == (8, 32)
    assert s["region_boxes"].shape == (8, 4)
    assert s["region_mask"].any()
    # missing file -> zero fill, not crash (reference :307-315)
    ds_bad = ObjectDetectionFeaturesDataset(str(tmp_path / "missing"), ann,
                                            vocab, max_objects=8,
                                            max_length=16, feature_dim=32)
    s = ds_bad[0]
    assert (s["region_features"] == 0).all()
    assert not s["region_mask"].any()


def test_normalize_images_on_device():
    import jax.numpy as jnp

    img = np.full((1, 2, 2, 3), 255, dtype=np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_prefetch_shards_over_mesh(coco_root, vocab):
    import jax
    from jax.sharding import Mesh
    from image_captioning_ml_project_tpu.data.pipeline import prefetch

    ds = COCOCaptionDataset(coco_root, "annotations/captions_train2014.json",
                            "train2014", vocab, image_size=32, max_length=16,
                            is_training=True)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    batches = list(prefetch(iterate_batches(ds, batch_size=8), mesh=mesh))
    assert len(batches) >= 1
    arr = batches[0]["image"]
    assert arr.shape == (8, 32, 32, 3)
    # one shard of the batch axis per device
    assert len(arr.sharding.device_set) == 8


def test_build_coco_datasets(coco_root, vocab):
    from image_captioning_ml_project_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.data_root = coco_root
    cfg.image_size = 32
    cfg.model.decoder.max_length = 16
    train, val = build_coco_datasets(cfg, vocab)
    assert train.is_training and not val.is_training
    assert len(train) > len(val)


def test_iterate_batches_worker_count_invariant(coco_root, vocab):
    """Batches are bit-identical for any num_workers (0, 2): sample
    augmentation RNG is seeded per (seed, index), torch-DataLoader style,
    in both the serial path and the fork-based process pool."""
    ds = COCOCaptionDataset(
        root_dir=coco_root,
        annotation_file="annotations/captions_train2014.json",
        image_dir="train2014", tokenizer=vocab, image_size=24, max_length=12,
        is_training=True)
    a = list(iterate_batches(ds, 4, shuffle=True, seed=3, num_workers=0))
    b = list(iterate_batches(ds, 4, shuffle=True, seed=3, num_workers=2))
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["caption_tokens"],
                                      bb["caption_tokens"])
