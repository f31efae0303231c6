"""scripts/make_karpathy_split: Karpathy dataset_coco.json → COCO-format
annotation files consumable by COCOCaptionDataset (the reference reports
Karpathy-split numbers, README.md:7,148, but ships no split tooling)."""

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from make_karpathy_split import convert  # noqa: E402

from image_captioning_ml_project_tpu.data.coco import COCOCaptionDataset
from image_captioning_ml_project_tpu.data.tokenizer import WordVocab


def _karpathy_fixture(root):
    imgs = []
    sid = 0
    for i, split in enumerate(["train", "train", "restval", "val", "test"]):
        sub = "val2014" if split in ("restval", "val", "test") else "train2014"
        fname = f"COCO_{sub}_{i:012d}.jpg"
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (32, 32, 3),
                                             dtype=np.uint8)
        ).save(os.path.join(root, sub, fname))
        sents = [{"raw": f"a cat number {i} sits", "sentid": sid},
                 {"raw": f"cat {i} on a mat", "sentid": sid + 1}]
        sid += 2
        imgs.append({"filepath": sub, "filename": fname, "cocoid": 1000 + i,
                     "split": split, "sentences": sents})
    path = os.path.join(root, "dataset_coco.json")
    with open(path, "w") as f:
        json.dump({"images": imgs}, f)
    return path


def test_convert_and_load(tmp_path):
    root = str(tmp_path)
    kj = _karpathy_fixture(root)
    out = convert(kj, os.path.join(root, "annotations"))
    # restval folded into train: 2 train + 1 restval
    assert out["counts"] == {"train": 3, "val": 1, "test": 1}
    with open(out["paths"]["train"]) as f:
        train = json.load(f)
    assert len(train["images"]) == 3
    assert len(train["annotations"]) == 6  # 2 captions per image
    assert all("/" in im["file_name"] for im in train["images"])

    vocab = WordVocab.build([a["caption"] for a in train["annotations"]],
                            threshold=1)
    ds = COCOCaptionDataset(root, "annotations/captions_karpathy_train.json",
                            "", vocab, image_size=32, max_length=10,
                            is_training=True)
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["caption_tokens"].shape == (10,)

    # --no_restval drops the restval image
    out2 = convert(kj, os.path.join(root, "ann2"), restval_to_train=False)
    assert out2["counts"] == {"train": 2, "val": 1, "test": 1}
