"""Materialize the Karpathy split as COCO-format annotation files.

The reference reports all its numbers on the MS-COCO *Karpathy split*
(reference: README.md:7,148) but ships no tooling for it — its dataset
class reads standard ``captions_{train,val}2014.json`` files
(reference: src/data/dataset.py). This script bridges the gap: it takes
Karpathy's ``dataset_coco.json`` (the standard release from "Deep
Visual-Semantic Alignments", with per-image ``split`` fields
train/val/test/restval) and writes one COCO-caption-format JSON per split,
directly consumable by :class:`data.coco.COCOCaptionDataset`:

    python scripts/make_karpathy_split.py \
        --karpathy_json dataset_coco.json \
        --out_dir /data/coco/annotations [--restval_to_train]

Outputs ``captions_karpathy_{train,val,test}.json`` with the
``{"images": [{id, file_name}], "annotations": [{image_id, caption, id}]}``
schema. ``file_name`` keeps the Karpathy ``filepath`` prefix
(``train2014/...`` / ``val2014/...``) so one image_dir="" root serves all
splits. ``--restval_to_train`` folds the 30k ``restval`` images into train
(the convention behind most published Karpathy-split numbers, including
the reference's table).
"""

import argparse
import json
import os


def convert(karpathy_json: str, out_dir: str,
            restval_to_train: bool = True,
            prefix: str = "captions_karpathy_") -> dict:
    with open(karpathy_json) as f:
        data = json.load(f)

    splits = {"train": {"images": [], "annotations": []},
              "val": {"images": [], "annotations": []},
              "test": {"images": [], "annotations": []}}
    counts = {}
    for img in data["images"]:
        split = img["split"]
        if split == "restval":
            if not restval_to_train:
                continue
            split = "train"
        counts[split] = counts.get(split, 0) + 1
        file_name = os.path.join(img.get("filepath", ""), img["filename"])
        image_id = img.get("cocoid", img.get("imgid"))
        splits[split]["images"].append(
            {"id": image_id, "file_name": file_name})
        for sent in img["sentences"]:
            splits[split]["annotations"].append({
                "image_id": image_id,
                "id": sent.get("sentid", len(splits[split]["annotations"])),
                "caption": sent["raw"],
            })

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for split, payload in splits.items():
        path = os.path.join(out_dir, f"{prefix}{split}.json")
        with open(path, "w") as f:
            json.dump(payload, f)
        paths[split] = path
    return {"paths": paths, "counts": counts}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--karpathy_json", required=True,
                   help="Karpathy dataset_coco.json")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--restval_to_train", action="store_true", default=True)
    p.add_argument("--no_restval", dest="restval_to_train",
                   action="store_false",
                   help="drop restval images instead of folding into train")
    args = p.parse_args(argv)
    out = convert(args.karpathy_json, args.out_dir,
                  restval_to_train=args.restval_to_train)
    for split, path in out["paths"].items():
        print(f"{split}: {out['counts'].get(split, 0)} images -> {path}")


if __name__ == "__main__":
    main()
