"""Host input-pipeline throughput: can the dataloader feed the chip?

The corrected train-step rates (1054-1452 img/s/chip, bench_train.py) make
the host pipeline the next potential bottleneck: PIL decode + resize +
tokenize caps out at ~115 img/s *per host core*. This measures images/sec
of the full train-batch assembly path (COCOCaptionDataset ->
iterate_batches -> prefetch) across worker counts (fork-based process
pool; threads measured useless — PIL holds the GIL on this stack).

NOTE: this dev box exposes a single CPU core, so worker counts cannot
show scaling here; on a real v5e host (100+ cores) the pool is the
difference between starving the chip (~115 img/s) and feeding it
(num_workers ≈ ceil(device_rate / 115)).

Usage: python scripts/bench_pipeline.py [image_size] [batch_size]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 224
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from image_captioning_ml_project_tpu.data.coco import (
        COCOCaptionDataset, iterate_batches)
    from image_captioning_ml_project_tpu.data.pipeline import prefetch
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab

    root = tempfile.mkdtemp(prefix="pipe_bench_")
    # enough images that a few batches don't fit in page cache warm-start
    # JPEG corpus — what real COCO ships (and what both the PIL draft path
    # and the native C++ loader are specialized for)
    make_synthetic_coco(os.path.join(root, "data"), num_images=256,
                        captions_per_image=2, image_size=480,
                        image_format="jpg", size_jitter=160)

    vocab = WordVocab.build(
        os.path.join(root, "data", "annotations", "captions_train2014.json"),
        threshold=1)
    def make_ds(native):
        return COCOCaptionDataset(
            root_dir=os.path.join(root, "data"),
            annotation_file="annotations/captions_train2014.json",
            image_dir="train2014",
            tokenizer=vocab, image_size=image_size, max_length=50,
            is_training=True, native_loader=native)

    from image_captioning_ml_project_tpu import native as native_mod

    best = None
    variants = [(w, False) for w in (0, 4, 8, 16)]
    if native_mod.available():
        variants += [(0, True)]
    for workers, native in variants:
        ds = make_ds(native)
        # warm the page cache once
        it = iterate_batches(ds, batch_size, shuffle=True, seed=1,
                             num_workers=workers)
        next(it)
        n_img = 0
        t0 = time.perf_counter()
        for batch in prefetch(iterate_batches(
                ds, batch_size, shuffle=True, seed=2,
                num_workers=workers)):
            n_img += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        ips = n_img / dt
        tag = " native" if native else ""
        print(f"num_workers={workers:<3}{tag:>7} {ips:8.1f} images/sec "
              f"({n_img} imgs in {dt:.2f}s)", flush=True)
        if best is None or ips > best[1]:
            best = (workers, ips)

    print(json.dumps({
        "metric": "input_pipeline_images_per_sec",
        "value": round(best[1], 1),
        "unit": "images/sec",
        "best_num_workers": best[0],
    }))


if __name__ == "__main__":
    main()
