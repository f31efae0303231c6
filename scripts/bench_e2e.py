"""End-to-end eval throughput: disk JPEGs -> beam-5 captions (VERDICT r2
task 3; north star: BASELINE.json "device-resident preprocessing pipeline",
reference host path: /root/reference/data_loader.py:85-121).

Measures the full eval pipeline at flagship size on the TPU — JPEG decode
on the host (worker pool + prefetch overlap), host->device transfer, and
the jitted resize/normalize + CLIP + GPT-2 beam-5 decode — in two modes:

* host_resize:  the parity path (PIL decode + resize + center-crop on the
  host, uint8 224x224 to the device);
* device_resize: the TPU-native path (draft-scaled libjpeg decode onto a
  fixed 448 canvas; antialiased resize + normalize run on device as two
  MXU matmuls, ops/resize.py).

Each mode also runs with the native C++ loader (native/jpeg_loader.cpp:
in-process libjpeg decode + threaded batch transform) when it is
available — the "native" rows. ICT_NATIVE_DRAFT=1 additionally enables
the DCT-scaled native eval decode.

Every batch's tokens are fetched (np.asarray) exactly as the real eval CLI
does, so dispatch chains cannot hide host time.

Usage: python scripts/bench_e2e.py [num_images] [batch] [workers ...]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_model():
    import jax.numpy as jnp

    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)
    from image_captioning_ml_project_tpu.models.captioning_model import (
        ImageCaptioningModel)

    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType.CLIP
    c.model.decoder.decoder_type = DecoderType.GPT2
    c.model.attention.attention_type = AttentionType.AOA
    c.model.encoder.hidden_size = 768
    c.model.encoder.num_layers = 12
    c.model.encoder.num_heads = 12
    c.model.encoder.patch_size = 32
    c.model.decoder.hidden_dim = 768
    c.model.decoder.num_layers = 12
    c.model.decoder.num_heads = 12
    c.model.vocab_size = 50257
    c.model.decoder.prefix_length = 10
    c.inference.beam_size = 5
    c.inference.max_length = 20
    c.inference.length_penalty = 0.8
    return c, ImageCaptioningModel(c, dtype=jnp.bfloat16)


def main():
    num_images = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    workers_list = [int(w) for w in sys.argv[3:]] or [0, 4]

    import jax
    import jax.numpy as jnp

    from image_captioning_ml_project_tpu.data.coco import (
        COCOCaptionDataset, iterate_batches)
    from image_captioning_ml_project_tpu.data.pipeline import prefetch
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.inference.decoding import beam_search
    from image_captioning_ml_project_tpu.ops.resize import resize_normalize
    from image_captioning_ml_project_tpu.data.coco import normalize_images

    root = tempfile.mkdtemp(prefix="e2e_bench_")
    make_synthetic_coco(root, num_images=num_images, captions_per_image=1,
                        image_size=480, size_jitter=160, splits=["val"],
                        image_format="jpg")
    vocab = WordVocab.build(
        os.path.join(root, "annotations", "captions_val2014.json"),
        threshold=1)

    c, model = build_model()
    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init(rng, init_img, jnp.zeros((2, 8), jnp.int32))
    # serving weights live in bf16: pre-cast once (bit-identical; see
    # utils/amp.py)
    from image_captioning_ml_project_tpu.utils.amp import cast_float_params

    variables = cast_float_params(variables)
    L = c.inference.max_length
    mc = c.model

    @jax.jit
    def caption_host(variables, images_u8):
        x = normalize_images(images_u8)
        cache = model.apply(variables, x, L, method=model.init_cache)

        def step_fn(s, toks):
            return model.apply(variables, s, toks, method=model.step)

        return beam_search(step_fn, cache, images_u8.shape[0],
                           c.inference.beam_size, mc.bos_token_id,
                           mc.eos_token_id, mc.pad_token_id, L,
                           length_penalty=c.inference.length_penalty).tokens

    @jax.jit
    def caption_device_resize(variables, canvas_u8, sizes):
        x = resize_normalize(canvas_u8, sizes, 224)
        cache = model.apply(variables, x, L, method=model.init_cache)

        def step_fn(s, toks):
            return model.apply(variables, s, toks, method=model.step)

        return beam_search(step_fn, cache, canvas_u8.shape[0],
                           c.inference.beam_size, mc.bos_token_id,
                           mc.eos_token_id, mc.pad_token_id, L,
                           length_penalty=c.inference.length_penalty).tokens

    def run(device_resize: bool, num_workers: int, native: bool = False):
        ds = COCOCaptionDataset(
            root_dir=root, annotation_file="annotations/captions_val2014.json",
            image_dir="val2014", tokenizer=vocab, image_size=224,
            max_length=20, is_training=False, device_resize=device_resize,
            native_loader=native,
            native_draft=bool(int(os.environ.get("ICT_NATIVE_DRAFT", "0"))))

        def decode_batch(b):
            if device_resize:
                return caption_device_resize(
                    variables, jnp.asarray(b["image"]),
                    jnp.asarray(b["image_size"]))
            return caption_host(variables, jnp.asarray(b["image"]))

        # compile + one warmup epoch fragment
        wb = next(iterate_batches(ds, batch, drop_last=False, pad_last=True,
                                  num_workers=0))
        np.asarray(decode_batch(wb))

        n, t0 = 0, time.perf_counter()
        it = iterate_batches(ds, batch, drop_last=False, pad_last=True,
                             num_workers=num_workers)
        last = None
        for b in prefetch(it):
            last = decode_batch(b)
            n += int(np.asarray(b.get("batch_valid",
                                      np.ones(batch, bool))).sum())
            np.asarray(last)  # fetch per batch, like the eval CLI
        dt = time.perf_counter() - t0
        return n / dt

    from image_captioning_ml_project_tpu import native as native_mod
    native_modes = (False, True) if native_mod.available() else (False,)
    results = {}
    for device_resize in (False, True):
        for native in native_modes:
            mode = ("device_resize" if device_resize else "host_resize") + (
                "_native" if native else "")
            for w in workers_list:
                if native and w:
                    continue  # native scales via threads, not fork workers
                ips = run(device_resize, w, native)
                results[f"{mode}_w{w}"] = round(ips, 1)
                print(f"{mode:>21} workers={w:<3} {ips:8.1f} images/sec "
                      f"end-to-end", flush=True)

    print(json.dumps({
        "metric": "e2e_disk_jpeg_to_captions_images_per_sec",
        "unit": "images/sec",
        "batch": batch,
        "results": results,
    }))


if __name__ == "__main__":
    main()
