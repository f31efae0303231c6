"""Inference benchmark for the mid-family config: ViT + Transformer +
multi-head attention (BASELINE.json config #3), beam 5 — with the decode
step through the XLA path vs the fused Pallas kernel (prefix-free mode).

Reference point: the reference's modern stack measured 42.3 images/sec on
GPU (docs/architecture_evolution.md:96), and its Transformer generate
re-encoded the whole prefix per token (src/models/decoders.py:461-491).

Usage: python scripts/bench_transformer.py [batch]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build(kernel, on_tpu, batch_arg):
    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)
    from image_captioning_ml_project_tpu.models.captioning_model import (
        ImageCaptioningModel)

    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType.VIT
    c.model.decoder.decoder_type = DecoderType.TRANSFORMER
    c.model.attention.attention_type = AttentionType.MULTI_HEAD
    c.model.decoder.decode_kernel = kernel
    if on_tpu:
        # ViT-B/16 + 6-layer 768-wide Transformer decoder, 30k wordpiece-ish
        c.model.decoder.hidden_dim = 768
        c.model.decoder.num_layers = 6
        c.model.decoder.num_heads = 12
        c.model.vocab_size = 30_000
        batch = batch_arg or 64
    else:
        c.model.encoder.hidden_size = 32
        c.model.encoder.num_layers = 2
        c.model.encoder.num_heads = 2
        c.model.encoder.feature_dim = 32
        c.model.decoder.hidden_dim = 32
        c.model.decoder.num_layers = 2
        c.model.decoder.num_heads = 2
        c.model.attention.hidden_dim = 32
        c.model.projection_dim = 32
        c.model.vocab_size = 500
        batch = 4
    c.model.decoder.max_length = 24
    c.inference.max_length = 20
    c.inference.beam_size = 5
    return c, ImageCaptioningModel(c, dtype=jnp.bfloat16), batch


def bench(kernel, batch_arg):
    from image_captioning_ml_project_tpu.inference.decoding import beam_search

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, model, batch = build(kernel, on_tpu, batch_arg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    variables = model.init(rng, images, jnp.zeros((batch, 8), jnp.int32))
    # serving weights live in bf16: pre-cast once (bit-identical; see
    # utils/amp.py)
    from image_captioning_ml_project_tpu.utils.amp import cast_float_params

    variables = cast_float_params(variables)
    L = c.inference.max_length
    mc = c.model

    @jax.jit
    def caption_batch(variables, images):
        cache = model.apply(variables, images, L, method=model.init_cache)

        def step_fn(s, toks):
            return model.apply(variables, s, toks, method=model.step)

        return beam_search(step_fn, cache, images.shape[0],
                           c.inference.beam_size, mc.bos_token_id,
                           mc.eos_token_id, mc.pad_token_id, L,
                           length_penalty=c.inference.length_penalty,
                           min_length=c.inference.min_length).tokens

    toks = caption_batch(variables, images)
    np.asarray(toks)
    imgs = images + (toks[:1, :1].astype(jnp.float32) * 0).reshape(1, 1, 1, 1)
    np.asarray(caption_batch(variables, imgs))

    iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        toks = caption_batch(variables, imgs)
        imgs = images + (toks[:1, :1].astype(jnp.float32) * 0
                         ).reshape(1, 1, 1, 1)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    print(json.dumps({
        "metric": (f"beam5_captions_per_sec_per_chip_vit_transformer"
                   f"[{backend},{kernel}]"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 42.3, 3),
    }), flush=True)


def main():
    batch_arg = int(sys.argv[1]) if len(sys.argv) > 1 else None
    bench("xla", batch_arg)
    bench("auto", batch_arg)


if __name__ == "__main__":
    main()
