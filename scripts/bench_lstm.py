"""Inference benchmark for the legacy-family config: ResNet + LSTM + soft
attention (BASELINE.json config #1; the reference's legacy stack measured
18.5 images/sec on GPU, docs/architecture_evolution.md:96).

Greedy decode (the legacy stack's strategy), batch 64, max_length 20.
Measured the steady-state way bench.py does (chained iterations; see
CLAUDE.md measurement gotchas).

Usage: python scripts/bench_lstm.py [batch]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)
    from image_captioning_ml_project_tpu.inference.decoding import (
        greedy_decode)
    from image_captioning_ml_project_tpu.models.captioning_model import (
        ImageCaptioningModel)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType.RESNET
    c.model.decoder.decoder_type = DecoderType.LSTM
    c.model.attention.attention_type = AttentionType.SOFT
    if on_tpu:
        # ResNet-101 stage depths (legacy encoder, models/encoder.py:8) +
        # 512-wide LSTM, 10k word vocab (legacy-scale)
        c.model.encoder.resnet_depths = (3, 4, 23, 3)
        c.model.encoder.feature_dim = 512
        c.model.decoder.hidden_dim = 512
        c.model.attention.hidden_dim = 512
        c.model.projection_dim = 512
        c.model.vocab_size = 10_000
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    else:
        c.model.encoder.resnet_depths = (1,)
        c.model.encoder.resnet_hidden_sizes = (32,)
        c.model.encoder.resnet_embedding_size = 8
        c.model.encoder.feature_dim = 32
        c.model.decoder.hidden_dim = 32
        c.model.attention.hidden_dim = 32
        c.model.projection_dim = 32
        c.model.vocab_size = 500
        batch = 4
    c.inference.max_length = 20
    model = ImageCaptioningModel(c, dtype=jnp.bfloat16)

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

        return greedy_decode(step_fn, cache, images.shape[0],
                             mc.bos_token_id, L,
                             eos_token_id=mc.eos_token_id,
                             pad_token_id=mc.pad_token_id)

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
        "metric": f"greedy_captions_per_sec_per_chip_resnet_lstm[{backend}]",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 18.5, 3),  # reference legacy, GPU
    }))


if __name__ == "__main__":
    main()
