"""Q-Former and BUTD family throughput (VERDICT r3 task 7's measured half).

Adds the two previously-unmeasured model families to the perf table
(docs/performance.md "All three model families"):

* **Q-Former**: ViT-B/16 + Q-Former (32 queries, 2 layers) + 6L/768
  Transformer decoder — the BLIP-2-style path (reference:
  src/models/captioning_model.py:153-245). Its 32-query memory is
  8-aligned, so the decode must stay on the fused cross-attention
  kernel (pinned by tests/test_family_kernels.py).
* **BUTD**: object-region encoder (36 detector regions, 2048-d features,
  reference: src/models/encoders.py:233-296) + the same decoder, with
  realistic per-image region counts (20..36) masked under the kernels.

Per family: beam-5 decode img/s (chained steady-state, the bench.py
pattern) and the CE train-step img/s (the bench_train.py pattern).

Usage: python scripts/bench_families.py [qformer|butd] [decode|train]
       (no args = all four measurements; CPU backend runs a tiny smoke)
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md gotcha): a
    # "CPU smoke" would otherwise silently compile full-size towers on
    # the real chip — force it before any backend touch
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build_config(family: str, on_tpu: bool):
    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)

    c = get_default_config()
    c.model.decoder.decoder_type = DecoderType.TRANSFORMER
    c.model.attention.attention_type = AttentionType.MULTI_HEAD
    if on_tpu:
        c.model.decoder.hidden_dim = 768
        c.model.decoder.num_layers = 6
        c.model.decoder.num_heads = 12
        c.model.vocab_size = 30_000
        dec_batch, train_batch = 64, 32
    else:
        c.model.encoder.hidden_size = 32
        c.model.encoder.num_layers = 1
        c.model.encoder.num_heads = 2
        c.model.encoder.feature_dim = 32
        c.model.decoder.hidden_dim = 128   # fused-kernel-eligible width
        c.model.decoder.num_layers = 2
        c.model.decoder.num_heads = 4
        c.model.attention.hidden_dim = 128
        c.model.vocab_size = 500
        dec_batch, train_batch = 4, 4
    if family == "qformer":
        c.model.encoder.encoder_type = EncoderType.VIT
        c.model.use_q_former = True
        c.model.projection_dim = c.model.decoder.hidden_dim
        c.model.q_former_num_queries = 32
        c.model.q_former_num_layers = 2
        c.model.q_former_num_heads = 8 if on_tpu else 4
    else:
        c.model.encoder.encoder_type = EncoderType.OBJECT_REGION
        c.model.encoder.max_objects = 36
        c.model.encoder.region_feature_dim = 2048 if on_tpu else 48
        c.model.encoder.feature_dim = c.model.decoder.hidden_dim
        c.model.projection_dim = c.model.decoder.hidden_dim
    c.model.decoder.max_length = 24
    c.inference.max_length = 20
    c.inference.beam_size = 5
    return c, dec_batch, train_batch


def make_inputs(family: str, c, batch: int, for_train: bool):
    rng = np.random.RandomState(0)
    if family == "qformer":
        if for_train:
            return jnp.asarray(rng.randint(
                0, 255, (batch, c.image_size, c.image_size, 3)
            ).astype(np.uint8))
        return jnp.asarray(
            rng.randn(batch, c.image_size, c.image_size, 3
                      ).astype(np.float32))
    n = c.model.encoder.max_objects
    counts = rng.randint(20, n + 1, size=batch)   # realistic region counts
    mask = np.arange(n)[None, :] < counts[:, None]
    return {
        "region_features": jnp.asarray(rng.randn(
            batch, n, c.model.encoder.region_feature_dim
        ).astype(np.float32)),
        "region_boxes": jnp.asarray(rng.rand(batch, n, 4).astype(np.float32)),
        "region_mask": jnp.asarray(mask),
    }


def bench_decode(family: str):
    from image_captioning_ml_project_tpu.inference.decoding import beam_search
    from image_captioning_ml_project_tpu.models.captioning_model import (
        ImageCaptioningModel)
    from image_captioning_ml_project_tpu.utils.amp import cast_float_params

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, batch, _ = build_config(family, on_tpu)
    model = ImageCaptioningModel(c, dtype=jnp.bfloat16)
    inputs = make_inputs(family, c, batch, for_train=False)
    caps = jnp.zeros((batch, 8), jnp.int32)
    variables = cast_float_params(
        model.init(jax.random.PRNGKey(0), inputs, caps))
    L, mc = c.inference.max_length, c.model

    @jax.jit
    def caption_batch(variables, inputs):
        cache = model.apply(variables, inputs, L, method=model.init_cache)

        def step_fn(s, toks):
            return model.apply(variables, s, toks, method=model.step)

        n = (inputs.shape[0] if not isinstance(inputs, dict)
             else inputs["region_mask"].shape[0])
        return beam_search(step_fn, cache, n, c.inference.beam_size,
                           mc.bos_token_id, mc.eos_token_id,
                           mc.pad_token_id, L,
                           length_penalty=c.inference.length_penalty,
                           min_length=c.inference.min_length).tokens

    def perturb(inputs, toks):
        d = (toks[:1, :1].astype(jnp.float32) * 0)
        if isinstance(inputs, dict):
            return dict(inputs, region_features=inputs["region_features"]
                        + d.reshape(1, 1, 1))
        return inputs + d.reshape(1, 1, 1, 1)

    toks = caption_batch(variables, inputs)
    np.asarray(toks)
    cur = perturb(inputs, toks)
    np.asarray(caption_batch(variables, cur))

    iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        toks = caption_batch(variables, cur)
        cur = perturb(inputs, toks)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    print(json.dumps({
        "metric": f"beam5_captions_per_sec_per_chip_{family}[{backend}]",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 42.3, 3),
    }), flush=True)


def bench_train(family: str):
    from image_captioning_ml_project_tpu.train.trainer import (
        CaptioningTrainer)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, _, batch = build_config(family, on_tpu)
    c.training.batch_size = batch
    c.training.use_amp = True
    c.model.decoder.max_length = 50 if on_tpu else 12

    class _Empty:
        examples: list = []

        def __len__(self):
            return 0

    class _Tok:
        vocab_size = c.model.vocab_size
        pad_token_id, bos_token_id, eos_token_id = 0, 1, 2

        def __len__(self):
            return self.vocab_size

        def decode(self, ids, skip_special_tokens=True):
            return ""

    trainer = CaptioningTrainer(c, _Empty(), _Empty(), _Tok())
    inputs = make_inputs(family, c, batch, for_train=True)
    rng = np.random.RandomState(1)
    caps = jnp.asarray(rng.randint(
        3, c.model.vocab_size, (batch, c.model.decoder.max_length)
    ).astype(np.int32))
    mask = caps != 0
    key = jax.random.PRNGKey(0)

    def force(state):
        return np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    trainer.state, _ = trainer._train_step(
        trainer.state, inputs, caps, mask, key)
    force(trainer.state)
    iters = 30 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.state, _ = trainer._train_step(
            trainer.state, inputs, caps, mask, key)
    force(trainer.state)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    print(json.dumps({
        "metric": f"train_step_images_per_sec_{family}[{backend}]",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 49.0, 3),
    }), flush=True)


def main():
    fams = [sys.argv[1]] if len(sys.argv) > 1 else ["qformer", "butd"]
    what = sys.argv[2] if len(sys.argv) > 2 else "all"
    for fam in fams:
        if what in ("decode", "all"):
            bench_decode(fam)
        if what in ("train", "all"):
            bench_train(fam)


if __name__ == "__main__":
    main()
