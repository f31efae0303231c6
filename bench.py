"""Headline benchmark: beam-5 caption throughput on the flagship
CLIP + GPT-2 + AoA configuration (BASELINE.json north star).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the reference's published modern-stack
inference speed of 42.3 images/sec on GPU
(/root/reference/docs/architecture_evolution.md:96) — and the reference's
GPT-2 decode path had no KV cache at all (its Transformer generate re-ran
the full prefix per token, src/models/decoders.py:461-491).

Runs on whatever accelerator jax exposes (real TPU chip under axon; falls
back to CPU with smaller shapes so the script always works).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_flagship(on_tpu: bool):
    sys.path.insert(0, ".")
    from image_captioning_ml_project_tpu.config import (
        AttentionType, DecoderType, EncoderType, get_default_config)
    from image_captioning_ml_project_tpu.models.captioning_model import (
        ImageCaptioningModel)

    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType.CLIP
    c.model.decoder.decoder_type = DecoderType.GPT2
    c.model.attention.attention_type = AttentionType.AOA
    if on_tpu:
        # CLIP ViT-B/32 vision tower + GPT-2 (12L/12H/768) at real size
        c.model.encoder.hidden_size = 768
        c.model.encoder.num_layers = 12
        c.model.encoder.num_heads = 12
        c.model.encoder.patch_size = 32
        c.model.decoder.hidden_dim = 768
        c.model.decoder.num_layers = 12
        c.model.decoder.num_heads = 12
        c.model.vocab_size = 50257
        batch = int(os.environ.get("BENCH_BATCH", "64"))
    else:  # CPU smoke path
        c.model.encoder.hidden_size = 64
        c.model.encoder.num_layers = 2
        c.model.encoder.num_heads = 2
        c.model.encoder.patch_size = 32
        c.model.encoder.feature_dim = 64
        c.model.decoder.hidden_dim = 64
        c.model.decoder.num_layers = 2
        c.model.decoder.num_heads = 2
        c.model.projection_dim = 64
        c.model.attention.hidden_dim = 64
        c.model.vocab_size = 1000
        batch = 8
    c.model.decoder.prefix_length = 10
    # BENCH_DECODE_KERNEL=xla records the multi-chip fallback figure (the
    # portable path used when neither one chip nor a decode_mesh context is
    # active); default "auto" resolves to the fused Pallas kernel on TPU.
    c.model.decoder.decode_kernel = os.environ.get(
        "BENCH_DECODE_KERNEL", "auto")
    c.inference.beam_size = 5
    c.inference.max_length = 20
    c.inference.length_penalty = 0.8
    model = ImageCaptioningModel(c, dtype=jnp.bfloat16)
    return c, model, batch


def _backend_responsive(timeout_s: int = 300) -> bool:
    """Probe backend init in a SUBPROCESS with a timeout: the axon tunnel
    can wedge (PJRT client creation hangs indefinitely at ~0% CPU). A hung
    probe is killed and we fall back to an honestly-labeled CPU run
    instead of hanging the driver forever. In-process probing can't be
    cancelled, hence the subprocess."""
    import subprocess

    timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", timeout_s))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _backend_responsive_with_retries() -> bool:
    """The axon tunnel's wedges are often transient (minutes); a one-shot
    probe at the wrong moment would record a CPU number for the round.
    Retry the probe (BENCH_PROBE_RETRIES, default 3; BENCH_PROBE_WAIT_S
    between attempts, default 120) before giving up."""
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", 3))
    wait_s = float(os.environ.get("BENCH_PROBE_WAIT_S", 120))
    for attempt in range(retries):
        if _backend_responsive():
            return True
        if attempt < retries - 1:
            print(f"bench.py: backend probe {attempt + 1}/{retries} failed; "
                  f"retrying in {wait_s:.0f}s", file=sys.stderr)
            time.sleep(wait_s)
    return False


def main():
    if not _backend_responsive_with_retries():
        print("bench.py: accelerator backend unresponsive; "
              "falling back to CPU smoke run", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, model, batch = build_flagship(on_tpu)

    from image_captioning_ml_project_tpu.inference.decoding import beam_search

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    caps = jnp.zeros((batch, 8), dtype=jnp.int32)
    variables = model.init(rng, images, caps)
    # serving weights live in bf16: pre-cast once (bit-identical — modules
    # cast f32 params to bf16 at use anyway; this removes the per-batch
    # convert fusions from the jitted program)
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

    # compile + warmup (np.asarray forces a host fetch: under the axon
    # tunnel block_until_ready does not actually block, and fetching only
    # the last of several *independent* dispatches may not force the
    # earlier ones — so iterations are chained through a zero-valued
    # token-derived perturbation and timed at steady state)
    toks = caption_batch(variables, images)
    np.asarray(toks)
    # warm the chained form too (the first call whose input depends on a
    # prior output triggers a one-off ~2 s re-specialization on this stack)
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

    images_per_sec = batch * iters / dt
    baseline = 42.3  # reference docs/architecture_evolution.md:96
    print(json.dumps({
        "metric": f"beam5_captions_per_sec_per_chip_clip_gpt2[{backend}]",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
