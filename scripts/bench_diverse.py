"""Diverse-group / CLIP-rerank candidate-generation benchmark (VERDICT r2
task 8's measurement): flagship CLIP+GPT-2+AoA beam decode with
``num_beam_groups > 1`` + ``return_all=True`` — the exact program the eval
CLI runs when ``use_clip_reranking`` is on (main.py evaluate(): K =
max(beam_size, num_candidates) candidates per image, grouped Hamming
diversity per reference src/config.py:104-109).

Round 2 left this path rematerializing a [B, K, V] f32 log-softmax
(~190 MB/step at 50k vocab); round 3 routed it through per-group row-bias
fused top-k with the diversity penalty folded into the fused logits
expression. This script records the measured rate next to the single-group
headline (target: within ~2x).

Timing: chained token-derived perturbation + final host fetch
(docs/performance.md methodology — axon tunnel scalar fetches do not force
dispatch chains).

Usage: python scripts/bench_diverse.py [num_beam_groups]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_flagship
    from image_captioning_ml_project_tpu.inference.decoding import (
        beam_search)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, model, batch = build_flagship(on_tpu)
    groups = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    K = max(c.inference.beam_size, c.inference.num_candidates)
    assert K % groups == 0, (K, groups)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    caps = jnp.zeros((batch, 8), dtype=jnp.int32)
    variables = model.init(rng, images, caps)
    # serving weights live in bf16: pre-cast once (bit-identical; see
    # utils/amp.py)
    from image_captioning_ml_project_tpu.utils.amp import cast_float_params

    variables = cast_float_params(variables)

    L = c.inference.max_length
    mc = c.model

    @jax.jit
    def candidates_batch(variables, images):
        cache = model.apply(variables, images, L, method=model.init_cache)

        def step_fn(s, toks):
            return model.apply(variables, s, toks, method=model.step)

        res = beam_search(step_fn, cache, images.shape[0], K,
                          mc.bos_token_id, mc.eos_token_id, mc.pad_token_id,
                          L, length_penalty=c.inference.length_penalty,
                          min_length=c.inference.min_length,
                          num_beam_groups=groups,
                          diversity_penalty=c.inference.diversity_penalty,
                          return_all=True)
        return res.tokens  # [B, K, L] candidates for the reranker

    toks = candidates_batch(variables, images)
    np.asarray(toks)
    imgs = images + (toks[:1, :1, :1].astype(jnp.float32) * 0
                     ).reshape(1, 1, 1, 1)
    np.asarray(candidates_batch(variables, imgs))

    iters = int(os.environ.get("BT_ITERS", "20")) if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        toks = candidates_batch(variables, imgs)
        imgs = images + (toks[:1, :1, :1].astype(jnp.float32) * 0
                         ).reshape(1, 1, 1, 1)
    np.asarray(toks)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        "metric": (f"diverse_beam{K}_g{groups}_candidates_per_sec"
                   f"_clip_gpt2[{backend}]"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "batch": batch,
        "num_beam_groups": groups,
        "ms_per_batch": round(1000 * dt / iters, 1),
    }))


if __name__ == "__main__":
    main()
