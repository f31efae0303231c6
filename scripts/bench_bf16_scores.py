"""bf16 beam-scores experiment (VERDICT r2 task 9 / builder roadmap #3).

Architecture note first: on this framework the classic "bf16 log-probs"
win does not exist to harvest — the fused candidate path never
materializes a vocab-sized f32 array (it reads the model's bf16 logits
directly; ops/topk.fused_beam_top_k), so the only remaining f32 score
arithmetic at vocab scale is *inside the decode kernel's score products*.
This script measures exactly that lever: kernel ``precise=False`` (bf16
products, f32 accumulation — ~2x less VPU traffic in the score passes)
vs the default exact-f32-product path, on the flagship beam-5 decode:

* steady-state img/s for both modes (chained, param-forced timing);
* token + score divergence between the two modes on the same batch.

Keep/revert decision criteria: promoted only if it is faster AND
token-identical (the headline claims HF token parity).

Usage: python scripts/bench_bf16_scores.py
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
    from image_captioning_ml_project_tpu.inference.decoding import beam_search

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, model, batch = build_flagship(on_tpu)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    variables = model.init(rng, images, jnp.zeros((batch, 8), jnp.int32))
    L = c.inference.max_length
    mc = c.model

    def make_prog():
        # separate jit wrapper per mode: the precise knob is read from the
        # environment at trace time
        @jax.jit
        def prog(variables, images):
            cache = model.apply(variables, images, L, method=model.init_cache)

            def step_fn(s, toks):
                return model.apply(variables, s, toks, method=model.step)

            res = beam_search(step_fn, cache, images.shape[0],
                              c.inference.beam_size, mc.bos_token_id,
                              mc.eos_token_id, mc.pad_token_id, L,
                              length_penalty=c.inference.length_penalty,
                              min_length=c.inference.min_length,
                              return_all=True)
            return res.tokens, res.scores

        return prog

    results = {}
    tokens_by_mode = {}
    iters = 20 if on_tpu else 2
    for mode, env in (("precise_f32", "1"), ("bf16_products", "0")):
        os.environ["ICT_DECODE_PRECISE"] = env
        prog = make_prog()
        toks, scores = prog(variables, images)
        np.asarray(toks)
        imgs = images + (toks[:1, :1, :1].astype(jnp.float32)
                         * 0).reshape(1, 1, 1, 1)
        np.asarray(prog(variables, imgs)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            toks, scores = prog(variables, imgs)
            imgs = images + (toks[:1, :1, :1].astype(jnp.float32)
                             * 0).reshape(1, 1, 1, 1)
        np.asarray(toks)
        dt = time.perf_counter() - t0
        results[mode] = round(batch * iters / dt, 1)
        tokens_by_mode[mode] = (np.asarray(toks), np.asarray(scores))

    t_a, s_a = tokens_by_mode["precise_f32"]
    t_b, s_b = tokens_by_mode["bf16_products"]
    top1_equal = bool((t_a[:, 0] == t_b[:, 0]).all())
    allk_equal = bool((t_a == t_b).all())
    print(json.dumps({
        "metric": "bf16_kernel_scores_experiment",
        "img_per_sec": results,
        "top1_token_identical": top1_equal,
        "allk_token_identical": allk_equal,
        "max_abs_score_diff": float(np.abs(s_a - s_b).max()),
    }))


if __name__ == "__main__":
    main()
