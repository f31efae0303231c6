"""Early-exit beam decode: measure the dead-tail saving at flagship size.

The beam loop is a lax.while_loop whose condition is `t < L and not all
batches stopped` (inference/decoding.py); HF's generation loop exits the
same way (reference decode path: src/models/decoders.py:645-654). With
random weights EOS never fires and the loop runs all L-1 steps — the
bench.py headline is unchanged. At *trained* weights captions finish
short of max_length; this script emulates that by adding a constant bias
to the EOS logit so beams finish after a few steps, then compares
early_exit=True vs False with bench.py's chained steady-state timing.

Usage: python scripts/bench_early_exit.py [eos_bias] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import _backend_responsive, build_flagship

    import jax
    import jax.numpy as jnp

    if not _backend_responsive():
        print("backend unresponsive; CPU run", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    eos_bias = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else (20 if on_tpu else 2)

    c, model, batch = build_flagship(on_tpu)
    from image_captioning_ml_project_tpu.inference.decoding import beam_search
    from image_captioning_ml_project_tpu.utils.amp import cast_float_params

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    caps = jnp.zeros((batch, 8), dtype=jnp.int32)
    variables = cast_float_params(model.init(rng, images, caps))
    L, mc = c.inference.max_length, c.model

    def make_caption(early_exit):
        @jax.jit
        def caption_batch(variables, images):
            cache = model.apply(variables, images, L, method=model.init_cache)

            def step_fn(s, toks):
                logits, s = model.apply(variables, s, toks, method=model.step)
                # emulate trained weights: EOS becomes likely early, so the
                # HF stop heuristic freezes every batch mid-sequence
                logits = logits.at[:, mc.eos_token_id].add(eos_bias)
                return logits, s

            return beam_search(step_fn, cache, images.shape[0],
                               c.inference.beam_size, mc.bos_token_id,
                               mc.eos_token_id, mc.pad_token_id, L,
                               length_penalty=c.inference.length_penalty,
                               min_length=c.inference.min_length,
                               early_exit=early_exit).tokens

        return caption_batch

    results = {}
    toks_by_mode = {}
    for early_exit in (False, True):
        fn = make_caption(early_exit)
        toks = fn(variables, images)
        np.asarray(toks)
        imgs = images + (toks[:1, :1].astype(jnp.float32) * 0
                         ).reshape(1, 1, 1, 1)
        np.asarray(fn(variables, imgs))
        t0 = time.perf_counter()
        for _ in range(iters):
            toks = fn(variables, imgs)
            imgs = images + (toks[:1, :1].astype(jnp.float32) * 0
                             ).reshape(1, 1, 1, 1)
        host = np.asarray(toks)
        dt = time.perf_counter() - t0
        results[early_exit] = batch * iters / dt
        toks_by_mode[early_exit] = host

    assert (toks_by_mode[True] == toks_by_mode[False]).all(), \
        "early-exit tokens diverged from the full-length path"
    lens = (toks_by_mode[True] != mc.pad_token_id).sum(axis=1)
    print(json.dumps({
        "metric": f"beam5_early_exit_img_per_sec[{backend}]",
        "eos_bias": eos_bias,
        "mean_caption_len": round(float(lens.mean()), 1),
        "max_length": L,
        "full_length": round(results[False], 2),
        "early_exit": round(results[True], 2),
        "speedup": round(results[True] / results[False], 3),
        "tokens_identical": True,
    }))


if __name__ == "__main__":
    main()
