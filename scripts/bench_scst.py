"""Fused-SCST step benchmark (VERDICT r2 task 5): flagship CLIP+GPT-2+AoA
`_scst_fused_step` throughput on the real chip.

The step is the framework's most expensive single program: a sampled
rollout + a greedy rollout (both through the fused decode kernel), two
on-device per-sample CIDEr rewards, a teacher-forced forward over the
sampled tokens, the REINFORCE backward, and the AdamW update — one XLA
program, zero host round-trips. The reference's SCST ran a per-token
Python sampling loop plus host pycocoevalcap scoring per batch
(reference: src/train/trainer.py:413-484).

Timing: param-leaf fetch + linearity check (axon tunnel scalar fetches do
not force dispatch chains — see docs/performance.md).

Usage: python scripts/bench_scst.py [batch_size]
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
    from image_captioning_ml_project_tpu.evaluate.cider_device import (
        build_df_table, encode_references)
    from image_captioning_ml_project_tpu.train.trainer import (
        CaptioningTrainer)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    c, _, _ = build_flagship(on_tpu)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (32 if on_tpu else 4)
    c.training.batch_size = batch
    c.training.use_amp = True

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
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(
        0, 255, (batch, c.image_size, c.image_size, 3)).astype(np.uint8))

    # realistic reference set: 5 refs/image, ~12 tokens each
    ref_len = c.model.decoder.max_length
    refs = [[list(rng.randint(10, 1000, rng.randint(8, 16)))
             for _ in range(5)] for _ in range(batch)]
    df = build_df_table(refs)
    ref_tokens, ref_valid = encode_references(refs, max_refs=5,
                                              max_len=ref_len)
    ref_tokens = jnp.asarray(ref_tokens)
    ref_valid = jnp.asarray(ref_valid)
    L = c.inference.max_length
    key = jax.random.PRNGKey(0)

    def force(state):
        return np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    trainer.state, m = trainer._scst_fused_step(
        trainer.state, images, ref_tokens, ref_valid, df, key, L)
    force(trainer.state)

    iters = int(os.environ.get("BT_ITERS", "20")) if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.state, m = trainer._scst_fused_step(
            trainer.state, images, ref_tokens, ref_valid, df, key, L)
    force(trainer.state)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        "metric": f"scst_fused_step_images_per_sec_clip_gpt2[{backend}]",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "batch": batch,
        "ms_per_step": round(1000 * dt / iters, 1),
    }))


if __name__ == "__main__":
    main()
