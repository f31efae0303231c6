"""TPU benchmark: fused Pallas attention variants vs their XLA paths.

VERDICT round-1 item 6: the attention-zoo Pallas kernels
(ops/pallas_attention.py) were numerics-tested but never measured on the
chip. This compares use_pallas True/False for the two kernel cores on the
shapes that matter:

* SoftAttention (additive/Bahdanau) — the legacy LSTM decode step shape
  (Q=1 per step, S=196 regions) and the teacher-forced shape (Q=50);
  the XLA path materializes the [B, Q, S, H] tanh broadcast.
* MultiHeadAttention (SDPA core, also the AoA/adaptive wrapped core) —
  teacher-forced cross-attention shape.

Each variant scans ITERS applications inside one jitted program (per-call
dispatch RTT over the axon tunnel is ~16-20 ms, so single calls measure
nothing).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from image_captioning_ml_project_tpu.config import AttentionConfig  # noqa: E402
from image_captioning_ml_project_tpu.models.attention import (  # noqa: E402
    MultiHeadAttention,
    SoftAttention,
)

ITERS = 50


def bench(name, module_cls, cfg, q_shape, kv_shape, dtype, iters=5):
    rngs = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(rngs[0], q_shape, dtype)
    k = jax.random.normal(rngs[1], kv_shape, dtype)
    mod = module_cls(cfg, dtype=dtype)
    variables = mod.init(jax.random.PRNGKey(1), q, k, k)

    @jax.jit
    def prog(variables, q, k):
        def body(c, _):
            ctx, w = mod.apply(variables, q + c * 0, k, k)
            return c + ctx.reshape(-1)[:1].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                            length=ITERS)
        return c

    t0 = time.perf_counter()
    np.asarray(prog(variables, q, k))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = prog(variables, q, k)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<46}{dt*1e3/ITERS:>9.3f} ms/call  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B, S = 64, 196

    for name, H, Q in [("soft Q=1 (LSTM decode step)", 512, 1),
                       ("soft Q=50 (teacher-forced)", 512, 50)]:
        for pallas in (False, True):
            cfg = AttentionConfig(hidden_dim=H, num_heads=8,
                                  use_pallas=pallas)
            bench(f"{name} use_pallas={pallas}", SoftAttention, cfg,
                  (B, Q, H), (B, S, H), dt)

    for name, H, Q in [("multi-head Q=50 (cross-attn)", 768, 50),
                       ("multi-head Q=1 (decode step)", 768, 1)]:
        for pallas in (False, True):
            cfg = AttentionConfig(hidden_dim=H, num_heads=12,
                                  use_pallas=pallas)
            bench(f"{name} use_pallas={pallas}", MultiHeadAttention, cfg,
                  (B, Q, H), (B, S, H), dt)


if __name__ == "__main__":
    main()
