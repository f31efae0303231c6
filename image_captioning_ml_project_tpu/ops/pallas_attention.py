"""Fused cross-attention Pallas TPU kernels.

The BASELINE.json north star calls for the reference's attention variants
(reference: src/models/attention.py:38-360) "fused as Pallas kernels". Two
kernels cover the zoo's compute cores:

* :func:`fused_sdpa` — scaled-dot-product attention
  ``softmax(q k^T * scale + mask) v`` for the multi-head variant (and the
  AoA/adaptive variants that wrap it). One VMEM-resident pass per
  (batch, head): with caption-side sequence lengths ≤ 257 keys the whole
  score row fits on-chip, so no FlashAttention-style K blocking is needed —
  scores never round-trip to HBM.
* :func:`fused_additive_attention` — the Bahdanau core
  ``energy(tanh(q_proj + k_proj))`` of SoftAttention. Fusing avoids
  materializing the [B, Q, S, H] broadcast sum (the reference materializes
  it in HBM, src/models/attention.py:85-91) — it lives only in VMEM tiles.

Both kernels pad inputs to TPU tile boundaries (lane=128, sublane=8) on the
host side of the call and run in interpreter mode on CPU (tests). Numerics
are validated against the jnp reference paths in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Scaled dot-product attention
# ---------------------------------------------------------------------------


def _sdpa_kernel(q_ref, k_ref, v_ref, mask_ref, ctx_ref, w_ref, *, scale):
    """One (batch*head) program: q [Q, D], k/v [S, D], mask [1, S]."""
    q = q_ref[:]
    k = k_ref[:]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask_ref[:], _NEG_INF, scores)  # [Q, S] via [1, S]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    w_ref[:] = w
    ctx_ref[:] = jnp.dot(w.astype(v_ref.dtype), v_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(ctx_ref.dtype)


def fused_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               key_padding_mask: Optional[jnp.ndarray],
               scale: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q [B, H, Q, D], k/v [B, H, S, D], key_padding_mask [B, S] (True=pad).

    Returns (context [B, H, Q, D], weights [B, H, Q, S] float32)."""
    B, H, Q, D = q.shape
    S = k.shape[2]

    Qp = _round_up(max(Q, 8), 8)
    Sp = _round_up(max(S, 128), 128)
    Dp = _round_up(max(D, 128), 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Qp - Q), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    if key_padding_mask is None:
        mask = jnp.zeros((B, S), dtype=bool)
    else:
        mask = key_padding_mask.astype(bool)
    mask = jnp.pad(mask, ((0, 0), (0, Sp - S)), constant_values=True)
    # broadcast mask over heads: [B*H, 1, Sp]
    mask = jnp.repeat(mask[:, None, None, :], H, axis=1).reshape(B * H, 1, Sp)

    qf = qp.reshape(B * H, Qp, Dp)
    kf = kp.reshape(B * H, Sp, Dp)
    vf = vp.reshape(B * H, Sp, Dp)

    grid = (B * H,)
    ctx, w = pl.pallas_call(
        functools.partial(_sdpa_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Qp, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Sp, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Sp, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, Qp, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Qp, Sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Qp, Dp), q.dtype),
            jax.ShapeDtypeStruct((B * H, Qp, Sp), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, mask)

    ctx = ctx.reshape(B, H, Qp, Dp)[:, :, :Q, :D]
    w = w.reshape(B, H, Qp, Sp)[:, :, :Q, :S]
    return ctx, w


# ---------------------------------------------------------------------------
# Additive (Bahdanau) attention core
# ---------------------------------------------------------------------------


def _additive_kernel(qp_ref, kp_ref, ew_ref, mask_ref, scores_ref,
                     *, temperature):
    """One batch program: qp [Qb, H], kp [S, H], ew [H, 1] -> scores [Qb, S].

    The [Qb, S, H] tanh broadcast lives only in VMEM."""
    qp = qp_ref[:]              # [Qb, H]
    kp = kp_ref[:]              # [S, H]
    t = jnp.tanh(qp[:, None, :] + kp[None, :, :])        # [Qb, S, H]
    scores = jax.lax.dot_general(
        t, ew_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]      # [Qb, S]
    scores = scores / temperature
    scores_ref[:] = jnp.where(mask_ref[:], _NEG_INF, scores)


def fused_additive_scores(q_proj: jnp.ndarray, k_proj: jnp.ndarray,
                          energy_w: jnp.ndarray, energy_b: jnp.ndarray,
                          key_padding_mask: Optional[jnp.ndarray],
                          temperature: float) -> jnp.ndarray:
    """q_proj [B, Q, H], k_proj [B, S, H], energy [H, 1] + bias [1].

    Returns masked scores [B, Q, S] (softmax left to the caller so the
    variant wrapper keeps full parity control)."""
    B, Q, H = q_proj.shape
    S = k_proj.shape[1]

    QB = 8  # query block (VMEM: QB * Sp * Hp floats)
    Qp = _round_up(max(Q, QB), QB)
    Sp = _round_up(max(S, 128), 128)
    Hp = _round_up(max(H, 128), 128)

    qp = jnp.pad(q_proj, ((0, 0), (0, Qp - Q), (0, Hp - H)))
    kp = jnp.pad(k_proj, ((0, 0), (0, Sp - S), (0, Hp - H)))
    ew = jnp.pad(energy_w.reshape(H, 1), ((0, Hp - H), (0, 0)))
    if key_padding_mask is None:
        mask = jnp.zeros((B, S), dtype=bool)
    else:
        mask = key_padding_mask.astype(bool)
    mask = jnp.pad(mask, ((0, 0), (0, Sp - S)), constant_values=True)
    mask = mask[:, None, :]  # [B, 1, Sp]

    grid = (B, Qp // QB)
    scores = pl.pallas_call(
        functools.partial(_additive_kernel, temperature=temperature),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, QB, Hp), lambda b, qb: (b, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Sp, Hp), lambda b, qb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 1), lambda b, qb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Sp), lambda b, qb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, QB, Sp), lambda b, qb: (b, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, Sp), jnp.float32),
        interpret=_interpret(),
    )(qp, kp, ew, mask)

    # energy bias is constant across (q, s): add outside, pre-divided by
    # temperature for exact parity with (dot + b) / temperature (cancelled
    # by softmax anyway). Masked entries stay ~-1e9.
    return scores[:, :Q, :S] + energy_b.reshape(()) / temperature
