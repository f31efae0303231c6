"""One-pass logsumexp + per-block maxima over vocab-sized logits (Pallas).

The beam candidate step (ops/topk.fused_beam_top_k) needs, per decode
step, the row logsumexp and the per-512-block maxima of the [rows, vocab]
logits. XLA lowers those as three separate reduction passes over the same
32 MB input (measured: convert_reduce 0.74 + reduce_max 0.71 +
exp_reduce 0.36 ms per flagship batch). This kernel produces both in one
read: a grid over vocab blocks with running (max, rescaled-sum) scratch —
the standard streaming-logsumexp recurrence — and a block-max row
accumulated via a one-hot lane mask.

Numerics: f32 throughout; the streaming logsumexp matches
``jax.scipy.special.logsumexp`` to f32 rounding (tests/test_topk.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(x_ref, lse_ref, bm_ref, m_run, s_run, bm_acc,
            *, V: int, BLK: int, NBP: int):
    cell = pl.program_id(0)
    ncells = pl.num_programs(0)

    x = x_ref[:].astype(jnp.float32)                   # [R, BLK]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + cell * BLK
    x = jnp.where(lane < V, x, _NEG_INF)

    bmax = jnp.max(x, axis=1, keepdims=True)           # [R, 1]

    @pl.when(cell == 0)
    def _():
        m_run[:] = jnp.full_like(m_run, _NEG_INF)
        s_run[:] = jnp.zeros_like(s_run)
        bm_acc[:] = jnp.full_like(bm_acc, _NEG_INF)

    m_old = m_run[:]
    s_old = s_run[:]
    m_new = jnp.maximum(m_old, bmax)
    s_new = (s_old * jnp.exp(m_old - m_new)
             + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True))
    m_run[:] = m_new
    s_run[:] = s_new

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, NBP), 1)
              == cell).astype(jnp.float32)
    bm_acc[:] = jnp.where(onehot > 0, bmax, bm_acc[:])

    @pl.when(cell == ncells - 1)
    def _():
        lse_ref[:] = m_run[:] + jnp.log(s_run[:])
        bm_ref[:] = bm_acc[:]


def lse_and_block_max(logits: jnp.ndarray, block: int = 512,
                      interpret=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits [R, V] (any float dtype) -> (lse [R] f32, block_max
    [R, ceil(V/block)] f32). One streaming pass over the input."""
    R, V = logits.shape
    nblk = -(-V // block)
    NBP = -(-nblk // 128) * 128  # lane-pad the block-max accumulator
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    lse, bm = pl.pallas_call(
        functools.partial(_kernel, V=V, BLK=block, NBP=NBP),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((R, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((R, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, NBP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, NBP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, NBP), jnp.float32),
        ],
        interpret=interpret,
    )(logits)
    return lse[:, 0], bm[:, :nblk]
