"""Fused cross-attention step kernel (Pallas TPU) for KV-cached decode.

The Transformer caption decoder attends every generated token against a
per-image visual memory (reference: src/models/decoders.py:349-360's
``nn.TransformerDecoderLayer`` cross-attention; decode loop :461-491).
At decode time the XLA formulation is a batched einsum of tiny
``[K, hd] x [hd, Sm]`` matmuls — hundreds of M=5 MXU ops per layer-step,
measured ~2.5 ms/layer/run on the profile.

Unlike decode *self*-attention (per-beam caches), the memory K/V here are
**shared per image across beams**, so the whole per-head score pass can
ride one clean MXU dot instead of a VPU-bound broadcast-multiply +
head-mask reduction (the decode kernel's trick, which costs R*Sm*H
elementwise f32 work — measured 2.7 ms/layer/run at ViT-B memory length;
G-invariant, so cell sizing cannot fix it). The formulation here:

1. ``Q_exp [K*NH, H]`` — queries expanded per head by a 0/1 lane mask
   (cost K*NH*H, independent of the memory length).
2. ``scores = Q_exp @ mem_kT`` — one ``[K*NH, H] x [H, Sm]`` MXU dot per
   image; row (k, n) contracts q's head-n lanes against key head-n lanes
   (all other lanes are zeroed), yielding exactly the per-head scores.
   The memory keys are stored **pre-transposed** ``[B, H, Sm8]`` by
   ``init_memory_cache`` so the kernel never transposes.
3. f32 softmax over the memory axis (padding masked), weights cast to
   the value dtype — the same dtype discipline as the XLA path.
4. ``P = W @ mem_v`` — one ``[K*NH, Sm] x [Sm, H]`` MXU dot; head n's
   value mix lives in row (k, n)'s head-n lanes, extracted by the same
   lane mask and summed over NH (exact: one nonzero term per lane).

Numerics match the XLA path: bf16 MXU dots accumulate in f32 (bf16
products are exact in f32), softmax in f32. The memory axis is padded to
a multiple of 8 (Mosaic sublane alignment; padded rows are masked). Pure
read attention — blocks ride the automatic pallas pipeline (no manual
DMA).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e9

# VMEM allowance for the pipelined memory blocks (double-buffered by the
# pallas pipeline); per-image temporaries are tiny ([K*NH, Sm] scores).
_VMEM_BUDGET = 8 * 1024 * 1024


def fused_cross_supported(mem_len: int, width: int,
                          dtype=jnp.bfloat16) -> bool:
    """Mosaic constraints: 128-lane feature axis, 8-aligned memory axis,
    and one image's double-buffered K/V memory block must fit VMEM."""
    return (width % 128 == 0 and mem_len % 8 == 0
            and 4 * mem_len * width * jnp.dtype(dtype).itemsize
            <= _VMEM_BUDGET)


def _kernel(q_ref, mkt_ref, mv_ref, mask_ref, out_ref,
            *, K: int, NH: int, Sm: int, H: int, G: int, scale: float):
    """One grid cell: G images x K beams against per-image memory.

    q_ref    [G, K, H]    query rows (model dtype)
    mkt_ref  [G, H, Sm]   per-image memory keys, pre-transposed
    mv_ref   [G, Sm, H]   per-image memory values
    mask_ref [G, 1, Sm]   int32: nonzero = masked (padding) position
    out_ref  [G, K, H]    attention mix (pre-out_proj)
    """
    dt = mv_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (NH, H), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (NH, H), 0)
    # 0/1 lane masks (multiplication, not where: Mosaic cannot relayout a
    # broadcast 3-D i1 vector; x*1.0 and x*0.0 are exact)
    hmask_q = (lane // (H // NH) == head).astype(q_ref.dtype)   # [NH, H]
    hmask_f = hmask_q.astype(jnp.float32)

    for g in range(G):
        q = q_ref[g]                                        # [K, H]
        # per-head query expansion: row (k, n) keeps only head n's lanes
        q_exp = (q[:, None, :] * hmask_q[None]).reshape(K * NH, H)
        scores = jax.lax.dot_general(
            q_exp, mkt_ref[g], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [K*NH, Sm]
        scores = jnp.where(mask_ref[g] != 0, _NEG_INF, scores)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)
        p = jax.lax.dot_general(
            w, mv_ref[g], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [K*NH, H]
        mix = jnp.sum(p.reshape(K, NH, H) * hmask_f[None], axis=1)
        out_ref[g] = mix.astype(out_ref.dtype)


def fused_cross_attention(
        q: jnp.ndarray, mem_kt: jnp.ndarray, mem_v: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray], *, num_heads: int, beam_size: int,
        scale: float, block_images: Optional[int] = None,
        interpret: Optional[bool] = None) -> jnp.ndarray:
    """One fused cross-attention step over all beam rows.

    q [Bk, H]; mem_kt [B, H, Sm] pre-transposed keys and mem_v [B, Sm, H]
    flat per-image memory with ``Sm % 8 == 0`` (pad and mask the tail);
    pad_mask [B, Sm] with nonzero = masked, or None. Returns the
    attention mix [Bk, H] (pre-out_proj).
    """
    Bk, H = q.shape
    B, _, Sm = mem_kt.shape
    K = beam_size
    NH = num_heads
    if Bk != B * K:
        raise ValueError(f"rows {Bk} != images {B} x beams {K}")
    if Sm % 8:
        raise ValueError(f"memory axis must be 8-aligned, got {Sm} "
                         "(pad the memory and mask the tail)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % 128 and not interpret:
        raise ValueError(
            f"fused cross-attention needs a 128-lane feature axis, got "
            f"width {H}. Use the XLA path for narrow models.")

    if pad_mask is None:
        mask = jnp.zeros((B, 1, Sm), dtype=jnp.int32)
    else:
        mask = pad_mask.astype(jnp.int32).reshape(B, 1, Sm)

    exec_fn = functools.partial(
        _cross_exec, K=K, NH=NH, Sm=Sm, H=H, scale=scale,
        block_images=block_images, interpret=interpret)
    operands = (q.reshape(B, K, H), mem_kt, mem_v, mask)

    # Multi-chip: same contract as the decode kernel — under an active
    # ``decode_mesh``, one shard-local kernel launch per chip over the
    # data axis (memory K/V are per-image, so shards are self-contained).
    from .pallas_decode import shard_data_parallel
    out = shard_data_parallel(exec_fn, operands, batch=B,
                              what="fused cross-attention")
    return out.reshape(Bk, H)


def _cross_exec(q3, mem_kt, mem_v, mask, *, K: int, NH: int, Sm: int,
                H: int, scale: float, block_images: Optional[int],
                interpret: bool) -> jnp.ndarray:
    """Single-shard kernel launch: q3 [B, K, H] -> [B, K, H]."""
    B = q3.shape[0]
    itemsize = jnp.dtype(mem_kt.dtype).itemsize
    if block_images is None:
        env_g = int(os.environ.get("ICT_CROSS_G", "0"))  # dev A/B knob
        if env_g:
            block_images = env_g
        else:
            # pipelined mem blocks are double-buffered: 2 buffers x 2
            # arrays; the per-image compute temporaries are negligible
            per_image = 4 * Sm * H * itemsize
            block_images = max(1, _VMEM_BUDGET // per_image)
    G = min(block_images, B)
    while B % G:
        G -= 1

    kernel = functools.partial(
        _kernel, K=K, NH=NH, Sm=Sm, H=H, G=G, scale=scale)
    # q/out ride as [B, K, H]: the trailing (K, H) block dims equal the
    # full array dims, so the Mosaic block-shape rule holds for any G.
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, K, H), lambda i: (i, 0, 0)),      # q
            pl.BlockSpec((G, H, Sm), lambda i: (i, 0, 0)),     # mem_kt
            pl.BlockSpec((G, Sm, H), lambda i: (i, 0, 0)),     # mem_v
            pl.BlockSpec((G, 1, Sm), lambda i: (i, 0, 0)),     # mask
        ],
        out_specs=pl.BlockSpec((G, K, H), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, H), q3.dtype),
        interpret=interpret,
    )(q3, mem_kt, mem_v, mask)


def reference_cross_attention(q, mem_kt, mem_v, pad_mask, *,
                              num_heads: int, beam_size: int, scale: float):
    """Pure-jnp oracle (same dtype discipline as the XLA decode path)."""
    Bk, H = q.shape
    B, _, Sm = mem_kt.shape
    NH = num_heads
    hd = H // NH
    K = beam_size
    qh = q.reshape(B, K, NH, hd).astype(jnp.float32)
    kh = mem_kt.reshape(B, NH, hd, Sm).astype(jnp.float32)
    scores = jnp.einsum("bknd,bnds->bksn", qh, kh) * scale
    if pad_mask is not None:
        scores = jnp.where(
            pad_mask.astype(bool)[:, None, :, None], _NEG_INF, scores)
    w = jax.nn.softmax(scores, axis=2).astype(mem_v.dtype)
    vh = mem_v.reshape(B, Sm, NH, hd)
    out = jnp.einsum("bksn,bsnd->bknd", w.astype(jnp.float32),
                     vh.astype(jnp.float32))
    return out.reshape(Bk, H).astype(q.dtype)
