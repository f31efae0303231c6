"""Fused cross-attention step kernel (Pallas TPU) for KV-cached decode.

The Transformer caption decoder attends every generated token against a
per-image visual memory (reference: src/models/decoders.py:349-360's
``nn.TransformerDecoderLayer`` cross-attention; decode loop :461-491).
At decode time the XLA formulation is a batched einsum of tiny
``[K, hd] x [hd, Sm]`` matmuls — batch dims (image, head) with M = beam
width — which lowers to hundreds of M=5 MXU ops per layer-step and was
measured at ~2.5 ms/layer/run on the profile (the fused *self*-attention
kernel does ~1.05 ms/layer/run for the same rows).

This kernel reuses the decode kernel's economics
(:mod:`.pallas_decode`): grid cells of G images x K beams, per-head
score/value reductions as MXU dots against a block-diagonal head mask,
f32 score products of bf16 operands (exact), softmax in f32, weights cast
to the value dtype before mixing — numerics match the XLA path in
``models.decoders.CachedMHA.attend_precomputed``. The memory K/V arrive
flat ``[B, Sm8, H]`` with the position axis padded to a multiple of 8
(Mosaic sublane alignment; padded rows are masked). Unlike the decode
kernel there is no cache mutation — pure read attention — so the blocks
ride the automatic pallas pipeline (no manual DMA).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

# VMEM allowance for the pipelined memory blocks (double-buffered by the
# pallas pipeline) + per-chunk f32 temporaries.
_VMEM_BUDGET = 8 * 1024 * 1024
# Score/value passes chunk the memory axis so the [R, SB, H] f32 product
# temporary stays small; SB is a multiple of 8 (sublane alignment).
_CHUNK = 40


def fused_cross_supported(mem_len: int, width: int,
                          dtype=jnp.bfloat16) -> bool:
    """Mosaic constraints: 128-lane feature axis, 8-aligned memory axis,
    and one image's double-buffered K/V memory block must fit VMEM."""
    return (width % 128 == 0 and mem_len % 8 == 0
            and 4 * mem_len * width * jnp.dtype(dtype).itemsize
            <= _VMEM_BUDGET)


def _kernel(q_ref, mk_ref, mv_ref, mask_ref, out_ref,
            *, K: int, NH: int, Sm: int, H: int, G: int, R: int,
            scale: float):
    """One grid cell: G images x K beams = R rows against [G, Sm, H] memory.

    q_ref    [G, K, H]    query rows (model dtype); the (K, H) trailing
                          dims match the full array so Mosaic accepts any
                          G (R = G*K need not be sublane-aligned)
    mk_ref   [G, Sm, H]   per-image memory keys (flat heads)
    mv_ref   [G, Sm, H]   per-image memory values
    mask_ref [G, Sm, 1]   int32: nonzero = masked (padding) position
    out_ref  [G, K, H]    attention mix (pre-out_proj)
    """
    dt = mv_ref.dtype
    sdt = jnp.float32  # f32 products of bf16 operands are exact
    q4 = q_ref[:].astype(sdt)

    hd = H // NH
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 1)
    hmask = (lane // hd == head).astype(sdt)              # [H, NH]
    hmask_t = (lane // hd == head).astype(jnp.float32).T  # [NH, H]

    def head_sums(prod):
        nd = prod.ndim - 1
        return jax.lax.dot_general(
            prod, hmask, dimension_numbers=(((nd,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def expand(wpart):
        nd = wpart.ndim - 1
        return jax.lax.dot_general(
            wpart.astype(jnp.float32), hmask_t,
            dimension_numbers=(((nd,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # --- scores, chunked over the memory axis ---------------------------
    parts = []
    for j0 in range(0, Sm, _CHUNK):
        sb = min(_CHUNK, Sm - j0)
        mk_j = mk_ref[:, j0:j0 + sb, :].astype(sdt)       # [G, sb, H]
        prod = (q4[:, :, None, :] * mk_j[:, None]).reshape(R * sb, H)
        parts.append(head_sums(prod).reshape(R, sb, NH))
    scores = jnp.concatenate(parts, axis=1) * scale if len(parts) > 1 \
        else parts[0] * scale                              # [R, Sm, NH]
    masked = mask_ref[:][:, None] != 0                     # [G, 1, Sm, 1]
    scores = jnp.where(
        masked, _NEG_INF, scores.reshape(G, K, Sm, NH)).reshape(R, Sm, NH)

    # --- softmax (f32) then weights cast to the value dtype -------------
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)  # [R, Sm, NH]

    # --- weighted values, same chunking ---------------------------------
    acc = jnp.zeros((R, H), jnp.float32)
    for j0 in range(0, Sm, _CHUNK):
        sb = min(_CHUNK, Sm - j0)
        w_j = expand(w[:, j0:j0 + sb].reshape(R * sb, NH))  # [R*sb, H] f32
        mv_j = mv_ref[:, j0:j0 + sb, :].astype(jnp.float32)
        acc = acc + jnp.sum(
            w_j.reshape(G, K, sb, H) * mv_j[:, None], axis=2).reshape(R, H)
    out_ref[:] = acc.reshape(G, K, H).astype(out_ref.dtype)


def fused_cross_attention(
        q: jnp.ndarray, mem_k: jnp.ndarray, mem_v: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray], *, num_heads: int, beam_size: int,
        scale: float, block_images: Optional[int] = None,
        interpret: Optional[bool] = None) -> jnp.ndarray:
    """One fused cross-attention step over all beam rows.

    q [Bk, H]; mem_k/mem_v [B, Sm, H] flat per-image memory with
    ``Sm % 8 == 0`` (pad and mask the tail); pad_mask [B, Sm] with nonzero
    = masked, or None. Returns the attention mix [Bk, H] (pre-out_proj).
    """
    Bk, H = q.shape
    B, Sm, _ = mem_k.shape
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
        mask = jnp.zeros((B, Sm, 1), dtype=jnp.int32)
    else:
        mask = pad_mask.astype(jnp.int32).reshape(B, Sm, 1)

    exec_fn = functools.partial(
        _cross_exec, K=K, NH=NH, Sm=Sm, H=H, scale=scale,
        block_images=block_images, interpret=interpret)
    operands = (q.reshape(B, K, H), mem_k, mem_v, mask)

    # Multi-chip: same contract as the decode kernel — GSPMD cannot
    # partition a pallas custom call, so under ``decode_mesh`` run one
    # shard-local kernel per chip over the data axis (the grid is
    # image-parallel; memory K/V are per-image, so shards are
    # self-contained).
    from .pallas_decode import current_decode_mesh
    mesh_ctx, axis = current_decode_mesh()
    if mesh_ctx is not None and mesh_ctx.shape.get(axis, 1) > 1:
        if B % mesh_ctx.shape[axis]:
            raise ValueError(
                f"fused cross-attention under a {dict(mesh_ctx.shape)} "
                f"mesh needs the image batch ({B}) divisible by the "
                f"'{axis}' axis ({mesh_ctx.shape[axis]}).")
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as _P

        spec3 = _P(axis, None, None)
        out = shard_map(exec_fn, mesh=mesh_ctx,
                        in_specs=(spec3, spec3, spec3, spec3),
                        out_specs=spec3, check_rep=False)(*operands)
    else:
        out = exec_fn(*operands)
    return out.reshape(Bk, H)


def _cross_exec(q3, mem_k, mem_v, mask, *, K: int, NH: int, Sm: int,
                H: int, scale: float, block_images: Optional[int],
                interpret: bool) -> jnp.ndarray:
    """Single-shard kernel launch: q3 [B, K, H] -> [B, K, H]."""
    B = q3.shape[0]
    itemsize = jnp.dtype(mem_k.dtype).itemsize
    if block_images is None:
        # pipelined mem blocks are double-buffered: 2 buffers x 2 arrays
        per_image = 4 * Sm * H * itemsize
        block_images = max(1, min(40 // K, _VMEM_BUDGET // per_image))
    G = min(block_images, B)
    while B % G:
        G -= 1
    R = G * K

    kernel = functools.partial(
        _kernel, K=K, NH=NH, Sm=Sm, H=H, G=G, R=R, scale=scale)
    # q/out ride as [B, K, H]: the trailing (K, H) block dims equal the
    # full array dims, so the Mosaic block-shape rule holds for any G
    # (G*K rows per cell need not be a sublane multiple).
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, K, H), lambda i: (i, 0, 0)),      # q
            pl.BlockSpec((G, Sm, H), lambda i: (i, 0, 0)),     # mem_k
            pl.BlockSpec((G, Sm, H), lambda i: (i, 0, 0)),     # mem_v
            pl.BlockSpec((G, Sm, 1), lambda i: (i, 0, 0)),     # mask
        ],
        out_specs=pl.BlockSpec((G, K, H), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, H), q3.dtype),
        interpret=interpret,
    )(q3, mem_k, mem_v, mask)


def reference_cross_attention(q, mem_k, mem_v, pad_mask, *, num_heads: int,
                              beam_size: int, scale: float):
    """Pure-jnp oracle (same dtype discipline as the XLA decode path)."""
    Bk, H = q.shape
    B, Sm, _ = mem_k.shape
    NH = num_heads
    hd = H // NH
    K = beam_size
    qh = q.reshape(B, K, NH, hd).astype(jnp.float32)
    kh = mem_k.reshape(B, Sm, NH, hd).astype(jnp.float32)
    scores = jnp.einsum("bknd,bsnd->bksn", qh, kh) * scale
    if pad_mask is not None:
        scores = jnp.where(
            pad_mask.astype(bool)[:, None, :, None], _NEG_INF, scores)
    w = jax.nn.softmax(scores, axis=2).astype(mem_v.dtype)
    vh = mem_v.reshape(B, Sm, NH, hd)
    out = jnp.einsum("bksn,bsnd->bknd", w.astype(jnp.float32),
                     vh.astype(jnp.float32))
    return out.reshape(Bk, H).astype(q.dtype)
