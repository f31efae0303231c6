"""Whole-stack CLIP-encoder kernel (Pallas TPU).

The flagship decode program's per-op profile (scripts/profile_beam.py,
round 5) showed the CLIP encoder forward costing 5.30 ms of the 36.2 ms
batch — a latency-bound chain of ~350 tiny XLA ops (49 matmul fusions,
49 layernorm reductions, 98 reshapes) over [64, 50, 768] activations, at
~4x its nominal compute floor. This kernel runs ALL encoder layers as ONE
pallas_call (the same whole-stack architecture as
ops/pallas_decode.fused_beam_decode_stack): grid (layer, image-block),
residual stream carried across layers in VMEM scratch, per-layer weights
as pipelined blocks (layer li+1's prefetch during li's compute), and the
full T x T multi-head attention computed in-kernel with a head-tiled
masked-dot formulation that needs no per-head lane slicing and no
transposes:

  Q'[h*T + t, d] = q[t, d] * [d // hd == h]      (tile + iota mask)
  S  = Q' . k^T  -> [nh*T, T]: rows are (head, query) pairs, so the
                    row softmax IS the per-head softmax
  O  = P . v     -> [nh*T, H], masked to each row-block's own head lanes
                    and summed over head blocks

Measured (scripts/bench_encoder_fold.py, v5e, [64, 50, 768] x 12 layers):
trace-based 5.74 ms (XLA) -> 5.27 ms at 256-row cells; same-run
wall-clock at 128-row cells 10.15 -> 8.10 ms/pass. Two Mosaic traps the
harness hit: f32xf32 score dots (~8x below bf16 MXU throughput — operands
stay bf16 with f32 accumulation, exact for products) and the bf16
logistic lowering (mis-verifies a f32->bf16 vector.broadcast — the
quick-gelu sigmoid runs in f32 under Mosaic, ulp-level difference only;
interpret mode keeps the exact XLA expression).

Decode-side only: the kernel has no VJP — callers gate on ``train=False``
(no existing call site differentiates a train=False encode; a future one
would fail loudly at trace time). ICT_ENCODER_FOLD=0 disables;
ICT_ENCODER_FOLD=force engages it in interpret mode too (CPU tests).

Reference being accelerated: the HF CLIPVisionModel encoder the reference
wraps at src/models/encoders.py:185-230.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9
_ENC_VMEM_BUDGET = 64 * 1024 * 1024
_ENC_VMEM_MARGIN = 4 * 1024 * 1024


def encoder_fold_mode() -> str:
    """ICT_ENCODER_FOLD: "1" (default — fold on TPU), "0" (never),
    "force" (also in interpret mode, for CPU parity tests)."""
    return os.environ.get("ICT_ENCODER_FOLD", "1")


def encoder_rows() -> int:
    """Grid-cell height target. 128 measured fastest (same-run wall
    10.15 -> 8.10 ms/pass vs XLA); ICT_ENCODER_ROWS overrides for
    experiments."""
    return int(os.environ.get("ICT_ENCODER_ROWS", "128"))


def fused_encoder_supported(num_tokens: int, width: int, mlp_dim: int,
                            dtype=jnp.bfloat16) -> bool:
    """Mosaic constraints: 128-lane-aligned feature/MLP axes and one
    image's padded token block + the four weight matrices inside the VMEM
    envelope."""
    itemsize = jnp.dtype(dtype).itemsize
    tpad = -(-num_tokens // 16) * 16
    weights = 2 * itemsize * (3 * width * width + width * width
                              + 2 * width * mlp_dim)
    per_image = 4 * tpad * width * itemsize  # x/out blocks, 2-buffered
    return (width % 128 == 0 and mlp_dim % 128 == 0
            and weights + per_image <= _ENC_VMEM_BUDGET)


def _ln(x, gamma, beta, eps):
    """flax LayerNorm bit-exact (see ops/pallas_decode._stack_ln)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    return ((xf - mu) * mul + beta.astype(jnp.float32)).astype(x.dtype)


def _dense(h, w, b):
    """nn.Dense-exact: f32-accumulated dot rounded to the module dtype,
    then the dtype bias added."""
    y = jax.lax.dot_general(
        h, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(h.dtype) + b


def _encoder_kernel(x_ref,
                    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                    g1_ref, b1_ref, g2_ref, b2_ref,
                    wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                    out_ref, xbuf,
                    *, NH: int, H: int, G: int, Tpad: int, Tval: int,
                    scale: float, eps: float, interpret: bool):
    li = pl.program_id(0)
    g = pl.program_id(1)
    rows = G * Tpad
    row0 = g * rows
    hd = H // NH

    # layer 0 reads the input block; later layers read the residual carry
    x = jnp.where(li == 0, x_ref[:], xbuf[pl.ds(row0, rows), :])
    dt = x.dtype
    h = _ln(x, g1_ref[0, 0], b1_ref[0, 0], eps)
    qkv = _dense(h, wqkv_ref[0], bqkv_ref[0])            # [G*Tpad, 3H]
    q = qkv[:, :H]
    k = qkv[:, H:2 * H]
    v = qkv[:, 2 * H:]

    rowhead = (jax.lax.broadcasted_iota(jnp.int32, (NH * Tpad, H), 0)
               // Tpad)
    lanehead = (jax.lax.broadcasted_iota(jnp.int32, (NH * Tpad, H), 1)
                // hd)
    own = rowhead == lanehead
    s_col = jax.lax.broadcasted_iota(jnp.int32, (NH * Tpad, Tpad), 1)
    svalid = s_col < Tval
    outs = []
    for i in range(G):  # static unroll: G images per cell
        qi = q[i * Tpad:(i + 1) * Tpad]                  # [Tpad, H]
        ki = k[i * Tpad:(i + 1) * Tpad]
        vi = v[i * Tpad:(i + 1) * Tpad]
        qtile = jnp.concatenate([qi] * NH, axis=0)       # [nh*Tpad, H]
        qmask = jnp.where(own, qtile, jnp.zeros_like(qtile))
        # contract both operands on the H axis (no transpose); bf16
        # operands, f32 accumulation
        s = jax.lax.dot_general(
            qmask, ki, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [nh*Tpad, Tpad]
        s = jnp.where(svalid, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)
        o = jax.lax.dot_general(
            p, vi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [nh*Tpad, H] f32
        o = jnp.where(own, o, jnp.zeros_like(o))
        outs.append(o.reshape(NH, Tpad, H).sum(axis=0))  # [Tpad, H]
    att = jnp.concatenate(outs, axis=0).astype(dt)

    x1 = x + _dense(att, wo_ref[0], bo_ref[0])
    h2 = _ln(x1, g2_ref[0, 0], b2_ref[0, 0], eps)
    y = _dense(h2, wfc_ref[0], bfc_ref[0])
    if interpret:
        # exact XLA expression (CPU parity); a bare float multiplies as a
        # weak f32 and Mosaic's bf16 logistic lowering mis-verifies
        y = y * jax.nn.sigmoid(y * jnp.asarray(1.702, y.dtype))
    else:
        yf = y.astype(jnp.float32)
        y = (yf * jax.nn.sigmoid(1.702 * yf)).astype(dt)
    xo = x1 + _dense(y, wpj_ref[0], bpj_ref[0])
    xbuf[pl.ds(row0, rows), :] = xo
    # the out block is revisited once per layer; each write overwrites it
    # fully and the last (li = L-1) flush is the final hidden state
    out_ref[:] = xo


def fused_encoder_stack(x: jnp.ndarray, stack: dict, num_tokens: int,
                        *, num_heads: int, ln_eps: float = 1e-5,
                        block_images: int | None = None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """All L CLIP layers over x [B, Tpad, H] (token axis pre-padded to a
    16-row bf16 sublane tile; positions >= num_tokens are masked out of
    every softmax and carry garbage otherwise) as ONE pallas_call.
    ``stack`` holds layer-stacked weights under the decode-stack key
    layout (wqkv [L,H,3H], bqkv [L,3H], wo, bo, g1/b1/g2/b2 (LN, f32),
    wfc [L,H,M], bfc, wpj [L,M,H], bpj). Returns [B, Tpad, H]."""
    B, Tpad, H = x.shape
    L = stack["wqkv"].shape[0]
    MLP = stack["wfc"].shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if Tpad % 16:
        raise ValueError(f"padded token axis must be 16-aligned, got {Tpad}")
    if H % 128 and not interpret:
        raise ValueError(
            f"fused encoder stack needs a 128-lane-aligned width, got {H}")
    G = block_images or max(1, encoder_rows() // Tpad)
    G = min(G, B)
    while B % G:
        G -= 1
    NC = B // G
    rows = G * Tpad
    scale = float(1.0 / (H // num_heads) ** 0.5)
    kernel = functools.partial(
        _encoder_kernel, NH=num_heads, H=H, G=G, Tpad=Tpad,
        Tval=num_tokens, scale=scale, eps=ln_eps, interpret=interpret)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, (lambda li, g: (li,) + (0,) * len(shape)),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(L, NC),
        in_specs=[
            pl.BlockSpec((rows, H), lambda li, g: (g, 0),
                         memory_space=pltpu.VMEM),
            wspec((H, 3 * H)), wspec((1, 3 * H)),
            wspec((H, H)), wspec((1, H)),
            wspec((1, H)), wspec((1, H)),
            wspec((1, H)), wspec((1, H)),
            wspec((H, MLP)), wspec((1, MLP)),
            wspec((MLP, H)), wspec((1, H)),
        ],
        out_specs=pl.BlockSpec((rows, H), lambda li, g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * Tpad, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((B * Tpad, H), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ENC_VMEM_BUDGET + _ENC_VMEM_MARGIN),
        interpret=interpret,
    )(x.reshape(B * Tpad, H),
      stack["wqkv"], stack["bqkv"][:, None],
      stack["wo"], stack["bo"][:, None],
      stack["g1"][:, None], stack["b1"][:, None],
      stack["g2"][:, None], stack["b2"][:, None],
      stack["wfc"], stack["bfc"][:, None],
      stack["wpj"], stack["bpj"][:, None])
    return out.reshape(B, Tpad, H)
