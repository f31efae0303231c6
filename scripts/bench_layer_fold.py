"""Full-layer and whole-stack decode-fold experiments (round 5 follow-on).

Round 5's QKV/out-proj fold (scripts/bench_fused_qkv.py) proved the fused
scan's fixed cost was XLA<->Mosaic boundary serialization (not launch
overhead) and recovered 3.2 ms by folding the attention-adjacent matmuls
into the kernel. But each decoder layer STILL has an XLA region on the
critical path: the MLP (the two big [H,4H] matmuls) + both layernorms run
between consecutive Pallas calls, so layer N+1's cache-load DMA waits for
XLA to finish layer N's MLP. This script measures the two remaining fold
depths on the same chained 19-step x 12-layer scan harness:

* **E: full-layer fold.** ONE Pallas call per layer computes
  LN1 -> QKV projection -> fused beam attention -> output projection ->
  residual -> LN2 -> MLP (fc/gelu_new/proj) -> residual. No XLA compute at
  all between consecutive layer calls.
* **F: whole-stack fold.** ONE Pallas call per decode STEP: grid
  (layer, cell), the residual stream carried across layers in a VMEM
  scratch buffer, per-layer weights as pipelined blocks (Mosaic prefetches
  layer li+1's weights while li computes), per-layer KV caches stacked in
  HBM. 228 calls/decode -> 19.

A-side is the promoted round-5 production path (folded QKV kernel + XLA
LN/MLP). Parity is checked A vs E vs F before timing.

Run on the chip:  python scripts/bench_layer_fold.py
CPU parity only:  JAX_PLATFORMS=cpu python scripts/bench_layer_fold.py --tiny
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from image_captioning_ml_project_tpu.ops.pallas_decode import (  # noqa: E402
    _NEG_INF, fused_beam_decode_attention_qkv)

TINY = "--tiny" in sys.argv
if TINY:
    jax.config.update("jax_platforms", "cpu")
    B, K, S, NH, H, P, LAYERS, STEPS = 4, 3, 8, 2, 256, 2, 2, 7
else:
    B, K, S, NH, H, P, LAYERS, STEPS = 64, 5, 24, 12, 768, 10, 12, 19
R_ALL = B * K
DT = jnp.bfloat16
SCALE = float(1.0 / np.sqrt(H // NH))
INTERPRET = TINY
LN_EPS = 1e-5
# Total VMEM envelope for the deep-fold kernels: double-buffered K/V
# scratch + pipelined weight blocks (wqkv/wo/wfc/wproj ~13.5 MiB single,
# x2 pipeline buffers) + the x carry. The v5e core has >96 MiB physical
# VMEM (probed, docs/performance.md round 5); 48 MiB leaves XLA plenty.
VMEM_LIMIT = int(__import__("os").environ.get(
    "FOLD_VMEM_MB", "48")) * 1024 * 1024


def _ln(x, gamma, beta):
    """LayerNorm with flax.linen.LayerNorm(dtype=bf16) bit-exact semantics
    (flax _compute_stats/_normalize, force_float32_reductions=True,
    use_fast_variance=True): f32 stats with the negative-variance clip,
    scale folded into the rsqrt multiplier BEFORE the elementwise multiply
    (``mul = rsqrt(var+eps) * scale; y = (x-mu) * mul + bias``), result
    cast to the module dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + LN_EPS) * gamma.astype(jnp.float32)
    y = (xf - mu) * mul + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _mlp(h, wfc, bfc, wpj, bpj):
    """fc -> gelu_new -> proj with the kernel's exact numerics: f32-accum
    dots rounded to bf16, then the bf16 bias added (nn.Dense-identical)."""
    y = jax.lax.dot_general(
        h, wfc, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype) + bfc
    g = jax.nn.gelu(y, approximate=True)
    return jax.lax.dot_general(
        g, wpj, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype) + bpj


def _attention_core(q, knew, vnew, anc_ref, pk, pv, kvm, vvm, slot, pos,
                    *, K, NH, S, P, H, G, R, scale):
    """The fused beam-attention math shared by E and F (identical to
    ops/pallas_decode._kernel, precise=True, has_prefix=True): per-head
    MXU reductions via the block-diagonal head mask, lazy-ancestry select,
    suffix-first softmax. Returns the [R, H] f32 attention mix."""
    sdt = jnp.float32
    hd = H // NH
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 1)
    hmask = (lane // hd == head).astype(sdt)
    hmask_t = (lane // hd == head).astype(jnp.float32).T

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

    dt = knew.dtype
    s_self = head_sums(q * knew.astype(sdt)) * scale              # [R, NH]

    q4 = q.reshape(G, K, H)
    P8 = -(-P // 8) * 8
    prod_pre = q4[:, :, None, :] * pk[:, None].astype(sdt)
    if P8 != P:
        prod_pre = jnp.pad(prod_pre, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
    s_pre = head_sums(prod_pre.reshape(R * P8, H)).reshape(
        R, P8, NH) * scale
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, P8, NH), 1)
    s_pre = jnp.where(p_ids < P, s_pre, _NEG_INF)

    anc4 = anc_ref[:].reshape(G, K, S, 1)
    kvm4 = kvm[slot].reshape(G, K, S, H)
    k_sel = jnp.zeros((G, K, S, H), dtype=kvm4.dtype)
    for c in range(K):
        k_sel = jnp.where(anc4 == c, kvm4[:, c][:, None], k_sel)
    prod_suf = (q4[:, :, None, :] * k_sel.astype(sdt)).reshape(R * S, H)
    s_suf = head_sums(prod_suf).reshape(R, S, NH) * scale
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (R, S, NH), 1)
    s_suf = jnp.where(s_ids < pos, s_suf, _NEG_INF)

    scores = jnp.concatenate([s_suf, s_pre, s_self[:, None, :]], axis=1)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)

    pvp = pv
    if P8 != P:
        pvp = jnp.pad(pvp, ((0, 0), (0, P8 - P), (0, 0)))
    w_pre_flat = w[:, S:S + P8].reshape(R * P8, NH)
    acc = jnp.sum(
        expand(w_pre_flat).reshape(G, K, P8, H)
        * pvp[:, None].astype(jnp.float32), axis=2).reshape(R, H)

    vvm4 = vvm[slot].reshape(G, K, S, H)
    v_sel = jnp.zeros((G, K, S, H), dtype=vvm4.dtype)
    for c in range(K):
        v_sel = jnp.where(anc4 == c, vvm4[:, c][:, None], v_sel)
    w_suf_flat = w[:, :S].reshape(R * S, NH)
    acc = acc + jnp.sum(
        expand(w_suf_flat).reshape(R, S, H)
        * v_sel.astype(jnp.float32).reshape(R, S, H), axis=1)

    acc = acc + jnp.sum(
        expand(w[:, S + P8:]) * vnew[:, None].astype(jnp.float32), axis=1)
    return acc


def _qkv_project(x, wqkv, bqkv, H):
    """In-kernel QKV projection, nn.Dense-exact (f32-accum dot rounded to
    the module dtype, then the dtype bias added). Slices BEFORE adding
    axes (Mosaic gather-lowering trap, ops/pallas_decode.py round 5)."""
    dt = x.dtype
    qkv = jax.lax.dot_general(
        x, wqkv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.astype(dt) + bqkv
    q = qkv[:, :H].astype(jnp.float32)
    knew = qkv[:, H:2 * H]
    vnew = qkv[:, 2 * H:]
    return q, knew, vnew


# ---------------------------------------------------------------------------
# E: full-layer fold — one pallas_call per decoder layer
# ---------------------------------------------------------------------------

def _layer_kernel(pos_ref, x_ref, anc_ref, pk_ref, pv_ref,
                  wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g1_ref, b1_ref, g2_ref, b2_ref,
                  wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                  kc_in, vc_in, out_ref, kc_out, vc_out, kvm, vvm, sems,
                  *, K, NH, S, P, H, G, R, scale):
    cell = pl.program_id(0)
    ncells = pl.num_programs(0)
    row0 = cell * R
    pos = pos_ref[0]
    slot = cell % 2

    def start_load(c, sl):
        r0 = c * R
        pltpu.make_async_copy(
            kc_in.at[pl.ds(r0, R)], kvm.at[sl], sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            vc_in.at[pl.ds(r0, R)], vvm.at[sl], sems.at[sl, 1]).start()

    @pl.when(cell == 0)
    def _():
        start_load(0, 0)

    load_k = pltpu.make_async_copy(
        kc_in.at[pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])
    load_v = pltpu.make_async_copy(
        vc_in.at[pl.ds(row0, R)], vvm.at[slot], sems.at[slot, 1])

    x = x_ref[:]                                              # [R, H] bf16
    h = _ln(x, g1_ref[0], b1_ref[0])
    q, knew, vnew = _qkv_project(h, wqkv_ref[:], bqkv_ref[:], H)

    def wait_puts(sl):
        pltpu.make_async_copy(
            kvm.at[sl, :, pl.ds(0, 8), :],
            kc_out.at[pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 2]).wait()
        pltpu.make_async_copy(
            vvm.at[sl, :, pl.ds(0, 8), :],
            vc_out.at[pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 3]).wait()

    load_k.wait()
    load_v.wait()

    @pl.when(cell + 1 < ncells)
    def _():
        @pl.when(cell >= 1)
        def _():
            wait_puts(1 - slot)
        start_load(cell + 1, 1 - slot)

    acc = _attention_core(q, knew, vnew, anc_ref, pk_ref[:], pv_ref[:],
                          kvm, vvm, slot, pos,
                          K=K, NH=NH, S=S, P=P, H=H, G=G, R=R, scale=scale)
    att = jax.lax.dot_general(
        acc.astype(x.dtype), wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bo_ref[:]
    x1 = x + att
    h2 = _ln(x1, g2_ref[0], b2_ref[0])
    out_ref[:] = x1 + _mlp(h2, wfc_ref[:], bfc_ref[:], wpj_ref[:],
                           bpj_ref[:])

    # append this step's K/V in place (deferred-put scheme)
    pos0 = pl.multiple_of((pos // 8) * 8, 8)
    ids = jax.lax.broadcasted_iota(jnp.int32, (R, 8, H), 1)
    at_pos = ids == pos - pos0
    kvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, knew[:, None, :], kvm[slot, :, pl.ds(pos0, 8), :])
    vvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, vnew[:, None, :], vvm[slot, :, pl.ds(pos0, 8), :])
    pltpu.make_async_copy(
        kvm.at[slot, :, pl.ds(pos0, 8), :],
        kc_out.at[pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 2]
    ).start()
    pltpu.make_async_copy(
        vvm.at[slot, :, pl.ds(pos0, 8), :],
        vc_out.at[pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 3]
    ).start()

    @pl.when(cell == ncells - 1)
    def _():
        @pl.when(ncells > 1)
        def _():
            wait_puts(1 - slot)
        wait_puts(slot)


def _grid_geometry(Bk):
    """Default 40-row cells (the split/attention-only kernel's measured
    optimum); FOLD_ROWS overrides — with the MLP matmuls in-kernel the
    MXU wants M >= 128, so bigger cells may win (measured below)."""
    import os as _os

    rows = int(_os.environ.get("FOLD_ROWS", "40"))
    Bi = Bk // K
    G = max(1, min(rows, Bk) // K)
    while Bi % G:
        G -= 1
    return Bi, G, G * K


def folded_full_layer(x, lw, k_cache, v_cache, prefix_k, prefix_v, anc,
                      pos):
    """One COMPLETE decoder layer as one pallas_call (variant E)."""
    Bk, H_ = x.shape
    S_ = k_cache.shape[1]
    P_ = prefix_k.shape[1]
    Bi, G, R = _grid_geometry(Bk)
    kernel = functools.partial(
        _layer_kernel, K=K, NH=NH, S=S_, P=P_, H=H_, G=G, R=R, scale=SCALE)
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i, *_: (0,) * len(shape)), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bi // G,),
        in_specs=[
            pl.BlockSpec((R, H_), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),             # x
            pl.BlockSpec((R, S_, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # anc
            pl.BlockSpec((G, P_, H_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # prefix_k
            pl.BlockSpec((G, P_, H_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # prefix_v
            vspec((H_, 3 * H_)), vspec((1, 3 * H_)),           # wqkv, bqkv
            vspec((H_, H_)), vspec((1, H_)),                   # wo, bo
            vspec((1, H_)), vspec((1, H_)),                    # ln1 g/b
            vspec((1, H_)), vspec((1, H_)),                    # ln2 g/b
            vspec((H_, 4 * H_)), vspec((1, 4 * H_)),           # wfc, bfc
            vspec((4 * H_, H_)), vspec((1, H_)),               # wpj, bpj
            pl.BlockSpec(memory_space=pl.ANY),              # k_cache
            pl.BlockSpec(memory_space=pl.ANY),              # v_cache
        ],
        out_specs=[
            pl.BlockSpec((R, H_), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),             # out
            pl.BlockSpec(memory_space=pl.ANY),              # k_cache alias
            pl.BlockSpec(memory_space=pl.ANY),              # v_cache alias
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S_, H_), k_cache.dtype),
            pltpu.VMEM((2, R, S_, H_), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H_), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # 0=pos, 1=x, 2=anc, 3=pk, 4=pv, 5..16=weights, 17=kc, 18=vc
        input_output_aliases={17: 1, 18: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), x,
      anc.astype(jnp.int32)[:, :, None], prefix_k, prefix_v,
      lw["wqkv"], lw["bqkv"].reshape(1, -1),
      lw["wo"], lw["bo"].reshape(1, -1),
      lw["g1"].reshape(1, -1), lw["b1"].reshape(1, -1),
      lw["g2"].reshape(1, -1), lw["b2"].reshape(1, -1),
      lw["wfc"], lw["bfc"].reshape(1, -1),
      lw["wpj"], lw["bpj"].reshape(1, -1),
      k_cache, v_cache)
    return out, k_cache, v_cache


# ---------------------------------------------------------------------------
# F: whole-stack fold — one pallas_call per decode step
# ---------------------------------------------------------------------------

def _stack_kernel(pos_ref, x_ref, anc_ref, pk_ref, pv_ref,
                  wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g1_ref, b1_ref, g2_ref, b2_ref,
                  wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                  kc_in, vc_in, out_ref, kc_out, vc_out,
                  kvm, vvm, xbuf, sems,
                  *, K, NH, S, P, H, G, R, L, scale):
    """Grid (L, NC): cell (li, g) runs layer li on image block g. The
    residual stream is carried across layers in the xbuf VMEM scratch
    (written by (li-1, g), read by (li, g)); per-layer weights arrive as
    pipelined blocks (Mosaic prefetches layer li+1's while li computes);
    per-layer caches live stacked [L, Bk, S, H] in HBM."""
    li = pl.program_id(0)
    g = pl.program_id(1)
    NC = pl.num_programs(1)
    c = li * NC + g
    ntotal = L * NC
    row0 = g * R
    pos = pos_ref[0]
    slot = c % 2

    def start_load(nc, sl):
        nli = nc // NC
        r0 = (nc % NC) * R
        pltpu.make_async_copy(
            kc_in.at[nli, pl.ds(r0, R)], kvm.at[sl], sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            vc_in.at[nli, pl.ds(r0, R)], vvm.at[sl], sems.at[sl, 1]).start()

    @pl.when(c == 0)
    def _():
        start_load(0, 0)

    load_k = pltpu.make_async_copy(
        kc_in.at[li, pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])
    load_v = pltpu.make_async_copy(
        vc_in.at[li, pl.ds(row0, R)], vvm.at[slot], sems.at[slot, 1])

    # layer 0 reads the step input block; later layers read the carry
    x = jnp.where(li == 0, x_ref[:], xbuf[pl.ds(row0, R), :])  # [R, H]
    h = _ln(x, g1_ref[0, 0], b1_ref[0, 0])
    q, knew, vnew = _qkv_project(h, wqkv_ref[0], bqkv_ref[0], H)

    def wait_puts(sl):
        pltpu.make_async_copy(
            kvm.at[sl, :, pl.ds(0, 8), :],
            kc_out.at[0, pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 2]).wait()
        pltpu.make_async_copy(
            vvm.at[sl, :, pl.ds(0, 8), :],
            vc_out.at[0, pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 3]).wait()

    load_k.wait()
    load_v.wait()

    @pl.when(c + 1 < ntotal)
    def _():
        @pl.when(c >= 1)
        def _():
            wait_puts(1 - slot)
        start_load(c + 1, 1 - slot)

    acc = _attention_core(q, knew, vnew, anc_ref, pk_ref[:], pv_ref[:],
                          kvm, vvm, slot, pos,
                          K=K, NH=NH, S=S, P=P, H=H, G=G, R=R, scale=scale)
    att = jax.lax.dot_general(
        acc.astype(x.dtype), wo_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bo_ref[0]
    x1 = x + att
    h2 = _ln(x1, g2_ref[0, 0], b2_ref[0, 0])
    xo = x1 + _mlp(h2, wfc_ref[0], bfc_ref[0], wpj_ref[0], bpj_ref[0])
    xbuf[pl.ds(row0, R), :] = xo
    out_ref[:] = xo

    pos0 = pl.multiple_of((pos // 8) * 8, 8)
    ids = jax.lax.broadcasted_iota(jnp.int32, (R, 8, H), 1)
    at_pos = ids == pos - pos0
    kvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, knew[:, None, :], kvm[slot, :, pl.ds(pos0, 8), :])
    vvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, vnew[:, None, :], vvm[slot, :, pl.ds(pos0, 8), :])
    pltpu.make_async_copy(
        kvm.at[slot, :, pl.ds(pos0, 8), :],
        kc_out.at[li, pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 2]
    ).start()
    pltpu.make_async_copy(
        vvm.at[slot, :, pl.ds(pos0, 8), :],
        vc_out.at[li, pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 3]
    ).start()

    @pl.when(c == ntotal - 1)
    def _():
        @pl.when(ntotal > 1)
        def _():
            wait_puts(1 - slot)
        wait_puts(slot)


def folded_stack(x, sw, k_caches, v_caches, prefix_k, prefix_v, anc, pos):
    """All L decoder layers as ONE pallas_call (variant F). ``sw`` holds
    layer-stacked weights [L, ...]; ``k_caches``/``v_caches`` are stacked
    [L, Bk, S, H] and updated in place."""
    Bk, H_ = x.shape
    L, _, S_, _ = k_caches.shape
    P_ = prefix_k.shape[2]  # prefix_k is [L, B, P, H]
    Bi, G, R = _grid_geometry(Bk)
    NCI = Bi // G  # image-block cells per layer
    kernel = functools.partial(
        _stack_kernel, K=K, NH=NH, S=S_, P=P_, H=H_, G=G, R=R, L=L,
        scale=SCALE)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, (lambda li, g, *_: (li,) + (0,) * len(shape)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NCI),
        in_specs=[
            pl.BlockSpec((R, H_), lambda li, g, *_: (g, 0),
                         memory_space=pltpu.VMEM),             # x
            pl.BlockSpec((R, S_, 1), lambda li, g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),             # anc
            # prefix K/V flattened [L*B, P, H]: block index li*NCI + g
            pl.BlockSpec((G, P_, H_), lambda li, g, *_: (li * NCI + g, 0, 0),
                         memory_space=pltpu.VMEM),             # prefix_k
            pl.BlockSpec((G, P_, H_), lambda li, g, *_: (li * NCI + g, 0, 0),
                         memory_space=pltpu.VMEM),             # prefix_v
            wspec((H_, 3 * H_)), wspec((1, 3 * H_)),           # wqkv, bqkv
            wspec((H_, H_)), wspec((1, H_)),                   # wo, bo
            wspec((1, H_)), wspec((1, H_)),                    # ln1 g/b
            wspec((1, H_)), wspec((1, H_)),                    # ln2 g/b
            wspec((H_, 4 * H_)), wspec((1, 4 * H_)),           # wfc, bfc
            wspec((4 * H_, H_)), wspec((1, H_)),               # wpj, bpj
            pl.BlockSpec(memory_space=pl.ANY),              # k_caches
            pl.BlockSpec(memory_space=pl.ANY),              # v_caches
        ],
        out_specs=[
            pl.BlockSpec((R, H_), lambda li, g, *_: (g, 0),
                         memory_space=pltpu.VMEM),             # out
            pl.BlockSpec(memory_space=pl.ANY),              # k_caches alias
            pl.BlockSpec(memory_space=pl.ANY),              # v_caches alias
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S_, H_), k_caches.dtype),
            pltpu.VMEM((2, R, S_, H_), v_caches.dtype),
            pltpu.VMEM((Bk, H_), x.dtype),                  # residual carry
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out, k_caches, v_caches = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H_), x.dtype),
            jax.ShapeDtypeStruct(k_caches.shape, k_caches.dtype),
            jax.ShapeDtypeStruct(v_caches.shape, v_caches.dtype),
        ],
        # 0=pos, 1=x, 2=anc, 3=pk, 4=pv, 5..16=weights, 17=kc, 18=vc
        input_output_aliases={17: 1, 18: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), x,
      anc.astype(jnp.int32)[:, :, None],
      prefix_k.reshape(-1, P_, H_), prefix_v.reshape(-1, P_, H_),
      sw["wqkv"], sw["bqkv"][:, None], sw["wo"], sw["bo"][:, None],
      sw["g1"][:, None], sw["b1"][:, None],
      sw["g2"][:, None], sw["b2"][:, None],
      sw["wfc"], sw["bfc"][:, None], sw["wpj"], sw["bpj"][:, None],
      k_caches, v_caches)
    return out, k_caches, v_caches


# ---------------------------------------------------------------------------
# scan harnesses
# ---------------------------------------------------------------------------

def make_inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 16)
    x0 = jax.random.normal(ks[0], (R_ALL, H), DT)
    # per-layer prefix K/V (GPT-2 prefix is a per-layer projected KV)
    pk = jax.random.normal(ks[1], (LAYERS, B, P, H), DT) * 0.3
    pv = jax.random.normal(ks[2], (LAYERS, B, P, H), DT) * 0.3
    anc = jax.random.randint(ks[3], (R_ALL, S), 0, K)
    sw = {
        "wqkv": jax.random.normal(ks[4], (LAYERS, H, 3 * H), DT) * 0.02,
        "bqkv": jax.random.normal(ks[5], (LAYERS, 3 * H), DT) * 0.02,
        "wo": jax.random.normal(ks[6], (LAYERS, H, H), DT) * 0.02,
        "bo": jax.random.normal(ks[7], (LAYERS, H), DT) * 0.02,
        "g1": 1.0 + jax.random.normal(ks[8], (LAYERS, H), DT) * 0.02,
        "b1": jax.random.normal(ks[9], (LAYERS, H), DT) * 0.02,
        "g2": 1.0 + jax.random.normal(ks[10], (LAYERS, H), DT) * 0.02,
        "b2": jax.random.normal(ks[11], (LAYERS, H), DT) * 0.02,
        "wfc": jax.random.normal(ks[12], (LAYERS, H, 4 * H), DT) * 0.02,
        "bfc": jax.random.normal(ks[13], (LAYERS, 4 * H), DT) * 0.02,
        "wpj": jax.random.normal(ks[14], (LAYERS, 4 * H, H), DT) * 0.02,
        "bpj": jax.random.normal(ks[15], (LAYERS, H), DT) * 0.02,
    }
    return x0, pk, pv, anc, sw


def scan_production(x0, pk, pv, anc, sw):
    """A: round-5 production — folded QKV kernel, XLA LN/MLP per layer."""
    caches = [(jnp.zeros((R_ALL, S, H), DT), jnp.zeros((R_ALL, S, H), DT))
              for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, (kc, vc) in enumerate(caches):
            h = _ln(x, sw["g1"][li], sw["b1"][li])
            att, kc, vc = fused_beam_decode_attention_qkv(
                h, sw["wqkv"][li], sw["bqkv"][li], sw["wo"][li],
                sw["bo"][li], kc, vc, pk[li], pv[li], anc, t,
                num_heads=NH, beam_size=K, scale=SCALE,
                interpret=INTERPRET)
            x = x + att
            h2 = _ln(x, sw["g2"][li], sw["b2"][li])
            x = x + _mlp(h2, sw["wfc"][li], sw["bfc"][li], sw["wpj"][li],
                         sw["bpj"][li])
            new.append((kc, vc))
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, x0), jnp.arange(STEPS))
    return x, caches[-1][0]


def scan_layer_fold(x0, pk, pv, anc, sw):
    """E: one pallas_call per COMPLETE layer."""
    caches = [(jnp.zeros((R_ALL, S, H), DT), jnp.zeros((R_ALL, S, H), DT))
              for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, (kc, vc) in enumerate(caches):
            lw = {k: v[li] for k, v in sw.items()}
            x, kc, vc = folded_full_layer(x, lw, kc, vc, pk[li], pv[li],
                                          anc, t)
            new.append((kc, vc))
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, x0), jnp.arange(STEPS))
    return x, caches[-1][0]


def scan_stack_fold(x0, pk, pv, anc, sw):
    """F: one pallas_call per decode STEP (all layers)."""
    kcs = jnp.zeros((LAYERS, R_ALL, S, H), DT)
    vcs = jnp.zeros((LAYERS, R_ALL, S, H), DT)

    def step(carry, t):
        kcs, vcs, x = carry
        x, kcs, vcs = folded_stack(x, sw, kcs, vcs, pk, pv, anc, t)
        return (kcs, vcs, x), None

    (kcs, vcs, x), _ = jax.lax.scan(step, (kcs, vcs, x0),
                                    jnp.arange(STEPS))
    return x, kcs[-1]


def time_prog(name, fn, args, iters=5):
    prog = jax.jit(fn)
    x, _ = prog(*args)
    np.asarray(x)  # compile + settle
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last, _ = prog(*args)
    np.asarray(last)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<52}{dt:>9.2f} ms/run")
    return dt


def single_layer_production(x, lw, kc, vc, pk1, pv1, anc, pos):
    """One layer of the A path (folded-QKV kernel + XLA LN/MLP)."""
    h = _ln(x, lw["g1"], lw["b1"])
    att, kc, vc = fused_beam_decode_attention_qkv(
        h, lw["wqkv"], lw["bqkv"], lw["wo"], lw["bo"], kc, vc,
        pk1, pv1, anc, pos, num_heads=NH, beam_size=K, scale=SCALE,
        interpret=INTERPRET)
    x = x + att
    h2 = _ln(x, lw["g2"], lw["b2"])
    x = x + _mlp(h2, lw["wfc"], lw["bfc"], lw["wpj"], lw["bpj"])
    return x, kc, vc


def main():
    import os as _os

    variants = _os.environ.get("FOLD_VARIANTS", "AEF")
    args = make_inputs()
    x0, pk, pv, anc, sw = args

    if "P" not in variants and variants != "AEF":
        # sweep mode: parity already established at the default geometry;
        # time only the requested variants
        for v in variants:
            fn = {"A": scan_production, "E": scan_layer_fold,
                  "F": scan_stack_fold}[v]
            time_prog(f"{v} (rows={_os.environ.get('FOLD_ROWS', '40')})",
                      fn, args)
        return

    # single-call parity: ONE layer, ONE step — the numerically meaningful
    # check (the 228-call chain amplifies 1-ulp Mosaic-vs-XLA
    # transcendental differences chaotically in bf16)
    lw = {k: v[0] for k, v in sw.items()}
    zc = jnp.zeros((R_ALL, S, H), DT)
    xa1, ka1, _ = jax.jit(single_layer_production)(
        x0, lw, zc, zc, pk[0], pv[0], anc, 4)
    xe1, ke1, _ = jax.jit(folded_full_layer)(
        x0, lw, zc, zc, pk[0], pv[0], anc, 4)
    sw1 = {k: v[:1] for k, v in sw.items()}
    zcs = jnp.zeros((1, R_ALL, S, H), DT)
    xf1, kf1, _ = jax.jit(folded_stack)(
        x0, sw1, zcs, zcs, pk[:1], pv[:1], anc, 4)
    for name, xv, kv in (("E", xe1, ke1), ("F", xf1, kf1[0])):
        d1 = float(jnp.max(jnp.abs(xa1.astype(jnp.float32)
                                   - xv.astype(jnp.float32))))
        dk1 = float(jnp.max(jnp.abs(ka1.astype(jnp.float32)
                                    - kv.astype(jnp.float32))))
        ok = d1 < 5e-2 and dk1 < 1e-2
        print(f"single-call parity A vs {name}: out {d1:.3e} "
              f"cache {dk1:.3e} {'OK' if ok else 'FAIL'}")
        if not ok:
            sys.exit(1)

    xa, ca = jax.jit(scan_production)(*args)
    ref = float(jnp.max(jnp.abs(xa.astype(jnp.float32))))
    xe, ce = jax.jit(scan_layer_fold)(*args)
    xf, cf = jax.jit(scan_stack_fold)(*args)
    for name, xv, cv in (("E", xe, ce), ("F", xf, cf)):
        d = float(jnp.max(jnp.abs(xa.astype(jnp.float32)
                                  - xv.astype(jnp.float32))))
        dc = float(jnp.max(jnp.abs(ca.astype(jnp.float32)
                                   - cv.astype(jnp.float32))))
        rel = d / max(1e-6, ref)
        # chained-chaos allowance: 228 sequential bf16 layer-steps
        print(f"scan parity A vs {name}: out max abs diff {d:.3e} "
              f"(rel {rel:.3e}), cache diff {dc:.3e} "
              f"{'OK' if rel < 1e-1 and dc < 5e-1 else 'FAIL'}")
        if rel >= 1e-1 or dc >= 5e-1:
            sys.exit(1)
    if TINY:
        print("(tiny/CPU parity mode: timing skipped)")
        return
    ta = time_prog("A: production (folded-QKV kernel + XLA LN/MLP)",
                   scan_production, args)
    te = time_prog("E: full-layer fold (1 call/layer, no XLA between)",
                   scan_layer_fold, args)
    tf = time_prog("F: whole-stack fold (1 call/step)", scan_stack_fold,
                   args)
    print(f"\nE delta vs A: {ta - te:+.2f} ms "
          f"({'E wins' if te < ta else 'A wins'})")
    print(f"F delta vs A: {ta - tf:+.2f} ms "
          f"({'F wins' if tf < ta else 'A wins'})")


if __name__ == "__main__":
    main()
