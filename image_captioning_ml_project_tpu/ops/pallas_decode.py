"""Fused beam-decode attention step kernel (Pallas TPU).

The KV-cached GPT-2 beam decode is the framework's headline perf path
(reference hot loop being replaced: src/models/decoders.py:461-491 re-ran
the full prefix per token; src/models/decoders.py:645-654 delegated to HF
``generate``). The XLA formulation of one decode step — score the query
against a shared per-image prefix, an ancestry-selected beam suffix cache,
and the step's own K/V, then append to the cache — is dominated by memory
traffic XLA will not eliminate (measured, scripts/bench_cache_variants.py):

* ``dynamic_update_slice`` on a scan-carried cache is **never in place** on
  this toolchain — every append copies the full 9.8 MB buffer (15.8 ms/run
  for the writes alone across 24 caches x 19 steps);
* the lazy-ancestry beam read needs either a permuted cache copy
  (take_along_axis) or a one-hot select over beam candidates, both of which
  more than double the step cost (65 ms vs 28 ms for a plain read).

This kernel does the whole read-score-mix-append in one pass per layer:

* caches stay in **HBM** (``memory_space=ANY``) and are input/output
  **aliased** — the new K/V row is DMA'd into place; nothing is copied;
* the block of cache rows a grid cell needs is DMA'd to VMEM **once** and
  every derived quantity (candidate scores, softmax, weighted values) lives
  only in VMEM;
* per-head score/value reductions ride the MXU via a block-diagonal
  head-mask matrix (``[H, nh]``), avoiding per-head lane slicing;
* the beam-ancestry select is K cheap bf16 select passes over the VMEM
  block (each (row, position) keeps the candidate its ancestry names);
  scoring and value-weighting then run single-pass.

Numerics match the XLA path in ``models.gpt2.GPT2Attention.cached_step``:
bf16 products, f32 accumulation/softmax, weights cast back to the value
dtype before mixing (tests/test_pallas_decode.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

# VMEM allowance for the kernel's double-buffered K/V scratch (the q/anc/
# prefix blocks and compiler temporaries share the remaining ~8 MiB of the
# ~16 MiB/core VMEM).
_SCRATCH_VMEM_BUDGET = 8 * 1024 * 1024


def fused_decode_supported(cache_len: int, width: int,
                           dtype=jnp.bfloat16, beam_size: int = 1) -> bool:
    """Whether the fused kernel's Mosaic constraints hold for this decoder:
    the lane (feature) axis of the HBM cache DMA slices must be a whole
    number of 128-lane tiles, the position axis 8-aligned, and one image's
    whole beam block (the kernel's minimum grid cell, ``beam_size`` rows)
    of double-buffered scratch must fit the VMEM budget. Small models
    (e.g. test/demo configs with width 16) must take the XLA path."""
    return (width % 128 == 0 and cache_len % 8 == 0
            and beam_size * 4 * cache_len * width * jnp.dtype(dtype).itemsize
            <= _SCRATCH_VMEM_BUDGET)


def resolve_decode_kernel(mode: str, *, cache_len: Optional[int] = None,
                          width: Optional[int] = None,
                          dtype=jnp.bfloat16, beam_size: int = 1) -> str:
    """Map DecoderConfig.decode_kernel to a concrete step implementation.

    "auto" uses the fused Pallas kernel on a single TPU chip and the
    portable XLA path otherwise (CPU tests; sharded multi-chip decode --
    explicit "pallas" is validated for dp-sharded decode too, see
    tests/test_parallel.py, but auto stays conservative until real
    multi-chip TPU hardware has been exercised). When the caller supplies
    cache/width shapes, "auto" additionally falls back to XLA for models the
    kernel cannot tile (width not 128-lane aligned, or a cache too long for
    the VMEM scratch budget) — explicit "pallas" still raises descriptively
    in the kernel wrapper instead of failing opaquely inside Mosaic."""
    if mode == "auto":
        # shard_map path available only when the announced mesh really has
        # a >1-sized data axis (an axis-name mismatch or size-1 axis would
        # otherwise select pallas but skip the shard_map wrap, handing
        # GSPMD an unpartitionable custom call)
        multi_ok = (_DECODE_MESH is not None
                    and _DECODE_MESH.shape.get(_DECODE_AXIS or "data", 1)
                    > 1)
        if jax.default_backend() == "tpu" and (jax.device_count() == 1
                                               or multi_ok):
            if (cache_len is not None and width is not None
                    and not fused_decode_supported(cache_len, width, dtype,
                                                   beam_size)):
                return "xla"
            return "pallas"
        return "xla"
    return mode


def _kernel(pos_ref, *refs,
            K: int, NH: int, S: int, P: int, H: int,
            G: int, R: int, scale: float, precise: bool = True,
            has_prefix: bool = True, folded: bool = False):
    """One grid cell: G images x K beams = R rows of the decode step.

    pos_ref   [1]            SMEM (scalar prefetch): suffix write position
    q_ref     [R, H]         query rows (bf16/f32, model dtype)
    knew_ref  [R, 1, H]      this step's key rows
    vnew_ref  [R, 1, H]      this step's value rows
    anc_ref   [R, S, 1]      int32 local ancestry in [0, K)
    pk_ref    [G, P, H]      shared prefix keys (per image)
    pv_ref    [G, P, H]      shared prefix values
    kc_in/vc_in   [Bk, S, H] full caches in HBM (ANY); S % 8 == 0
    out_ref   [R, H]         attention output rows
    kc_out/vc_out            aliased with kc_in/vc_in
    kvm/vvm   [2, R, S, H]   double-buffered VMEM scratch: cell i computes
                             from slot i%2 while cell i+1's cache rows
                             stream into the other slot

    ``folded=True`` replaces the q/k_new/v_new inputs with the layer's
    pre-projection activations plus its QKV and output-projection weights
    (x_ref [R, H], wqkv_ref [H, 3H], bqkv_ref [1, 3H], wo_ref [H, H],
    bo_ref [1, H]): the projections run on the MXU *inside* the kernel,
    so one decode layer is ONE Pallas call with no XLA compute on the
    critical path between consecutive layer calls — and the cache-load
    DMA overlaps the in-kernel QKV matmul instead of waiting behind an
    XLA boundary. Measured (scripts/bench_fused_qkv.py, v5e): 30.93 ->
    27.72 ms on the 19-step x 12-layer scan, bit-identical outputs; the
    alternative attribution (per-pallas_call launch overhead) was
    refuted by a minimal-kernel A/B (1.3 us/call, not ~60 us).
    """
    if folded:
        (x_ref, anc_ref, pk_ref, pv_ref, wqkv_ref, bqkv_ref, wo_ref,
         bo_ref, kc_in, vc_in, out_ref, kc_out, vc_out,
         kvm, vvm, sems) = refs
    else:
        (q_ref, knew_ref, vnew_ref, anc_ref, pk_ref, pv_ref,
         kc_in, vc_in, out_ref, kc_out, vc_out,
         kvm, vvm, sems) = refs
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

    # folded: the cache load does not depend on the QKV matmul — start it
    # FIRST so the DMA rides under the MXU dot (in the split formulation
    # the load can only start once XLA has finished the projection and
    # entered the custom call)
    @pl.when(cell == 0)
    def _():
        start_load(0, 0)

    load_k = pltpu.make_async_copy(
        kc_in.at[pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])
    load_v = pltpu.make_async_copy(
        vc_in.at[pl.ds(row0, R)], vvm.at[slot], sems.at[slot, 1])

    # precise=True: f32 score products — products of two bf16 values are
    # exact in f32, matching the XLA path's MXU bf16-in/f32-accumulate
    # einsums bit-for-bit. precise=False: bf16 products (each product
    # rounded to bf16 before the f32-accumulating dot) — ~2x less VPU
    # traffic, relative score error <= 2^-8.
    if folded:
        dt = x_ref.dtype
        sdt = jnp.float32 if precise else dt
        # ---- in-kernel QKV projection (MXU) ----
        # numerics match nn.Dense exactly: the f32-accumulated dot is
        # rounded to the module dtype, THEN the (dtype) bias is added —
        # a single rounding either way, bit-identical to XLA's dot + add
        qkv = jax.lax.dot_general(
            x_ref[:], wqkv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [R, 3H] f32
        qkv = qkv.astype(dt) + bqkv_ref[:]                  # [R, 3H] dt
        # NB: slice BEFORE adding the axis — `qkv[:, None, 2*H:]` (newaxis
        # mixed with a bounded slice) leaves JAX's basic-indexing fast path
        # and lowers to a gather, which Mosaic cannot lower (interpret mode
        # never sees Mosaic, so only a real-TPU compile catches it)
        q = qkv[:, :H].astype(sdt)                          # [R, H]
        knew = qkv[:, H:2 * H]                              # [R, H] dt
        knew3 = knew.reshape(R, 1, H)                       # [R, 1, H]
        vnew3 = qkv[:, 2 * H:].reshape(R, 1, H)             # [R, 1, H]
    else:
        dt = q_ref.dtype
        sdt = jnp.float32 if precise else dt
        q = q_ref[:].astype(sdt)                   # [R, H]
        knew = knew_ref[:, 0, :]                   # [R, H]
        knew3 = knew_ref[:]
        vnew3 = vnew_ref[:]

    # Block-diagonal head mask: hmask[d, n] = 1 iff lane d belongs to head n.
    # Per-head reductions become MXU dots against it — no lane slicing.
    hd = H // NH
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, NH), 1)
    hmask = (lane // hd == head).astype(sdt)              # [H, NH]
    hmask_t = (lane // hd == head).astype(jnp.float32).T  # [NH, H]

    def head_sums(prod):
        """[.., H] f32 elementwise products -> per-head sums [.., NH]."""
        nd = prod.ndim - 1
        return jax.lax.dot_general(
            prod, hmask, dimension_numbers=(((nd,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def expand(wpart):
        """[.., NH] head weights -> [.., H] lane-replicated f32 weights.
        Exact: each output is one (bf16-rounded) weight times 1.0."""
        nd = wpart.ndim - 1
        return jax.lax.dot_general(
            wpart.astype(jnp.float32), hmask_t,
            dimension_numbers=(((nd,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # --- self score: q . k_new per head ---------------------------------
    s_self = head_sums(q * knew.astype(sdt)) * scale   # [R, NH]

    # --- prefix scores: per-image prefix broadcast over K beams ---------
    # (has_prefix=False: the decoder has no soft-prompt prefix — e.g. the
    # Transformer caption decoder, whose cross-attention runs separately —
    # and the prefix inputs are 1-token dummies, skipped entirely)
    q4 = q.reshape(G, K, H)
    P8 = -(-P // 8) * 8  # pad the prefix axis so its dots flatten to 2D
    Pe = P8 if has_prefix else 0
    if has_prefix:
        prod_pre = q4[:, :, None, :] * pk_ref[:][:, None].astype(sdt)
        if P8 != P:
            prod_pre = jnp.pad(
                prod_pre, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
        s_pre = head_sums(prod_pre.reshape(R * P8, H)).reshape(
            R, P8, NH) * scale
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, P8, NH), 1)
        s_pre = jnp.where(p_ids < P, s_pre, _NEG_INF)

    def wait_puts(sl):
        # drain a slot's append puts (byte counts match the [R, 8, H]
        # window copies started below; offsets are irrelevant to the wait)
        pltpu.make_async_copy(
            kvm.at[sl, :, pl.ds(0, 8), :],
            kc_out.at[pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 2]).wait()
        pltpu.make_async_copy(
            vvm.at[sl, :, pl.ds(0, 8), :],
            vc_out.at[pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 3]).wait()

    # --- suffix: select each (row, position)'s ancestry candidate ONCE --
    # (K cheap bf16 select passes; scoring/weighting then run single-pass)
    load_k.wait()
    load_v.wait()

    # prefetch the next cell's cache rows while this cell computes
    @pl.when(cell + 1 < ncells)
    def _():
        # the prefetch overwrites kvm/vvm[1-slot], which the previous
        # cell's still-in-flight append put reads from — drain it first
        # (deferred-put scheme: puts are waited here or by the last cell,
        # never by the cell that started them)
        @pl.when(cell >= 1)
        def _():
            wait_puts(1 - slot)
        start_load(cell + 1, 1 - slot)

    anc = anc_ref[:]                                           # [R, S, 1]
    anc4 = anc.reshape(G, K, S, 1)
    kvm4 = kvm[slot].reshape(G, K, S, H)
    k_sel = jnp.zeros((G, K, S, H), dtype=kvm4.dtype)
    for c in range(K):
        k_sel = jnp.where(anc4 == c, kvm4[:, c][:, None], k_sel)
    # flatten to one [R*S, H] x [H, NH] MXU dot (free reshape: S % 8 == 0;
    # a 4D-lhs dot_general loops the leading dims into R tiny dots)
    prod_suf = (q4[:, :, None, :] * k_sel.astype(sdt)).reshape(R * S, H)
    s_suf = head_sums(prod_suf).reshape(R, S, NH) * scale
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (R, S, NH), 1)
    s_suf = jnp.where(s_ids < pos, s_suf, _NEG_INF)

    # --- softmax over [suffix; prefix?; self] ----------------------------
    # suffix first: its weight slice w[:, :S] stays sublane-aligned (the
    # S-at-offset-P slice cost ~4 ms/scan when prefix led the concat)
    parts = [s_suf] + ([s_pre] if has_prefix else []) + [s_self[:, None, :]]
    scores = jnp.concatenate(parts, axis=1)                    # [R, T, NH]
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)     # [R, T, NH]

    # --- weighted values --------------------------------------------------
    if has_prefix:
        pv = pv_ref[:]
        if P8 != P:
            pv = jnp.pad(pv, ((0, 0), (0, P8 - P), (0, 0)))
        w_pre_flat = w[:, S:S + P8].reshape(R * P8, NH)
        acc = jnp.sum(
            expand(w_pre_flat).reshape(G, K, P8, H)
            * pv[:, None].astype(jnp.float32),
            axis=2).reshape(R, H)
    else:
        acc = jnp.zeros((R, H), jnp.float32)

    vvm4 = vvm[slot].reshape(G, K, S, H)
    v_sel = jnp.zeros((G, K, S, H), dtype=vvm4.dtype)
    for c in range(K):
        v_sel = jnp.where(anc4 == c, vvm4[:, c][:, None], v_sel)
    w_suf_flat = w[:, :S].reshape(R * S, NH)
    acc = acc + jnp.sum(
        expand(w_suf_flat).reshape(R, S, H)
        * v_sel.astype(jnp.float32).reshape(R, S, H),
        axis=1)

    acc = acc + jnp.sum(
        expand(w[:, S + Pe:]) * vnew3.astype(jnp.float32), axis=1)
    if folded:
        # ---- in-kernel output projection (MXU), nn.Dense numerics ----
        out = jax.lax.dot_general(
            acc.astype(dt), wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = (out.astype(dt) + bo_ref[:]).astype(out_ref.dtype)
    else:
        out_ref[:] = acc.astype(out_ref.dtype)

    # --- append this step's K/V in place ---------------------------------
    # Mosaic DMA slices on the (tiled) position axis must be 8-aligned, so
    # write the aligned 8-row window containing ``pos``: rows < pos already
    # hold the loaded (correct) cache values, row pos is this step's K/V,
    # rows > pos are dead until a future step overwrites them.
    pos0 = pl.multiple_of((pos // 8) * 8, 8)
    ids = jax.lax.broadcasted_iota(jnp.int32, (R, 8, H), 1)
    at_pos = ids == pos - pos0
    kvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, knew3, kvm[slot, :, pl.ds(pos0, 8), :])
    vvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, vnew3, vvm[slot, :, pl.ds(pos0, 8), :])
    put_k = pltpu.make_async_copy(
        kvm.at[slot, :, pl.ds(pos0, 8), :],
        kc_out.at[pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 2])
    put_v = pltpu.make_async_copy(
        vvm.at[slot, :, pl.ds(pos0, 8), :],
        vc_out.at[pl.ds(row0, R), pl.ds(pos0, 8), :], sems.at[slot, 3])
    put_k.start()
    put_v.start()
    # Deferred drain: the puts must land before this slot's VMEM buffer is
    # reloaded two cells from now (waited by the next cell just before its
    # prefetch overwrites the slot) and before the host sees the aliased
    # caches at kernel end (the last cell drains both slots) — so each
    # cell's append DMA overlaps the next cell's compute instead of
    # blocking its own.
    @pl.when(cell == ncells - 1)
    def _():
        @pl.when(ncells > 1)
        def _():
            wait_puts(1 - slot)
        wait_puts(slot)


def fused_beam_decode_attention(
        q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
        prefix_k: jnp.ndarray, prefix_v: jnp.ndarray,
        anc_local: Optional[jnp.ndarray], pos: jnp.ndarray,
        *, num_heads: int, beam_size: int, scale: float,
        block_images: Optional[int] = None,
        precise: Optional[bool] = None,
        interpret: Optional[bool] = None,
        mesh=None, data_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decode-attention step over all beam rows.

    q/k_new/v_new [Bk, H]; k_cache/v_cache [Bk, S, H] (updated in place at
    suffix position ``pos``; **S must be a multiple of 8** — Mosaic DMA
    slices on the tiled position axis are 8-aligned, so callers allocate the
    cache rounded up and mask positions >= max_length, which the s < pos
    mask already does); prefix_k/v [B, P, H] with B = Bk // beam_size;
    anc_local [Bk, S] int32 in [0, beam_size) (None = identity, e.g. greedy).
    ``prefix_k=None`` runs prefix-free (self-attention only, e.g. the
    Transformer caption decoder whose cross-attention is separate).

    Returns (attention_out [Bk, H], k_cache, v_cache). The returned caches
    alias the inputs — callers must treat the inputs as consumed (standard
    scan-carry usage).
    """
    Bk, H = q.shape
    S = k_cache.shape[1]
    K = beam_size
    B = Bk // K
    has_prefix = prefix_k is not None
    if not has_prefix:
        prefix_k = jnp.zeros((B, 1, H), dtype=k_cache.dtype)
        prefix_v = prefix_k
    P = prefix_k.shape[1]
    NH = num_heads
    if S % 8:
        raise ValueError(f"cache position axis must be 8-aligned, got {S}")
    if precise is None:
        # experiment knob (docs/performance.md bf16-scores verdict):
        # ICT_DECODE_PRECISE=0 runs bf16 score products (each product
        # rounded to bf16 before the f32-accumulating dot) instead of the
        # default exact-f32-product path
        import os as _os

        precise = _os.environ.get("ICT_DECODE_PRECISE", "1") != "0"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % 128 and not interpret:
        # Mosaic-compiled only: the interpreter has no lane tiling, and CPU
        # parity tests run the kernel at tiny widths
        raise ValueError(
            f"fused decode kernel needs a 128-lane-aligned feature axis for "
            f"its HBM cache DMA slices, got width {H}. Use "
            f"decode_kernel='xla' for narrow (test/demo-size) models.")

    if anc_local is None:
        anc = jnp.zeros((Bk, S, 1), dtype=jnp.int32)
    else:
        anc = anc_local.astype(jnp.int32)[:, :, None]

    exec_fn = functools.partial(
        _fused_exec, K=K, NH=NH, scale=scale, precise=precise,
        has_prefix=has_prefix, block_images=block_images,
        interpret=interpret)
    pos_arr = jnp.asarray(pos, dtype=jnp.int32).reshape(1)
    operands = (pos_arr, q, k_new[:, None, :], v_new[:, None, :], anc,
                prefix_k, prefix_v, k_cache, v_cache)

    return shard_data_parallel(exec_fn, operands, batch=B,
                               what="fused decode", replicated=(0,),
                               mesh=mesh, data_axis=data_axis)


def shard_data_parallel(exec_fn, operands, *, batch: int, what: str,
                        replicated=(), batch_axes=None, out_batch_axes=None,
                        mesh=None, data_axis=None):
    """Run a batch-leading kernel launch shard-local per chip when a
    multi-chip ``decode_mesh`` is active (GSPMD cannot partition a pallas
    custom call); single-chip and no-mesh calls go straight through.

    Every operand is sharded on its leading (image-batch) axis except the
    indices in ``replicated`` (e.g. the decode kernel's ``pos`` scalar);
    ``batch_axes`` maps operand index -> the axis carrying the image batch
    when it is not the leading one (the layer-stacked decode caches are
    [L, Bk, S, H] — batch on axis 1); ``out_batch_axes`` does the same for
    output positions (tree leaf order). Output specs derive from
    ``jax.eval_shape``. The grids are image-parallel and all per-image
    state is shard-local, so the shard-local calls need no collectives.
    Shared by the decode kernel, its sibling cross-attention kernel
    (ops/pallas_cross.py), and the whole-stack decode kernel."""
    mesh_ctx = mesh if mesh is not None else _DECODE_MESH
    axis = data_axis or (_DECODE_AXIS or "data")
    if mesh_ctx is None or mesh_ctx.shape.get(axis, 1) <= 1:
        return exec_fn(*operands)
    if batch % mesh_ctx.shape[axis]:
        raise ValueError(
            f"{what} under a {dict(mesh_ctx.shape)} mesh needs the "
            f"image batch ({batch}) divisible by the '{axis}' axis "
            f"({mesh_ctx.shape[axis]}); round the batch up (pad_last) or "
            f"use decode_kernel='xla'.")
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as _P

    batch_axes = batch_axes or {}

    def bspec(nd, ax=0):
        parts = [None] * nd
        parts[ax] = axis
        return _P(*parts)

    in_specs = tuple(
        _P(None) if i in replicated else bspec(op.ndim, batch_axes.get(i, 0))
        for i, op in enumerate(operands))
    outs = jax.eval_shape(exec_fn, *operands)
    leaves, treedef = jax.tree_util.tree_flatten(outs)
    oaxes = out_batch_axes or {}
    out_specs = jax.tree_util.tree_unflatten(treedef, [
        bspec(len(s.shape), oaxes.get(i, 0)) for i, s in enumerate(leaves)])
    return shard_map(exec_fn, mesh=mesh_ctx, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)(*operands)


# Trace-time mesh context: Flax decoder modules can't carry a Mesh (it is
# not config state), so multi-chip call sites wrap their jitted decode in
# ``decode_mesh(mesh)`` — the context is read while jit traces.
_DECODE_MESH = None
_DECODE_AXIS = None


class decode_mesh:
    """Context manager announcing the active device mesh to the fused
    decode kernel (and to ``resolve_decode_kernel``'s "auto"), enabling the
    shard_map fast path on dp-sharded multi-chip decodes."""

    def __init__(self, mesh, data_axis: str = "data"):
        self.mesh, self.axis = mesh, data_axis

    def __enter__(self):
        global _DECODE_MESH, _DECODE_AXIS
        self._prev = (_DECODE_MESH, _DECODE_AXIS)
        _DECODE_MESH, _DECODE_AXIS = self.mesh, self.axis
        return self

    def __exit__(self, *exc):
        global _DECODE_MESH, _DECODE_AXIS
        _DECODE_MESH, _DECODE_AXIS = self._prev
        return False


def _fused_exec(pos_arr, q, k_new3, v_new3, anc, prefix_k, prefix_v,
                k_cache, v_cache, *, K: int, NH: int, scale: float,
                precise: bool, has_prefix: bool,
                block_images: Optional[int], interpret: bool):
    """Shard-local kernel launch: every static (B, S, P, H, grid, VMEM
    block) derives from the (possibly shard-local) operand shapes, so the
    same function serves the single-chip direct call and each shard of the
    multi-chip shard_map."""
    Bk, H = q.shape
    S = k_cache.shape[1]
    P = prefix_k.shape[1]
    B = Bk // K

    itemsize = jnp.dtype(k_cache.dtype).itemsize
    # Double-buffered K+V scratch footprint: 2 slots x 2 caches x R x S x H.
    scratch_bytes_per_row = 4 * S * H * itemsize
    if block_images is None:
        # target ~40 rows per grid cell regardless of beam size: measured,
        # many small cells lose to few large ones (K=1 with 8-image cells
        # ran 29 ms vs 23 ms at 40-row cells on the 19-step scan) — but
        # derive the row count from a VMEM budget so a long cache (S up to
        # gpt2_n_positions) shrinks R instead of overflowing VMEM with an
        # opaque Mosaic error (ADVICE r2)
        rows_fit = max(1, _SCRATCH_VMEM_BUDGET // scratch_bytes_per_row)
        block_images = max(1, min(40, rows_fit) // K)
    G = min(block_images, B)
    while B % G:
        G -= 1
    R = G * K
    if R * scratch_bytes_per_row > _SCRATCH_VMEM_BUDGET:
        # auto-sizing never lands here (rows_fit bounds R); reachable with
        # an explicit block_images, or G == 1 when even one image's K beam
        # rows overflow — raise descriptively either way instead of dying
        # inside Mosaic
        raise ValueError(
            f"fused decode kernel cannot fit the beam block in "
            f"VMEM: 2x double-buffered K/V scratch needs "
            f"{R * scratch_bytes_per_row / 2**20:.1f} MiB for R={R} rows x "
            f"S={S} cache positions x H={H} ({k_cache.dtype}) against a "
            f"{_SCRATCH_VMEM_BUDGET / 2**20:.0f} MiB budget. Use a smaller "
            f"block_images, a shorter max_length, or decode_kernel='xla'.")

    kernel = functools.partial(
        _kernel, K=K, NH=NH, S=S, P=P, H=H, G=G, R=R, scale=scale,
        precise=precise, has_prefix=has_prefix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((R, 1, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # k_new
            pl.BlockSpec((R, 1, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # v_new
            pl.BlockSpec((R, S, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # anc
            pl.BlockSpec((G, P, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # prefix_k
            pl.BlockSpec((G, P, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # prefix_v
            pl.BlockSpec(memory_space=pl.ANY),           # k_cache
            pl.BlockSpec(memory_space=pl.ANY),           # v_cache
        ],
        out_specs=[
            pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # out
            pl.BlockSpec(memory_space=pl.ANY),           # k_cache (alias)
            pl.BlockSpec(memory_space=pl.ANY),           # v_cache (alias)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S, H), k_cache.dtype),
            pltpu.VMEM((2, R, S, H), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs are indexed with the scalar-prefetch operand first:
        # 0=pos, 1=q, 2=k_new, 3=v_new, 4=anc, 5=pk, 6=pv, 7=kc, 8=vc
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos_arr, q, k_new3, v_new3, anc, prefix_k, prefix_v,
      k_cache, v_cache)
    return out, k_cache, v_cache


# Total VMEM envelope for the folded variant: double-buffered K/V scratch
# PLUS the double-buffered weight/pipeline blocks. XLA's default *scoped*
# vmem limit is 16 MiB, but that is a compiler allowance, not the
# hardware: the v5e core has >96 MiB of physical VMEM (probed empirically
# — a 96 MiB scratch kernel compiles and runs), so the folded call raises
# ``vmem_limit_bytes`` to this budget + margin. 24 MiB keeps the
# measured-fastest flagship geometry (H=768, S=24, R=40 ≈ 16.6 MiB total
# once the lane-padded anc block and prefix blocks are counted) while
# leaving XLA most of VMEM for the surrounding program.
_FOLDED_VMEM_BUDGET = 24 * 1024 * 1024
_FOLDED_VMEM_MARGIN = 2 * 1024 * 1024  # Mosaic internal scratch, semaphores


def _folded_vmem_bytes(rows: int, images: int, S: int, H: int, P: int,
                       itemsize: int) -> Tuple[int, int]:
    """(fixed, per-call-variable) VMEM footprint of the folded kernel, in
    bytes, counting EVERYTHING Mosaic allocates — not just the explicit
    scratch. The double-buffered pipeline blocks matter: the int32 anc
    block is lane-padded 1 -> 128 (~0.94 MiB at R=40/S=24 alone); biases
    are sublane-padded 1 -> 8. Under-counting these is exactly how the
    first on-chip compile blew the scoped limit by 336 KiB."""
    P8 = -(-P // 8) * 8
    fixed = (8 * H * H * itemsize       # wqkv [H,3H] + wo [H,H], 2-buffered
             + 64 * H * itemsize)       # bqkv + bo, sublane-padded, 2-buf
    variable = (rows * (4 * S * H * itemsize   # K/V scratch [2,R,S,H] x2
                        + 4 * H * itemsize     # x + out blocks, 2-buffered
                        + 2 * S * 128 * 4)     # anc [R,S,1->128 lanes] int32
                + images * 4 * P8 * H * itemsize)  # prefix k+v, 2-buffered
    return fixed, variable


def fused_decode_qkv_supported(cache_len: int, width: int,
                               dtype=jnp.bfloat16,
                               beam_size: int = 1,
                               prefix_len: int = 64) -> bool:
    """Whether the folded (in-kernel QKV/out-projection) decode kernel fits:
    the base kernel's Mosaic constraints, plus at least ONE image's beam
    block of double-buffered scratch/pipeline blocks AND the [H, 3H] +
    [H, H] weight blocks inside the (raised) VMEM envelope.
    ``prefix_len`` is a conservative default upper bound for callers that
    gate before the prefix length is known."""
    itemsize = jnp.dtype(dtype).itemsize
    fixed, variable = _folded_vmem_bytes(
        beam_size, 1, cache_len, width, prefix_len, itemsize)
    return (fused_decode_supported(cache_len, width, dtype, beam_size)
            and fixed + variable <= _FOLDED_VMEM_BUDGET)


def fused_beam_decode_attention_qkv(
        x: jnp.ndarray, wqkv: jnp.ndarray, bqkv: jnp.ndarray,
        wo: jnp.ndarray, bo: jnp.ndarray,
        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
        prefix_k: Optional[jnp.ndarray], prefix_v: Optional[jnp.ndarray],
        anc_local: Optional[jnp.ndarray], pos: jnp.ndarray,
        *, num_heads: int, beam_size: int, scale: float,
        block_images: Optional[int] = None,
        precise: Optional[bool] = None,
        interpret: Optional[bool] = None,
        mesh=None, data_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fully-folded decode-attention layer step: in-kernel QKV
    projection (x [Bk, H] x wqkv [H, 3H] + bqkv), the fused beam attention
    of :func:`fused_beam_decode_attention`, and the in-kernel output
    projection (wo [H, H] + bo) — ONE Pallas call per layer, no XLA
    compute on the critical path between consecutive layer calls.

    Numerics are bit-identical to ``nn.Dense(3H)(x)`` -> split kernel ->
    ``nn.Dense(H)(out)`` (tests/test_pallas_decode.py; measured 0.0 abs
    diff on the v5e chip, scripts/bench_fused_qkv.py). Returns
    (projected_out [Bk, H], k_cache, v_cache) with the caches aliased to
    the inputs, same contract as the split kernel."""
    Bk, H = x.shape
    S = k_cache.shape[1]
    K = beam_size
    B = Bk // K
    has_prefix = prefix_k is not None
    if not has_prefix:
        prefix_k = jnp.zeros((B, 1, H), dtype=k_cache.dtype)
        prefix_v = prefix_k
    if S % 8:
        raise ValueError(f"cache position axis must be 8-aligned, got {S}")
    if precise is None:
        import os as _os

        precise = _os.environ.get("ICT_DECODE_PRECISE", "1") != "0"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % 128 and not interpret:
        raise ValueError(
            f"folded decode kernel needs a 128-lane-aligned feature axis, "
            f"got width {H}. Use the split kernel or decode_kernel='xla'.")

    if anc_local is None:
        anc = jnp.zeros((Bk, S, 1), dtype=jnp.int32)
    else:
        anc = anc_local.astype(jnp.int32)[:, :, None]

    exec_fn = functools.partial(
        _folded_exec, K=K, NH=num_heads, scale=scale, precise=precise,
        has_prefix=has_prefix, block_images=block_images,
        interpret=interpret)
    pos_arr = jnp.asarray(pos, dtype=jnp.int32).reshape(1)
    operands = (pos_arr, x, anc, prefix_k, prefix_v,
                wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
                k_cache, v_cache)

    # weights (operands 5-8) are replicated across the data mesh, like pos
    return shard_data_parallel(exec_fn, operands, batch=B,
                               what="folded fused decode",
                               replicated=(0, 5, 6, 7, 8),
                               mesh=mesh, data_axis=data_axis)


def _folded_exec(pos_arr, x, anc, prefix_k, prefix_v, wqkv, bqkv, wo, bo,
                 k_cache, v_cache, *, K: int, NH: int, scale: float,
                 precise: bool, has_prefix: bool,
                 block_images: Optional[int], interpret: bool):
    """Shard-local folded kernel launch (see ``_fused_exec``): grid and
    VMEM geometry derive from the shard-local shapes, with the weight
    blocks' footprint subtracted from the scratch budget."""
    Bk, H = x.shape
    S = k_cache.shape[1]
    P = prefix_k.shape[1]
    B = Bk // K

    itemsize = jnp.dtype(k_cache.dtype).itemsize
    if block_images is None:
        fixed, per_beamrow = _folded_vmem_bytes(1, 0, S, H, P, itemsize)
        per_image = K * per_beamrow + _folded_vmem_bytes(
            0, 1, S, H, P, itemsize)[1]
        avail = _FOLDED_VMEM_BUDGET - fixed
        rows_fit = max(1, (avail // per_image) * K)
        block_images = max(1, min(40, rows_fit) // K)
    G = min(block_images, B)
    while B % G:
        G -= 1
    R = G * K
    fixed, variable = _folded_vmem_bytes(R, G, S, H, P, itemsize)
    if fixed + variable > _FOLDED_VMEM_BUDGET:
        raise ValueError(
            f"folded decode kernel cannot fit the beam block + weights in "
            f"VMEM: {variable / 2**20:.1f} MiB scratch/pipeline blocks "
            f"(R={R} x S={S} x H={H}, P={P}) + "
            f"{fixed / 2**20:.1f} MiB weight blocks against a "
            f"{_FOLDED_VMEM_BUDGET / 2**20:.0f} MiB budget. Use the split "
            f"kernel (fused_beam_decode_attention) or decode_kernel='xla'.")

    kernel = functools.partial(
        _kernel, K=K, NH=NH, S=S, P=P, H=H, G=G, R=R, scale=scale,
        precise=precise, has_prefix=has_prefix, folded=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((R, S, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # anc
            pl.BlockSpec((G, P, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # prefix_k
            pl.BlockSpec((G, P, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # prefix_v
            # constant index maps: Mosaic's pipeline loads the weight
            # blocks once per call and skips the re-fetch on later cells
            pl.BlockSpec((H, 3 * H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # wqkv
            pl.BlockSpec((1, 3 * H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # bqkv
            pl.BlockSpec((H, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # wo
            pl.BlockSpec((1, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),          # bo
            pl.BlockSpec(memory_space=pl.ANY),           # k_cache
            pl.BlockSpec(memory_space=pl.ANY),           # v_cache
        ],
        out_specs=[
            pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),          # out
            pl.BlockSpec(memory_space=pl.ANY),           # k_cache (alias)
            pl.BlockSpec(memory_space=pl.ANY),           # v_cache (alias)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S, H), k_cache.dtype),
            pltpu.VMEM((2, R, S, H), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # with the scalar-prefetch operand first:
        # 0=pos, 1=x, 2=anc, 3=pk, 4=pv, 5=wqkv, 6=bqkv, 7=wo, 8=bo,
        # 9=kc, 10=vc
        input_output_aliases={9: 1, 10: 2},
        # XLA's default scoped-vmem allowance is 16 MiB; the chip has
        # >96 MiB physical (probed). Raise the scope so the weight blocks
        # ride alongside the full-width beam scratch.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_FOLDED_VMEM_BUDGET + _FOLDED_VMEM_MARGIN),
        interpret=interpret,
    )(pos_arr, x, anc, prefix_k, prefix_v, wqkv, bqkv, wo, bo,
      k_cache, v_cache)
    return out, k_cache, v_cache


def reference_beam_decode_attention(
        q, k_new, v_new, k_cache, v_cache, prefix_k, prefix_v,
        anc_local, pos, *, num_heads: int, beam_size: int, scale: float):
    """Pure-jnp oracle for the kernel (same dtype discipline); test-only."""
    Bk, H = q.shape
    S = k_cache.shape[1]
    NH = num_heads
    hd = H // NH
    K = beam_size
    B = Bk // K
    if prefix_k is None:
        prefix_k = jnp.zeros((B, 0, H), dtype=k_cache.dtype)
        prefix_v = prefix_k
    P = prefix_k.shape[1]
    if anc_local is None:
        anc_local = jnp.zeros((Bk, S), dtype=jnp.int32)

    qh = q.reshape(Bk, NH, hd).astype(jnp.float32)
    kh_new = k_new.reshape(Bk, NH, hd).astype(jnp.float32)
    s_self = (qh * kh_new).sum(-1) * scale                     # [Bk, NH]

    pkh = prefix_k.reshape(B, P, NH, hd).astype(jnp.float32)
    qg = qh.reshape(B, K, NH, hd)
    s_pre = jnp.einsum("bqnd,bpnd->bqpn", qg, pkh).reshape(
        Bk, P, NH) * scale

    kcb = k_cache.reshape(B, K, S, NH, hd).astype(jnp.float32)
    s_all = jnp.einsum("bqnd,bcsnd->bqcsn", qg, kcb)           # [B,K,K,S,NH]
    onehot = (anc_local.reshape(B, K, 1, S)
              == jnp.arange(K)[None, None, :, None])
    s_suf = jnp.where(onehot[..., None], s_all, 0.0).sum(axis=2)
    s_suf = s_suf.reshape(Bk, S, NH) * scale
    s_suf = jnp.where(
        (jnp.arange(S) < pos)[None, :, None], s_suf, _NEG_INF)

    scores = jnp.concatenate(
        [s_pre, s_suf, s_self[:, None, :]], axis=1)
    w = jax.nn.softmax(scores, axis=1)

    dt = v_cache.dtype
    pvh = prefix_v.reshape(B, P, NH, hd)
    w_pre = w[:, :P].astype(dt).reshape(B, K, P, NH)
    out = jnp.einsum("bqpn,bpnd->bqnd", w_pre.astype(jnp.float32),
                     pvh.astype(jnp.float32)).reshape(Bk, NH, hd)
    vcb = v_cache.reshape(B, K, S, NH, hd)
    w_suf = w[:, P:P + S].astype(dt).reshape(B, K, S, NH)
    w_sel = jnp.where(onehot[..., None], w_suf[:, :, None], 0.0)  # [B,K,K,S,NH]
    out = out + jnp.einsum(
        "bqcsn,bcsnd->bqnd", w_sel.astype(jnp.float32),
        vcb.astype(jnp.float32)).reshape(Bk, NH, hd)
    vh_new = v_new.reshape(Bk, NH, hd)
    out = out + (w[:, P + S:].astype(dt).astype(jnp.float32).transpose(0, 2, 1)
                 * vh_new.astype(jnp.float32))
    out = out.reshape(Bk, H).astype(q.dtype)

    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new[:, None, :], pos, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new[:, None, :], pos, axis=1)
    return out, k_cache, v_cache


# ---------------------------------------------------------------------------
# Whole-stack fold: ALL decoder layers in ONE pallas_call per decode step
# ---------------------------------------------------------------------------
#
# Round 5's QKV/out-proj fold proved the fused scan's residual fixed cost
# was XLA<->Mosaic boundary serialization (scripts/bench_fused_qkv.py:
# 1.3 us/call launch floor, -3.2 ms from removing the per-layer QKV
# boundary). One boundary per layer remained: the MLP + layernorms ran in
# XLA between consecutive layer calls, so layer li+1's cache-load DMA
# waited on layer li's MLP. This section folds the ENTIRE decoder layer
# (LN1 -> QKV -> beam attention -> out-proj -> residual -> LN2 -> MLP ->
# residual) into the kernel and runs all L layers as ONE pallas_call per
# decode step: grid (layer, image-block), the residual stream carried
# across layers in a VMEM scratch buffer, per-layer weights as pipelined
# blocks (Mosaic prefetches layer li+1's weights while li computes), and
# the per-layer KV caches stacked [L, Bk, S, H] in HBM with in-place
# appends. Measured on the chained 19-step x 12-layer flagship scan
# (scripts/bench_layer_fold.py, v5e): 34.18 ms (per-layer folded-QKV
# production path) -> 30.04 ms at 160-row grid cells, with the per-layer
# full fold (variant E, one call per complete layer) REJECTED at 46.6 ms
# — at 40-row cells the in-kernel MLP starves the MXU (M=40 uses < 1/3 of
# the 128-row systolic dim); the whole-stack form wins because bigger
# cells fix the MXU geometry while weight prefetch + zero boundaries keep
# the DMA pipeline full.
#
# In-kernel numerics are bit-exact against the XLA modules under jit on
# CPU: LayerNorm reproduces flax._normalize exactly (f32 stats, fast
# variance with the negative clip, scale folded into the rsqrt multiplier
# BEFORE the elementwise multiply), and the MLP follows nn.Dense's
# rounding (f32-accumulated dot rounded to the module dtype, then the
# dtype bias added) with jax.nn.gelu(approximate=True) between.

_STACK_VMEM_BUDGET = 68 * 1024 * 1024
_STACK_VMEM_MARGIN = 4 * 1024 * 1024
# measured optimum grid-cell height for the whole-stack kernel (chip
# sweep: 40 rows 32.4 ms, 80 rows 39.4 ms, 160 rows 30.0 ms)
_STACK_TARGET_ROWS = 160


def _stack_fold_enabled() -> bool:
    """Experiment knob: ICT_DECODE_STACK=0 reverts the GPT-2 pallas decode
    path to per-layer folded-QKV calls (the round-5 production path) for
    A/B runs."""
    import os

    return os.environ.get("ICT_DECODE_STACK", "1") != "0"


def _stack_vmem_bytes(rows: int, images: int, S: int, H: int, P: int,
                      itemsize: int) -> Tuple[int, int]:
    """(fixed, variable) VMEM footprint of the whole-stack kernel,
    counting everything Mosaic allocates (same discipline as
    ``_folded_vmem_bytes``): double-buffered weight pipeline blocks
    (wqkv [H,3H] + wo [H,H] + wfc [H,4H] + wproj [4H,H] = 12 H^2), the
    sublane-padded bias/LN blocks, the K/V scratch, the lane-padded anc
    block, x/out blocks, and the prefix blocks. The [Bk, H] residual
    carry is charged to the variable term via ``rows`` (it scales with
    the full batch, bounded by rows * ncells; callers pass total rows
    for it separately if needed — at flagship scale it is < 1 MiB)."""
    P8 = -(-P // 8) * 8
    fixed = (24 * H * H * itemsize        # 12 H^2 weight params, 2-buffered
             + 2 * 8 * 13 * H * itemsize)  # 8 bias/LN rows, sublane-padded
    variable = (rows * (4 * S * H * itemsize    # K/V scratch [2,R,S,H] x2
                        + 4 * H * itemsize      # x + out blocks, 2-buffered
                        + 2 * S * 128 * 4       # anc [R,S,1->128] int32 x2
                        + H * itemsize)         # residual-carry share
                + images * 4 * P8 * H * itemsize)  # prefix k+v, 2-buffered
    return fixed, variable


def fused_decode_stack_supported(cache_len: int, width: int,
                                 dtype=jnp.bfloat16,
                                 beam_size: int = 8,
                                 prefix_len: int = 64) -> bool:
    """Whether the whole-stack kernel fits this decoder: the base kernel's
    Mosaic constraints plus one image's beam block of scratch/pipeline
    blocks AND the four weight matrices inside the raised VMEM envelope.
    ``beam_size``/``prefix_len`` default to conservative upper bounds for
    callers that gate at ``init_cache`` time, before the real values are
    known."""
    itemsize = jnp.dtype(dtype).itemsize
    fixed, variable = _stack_vmem_bytes(
        beam_size, 1, cache_len, width, prefix_len, itemsize)
    return (width % 128 == 0 and cache_len % 8 == 0
            and fixed + variable <= _STACK_VMEM_BUDGET)


STACK_WEIGHT_KEYS = ("wqkv", "bqkv", "wo", "bo", "g1", "b1", "g2", "b2",
                     "wfc", "bfc", "wpj", "bpj")


def _stack_ln(x, gamma, beta, eps):
    """flax.linen.LayerNorm(dtype=bf16) bit-exact (``_compute_stats`` /
    ``_normalize`` with force_float32_reductions and fast variance): f32
    stats with the negative-variance clip, scale folded into the rsqrt
    multiplier before the elementwise multiply, result cast back."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    return ((xf - mu) * mul + beta.astype(jnp.float32)).astype(x.dtype)


def _stack_kernel(pos_ref, x_ref, anc_ref, pk_ref, pv_ref,
                  wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g1_ref, b1_ref, g2_ref, b2_ref,
                  wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                  kc_in, vc_in, out_ref, kc_out, vc_out,
                  kvm, vvm, xbuf, sems,
                  *, K: int, NH: int, S: int, P: int, H: int,
                  G: int, R: int, L: int, scale: float, eps: float,
                  precise: bool):
    """Grid (L, NC) cell: layer ``li`` on image block ``g``. The residual
    stream is carried across layers in ``xbuf`` (written by (li-1, g),
    read by (li, g) — grid cells execute sequentially); weights arrive as
    pipelined blocks with per-layer index maps; caches are stacked
    [L, Bk, S, H] HBM refs, input/output aliased, appended in place via
    the same deferred-put scheme as ``_kernel``."""
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

    # start the cache load FIRST: it depends on nothing computed in this
    # cell, so the DMA rides under the LN + QKV matmul
    @pl.when(c == 0)
    def _():
        start_load(0, 0)

    load_k = pltpu.make_async_copy(
        kc_in.at[li, pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])
    load_v = pltpu.make_async_copy(
        vc_in.at[li, pl.ds(row0, R)], vvm.at[slot], sems.at[slot, 1])

    # layer 0 reads the step input block; later layers read the carry
    x = jnp.where(li == 0, x_ref[:], xbuf[pl.ds(row0, R), :])   # [R, H]
    dt = x.dtype
    sdt = jnp.float32 if precise else dt
    h = _stack_ln(x, g1_ref[0, 0], b1_ref[0, 0], eps)
    # in-kernel QKV projection (MXU), nn.Dense-exact: f32-accumulated dot
    # rounded to the module dtype, THEN the dtype bias added. NB: slice
    # BEFORE adding axes — newaxis mixed with a bounded slice lowers to a
    # gather Mosaic rejects (round-5 on-chip-only defect).
    qkv = jax.lax.dot_general(
        h, wqkv_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.astype(dt) + bqkv_ref[0]                          # [R, 3H]
    q = qkv[:, :H].astype(sdt)
    knew = qkv[:, H:2 * H]
    vnew = qkv[:, 2 * H:]

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

    s_self = head_sums(q * knew.astype(sdt)) * scale            # [R, NH]

    q4 = q.reshape(G, K, H)
    P8 = -(-P // 8) * 8
    prod_pre = q4[:, :, None, :] * pk_ref[:][:, None].astype(sdt)
    if P8 != P:
        prod_pre = jnp.pad(prod_pre, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
    s_pre = head_sums(prod_pre.reshape(R * P8, H)).reshape(
        R, P8, NH) * scale
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, P8, NH), 1)
    s_pre = jnp.where(p_ids < P, s_pre, _NEG_INF)

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

    anc4 = anc_ref[:].reshape(G, K, S, 1)
    kvm4 = kvm[slot].reshape(G, K, S, H)
    k_sel = jnp.zeros((G, K, S, H), dtype=kvm4.dtype)
    for cand in range(K):
        k_sel = jnp.where(anc4 == cand, kvm4[:, cand][:, None], k_sel)
    prod_suf = (q4[:, :, None, :] * k_sel.astype(sdt)).reshape(R * S, H)
    s_suf = head_sums(prod_suf).reshape(R, S, NH) * scale
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (R, S, NH), 1)
    s_suf = jnp.where(s_ids < pos, s_suf, _NEG_INF)

    # suffix first: its weight slice stays sublane-aligned (see _kernel)
    scores = jnp.concatenate([s_suf, s_pre, s_self[:, None, :]], axis=1)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)      # [R, T, NH]

    pvp = pv_ref[:]
    if P8 != P:
        pvp = jnp.pad(pvp, ((0, 0), (0, P8 - P), (0, 0)))
    w_pre_flat = w[:, S:S + P8].reshape(R * P8, NH)
    acc = jnp.sum(
        expand(w_pre_flat).reshape(G, K, P8, H)
        * pvp[:, None].astype(jnp.float32), axis=2).reshape(R, H)

    vvm4 = vvm[slot].reshape(G, K, S, H)
    v_sel = jnp.zeros((G, K, S, H), dtype=vvm4.dtype)
    for cand in range(K):
        v_sel = jnp.where(anc4 == cand, vvm4[:, cand][:, None], v_sel)
    w_suf_flat = w[:, :S].reshape(R * S, NH)
    acc = acc + jnp.sum(
        expand(w_suf_flat).reshape(R, S, H)
        * v_sel.astype(jnp.float32).reshape(R, S, H), axis=1)

    acc = acc + jnp.sum(
        expand(w[:, S + P8:]) * vnew[:, None].astype(jnp.float32), axis=1)

    # out-projection + residual + LN2 + MLP + residual, all in-kernel
    att = jax.lax.dot_general(
        acc.astype(dt), wo_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bo_ref[0]
    x1 = x + att
    h2 = _stack_ln(x1, g2_ref[0, 0], b2_ref[0, 0], eps)
    y = jax.lax.dot_general(
        h2, wfc_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bfc_ref[0]
    ygelu = jax.nn.gelu(y, approximate=True)  # HF gelu_new
    mlp = jax.lax.dot_general(
        ygelu, wpj_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt) + bpj_ref[0]
    xo = x1 + mlp
    xbuf[pl.ds(row0, R), :] = xo
    # the out block is revisited once per layer; each write fully
    # overwrites it and the last (li = L-1) lands last, so the flushed
    # HBM row is the final hidden state
    out_ref[:] = xo

    # append this step's K/V in place (deferred-put scheme, see _kernel)
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


def fused_beam_decode_stack(
        x: jnp.ndarray, stack: dict,
        k_caches: jnp.ndarray, v_caches: jnp.ndarray,
        prefix_k: jnp.ndarray, prefix_v: jnp.ndarray,
        anc_local: Optional[jnp.ndarray], pos: jnp.ndarray,
        *, num_heads: int, beam_size: int, scale: float,
        ln_eps: float = 1e-5,
        block_images: Optional[int] = None,
        precise: Optional[bool] = None,
        interpret: Optional[bool] = None,
        mesh=None, data_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ALL decoder layers of one decode step as ONE Pallas call.

    x [Bk, H] is the post-embedding residual stream; ``stack`` holds the
    layer-stacked weights (``STACK_WEIGHT_KEYS``: wqkv [L,H,3H], bqkv
    [L,3H], wo [L,H,H], bo [L,H], ln1/ln2 scale+bias g1/b1/g2/b2 [L,H],
    wfc [L,H,4H], bfc [L,4H], wpj [L,4H,H], bpj [L,H]); k_caches/v_caches
    [L, Bk, S, H] are updated in place (S % 8 == 0); prefix_k/v
    [L, B, P, H] are the per-layer shared prefix K/V. Returns
    (hidden [Bk, H] — the final layer's residual stream, pre-ln_f —
    k_caches, v_caches) with the caches aliased to the inputs.

    Replaces the per-layer loop over
    :func:`fused_beam_decode_attention_qkv` + XLA LN/MLP: measured
    -4.1 ms on the flagship 19x12 scan (34.18 -> 30.04 ms,
    scripts/bench_layer_fold.py on v5e), from removing the remaining
    per-layer XLA<->Mosaic boundary, prefetching layer li+1's weights
    during li's compute, and 160-row grid cells that keep the in-kernel
    MLP matmuls on full MXU tiles."""
    Bk, H = x.shape
    L, _, S, _ = k_caches.shape
    P = prefix_k.shape[2]
    K = beam_size
    B = Bk // K
    if S % 8:
        raise ValueError(f"cache position axis must be 8-aligned, got {S}")
    if precise is None:
        import os as _os

        precise = _os.environ.get("ICT_DECODE_PRECISE", "1") != "0"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % 128 and not interpret:
        raise ValueError(
            f"whole-stack decode kernel needs a 128-lane-aligned feature "
            f"axis, got width {H}. Use decode_kernel='xla' or the "
            f"per-layer kernels for narrow models.")

    if anc_local is None:
        anc = jnp.zeros((Bk, S, 1), dtype=jnp.int32)
    else:
        anc = anc_local.astype(jnp.int32)[:, :, None]

    exec_fn = functools.partial(
        _stack_exec, K=K, NH=num_heads, scale=scale, eps=ln_eps,
        precise=precise, block_images=block_images, interpret=interpret)
    pos_arr = jnp.asarray(pos, dtype=jnp.int32).reshape(1)
    operands = (pos_arr, x, anc, prefix_k, prefix_v,
                *(stack[k] for k in STACK_WEIGHT_KEYS),
                k_caches, v_caches)

    # weights (operands 5-16) replicate across the data mesh; the stacked
    # caches and per-layer prefixes carry the image batch on axis 1
    return shard_data_parallel(
        exec_fn, operands, batch=B, what="whole-stack fused decode",
        replicated=tuple([0] + list(range(5, 17))),
        batch_axes={3: 1, 4: 1, 17: 1, 18: 1},
        out_batch_axes={1: 1, 2: 1},
        mesh=mesh, data_axis=data_axis)


def _stack_exec(pos_arr, x, anc, prefix_k, prefix_v,
                wqkv, bqkv, wo, bo, g1, b1, g2, b2, wfc, bfc, wpj, bpj,
                k_caches, v_caches, *, K: int, NH: int, scale: float,
                eps: float, precise: bool, block_images: Optional[int],
                interpret: bool):
    """Shard-local whole-stack launch: geometry derives from the
    (possibly shard-local) shapes; the prefix is flattened to
    [L*B, P, H] here so the shard_map wrapper can shard its batch axis
    while the kernel's block index stays a plain 3D map."""
    Bk, H = x.shape
    L, _, S, _ = k_caches.shape
    P = prefix_k.shape[2]
    B = Bk // K

    itemsize = jnp.dtype(k_caches.dtype).itemsize
    if block_images is None:
        fixed, per_beamrow = _stack_vmem_bytes(1, 0, S, H, P, itemsize)
        per_image = K * per_beamrow + _stack_vmem_bytes(
            0, 1, S, H, P, itemsize)[1]
        avail = _STACK_VMEM_BUDGET - fixed
        rows_fit = max(1, (avail // per_image) * K)
        block_images = max(1, min(_STACK_TARGET_ROWS, rows_fit) // K)
    G = min(block_images, B)
    while B % G:
        G -= 1
    R = G * K
    fixed, variable = _stack_vmem_bytes(R, G, S, H, P, itemsize)
    if fixed + variable > _STACK_VMEM_BUDGET:
        raise ValueError(
            f"whole-stack decode kernel cannot fit the beam block + "
            f"weights in VMEM: {variable / 2**20:.1f} MiB scratch/pipeline "
            f"blocks (R={R} x S={S} x H={H}, P={P}) + {fixed / 2**20:.1f} "
            f"MiB weight blocks against a {_STACK_VMEM_BUDGET / 2**20:.0f} "
            f"MiB budget. Use the per-layer kernels "
            f"(ICT_DECODE_STACK=0) or decode_kernel='xla'.")
    NCI = B // G

    kernel = functools.partial(
        _stack_kernel, K=K, NH=NH, S=S, P=P, H=H, G=G, R=R, L=L,
        scale=scale, eps=eps, precise=precise)

    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, (lambda li, g, *_: (li,) + (0,) * len(shape)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NCI),
        in_specs=[
            pl.BlockSpec((R, H), lambda li, g, *_: (g, 0),
                         memory_space=pltpu.VMEM),              # x
            pl.BlockSpec((R, S, 1), lambda li, g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),              # anc
            # prefix K/V flattened [L*B, P, H]: block index li*NCI + g
            pl.BlockSpec((G, P, H), lambda li, g, *_: (li * NCI + g, 0, 0),
                         memory_space=pltpu.VMEM),              # prefix_k
            pl.BlockSpec((G, P, H), lambda li, g, *_: (li * NCI + g, 0, 0),
                         memory_space=pltpu.VMEM),              # prefix_v
            wspec((H, 3 * H)), wspec((1, 3 * H)),               # wqkv, bqkv
            wspec((H, H)), wspec((1, H)),                       # wo, bo
            wspec((1, H)), wspec((1, H)),                       # ln1 g/b
            wspec((1, H)), wspec((1, H)),                       # ln2 g/b
            wspec((H, 4 * H)), wspec((1, 4 * H)),               # wfc, bfc
            wspec((4 * H, H)), wspec((1, H)),                   # wpj, bpj
            pl.BlockSpec(memory_space=pl.ANY),               # k_caches
            pl.BlockSpec(memory_space=pl.ANY),               # v_caches
        ],
        out_specs=[
            pl.BlockSpec((R, H), lambda li, g, *_: (g, 0),
                         memory_space=pltpu.VMEM),              # hidden
            pl.BlockSpec(memory_space=pl.ANY),               # k_caches
            pl.BlockSpec(memory_space=pl.ANY),               # v_caches
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S, H), k_caches.dtype),
            pltpu.VMEM((2, R, S, H), v_caches.dtype),
            pltpu.VMEM((Bk, H), x.dtype),                    # residual carry
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    out, k_caches, v_caches = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H), x.dtype),
            jax.ShapeDtypeStruct(k_caches.shape, k_caches.dtype),
            jax.ShapeDtypeStruct(v_caches.shape, v_caches.dtype),
        ],
        # with the scalar-prefetch operand first: 0=pos, 1=x, 2=anc,
        # 3=pk, 4=pv, 5..16=weights, 17=kc, 18=vc
        input_output_aliases={17: 1, 18: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_STACK_VMEM_BUDGET + _STACK_VMEM_MARGIN),
        interpret=interpret,
    )(pos_arr, x, anc,
      prefix_k.reshape(L * B, P, H), prefix_v.reshape(L * B, P, H),
      wqkv, bqkv.reshape(L, 1, -1), wo, bo.reshape(L, 1, -1),
      g1.reshape(L, 1, -1), b1.reshape(L, 1, -1),
      g2.reshape(L, 1, -1), b2.reshape(L, 1, -1),
      wfc, bfc.reshape(L, 1, -1), wpj, bpj.reshape(L, 1, -1),
      k_caches, v_caches)
    return out, k_caches, v_caches
