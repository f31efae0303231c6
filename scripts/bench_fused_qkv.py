"""QKV/out-proj fold experiment + launch-overhead floor (VERDICT r4 task 4).

The round-4 roofline left the fused cache scan at 39% of its HBM floor and
attributed the gap to ~60 us/call of fixed cost across 228 sequential
pallas_calls; the KV-merge lever (descriptor count) was measured and
rejected. This script runs the two remaining experiments the verdict asked
for, on the SAME chained 19-step x 12-layer scan harness as
scripts/bench_kv_merge.py:

* **B: fold the attention-adjacent matmuls into the kernel.** One Pallas
  call per layer computes QKV projection (one [R,H]x[H,3H] MXU dot),
  the full fused beam attention (cache load/select/score/mix/append), and
  the output projection ([R,H]x[H,H]) — no XLA compute on the critical
  path between consecutive layer calls, and the cache-load DMA overlaps
  the in-kernel QKV matmul instead of waiting behind an XLA boundary.
* **C/D: minimal-kernel launch floor.** C replaces the fused kernel with a
  body that only copies its [R,H] input block to the output block (same
  grid, no HBM cache traffic); D removes the pallas_call entirely (pure
  XLA matmul scan). (C - D) / 228 is the per-call fixed cost Mosaic
  cannot remove by shrinking kernel work — the direct test of the
  "launch overhead" attribution.

Run on the chip:  python scripts/bench_fused_qkv.py       (flagship shapes)
CPU parity only:  JAX_PLATFORMS=cpu python scripts/bench_fused_qkv.py --tiny

A-side (production kernel with XLA-side matmuls) must land in the known
~33 ms band; parity between A and B is checked before timing.
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
    _NEG_INF, fused_beam_decode_attention)

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


def _folded_kernel(pos_ref, x_ref, anc_ref, pk_ref, pv_ref, wqkv_ref, wo_ref,
                   kc_in, vc_in, out_ref, kc_out, vc_out, kvm, vvm, sems,
                   *, K, NH, S, P, H, G, R, scale):
    """One grid cell: in-kernel QKV projection -> fused beam attention
    (identical math to ops/pallas_decode._kernel, precise=True,
    has_prefix=True) -> in-kernel output projection. The weight blocks use
    constant index maps, so Mosaic's pipeline loads them once per call and
    skips the re-fetch on later cells."""
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

    # the cache load does not depend on the QKV matmul: start it FIRST so
    # the DMA rides under the MXU dot (in the production split, the load
    # can only start once XLA has finished the projection and entered the
    # custom call)
    @pl.when(cell == 0)
    def _():
        start_load(0, 0)

    load_k = pltpu.make_async_copy(
        kc_in.at[pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])
    load_v = pltpu.make_async_copy(
        vc_in.at[pl.ds(row0, R)], vvm.at[slot], sems.at[slot, 1])

    # ---- in-kernel QKV projection (MXU) ----
    x = x_ref[:]                                              # [R, H] bf16
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [R, 3H] f32
    dt = x.dtype
    sdt = jnp.float32
    # match the production A-side numerics: XLA emits bf16 projections,
    # the kernel upcasts q back to f32 for exact score products
    q = qkv[:, :H].astype(dt).astype(sdt)                     # [R, H]
    knew = qkv[:, H:2 * H].astype(dt)
    vnew = qkv[:, 2 * H:].astype(dt)

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

    s_self = head_sums(q * knew.astype(sdt)) * scale          # [R, NH]

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

    anc4 = anc_ref[:].reshape(G, K, S, 1)
    kvm4 = kvm[slot].reshape(G, K, S, H)
    k_sel = jnp.zeros((G, K, S, H), dtype=kvm4.dtype)
    for c in range(K):
        k_sel = jnp.where(anc4 == c, kvm4[:, c][:, None], k_sel)
    prod_suf = (q4[:, :, None, :] * k_sel.astype(sdt)).reshape(R * S, H)
    s_suf = head_sums(prod_suf).reshape(R, S, NH) * scale
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (R, S, NH), 1)
    s_suf = jnp.where(s_ids < pos, s_suf, _NEG_INF)

    scores = jnp.concatenate(
        [s_suf, s_pre, s_self[:, None, :]], axis=1)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)

    pv = pv_ref[:]
    if P8 != P:
        pv = jnp.pad(pv, ((0, 0), (0, P8 - P), (0, 0)))
    w_pre_flat = w[:, S:S + P8].reshape(R * P8, NH)
    acc = jnp.sum(
        expand(w_pre_flat).reshape(G, K, P8, H)
        * pv[:, None].astype(jnp.float32), axis=2).reshape(R, H)

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

    # ---- in-kernel output projection (MXU) ----
    out_ref[:] = jax.lax.dot_general(
        acc.astype(dt), wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)

    # ---- append this step's K/V in place (deferred-put scheme) ----
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
    Bi = Bk // K
    G = max(1, min(40, Bk) // K)
    while Bi % G:
        G -= 1
    return Bi, G, G * K


def folded_layer(x, wqkv, wo, k_cache, v_cache, prefix_k, prefix_v, anc,
                 pos):
    """One decoder layer's attention step as ONE pallas_call:
    QKV projection + fused beam attention + output projection."""
    Bk, H_ = x.shape
    S_ = k_cache.shape[1]
    P_ = prefix_k.shape[1]
    Bi, G, R = _grid_geometry(Bk)
    kernel = functools.partial(
        _folded_kernel, K=K, NH=NH, S=S_, P=P_, H=H_, G=G, R=R, scale=SCALE)
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
            pl.BlockSpec((H_, 3 * H_), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # wqkv
            pl.BlockSpec((H_, H_), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),             # wo
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
        # 0=pos, 1=x, 2=anc, 3=pk, 4=pv, 5=wqkv, 6=wo, 7=kc, 8=vc
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), x,
      anc.astype(jnp.int32)[:, :, None], prefix_k, prefix_v, wqkv, wo,
      k_cache, v_cache)
    return out, k_cache, v_cache


def _minimal_kernel(x_ref, out_ref):
    out_ref[:] = x_ref[:]


def minimal_call(x):
    """Same grid geometry as the fused kernel, trivial body, no HBM cache
    traffic: its cost IS the per-call fixed cost (launch, grid setup,
    block marshaling)."""
    Bk, H_ = x.shape
    Bi, G, R = _grid_geometry(Bk)
    return pl.pallas_call(
        _minimal_kernel,
        grid=(Bi // G,),
        in_specs=[pl.BlockSpec((R, H_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, H_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bk, H_), x.dtype),
        interpret=INTERPRET,
    )(x)


def make_inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x0 = jax.random.normal(ks[0], (R_ALL, H), DT)
    pk = jax.random.normal(ks[1], (B, P, H), DT) * 0.3
    pv = jax.random.normal(ks[2], (B, P, H), DT) * 0.3
    anc = jax.random.randint(ks[3], (R_ALL, S), 0, K)
    wqkv = jax.random.normal(ks[4], (LAYERS, H, 3 * H), DT) * 0.02
    wo = jax.random.normal(ks[4], (LAYERS, H, H), DT) * 0.02
    return x0, pk, pv, anc, wqkv, wo


def scan_split(x0, pk, pv, anc, wqkv, wo):
    """A: production kernel, QKV/out-proj matmuls in XLA."""
    caches = [(jnp.zeros((R_ALL, S, H), DT), jnp.zeros((R_ALL, S, H), DT))
              for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, (kc, vc) in enumerate(caches):
            qkv = (x @ wqkv[li]).astype(DT)
            out, kc, vc = fused_beam_decode_attention(
                qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:], kc, vc,
                pk, pv, anc, t, num_heads=NH, beam_size=K, scale=SCALE,
                interpret=INTERPRET)
            x = (out @ wo[li]).astype(DT)
            new.append((kc, vc))
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, x0), jnp.arange(STEPS))
    return x, caches[-1][0]


def scan_folded(x0, pk, pv, anc, wqkv, wo):
    """B: one pallas_call per layer (QKV + attention + out-proj fused)."""
    caches = [(jnp.zeros((R_ALL, S, H), DT), jnp.zeros((R_ALL, S, H), DT))
              for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, (kc, vc) in enumerate(caches):
            x, kc, vc = folded_layer(x, wqkv[li], wo[li], kc, vc,
                                     pk, pv, anc, t)
            new.append((kc, vc))
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, x0), jnp.arange(STEPS))
    return x, caches[-1][0]


def scan_minimal(x0, pk, pv, anc, wqkv, wo):
    """C: same XLA matmul scan as A, kernel body replaced by a copy."""
    def step(x, t):
        for li in range(LAYERS):
            qkv = (x @ wqkv[li]).astype(DT)
            out = minimal_call(qkv[:, :H])
            x = (out @ wo[li]).astype(DT)
        return x, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(STEPS))
    return x, x


def scan_noop(x0, pk, pv, anc, wqkv, wo):
    """D: pure-XLA matmul scan (no pallas_call at all)."""
    def step(x, t):
        for li in range(LAYERS):
            qkv = (x @ wqkv[li]).astype(DT)
            x = (qkv[:, :H] @ wo[li]).astype(DT)
        return x, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(STEPS))
    return x, x


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


def main():
    args = make_inputs()
    xa = jax.jit(scan_split)(*args)[0]
    xb = jax.jit(scan_folded)(*args)[0]
    d = float(jnp.max(jnp.abs(xa.astype(jnp.float32)
                              - xb.astype(jnp.float32))))
    rel = d / max(1e-6, float(jnp.max(jnp.abs(xa.astype(jnp.float32)))))
    print(f"parity A vs B: max abs diff {d:.3e} (rel {rel:.3e}) "
          f"{'OK' if rel < 2e-2 else 'FAIL'}")
    if rel >= 2e-2:
        sys.exit(1)
    if TINY:
        print("(tiny/CPU parity mode: timing skipped)")
        return
    ta = time_prog("A: production (XLA matmuls + fused kernel)", scan_split,
                   args)
    tb = time_prog("B: folded (QKV+attn+out-proj in one call)", scan_folded,
                   args)
    tc = time_prog("C: minimal kernel (copy body, same grid)", scan_minimal,
                   args)
    td = time_prog("D: pure XLA matmul scan (no pallas)", scan_noop, args)
    ncalls = LAYERS * STEPS
    print(f"\nper-call fixed cost (C - D) / {ncalls}: "
          f"{(tc - td) / ncalls * 1e3:.1f} us")
    print(f"fold delta (A - B): {ta - tb:+.2f} ms "
          f"({'fold wins' if tb < ta else 'split wins'})")


if __name__ == "__main__":
    main()
