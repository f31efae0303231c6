"""KV-merge kernel experiment (roofline follow-up, VERDICT r3 task 4).

The decode roofline (scripts/roofline.py, docs/performance.md "Decode
roofline") locates the fused cache scan's 2.5x-over-DMA gap in per-call
fixed cost, and the one untried lever it points at is DMA descriptor
count: the production kernel issues 2 loads + 2 puts per grid cell (K and
V are separate HBM arrays). This experiment A/Bs a variant with K and V
interleaved on the lane axis in ONE [Bk, S, 2H] cache — 1 load + 1 put
per cell, half the semaphore waits, and the beam-ancestry select runs
once over the merged block instead of twice.

Run on the chip:  python scripts/bench_kv_merge.py        (flagship shapes)
CPU parity only:  JAX_PLATFORMS=cpu python scripts/bench_kv_merge.py --tiny

Measures the same 19-step x 12-layer chained cache scan as the "Kernel
cost anatomy" ablation (docs/performance.md) so the A-side must land in
the ~23-26 ms band; the B-side is the experiment. Parity: the merged
variant's step outputs are checked against the production kernel's on the
same inputs before timing.
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


def _merged_kernel(pos_ref, q_ref, kvnew_ref, anc_ref, pk_ref, pv_ref,
                   kv_in, out_ref, kv_out, kvm, sems,
                   *, K, NH, S, P, H, G, R, scale):
    """One grid cell of the merged-KV variant: identical math to
    ops/pallas_decode._kernel (precise=True, has_prefix=True), but the
    suffix cache is one [Bk, S, 2H] array — one load DMA, one ancestry
    select pass, one 8-row append put per cell."""
    cell = pl.program_id(0)
    ncells = pl.num_programs(0)
    row0 = cell * R
    pos = pos_ref[0]
    slot = cell % 2

    def start_load(c, sl):
        pltpu.make_async_copy(
            kv_in.at[pl.ds(c * R, R)], kvm.at[sl], sems.at[sl, 0]).start()

    @pl.when(cell == 0)
    def _():
        start_load(0, 0)

    load = pltpu.make_async_copy(
        kv_in.at[pl.ds(row0, R)], kvm.at[slot], sems.at[slot, 0])

    dt = q_ref.dtype
    sdt = jnp.float32
    q = q_ref[:].astype(sdt)                                   # [R, H]
    knew = kvnew_ref[:, 0, :H]
    vnew = kvnew_ref[:, 0, H:]

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

    s_self = head_sums(q * knew.astype(sdt)) * scale           # [R, NH]

    q4 = q.reshape(G, K, H)
    P8 = -(-P // 8) * 8
    prod_pre = q4[:, :, None, :] * pk_ref[:][:, None].astype(sdt)
    if P8 != P:
        prod_pre = jnp.pad(prod_pre, ((0, 0), (0, 0), (0, P8 - P), (0, 0)))
    s_pre = head_sums(prod_pre.reshape(R * P8, H)).reshape(
        R, P8, NH) * scale
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (R, P8, NH), 1)
    s_pre = jnp.where(p_ids < P, s_pre, _NEG_INF)

    def wait_put(sl):
        pltpu.make_async_copy(
            kvm.at[sl, :, pl.ds(0, 8), :],
            kv_out.at[pl.ds(0, R), pl.ds(0, 8), :], sems.at[sl, 1]).wait()

    load.wait()

    @pl.when(cell + 1 < ncells)
    def _():
        @pl.when(cell >= 1)
        def _():
            wait_put(1 - slot)
        start_load(cell + 1, 1 - slot)

    # ---- ONE ancestry select pass over the merged [G, K, S, 2H] block ----
    anc4 = anc_ref[:].reshape(G, K, S, 1)
    kvm4 = kvm[slot].reshape(G, K, S, 2 * H)
    kv_sel = jnp.zeros((G, K, S, 2 * H), dtype=kvm4.dtype)
    for c in range(K):
        kv_sel = jnp.where(anc4 == c, kvm4[:, c][:, None], kv_sel)
    k_sel = kv_sel[..., :H]
    v_sel = kv_sel[..., H:]

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

    w_suf_flat = w[:, :S].reshape(R * S, NH)
    acc = acc + jnp.sum(
        expand(w_suf_flat).reshape(R, S, H)
        * v_sel.astype(jnp.float32).reshape(R, S, H), axis=1)

    acc = acc + jnp.sum(
        expand(w[:, S + P8:]) * vnew[:, None].astype(jnp.float32), axis=1)
    out_ref[:] = acc.astype(out_ref.dtype)

    # ---- single merged 8-row append put ----
    pos0 = pl.multiple_of((pos // 8) * 8, 8)
    ids = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 2 * H), 1)
    at_pos = ids == pos - pos0
    kvm[slot, :, pl.ds(pos0, 8), :] = jnp.where(
        at_pos, kvnew_ref[:], kvm[slot, :, pl.ds(pos0, 8), :])
    pltpu.make_async_copy(
        kvm.at[slot, :, pl.ds(pos0, 8), :],
        kv_out.at[pl.ds(row0, R), pl.ds(pos0, 8), :],
        sems.at[slot, 1]).start()

    @pl.when(cell == ncells - 1)
    def _():
        @pl.when(ncells > 1)
        def _():
            wait_put(1 - slot)
        wait_put(slot)


def merged_attention(q, kv_new, kv_cache, prefix_k, prefix_v, anc, pos):
    Bk, H_ = q.shape
    S_ = kv_cache.shape[1]
    Bi = Bk // K
    G = max(1, min(40, Bk) // K)
    while Bi % G:
        G -= 1
    R = G * K
    kernel = functools.partial(
        _merged_kernel, K=K, NH=NH, S=S_, P=prefix_k.shape[1], H=H_,
        G=G, R=R, scale=SCALE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bi // G,),
        in_specs=[
            pl.BlockSpec((R, H_), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, 2 * H_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S_, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, prefix_k.shape[1], H_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, prefix_k.shape[1], H_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # kv_cache
        ],
        out_specs=[
            pl.BlockSpec((R, H_), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # kv_cache (alias)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, S_, 2 * H_), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, kv_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bk, H_), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ],
        # 0=pos (scalar prefetch), 1=q, 2=kv_new, 3=anc, 4=pk, 5=pv, 6=kv
        input_output_aliases={6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, kv_new[:, None, :],
      anc.astype(jnp.int32)[:, :, None], prefix_k, prefix_v, kv_cache)
    return out, kv_cache


def make_inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q0 = jax.random.normal(ks[0], (R_ALL, H), DT)
    pk = jax.random.normal(ks[1], (B, P, H), DT) * 0.3
    pv = jax.random.normal(ks[2], (B, P, H), DT) * 0.3
    anc = jax.random.randint(ks[3], (R_ALL, S), 0, K)
    wq = jax.random.normal(ks[4], (LAYERS, H, H), DT) * 0.02
    wkv = jax.random.normal(ks[5], (LAYERS, H, 2 * H), DT) * 0.02
    return q0, pk, pv, anc, wq, wkv


def scan_split(q0, pk, pv, anc, wq, wkv):
    """Chained 19-step x 12-layer scan on the PRODUCTION kernel."""
    caches = [(jnp.zeros((R_ALL, S, H), DT), jnp.zeros((R_ALL, S, H), DT))
              for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, (kc, vc) in enumerate(caches):
            qt = (x @ wq[li]).astype(DT)
            kvt = (x @ wkv[li]).astype(DT)
            out, kc, vc = fused_beam_decode_attention(
                qt, kvt[:, :H], kvt[:, H:], kc, vc, pk, pv, anc, t,
                num_heads=NH, beam_size=K, scale=SCALE,
                interpret=INTERPRET)
            x = out
            new.append((kc, vc))
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, q0), jnp.arange(STEPS))
    return x, caches[-1][0]


def scan_merged(q0, pk, pv, anc, wq, wkv):
    """Same program on the merged-KV kernel."""
    caches = [jnp.zeros((R_ALL, S, 2 * H), DT) for _ in range(LAYERS)]

    def step(carry, t):
        caches, x = carry
        new = []
        for li, kvc in enumerate(caches):
            qt = (x @ wq[li]).astype(DT)
            kvt = (x @ wkv[li]).astype(DT)
            out, kvc = merged_attention(qt, kvt, kvc, pk, pv, anc, t)
            x = out
            new.append(kvc)
        return (new, x), None

    (caches, x), _ = jax.lax.scan(step, (caches, q0), jnp.arange(STEPS))
    return x, caches[-1][..., :H]


def time_prog(name, fn, args, iters=5):
    prog = jax.jit(fn)
    x, kc = prog(*args)
    np.asarray(x)  # compile + settle
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last, _ = prog(*args)
    np.asarray(last)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<44}{dt:>9.2f} ms/run")
    return dt, x


def main():
    args = make_inputs()
    # parity first: the two scans must produce the same final activations
    xa = jax.jit(scan_split)(*args)[0]
    xb = jax.jit(scan_merged)(*args)[0]
    d = float(jnp.max(jnp.abs(xa.astype(jnp.float32)
                              - xb.astype(jnp.float32))))
    rel = d / max(1e-6, float(jnp.max(jnp.abs(xa.astype(jnp.float32)))))
    print(f"parity: max abs diff {d:.3e} (rel {rel:.3e}) "
          f"{'OK' if rel < 2e-2 else 'FAIL'}")
    if rel >= 2e-2:
        sys.exit(1)
    if TINY:
        print("(tiny/CPU parity mode: timing skipped)")
        return
    time_prog("A: production kernel (split K/V)", scan_split, args)
    time_prog("B: merged [Bk,S,2H] (1 load + 1 put)", scan_merged, args)


if __name__ == "__main__":
    main()
