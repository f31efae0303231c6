"""Microbenchmark: KV-cache append strategies inside lax.scan on TPU.

Measures per-op DUS/copy cost for different cache layouts and read patterns
to find a structure XLA updates in place. Shapes mirror the flagship beam-5
decode: 12 layers x (k, v) caches of [320, 20, 12, 64] bf16.

Each variant runs the same logical program: scan 19 steps; each step reads
the whole cache (attention-like contraction) and appends one new entry.
Reported: wall ms/run (RTT-free: one big jitted program of many scans).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

Bk, S, NH, HD = 320, 20, 12, 64
NL = 24  # k+v for 12 layers
STEPS = 19
DT = jnp.bfloat16


def run_variant(name, init_caches, body, iters=3):
    @jax.jit
    def prog(caches, q):
        def step(carry, t):
            caches, acc = carry
            caches, out = body(caches, q, t)
            return (caches, acc + out), None

        (caches, acc), _ = jax.lax.scan(
            step, (caches, jnp.zeros((Bk, NH, HD), jnp.float32)),
            jnp.arange(STEPS))
        return acc

    q = jnp.ones((Bk, NH, HD), DT)
    caches = init_caches()
    np.asarray(prog(caches, q))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = prog(caches, q)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44}{dt*1e3:>9.2f} ms/run")
    return dt


def main():
    # A: current layout [Bk, S, nh, hd], DUS at axis 1, read via einsum
    def init_a():
        return [jnp.zeros((Bk, S, NH, HD), DT) for _ in range(NL)]

    def body_a(caches, q, t):
        out = jnp.zeros((Bk, NH, HD), jnp.float32)
        new = []
        for c in caches:
            w = jnp.einsum("bnd,bsnd->bns", q, c,
                           preferred_element_type=jnp.float32)
            out = out + jnp.einsum("bns,bsnd->bnd", w.astype(DT), c,
                                   preferred_element_type=jnp.float32)
            c = jax.lax.dynamic_update_slice_in_dim(
                c, q[:, None], t, axis=1)
            new.append(c)
        return new, out

    # B: time-major layout [S, Bk, nh, hd], DUS at axis 0 (contiguous slab)
    def init_b():
        return [jnp.zeros((S, Bk, NH, HD), DT) for _ in range(NL)]

    def body_b(caches, q, t):
        out = jnp.zeros((Bk, NH, HD), jnp.float32)
        new = []
        for c in caches:
            w = jnp.einsum("bnd,sbnd->bns", q, c,
                           preferred_element_type=jnp.float32)
            out = out + jnp.einsum("bns,sbnd->bnd", w.astype(DT), c,
                                   preferred_element_type=jnp.float32)
            c = jax.lax.dynamic_update_slice_in_dim(
                c, q[None], t, axis=0)
            new.append(c)
        return new, out

    # C: write-only (no read) — isolates the DUS cost, layout A
    def body_c(caches, q, t):
        new = [jax.lax.dynamic_update_slice_in_dim(c, q[:, None], t, axis=1)
               for c in caches]
        return new, q.astype(jnp.float32) * 0

    # D: one merged cache [NL, Bk, S, nh, hd], single DUS per step at axis 2
    def init_d():
        return jnp.zeros((NL, Bk, S, NH, HD), DT)

    def body_d(cache, q, t):
        w = jnp.einsum("bnd,lbsnd->lbns", q, cache,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("lbns,lbsnd->bnd", w.astype(DT), cache,
                         preferred_element_type=jnp.float32)
        qb = jnp.broadcast_to(q[None, :, None], (NL, Bk, 1, NH, HD))
        cache = jax.lax.dynamic_update_slice(
            cache, qb, (0, 0, t, 0, 0))
        return cache, out

    # E: time-major merged [S, NL, Bk, nh, hd], single contiguous DUS
    def init_e():
        return jnp.zeros((S, NL, Bk, NH, HD), DT)

    def body_e(cache, q, t):
        w = jnp.einsum("bnd,slbnd->lbns", q, cache,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("lbns,slbnd->bnd", w.astype(DT), cache,
                         preferred_element_type=jnp.float32)
        qb = jnp.broadcast_to(q[None, None], (1, NL, Bk, NH, HD))
        cache = jax.lax.dynamic_update_slice(
            cache, qb, (t, 0, 0, 0, 0))
        return cache, out

    # F: current gpt2.cached_step pattern — flat [Bk, S, nh, hd] cache read
    #    through a (B, K, ...) reshape + beam one-hot select, DUS on the flat
    #    layout. Tests whether the reshape view defeats XLA's in-place DUS.
    K = 5
    B = Bk // K

    def body_f(caches, q, t):
        out = jnp.zeros((Bk, NH, HD), jnp.float32)
        onehot = jnp.eye(K, dtype=jnp.float32)[None, :, :, None].repeat(
            B, axis=0)  # [B, K, K, 1] identity-ancestry stand-in
        qg = q.reshape(B, K, NH, HD)
        new = []
        for c in caches:
            cb = c.reshape(B, K, S, NH, HD)
            scores = jnp.einsum("bqnd,bcsnd->bqcns", qg, cb,
                                preferred_element_type=jnp.float32)
            sel = jnp.where(onehot[..., None] > 0, scores, 0.0).sum(axis=2)
            w = sel.reshape(Bk, NH, S)
            wsel = (w.reshape(B, K, NH, S)[:, :, None]
                    * onehot[..., None])
            out = out + jnp.einsum(
                "bqcns,bcsnd->bqnd", wsel.astype(DT), cb,
                preferred_element_type=jnp.float32).reshape(Bk, NH, HD)
            c = jax.lax.dynamic_update_slice_in_dim(
                c, q[:, None], t, axis=1)
            new.append(c)
        return new, out

    # G: native 5-D beam cache [B, K, S, nh, hd] — one-hot read without any
    #    reshape of the cache; DUS at axis 2.
    def init_g():
        return [jnp.zeros((B, K, S, NH, HD), DT) for _ in range(NL)]

    def body_g(caches, q, t):
        out = jnp.zeros((Bk, NH, HD), jnp.float32)
        onehot = jnp.eye(K, dtype=jnp.float32)[None, :, :, None].repeat(
            B, axis=0)
        qg = q.reshape(B, K, NH, HD)
        new = []
        for cb in caches:
            scores = jnp.einsum("bqnd,bcsnd->bqcns", qg, cb,
                                preferred_element_type=jnp.float32)
            sel = jnp.where(onehot[..., None] > 0, scores, 0.0)
            out = out + jnp.einsum(
                "bqcns,bcsnd->bqnd", sel.astype(DT), cb,
                preferred_element_type=jnp.float32).reshape(Bk, NH, HD)
            cb = jax.lax.dynamic_update_slice(
                cb, qg[:, :, None], (0, 0, t, 0, 0))
            new.append(cb)
        return new, out

    run_variant("A: [Bk,S,nh,hd] DUS ax1 + read", init_a, body_a)
    run_variant("B: [S,Bk,nh,hd] DUS ax0 + read", init_b, body_b)
    run_variant("C: [Bk,S,nh,hd] DUS only (no read)", init_a, body_c)
    run_variant("D: merged [NL,Bk,S,nh,hd] one DUS + read", init_d, body_d)
    run_variant("E: merged [S,NL,Bk,nh,hd] one DUS + read", init_e, body_e)
    run_variant("F: flat cache, reshape+onehot read + DUS", init_a, body_f)
    run_variant("G: native 5D [B,K,S,nh,hd] onehot + DUS", init_g, body_g)


if __name__ == "__main__":
    main()
