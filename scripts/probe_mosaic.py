"""Mosaic capability probe for the fused decode-attention kernel design.

Checks, on the real TPU, which formulations of the per-head beam-candidate
score computation Mosaic compiles and how fast they run:

  P1: batched dot_general  [G,K,hd] x [G,K,S,hd] -> [G,K,K,S] (batch dim G,
      contraction hd) inside one kernel invocation.
  P2: per-head loop of 2-D dots with a 64-lane static slice of a [R, 768]
      block.
  P3: head-major [nh, R, hd=64] layout — elementwise VPU mul + lane reduce.

Each probe just needs to compile + produce numerics matching jnp; timing is
secondary (shapes are the flagship's: B=64, K=5, S=20, nh=12, hd=64).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, S, NH, HD = 64, 5, 20, 12, 64
G = 8  # images per grid cell
R = G * K
DT = jnp.bfloat16


def ref_scores(q, kc):
    # q [B,K,nh,hd], kc [B,K,S,nh,hd] -> [B,K,K,nh,S]
    return jnp.einsum("bqnd,bcsnd->bqcns", q.astype(jnp.float32),
                      kc.astype(jnp.float32))


def probe(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"{name:<58} OK  compile+run {dt:.1f}s")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name:<58} FAIL {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, K, NH, HD), DT)
    kc = jax.random.normal(jax.random.PRNGKey(1), (B, K, S, NH, HD), DT)
    want = ref_scores(q, kc)

    # ---- P1: batched dot_general in one kernel ---------------------------
    def k1(q_ref, kc_ref, o_ref):
        qb = q_ref[:]                      # [G, K, nh, hd]
        kb = kc_ref[:]                     # [G, K, S, nh, hd]
        # bring to [G, K*nh, hd] x [G, hd, K*S*nh]? try direct batched dg:
        o_ref[:] = jax.lax.dot_general(
            qb, kb,
            dimension_numbers=(((3,), (4,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, K, nh, K, S, nh] -- too big; just probe compile

    def run1():
        return pl.pallas_call(
            k1,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, K, NH, HD), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, K, S, NH, HD), lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, K, NH, K, S, NH),
                                   lambda i: (i, 0, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, K, NH, K, S, NH), jnp.float32),
        )(q, kc)

    probe("P1 batched dot_general (6D out)", run1)

    # ---- P2: per-(g, head) 2D dots via lane slices -----------------------
    # layouts: q2 [R, 768]; kc2 [R, S, 768] flattened to [R*S, 768] blocks
    q2 = q.reshape(B * K, NH * HD)
    kc2 = kc.reshape(B * K, S, NH * HD)

    def k2(q_ref, kc_ref, o_ref):
        # per image g, head n: dot [K, 64] x [64, K*S]
        for g in range(G):
            kg = kc_ref[g * K:(g + 1) * K]            # [K, S, 768]
            qg = q_ref[g * K:(g + 1) * K]             # [K, 768]
            for n in range(NH):
                qn = qg[:, n * HD:(n + 1) * HD]       # [K, 64]
                kn = kg[:, :, n * HD:(n + 1) * HD]    # [K, S, 64]
                kn2 = kn.reshape(K * S, HD)
                sc = jax.lax.dot_general(
                    qn, kn2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [K, K*S]
                o_ref[g, :, :, n, :] = sc.reshape(K, K, S)

    def run2():
        return pl.pallas_call(
            k2,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((R, NH * HD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S, NH * HD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, K, K, NH, S),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, K, K, NH, S), jnp.float32),
        )(q2, kc2)

    o2 = probe("P2 unrolled per-(image,head) 2D dots", run2)
    if o2 is not None:
        err = float(jnp.max(jnp.abs(o2 - want.transpose(0, 1, 2, 3, 4))))
        print(f"   P2 max abs err vs ref: {err:.4f}")

    # ---- P3: one dot per image over flattened (c, s) — all heads masked --
    # scores_full[q, j] = qn . kn for merged 768 contraction is WRONG across
    # heads; instead do [K,768] x [768, K*S] with a head-block-diagonal
    # expansion is skipped; probe instead a single big dot per grid cell:
    # [R, 768] x [768, R*S] after transposing kc in-kernel.
    def k3(q_ref, kc_ref, o_ref):
        kg = kc_ref[:]                                # [R, S, 768]
        kt = kg.reshape(R * S, NH * HD)               # [R*S, 768]
        sc = jax.lax.dot_general(
            q_ref[:], kt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [R, R*S]
        o_ref[:] = sc

    def run3():
        return pl.pallas_call(
            k3,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((R, NH * HD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, S, NH * HD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, R * S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B // G * R, R * S), jnp.float32),
        )(q2, kc2)

    probe("P3 flat big dot (all-heads merged; layout probe only)", run3)


if __name__ == "__main__":
    main()
