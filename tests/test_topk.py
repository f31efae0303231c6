"""Fast top-k tests: blocked and two-stage variants must produce exactly
the same values as lax.top_k (indices too, absent ties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.ops.topk import (
    blocked_top_k,
    fast_top_k,
    two_stage_top_k,
)


@pytest.mark.parametrize("impl", [blocked_top_k, two_stage_top_k])
@pytest.mark.parametrize("N", [5000, 8192, 251285])
def test_matches_lax_top_k(rng, impl, N):
    x = jnp.asarray(rng.randn(3, N).astype(np.float32))
    v1, i1 = jax.lax.top_k(x, 10)
    v2, i2 = impl(x, 10, block=512)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # values at returned indices are self-consistent
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(x), np.asarray(i2), axis=1),
        np.asarray(v2))


@pytest.mark.parametrize("impl", [blocked_top_k, two_stage_top_k])
def test_ties_still_exact_values(rng, impl):
    x = jnp.asarray(np.round(rng.randn(4, 4096), 1).astype(np.float32))
    v1, _ = jax.lax.top_k(x, 10)
    v2, i2 = impl(x, 10, block=256)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(x), np.asarray(i2), axis=1),
        np.asarray(v2))


def test_fast_top_k_dispatch(rng):
    small = jnp.asarray(rng.randn(2, 100).astype(np.float32))
    v, i = fast_top_k(small, 5)  # small rows -> exact lax path
    v1, i1 = jax.lax.top_k(small, 5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v1))

    big = jnp.asarray(rng.randn(2, 50000).astype(np.float32))
    for method in ["two_stage", "blocked", "exact"]:
        v, i = fast_top_k(big, 10, method=method)
        v1, _ = jax.lax.top_k(big, 10)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v1))


def test_under_jit_and_scan(rng):
    x = jnp.asarray(rng.randn(8, 2, 20000).astype(np.float32))

    @jax.jit
    def f(x):
        def body(c, row):
            v, i = two_stage_top_k(row, 4)
            return c, (v, i)

        _, (vs, _) = jax.lax.scan(body, None, x)
        return vs

    out = np.asarray(f(x))
    want = np.asarray(jax.lax.top_k(x.reshape(16, 20000), 4)[0]).reshape(8, 2, 4)
    np.testing.assert_array_equal(out, want)


def test_fused_beam_top_k_matches_bruteforce(rng):
    """Candidate top-k over raw logits + per-row bias must equal the
    materialized live+log-style sum, including lowest-index tie order and
    min-length EOS suppression (the beam hot path never materializes the
    vocab-sized sum)."""
    from image_captioning_ml_project_tpu.ops.topk import fused_beam_top_k

    B, K, V, eos = 3, 5, 9001, 2
    logits = jnp.asarray(rng.randn(B * K, V).astype(np.float32))
    # force exact ties across beams and blocks
    logits = logits.at[:, 100].set(7.25)
    bias = jnp.zeros((B * K,))
    for suppress in (False, True):
        vals, idx = fused_beam_top_k(
            logits, bias, K, 2 * K, suppress_token=eos,
            suppress=jnp.asarray(suppress))
        total = np.asarray(logits).reshape(B, K * V).copy()
        if suppress:
            total.reshape(B, K, V)[:, :, eos] = -np.inf
        order = np.argsort(-total, axis=1, kind="stable")[:, :2 * K]
        np.testing.assert_array_equal(np.asarray(idx), order)
        np.testing.assert_allclose(
            np.asarray(vals), np.take_along_axis(total, order, axis=1),
            rtol=1e-6, atol=1e-6)


def test_fused_beam_top_k_bias_reorders(rng):
    """Per-row bias must compete across the beams of one image."""
    from image_captioning_ml_project_tpu.ops.topk import fused_beam_top_k

    B, K, V = 2, 3, 6000
    logits = jnp.asarray(rng.randn(B * K, V).astype(np.float32))
    bias = jnp.asarray(np.repeat([[0.0, -1e9, -1e9]], B, axis=0).reshape(-1))
    _, idx = fused_beam_top_k(logits, bias, K, K)
    # all winners must come from beam 0 of each image (others are -inf'd)
    assert (np.asarray(idx) // V == 0).all()


def test_lse_and_block_max_kernel(rng):
    """One-pass streaming logsumexp + block maxima (interpreter mode; the
    same kernel Mosaic compiles for the TPU beam candidate step)."""
    from image_captioning_ml_project_tpu.ops.pallas_lse import (
        lse_and_block_max)

    x = jnp.asarray(rng.randn(12, 9001).astype(np.float32)) * 4
    lse, bm = lse_and_block_max(x, interpret=True)
    want_lse = jax.scipy.special.logsumexp(x, axis=-1)
    nblk = -(-9001 // 512)
    xp = jnp.pad(x, ((0, 0), (0, nblk * 512 - 9001)),
                 constant_values=-1e30)
    want_bm = xp.reshape(12, nblk, 512).max(-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(want_bm))


def test_fused_beam_top_k_with_precomputed_block_max(rng):
    from image_captioning_ml_project_tpu.ops.pallas_lse import (
        lse_and_block_max)
    from image_captioning_ml_project_tpu.ops.topk import fused_beam_top_k

    B, K, V = 2, 4, 9001
    logits = jnp.asarray(rng.randn(B * K, V).astype(np.float32))
    bias = jnp.asarray(rng.randn(B * K).astype(np.float32))
    _, bm = lse_and_block_max(logits, interpret=True)
    v1, i1 = fused_beam_top_k(logits, bias, K, 2 * K, suppress_token=2,
                              suppress=jnp.asarray(True))
    v2, i2 = fused_beam_top_k(logits, bias, K, 2 * K, suppress_token=2,
                              suppress=jnp.asarray(True), block_max=bm)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


@pytest.mark.parametrize("impl", ["two_stage", "blocked"])
def test_rows_with_genuine_neg_inf_entries(rng, impl):
    """Pad entries must never outrank real -inf inputs: a row with fewer
    than k finite entries (hard-masked constrained decoding) must return
    in-range indices, exactly like lax.top_k."""
    from image_captioning_ml_project_tpu.ops.topk import (blocked_top_k,
                                                          two_stage_top_k)

    fn = two_stage_top_k if impl == "two_stage" else blocked_top_k
    B, N, k = 3, 1500, 10
    x = np.full((B, N), -np.inf, dtype=np.float32)
    for b in range(B):
        live = rng.choice(N, size=5, replace=False)
        x[b, live] = rng.randn(5)
    vals, idxs = fn(jnp.asarray(x), k, block=512)
    want_v, want_i = jax.lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(want_v))
    assert int(np.asarray(idxs).max()) < N


@pytest.mark.slow
def test_fuzz_fused_beam_top_k(rng):
    """Seeded fuzz over shapes/blocks/dtypes/bias scales/tie densities:
    fused candidate selection must equal the materialized oracle on every
    draw (values to f32 tolerance, indices exactly, lowest-index ties)."""
    from image_captioning_ml_project_tpu.ops.topk import fused_beam_top_k

    for trial in range(25):
        r = np.random.RandomState(1000 + trial)
        B = int(r.randint(1, 4))
        K = int(r.choice([1, 2, 4, 5]))
        V = int(r.choice([600, 1023, 1024, 4097, 9001]))
        block = int(r.choice([b for b in (128, 512, 1024) if b <= V]))
        nblk = -(-V // block)
        # contract: the block-selection stage picks k blocks out of K*nblk
        k = int(r.randint(1, min(2 * K, K * nblk) + 1))
        eos = int(r.randint(0, V))
        dtype = r.choice([np.float32, np.float32, "bf16"])
        x = r.randn(B * K, V).astype(np.float32)
        # inject exact ties at a random density
        n_tie = int(r.randint(0, 20))
        if n_tie:
            cols = r.randint(0, V, n_tie)
            x[:, cols] = np.float32(r.randn() * 2)
        logits = jnp.asarray(x)
        if dtype == "bf16":
            logits = logits.astype(jnp.bfloat16)
            x = np.asarray(logits.astype(jnp.float32))
        bias = r.randn(B * K).astype(np.float32) * r.choice([0.0, 1.0, 30.0])
        suppress = bool(r.randint(0, 2))
        vals, idx = fused_beam_top_k(
            logits, jnp.asarray(bias), K, k, suppress_token=eos,
            suppress=jnp.asarray(suppress), block=block)
        total = (x.reshape(B, K, V)
                 + bias.reshape(B, K, 1)).reshape(B, K * V).copy()
        if suppress:
            total.reshape(B, K, V)[:, :, eos] = -np.inf
        order = np.argsort(-total, axis=1, kind="stable")[:, :k]
        want = np.take_along_axis(total, order, axis=1)
        got_v, got_i = np.asarray(vals), np.asarray(idx)
        np.testing.assert_allclose(got_v, want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"trial {trial}")
        # indices must match except where exact value ties allow either
        mism = got_i != order
        if mism.any():
            np.testing.assert_allclose(
                np.take_along_axis(total, got_i, axis=1), want,
                rtol=0, atol=0, err_msg=f"trial {trial} tie order")
