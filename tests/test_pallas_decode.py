"""Fused beam-decode attention kernel (ops/pallas_decode.py): numerics vs
the pure-jnp oracle, GPT-2 step parity between the Pallas and XLA paths,
and beam-search token parity with the kernel engaged (interpreter mode on
CPU — the same kernel code Mosaic compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import DecoderConfig, DecoderType
from image_captioning_ml_project_tpu.inference.decoding import beam_search
from image_captioning_ml_project_tpu.models.gpt2 import GPT2Decoder
from image_captioning_ml_project_tpu.ops.pallas_decode import (
    fused_beam_decode_attention,
    reference_beam_decode_attention,
)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("B,K,S,P,NH,H,pos,dt,anc_none", [
    (8, 5, 24, 10, 12, 768, 7, jnp.bfloat16, False),   # flagship shapes
    (8, 5, 24, 10, 12, 768, 0, jnp.bfloat16, False),   # first step
    (8, 5, 24, 10, 12, 768, 19, jnp.bfloat16, False),  # last real position
    (4, 1, 24, 10, 12, 768, 5, jnp.bfloat16, True),    # greedy/sample (K=1)
    (3, 4, 8, 3, 2, 16, 3, jnp.float32, False),        # tiny odd shapes
])
def test_kernel_matches_oracle(B, K, S, P, NH, H, pos, dt, anc_none):
    Bk = B * K
    rngs = jax.random.split(jax.random.PRNGKey(B * 1000 + pos), 8)
    q = jax.random.normal(rngs[0], (Bk, H), dt)
    kn = jax.random.normal(rngs[1], (Bk, H), dt)
    vn = jax.random.normal(rngs[2], (Bk, H), dt)
    kc = jax.random.normal(rngs[3], (Bk, S, H), dt)
    vc = jax.random.normal(rngs[4], (Bk, S, H), dt)
    pk = jax.random.normal(rngs[5], (B, P, H), dt)
    pv = jax.random.normal(rngs[6], (B, P, H), dt)
    anc = None if anc_none else jax.random.randint(rngs[7], (Bk, S), 0, K)
    scale = 1.0 / (H // NH) ** 0.5

    got = fused_beam_decode_attention(
        q, kn, vn, kc, vc, pk, pv, anc, jnp.asarray(pos),
        num_heads=NH, beam_size=K, scale=scale, interpret=True)
    want = reference_beam_decode_attention(
        q, kn, vn, kc, vc, pk, pv, anc, pos,
        num_heads=NH, beam_size=K, scale=scale)
    tol = 0.02 if dt == jnp.bfloat16 else 1e-5
    for g, w, name in zip(got, want, ("out", "k_cache", "v_cache")):
        np.testing.assert_allclose(
            _np(g.astype(jnp.float32)), _np(w.astype(jnp.float32)),
            atol=tol, rtol=tol, err_msg=name)


def test_kernel_requires_aligned_cache():
    B, K, S, H, NH = 2, 1, 20, 16, 2
    z2 = jnp.zeros((B, H))
    zc = jnp.zeros((B, S, H))
    zp = jnp.zeros((B, 3, H))
    with pytest.raises(ValueError, match="8-aligned"):
        fused_beam_decode_attention(
            z2, z2, z2, zc, zc, zp, zp, None, jnp.asarray(0),
            num_heads=NH, beam_size=K, scale=1.0, interpret=True)


def test_fused_decode_supported_shapes():
    """'auto' must not pick the Pallas kernel for models Mosaic can't tile:
    width must be a whole number of 128-lane tiles (a real TPU failure —
    the tiny e2e demo config with width 16 hit 'Slice shape along dimension
    2 must be aligned to tiling (128)'), cache 8-aligned, and one beam row's
    scratch must fit VMEM."""
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        fused_decode_supported)

    assert fused_decode_supported(24, 768)          # flagship GPT-2
    assert not fused_decode_supported(24, 16)       # tiny demo width
    assert not fused_decode_supported(20, 768)      # unaligned cache
    assert not fused_decode_supported(8192, 768)    # cache too long for VMEM
    # the kernel's minimum grid cell is one image's WHOLE beam block: a
    # cache that fits one row but not beam_size rows must fall back too
    # (otherwise 'auto' would crash in _fused_exec instead of degrading)
    assert fused_decode_supported(1024, 768, beam_size=1)
    assert not fused_decode_supported(1024, 768, beam_size=5)
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        resolve_decode_kernel)
    assert resolve_decode_kernel(
        "auto", cache_len=1024, width=768, beam_size=5) == "xla"


def test_kernel_vmem_budget(monkeypatch):
    """ADVICE r2: long caches must shrink the per-cell row count instead of
    overflowing VMEM, and an impossible single-image block must raise a
    descriptive error (not an opaque Mosaic failure)."""
    import image_captioning_ml_project_tpu.ops.pallas_decode as pd

    # (a) long cache still runs correctly (interpret mode) — block_images is
    # derived from the budget, not the 40-row target
    B, K, S, P, NH, H, pos = 4, 2, 512, 3, 2, 64, 100
    Bk = B * K
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.float32
    q = jax.random.normal(rngs[0], (Bk, H), dt)
    kn = jax.random.normal(rngs[1], (Bk, H), dt)
    vn = jax.random.normal(rngs[2], (Bk, H), dt)
    kc = jax.random.normal(rngs[3], (Bk, S, H), dt)
    vc = jax.random.normal(rngs[4], (Bk, S, H), dt)
    pk = jax.random.normal(rngs[5], (B, P, H), dt)
    pv = jax.random.normal(rngs[6], (B, P, H), dt)
    anc = jax.random.randint(rngs[7], (Bk, S), 0, K)
    # tighten the budget so only ~2 rows fit per cell -> G=1
    monkeypatch.setattr(pd, "_SCRATCH_VMEM_BUDGET",
                        4 * S * H * 4 * (K + 1))
    got = pd.fused_beam_decode_attention(
        q, kn, vn, kc, vc, pk, pv, anc, jnp.asarray(pos),
        num_heads=NH, beam_size=K, scale=0.125, interpret=True)
    want = pd.reference_beam_decode_attention(
        q, kn, vn, kc, vc, pk, pv, anc, pos,
        num_heads=NH, beam_size=K, scale=0.125)
    for g, w, name in zip(got, want, ("out", "k_cache", "v_cache")):
        np.testing.assert_allclose(_np(g), _np(w), atol=1e-5, rtol=1e-5,
                                   err_msg=name)

    # (b) even R=K overflows -> clear error naming the fix
    monkeypatch.setattr(pd, "_SCRATCH_VMEM_BUDGET", 4 * S * H * 4)
    with pytest.raises(ValueError, match="decode_kernel='xla'"):
        pd.fused_beam_decode_attention(
            q, kn, vn, kc, vc, pk, pv, anc, jnp.asarray(pos),
            num_heads=NH, beam_size=K, scale=0.125, interpret=True)


@pytest.fixture
def tiny_gpt2():
    B, H, V = 4, 16, 29
    rng = np.random.RandomState(0)

    def build(kernel):
        dcfg = DecoderConfig(decoder_type=DecoderType.GPT2, hidden_dim=H,
                             num_layers=2, num_heads=4, dropout=0.0,
                             max_length=12, prefix_length=3,
                             gpt2_n_positions=64, decode_kernel=kernel)
        return GPT2Decoder(config=dcfg, vocab_size=V, pad_token_id=0,
                           bos_token_id=1, eos_token_id=2)

    feats = {
        "features": jnp.asarray(rng.randn(B, 7, H).astype(np.float32)),
        "pooled_features": jnp.asarray(rng.randn(B, H).astype(np.float32)),
        "attention_mask": jnp.ones((B, 7), dtype=bool),
    }
    dec = build("xla")
    caps = jnp.asarray(rng.randint(3, V, (B, 5)))
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)
    return build, variables, feats


def test_gpt2_step_pallas_matches_xla(tiny_gpt2):
    """Greedy-path (K=1) single steps: the fused kernel and the XLA path
    produce the same logits and the same cache contents."""
    build, variables, feats = tiny_gpt2
    dec_x = build("xla")
    dec_p = build("pallas")
    L = 10
    state_x = dec_x.apply(variables, feats, L, method=dec_x.init_cache)
    state_p = dec_p.apply(variables, feats, L, method=dec_p.init_cache)
    toks = jnp.asarray([1, 5, 9, 12])
    for _ in range(4):
        lx, state_x = dec_x.apply(variables, state_x, toks, method=dec_x.step)
        lp, state_p = dec_p.apply(variables, state_p, toks, method=dec_p.step)
        np.testing.assert_allclose(_np(lx), _np(lp), atol=2e-4, rtol=2e-4)
        toks = jnp.argmax(lx, axis=-1).astype(jnp.int32)
    # the pallas path holds its caches layer-stacked ([L, B, S, H],
    # lazy["stacked"]) when the whole-stack kernel is active
    if "stacked" in state_p["lazy"]:
        pl_layers = [{"k": state_p["lazy"]["stacked"]["k"][li],
                      "v": state_p["lazy"]["stacked"]["v"][li]}
                     for li in range(len(state_x["lazy"]["layers"]))]
    else:
        pl_layers = state_p["lazy"]["layers"]
    for lx_l, lp_l in zip(state_x["lazy"]["layers"], pl_layers):
        np.testing.assert_allclose(_np(lx_l["k"]), _np(lp_l["k"]),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(_np(lx_l["v"]), _np(lp_l["v"]),
                                   atol=2e-5, rtol=2e-5)


def test_gpt2_beam_pallas_matches_xla(tiny_gpt2):
    """Full beam-5 decode through inference.decoding with the fused kernel
    is token-identical to the XLA path."""
    build, variables, feats = tiny_gpt2
    B, L, K = 4, 12, 5
    results = {}
    for kernel in ("xla", "pallas"):
        dec = build(kernel)
        state = dec.apply(variables, feats, L, method=dec.init_cache)

        def step_fn(s, t, dec=dec):
            return dec.apply(variables, s, t, method=dec.step)

        results[kernel] = beam_search(
            step_fn, state, B, K, bos_token_id=1, eos_token_id=2,
            pad_token_id=0, max_length=L, length_penalty=0.8)
    np.testing.assert_array_equal(_np(results["xla"].tokens),
                                  _np(results["pallas"].tokens))
    np.testing.assert_allclose(_np(results["xla"].scores),
                               _np(results["pallas"].scores),
                               atol=1e-4, rtol=1e-4)


@pytest.fixture
def tiny_transformer():
    from image_captioning_ml_project_tpu.models.decoders import (
        TransformerDecoder)

    B, H, V = 4, 16, 29
    rng = np.random.RandomState(1)

    def build(kernel):
        dcfg = DecoderConfig(decoder_type=DecoderType.TRANSFORMER,
                             hidden_dim=H, num_layers=2, num_heads=4,
                             dropout=0.0, max_length=12,
                             decode_kernel=kernel)
        return TransformerDecoder(config=dcfg, vocab_size=V, pad_token_id=0,
                                  bos_token_id=1, eos_token_id=2)

    feats = {
        "features": jnp.asarray(rng.randn(B, 7, H).astype(np.float32)),
        "pooled_features": jnp.asarray(rng.randn(B, H).astype(np.float32)),
        "attention_mask": jnp.ones((B, 7), dtype=bool),
    }
    dec = build("xla")
    caps = jnp.asarray(rng.randint(3, V, (B, 5)))
    variables = dec.init(jax.random.PRNGKey(0), feats, caps)
    return build, variables, feats


def test_transformer_step_pallas_matches_xla(tiny_transformer):
    """Prefix-free kernel mode: the Transformer decoder's self-attention
    step through the fused kernel equals the XLA path."""
    build, variables, feats = tiny_transformer
    dec_x = build("xla")
    dec_p = build("pallas")
    L = 10
    state_x = dec_x.apply(variables, feats, L, method=dec_x.init_cache)
    state_p = dec_p.apply(variables, feats, L, method=dec_p.init_cache)
    toks = jnp.asarray([1, 5, 9, 12])
    for _ in range(4):
        lx, state_x = dec_x.apply(variables, state_x, toks, method=dec_x.step)
        lp, state_p = dec_p.apply(variables, state_p, toks, method=dec_p.step)
        np.testing.assert_allclose(_np(lx), _np(lp), atol=2e-4, rtol=2e-4)
        toks = jnp.argmax(lx, axis=-1).astype(jnp.int32)


def test_transformer_beam_pallas_matches_xla(tiny_transformer):
    build, variables, feats = tiny_transformer
    B, L, K = 4, 12, 5
    results = {}
    for kernel in ("xla", "pallas"):
        dec = build(kernel)
        state = dec.apply(variables, feats, L, method=dec.init_cache)

        def step_fn(s, t, dec=dec):
            return dec.apply(variables, s, t, method=dec.step)

        results[kernel] = beam_search(
            step_fn, state, B, K, bos_token_id=1, eos_token_id=2,
            pad_token_id=0, max_length=L, length_penalty=0.8)
    np.testing.assert_array_equal(_np(results["xla"].tokens),
                                  _np(results["pallas"].tokens))


@pytest.mark.slow
def test_fuzz_kernel_matches_oracle():
    """Seeded fuzz over kernel-eligible shapes (interpret mode): random
    B/K/S/P/heads/width/position/ancestry draws must match the reference
    attention to dtype tolerance. Complements the fixed-shape cases above
    with coverage of odd-but-legal corners (prefixless, K=1, pos at the
    cache edge, single-head)."""
    for trial in range(8):
        r = np.random.RandomState(7000 + trial)
        B = int(r.randint(1, 5))
        K = int(r.choice([1, 2, 5]))
        S = int(r.choice([8, 16, 24]))
        P = int(r.choice([0, 3, 8]))
        NH = int(r.choice([1, 2, 4]))
        H = NH * int(r.choice([8, 16, 64]))
        pos = int(r.randint(0, S))
        dt = jnp.bfloat16 if r.randint(0, 2) else jnp.float32
        Bk = B * K
        rngs = jax.random.split(jax.random.PRNGKey(9000 + trial), 8)
        q = jax.random.normal(rngs[0], (Bk, H), dt)
        kn = jax.random.normal(rngs[1], (Bk, H), dt)
        vn = jax.random.normal(rngs[2], (Bk, H), dt)
        kc = jax.random.normal(rngs[3], (Bk, S, H), dt)
        vc = jax.random.normal(rngs[4], (Bk, S, H), dt)
        pk = jax.random.normal(rngs[5], (B, P, H), dt) if P else None
        pv = jax.random.normal(rngs[6], (B, P, H), dt) if P else None
        anc = (jax.random.randint(rngs[7], (Bk, S), 0, K)
               if r.randint(0, 2) else None)
        scale = 1.0 / (H // NH) ** 0.5
        got = fused_beam_decode_attention(
            q, kn, vn, kc, vc, pk, pv, anc, jnp.asarray(pos),
            num_heads=NH, beam_size=K, scale=scale, interpret=True)
        want = reference_beam_decode_attention(
            q, kn, vn, kc, vc, pk, pv, anc, pos,
            num_heads=NH, beam_size=K, scale=scale)
        tol = 0.02 if dt == jnp.bfloat16 else 1e-5
        for g, w, name in zip(got, want, ("out", "k_cache", "v_cache")):
            np.testing.assert_allclose(
                _np(g.astype(jnp.float32)), _np(w.astype(jnp.float32)),
                atol=tol, rtol=tol,
                err_msg=f"trial {trial} {name} "
                        f"B={B} K={K} S={S} P={P} NH={NH} H={H} pos={pos}")


# --------------------------------------------------------------------------
# Folded kernel (in-kernel QKV + output projections): the pallas decode path
# now defaults to ONE pallas_call per layer (fused_beam_decode_attention_qkv,
# +3.2 ms/decode measured on the v5e — scripts/bench_fused_qkv.py). The
# pallas-vs-xla tests above already run it (the fold engages by default);
# these pin (a) exactness against the split formulation it replaced and
# (b) the eligibility contract.
# --------------------------------------------------------------------------

def test_folded_supported_shapes():
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        fused_decode_qkv_supported)

    # flagship: S=24 cache, H=768, beam 5 fits with the weight blocks
    assert fused_decode_qkv_supported(24, 768, jnp.bfloat16, 5)
    # narrow width: lane tiling fails (same rule as the split kernel)
    assert not fused_decode_qkv_supported(24, 16, jnp.bfloat16, 5)
    # a cache long enough to blow the envelope once weights are resident
    assert not fused_decode_qkv_supported(4096, 768, jnp.bfloat16, 5)


def test_folded_matches_split_standalone():
    """fused_beam_decode_attention_qkv == Dense-equivalent XLA projections
    around the split kernel, bit-for-bit (f32) / exactly (bf16): the fold
    changes WHERE the matmuls run, not their numerics."""
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        fused_beam_decode_attention_qkv)

    for dt in (jnp.float32, jnp.bfloat16):
        B, K, S, P, NH, H, pos = 3, 2, 16, 3, 4, 32, 5
        Bk = B * K
        rngs = jax.random.split(jax.random.PRNGKey(42), 9)
        x = jax.random.normal(rngs[0], (Bk, H), dt)
        wqkv = jax.random.normal(rngs[1], (H, 3 * H), dt) * 0.1
        bqkv = jax.random.normal(rngs[2], (3 * H,), dt) * 0.1
        wo = jax.random.normal(rngs[3], (H, H), dt) * 0.1
        bo = jax.random.normal(rngs[4], (H,), dt) * 0.1
        kc = jax.random.normal(rngs[5], (Bk, S, H), dt)
        vc = jax.random.normal(rngs[6], (Bk, S, H), dt)
        pk = jax.random.normal(rngs[7], (B, P, H), dt)
        pv = jax.random.normal(rngs[8], (B, P, H), dt)
        anc = jax.random.randint(rngs[0], (Bk, S), 0, K)
        scale = 1.0 / (H // NH) ** 0.5

        got = fused_beam_decode_attention_qkv(
            x, wqkv, bqkv, wo, bo, kc, vc, pk, pv, anc, jnp.asarray(pos),
            num_heads=NH, beam_size=K, scale=scale, interpret=True)

        # the split formulation this replaces (nn.Dense numerics: dot
        # rounded to the module dtype, then the dtype bias added)
        qkv = jax.lax.dot_general(
            x, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt) + bqkv
        q, kn, vn = qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:]
        out_s, kc_s, vc_s = fused_beam_decode_attention(
            q, kn, vn, kc, vc, pk, pv, anc, jnp.asarray(pos),
            num_heads=NH, beam_size=K, scale=scale, interpret=True)
        want_out = jax.lax.dot_general(
            out_s, wo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt) + bo

        np.testing.assert_array_equal(_np(got[0]), _np(want_out))
        np.testing.assert_array_equal(_np(got[1]), _np(kc_s))
        np.testing.assert_array_equal(_np(got[2]), _np(vc_s))


@pytest.mark.parametrize("fixture_name", ["tiny_gpt2", "tiny_transformer"])
def test_fold_knob_is_exact_through_model(fixture_name, request, monkeypatch):
    """ICT_DECODE_FOLD=0 (split) and =1 (folded) produce identical logits
    and caches through the real decoder step — the promotion changed the
    schedule, not the math. Covers both the prefixed (GPT-2) and
    prefix-free (Transformer) kernel modes.

    GPT-2 is bit-exact (both paths run ONE [H, 3H] QKV dot). The
    Transformer's split path runs three separate [H, H] dots that the fold
    concatenates into one [H, 3H] dot — identical on the MXU (systolic
    accumulation order per output column is width-independent) but ~1 ulp
    apart under this CPU test's Eigen GEMM, whose blocking depends on the
    output width; hence the f32-ulp tolerance there."""
    build, variables, feats = request.getfixturevalue(fixture_name)
    exact = fixture_name == "tiny_gpt2"

    def check(a, b):
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-6)

    dec = build("pallas")
    L = 10
    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("ICT_DECODE_FOLD", knob)
        state = dec.apply(variables, feats, L, method=dec.init_cache)
        toks = jnp.asarray([1, 5, 9, 12])
        logits_seq = []
        for _ in range(3):
            logits, state = dec.apply(variables, state, toks,
                                      method=dec.step)
            logits_seq.append(_np(logits))
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        results[knob] = (logits_seq, jax.tree_util.tree_map(_np, state))
    for a, b in zip(results["0"][0], results["1"][0]):
        check(a, b)
    jax.tree_util.tree_map(check, results["0"][1], results["1"][1])


def test_stack_dispatches_through_model(tiny_gpt2, monkeypatch):
    """Spy on the whole-stack kernel entry: the pallas path through the
    real GPT-2 decoder step must reach fused_beam_decode_stack — guards
    against a silent fall-back to the per-layer kernels (or XLA) behind
    the parity tests."""
    import image_captioning_ml_project_tpu.models.gpt2 as gpt2_mod
    import image_captioning_ml_project_tpu.ops.pallas_decode as pd

    calls = []
    real = pd.fused_beam_decode_stack

    def spy(*args, **kwargs):
        calls.append(args[0].shape)   # x [Bk, H]
        return real(*args, **kwargs)

    monkeypatch.setattr(gpt2_mod, "fused_beam_decode_stack", spy)
    monkeypatch.setattr(pd, "fused_beam_decode_stack", spy)
    build, variables, feats = tiny_gpt2
    dec = build("pallas")
    state = dec.apply(variables, feats, 10, method=dec.init_cache)
    assert "stacked" in state["lazy"], "stack cache layout not chosen"
    toks = jnp.asarray([1, 5, 9, 12])
    dec.apply(variables, state, toks, method=dec.step)
    assert calls, "whole-stack decode kernel never dispatched"


def test_folded_dispatches_through_model(tiny_gpt2, monkeypatch):
    """With the stack fold knocked out (ICT_DECODE_STACK=0), the pallas
    path must fall back to the per-layer folded kernel
    (fused_beam_decode_attention_qkv) — pins the fallback chain
    stack -> folded -> split -> xla."""
    import image_captioning_ml_project_tpu.models.gpt2 as gpt2_mod
    import image_captioning_ml_project_tpu.ops.pallas_decode as pd

    monkeypatch.setenv("ICT_DECODE_STACK", "0")
    calls = []
    real = pd.fused_beam_decode_attention_qkv

    def spy(*args, **kwargs):
        calls.append(args[0].shape)   # x [Bk, H]
        return real(*args, **kwargs)

    # gpt2.py imports the symbol at module scope; decoders.py resolves it
    # from ops.pallas_decode at call time — patch both entries
    monkeypatch.setattr(gpt2_mod, "fused_beam_decode_attention_qkv", spy)
    monkeypatch.setattr(pd, "fused_beam_decode_attention_qkv", spy)
    build, variables, feats = tiny_gpt2
    dec = build("pallas")
    state = dec.apply(variables, feats, 10, method=dec.init_cache)
    assert "stacked" not in state["lazy"]
    toks = jnp.asarray([1, 5, 9, 12])
    dec.apply(variables, state, toks, method=dec.step)
    assert calls, "folded decode kernel never dispatched"


# ---------------------------------------------------------------------------
# whole-stack kernel (all layers in one call)
# ---------------------------------------------------------------------------

def _stack_layer_oracle(x, lw, kc, vc, pk1, pv1, anc, pos, *, NH, K, eps):
    """One complete decoder layer in plain jnp with the kernel's exact
    dtype discipline: flax-exact LN, nn.Dense-exact projections, the
    attention oracle, gelu_new MLP, residuals."""
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        _stack_ln, reference_beam_decode_attention)

    H = x.shape[1]
    dt = x.dtype
    scale = 1.0 / (H // NH) ** 0.5

    def dense(h, w, b):
        y = jax.lax.dot_general(
            h, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(dt) + b

    h = _stack_ln(x, lw["g1"], lw["b1"], eps)
    qkv = dense(h, lw["wqkv"], lw["bqkv"])
    att, kc, vc = reference_beam_decode_attention(
        qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:], kc, vc, pk1, pv1,
        anc, pos, num_heads=NH, beam_size=K, scale=scale)
    x1 = x + dense(att.astype(dt), lw["wo"], lw["bo"])
    h2 = _stack_ln(x1, lw["g2"], lw["b2"], eps)
    y = jax.nn.gelu(dense(h2, lw["wfc"], lw["bfc"]), approximate=True)
    return x1 + dense(y, lw["wpj"], lw["bpj"]), kc, vc


@pytest.mark.parametrize("B,K,L,pos", [
    (4, 3, 3, 0),    # first step (fully masked suffix)
    (4, 3, 3, 5),    # mid-decode
    (6, 1, 2, 3),    # greedy (K=1, identity ancestry)
])
def test_stack_kernel_matches_layer_chain(B, K, L, pos):
    """fused_beam_decode_stack == chaining the per-layer oracle, for the
    outputs AND every layer's in-place cache append."""
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        STACK_WEIGHT_KEYS, fused_beam_decode_stack)

    S, P, NH, H = 8, 2, 2, 32
    dt = jnp.float32
    Bk = B * K
    rngs = iter(jax.random.split(jax.random.PRNGKey(pos * 7 + L), 24))
    x = jax.random.normal(next(rngs), (Bk, H), dt)
    kcs = jax.random.normal(next(rngs), (L, Bk, S, H), dt)
    vcs = jax.random.normal(next(rngs), (L, Bk, S, H), dt)
    pk = jax.random.normal(next(rngs), (L, B, P, H), dt) * 0.3
    pv = jax.random.normal(next(rngs), (L, B, P, H), dt) * 0.3
    anc = (jax.random.randint(next(rngs), (Bk, S), 0, K)
           if K > 1 else None)
    shapes = {"wqkv": (H, 3 * H), "bqkv": (3 * H,), "wo": (H, H),
              "bo": (H,), "g1": (H,), "b1": (H,), "g2": (H,), "b2": (H,),
              "wfc": (H, 4 * H), "bfc": (4 * H,), "wpj": (4 * H, H),
              "bpj": (H,)}
    stack = {k: jax.random.normal(next(rngs), (L,) + shp, dt)
             * (0.05 if k[0] == "w" else 0.02)
             for k, shp in shapes.items()}
    stack["g1"] = stack["g1"] + 1.0
    stack["g2"] = stack["g2"] + 1.0

    out, kn, vn = fused_beam_decode_stack(
        x, stack, kcs, vcs, pk, pv, anc, jnp.asarray(pos),
        num_heads=NH, beam_size=K, scale=1.0 / (H // NH) ** 0.5,
        interpret=True)

    xe = x
    for li in range(L):
        lw = {k: stack[k][li] for k in STACK_WEIGHT_KEYS}
        xe, kc_li, vc_li = _stack_layer_oracle(
            xe, lw, kcs[li], vcs[li], pk[li], pv[li], anc, pos,
            NH=NH, K=K, eps=1e-5)
        np.testing.assert_allclose(_np(kn[li]), _np(kc_li), atol=1e-5,
                                   rtol=1e-5, err_msg=f"k_cache layer {li}")
        np.testing.assert_allclose(_np(vn[li]), _np(vc_li), atol=1e-5,
                                   rtol=1e-5, err_msg=f"v_cache layer {li}")
    np.testing.assert_allclose(_np(out), _np(xe), atol=1e-4, rtol=1e-4)


def test_stack_tile_convention():
    """Beam search tiles lazy['stacked'] caches on axis 1 (layer-leading
    layout) and everything else on axis 0."""
    from image_captioning_ml_project_tpu.inference.decoding import \
        _tile_state

    state = {
        "lazy": {"stacked": {"k": jnp.arange(2 * 3 * 4).reshape(2, 3, 4)}},
        "shared": {"pk": jnp.ones((5, 3, 2))},
        "tokens": jnp.arange(3),
        "pos": jnp.zeros(()),
    }
    out = _tile_state(state, 2)
    assert out["lazy"]["stacked"]["k"].shape == (2, 6, 4)
    assert out["shared"]["pk"].shape == (5, 3, 2)  # untouched
    assert out["tokens"].shape == (6,)
    # rows repeat per image: [r0, r0, r1, r1, r2, r2]
    np.testing.assert_array_equal(
        _np(out["lazy"]["stacked"]["k"][:, 1]),
        _np(state["lazy"]["stacked"]["k"][:, 0]))


def test_stack_supported_shapes():
    """The whole-stack kernel's VMEM gate: flagship shapes fit; models the
    envelope cannot hold (giant caches, unaligned widths) must fall back
    before Mosaic sees them."""
    from image_captioning_ml_project_tpu.ops.pallas_decode import (
        fused_decode_stack_supported)

    assert fused_decode_stack_supported(24, 768)       # flagship GPT-2
    assert not fused_decode_stack_supported(24, 16)    # narrow demo width
    assert not fused_decode_stack_supported(20, 768)   # unaligned cache
    assert not fused_decode_stack_supported(8192, 768)  # cache >> VMEM


def test_stack_knob_reverts_layout(tiny_gpt2, monkeypatch):
    """ICT_DECODE_STACK=0 must produce the per-layer cache layout AND the
    same tokens as the stacked layout (the fallback chain is
    numerically interchangeable)."""
    build, variables, feats = tiny_gpt2
    B, L, K = 4, 12, 5
    results = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("ICT_DECODE_STACK", knob)
        dec = build("pallas")
        state = dec.apply(variables, feats, L, method=dec.init_cache)
        assert ("stacked" in state["lazy"]) == (knob == "1")

        def step_fn(s, t, dec=dec):
            return dec.apply(variables, s, t, method=dec.step)

        results[knob] = beam_search(
            step_fn, state, B, K, bos_token_id=1, eos_token_id=2,
            pad_token_id=0, max_length=L, length_penalty=0.8)
    np.testing.assert_array_equal(_np(results["1"].tokens),
                                  _np(results["0"].tokens))
