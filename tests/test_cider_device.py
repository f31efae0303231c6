"""On-device CIDEr must match the host CIDEr-D implementation when run over
the same token sequences (ids treated as words on the host side)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.evaluate.cider_device import (
    build_df_table,
    encode_references,
    per_sample_cider_device,
)
from image_captioning_ml_project_tpu.evaluate.metrics import cider_d
from image_captioning_ml_project_tpu.ops.ngram import (
    lookup_sorted,
    ngram_hashes,
    ngram_hashes_np,
)

PAD, BOS, EOS = 0, 1, 2
SPECIALS = (PAD, BOS, EOS)


def toks_to_words(toks):
    return [str(t) for t in toks if t not in SPECIALS]


def make_corpus(rng, num_images=6, refs_per=3, vocab=30, max_len=12):
    refs = []
    for _ in range(num_images):
        image_refs = []
        for _ in range(refs_per):
            n = rng.randint(3, max_len - 2)
            seq = [BOS] + rng.randint(3, vocab, n).tolist() + [EOS]
            image_refs.append(seq)
        refs.append(image_refs)
    return refs


def test_ngram_hash_device_matches_host(rng):
    toks = rng.randint(3, 50, 10).astype(np.int32)
    for n in range(1, 5):
        host = ngram_hashes_np(toks.astype(np.uint32), n)
        dev, valid = ngram_hashes(jnp.asarray(toks),
                                  n, jnp.ones(10, dtype=bool))
        dev = np.asarray(dev)[np.asarray(valid)]
        np.testing.assert_array_equal(host, dev)


def test_lookup_sorted():
    table = jnp.asarray(np.array([3, 7, 11], dtype=np.uint32))
    payload = jnp.asarray(np.array([0.3, 0.7, 1.1], dtype=np.float32))
    vals = jnp.asarray(np.array([7, 5, 11, 99], dtype=np.uint32))
    out = np.asarray(lookup_sorted(table, vals, jnp.float32(-1.0), payload))
    np.testing.assert_allclose(out, [0.7, -1.0, 1.1, -1.0], rtol=1e-6)


def test_device_cider_matches_host(rng):
    refs = make_corpus(rng)
    B = len(refs)
    # candidates: one perfect match, others noisy
    cands = []
    for i, image_refs in enumerate(refs):
        if i == 0:
            cands.append(list(image_refs[0]))
        else:
            n = rng.randint(3, 9)
            cands.append([BOS] + rng.randint(3, 30, n).tolist() + [EOS])

    df = build_df_table(refs, special_ids=SPECIALS)
    ref_tokens, ref_valid = encode_references(refs, max_refs=3, max_len=14)
    L = 14
    cand_arr = np.zeros((B, L), dtype=np.int32)
    for i, c in enumerate(cands):
        cand_arr[i, : len(c)] = c[:L]

    device_scores = np.asarray(per_sample_cider_device(
        jnp.asarray(cand_arr), jnp.asarray(ref_tokens),
        jnp.asarray(ref_valid), df, special_ids=SPECIALS))

    # host reference computation over the same corpus (ids as words)
    gen_words = [toks_to_words(c) for c in cands]
    ref_words = [[toks_to_words(r) for r in image_refs]
                 for image_refs in refs]
    _, host_scores = cider_d(gen_words, ref_words)

    np.testing.assert_allclose(device_scores, host_scores, rtol=1e-4,
                               atol=1e-4)
    assert device_scores[0] > device_scores[1:].max()  # perfect match wins


def test_token_zero_is_a_real_word_when_not_special(rng):
    """GPT-2's id 0 is the real token "!": with special_ids that do NOT
    include 0 (flagship pad/bos/eos are ~50256), a reference containing
    token 0 must count toward matches — the packing sentinel is -1, not
    0 — and the device score must still match the host scorer."""
    specials = (50256,)
    refs = [[[0, 5, 6, 0, 7], [5, 6, 7]],
            [[8, 9, 10, 11], [9, 10, 0]]]
    cands = [[0, 5, 6, 0, 7],   # exact match incl. the token-0 positions
             [8, 9, 10, 11]]
    df = build_df_table(refs, special_ids=specials)
    ref_tokens, ref_valid = encode_references(refs, max_refs=2, max_len=8)
    assert (ref_tokens[0, 0, :5] == np.asarray([0, 5, 6, 0, 7])).all()
    assert (ref_tokens[:, :, 5:] == -1).all()  # sentinel, not 0

    L = 8
    cand_arr = np.full((2, L), 50256, dtype=np.int32)
    for i, c in enumerate(cands):
        cand_arr[i, : len(c)] = c
    device_scores = np.asarray(per_sample_cider_device(
        jnp.asarray(cand_arr), jnp.asarray(ref_tokens),
        jnp.asarray(ref_valid), df, special_ids=specials))

    def words(toks):
        return [str(t) for t in toks if t not in specials]

    gen_words = [words(c) for c in cands]
    ref_words = [[words(r) for r in image_refs] for image_refs in refs]
    _, host_scores = cider_d(gen_words, ref_words)
    np.testing.assert_allclose(device_scores, host_scores, rtol=1e-4,
                               atol=1e-4)
    # the exact match (5 tokens incl. two zeros) must score near 10
    assert device_scores[0] > 5.0


def test_device_cider_under_jit(rng):
    refs = make_corpus(rng, num_images=4)
    df = build_df_table(refs, special_ids=SPECIALS)
    ref_tokens, ref_valid = encode_references(refs, max_refs=3, max_len=14)
    cand = jnp.asarray(np.tile(np.array(refs[0][0] + [PAD] * 3,
                                        dtype=np.int32)[None], (4, 1)))

    f = jax.jit(lambda c: per_sample_cider_device(
        c, jnp.asarray(ref_tokens), jnp.asarray(ref_valid), df,
        special_ids=SPECIALS))
    out = np.asarray(f(cand))
    assert out.shape == (4,)
    assert np.isfinite(out).all()
    assert out[0] > 0


@pytest.mark.slow
def test_fuzz_device_cider_matches_host():
    """Seeded fuzz: random corpora (vocab sizes, ref counts, lengths,
    duplicate candidates, empty-after-strip candidates) — device CIDEr-D
    must track the host scorer on every draw."""
    for trial in range(10):
        r = np.random.RandomState(4000 + trial)
        num_images = int(r.randint(2, 8))
        refs_per = int(r.randint(1, 4))
        vocab = int(r.choice([10, 30, 200]))
        max_len = int(r.choice([8, 14, 20]))
        refs = []
        for _ in range(num_images):
            image_refs = []
            for _ in range(refs_per):
                n = int(r.randint(1, max_len - 2))
                image_refs.append([BOS] + r.randint(3, vocab, n).tolist()
                                  + [EOS])
            refs.append(image_refs)
        cands = []
        for i, image_refs in enumerate(refs):
            mode = r.randint(0, 4)
            if mode == 0:  # perfect match
                cands.append(list(image_refs[0]))
            elif mode == 1:  # empty after stripping specials
                cands.append([BOS, EOS])
            else:  # noise
                n = int(r.randint(1, max_len - 2))
                cands.append([BOS] + r.randint(3, vocab, n).tolist() + [EOS])

        df = build_df_table(refs, special_ids=SPECIALS)
        ref_tokens, ref_valid = encode_references(refs, max_refs=refs_per,
                                                  max_len=max_len)
        cand_arr = np.zeros((num_images, max_len), dtype=np.int32)
        for i, c in enumerate(cands):
            cand_arr[i, : min(len(c), max_len)] = c[:max_len]

        device_scores = np.asarray(per_sample_cider_device(
            jnp.asarray(cand_arr), jnp.asarray(ref_tokens),
            jnp.asarray(ref_valid), df, special_ids=SPECIALS))
        gen_words = [toks_to_words(c[:max_len]) for c in cands]
        ref_words = [[toks_to_words(x[:max_len]) for x in image_refs]
                     for image_refs in refs]
        _, host_scores = cider_d(gen_words, ref_words)
        np.testing.assert_allclose(
            device_scores, host_scores, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial} (imgs={num_images} refs={refs_per} "
                    f"V={vocab} L={max_len})")
