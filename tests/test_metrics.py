"""Metric tests: known-value checks and cross-validation against
pycocoevalcap semantics where computable by hand."""

import math

import numpy as np
import pytest

from image_captioning_ml_project_tpu.evaluate.metrics import (
    bleu,
    calculate_metrics,
    calculate_metrics_native,
    cider_d,
    meteor_lite,
    metric_tokenize,
    per_sample_cider,
    rouge_l,
)


def test_metric_tokenize():
    assert metric_tokenize("A man, riding!") == ["a", "man", "riding"]


def test_bleu_perfect_match():
    gen = [["a", "man", "riding", "a", "horse"]]
    refs = [[["a", "man", "riding", "a", "horse"]]]
    scores, ps = bleu(gen, refs)
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)
    assert ps[0, 3] == pytest.approx(1.0, abs=1e-6)


def test_bleu_no_overlap():
    gen = [["x", "y", "z", "w"]]
    refs = [[["a", "b", "c", "d"]]]
    scores, _ = bleu(gen, refs)
    assert scores[0] < 1e-6


def test_bleu_hand_computed():
    # candidate: "the cat sat", ref: "the cat sat down"
    gen = [["the", "cat", "sat"]]
    refs = [[["the", "cat", "sat", "down"]]]
    scores, _ = bleu(gen, refs)
    # p1=1, p2=1, BP=exp(1-4/3)
    bp = math.exp(1 - 4 / 3)
    assert scores[0] == pytest.approx(bp, rel=1e-6)
    assert scores[1] == pytest.approx(bp, rel=1e-6)


def test_rouge_l_known():
    gen = [["the", "cat", "sat"]]
    refs = [[["the", "cat", "sat", "down"]]]
    score, ps = rouge_l(gen, refs)
    prec, rec, beta = 1.0, 3 / 4, 1.2
    want = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
    assert score == pytest.approx(want, rel=1e-6)


def test_rouge_l_max_prec_and_recall_across_refs():
    """pycocoevalcap combines the max precision and max recall taken
    independently across references — NOT the best per-reference F.
    cand='a b': ref1 gives prec 1.0 (rec 1/3), ref2 gives rec 0.5
    (prec 0.5); the score must use (1.0, 0.5), not max-F 0.5."""
    gen = [["a", "b"]]
    refs = [[["a", "b", "c", "d", "e", "f"], ["b", "y"]]]
    score, _ = rouge_l(gen, refs)
    beta = 1.2
    prec_max, rec_max = 1.0, 0.5
    want = (1 + beta ** 2) * prec_max * rec_max \
        / (rec_max + beta ** 2 * prec_max)
    assert score == pytest.approx(want, rel=1e-6)
    # and strictly above the best per-reference F-measure
    f2 = (1 + beta ** 2) * 0.5 * 0.5 / (0.5 + beta ** 2 * 0.5)
    assert score > f2


def test_cider_identical_is_ten():
    gen = [["a", "man", "riding", "a", "horse"],
           ["a", "dog", "in", "the", "park"]]
    refs = [[gen[0]], [gen[1]]]
    score, ps = cider_d(gen, refs)
    # identical candidate == its only ref -> cosine 1 per n, length delta 0
    np.testing.assert_allclose(ps, 10.0, rtol=1e-6)
    assert score == pytest.approx(10.0, rel=1e-6)


def test_cider_orders_quality():
    refs = [[["a", "man", "riding", "a", "horse"],
             ["a", "person", "on", "a", "horse"]],
            [["a", "dog", "in", "the", "park"],
             ["a", "puppy", "playing", "outside"]]]
    good = [["a", "man", "riding", "a", "horse"], ["a", "dog", "in", "the", "park"]]
    bad = [["blue", "refrigerator", "quantum"], ["seven", "ideas", "sleep"]]
    s_good, _ = cider_d(good, refs)
    s_bad, _ = cider_d(bad, refs)
    assert s_good > s_bad
    assert s_bad == pytest.approx(0.0, abs=1e-6)


def test_meteor_identical_near_one():
    gen = [["a", "man", "riding", "a", "horse"]]
    refs = [[gen[0]]]
    score, _ = meteor_lite(gen, refs)
    # perfect match: fmean=1, 1 chunk over 5 matches -> tiny penalty
    assert score == pytest.approx(1 - 0.5 * (1 / 5) ** 3, rel=1e-6)


def test_meteor_stem_stage_hand_computed():
    # "the cat is running" vs "the cats run": exact {the}, stem
    # {cat~cats, running~run} -> m=3 of cand-len 4, ref-len 3.
    # Alignment pairs (ci,ri): (0,0),(1,1),(3,2) -> (0,0)->(1,1) is
    # contiguous (one chunk), (1,1)->(3,2) breaks -> 2 chunks.
    gen = [["the", "cat", "is", "running"]]
    refs = [[["the", "cats", "run"]]]
    score, _ = meteor_lite(gen, refs)
    prec, rec = 3 / 4, 3 / 3
    fmean = prec * rec / (0.9 * prec + 0.1 * rec)
    want = fmean * (1 - 0.5 * (2 / 3) ** 3)
    assert score == pytest.approx(want, rel=1e-6)


def test_meteor_fewest_chunks_alignment():
    # cand "a a b" vs ref "a b a": b must map to r1; the two a's map to
    # {r0, r2}. First-found greedy picks a0->r0, a1->r2 giving pairs
    # (0,0),(1,2),(2,1) = 3 chunks. The optimal assignment a0->r2,
    # a1->r0 gives (0,2),(1,0),(2,1) where (1,0)->(2,1) is contiguous =
    # 2 chunks. m=3, P=R=1, fmean=1.
    gen = [["a", "a", "b"]]
    refs = [[["a", "b", "a"]]]
    score, _ = meteor_lite(gen, refs)
    assert score == pytest.approx(1 - 0.5 * (2 / 3) ** 3, rel=1e-6)


def test_meteor_align_crossed_pairs_and_no_match():
    from image_captioning_ml_project_tpu.evaluate.metrics import _meteor_align

    # both words of the candidate match somewhere; maximum matching is 2
    # and the minimum chunk count is 2 (crossed pairs can't be contiguous)
    m, chunks = _meteor_align(["cat", "dog"], ["dog", "cat"])
    assert (m, chunks) == (2, 2)
    # unmatched-only words contribute nothing
    m, chunks = _meteor_align(["x", "y"], ["p", "q"])
    assert (m, chunks) == (0, 0)


def test_meteor_align_budget_exhaustion_returns_feasible_chunks():
    """A tripped DFS node budget must fall back to the seeded maximum
    matching's chunk count — a real, achievable alignment — never the
    old chunks=len(cand)+1 sentinel that drove penalty > 1 and silently
    zeroed the sample's METEOR score."""
    from image_captioning_ml_project_tpu.evaluate.metrics import _meteor_align

    # pathological duplication (degenerate SCST-style output)
    cand = ["a"] * 12 + ["b"] * 12
    ref = ["b"] * 12 + ["a"] * 12
    m, chunks = _meteor_align(cand, ref, node_budget=0)
    assert m == 24
    assert 1 <= chunks <= m  # feasible, not the m+1 sentinel
    # and the score pipeline stays positive for a caption full of matches
    score, _ = meteor_lite([cand], [[ref]])
    assert score > 0.0


def test_calculate_metrics_native_keys():
    out = calculate_metrics_native(
        ["a man riding a horse"], [["a man riding a horse", "a person rides"]])
    for k in ["Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]:
        assert k in out
        assert np.isfinite(out[k])


def test_calculate_metrics_entry():
    out = calculate_metrics(["a man riding"], [["a man riding"]])
    assert out["Bleu_1"] == pytest.approx(1.0, abs=1e-4)


def test_per_sample_cider_discriminates():
    # distinct refs across the corpus so n-grams have non-zero idf
    gens = ["a man riding a horse", "completely unrelated words here"]
    refs = [["a man riding a horse"], ["a dog in the park"]]
    ps = per_sample_cider(gens, refs)
    assert ps.shape == (2,)
    assert ps[0] > 5.0  # perfect match on its own refs
    assert ps[1] == pytest.approx(0.0, abs=1e-6)


def test_evaluate_model_on_coco(tmp_path):
    """Full-COCO eval path: every image captioned once, results.json written."""
    import numpy as np
    from image_captioning_ml_project_tpu.data.synthetic import make_synthetic_coco
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.data.coco import COCOCaptionDataset
    from image_captioning_ml_project_tpu.evaluate.coco_eval import (
        evaluate_model_on_coco)
    import json, os

    root = make_synthetic_coco(str(tmp_path / "coco"), num_images=5,
                               captions_per_image=2, image_size=32)
    with open(os.path.join(root, "annotations/captions_val2014.json")) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)
    ds = COCOCaptionDataset(root, "annotations/captions_val2014.json",
                            "val2014", vocab, image_size=32, max_length=12,
                            is_training=False)

    def decode_batch_fn(batch):
        # fake decoder: echo the first reference caption tokens
        return np.asarray(batch["caption_tokens"])[:, 0, :]

    results_file = str(tmp_path / "results.json")
    # batch size 2 with 5 images: exercises the padded final batch
    metrics = evaluate_model_on_coco(decode_batch_fn, ds, vocab,
                                     batch_size=2, results_file=results_file)
    results = json.load(open(results_file))
    assert len(results) == 5  # every image exactly once
    assert len({r["image_id"] for r in results}) == 5
    # echoing the reference -> near-perfect BLEU-1
    assert metrics["Bleu_1"] > 0.95
    # no results_file + an annotation_file: must not crash on loadRes("")
    # (falls back to loader-collected refs)
    m2 = evaluate_model_on_coco(
        decode_batch_fn, ds, vocab, batch_size=2, results_file="",
        annotation_file=os.path.join(
            root, "annotations/captions_val2014.json"))
    assert m2["Bleu_1"] > 0.95


# ---------------------------------------------------------------------------
# Independent CIDEr-D oracle (VERDICT r3 #2)
# ---------------------------------------------------------------------------
# Written from Vedantam et al., "CIDEr: Consensus-based Image Description
# Evaluation" (CVPR 2015) — eq. (1)-(3) plus the CIDEr-D modifications
# (count clipping and the gaussian length penalty, sigma=6, x10 scaling)
# as published in the pycocoevalcap scorer that produced the reference's
# numbers. Deliberately NOT derived from evaluate/metrics.py: it builds
# explicit dense tf-idf vectors over an n-gram index and computes cosines
# with numpy, so a systematic defect in the package's dict-walk
# implementation (wrong IDF base, wrong sigma, missing clipping, wrong
# normalization order) would show up as a fuzz divergence.


def _oracle_cider_d(hyps, refs_corpus, df_corpus=None, max_n=4, sigma=6.0):
    """Returns (corpus_score, per_sample). ``df_corpus`` defaults to
    ``refs_corpus`` (standard eval); pass a larger corpus to mirror the
    SCST precomputed-df path."""
    if df_corpus is None:
        df_corpus = refs_corpus
    n_docs = len(df_corpus)

    def grams(toks, n):
        return [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    # n-gram -> dense column index, one table per order
    vocab = [dict() for _ in range(max_n)]
    for sentences in ([r for refs in df_corpus for r in refs]
                      + [r for refs in refs_corpus for r in refs] + hyps):
        for n in range(max_n):
            for g in grams(sentences, n + 1):
                vocab[n].setdefault(g, len(vocab[n]))

    # document frequency: one count per *image* whose reference set
    # mentions the n-gram (paper §3: "the number of images for which
    # the n-gram occurs in any of its reference sentences")
    df = [np.zeros(len(v)) for v in vocab]
    for refs in df_corpus:
        for n in range(max_n):
            seen = set()
            for ref in refs:
                seen.update(grams(ref, n + 1))
            for g in seen:
                df[n][vocab[n][g]] += 1.0
    idf = [np.log(max(n_docs, 1)) - np.log(np.maximum(d, 1.0)) for d in df]

    def tfidf(toks):
        out = []
        for n in range(max_n):
            v = np.zeros(len(vocab[n]))
            for g in grams(toks, n + 1):
                v[vocab[n][g]] += 1.0
            out.append(v * idf[n])
        return out

    per_sample = np.zeros(len(hyps))
    for i, (hyp, refs) in enumerate(zip(hyps, refs_corpus)):
        hv = tfidf(hyp)
        acc = 0.0
        for ref in refs:
            rv = tfidf(ref)
            gauss = math.exp(-((len(hyp) - len(ref)) ** 2)
                             / (2.0 * sigma * sigma))
            for n in range(max_n):
                num = float(np.minimum(hv[n], rv[n]) @ rv[n])  # CIDEr-D clip
                den = float(np.linalg.norm(hv[n]) * np.linalg.norm(rv[n]))
                acc += (num / den if den > 0.0 else 0.0) * gauss / max_n
        per_sample[i] = 10.0 * acc / max(len(refs), 1)
    return float(per_sample.mean()), per_sample


def _random_cider_corpus(r, words, n_img):
    """Candidates mix exact refs, perturbed refs, and unrelated strings."""
    hyps, refs = [], []
    for _ in range(n_img):
        rs = [[r.choice(words) for _ in range(r.randint(1, 15))]
              for _ in range(r.randint(1, 5))]
        mode = r.random()
        if mode < 0.3:
            cand = list(r.choice(rs))
        elif mode < 0.7:
            cand = list(r.choice(rs))
            cand[r.randrange(len(cand))] = r.choice(words)
            if r.random() < 0.5:
                cand.append(r.choice(words))
        else:
            cand = [r.choice(words) for _ in range(r.randint(1, 15))]
        hyps.append(cand)
        refs.append(rs)
    return hyps, refs


def test_fuzz_cider_d_matches_paper_oracle():
    """Host cider_d vs the independent from-the-paper oracle over random
    corpora sweeping vocab size, caption length, ref count, and image
    count (per-sample arrays compared, not just the corpus mean)."""
    import random

    r = random.Random(20260819)
    for trial in range(12):
        vocab_size = r.choice([3, 8, 20, 60])
        words = [f"v{i}" for i in range(vocab_size)]
        hyps, refs = _random_cider_corpus(r, words, r.randint(2, 25))
        got_mean, got_ps = cider_d(hyps, refs)
        want_mean, want_ps = _oracle_cider_d(hyps, refs)
        np.testing.assert_allclose(got_ps, want_ps, rtol=1e-8, atol=1e-10,
                                   err_msg=f"trial {trial} (V={vocab_size})")
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-8)


def test_fuzz_cider_d_precomputed_df_matches_oracle():
    """The SCST reward path precomputes df over a larger (train) corpus
    and passes it into cider_d; the oracle recomputes from that corpus."""
    import random

    from image_captioning_ml_project_tpu.evaluate.metrics import (
        cider_document_frequency)

    r = random.Random(77)
    words = [f"w{i}" for i in range(30)]
    for trial in range(6):
        _, df_refs = _random_cider_corpus(r, words, r.randint(10, 40))
        hyps, refs = _random_cider_corpus(r, words, r.randint(2, 10))
        df = cider_document_frequency(df_refs)
        got_mean, got_ps = cider_d(hyps, refs, df=df,
                                   log_num_images=math.log(len(df_refs)))
        want_mean, want_ps = _oracle_cider_d(hyps, refs, df_corpus=df_refs)
        np.testing.assert_allclose(got_ps, want_ps, rtol=1e-8, atol=1e-10,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-8)


def test_fuzz_corpus_bleu_matches_nltk():
    """Independent oracle: our corpus BLEU-1..4 vs nltk's corpus_bleu on
    random corpora (candidates built by perturbing references so all
    n-gram orders have nonzero counts — where the epsilon smoothing
    styles coincide to ~1e-6)."""
    import random

    from nltk.translate.bleu_score import corpus_bleu

    from image_captioning_ml_project_tpu.evaluate.metrics import bleu

    r = random.Random(2024)
    words = [f"w{i}" for i in range(25)]
    for trial in range(8):
        n_img = r.randint(3, 8)
        hyps, refs = [], []
        for _ in range(n_img):
            ref1 = [r.choice(words) for _ in range(r.randint(6, 14))]
            ref2 = [r.choice(words) for _ in range(r.randint(6, 14))]
            # candidate = ref1 with a small perturbation (guarantees
            # matched n-grams at every order)
            cand = list(ref1)
            if r.random() < 0.7 and len(cand) > 7:
                cand[r.randrange(2, len(cand) - 3)] = r.choice(words)
            hyps.append(cand)
            refs.append([ref1, ref2])
        ours, _ = bleu(hyps, refs)
        for n in range(1, 5):
            want = corpus_bleu(refs, hyps,
                               weights=tuple([1.0 / n] * n))
            np.testing.assert_allclose(
                ours[n - 1], want, rtol=1e-5, atol=1e-7,
                err_msg=f"trial {trial} BLEU-{n}")


def test_fuzz_rouge_l_matches_independent_lcs():
    """Independent oracle for ROUGE-L: a from-scratch DP LCS + the
    pycocoevalcap combination rule (max precision and max recall taken
    independently across references, beta=1.2) on random corpora."""
    import random

    def lcs(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        return dp[-1][-1]

    r = random.Random(555)
    words = [f"t{i}" for i in range(12)]
    for trial in range(10):
        hyps, refs = [], []
        for _ in range(r.randint(2, 6)):
            hyps.append([r.choice(words) for _ in range(r.randint(2, 10))])
            refs.append([[r.choice(words) for _ in range(r.randint(2, 10))]
                         for _ in range(r.randint(1, 3))])
        got, per = rouge_l(hyps, refs)
        beta = 1.2
        want_per = []
        for cand, rs in zip(hyps, refs):
            prec = max(lcs(cand, ref) / len(cand) for ref in rs)
            rec = max(lcs(cand, ref) / len(ref) for ref in rs)
            if prec and rec:
                want_per.append((1 + beta ** 2) * prec * rec
                                / (rec + beta ** 2 * prec))
            else:
                want_per.append(0.0)
        np.testing.assert_allclose(per, want_per, rtol=1e-6, atol=1e-9,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(got, np.mean(want_per), rtol=1e-6)
