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
