"""Round-2 correctness fixes: post-EOS padding/truncation, eval-CLI
multi-chip batching + CLIP reranking wiring, validation coverage, top-k tie
order, ITM derangement, checkpoint path resolution, BUTD curriculum counts."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_captioning_ml_project_tpu.config import (
    AttentionType,
    DecoderType,
    EncoderType,
    get_default_config,
)
from image_captioning_ml_project_tpu.inference.decoding import greedy_decode

V = 6
EOS = 2
PAD = 0
BOS = 1


def _eos_happy_step(eos_after: int):
    """Markov step: deterministic chain 3 -> 4 -> EOS -> (post-EOS junk 5)."""
    trans = np.full((V, V), -10.0, dtype=np.float32)
    trans[BOS, 3] = 10.0
    trans[3, 4] = 10.0
    trans[4, EOS] = 10.0
    trans[EOS, 5] = 10.0   # junk the model would emit after EOS
    trans[PAD, 5] = 10.0
    trans[5, 5] = 10.0
    t = jnp.asarray(trans)

    def step_fn(state, tokens):
        return t[tokens], state

    return step_fn


def test_greedy_pads_after_eos():
    step = _eos_happy_step(3)
    state = jnp.zeros((2, 1))
    tokens = jax.jit(lambda s: greedy_decode(
        step, s, 2, BOS, 8, eos_token_id=EOS, pad_token_id=PAD))(state)
    tokens = np.asarray(tokens)
    # BOS, 3, 4, EOS, then pads — never the junk token 5
    np.testing.assert_array_equal(tokens[0], [BOS, 3, 4, EOS, PAD, PAD, PAD, PAD])


def test_greedy_without_eos_arg_keeps_reference_shape():
    """Back-compat: omitting eos keeps the raw argmax stream."""
    step = _eos_happy_step(3)
    state = jnp.zeros((1, 1))
    tokens = np.asarray(greedy_decode(step, state, 1, BOS, 6))
    np.testing.assert_array_equal(tokens[0], [BOS, 3, 4, EOS, 5, 5])


def test_scst_advantage_invariant_to_post_eos_junk():
    """The on-device CIDEr reward of a padded-after-EOS sequence equals the
    reward of its EOS-truncated form, and differs from the junk-carrying
    variant — so the fixed greedy baseline no longer biases advantages."""
    from image_captioning_ml_project_tpu.evaluate.cider_device import (
        build_df_table,
        encode_references,
        per_sample_cider_device,
    )

    corpus = [[[4, 5, 6, 7], [4, 5, 7]], [[8, 9, 10]], [[11, 12, 4]]]
    df = build_df_table(corpus, special_ids=(PAD, BOS, EOS))
    ref_tokens, ref_valid = encode_references(corpus[:1], max_refs=2,
                                              max_len=8)

    clean = jnp.asarray([[BOS, 4, 5, 6, EOS, PAD, PAD, PAD]])
    junk = jnp.asarray([[BOS, 4, 5, 6, EOS, 9, 9, 9]])
    args = (jnp.asarray(ref_tokens), jnp.asarray(ref_valid), df,
            (PAD, BOS, EOS))
    r_clean = float(per_sample_cider_device(clean, *args)[0])
    r_junk = float(per_sample_cider_device(junk, *args)[0])
    assert r_clean > r_junk  # junk n-grams dilute the reward if unstripped
    # truncated == padded (specials stripped on device)
    trunc = jnp.asarray([[BOS, 4, 5, 6, EOS, EOS, EOS, EOS]])
    r_trunc = float(per_sample_cider_device(trunc, *args)[0])
    assert abs(r_clean - r_trunc) < 1e-6


# ---------------------------------------------------------------------------
# tokenizer decode truncation + BOS framing
# ---------------------------------------------------------------------------


@pytest.fixture()
def bpe_files(tmp_path):
    from image_captioning_ml_project_tpu.data.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    merges = [("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"), ("a", "n"), ("an", "d"),
              ("i", "n"), ("in", "g"), ("Ġ", "a"), ("c", "a"), ("ca", "t")]
    vocab_tokens = units + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_tokens)}
    vocab_file = str(tmp_path / "vocab.json")
    merges_file = str(tmp_path / "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges) + "\n")
    return vocab_file, merges_file


def test_bpe_decode_drops_post_eos_junk(bpe_files):
    from image_captioning_ml_project_tpu.data.bpe import GPT2BPETokenizer

    tok = GPT2BPETokenizer(*bpe_files)
    cat = tok.tokenize_ids("the cat")
    and_ids = tok.tokenize_ids(" and")
    eot = tok.eos_token_id
    # generated stream: BOS(=eot), "the cat", EOS(=eot), junk " and"
    ids = [eot] + cat + [eot] + and_ids
    assert tok.decode(ids) == "the cat"
    # fully-padded row decodes to empty
    assert tok.decode([eot] * 6) == ""


def test_bpe_encode_prepends_bos(bpe_files):
    from image_captioning_ml_project_tpu.data.bpe import GPT2BPETokenizer

    tok = GPT2BPETokenizer(*bpe_files)
    ids, mask = tok.encode("the cat", max_length=10)
    n = int(mask.sum())
    assert ids[0] == tok.bos_token_id
    assert ids[n - 1] == tok.eos_token_id
    assert tok.decode(ids) == "the cat"


def test_hf_adapter_decode_truncates_at_eos(bpe_files):
    from transformers import GPT2Tokenizer

    from image_captioning_ml_project_tpu.data.tokenizer import (
        HFTokenizerAdapter)

    hf = GPT2Tokenizer(vocab_file=bpe_files[0], merges_file=bpe_files[1])
    adapter = HFTokenizerAdapter(hf)
    eot = adapter.eos_token_id
    cat = hf.encode("the cat")
    junk = hf.encode(" and")
    assert adapter.decode([eot] + cat + [eot] + junk) == "the cat"
    ids, mask = adapter.encode("the cat", max_length=10)
    assert ids[0] == adapter.bos_token_id
    assert ids[int(mask.sum()) - 1] == adapter.eos_token_id
    assert adapter.decode(ids) == "the cat"


def test_hf_adapter_bert_style_tokenizer(tmp_path):
    """cls/sep tokenizers through the adapter: eos falls back to [SEP]
    (BERT has no eos), and add_special_tokens=False prevents a second
    [CLS]...[SEP] frame inside the adapter's own BOS/EOS framing."""
    from transformers import BertTokenizerFast

    from image_captioning_ml_project_tpu.data.tokenizer import (
        HFTokenizerAdapter)

    vocab_tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "sat"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab_tokens))
    hf = BertTokenizerFast(vocab_file=str(vf), do_lower_case=True)
    adapter = HFTokenizerAdapter(hf)
    assert adapter.eos_token_id == hf.sep_token_id
    ids, mask = adapter.encode("a cat sat", max_length=10)
    n = int(mask.sum())
    inner = list(ids[1: n - 1])
    # exactly one BOS and one EOS; no doubled specials inside
    assert ids[0] == adapter.bos_token_id
    assert ids[n - 1] == adapter.eos_token_id
    assert hf.cls_token_id not in inner and hf.sep_token_id not in inner
    assert inner == hf.encode("a cat sat", add_special_tokens=False)
    assert adapter.decode(ids) == "a cat sat"


# ---------------------------------------------------------------------------
# top-k tie order
# ---------------------------------------------------------------------------


def test_two_stage_top_k_tie_indices_match_lax():
    from image_captioning_ml_project_tpu.ops.topk import two_stage_top_k

    # exact score ties spread across many blocks
    x = np.zeros((2, 4096), dtype=np.float32)
    x[0, [7, 600, 1500, 3000]] = 1.0      # ties in 4 different 512-blocks
    x[1, [100, 101, 2000]] = 2.0
    x[1, 3500] = 3.0
    xv = jnp.asarray(x)
    want_v, want_i = jax.lax.top_k(xv, 6)
    got_v, got_i = two_stage_top_k(xv, 6, block=512)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_two_stage_top_k_all_equal_rows():
    from image_captioning_ml_project_tpu.ops.topk import two_stage_top_k

    x = jnp.ones((1, 2048))
    want_v, want_i = jax.lax.top_k(x, 4)
    got_v, got_i = two_stage_top_k(x, 4, block=256)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


# ---------------------------------------------------------------------------
# ITM negatives derangement
# ---------------------------------------------------------------------------


def test_itm_negative_indices_never_positive_pairs():
    from image_captioning_ml_project_tpu.train.losses import (
        itm_negative_indices)

    for B in (2, 3, 4, 8):
        for seed in range(20):
            num_neg = max(int(B * 0.5), 1)
            img, txt = itm_negative_indices(jax.random.PRNGKey(seed), B,
                                            num_neg)
            assert not np.any(np.asarray(img) == np.asarray(txt)), (B, seed)


# ---------------------------------------------------------------------------
# checkpoint path resolution
# ---------------------------------------------------------------------------


def test_checkpoint_path_resolution(tmp_path):
    from image_captioning_ml_project_tpu.utils.checkpoint import (
        CheckpointManager)

    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    # plain name -> inside the directory
    assert ckpt._path("best_model") == str(tmp_path / "ckpts" / "best_model")
    # path with separator -> verbatim
    assert ckpt._path("runs/x/best_model") == os.path.abspath(
        "runs/x/best_model")
    # absolute path -> verbatim
    abs_p = str(tmp_path / "elsewhere" / "ckpt")
    assert ckpt._path(abs_p) == abs_p
    # round-trips through an external absolute path
    state = {"w": jnp.ones((2,))}
    ckpt.save(abs_p, state)
    restored, _, _ = ckpt.restore(abs_p, {"w": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored["w"]), [1.0, 1.0])
    # bare names resolve under the directory even when a same-named
    # file/dir exists in the CWD (resolution must not depend on CWD junk)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("best_model", exist_ok=True)
        assert ckpt._path("best_model") == str(
            tmp_path / "ckpts" / "best_model")
    finally:
        os.chdir(cwd)


# ---------------------------------------------------------------------------
# BUTD curriculum difficulty from real region counts
# ---------------------------------------------------------------------------


def test_object_dataset_num_objects(tmp_path):
    from image_captioning_ml_project_tpu.data.coco import (
        ObjectDetectionFeaturesDataset)
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco,
        make_synthetic_object_features,
    )
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab
    from image_captioning_ml_project_tpu.train.curriculum import (
        CurriculumSampler)

    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=6, captions_per_image=2,
                        image_size=16)
    ann_file = os.path.join(root, "annotations/captions_train2014.json")
    make_synthetic_object_features(os.path.join(root, "features"), ann_file,
                                   max_objects=8, feature_dim=16)
    with open(ann_file) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)
    ds = ObjectDetectionFeaturesDataset(
        os.path.join(root, "features"), ann_file, vocab, max_objects=8,
        max_length=12, is_training=True, feature_dim=16)
    counts = ds.num_objects()
    assert counts.shape == (len(ds),)
    # synthetic features draw 3..max_objects regions per image
    assert counts.min() >= 3 and counts.max() <= 8
    assert len(np.unique(counts)) > 1  # real signal, not a constant
    sampler = CurriculumSampler(ds, strategy="num_objects", num_epochs=6,
                                warmup_epochs=3)
    np.testing.assert_array_equal(
        np.sort(counts[sampler.sorted_indices]), np.sort(counts))
    assert (np.diff(counts[sampler.sorted_indices]) >= 0).all()


# ---------------------------------------------------------------------------
# eval CLI: multi-chip batching + reranking wiring + val coverage
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_eval_setup(tmp_path_factory):
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab

    root = str(tmp_path_factory.mktemp("coco_eval"))
    # 6 val images: with batch 8 the single batch carries 2 padded rows
    make_synthetic_coco(root, num_images=6, captions_per_image=3,
                        image_size=32)
    with open(os.path.join(root, "annotations/captions_train2014.json")) as f:
        ann = json.load(f)
    vocab = WordVocab.build([a["caption"] for a in ann["annotations"]],
                            threshold=1)

    cfg = get_default_config()
    cfg.data_root = root
    cfg.image_size = 32
    cfg.seed = 0
    cfg.output_dir = str(tmp_path_factory.mktemp("out_eval"))
    cfg.checkpoint_dir = str(tmp_path_factory.mktemp("ckpt_eval"))
    cfg.model.encoder.encoder_type = EncoderType.VIT
    cfg.model.encoder.feature_dim = 16
    cfg.model.encoder.hidden_size = 16
    cfg.model.encoder.num_layers = 1
    cfg.model.encoder.num_heads = 2
    cfg.model.encoder.patch_size = 8
    cfg.model.encoder.image_size = 32
    cfg.model.decoder.decoder_type = DecoderType.LSTM
    cfg.model.decoder.hidden_dim = 16
    cfg.model.decoder.num_layers = 1
    cfg.model.decoder.max_length = 16
    cfg.model.decoder.dropout = 0.0
    cfg.model.attention.attention_type = AttentionType.SOFT
    cfg.model.attention.hidden_dim = 16
    cfg.model.projection_dim = 16
    cfg.model.vocab_size = vocab.vocab_size
    cfg.model.pad_token_id = vocab.pad_token_id
    cfg.model.bos_token_id = vocab.bos_token_id
    cfg.model.eos_token_id = vocab.eos_token_id
    cfg.training.batch_size = 8
    cfg.training.num_epochs = 1
    cfg.training.use_rl = False
    cfg.training.use_amp = False
    cfg.inference.max_length = 6
    cfg.inference.beam_size = 3
    cfg.inference.num_candidates = 5  # NOT a multiple of the 8-device mesh
    return cfg, vocab


def test_eval_cli_on_8device_mesh(tiny_eval_setup):
    """main.evaluate() must round its batch up to a dp multiple — with
    num_candidates=5 on the 8-device mesh this used to crash in
    shard_batch (5 % 8 != 0)."""
    import copy

    from image_captioning_ml_project_tpu import main as cli

    cfg, vocab = tiny_eval_setup
    cfg = copy.deepcopy(cfg)
    cfg.inference.decoding_strategy = "greedy"
    metrics = cli.evaluate(cfg, tokenizer=vocab)
    assert "CIDEr" in metrics and np.isfinite(metrics["CIDEr"])


def test_eval_cli_clip_reranking_wired(tiny_eval_setup):
    """With use_clip_reranking, evaluate() must hand num_candidates beam
    candidates per image to the reranker and use its selections."""
    import copy

    from image_captioning_ml_project_tpu import main as cli

    cfg, vocab = tiny_eval_setup
    cfg = copy.deepcopy(cfg)
    cfg.inference.decoding_strategy = "beam"
    cfg.inference.use_clip_reranking = True
    calls = []

    def stub_reranker(images, candidates):
        cands = np.asarray(candidates)
        calls.append(cands.shape)
        return cands[:, -1]  # deliberately pick the WORST candidate

    metrics = cli.evaluate(cfg, tokenizer=vocab, reranker=stub_reranker)
    assert calls, "reranker was never invoked"
    B, K, L = calls[0]
    assert K == cfg.inference.num_candidates
    assert "CIDEr" in metrics


def test_validation_covers_all_images_with_configured_strategy(
        tiny_eval_setup, monkeypatch):
    """_validate_epoch pads the trailing batch (no drop_last) and decodes
    with the configured InferenceConfig strategy."""
    import copy

    from image_captioning_ml_project_tpu.data.coco import build_coco_datasets
    from image_captioning_ml_project_tpu.train import trainer as trainer_mod
    from image_captioning_ml_project_tpu.train.trainer import (
        CaptioningTrainer)

    cfg, vocab = tiny_eval_setup
    cfg = copy.deepcopy(cfg)
    cfg.inference.decoding_strategy = "beam"
    train_ds, val_ds = build_coco_datasets(cfg, vocab)
    trainer = CaptioningTrainer(cfg, train_ds, val_ds, vocab)

    captured = {}
    real = trainer_mod.calculate_metrics

    def spy(generated, references, image_ids=None):
        captured["n"] = len(generated)
        captured["ids"] = list(image_ids or [])
        return real(generated, references, image_ids)

    monkeypatch.setattr(trainer_mod, "calculate_metrics", spy)
    val_loss, metrics = trainer._validate_epoch(0)
    assert np.isfinite(val_loss)
    assert captured["n"] == len(val_ds)          # every val image scored
    assert len(set(captured["ids"])) == len(val_ds)
