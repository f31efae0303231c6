"""Config system tests: defaults parity with the reference, JSON round-trip
with full enum/nested reconstruction (the reference's load_config admits it
does not reconstruct these, src/config.py:183-185)."""

import os

from image_captioning_ml_project_tpu.config import (
    AttentionType,
    Config,
    DecoderType,
    EncoderType,
    config_from_dict,
    config_to_dict,
    get_default_config,
    load_config,
    save_config,
)


def test_defaults_match_reference():
    c = get_default_config()
    # Reference defaults: src/config.py
    assert c.model.encoder.encoder_type == EncoderType.VIT
    assert c.model.decoder.decoder_type == DecoderType.GPT2
    assert c.model.attention.attention_type == AttentionType.MULTI_HEAD
    assert c.model.decoder.hidden_dim == 768
    assert c.model.decoder.num_layers == 6
    assert c.model.decoder.max_length == 50
    assert c.training.batch_size == 64
    assert c.training.num_epochs == 15
    assert c.training.learning_rate == 5e-5
    assert c.training.weight_decay == 0.01
    assert c.training.lr_scheduler == "cosine"
    assert c.training.warmup_steps == 2000
    assert c.training.rl_start_epoch == 10
    assert c.training.rl_reward == "cider"
    assert c.inference.beam_size == 5
    assert c.inference.top_p == 0.9
    assert c.inference.length_penalty == 0.8
    assert c.inference.max_length == 20
    assert c.inference.min_length == 5
    assert c.inference.num_candidates == 5
    assert c.model.vocab_size == 50257
    assert c.model.projection_dim == 768
    assert c.model.q_former_num_queries == 32
    assert c.image_size == 224
    assert c.seed == 42


def test_attention_config_has_hidden_dim():
    # Fix of reference defect: AttentionConfig lacked hidden_dim while every
    # attention class read it (src/models/attention.py:45-47).
    c = get_default_config()
    assert c.model.attention.hidden_dim == 768


def test_string_enums_compare_with_raw_strings():
    # CLI overrides store raw strings (src/main.py:119-124); string-valued
    # enums make factory comparisons still work.
    assert EncoderType.RESNET == "resnet"
    assert DecoderType.LSTM == "lstm"
    assert AttentionType.AOA == "aoa"


def test_json_round_trip(tmp_path):
    c = get_default_config()
    c.model.encoder.encoder_type = EncoderType.CLIP
    c.model.decoder.decoder_type = DecoderType.LSTM
    c.model.attention.attention_type = AttentionType.AOA
    c.training.batch_size = 8
    c.model.encoder.resnet_depths = (1, 2, 3, 4)
    path = os.path.join(tmp_path, "cfg.json")
    save_config(c, path)
    c2 = load_config(path)
    assert isinstance(c2, Config)
    assert c2.model.encoder.encoder_type is EncoderType.CLIP
    assert c2.model.decoder.decoder_type is DecoderType.LSTM
    assert c2.model.attention.attention_type is AttentionType.AOA
    assert c2.training.batch_size == 8
    assert c2.model.encoder.resnet_depths == (1, 2, 3, 4)
    # Full structural equality through dict form
    assert config_to_dict(c) == config_to_dict(c2)


def test_unknown_keys_ignored():
    d = config_to_dict(get_default_config())
    d["bogus_key"] = 1
    d["model"]["bogus"] = 2
    c = config_from_dict(d)
    assert isinstance(c, Config)


def test_step_ckpt_cli_flags_plumb_to_config():
    """--save_every_steps / --step_ckpt_max_overhead reach the Config
    (trainer.save_step_checkpoint's cadence + adaptive throttle)."""
    from image_captioning_ml_project_tpu.config import get_default_config
    from image_captioning_ml_project_tpu.main import (
        _update_config_from_args, build_argparser)

    args = build_argparser().parse_args(
        ["--mode", "train", "--save_every_steps", "250",
         "--step_ckpt_max_overhead", "0.25"])
    config = get_default_config()
    _update_config_from_args(config, args)
    assert config.save_every_steps == 250
    assert config.step_ckpt_max_overhead == 0.25
    # 0 is a real value (explicitly disable), not "unset"
    args = build_argparser().parse_args(
        ["--mode", "train", "--save_every_steps", "0"])
    config2 = get_default_config()
    config2.save_every_steps = 99
    _update_config_from_args(config2, args)
    assert config2.save_every_steps == 0


def test_native_loader_cli_flags_plumb_to_config_and_dataset(tmp_path):
    """--native_loader/--native_threads/--native_draft reach the Config and
    the datasets built from it (native/loader.py pipeline)."""
    from image_captioning_ml_project_tpu.main import (
        _update_config_from_args, build_argparser)
    from image_captioning_ml_project_tpu.config import get_default_config

    args = build_argparser().parse_args(
        ["--mode", "eval", "--native_loader", "--native_threads", "3",
         "--native_draft"])
    config = get_default_config()
    _update_config_from_args(config, args)
    assert config.native_loader is True
    assert config.native_threads == 3
    assert config.native_draft is True

    from image_captioning_ml_project_tpu.data.coco import build_coco_datasets
    from image_captioning_ml_project_tpu.data.synthetic import (
        make_synthetic_coco)
    from image_captioning_ml_project_tpu.data.tokenizer import WordVocab

    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=2, captions_per_image=1,
                        image_size=32, splits=["train", "val"])
    config.data_root = root
    config.image_size = 32
    vocab = WordVocab.build(["a b"], threshold=1)
    train, val = build_coco_datasets(config, vocab)
    for ds in (train, val):
        assert ds.native_loader is True
        assert ds.native_threads == 3
        assert ds.native_draft is True
