"""CLI entry point: ``--mode train | eval | demo``.

Same flag surface as the reference
(reference: src/main.py:17-102: --mode, --config, --save_config,
--checkpoint, --output_dir, --batch_size, --num_epochs, --learning_rate,
--encoder_type, --decoder_type, --attention_type, --use_rl, --data_root,
--image_path), plus tokenizer selection flags for the no-network environment
(--vocab to use/load a word vocabulary; HF tokenizers are used when their
files are locally cached).

Run as ``python -m image_captioning_ml_project_tpu.main ...``.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

from .config import (
    AttentionType,
    Config,
    DecoderType,
    EncoderType,
    get_default_config,
    load_config,
    save_config,
)
from .data.coco import (build_coco_datasets, build_object_datasets,
                        load_image)
from .data.tokenizer import HFTokenizerAdapter, WordVocab
from .train.curriculum import create_curriculum_sampler
from .train.trainer import CaptioningTrainer
from .utils.logging import setup_logging


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native image captioning (JAX/XLA/Pallas)")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "eval", "demo", "serve"])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--save_config", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--encoder_type", type=str, default=None,
                        choices=["resnet", "vit", "swin", "clip"])
    parser.add_argument("--decoder_type", type=str, default=None,
                        choices=["lstm", "transformer", "gpt2"])
    parser.add_argument("--attention_type", type=str, default=None,
                        choices=["soft", "multi_head", "adaptive", "aoa"])
    parser.add_argument("--use_rl", action="store_true")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--image_path", type=str, default=None)
    parser.add_argument("--vocab", type=str, default=None,
                        help="Word-vocab JSON path (built from train "
                             "annotations if absent)")
    parser.add_argument("--device_resize", action="store_true",
                        help="Device-resident eval preprocessing: host "
                             "decodes JPEGs only; resize+normalize run on "
                             "the TPU (ops/resize.py)")
    parser.add_argument("--native_loader", action="store_true",
                        help="Native C++ host decode pipeline "
                             "(native/jpeg_loader.cpp): libjpeg + threaded "
                             "batch decode; falls back to PIL if the "
                             "toolchain is unavailable")
    parser.add_argument("--native_threads", type=int, default=None,
                        help="Native decode threads (0 = one per host CPU)")
    parser.add_argument("--native_draft", action="store_true",
                        help="DCT-scaled native eval decode (fastest; "
                             "device_resize-grade resampling instead of "
                             "exact PIL parity)")
    parser.add_argument("--fold_normalize", action="store_true",
                        help="Fold ImageNet normalization into the ViT/CLIP "
                             "patch-embed matmul: the jitted step consumes "
                             "raw uint8 and the normalized image is never "
                             "materialized (models/encoders.PatchEmbed)")
    parser.add_argument("--save_every_steps", type=int, default=None,
                        help="Rolling mid-epoch checkpoint every N train "
                             "batches (resume continues inside the epoch); "
                             "0 disables. See config.save_every_steps")
    parser.add_argument("--step_ckpt_max_overhead", type=float, default=None,
                        help="Adaptive throttle: step checkpoints may use "
                             "at most this fraction of wall time (0 = "
                             "always save). See config.step_ckpt_max_overhead")
    serve = parser.add_argument_group("serve mode (inference/server.py)")
    serve.add_argument("--host", type=str, default="127.0.0.1")
    serve.add_argument("--port", type=int, default=8000)
    serve.add_argument("--serve_batch_size", type=int, default=8,
                       help="Micro-batch size the jitted decode is compiled "
                            "for (rounded up to a data-mesh multiple)")
    serve.add_argument("--serve_pipeline_depth", type=int, default=2,
                       help="device batches in flight: the batcher dispatches "
                            "batch N+1 while batch N is still being fetched")
    serve.add_argument("--serve_max_wait_ms", type=float, default=10.0,
                       help="Max time the batcher holds a partial batch "
                            "waiting for more requests")
    serve.add_argument("--serve_buckets", type=str, default=None,
                       help="Comma-separated compiled batch-shape ladder "
                            "(e.g. 1,8,64); each micro-batch dispatches on "
                            "the smallest bucket >= queue depth, so a "
                            "quiet-hour single request does not pay a "
                            "serve_batch_size-wide decode. Default 1,8,max")
    return parser


def _update_config_from_args(config: Config, args) -> None:
    """reference: src/main.py:105-130 — with string-enum coercion so the
    overrides survive factory dispatch (fixes SURVEY.md §2.4 CLI defect)."""
    if args.output_dir:
        config.output_dir = args.output_dir
        config.checkpoint_dir = os.path.join(args.output_dir, "checkpoints")
    if args.batch_size:
        config.training.batch_size = args.batch_size
    if args.num_epochs:
        config.training.num_epochs = args.num_epochs
    if args.learning_rate:
        config.training.learning_rate = args.learning_rate
    if args.encoder_type:
        config.model.encoder.encoder_type = EncoderType(args.encoder_type)
    if args.decoder_type:
        config.model.decoder.decoder_type = DecoderType(args.decoder_type)
    if args.attention_type:
        config.model.attention.attention_type = AttentionType(args.attention_type)
    if args.use_rl:
        config.training.use_rl = True
    if args.data_root:
        config.data_root = args.data_root
    if getattr(args, "device_resize", False):
        config.device_resize = True
    if getattr(args, "native_loader", False):
        config.native_loader = True
    if getattr(args, "native_threads", None) is not None:
        config.native_threads = args.native_threads
    if getattr(args, "native_draft", False):
        config.native_draft = True
    if getattr(args, "fold_normalize", False):
        config.fold_normalize = True
    if getattr(args, "save_every_steps", None) is not None:
        config.save_every_steps = args.save_every_steps
    if getattr(args, "step_ckpt_max_overhead", None) is not None:
        config.step_ckpt_max_overhead = args.step_ckpt_max_overhead


def setup_tokenizer(config: Config, vocab_path: Optional[str] = None,
                    build_if_missing: bool = True):
    """Resolve the tokenizer and wire special-token ids into the config
    (reference: src/main.py:156-168).

    Order: explicit --vocab JSON → locally cached HF tokenizer for
    ``decoder.pretrained_model_name`` → word vocabulary built from the train
    annotations (saved to output_dir/vocab.json)."""
    logger = logging.getLogger(__name__)
    tokenizer = None
    if vocab_path and os.path.exists(vocab_path):
        tokenizer = WordVocab.load(vocab_path)
    else:
        try:
            from transformers import AutoTokenizer

            hf = AutoTokenizer.from_pretrained(
                config.model.decoder.pretrained_model_name,
                local_files_only=True)
            tokenizer = HFTokenizerAdapter(hf)
        except Exception:
            if not build_if_missing:
                raise
            train_json = os.path.join(config.data_root, config.train_json)
            logger.info("No cached HF tokenizer; building word vocab from %s",
                        train_json)
            import json

            with open(train_json) as f:
                ann = json.load(f)
            tokenizer = WordVocab.build(
                [a["caption"] for a in ann["annotations"]])
            os.makedirs(config.output_dir, exist_ok=True)
            out = vocab_path or os.path.join(config.output_dir, "vocab.json")
            tokenizer.save(out)
            logger.info("Saved vocab (%d words) to %s", len(tokenizer), out)

    config.model.vocab_size = len(tokenizer)
    config.model.pad_token_id = int(tokenizer.pad_token_id)
    config.model.bos_token_id = int(tokenizer.bos_token_id)
    config.model.eos_token_id = int(tokenizer.eos_token_id)
    return tokenizer


def train(config: Config, checkpoint_path=None, tokenizer=None,
          reranker=None):
    """reference: src/main.py:133-199."""
    logger = logging.getLogger(__name__)
    logger.info("Starting training...")
    tokenizer = tokenizer or setup_tokenizer(config)
    from .config import EncoderType

    object_mode = (
        config.model.encoder.encoder_type == EncoderType.OBJECT_REGION
        or config.model.encoder.use_object_features)
    if object_mode:
        train_ds, val_ds = build_object_datasets(config, tokenizer)
    else:
        train_ds, val_ds = build_coco_datasets(config, tokenizer)
    sampler = create_curriculum_sampler(train_ds, config)
    # with use_clip_reranking, validation decodes rerank too, so the
    # best-CIDEr checkpoint is selected by the decode that ships
    if not object_mode:
        reranker = _resolve_reranker(config, tokenizer, reranker)
    trainer = CaptioningTrainer(config, train_ds, val_ds, tokenizer,
                                curriculum_sampler=sampler,
                                reranker=reranker)
    if checkpoint_path:
        trainer.load_checkpoint(checkpoint_path)
    trainer.train()
    return trainer


def _resolve_reranker(config: Config, tokenizer, reranker):
    """Resolve the CLIP reranker when ``use_clip_reranking`` is set
    (reference surface: src/config.py:107-109). An injected ``reranker``
    (tests / programmatic use) wins; otherwise a locally cached HF CLIP
    checkpoint is ported; on failure reranking is skipped with a warning."""
    if not config.inference.use_clip_reranking:
        return None
    if reranker is not None:
        return reranker
    from .inference.reranking import build_hf_reranker

    return build_hf_reranker(
        lambda ids: tokenizer.decode(ids, skip_special_tokens=True))


def _make_decode_batch(trainer, config, rerank: bool):
    """One jitted (state, inputs, rng) -> tokens program shared by the
    eval and demo CLIs: with ``rerank`` it returns the [B, K, L] beam
    candidates for CLIP selection (the reference's candidate generator is
    beam search, src/config.py:107-109); otherwise the configured
    decoding strategy. ``rng`` feeds the nucleus strategy (a fresh key
    per batch — a constant key would sample every batch identically)."""
    import jax

    from .inference.decoding import beam_search, decode

    mc, ic = config.model, config.inference
    max_length = ic.max_length

    @jax.jit
    def decode_batch(state, inputs, rng):
        inputs = trainer._prepare_inputs(inputs)
        variables = trainer._model_vars(state)
        B = jax.tree_util.tree_leaves(inputs)[0].shape[0]
        cache = trainer.model.apply(variables, inputs, max_length,
                                    method=trainer.model.init_cache)

        def step_fn(s, toks):
            return trainer.model.apply(variables, s, toks,
                                       method=trainer.model.step)

        if rerank:
            res = beam_search(step_fn, cache, B,
                              max(ic.beam_size, ic.num_candidates),
                              mc.bos_token_id, mc.eos_token_id,
                              mc.pad_token_id, max_length,
                              length_penalty=ic.length_penalty,
                              min_length=ic.min_length,
                              num_beam_groups=ic.num_beam_groups,
                              diversity_penalty=ic.diversity_penalty,
                              return_all=True)
            return res.tokens[:, : ic.num_candidates]
        return decode(step_fn, cache, B, ic,
                      mc.bos_token_id, mc.eos_token_id, mc.pad_token_id,
                      rng=rng)

    return decode_batch


def evaluate(config: Config, checkpoint_path=None, tokenizer=None,
             reranker=None):
    """reference: src/main.py:202-267 — beam/nucleus/greedy per
    InferenceConfig through the jit decode engine, with optional CLIP
    reranking over ``num_candidates`` beam candidates."""
    import jax

    from .data.coco import iterate_batches
    from .data.pipeline import prefetch
    from .evaluate.metrics import calculate_metrics

    logger = logging.getLogger(__name__)
    tokenizer = tokenizer or setup_tokenizer(config)
    if (config.model.encoder.encoder_type == EncoderType.OBJECT_REGION
            or config.model.encoder.use_object_features):
        _, val_ds = build_object_datasets(config, tokenizer)
    else:
        _, val_ds = build_coco_datasets(config, tokenizer)
    trainer = CaptioningTrainer(config, val_ds, val_ds, tokenizer)
    if checkpoint_path:
        trainer.load_checkpoint(checkpoint_path)

    rerank_enabled = config.inference.use_clip_reranking
    if (config.model.encoder.encoder_type == EncoderType.OBJECT_REGION
            or config.model.encoder.use_object_features) \
            and rerank_enabled:
        logger.warning("CLIP reranking needs raw images; the object-region "
                       "pipeline carries detector features only — skipping")
        rerank_enabled = False
    reranker = (_resolve_reranker(config, tokenizer, reranker)
                if rerank_enabled else None)

    ic = config.inference
    decode_batch = _make_decode_batch(trainer, config,
                                      rerank=reranker is not None)

    generated, references, image_ids = [], [], []
    # reference quirk: eval batch = inference.num_candidates
    # (src/data/dataset.py:466) — rounded up to a multiple of the data mesh
    # axis so sharded device_put works on multi-chip runs (same policy as
    # trainer._validate_epoch)
    dp = trainer.mesh.shape.get(config.mesh.data_axis, 1)
    batch_size = -(-ic.num_candidates // dp) * dp
    it = iterate_batches(val_ds, batch_size,
                         shuffle=False, drop_last=False, pad_last=True,
                         num_workers=config.num_workers)
    # one bf16 weight pre-cast for the whole eval run (bit-identical;
    # removes the per-batch f32->bf16 convert fusions from the program)
    estate = trainer.eval_state()
    rng = jax.random.PRNGKey(config.seed)
    for batch in prefetch(it, mesh=trainer.mesh,
                          data_axis=config.mesh.data_axis):
        rng, step_rng = jax.random.split(rng)
        with trainer._decode_ctx():
            tokens = decode_batch(estate, trainer._batch_inputs(batch),
                                  step_rng)
        if reranker is not None:
            imgs = batch["image"]
            if "image_size" in batch:
                # device_resize batches carry canvases; give CLIP the same
                # resized pixels the captioner saw (f32 [0,255] is fine
                # for clip_normalize's /255)
                from .ops.resize import resize_square

                imgs = resize_square(imgs, batch["image_size"],
                                     config.image_size)
            tokens = reranker(imgs, tokens)
        tokens = np.asarray(tokens)
        valid = batch.get("batch_valid", np.ones(len(tokens), dtype=bool))
        for i in range(len(tokens)):
            if not valid[i]:
                continue
            generated.append(tokenizer.decode(tokens[i],
                                              skip_special_tokens=True))
            references.append(batch["captions"][i])
            image_ids.append(int(np.asarray(batch["image_id"])[i]))

    metrics = calculate_metrics(generated, references, image_ids)
    logger.info("Evaluation Results:")
    for k, v in metrics.items():
        logger.info("%s: %.4f", k, v)
    return metrics


def demo(config: Config, checkpoint_path=None, image_path=None,
         tokenizer=None, show: bool = False, reranker=None):
    """reference: src/main.py:270-343 — caption one image with the
    configured decoding strategy (+ optional CLIP reranking); saves/plots
    the captioned image if matplotlib is available, always prints the text."""
    import jax
    import jax.numpy as jnp

    logger = logging.getLogger(__name__)
    tokenizer = tokenizer or setup_tokenizer(config)
    # Reuse the full trainer (it owns the jitted decode); datasets unused.
    trainer = _make_model_only_trainer(config, tokenizer)
    if checkpoint_path:
        trainer.load_checkpoint(checkpoint_path)
    reranker = _resolve_reranker(config, tokenizer, reranker)

    img = load_image(image_path, config.image_size, train=False)
    images = jnp.asarray(img[None])
    # same jitted program (and decode_mesh context) as the eval CLI —
    # the fused Pallas decode path must stay engaged here too
    decode_one = _make_decode_batch(trainer, config,
                                    rerank=reranker is not None)
    with trainer._decode_ctx():
        out = decode_one(trainer.eval_state(), images,
                         jax.random.PRNGKey(config.seed))
    tokens = reranker(images, out) if reranker is not None else out
    caption = tokenizer.decode(np.asarray(tokens)[0], skip_special_tokens=True)
    logger.info("Generated caption: %s", caption)
    print(caption)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 6))
        plt.imshow(img)
        plt.title(caption)
        plt.axis("off")
        out = os.path.join(config.output_dir, "demo.png")
        os.makedirs(config.output_dir, exist_ok=True)
        plt.savefig(out)
        logger.info("Saved captioned image to %s", out)
        if show:
            plt.show()
    except Exception:
        pass
    return caption


class _EmptyDataset:
    examples: list = []

    def __len__(self):
        return 0


def _make_model_only_trainer(config: Config, tokenizer,
                             mesh=None) -> CaptioningTrainer:
    """A trainer with no dataset (demo / programmatic captioning)."""
    return CaptioningTrainer(config, _EmptyDataset(), _EmptyDataset(),
                             tokenizer, mesh=mesh)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    config = load_config(args.config) if args.config else get_default_config()
    _update_config_from_args(config, args)
    if args.save_config:
        save_config(config, args.save_config)
    setup_logging(config.output_dir)
    logger = logging.getLogger(__name__)

    import jax

    logger.info("JAX devices: %s", jax.devices())

    tokenizer = setup_tokenizer(config, vocab_path=args.vocab)

    if args.mode == "train":
        train(config, args.checkpoint, tokenizer=tokenizer)
    elif args.mode == "eval":
        evaluate(config, args.checkpoint, tokenizer=tokenizer)
    elif args.mode == "demo":
        if not args.image_path:
            raise SystemExit("--image_path is required for demo mode")
        demo(config, args.checkpoint, args.image_path, tokenizer=tokenizer)
    elif args.mode == "serve":
        from .inference.server import serve

        serve(config, args.checkpoint, tokenizer=tokenizer,
              host=args.host, port=args.port,
              batch_size=args.serve_batch_size,
              max_wait_ms=args.serve_max_wait_ms,
              pipeline_depth=args.serve_pipeline_depth,
              bucket_sizes=[int(b) for b in args.serve_buckets.split(",")]
              if args.serve_buckets else None)


if __name__ == "__main__":
    main()
