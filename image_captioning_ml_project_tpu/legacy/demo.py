"""Legacy demo: caption every image in a directory.

Parity with the reference demo (reference: demo.py:142-208 + the directory
loader data_loader.py:45-62): load a trained legacy checkpoint, caption each
image in a directory, optionally render attention overlays.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import load_image, normalize_images
from .model import ShowAttendTell
from .validate import strip_specials, visualize_attention


def generate_captions(model: ShowAttendTell, variables, vocab,
                      image_dir: str, image_size: int = 224,
                      max_length: int = 20,
                      save_attention_dir: Optional[str] = None
                      ) -> Dict[str, str]:
    """Caption all images in ``image_dir``; returns {filename: caption}."""
    logger = logging.getLogger(__name__)

    @jax.jit
    def caption_one(images):
        images = normalize_images(images)
        return model.apply(
            variables, images, max_length,
            method=lambda mdl, im, L: mdl.generate(
                im, L, start_token_id=vocab.bos_token_id))

    results = {}
    for name in sorted(os.listdir(image_dir)):
        path = os.path.join(image_dir, name)
        try:
            img = load_image(path, image_size, train=False)
        except Exception:
            continue
        tokens, alphas = caption_one(jnp.asarray(img[None]))
        words = strip_specials(np.asarray(tokens)[0], vocab)
        caption = " ".join(words)
        results[name] = caption
        logger.info("%s: %s", name, caption)
        if save_attention_dir:
            visualize_attention(
                img, words, np.asarray(alphas)[0],
                grid_size=model.encoded_image_size,
                save_path=os.path.join(save_attention_dir,
                                       f"{os.path.splitext(name)[0]}_att.png"))
    return results


def main(argv=None):
    """Script entry (reference: demo.py):

    python -m image_captioning_ml_project_tpu.legacy.demo \
        --vocab vocab.json --image_dir images/ \
        [--encoder_ckpt ... --decoder_ckpt ...] [--attention_dir out/att]
    """
    import argparse

    import jax.numpy as jnp

    from ..data.tokenizer import WordVocab
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import setup_logging

    p = argparse.ArgumentParser(description="Legacy captioning demo")
    p.add_argument("--vocab", type=str, required=True)
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--encoder_ckpt", type=str, default="encoder_epoch_0")
    p.add_argument("--decoder_ckpt", type=str, default="decoder_epoch_0")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--max_length", type=int, default=20)
    p.add_argument("--attention_dir", type=str, default=None)
    args = p.parse_args(argv)

    setup_logging(None)
    vocab = WordVocab.load(args.vocab)
    model = ShowAttendTell(vocab_size=len(vocab))

    # Initialize params, then overwrite from checkpoints if provided
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
    caps = jnp.zeros((1, 4), dtype=jnp.int32)
    variables = dict(model.init(jax.random.PRNGKey(0), dummy, caps))
    if args.checkpoint_dir:
        ckpt = CheckpointManager(args.checkpoint_dir)
        enc, _, _ = ckpt.restore(args.encoder_ckpt)
        dec, _, _ = ckpt.restore(args.decoder_ckpt)
        params = dict(variables["params"])
        params["encoder"] = enc["params"]
        params["decoder"] = dec["params"]
        variables["params"] = params
        if enc.get("batch_stats"):
            variables["batch_stats"] = {"encoder": enc["batch_stats"]}

    results = generate_captions(model, variables, vocab, args.image_dir,
                                image_size=args.image_size,
                                max_length=args.max_length,
                                save_attention_dir=args.attention_dir)
    for name, caption in results.items():
        print(f"{name}: {caption}")


if __name__ == "__main__":
    main()
