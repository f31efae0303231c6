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
