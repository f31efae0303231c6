"""Device-side image resize: separable antialiased bilinear as two matmuls.

The reference resizes on the host inside the torch DataLoader
(reference: src/main.py:139-153 transforms; data_loader.py:85-121 legacy
path). On this framework's measured pipeline the host PIL decode+resize
caps at ~115 img/s/core while the chip captions >1500 img/s — so the
host's only job should be the JPEG *decode* (which libjpeg can already do
at reduced DCT scale nearly free), and the resize belongs on the TPU.

TPU-first formulation: bilinear (triangle-filter, PIL-style antialiased)
resize is separable, so each output image is two small matmuls

    out[o, p, c] = sum_i sum_j Wy[o, i] * Wx[p, j] * img[i, j, c]

which ride the MXU — no gathers, no dynamic shapes. The per-image source
size ``s`` (images land on a fixed canvas, actual content in the top-left
``s x s`` square) only parameterizes the *weights*, which are computed on
device from iota — the whole batch stays one static-shape XLA program.

The interpolation matches PIL's BILINEAR semantics: triangle filter with
support scaled by the downscale factor (antialiasing), taps clipped to the
valid source range and renormalized. Numerical agreement with
``PIL.Image.resize`` is within ~1/255 per pixel (tests/test_resize.py);
bit-exactness is impossible (PIL uses fixed-point incremental accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.coco import IMAGENET_MEAN, IMAGENET_STD


def _resize_weights(src_size, canvas: int, out_size: int) -> jnp.ndarray:
    """[out_size, canvas] triangle-filter interpolation weights for a source
    occupying ``[0, src_size)`` of the canvas axis. ``src_size`` may be a
    traced scalar (per-image)."""
    s = src_size.astype(jnp.float32)
    scale = s / out_size
    fscale = jnp.maximum(scale, 1.0)  # antialias support when downscaling
    o = jnp.arange(out_size, dtype=jnp.float32)[:, None]   # [out, 1]
    i = jnp.arange(canvas, dtype=jnp.float32)[None, :]     # [1, canvas]
    center = (o + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs((i + 0.5 - center) / fscale))
    w = jnp.where(i < s, w, 0.0)  # canvas padding is never sampled
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-8)


def resize_square(canvas_images: jnp.ndarray, sizes: jnp.ndarray,
                  out_size: int) -> jnp.ndarray:
    """Resize each image's top-left ``sizes[b] x sizes[b]`` square region of
    a fixed ``[B, C, C, 3]`` uint8 canvas to ``[B, out, out, 3]`` float32.

    jnp-traceable; one vmapped pair of dense matmuls per image.
    """
    C = canvas_images.shape[1]

    def one(img, s):
        w = _resize_weights(s, C, out_size)                 # [out, C]
        x = img.astype(jnp.float32).reshape(C, C * 3)
        t = (w @ x).reshape(out_size, C, 3)                 # rows
        t = jnp.einsum("pj,ojc->opc", w, t,
                       preferred_element_type=jnp.float32)  # cols
        return t

    return jax.vmap(one)(canvas_images, sizes)


def resize_normalize(canvas_images: jnp.ndarray, sizes: jnp.ndarray,
                     out_size: int) -> jnp.ndarray:
    """Device-resident eval preprocessing: resize (above) + ImageNet
    normalization fused into the second matmul's epilogue by XLA."""
    x = resize_square(canvas_images, sizes, out_size) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std
