"""image_captioning_ml_project_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image
captioning framework.

A ground-up rebuild of the capabilities of thromel/Image-Captioning-ML-Project
(pure PyTorch, single GPU) as an idiomatic TPU framework:

* Flax encoder zoo (ResNet / ViT / Swin / CLIP-vision / object regions)
* Decoders: LSTM (``lax.scan``), Transformer and GPT-2 with KV caches and
  per-layer prefix-KV image conditioning
* Four cross-attention variants (soft / multi-head / adaptive / AoA) with
  fused Pallas TPU kernels
* jit-compiled batched greedy / beam / nucleus decoding with KV cache
* pjit data-parallel training over a ``jax.sharding.Mesh`` with optax AdamW,
  warmup schedules, bf16, SCST RL with on-device CIDEr rewards
* Orbax checkpoints, curriculum learning, contrastive/ITM aux losses,
  COCO metric evaluation

Import as::

    import image_captioning_ml_project_tpu as ict
"""

__version__ = "0.1.0"

from .config import (
    Config,
    ModelConfig,
    EncoderConfig,
    DecoderConfig,
    AttentionConfig,
    TrainingConfig,
    InferenceConfig,
    MeshConfig,
    EncoderType,
    DecoderType,
    AttentionType,
    get_default_config,
    save_config,
    load_config,
)
