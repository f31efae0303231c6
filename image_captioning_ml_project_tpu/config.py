"""Configuration system: nested dataclasses + string enums with JSON round-trip.

Mirrors the reference's config surface (reference: src/config.py:7-199) with the
same field names and defaults, but fixes its latent defects:

* enums are *string-valued* (``str, Enum``) so CLI overrides that store raw
  strings still compare equal to enum members (reference defect:
  src/main.py:119-124 stores strings, src/models/encoders.py:301-307 compares
  enums);
* ``AttentionConfig`` carries ``hidden_dim`` (reference defect: attention
  classes read ``config.hidden_dim`` which does not exist,
  src/models/attention.py:45-47 vs src/config.py:53-58) — it defaults to the
  model projection dim (768);
* ``load_config`` reconstructs nested dataclasses *and* enums (reference
  defect admitted at src/config.py:183-185).

TPU-specific additions live in :class:`MeshConfig` (device mesh axes for
pjit/shard_map data/tensor parallelism) — the reference is single-GPU and has
no equivalent (README.md:148-149).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from enum import Enum
from typing import Any, Dict, Optional


class EncoderType(str, Enum):
    """Vision encoder families (reference: src/config.py:7-13)."""

    RESNET = "resnet"
    VIT = "vit"
    SWIN = "swin"
    CONVNEXT = "convnext"
    EFFICIENTNET = "efficientnet"
    CLIP = "clip"
    OBJECT_REGION = "object_region"  # pre-extracted detector features


class DecoderType(str, Enum):
    """Caption decoder families (reference: src/config.py:16-21)."""

    LSTM = "lstm"
    TRANSFORMER = "transformer"
    GPT2 = "gpt2"
    T5 = "t5"
    BART = "bart"


class AttentionType(str, Enum):
    """Cross-attention variants (reference: src/config.py:24-29)."""

    SOFT = "soft"
    MULTI_HEAD = "multi_head"
    ADAPTIVE = "adaptive"
    AOA = "aoa"
    OBJECT = "object"


@dataclass
class EncoderConfig:
    """Reference: src/config.py:32-38."""

    encoder_type: EncoderType = EncoderType.VIT
    pretrained_model_name: str = "google/vit-base-patch16-224"
    freeze: bool = False
    feature_dim: int = 768
    use_object_features: bool = False

    # --- TPU rebuild extensions (self-contained model shapes so the encoder
    # can be built without downloading HF configs; defaults match the HF
    # models named above) ---
    image_size: int = 224
    patch_size: int = 16  # ViT/CLIP patch size
    hidden_size: int = 768  # backbone width before the projection
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    # ResNet stage widths (resnet-50 style bottleneck output channels)
    resnet_depths: tuple = (3, 4, 6, 3)
    resnet_hidden_sizes: tuple = (256, 512, 1024, 2048)
    resnet_embedding_size: int = 64
    resnet_layer_type: str = "bottleneck"  # bottleneck | basic
    # Swin
    swin_window_size: int = 7
    swin_embed_dim: int = 128
    swin_depths: tuple = (2, 2, 18, 2)
    swin_num_heads: tuple = (4, 8, 16, 32)
    # Object-region encoder
    max_objects: int = 36
    region_feature_dim: int = 2048
    # Rematerialize transformer blocks in the backward pass (activation
    # memory ∝ 1/num_layers at ~1/3 extra forward FLOPs) — enables larger
    # train batches on ViT/CLIP backbones; measured in docs/performance.md.
    remat: bool = False
    # Compute the ViT/CLIP q/k/v projections as one [h, 3h] matmul (param
    # "qkv" replaces "query"/"key"/"value"; hf_port.fuse_qkv_params migrates
    # unfused trees). Numerically identical, measured 1.5x faster on the
    # projection block at training shapes (docs/performance.md).
    fused_qkv: bool = False


@dataclass
class DecoderConfig:
    """Reference: src/config.py:41-49."""

    decoder_type: DecoderType = DecoderType.GPT2
    pretrained_model_name: str = "gpt2"
    hidden_dim: int = 768
    num_layers: int = 6
    num_heads: int = 8
    dropout: float = 0.1
    max_length: int = 50

    # --- TPU rebuild extensions ---
    # GPT-2 prefix conditioning (reference hardcodes prefix_length=10,
    # src/models/decoders.py:544): number of per-layer prefix KV tokens.
    prefix_length: int = 10
    # GPT-2 shape parameters used when pretrained weights are not loaded
    # (reference: src/models/decoders.py:520-531 builds GPT2Config from these).
    gpt2_n_positions: int = 1024
    # KV-cached decode step implementation: "auto" picks the fused Pallas
    # kernel (ops/pallas_decode.py) on a single TPU chip and the XLA one-hot
    # path otherwise; "pallas"/"xla" force a path ("pallas" off-TPU runs the
    # kernel in interpreter mode). Explicit "pallas" is also valid for
    # dp-sharded decode: GSPMD partitions the batch-parallel kernel cleanly
    # (tests/test_parallel.py dp8 token-parity); "auto" stays conservative
    # on multi-chip until validated on real multi-chip TPU hardware.
    decode_kernel: str = "auto"


@dataclass
class AttentionConfig:
    """Reference: src/config.py:52-58 (+ hidden_dim fix, see module docstring)."""

    attention_type: AttentionType = AttentionType.MULTI_HEAD
    num_heads: int = 8
    temperature: float = 1.0
    use_geometric: bool = False
    # Fix for reference defect: every attention class reads config.hidden_dim
    # (src/models/attention.py:45-47,130) but the field never existed.
    # Intended value is the model projection dim.
    hidden_dim: int = 768
    # TPU rebuild: route the attention core through fused Pallas kernels.
    use_pallas: bool = False


@dataclass
class TrainingConfig:
    """Reference: src/config.py:61-90."""

    batch_size: int = 64
    num_epochs: int = 15
    learning_rate: float = 5e-5
    weight_decay: float = 0.01

    lr_scheduler: str = "cosine"  # linear | cosine | step
    warmup_steps: int = 2000

    use_rl: bool = True
    rl_start_epoch: int = 10
    rl_reward: str = "cider"  # cider, bleu, meteor, rouge, spice
    rl_weight: float = 1.0
    # TPU rebuild: compute CIDEr rewards on device so the whole SCST step
    # (rollout + reward + REINFORCE update) is one jitted program. Only
    # applies when rl_reward == "cider"; other rewards use host scoring.
    rl_on_device_reward: bool = True

    # bf16 mixed precision replaces the reference's CUDA AMP
    # (reference: src/train/trainer.py:70-71, 227-255).
    use_amp: bool = True
    # AdamW first-moment dtype ("float32" | "bfloat16"): bf16 halves the
    # momentum's HBM footprint/traffic; optax keeps the second moment f32
    # (no nu_dtype knob — documented wall, docs/performance.md).
    adam_mu_dtype: str = "float32"

    use_curriculum: bool = False
    curriculum_strategy: str = "caption_length"
    # TPU rebuild: the reference defines PacingFunction linear/root/
    # exponential/step (src/train/curriculum.py:199-267) but never wires it —
    # its sampler hard-codes linear progress (:155-159). We expose the knob;
    # "linear" reproduces the reference's effective behavior exactly.
    curriculum_pacing: str = "linear"  # linear | root | exponential | step

    use_contrastive_loss: bool = False
    use_itm_loss: bool = False
    use_obj_cls_loss: bool = False

    # --- TPU rebuild extensions ---
    # Legacy stack's doubly-stochastic attention regularization
    # (reference: train.py:101) — available to the modern stack too.
    attention_reg_weight: float = 0.0
    grad_clip_norm: float = 0.0  # 0 disables; legacy clamps +-5 (train.py:107-110)
    contrastive_weight: float = 0.1  # reference: src/train/trainer.py:78
    itm_weight: float = 0.1  # reference: src/train/trainer.py:79
    contrastive_temperature: float = 0.07  # reference: src/train/trainer.py:80


@dataclass
class InferenceConfig:
    """Reference: src/config.py:93-109."""

    decoding_strategy: str = "beam"  # greedy | beam | nucleus
    beam_size: int = 5
    top_p: float = 0.9
    temperature: float = 1.0
    min_length: int = 5
    max_length: int = 20
    length_penalty: float = 0.8

    num_beam_groups: int = 1
    diversity_penalty: float = 0.5

    use_clip_reranking: bool = False
    num_candidates: int = 5


@dataclass
class MeshConfig:
    """TPU device-mesh layout (no reference equivalent: the reference is
    single-GPU, README.md:148-149). Axis sizes of -1 mean "all remaining
    devices"."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass
class ModelConfig:
    """Reference: src/config.py:112-124."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    projection_dim: int = 768
    use_q_former: bool = False
    q_former_num_queries: int = 32

    vocab_size: int = 50257
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2

    # --- TPU rebuild extensions ---
    q_former_num_layers: int = 2  # reference: src/models/captioning_model.py:164
    q_former_num_heads: int = 8
    dtype: str = "bfloat16"  # compute dtype on TPU (MXU-friendly)


@dataclass
class Config:
    """Top-level config (reference: src/config.py:127-152)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    data_root: str = "data"
    train_json: str = "annotations/captions_train2014.json"
    val_json: str = "annotations/captions_val2014.json"
    train_image_dir: str = "train2014"
    val_image_dir: str = "val2014"
    # Pre-extracted detector features (object-region encoder / BUTD path;
    # reference dataset: src/data/dataset.py:180-387)
    features_dir: str = "features"

    image_size: int = 224

    output_dir: str = "outputs"
    checkpoint_dir: str = "checkpoints"
    log_every: int = 100
    save_every: int = 1
    # Mid-epoch (step-granular) checkpoints every N train batches under the
    # logical rolling name ``checkpoint_step`` (0 = off), physically two
    # alternating slots so a crash mid-save never loses the newest
    # committed save (utils/checkpoint.py:STEP_SLOTS). Metadata records (epoch,
    # batch_index, phase) so ``load_checkpoint`` resumes *inside* the epoch
    # with the identical remaining batch sequence — the reference's legacy
    # stack saves every 1000 batches (reference: train.py:117-140) but its
    # modern trainer loses up to a full epoch on preemption
    # (src/train/trainer.py:569-598); async Orbax makes step saves cheap.
    save_every_steps: int = 0
    # Adaptive step-checkpoint throttle (0 = off): step checkpoints may
    # consume at most this fraction of wall time. After a save whose
    # blocking portion cost c seconds, the next step save is skipped until
    # c / frac seconds have elapsed — so a slow storage path (the full-size
    # production run hit a 36-minute blocking D2H over the axon tunnel,
    # docs/performance.md) degrades checkpoint granularity instead of
    # stalling training indefinitely. Epoch checkpoints are never skipped.
    step_ckpt_max_overhead: float = 0.0

    device: str = "tpu"
    num_workers: int = 4
    seed: int = 42
    # Device-resident eval preprocessing: host decodes JPEGs onto a fixed
    # canvas (draft-scaled libjpeg), the antialiased resize + normalization
    # run on the TPU inside the jitted step (ops/resize.py). Training keeps
    # the host RandomResizedCrop path regardless.
    device_resize: bool = False
    # Native (C++) host decode pipeline (native/jpeg_loader.cpp): libjpeg
    # decode + PIL-semantics antialiased resize with an in-process
    # std::thread batch pool. Falls back to PIL automatically when the
    # toolchain is unavailable. native_threads = 0 means one thread per
    # host CPU; native_draft enables DCT-scaled eval decode (fastest,
    # device_resize-grade resampling instead of exact PIL parity).
    native_loader: bool = False
    native_threads: int = 0
    native_draft: bool = False
    # Fold the ImageNet normalization affine into the ViT/CLIP patch-embed
    # matmul (models/encoders.PatchEmbed): the jitted step then consumes raw
    # uint8 images and the normalized f32 image is never materialized in
    # HBM. Encoders without a stride==kernel patch conv (ResNet/Swin/object
    # regions) keep the explicit on-device normalize regardless.
    fold_normalize: bool = False


def get_default_config() -> Config:
    """Returns the default configuration (reference: src/config.py:155-157)."""
    return Config()


_ENUM_FIELDS = {
    "encoder_type": EncoderType,
    "decoder_type": DecoderType,
    "attention_type": AttentionType,
}

_TUPLE_FIELDS = {
    "resnet_depths",
    "resnet_hidden_sizes",
    "swin_depths",
    "swin_num_heads",
}


def _serialize(obj: Any) -> Any:
    if is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _serialize(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, Enum):
        return obj.value
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def config_to_dict(config: Any) -> Dict[str, Any]:
    """Serialize a (possibly nested) config dataclass to plain JSON types."""
    return _serialize(config)


def save_config(config: Config, path: str) -> None:
    """Save config to a JSON file (reference: src/config.py:160-173)."""
    with open(path, "w") as f:
        json.dump(config_to_dict(config), f, indent=2)


def _build_dataclass(cls, data: Dict[str, Any]):
    """Recursively reconstruct a dataclass from a plain dict, coercing enums,
    tuples, and nested dataclasses. Unknown keys are ignored (forward compat)."""
    kwargs = {}
    cls_fields = {f.name: f for f in fields(cls)}
    for name, value in data.items():
        if name not in cls_fields:
            continue
        f = cls_fields[name]
        ftype = f.type
        if name in _ENUM_FIELDS:
            kwargs[name] = _ENUM_FIELDS[name](value)
        elif name in _TUPLE_FIELDS and isinstance(value, list):
            kwargs[name] = tuple(value)
        elif isinstance(value, dict):
            # Nested dataclass field
            actual = _resolve_dataclass_type(ftype)
            if actual is not None:
                kwargs[name] = _build_dataclass(actual, value)
            else:
                kwargs[name] = value
        else:
            kwargs[name] = value
    return cls(**kwargs)


_DATACLASS_TYPES = {
    "EncoderConfig": EncoderConfig,
    "DecoderConfig": DecoderConfig,
    "AttentionConfig": AttentionConfig,
    "TrainingConfig": TrainingConfig,
    "InferenceConfig": InferenceConfig,
    "MeshConfig": MeshConfig,
    "ModelConfig": ModelConfig,
    "Config": Config,
}


def _resolve_dataclass_type(ftype: Any):
    if isinstance(ftype, str):
        return _DATACLASS_TYPES.get(ftype)
    if is_dataclass(ftype):
        return ftype
    return None


def config_from_dict(data: Dict[str, Any]) -> Config:
    """Reconstruct a full Config (enums and nesting included) from a dict."""
    return _build_dataclass(Config, data)


def load_config(path: str) -> Config:
    """Load config from a JSON file, fully reconstructing nested dataclasses
    and enums (fixes reference defect at src/config.py:183-185)."""
    with open(path, "r") as f:
        data = json.load(f)
    return config_from_dict(data)
