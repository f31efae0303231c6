from .coco import (
    COCOCaptionDataset,
    ObjectDetectionFeaturesDataset,
    build_coco_datasets,
    collate,
    iterate_batches,
    normalize_images,
)
from .tokenizer import WordVocab, HFTokenizerAdapter, load_tokenizer, word_tokenize
from .bpe import GPT2BPETokenizer
from .pipeline import prefetch, shard_batch
from .synthetic import make_synthetic_coco, make_synthetic_object_features
