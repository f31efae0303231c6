from .metrics import (
    calculate_metrics,
    calculate_metrics_native,
    bleu,
    rouge_l,
    cider_d,
    meteor_lite,
    per_sample_cider,
)
from .cider_device import (
    build_df_table,
    encode_references,
    per_sample_cider_device,
)
from .coco_eval import evaluate_model_on_coco
