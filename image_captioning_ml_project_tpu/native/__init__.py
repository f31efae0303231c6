"""Native (C++) host-pipeline components. See loader.py / jpeg_loader.cpp."""

from .loader import (available, decode_eval_batch, decode_square_batch,
                     decode_train_batch, probe)

__all__ = ["available", "decode_eval_batch", "decode_square_batch",
           "decode_train_batch", "probe"]
