from .rng import RngStream
from .logging import setup_logging, MetricLogger, AverageMeter
