from .trainer import CaptioningTrainer, TrainState
from .losses import CombinedLoss, shifted_cross_entropy, contrastive_loss, attention_regularization
from .curriculum import CurriculumSampler, PacingFunction, create_curriculum_sampler
from .optim import create_optimizer, create_learning_rate_schedule
