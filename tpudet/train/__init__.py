from .optim import (YoloSGDConfig, make_yolo_sgd, cosine_lr,
                    warmup_factors, global_norm_clip, param_group_label)
from .ema import ema_update, ema_momentum
from .train_state import TrainState, create_train_state, make_train_step

__all__ = [
    'YoloSGDConfig', 'make_yolo_sgd', 'cosine_lr', 'warmup_factors',
    'global_norm_clip', 'param_group_label', 'ema_update', 'ema_momentum',
    'TrainState', 'create_train_state', 'make_train_step'
]
