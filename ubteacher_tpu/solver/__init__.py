from .build import (
    build_lr_schedule,
    build_optimizer,
    stop_frozen_gradients,
    trainable_mask,
)

__all__ = [
    "build_lr_schedule",
    "build_optimizer",
    "stop_frozen_gradients",
    "trainable_mask",
]
