from .build import build_lr_schedule, build_optimizer, trainable_mask

__all__ = ["build_lr_schedule", "build_optimizer", "trainable_mask"]
