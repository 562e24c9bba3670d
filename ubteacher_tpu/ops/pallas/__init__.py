from .focal_pallas import sigmoid_focal_loss_pallas
from .giou_pallas import giou_loss_pallas
from .nms_pallas import nms_keep_pallas

__all__ = [
    "sigmoid_focal_loss_pallas",
    "giou_loss_pallas",
    "nms_keep_pallas",
]
