from . import boxes, losses, nms

__all__ = ["boxes", "losses", "nms"]
