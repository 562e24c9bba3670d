from .checkpointer import TSCheckpointer

__all__ = ["TSCheckpointer"]
