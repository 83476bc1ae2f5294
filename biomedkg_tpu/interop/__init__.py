"""Interop with the reference torch/Lightning stack (checkpoint import)."""

from .torch_ckpt import from_torch_checkpoint, is_torch_checkpoint

__all__ = ["from_torch_checkpoint", "is_torch_checkpoint"]
