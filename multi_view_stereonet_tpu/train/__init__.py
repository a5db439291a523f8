"""Training/eval pipeline: batch unpacking, train step, config, logging."""

from .pipeline import unpack_batch, multi_view_unpack_batch

__all__ = ["unpack_batch", "multi_view_unpack_batch"]
