"""Checkpointing: orbax-native checkpoints + TorchScript weight import
+ jax.export serving artifacts."""

from .torchscript import load_torchscript_weights, convert_reference_state_dict
from .export import (export_inference, save_exported, load_exported,
                     make_serving_fn)

__all__ = ["load_torchscript_weights", "convert_reference_state_dict",
           "export_inference", "save_exported", "load_exported",
           "make_serving_fn"]
