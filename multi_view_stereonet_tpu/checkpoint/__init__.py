"""Checkpointing: orbax-native checkpoints + TorchScript weight import."""

from .torchscript import load_torchscript_weights, convert_reference_state_dict

__all__ = ["load_torchscript_weights", "convert_reference_state_dict"]
