"""Training losses: supervised, photometric, consistency, regularizers.

JIT-safe re-design of the reference losses
(/root/reference/multi_view_stereonet/losses.py and
/root/reference/utils/losses.py): all boolean-mask indexing becomes
where-based masked reductions with identical means.
"""

from .supervised import pseudo_huber_loss, supervised_idepthmap_loss
from .photometric import ssim, reconstruction_photometric_loss, smoothness_loss
from .consistency import (
    get_occlusion_mask,
    reconstruction_loss,
    left_right_idepthmap_consistency_losses,
)
from .regularizers import corner_loss, gradient_matching_loss
from .compute import compute_losses, LossConfig

__all__ = [
    "pseudo_huber_loss",
    "supervised_idepthmap_loss",
    "ssim",
    "reconstruction_photometric_loss",
    "smoothness_loss",
    "get_occlusion_mask",
    "reconstruction_loss",
    "left_right_idepthmap_consistency_losses",
    "corner_loss",
    "gradient_matching_loss",
    "compute_losses",
    "LossConfig",
]
