"""Network modules: functional JAX (param pytrees + pure apply functions).

Layer specs mirror the reference network family
(/root/reference/multi_view_stereonet/multi_view_stereonet.py,
/root/reference/utils/resnet.py): GroupNorm(C//8), LeakyReLU(0.2),
single-conv residual blocks, N(0, 0.01) conv init with zero biases.
Layouts are TPU-native: NHWC for images/features, (B, D, H, W, C) for
volumes (hypothesis axis D is a real array axis).
"""

from .layers import (
    init_conv2d,
    conv2d,
    init_conv3d,
    conv3d,
    init_group_norm,
    group_norm,
    leaky_relu,
    init_resnet_block,
    resnet_block,
)
from .feature_network import init_feature_network, feature_network
from .refiners import (
    init_feature_refiner,
    feature_refiner,
    init_idepthmap_refiner,
    idepthmap_refiner,
)
from .cost_volume import init_cost_volume_filter, cost_volume_filter, extract_idepthmap
from .mvsnet import MultiViewStereoNetConfig, init_mvsnet, mvsnet_forward

__all__ = [
    "init_conv2d", "conv2d", "init_conv3d", "conv3d",
    "init_group_norm", "group_norm", "leaky_relu",
    "init_resnet_block", "resnet_block",
    "init_feature_network", "feature_network",
    "init_feature_refiner", "feature_refiner",
    "init_idepthmap_refiner", "idepthmap_refiner",
    "init_cost_volume_filter", "cost_volume_filter", "extract_idepthmap",
    "MultiViewStereoNetConfig", "init_mvsnet", "mvsnet_forward",
]
