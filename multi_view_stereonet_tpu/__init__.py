"""multi_view_stereonet_tpu: a TPU-native (JAX/XLA/Pallas) multi-view-stereo framework.

A from-scratch re-design of the capabilities of MultiViewStereoNet
(Greene & Roy, ICRA 2021; reference implementation: robustrobotics/
multi_view_stereonet) for TPU hardware:

- ``geometry``   pure-function camera geometry (homographies, projections)
- ``ops``        compute primitives: bilinear-gather warp (XLA + Pallas),
                 separable matmul resizes, pooling
- ``models``     the network (feature extractor, incremental plane-sweep,
                 cost-volume filter, coarse-to-fine refiners)
- ``losses``     supervised / photometric / consistency losses
- ``data``       GTA-SfM + DeMoN dataset loaders, transforms, split parsing
- ``train``      optax/pjit training loop, config, logging
- ``eval``       test CLI with depth metrics matching the reference protocol
- ``checkpoint`` orbax checkpoints + TorchScript weight importer
- ``parallel``   device-mesh / sharding helpers
- ``utils``      visualization, galleries, PFM IO, timers

Everything under models/ops/geometry is shape-static, jit-compatible and
vmappable; tensors use NHWC / NDHWC layouts (TPU-friendly), volumes are
(batch, depth_hypothesis, rows, cols, channels).
"""

__version__ = "0.1.0"
