"""Pallas TPU kernels (with pure-XLA fallbacks for CPU and odd shapes)."""

from .warp_kernel import homography_warp_pallas, pallas_warp_supported

__all__ = ["homography_warp_pallas", "pallas_warp_supported"]
