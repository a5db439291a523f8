"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device (pjit / shard_map) tests use the standard trick of faking an
8-device mesh on the host CPU via --xla_force_host_platform_device_count.
Must run before jax is imported anywhere.
"""

import os
import sys
import types

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The hosted-TPU plugin (if any) re-registers itself via jax.config during
# interpreter startup; force CPU again post-import.
jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference implementation (torch CPU) as a parity oracle.

    The reference source is *run*, never copied. torchvision is absent in
    this image but unused by the model modules, so it is stubbed out.
    """
    if not reference_available():
        pytest.skip("reference implementation not mounted")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
    if "pyquaternion" not in sys.modules:
        pq = types.ModuleType("pyquaternion")
        pq.Quaternion = object
        sys.modules["pyquaternion"] = pq
    # The reference's `datasets/` has no __init__.py; as a namespace package
    # it loses to the HuggingFace `datasets` in site-packages. Pin it.
    if ("datasets" not in sys.modules
            or not getattr(sys.modules["datasets"], "__path__", [None])[0]
            == os.path.join(REFERENCE_DIR, "datasets")):
        pkg = types.ModuleType("datasets")
        pkg.__path__ = [os.path.join(REFERENCE_DIR, "datasets")]
        sys.modules["datasets"] = pkg
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import torch  # noqa: F401
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from stereo import image_predictor as ip
        from multi_view_stereonet import multi_view_stereonet as mvs
        from multi_view_stereonet import multi_view_stereonet_utils as mvs_utils
        from multi_view_stereonet import losses as mvs_losses
        from utils import losses as ulosses
        from utils import image_utils as uimage
    return types.SimpleNamespace(
        ip=ip, mvs=mvs, mvs_utils=mvs_utils, mvs_losses=mvs_losses,
        ulosses=ulosses, uimage=uimage,
    )
