"""torchvision.transforms shim: Compose, Lambda, ColorJitter.get_params.

torchvision-0.6 semantics for the pieces the reference dataset
pipelines instantiate (multi_view_stereo_dataset.py:56-98)."""

from . import functional  # noqa: F401


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, sample):
        return self.fn(sample)


class ColorJitter:
    """Only reachable from the reference's *training* transforms
    (RandomColorJitterStereo), which the parity eval never builds."""

    @staticmethod
    def get_params(brightness, contrast, saturation, hue):
        raise NotImplementedError(
            "torchvision shim: ColorJitter is not implemented (the "
            "parity eval uses testing transforms only)")
