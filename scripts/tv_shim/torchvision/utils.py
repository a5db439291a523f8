"""torchvision.utils shim: only save_image, and only to fail loudly.

The reference calls ``tv.utils.save_image`` solely from its training
debug-image logger (multi_view_stereonet_utils.py:252-253), which the
parity eval never reaches (no ``--save_images``, no training)."""


def save_image(*args, **kwargs):
    raise NotImplementedError(
        "torchvision shim: save_image is not implemented (the parity "
        "eval path never calls it)")
