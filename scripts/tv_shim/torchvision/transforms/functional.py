"""torchvision.transforms.functional shim with 0.6 semantics.

Spec (torchvision 0.6, the version the reference pins in
requirements.txt): to_tensor converts PIL images to CHW float/255;
numpy arrays go HWC->CHW with a channel axis added for 2-D inputs, and
only uint8 inputs are scaled by 1/255 (float depth maps pass through
untouched). normalize subtracts/divides per channel on a clone. resize
takes an (h, w) sequence and calls PIL's resize with BILINEAR."""

import numpy as np
import torch
from PIL import Image


def to_tensor(pic):
    if isinstance(pic, Image.Image):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        img = torch.from_numpy(np.ascontiguousarray(arr.transpose((2, 0, 1))))
        if img.dtype == torch.uint8:
            return img.float().div(255.0)
        return img.float()
    if isinstance(pic, np.ndarray):
        if pic.ndim == 2:
            pic = pic[:, :, None]
        img = torch.from_numpy(np.ascontiguousarray(pic.transpose((2, 0, 1))))
        if img.dtype == torch.uint8:
            return img.float().div(255.0)
        return img
    raise TypeError(f"to_tensor: unsupported input type {type(pic)}")


def normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype, device=tensor.device)
    std = torch.as_tensor(std, dtype=tensor.dtype, device=tensor.device)
    tensor.sub_(mean[:, None, None]).div_(std[:, None, None])
    return tensor


def resize(img, size, interpolation=Image.BILINEAR):
    if not isinstance(img, Image.Image):
        raise TypeError(f"resize: unsupported input type {type(img)}")
    if isinstance(size, (list, tuple)):
        rows, cols = size
        return img.resize((cols, rows), interpolation)
    # Int size (shorter edge) -- unused by the reference eval path, but
    # implement the documented semantics for completeness.
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, int(size * h / w)), interpolation)
    return img.resize((int(size * w / h), size), interpolation)
