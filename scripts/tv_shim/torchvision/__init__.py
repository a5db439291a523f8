"""Minimal torchvision shim (this image ships torch but not torchvision).

Implements exactly the torchvision-0.6 API surface the reference eval
path touches (/root/reference/datasets/multi_view_stereo_dataset.py:
Compose/Lambda pipelines built from ``functional.resize`` /
``functional.to_tensor`` / ``functional.normalize``), with
torchvision-0.6 semantics:

- ``to_tensor``: PIL image -> CHW float tensor / 255; numpy 2-D arrays
  gain a leading channel axis; non-uint8 numpy arrays keep their dtype
  and are NOT scaled.
- ``normalize``: per-channel (x - mean) / std on a cloned CHW tensor.
- ``resize``: PIL ``img.resize((w, h), BILINEAR)`` for (h, w) sizes.

Used only to run the reference's own ``test.py`` as a parity oracle
(scripts/parity_eval_cli.py); nothing in the TPU framework imports it.
"""

from . import transforms  # noqa: F401
from . import utils  # noqa: F401

__version__ = "0.6-shim"
