"""u8 image-transport numerics: bit-exact device-side de/quantization.

The host decode pipeline's natural intermediate is uint8 pixels (PIL and
the native C++ loader both operate in the u8 domain through resize and
color jitter). Shipping those raw bytes host->device and replicating the
float conversion on-device cuts H2D transfer 4x and removes all host
float work per image -- the u8 transport used by serving
(eval/streaming --transfer_u8, reference eval analog test.py:283-305)
and by training (train_cli ``transfer_u8``, reference train loader
analog multi_view_stereo_dataset.py:56-68).

Two device-side replicas exist because the reference's two host
pipelines differ (a reproduced quirk, transforms.py):

- test/eval pipeline: ToArray + Normalize (x/255 * 2 - 1)
  -> ``dequantize_images_u8``
- augmented train pipeline: ToArray ONLY (x/255; the reference omits
  Normalize when augmenting) -> ``dequantize_images_u8_unit``

Both are BIT-IDENTICAL to the host float path for all 256 inputs,
property-tested per backend (tests/test_streaming.py,
tests/test_u8_training.py) and verified on the real TPU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def quantize_images_u8(x: np.ndarray) -> np.ndarray:
    """Invert Normalize∘ToArray: [-1, 1] float32 image -> the uint8 it
    came from. Exact for every producible value: the pipeline emits only
    the 256 values fl(fl(u/255)*2-1), consecutive ones ~1e6 f32 ulps
    apart, so truncating the affine inverse u + 0.5 + O(ulp) recovers u
    bit-exactly (property-tested over all 256 in
    tests/test_streaming.py).

    FALLBACK path only, for datasets built with f32 transforms: it
    still burns host cycles re-walking the batch (~2.6 s per 480x640
    b24 batch measured on this 1-core host). The fast path is to build
    the dataset with ``get_testing_transforms(..., u8_output=True)`` so
    pixels stay uint8 straight from the decoder and this function never
    runs -- StreamingRunner skips it for batches that are already u8."""
    tmp = x * np.float32(127.5)
    tmp += np.float32(128.0)
    return tmp.astype(np.uint8)


def _exact_unit_u8(u):
    """uint8 -> f32 u/255, bit-exact with numpy's f32 division.

    A literal ``u/255.0`` is NOT used: XLA folds division-by-constant
    into multiply-by-reciprocal (CPU) and TPU f32 division is
    reciprocal-based -- both are 1 ulp off the correctly-rounded
    quotient for ~200 of the 256 values. Instead the quotient is built
    with exact integer ops: ``255 * 16843009 == 2**32 - 1``, so
    u/255 == (u*16843009) * 2**-32 * (1 + 2**-32 + ...). Converting
    m = u*16843009 to f32 rounds at the 24-bit boundary without the
    positive (1 + 2**-32...) tail, which flips exact-tie cases to
    even instead of up; OR-ing the low bit (m is 25 bits for u >= 1)
    breaks those ties upward and is absorbed everywhere else EXCEPT
    u=1, whose low bit is already set (m=0x01010101 is an exact tie
    that must round up but rounds to even) -- that single value is
    patched with the host constant. Bit-exact for all 256 inputs."""
    m = u.astype(jnp.uint32) * jnp.uint32(16843009)
    m = m | (m != 0).astype(jnp.uint32)
    v = m.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    one_over_255 = jnp.float32(np.float32(1.0) / np.float32(255.0))
    return jnp.where(u == jnp.uint8(1), one_over_255, v)


def dequantize_images_u8(u):
    """Device-side replica of ToArray+Normalize (transforms.py:203-233):
    uint8 -> f32/255 -> *2-1, bit-exact with the host pipeline on every
    backend (the test/eval transform chain -- serving transport).

    Built on ``_exact_unit_u8``; the ``*2 - 1`` stage is a single f32
    rounding on both host and device, so exactness composes. Property-
    tested per backend in tests/test_streaming.py and verified on the
    real TPU."""
    return _exact_unit_u8(u) * jnp.float32(2.0) - jnp.float32(1.0)


def dequantize_images_u8_unit(u):
    """Device-side replica of ToArray ALONE (transforms.py:203-224):
    uint8 -> f32 u/255, bit-exact -- the AUGMENTED train pipeline's
    float conversion (the reference omits Normalize when augmenting,
    multi_view_stereo_dataset.py:56-68; reproduced in
    get_training_transforms). The training u8 transport dequantizes
    with this inside the jitted train step."""
    return _exact_unit_u8(u)
