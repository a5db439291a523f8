"""Randomized forward-config sweep vs the torch oracle.

The golden tests in test_model_parity.py pin specific configs (V=1/2/3,
D=12, one fixed refiner combo). This sweep draws random points in the
config space the reference's forward accepts (multi_view_stereonet.py:
forward(..., num_idepth_samples, do_cost_volume_filter, do_refiners)) --
hypothesis counts other than 12, arbitrary refiner masks (including
refiner4-off, which flips the baseline^2 un-normalization quirk, and
level combinations that skip the upsample chain), filter on/off, mixed
V and B -- and checks full-pyramid parity at pretrained weights. Seeded:
every draw is reproducible.
"""

import numpy as np
import pytest

from tests.test_model_parity import (
    assert_outputs_close, jax_forward, make_inputs, pretrained_sd,
    torch_forward,
)


def _draw_config(rng):
    D = int(rng.choice([4, 6, 9, 16]))
    cvf = bool(rng.integers(0, 2))
    # Refiner mask: anything goes, including all-off (pure soft-argmin
    # pyramid) and refiner4-only.
    refiners = tuple(bool(b) for b in rng.integers(0, 2, size=5))
    B = int(rng.choice([1, 2]))
    V = int(rng.choice([1, 2]))
    return D, cvf, refiners, B, V


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(4))
def test_forward_parity_random_config(reference_modules, pretrained_sd, trial):
    rng = np.random.default_rng(100 + trial)
    D, cvf, refiners, B, V = _draw_config(rng)
    left, rights, K, T = make_inputs(B=B, V=V, H=64, W=80, seed=200 + trial)
    config = f"D={D} cvf={cvf} refiners={refiners} B={B} V={V}"
    ref_out = torch_forward(reference_modules, pretrained_sd, left, rights,
                            K, T, D=D, cvf=cvf, refiners=refiners)
    jax_out = jax_forward(pretrained_sd, left, rights, K, T,
                          D=D, cvf=cvf, refiners=refiners)
    try:
        assert_outputs_close(jax_out, ref_out)
    except AssertionError as e:
        raise AssertionError(f"config {config}: {e}") from e
