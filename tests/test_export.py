"""jax.export serving artifact: serialize/deserialize round trip equals
the live forward (the TorchScript-export analog, SURVEY L9 artifacts)."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.models import (
    MultiViewStereoNetConfig, init_mvsnet,
)
from multi_view_stereonet_tpu.checkpoint import (
    export_inference, save_exported, load_exported, make_serving_fn,
)


def _inputs(B=1, V=2, H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.9 * W
    K[0, 2], K[1, 2] = (W - 1) / 2.0, (H - 1) / 2.0
    T = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    T[:, :, 0, 3] = 0.5
    for v in range(V):
        T[:, v, 2, 3] = 0.05 * v
    return (
        jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (B, V, H, W, 3)).astype(np.float32)),
        jnp.asarray(np.tile(K, (B, 1, 1))),
        jnp.asarray(T),
    )


def test_export_roundtrip_matches_live_forward(tmp_path):
    params = init_mvsnet(jax.random.PRNGKey(0))
    config = MultiViewStereoNetConfig(num_idepth_samples=4)
    args = _inputs()

    live = jax.jit(make_serving_fn(params, config))(*args)
    assert live.shape == (1, 32, 48)
    assert bool(jnp.all(jnp.isfinite(live)))

    exported = export_inference(params, config, batch_size=1, views=2,
                                size=(32, 48))
    path = str(tmp_path / "model.jaxexport")
    save_exported(exported, path)

    reloaded = load_exported(path)
    out = reloaded.call(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(live))

    # The artifact is platform-tagged (serving refuses a wrong backend).
    assert jax.default_backend() in reloaded.platforms


@pytest.mark.slow
def test_export_cli(tmp_path):
    """CLI path: weights dir (msgpack) -> artifact file."""
    from multi_view_stereonet_tpu.checkpoint.native import save_params
    from multi_view_stereonet_tpu.checkpoint.export import main

    params = init_mvsnet(jax.random.PRNGKey(1))
    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_params(str(wdir), params)  # writes stereo_network.msgpack inside

    out = str(tmp_path / "model.jaxexport")
    main([str(wdir), out, "--size", "32", "48", "--views", "1"])
    reloaded = load_exported(out)
    res = reloaded.call(*_inputs(V=1))
    assert res.shape == (1, 32, 48)


def test_export_u8_serving_contract_matches_streaming_runner(tmp_path):
    """Production serving contract (VERDICT r4 #4): u8 image inputs with
    the on-device dequantize baked in + f16 fetch must serve EXACTLY
    what the live StreamingRunner u8/f16 device path serves."""
    from multi_view_stereonet_tpu.eval.streaming import StreamingRunner

    params = init_mvsnet(jax.random.PRNGKey(0))
    config = MultiViewStereoNetConfig(num_idepth_samples=4)
    B, V, H, W = 2, 1, 32, 48
    rng = np.random.default_rng(3)
    _, _, K, T = _inputs(B=B, V=V, H=H, W=W)
    left = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    rights = rng.integers(0, 256, (B, V, H, W, 3), dtype=np.uint8)

    runner = StreamingRunner(params, config, fetch_dtype="float16",
                             transfer_u8=True)
    live = np.asarray(runner.forward(
        {"left_image": jnp.asarray(left), "right_images": jnp.asarray(rights),
         "K": K, "T_right_in_left": T}))
    assert live.dtype == np.float16

    exported = export_inference(params, config, batch_size=B, views=V,
                                size=(H, W), input_u8=True,
                                fetch_dtype="float16")
    path = str(tmp_path / "serving.jaxexport")
    save_exported(exported, path)
    out = np.asarray(load_exported(path).call(left, rights, K, T))
    assert out.dtype == np.float16
    np.testing.assert_array_equal(out.view(np.uint8), live.view(np.uint8))
