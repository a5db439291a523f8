"""Training u8 transport: bit-exact equivalence with the f32 feed.

The train CLI's ``transfer_u8`` ships raw uint8 pixels host->device and
replicates the omitted float stage(s) inside the jitted step
(ops/quantize). These tests pin the whole chain: the exact-division
kernels over all 256 values, the transform pipelines (both decode
backends), and train-step loss/param bit-identity between transports.
Reference analog: the torch DataLoader always ships float tensors
(multi_view_stereo_dataset.py:56-68) -- this transport is a TPU-native
addition with identical numerics.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.ops.quantize import (
    dequantize_images_u8, dequantize_images_u8_unit, quantize_images_u8,
)


def test_unit_dequantize_bit_exact_all_values():
    """Device x/255 == numpy f32 division for every uint8 value (the
    augmented train pipeline omits Normalize, so the bare quotient must
    itself be exact -- including the u=1 round-to-even tie the
    serving-mode trick tolerates)."""
    u = np.arange(256, dtype=np.uint8)
    host = np.asarray(u, np.float32) / 255.0
    dev = np.asarray(jax.jit(dequantize_images_u8_unit)(u))
    np.testing.assert_array_equal(dev.view(np.uint32), host.view(np.uint32))


def test_full_dequantize_still_bit_exact_all_values():
    """The serving-mode dequantize (x/255*2-1) must remain bit-exact
    after the shared-kernel refactor (ops/quantize._exact_unit_u8)."""
    u = np.arange(256, dtype=np.uint8)
    host = (np.asarray(u, np.float32) / 255.0) * np.float32(2.0) \
        - np.float32(1.0)
    dev = np.asarray(jax.jit(dequantize_images_u8)(u))
    np.testing.assert_array_equal(dev.view(np.uint32), host.view(np.uint32))
    # and the round trip through the quantizer recovers every byte
    np.testing.assert_array_equal(quantize_images_u8(host), u)


def _jpg_tree(tmp_path, n=3, rows=40, cols=56):
    from PIL import Image

    rng = np.random.default_rng(5)
    paths = []
    for i in range(n):
        # smooth texture: per-pixel noise aliases under bilinear resize
        y, x = np.mgrid[0:rows * 2, 0:cols * 2]
        arr = np.stack([128 + 90 * np.sin(x / (7.0 + i) + c)
                        for c in range(3)], axis=-1)
        arr += rng.normal(0, 4, arr.shape)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8),
                        "RGB").save(p, quality=92)
        paths.append(p)
    return paths


@pytest.mark.parametrize("backend", ["native", "pil"])
def test_training_transforms_u8_matches_f32(tmp_path, backend):
    """The u8 training pipeline's pixels, dequantized on-device, equal
    the f32 pipeline's bit-for-bit -- same jitter draw, both backends."""
    from multi_view_stereonet_tpu import native
    from multi_view_stereonet_tpu.data.native_images import (
        NativeImageRef, apply_jitter_pil,
    )
    from multi_view_stereonet_tpu.data.transforms import (
        Compose, RandomColorJitter, ResizeWithIntrinsics, ToArray,
        ToArrayU8, ThreadLocalRng,
    )
    from PIL import Image

    if backend == "native" and not native.available():
        pytest.skip("native loader unavailable")

    paths = _jpg_tree(tmp_path)

    def sample():
        if backend == "native":
            left = NativeImageRef(paths[0])
            rights = [NativeImageRef(p) for p in paths[1:]]
        else:
            left = Image.open(paths[0]).convert("RGB")
            rights = [Image.open(p).convert("RGB") for p in paths[1:]]
        K = np.eye(4, dtype=np.float32)
        return {"left_image": left, "right_images": rights, "K": K}

    rows, cols = 24, 32
    # Same seed => the single-threaded first claim draws identical
    # jitter parameters in both pipelines (ThreadLocalRng contract).
    f32_t = Compose([ResizeWithIntrinsics(rows, cols),
                     RandomColorJitter(ThreadLocalRng(
                         np.random.default_rng(11))), ToArray()])
    u8_t = Compose([ResizeWithIntrinsics(rows, cols),
                    RandomColorJitter(ThreadLocalRng(
                        np.random.default_rng(11))), ToArrayU8()])
    a = f32_t(sample())
    b = u8_t(sample())
    assert b["left_image"].dtype == np.uint8
    deq = jax.jit(dequantize_images_u8_unit)
    np.testing.assert_array_equal(np.asarray(deq(b["left_image"])),
                                  a["left_image"])
    for fa, ub in zip(a["right_images"], b["right_images"]):
        np.testing.assert_array_equal(np.asarray(deq(ub)), fa)


def test_get_training_transforms_u8_pipeline_shape():
    """u8_output threads through the public constructor for both the
    augmented and plain pipelines, and the dequantize-mode helper names
    the right device stage for each."""
    from multi_view_stereonet_tpu.data import (
        get_training_transforms, training_u8_dequantize_mode,
    )

    aug = {"size": [24, 32], "augment": True}
    plain = {"size": [24, 32], "augment": False}
    assert training_u8_dequantize_mode(aug) == "unit"
    assert training_u8_dequantize_mode(aug, fix_normalization=True) == "full"
    assert training_u8_dequantize_mode(plain) == "full"
    for params in (aug, plain):
        t = get_training_transforms(params, np.random.default_rng(0),
                                    u8_output=True)
        assert any(type(s).__name__ == "ToArrayU8" for s in t.transforms)
        assert not any(type(s).__name__ == "Normalize" for s in t.transforms)


@pytest.mark.parametrize("mode", ["unit", "full"])
def test_train_step_u8_equals_f32(mode):
    """One full train step (forward + backward + Adam) produces BIT-
    IDENTICAL loss and updated params whether the images arrive as f32
    or as u8 with the on-device dequantize baked into the step."""
    import optax

    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.train.step import make_train_step

    B, V, H, W = 2, 1, 32, 48
    rng = np.random.default_rng(7)
    u8_left = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    u8_rights = rng.integers(0, 256, (B, V, H, W, 3), dtype=np.uint8)
    if mode == "unit":
        f_left = np.asarray(u8_left, np.float32) / 255.0
        f_rights = np.asarray(u8_rights, np.float32) / 255.0
    else:
        f_left = (np.asarray(u8_left, np.float32) / 255.0) \
            * np.float32(2.0) - np.float32(1.0)
        f_rights = (np.asarray(u8_rights, np.float32) / 255.0) \
            * np.float32(2.0) - np.float32(1.0)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.9 * W
    K[0, 2], K[1, 2] = (W - 1) / 2.0, (H - 1) / 2.0
    T = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    T[:, :, 0, 3] = 0.5
    common = {
        "K": np.tile(K, (B, 1, 1)),
        "T_right_in_left": T,
        "left_depthmap_true": rng.uniform(
            2, 30, (B, H, W)).astype(np.float32),
        "right_depthmap_true": rng.uniform(
            2, 30, (B, V, H, W)).astype(np.float32),
    }
    batch_f32 = {"left_image": f_left, "right_images": f_rights, **common}
    batch_u8 = {"left_image": u8_left, "right_images": u8_rights, **common}

    config = MultiViewStereoNetConfig(num_idepth_samples=4)
    loss_config = LossConfig()
    tx = optax.adam(1e-3)
    params = init_mvsnet(jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    step_f32 = jax.jit(make_train_step(config, loss_config, tx))
    step_u8 = jax.jit(make_train_step(config, loss_config, tx,
                                      transfer_u8=mode))
    p1, _, l1, _ = step_f32(params, opt_state, batch_f32)
    p2, _, l2, _ = step_u8(params, opt_state, batch_u8)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_two_view_train_step_u8_equals_f32():
    """The two-view recipe (estimate_right_idepthmap) carries a SINGULAR
    "right_image" key after the train CLI's batch adaptation; the u8
    dequantize must cover it too (regression: it once KeyError'd on the
    absent plural key at trace time)."""
    import optax

    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.train.step import make_train_step

    B, H, W = 2, 32, 48
    rng = np.random.default_rng(9)
    u8_left = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    u8_right = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.9 * W
    K[0, 2], K[1, 2] = (W - 1) / 2.0, (H - 1) / 2.0
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = 0.5
    common = {
        "K": np.tile(K, (B, 1, 1)),
        "T_right_in_left": T,
        "left_depthmap_true": rng.uniform(2, 30, (B, H, W)).astype(np.float32),
        "right_depthmap_true": rng.uniform(2, 30, (B, H, W)).astype(np.float32),
    }
    batch_f32 = {"left_image": np.asarray(u8_left, np.float32) / 255.0,
                 "right_image": np.asarray(u8_right, np.float32) / 255.0,
                 **common}
    batch_u8 = {"left_image": u8_left, "right_image": u8_right, **common}

    config = MultiViewStereoNetConfig(num_idepth_samples=4)
    tx = optax.adam(1e-3)
    params = init_mvsnet(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    kw = dict(multi_view=False, estimate_right_idepthmap=True)
    step_f32 = jax.jit(make_train_step(config, LossConfig(), tx, **kw))
    step_u8 = jax.jit(make_train_step(config, LossConfig(), tx,
                                      transfer_u8="unit", **kw))
    p1, _, l1, _ = step_f32(params, opt_state, batch_f32)
    p2, _, l2, _ = step_u8(params, opt_state, batch_u8)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_cli_transfer_u8_runs(tmp_path):
    """End-to-end: the train CLI with transfer_u8 trains on the
    synthetic tree, logs the transport, and writes finite losses."""
    from synthetic_data import make_gta_sfm_tree
    from multi_view_stereonet_tpu.train.config import load_params_yaml
    from multi_view_stereonet_tpu.train.train_cli import train

    work = str(tmp_path)
    data_dir, split = make_gta_sfm_tree(work, num_sequences=1, frames=6,
                                        rows=32, cols=48, seed=3,
                                        scene="plane")
    cfg = load_params_yaml(None)
    cfg.update({"size": [32, 48], "batch_size": 2, "num_epochs": 1,
                "augment": True, "transfer_u8": True, "num_workers": 2,
                "num_idepth_samples": 4, "print_freq": 1, "plot_freq": 0,
                "debug_image_freq": 0, "supervision_factor": 1.0,
                "reconstruction_factor": 0.0, "left_right_factor": 0.0})
    out = os.path.join(work, "run")
    # val_split = train split here: exercises the u8 VALIDATION path too
    # (testing transforms u8_output + full dequantize in val_step).
    train(cfg, data_dir, split, split, out, max_steps=2)
    losses = open(os.path.join(out, "losses.txt")).read().splitlines()
    assert len(losses) >= 2  # header + >=1 row
    vals = [float(r.split()[3]) for r in losses[1:]]
    assert all(np.isfinite(v) for v in vals)
    vrows = open(os.path.join(out, "validation.txt")).read().splitlines()
    assert len(vrows) >= 2 and np.isfinite(float(vrows[1].split()[1]))