"""Native (C++) image-loading pipeline: parity with PIL and fallbacks.

The loader (native/image_loader.cc) must be bit-exact with the PIL
pipeline -- same libjpeg-turbo decode, a faithful replication of
Pillow's BILINEAR resample (fixed-point coefficients, u8 two-pass), and
exact x/255 conversion -- so eval results are identical whichever
backend a dataset uses. Tests skip when the toolchain is unavailable.
"""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from multi_view_stereonet_tpu import native
from multi_view_stereonet_tpu.data import GTASfMMultiViewDataset
from multi_view_stereonet_tpu.data import transforms as T

from synthetic_data import make_gta_sfm_tree

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native loader unavailable")


def _save_jpegs(tmp, sizes, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i, (w, h) in enumerate(sizes):
        img = Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
        p = os.path.join(tmp, f"im{i}.jpg")
        img.save(p, quality=92)
        paths.append(p)
    return paths


@needs_native
def test_decode_resize_matches_pil_bitexact(tmp_path):
    """Decode + BILINEAR resize + [0,1]: identical to the PIL pipeline
    for exact-size, downscale and upscale sources."""
    paths = _save_jpegs(str(tmp_path), [(640, 480), (1280, 720), (333, 217)])
    out, ok = native.load_images(paths, 480, 640)
    assert ok.all()
    for i, p in enumerate(paths):
        pil = Image.open(p).convert("RGB")
        if pil.size != (640, 480):
            pil = pil.resize((640, 480), Image.BILINEAR)
        ref = np.asarray(pil, np.float32) / 255.0
        np.testing.assert_array_equal(out[i], ref)


@needs_native
def test_jpeg_dims_and_failure_status(tmp_path):
    paths = _save_jpegs(str(tmp_path), [(64, 48)])
    assert native.jpeg_dims(paths[0]) == (64, 48)
    assert native.jpeg_dims(str(tmp_path / "missing.jpg")) is None

    bad = str(tmp_path / "corrupt.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    out, ok = native.load_images([paths[0], bad], 48, 64)
    assert ok.tolist() == [True, False]


@needs_native
def test_dataset_native_backend_bitexact():
    """Full dataset + standard test transform pipeline: native == pil."""
    with tempfile.TemporaryDirectory() as tmp:
        data_dir, split = make_gta_sfm_tree(tmp)

        def make(backend):
            tr = T.Compose([T.ResizeWithIntrinsics(64, 96), T.ToArray(),
                            T.Normalize()])
            return GTASfMMultiViewDataset(
                data_dir, split, transform=tr,
                load_groundtruth_depthmaps=True, shuffle=False,
                decode_backend=backend)

        a = make("pil")[0]
        b = make("native")[0]
        np.testing.assert_array_equal(np.asarray(a["left_image"]),
                                      np.asarray(b["left_image"]))
        for ra, rb in zip(a["right_images"], b["right_images"]):
            np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(a["K"], b["K"])


@needs_native
def test_augmented_pipeline_materializes_refs():
    """Image-mutating transforms fall back to PIL transparently and
    produce identical results under either backend."""
    with tempfile.TemporaryDirectory() as tmp:
        data_dir, split = make_gta_sfm_tree(tmp)

        def make(backend, seed):
            tr = T.Compose([
                T.ResizeWithIntrinsics(64, 96),
                T.RandomColorJitter(rng=np.random.default_rng(seed)),
                T.RollRight180(),
                T.ToArray(), T.Normalize(),
            ])
            return GTASfMMultiViewDataset(data_dir, split, transform=tr,
                                          shuffle=False,
                                          decode_backend=backend)

        a = make("pil", 7)[0]
        b = make("native", 7)[0]
        np.testing.assert_array_equal(np.asarray(a["left_image"]),
                                      np.asarray(b["left_image"]))
        for ra, rb in zip(a["right_images"], b["right_images"]):
            np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


def test_pil_backend_unchanged_without_native():
    """decode_backend='pil' never touches the native path."""
    with tempfile.TemporaryDirectory() as tmp:
        data_dir, split = make_gta_sfm_tree(tmp)
        tr = T.Compose([T.ResizeWithIntrinsics(64, 96), T.ToArray(),
                        T.Normalize()])
        ds = GTASfMMultiViewDataset(data_dir, split, transform=tr,
                                    shuffle=False, decode_backend="pil")
        s = ds[0]
        assert isinstance(s["left_image"], np.ndarray)
        assert s["left_image"].shape == (64, 96, 3)


@needs_native
def test_native_jitter_bitexact_vs_pil(tmp_path):
    """load_images_jitter: decode+resize+4-op color jitter, bit-exact
    with the PIL ImageEnhance/HSV pipeline for random factors, orders,
    and both resize directions."""
    from PIL import ImageEnhance

    paths = _save_jpegs(str(tmp_path), [(160, 120), (96, 64)])
    rng = np.random.default_rng(3)

    def pil_jitter(path, rows, cols, order, bf, cf, sf, hshift):
        img = Image.open(path).convert("RGB")
        if img.size != (cols, rows):
            img = img.resize((cols, rows), Image.BILINEAR)
        for op in order:
            if op == 0:
                img = ImageEnhance.Brightness(img).enhance(bf)
            elif op == 1:
                img = ImageEnhance.Contrast(img).enhance(cf)
            elif op == 2:
                img = ImageEnhance.Color(img).enhance(sf)
            else:
                hsv = np.array(img.convert("HSV"))
                hsv[..., 0] = (hsv[..., 0].astype(np.int16) + hshift) % 256
                img = Image.fromarray(hsv, "HSV").convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    for trial in range(12):
        rows, cols = (120, 160) if trial % 2 else (48, 64)
        bf, cf, sf = rng.uniform(0.8, 1.2, 3)
        hshift = int(rng.uniform(-0.1, 0.1) * 255)
        order = [int(o) for o in rng.permutation(4)]
        got, ok = native.load_images_jitter(paths, rows, cols, order,
                                            bf, cf, sf, hshift)
        assert ok.all()
        for i, p in enumerate(paths):
            want = pil_jitter(p, rows, cols, order, bf, cf, sf, hshift)
            np.testing.assert_array_equal(got[i], want)


@needs_native
def test_augmented_training_pipeline_native_jitter_bitexact():
    """The full augmented TRAIN pipeline (resize -> jitter -> to-array,
    the 150-epoch recipe's transform chain) produces IDENTICAL tensors
    under the pil and native backends for the same seed -- the jitter
    runs inside the C++ decode call on the native path (no PIL
    materialization), so this pins the end-to-end bit-exactness that
    makes decode_backend=auto safe for training."""
    from multi_view_stereonet_tpu.data import get_training_transforms
    from multi_view_stereonet_tpu.data.native_images import has_refs

    with tempfile.TemporaryDirectory() as tmp:
        data_dir, split = make_gta_sfm_tree(tmp)
        params = {"size": [64, 96], "augment": True, "seed": 0}

        def batch(backend, seed):
            tr = get_training_transforms(params, np.random.default_rng(seed))
            ds = GTASfMMultiViewDataset(data_dir, split, transform=tr,
                                        shuffle=False, decode_backend=backend)
            return [ds[i] for i in range(len(ds))]

        # Confirm the native path really keeps refs through the jitter
        # (i.e. the C++ jitter runs) rather than materializing.
        tr = T.Compose([T.ResizeWithIntrinsics(64, 96),
                        T.RandomColorJitter(rng=np.random.default_rng(1))])
        ds = GTASfMMultiViewDataset(data_dir, split, transform=tr,
                                    shuffle=False, decode_backend="native")
        assert has_refs(ds[0])

        for a, b in zip(batch("pil", 7), batch("native", 7)):
            np.testing.assert_array_equal(np.asarray(a["left_image"]),
                                          np.asarray(b["left_image"]))
            for ra, rb in zip(a["right_images"], b["right_images"]):
                np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


@needs_native
def test_hsv_roundtrip_model_spot_check():
    """PIL RGB<->HSV C semantics (float vars, double exprs, trunc casts)
    were verified exhaustively over all 2^24 values offline; keep a
    random 64k-pixel spot check in the suite via a pure-hue jitter."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as tmp:
        # PNG-free environment: save losslessly via BMP? PIL bmp is
        # lossless RGB. The native loader only decodes JPEG -- so route
        # through a quality-100 JPEG and compare both pipelines on the
        # SAME decoded pixels instead.
        p = os.path.join(tmp, "x.jpg")
        Image.fromarray(arr).save(p, quality=100)
        shift = 17
        got, ok = native.load_images_jitter([p], 256, 256, [3],
                                            1.0, 1.0, 1.0, shift)
        assert ok.all()
        img = Image.open(p).convert("RGB")
        hsv = np.array(img.convert("HSV"))
        hsv[..., 0] = (hsv[..., 0].astype(np.int16) + shift) % 256
        want = np.asarray(Image.fromarray(hsv, "HSV").convert("RGB"),
                          np.float32) / 255.0
        np.testing.assert_array_equal(got[0], want)


@needs_native
def test_load_images_u8_matches_pil_pixels(tmp_path):
    """The u8 output mode (serving transport path) must emit exactly the
    uint8 pixels the f32 mode divides by 255 -- i.e. PIL's post-resize
    pixels -- including the failed-decode status contract."""
    paths = _save_jpegs(str(tmp_path), [(640, 480), (333, 217)])
    out, ok = native.load_images_u8(paths, 120, 160)
    assert ok.all() and out.dtype == np.uint8
    for i, p in enumerate(paths):
        pil = Image.open(p).convert("RGB").resize((160, 120), Image.BILINEAR)
        np.testing.assert_array_equal(out[i], np.asarray(pil, np.uint8))
    f32, _ = native.load_images(paths, 120, 160)
    np.testing.assert_array_equal(f32, out.astype(np.float32) / 255.0)

    bad = str(tmp_path / "missing.jpg")
    out, ok = native.load_images_u8(paths + [bad], 120, 160)
    assert list(ok) == [True, True, False]


@needs_native
def test_testing_transforms_u8_output(tmp_path):
    """get_testing_transforms(u8_output=True) ends the pipeline at raw
    uint8 pixels that dequantize to the f32 pipeline's tensors exactly,
    on both decode backends."""
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=40, cols=56,
                                        frames=2, num_sequences=1)
    outs = {}
    for backend in ("native", "pil"):
        f32_ds = GTASfMMultiViewDataset(
            data_dir, split, transform=T.get_testing_transforms(
                {"size": [32, 48]}), shuffle=False, decode_backend=backend)
        u8_ds = GTASfMMultiViewDataset(
            data_dir, split, transform=T.get_testing_transforms(
                {"size": [32, 48]}, u8_output=True), shuffle=False,
            decode_backend=backend)
        a, b = f32_ds[0], u8_ds[0]
        assert b["left_image"].dtype == np.uint8
        np.testing.assert_array_equal(
            b["left_image"].astype(np.float32) / 255.0 * 2.0 - 1.0,
            a["left_image"])
        for ra, rb in zip(a["right_images"], b["right_images"]):
            np.testing.assert_array_equal(
                rb.astype(np.float32) / 255.0 * 2.0 - 1.0, ra)
        outs[backend] = b["left_image"]
    np.testing.assert_array_equal(outs["native"], outs["pil"])
