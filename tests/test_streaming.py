"""Streaming inference over the 8-virtual-device mesh."""

import numpy as np
import pytest

import jax

from multi_view_stereonet_tpu.eval.streaming import (
    StreamingRunner, dequantize_images_u8, quantize_images_u8,
)
from multi_view_stereonet_tpu.models import MultiViewStereoNetConfig, init_mvsnet
from multi_view_stereonet_tpu.parallel import make_mesh
from multi_view_stereonet_tpu.data import GTASfMMultiViewDataset, get_testing_transforms

from tests.synthetic_data import make_gta_sfm_tree


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_streaming_runner_mesh(tmp_path):
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=64, cols=96,
                                        frames=6, num_sequences=2)
    dataset = GTASfMMultiViewDataset(
        data_dir, split, transform=get_testing_transforms({"size": [64, 96]}),
        shuffle=False)

    runner = StreamingRunner(
        init_mvsnet(jax.random.PRNGKey(0)),
        MultiViewStereoNetConfig(num_idepth_samples=4),
        mesh=make_mesh(8, view=1))

    seen = []
    for idepths, names in runner.run(dataset, batch_size=8):
        assert idepths.shape[1:] == (64, 96)
        assert np.all(np.isfinite(idepths))
        seen.extend(names)
    assert len(seen) == len(dataset)
    assert len(set(seen)) == len(seen)

    # Fleet sharding (streaming CLI --shard_id/--num_shards): two
    # collective-free shards together cover the split exactly once.
    from multi_view_stereonet_tpu.parallel import ShardedDataset

    shard_seen = []
    for sid in range(2):
        shard = ShardedDataset(dataset, sid, 2, drop_ragged_tail=False)
        for _, names in runner.run(shard, batch_size=4):
            shard_seen.extend(names)
    assert sorted(shard_seen) == sorted(seen)


def test_u8_transfer_roundtrip_exact_all_values():
    """The u8 transfer optimization rests on two exactness properties,
    both checked over ALL 256 producible values:
    1. quantize_images_u8 inverts the host pipeline (ToArray+Normalize)
       bit-exactly, and
    2. the device-side dequantize reproduces the host-side normalized
       f32 bit-exactly (same op order; f32 /255 rounds identically)."""
    u = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    host_norm = (u.astype(np.float32) / 255.0) * 2.0 - 1.0  # the pipeline
    assert np.array_equal(quantize_images_u8(host_norm), u)
    dev_norm = np.asarray(jax.jit(dequantize_images_u8)(u))
    assert np.array_equal(
        dev_norm.view(np.int32), host_norm.view(np.int32)), (
        "device dequantize is not bit-identical to the host pipeline")


def test_u8_transfer_streaming_outputs_identical(tmp_path):
    """StreamingRunner(transfer_u8=True) must yield the same idepthmaps
    as the plain f32 transfer path (it is a transport optimization, not
    an approximation)."""
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=48, cols=64,
                                        frames=2, num_sequences=1)
    dataset = GTASfMMultiViewDataset(
        data_dir, split, transform=get_testing_transforms({"size": [48, 64]}),
        shuffle=False)
    params = init_mvsnet(jax.random.PRNGKey(0))
    config = MultiViewStereoNetConfig(num_idepth_samples=4)
    mesh = make_mesh(1, view=1)

    # Three transports, one truth: plain f32, host-side quantize
    # fallback (f32 dataset + transfer_u8), and the fast path (u8
    # dataset, pixels uint8 straight from the decoder).
    u8_dataset = GTASfMMultiViewDataset(
        data_dir, split, transform=get_testing_transforms(
            {"size": [48, 64]}, u8_output=True), shuffle=False)
    outs = {}
    for key, ds, u8 in (("f32", dataset, False),
                        ("quantized", dataset, True),
                        ("u8_native", u8_dataset, True)):
        runner = StreamingRunner(params, config, mesh=mesh, transfer_u8=u8)
        got = [idepths for idepths, _ in runner.run(ds, batch_size=2,
                                                    workers=1)]
        outs[key] = np.concatenate(got)
    np.testing.assert_array_equal(outs["f32"], outs["quantized"])
    np.testing.assert_array_equal(outs["f32"], outs["u8_native"])
