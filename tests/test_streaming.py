"""Streaming inference over the 8-virtual-device mesh."""

import numpy as np
import pytest

import jax

from multi_view_stereonet_tpu.eval.streaming import StreamingRunner
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
