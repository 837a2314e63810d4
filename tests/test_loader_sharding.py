"""BatchLoader per-host sharding: shards partition each global batch."""

import numpy as np

from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.data.loader import BatchLoader


def test_shards_partition_global_batch():
    ds = SyntheticPoseDataset(num_samples=16, cam_id_list=(0,), patch_size=32)
    loaders = [
        BatchLoader(ds, batch_size=8, num_workers=2, seed=3,
                    num_shards=2, shard_index=i)
        for i in range(2)
    ]
    per_shard = [list(l.epoch(0)) for l in loaders]
    assert len(per_shard[0]) == len(per_shard[1]) == 2
    for b0, b1 in zip(*per_shard):
        assert b0["cam_0_img"].shape[0] == 4
        assert b1["cam_0_img"].shape[0] == 4
        # shards must be disjoint: no identical images across the shards
        flat0 = b0["cam_0_img"].reshape(4, -1)
        flat1 = b1["cam_0_img"].reshape(4, -1)
        d = np.abs(flat0[:, None] - flat1[None]).sum(-1)
        assert (d > 0).all()


def test_epoch_shuffle_changes_order_but_not_content():
    ds = SyntheticPoseDataset(num_samples=8, cam_id_list=(0,), patch_size=32)
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0)
    e0 = np.concatenate([b["cam_0_img"] for b in loader.epoch(0)])
    e1 = np.concatenate([b["cam_0_img"] for b in loader.epoch(1)])
    assert e0.shape == e1.shape
    # different order
    assert not np.allclose(e0, e1)
    # same multiset of samples
    s0 = np.sort(e0.reshape(8, -1).sum(axis=1))
    s1 = np.sort(e1.reshape(8, -1).sum(axis=1))
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
