"""Per-host input sharding for multi-host data parallelism (SURVEY §2.8).

The reference has no multi-host story (torch DataLoader on one machine);
the TPU rebuild shards records per process so a multi-host mesh reads
disjoint data while every host runs the same number of steps.
"""

from unittest import mock

import numpy as np
import pytest

from egonet_tpu.data.loader import ArrayBatchLoader, host_shard


def test_shards_are_disjoint_and_cover():
    records = [f"r{i}" for i in range(10)]
    shards = [host_shard(records, index=i, count=3) for i in range(3)]
    want_len = 4                                     # ceil(10 / 3)
    assert all(len(s) == want_len for s in shards)
    uniq = [set(s) for s in shards]
    # disjoint
    assert not (uniq[0] & uniq[1] or uniq[0] & uniq[2] or uniq[1] & uniq[2])
    # cover
    assert uniq[0] | uniq[1] | uniq[2] == set(records)
    # wrap-padding duplicates come from the SAME shard
    for s, u in zip(shards, uniq):
        assert set(s) == u


def test_more_hosts_than_records():
    records = ["a", "b"]
    for i in range(5):
        s = host_shard(records, index=i, count=5)
        assert len(s) == 1 and s[0] in records


def test_identity_single_host():
    records = list(range(7))
    assert host_shard(records, index=0, count=1) == records
    # defaults read jax.process_count() == 1 on this rig
    assert host_shard(records) == records


def test_bad_index_raises():
    with pytest.raises(ValueError):
        host_shard([1, 2, 3], index=4, count=2)


def test_array_loader_shards_rows():
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.arange(10, dtype=np.float32).reshape(10, 1)
    with mock.patch("jax.process_count", return_value=2), \
         mock.patch("jax.process_index", return_value=1):
        loader = ArrayBatchLoader(x, y, batch_size=4)
    assert len(loader.inputs) == 5                   # ceil(10 / 2)
    # rows are the strided slice 1::2, outputs stay aligned with inputs
    np.testing.assert_array_equal(loader.inputs[:, 0] // 2,
                                  loader.outputs[:, 0])
    assert set(loader.outputs[:, 0]) == {1, 3, 5, 7, 9}
