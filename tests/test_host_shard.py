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


def test_epoch_rotates_wrap_padding():
    """Uneven shards wrap-pad; without rotation the SAME leading records
    would be duplicated every epoch (a persistent sample-weighting bias,
    ADVICE r3).  Over len(shard) epochs every record of the shard must be
    chosen as padding equally often, and the real (non-pad) prefix must
    never change."""
    records = list(range(7))                        # 7 over 3 -> pad 2, 2, 1
    for idx in range(3):
        base = records[idx::3]
        counts = {r: 0 for r in base}
        for epoch in range(len(base) * 4):
            s = host_shard(records, index=idx, count=3, epoch=epoch)
            assert len(s) == 3                      # ceil(7 / 3)
            assert s[:len(base)] == base            # real prefix stable
            for r in s[len(base):]:
                counts[r] += 1
        spread = set(counts.values())
        assert len(spread) == 1, f"uneven padding duplication: {counts}"


def test_epoch_rotates_degenerate_more_hosts_than_records():
    # count > len(records): disjointness impossible; a host whose strided
    # slice is empty wraps onto the full list, and rotation cycles which
    # record it sees (hosts with a real slice keep it, e.g. index 0 -> "a")
    assert host_shard(["a", "b"], index=0, count=5, epoch=3) == ["a"]
    seen = {host_shard(["a", "b"], index=3, count=5, epoch=e)[0]
            for e in range(4)}
    assert seen == {"a", "b"}


def test_array_loader_set_epoch_rotates_padding():
    x = np.arange(14, dtype=np.float32).reshape(7, 2)
    y = np.arange(7, dtype=np.float32).reshape(7, 1)
    with mock.patch("jax.process_count", return_value=3), \
         mock.patch("jax.process_index", return_value=2):
        loader = ArrayBatchLoader(x, y, batch_size=3)
        assert len(loader.inputs) == 3              # ceil(7 / 3), base len 2
        pads = set()
        for e in range(4):
            loader.set_epoch(e)
            np.testing.assert_array_equal(loader.outputs[:2, 0], [2, 5])
            pads.add(float(loader.outputs[2, 0]))
    assert pads == {2.0, 5.0}


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
