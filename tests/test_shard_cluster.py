"""Mesh-sharded clustering: coordinate-range sharding with ppermute halo
exchange must match the host path bit-for-bit, including clusters that
straddle shard boundaries (SURVEY.md §2.4 sequence-sharding design)."""

import jax
import numpy as np
import pytest

from duet_tpu.ops.cluster import GAP, SPAN, cluster_host
from duet_tpu.parallel.mesh import make_mesh
from duet_tpu.parallel.shard_cluster import cluster_sharded


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, sp=4)


@pytest.mark.parametrize("linkage,max_dist", [(GAP, 200), (SPAN, 0)])
def test_sharded_matches_host_random(mesh, linkage, max_dist):
    rng = np.random.default_rng(42)
    for _ in range(4):
        k = int(rng.integers(5, 700))
        pos = np.sort(rng.integers(0, 4000, size=k)).astype(np.int64)
        length = rng.integers(40, 500, size=k).astype(np.int64)
        reads = rng.integers(0, 60, size=k).astype(np.int64)
        h = cluster_host(pos, length, reads, linkage, max_dist, 9, 10)
        s = cluster_sharded(mesh, pos, length, reads, linkage, max_dist, 9, 10)
        for a, b in zip(h, s):
            np.testing.assert_array_equal(a, b)


def test_cluster_spanning_every_shard_edge(mesh):
    """One giant chain covering the whole coordinate range: every shard
    boundary sits inside the same cluster, so the halo exchange and the
    cross-shard segment merge are all load-bearing."""
    k = 64
    pos = np.arange(k, dtype=np.int64) * 10          # gaps of 10 << max_dist
    length = np.full(k, 100, dtype=np.int64)
    reads = np.arange(k, dtype=np.int64) % 7
    h = cluster_host(pos, length, reads, GAP, 200, 9, 10)
    s = cluster_sharded(mesh, pos, length, reads, GAP, 200, 9, 10)
    assert len(s[0]) == 1, "must form a single cluster across all shards"
    for a, b in zip(h, s):
        np.testing.assert_array_equal(a, b)


def test_break_exactly_at_shard_edge(mesh):
    """Segments that end exactly on a shard boundary: the halo-computed
    first-element flag decides the break."""
    # pad_to = 64 over sp=4 -> shard size 16; place a break at index 16
    pos = np.concatenate([
        np.arange(16, dtype=np.int64) * 5,            # shard 0: one run
        1_000_000 + np.arange(48, dtype=np.int64) * 5,  # break at the edge
    ])
    length = np.full(64, 80, dtype=np.int64)
    reads = np.arange(64, dtype=np.int64)
    h = cluster_host(pos, length, reads, GAP, 200, 9, 10)
    s = cluster_sharded(mesh, pos, length, reads, GAP, 200, 9, 10)
    assert len(s[0]) == 2
    for a, b in zip(h, s):
        np.testing.assert_array_equal(a, b)


def test_empty_and_single(mesh):
    e = np.zeros(0, dtype=np.int64)
    out = cluster_sharded(mesh, e, e, e, GAP, 200, 9, 10)
    assert all(len(x) == 0 for x in out)
    one = cluster_sharded(mesh, np.array([5]), np.array([100]), np.array([3]),
                          GAP, 200, 9, 10)
    assert one[0].tolist() == [5] and one[2].tolist() == [1]
