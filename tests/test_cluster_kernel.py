"""K2 clustering: host numpy path vs jitted device path, both linkage modes."""

import numpy as np
import pytest

from duet_tpu.ops.cluster import GAP, SPAN, cluster_device_to_host, cluster_host


def random_signatures(rng, k, spread=100_000):
    # clumps of signatures around true SV sites + scattered noise
    n_sites = max(k // 6, 1)
    sites = rng.integers(0, spread, n_sites)
    pos = np.concatenate([
        rng.integers(-80, 81, size=k - k // 8) + rng.choice(sites, k - k // 8),
        rng.integers(0, spread, k // 8),
    ])[:k]
    pos = np.abs(pos)
    length = rng.integers(30, 800, k)
    read_idx = rng.integers(0, max(k // 2, 1), k)
    return pos.astype(np.int64), length.astype(np.int64), read_idx.astype(np.int64)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("linkage,max_dist,num,den", [
    (GAP, 200, 9, 10),
    (SPAN, 0, 9, 10),
    (SPAN, 0, 3, 10),
])
def test_device_matches_host(seed, linkage, max_dist, num, den):
    rng = np.random.default_rng(seed)
    pos, length, read_idx = random_signatures(rng, k=rng.integers(5, 200))
    host = cluster_host(pos, length, read_idx, linkage, max_dist, num, den)
    dev = cluster_device_to_host(pos, length, read_idx, linkage, max_dist, num, den)
    for h, d, name in zip(host, dev,
                          ("call_pos", "call_len", "support", "count", "seg")):
        np.testing.assert_array_equal(h, d, err_msg=name)


def test_single_and_empty():
    e = np.zeros(0, dtype=np.int64)
    out = cluster_host(e, e, e, GAP, 200, 9, 10)
    assert all(len(a) == 0 for a in out)
    one = cluster_host(np.array([5]), np.array([100]), np.array([7]), GAP, 200, 9, 10)
    assert one[0][0] == 5 and one[1][0] == 100 and one[2][0] == 1

    d = cluster_device_to_host(np.array([5]), np.array([100]), np.array([7]),
                               GAP, 200, 9, 10)
    assert d[0][0] == 5 and d[2][0] == 1


def test_gap_linkage_boundaries():
    # gap exactly == max_dist stays in one cluster; +1 splits
    pos = np.array([1000, 1200, 1401], dtype=np.int64)
    length = np.array([100, 100, 100], dtype=np.int64)
    reads = np.array([0, 1, 2], dtype=np.int64)
    cp, cl, sup, cnt, seg = cluster_host(pos, length, reads, GAP, 200, 9, 10)
    assert len(cp) == 2 and cnt.tolist() == [2, 1]


def test_span_linkage_ratio():
    # (dpos + dlen) / max(len): 90/100 = 0.9 <= 0.9 -> together at c=0.9
    pos = np.array([1000, 1090], dtype=np.int64)
    length = np.array([100, 100], dtype=np.int64)
    reads = np.array([0, 1], dtype=np.int64)
    cp, _, _, cnt, _ = cluster_host(pos, length, reads, SPAN, 0, 9, 10)
    assert len(cp) == 1
    # 91/100 > 0.9 -> split
    pos2 = np.array([1000, 1091], dtype=np.int64)
    cp2, _, _, _, _ = cluster_host(pos2, length, reads, SPAN, 0, 9, 10)
    assert len(cp2) == 2


def test_multi_type_one_pass_matches_per_type():
    """cluster_multi (one pass over all SV types, host and device) must
    reproduce per-type cluster_host exactly: same segments, same stats."""
    import numpy as np

    from duet_tpu.ops.cluster import GAP, SPAN, cluster_host, cluster_multi

    rng = np.random.default_rng(7)
    k = 500
    svtype = rng.integers(0, 4, size=k).astype(np.int32)
    pos = rng.integers(0, 100_000, size=k).astype(np.int64)
    length = rng.integers(30, 800, size=k).astype(np.int64)
    reads = rng.integers(0, 120, size=k).astype(np.int64)
    md_by_type = (100, 200, 200, 200)
    for linkage in (GAP, SPAN):
        for device in (False, True):
            cp, cl, sup, cnt, seg, ct = cluster_multi(
                svtype, pos, length, reads, linkage, md_by_type, 9, 10,
                device=device)
            # group one-pass output by type and compare to per-type runs
            for t in range(4):
                m = svtype == t
                want = cluster_host(pos[m], length[m], reads[m], linkage,
                                    md_by_type[t], 9, 10)
                sel = ct == t
                assert np.array_equal(cp[sel], want[0]), (linkage, device, t)
                assert np.array_equal(cl[sel], want[1]), (linkage, device, t)
                assert np.array_equal(sup[sel], want[2]), (linkage, device, t)
                assert np.array_equal(cnt[sel], want[3]), (linkage, device, t)
