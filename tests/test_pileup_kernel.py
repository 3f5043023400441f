"""Device pileup kernel parity vs the host SNP caller."""

import numpy as np

from duet_tpu.models.snp_caller import SnpCallConfig, call_snps, count_alleles
from duet_tpu.ops.pileup import call_sites, pileup_counts


def random_observations(rng, L, n):
    positions = rng.integers(0, L, n).astype(np.int32)
    bases = rng.integers(0, 5, n).astype(np.uint8)     # incl. N
    quals = rng.integers(0, 41, n).astype(np.uint8)
    return positions, bases, quals


def test_counts_match_host():
    rng = np.random.default_rng(0)
    L = 500
    positions, bases, quals = random_observations(rng, L, 5000)
    host = count_alleles(positions.astype(np.int64), bases, quals, L, 10)
    dev = pileup_counts(positions, bases, quals, L, 10)
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_counts_padding_sentinel():
    L = 50
    positions = np.array([3, 3, 0], dtype=np.int32)
    bases = np.array([1, 4, 2], dtype=np.uint8)  # middle is padding (N)
    quals = np.array([30, 30, 30], dtype=np.uint8)
    dev = np.asarray(pileup_counts(positions, bases, quals, L, 10))
    assert dev[3, 1] == 1 and dev.sum() == 2


def test_site_calling_matches_host():
    rng = np.random.default_rng(1)
    L = 800
    cfg = SnpCallConfig()
    positions, bases, quals = random_observations(rng, L, 30_000)
    ref_codes = rng.integers(0, 5, L).astype(np.uint8)
    counts = count_alleles(positions.astype(np.int64), bases, quals, L,
                           cfg.min_base_qual)
    host = call_snps("c", counts, ref_codes, cfg)
    is_site, is_het, alt_code, depth, alt_count = call_sites(
        np.asarray(counts, np.int32), ref_codes.astype(np.int32),
        cfg.min_depth, 1, 4, 3, 4,  # 0.25 and 0.75 as rationals
        cfg.min_alt_reads,          # threaded, not duplicated, config
    )
    pos_dev = np.flatnonzero(np.asarray(is_site))
    np.testing.assert_array_equal(pos_dev, host.pos)
    np.testing.assert_array_equal(np.asarray(is_het)[pos_dev], host.is_het)
    np.testing.assert_array_equal(np.asarray(alt_code)[pos_dev], host.alt_code)
    np.testing.assert_array_equal(np.asarray(depth)[pos_dev], host.depth)
    np.testing.assert_array_equal(np.asarray(alt_count)[pos_dev], host.alt_count)


def test_device_pileup_windowed_matches_host():
    """Chunked device pileup (big-contig path): windows smaller than the
    contig produce exactly the host caller's sites — counting is positional,
    so the window seams must be invisible."""
    from duet_tpu.models.snp_caller import call_snps_device

    rng = np.random.default_rng(5)
    L = 3000  # spans 3 windows of 1024
    cfg = SnpCallConfig()
    positions, bases, quals = random_observations(rng, L, 60_000)
    read_idx = np.zeros(len(positions), np.int32)
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    counts = count_alleles(positions.astype(np.int64), bases, quals, L,
                           cfg.min_base_qual)
    host = call_snps("c", counts, ref_codes, cfg)
    obs = (positions.astype(np.int64), bases, quals, read_idx)
    dev = call_snps_device("c", obs, ref_codes, cfg, window=1024)
    np.testing.assert_array_equal(dev.pos, host.pos)
    np.testing.assert_array_equal(dev.alt_code, host.alt_code)
    np.testing.assert_array_equal(dev.is_het, host.is_het)
    np.testing.assert_array_equal(dev.depth, host.depth)
    np.testing.assert_array_equal(dev.alt_count, host.alt_count)


def test_past_end_observation_raises_host_and_device():
    """A read extending past the contig end fails loudly on BOTH paths
    (the device scatter would otherwise silently drop observations)."""
    import pytest

    from duet_tpu.models.snp_caller import call_snps_device

    cfg = SnpCallConfig()
    L = 100
    positions = np.array([50, 120], dtype=np.int64)  # 120 beyond L
    bases = np.array([1, 2], dtype=np.uint8)
    quals = np.array([30, 30], dtype=np.uint8)
    with pytest.raises(ValueError, match="beyond contig length"):
        count_alleles(positions, bases, quals, L, cfg.min_base_qual)
    obs = (positions, bases, quals, np.zeros(2, np.int32))
    ref_codes = np.zeros(L, np.uint8)
    with pytest.raises(ValueError, match="beyond contig length"):
        call_snps_device("c", obs, ref_codes, cfg)
