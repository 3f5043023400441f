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


def reads_from_observations(positions, bases, quals):
    """One 1-base read per observation (cigar 1M) — turns a synthetic
    observation stream into the packed-reads layout call_snps_device
    consumes, with identical counting semantics."""
    from duet_tpu.io.readstore import ContigReads

    order = np.argsort(positions, kind="stable")
    positions, bases, quals = positions[order], bases[order], quals[order]
    n = len(positions)
    off = np.arange(n + 1, dtype=np.int64)
    return ContigReads(
        "c", n, [f"r{i}" for i in range(n)],
        positions.astype(np.int64), positions.astype(np.int64) + 1,
        np.zeros(n, np.uint8), np.full(n, 60, np.uint8),
        np.zeros(n, np.uint8), off, np.zeros(n, np.int8),
        np.ones(n, np.int32), off, bases.copy(), quals.copy(),
    )


def test_device_pileup_windowed_matches_host():
    """Chunked packed device pileup (big-contig path): windows smaller than
    the contig produce exactly the host caller's sites — counting is
    positional, so the window seams must be invisible."""
    from duet_tpu.models.snp_caller import call_snps_device

    rng = np.random.default_rng(5)
    L = 3000  # spans 3 windows of 1024
    cfg = SnpCallConfig()
    positions, bases, quals = random_observations(rng, L, 60_000)
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    counts = count_alleles(positions.astype(np.int64), bases, quals, L,
                           cfg.min_base_qual)
    host = call_snps("c", counts, ref_codes, cfg)
    cr = reads_from_observations(positions, bases, quals)
    dev = call_snps_device("c", cr, ref_codes, cfg, window=1024)
    np.testing.assert_array_equal(dev.pos, host.pos)
    np.testing.assert_array_equal(dev.alt_code, host.alt_code)
    np.testing.assert_array_equal(dev.is_het, host.is_het)
    np.testing.assert_array_equal(dev.depth, host.depth)
    np.testing.assert_array_equal(dev.alt_count, host.alt_count)


def test_device_pileup_packed_realistic_reads():
    """Packed device pileup on simulator reads (multi-op cigars with
    insertions/deletions/soft-clips): the on-device expansion must
    reproduce the host observation stream's counts bit-for-bit, both
    whole-contig and windowed."""
    import os
    import tempfile

    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import (
        call_snps_any,
        call_snps_device,
        count_alleles,
        pileup_observations,
    )
    from duet_tpu.sim import SimConfig, simulate_dataset

    cfg = SnpCallConfig()
    with tempfile.TemporaryDirectory() as tmp:
        simulate_dataset(tmp, SimConfig(contigs={"c": 40_000}, seed=11,
                                        coverage=8.0))
        store = load_read_store(os.path.join(tmp, "reads.bam"))
        from duet_tpu.io.fasta import FastaFile

        ref_codes = FastaFile(os.path.join(tmp, "ref.fa")).fetch_codes("c")
    cr = store.contigs["c"]
    obs = pileup_observations(cr, cfg)
    counts = count_alleles(obs[0], obs[1], obs[2], len(ref_codes),
                           cfg.min_base_qual)
    host = call_snps_any("c", counts, ref_codes, cfg)
    for window in (1 << 24, 8192):
        dev = call_snps_device("c", cr, ref_codes, cfg, window=window)
        np.testing.assert_array_equal(dev.pos, host.pos)
        np.testing.assert_array_equal(dev.alt_code, host.alt_code)
        np.testing.assert_array_equal(dev.is_het, host.is_het)
        np.testing.assert_array_equal(dev.depth, host.depth)
        np.testing.assert_array_equal(dev.alt_count, host.alt_count)


def test_past_end_observation_raises_host_and_device():
    """A read extending past the contig end fails loudly on BOTH paths
    (the device path would otherwise silently drop observations)."""
    import pytest

    from duet_tpu.models.snp_caller import call_snps_device

    cfg = SnpCallConfig()
    L = 100
    positions = np.array([50, 120], dtype=np.int64)  # 120 beyond L
    bases = np.array([1, 2], dtype=np.uint8)
    quals = np.array([30, 30], dtype=np.uint8)
    with pytest.raises(ValueError, match="beyond contig length"):
        count_alleles(positions, bases, quals, L, cfg.min_base_qual)
    cr = reads_from_observations(positions, bases, quals)
    ref_codes = np.zeros(L, np.uint8)
    with pytest.raises(ValueError, match="beyond contig length"):
        call_snps_device("c", cr, ref_codes, cfg)


def test_device_high_qual_floor_matches_host():
    """Any min_base_qual rides the nibble payload's host-evaluated pass
    bit (round 5; the old byte payload clipped quals at 31 and fell back
    to the host above that) — device output stays bit-identical to the
    host caller at a floor of 35."""
    from duet_tpu.models.snp_caller import call_snps_any, call_snps_device
    from duet_tpu.utils import dispatch

    rng = np.random.default_rng(9)
    L = 400
    positions, bases, quals = random_observations(rng, L, 8000)
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    cfg = SnpCallConfig(min_base_qual=35)
    counts = count_alleles(positions.astype(np.int64), bases, quals, L, 35)
    host = call_snps_any("c", counts, ref_codes, cfg)
    cr = reads_from_observations(positions, bases, quals)
    dispatch.reset()
    dev = call_snps_device("c", cr, ref_codes, cfg)
    assert dispatch.snapshot().get("snp_pileup", {}).get("device", 0) == 1
    np.testing.assert_array_equal(dev.pos, host.pos)
    np.testing.assert_array_equal(dev.alt_count, host.alt_count)
    np.testing.assert_array_equal(dev.is_het, host.is_het)
    np.testing.assert_array_equal(dev.depth, host.depth)


def test_device_site_compaction_overflow_falls_back():
    """A window denser than the fixed site-compaction capacity recounts on
    the host (window-local op expansion) — outputs identical to the host
    caller, with a host dispatch recorded next to the device one."""
    from duet_tpu.models.snp_caller import call_snps_any, call_snps_device
    from duet_tpu.utils import dispatch

    L = 600  # one 1024-window; every position becomes a site (600 > 256)
    positions = np.repeat(np.arange(L), 4).astype(np.int64)
    bases = np.ones(len(positions), np.uint8)   # C everywhere
    quals = np.full(len(positions), 30, np.uint8)
    ref_codes = np.zeros(L, np.uint8)           # ref A
    cfg = SnpCallConfig()
    counts = count_alleles(positions, bases, quals, L, cfg.min_base_qual)
    host = call_snps_any("c", counts, ref_codes, cfg)
    assert len(host.pos) == L
    cr = reads_from_observations(positions, bases, quals)
    dispatch.reset()
    dev = call_snps_device("c", cr, ref_codes, cfg, window=1024)
    snap = dispatch.snapshot()["snp_pileup"]
    assert snap.get("device", 0) == 1 and snap.get("host", 0) == 1
    np.testing.assert_array_equal(dev.pos, host.pos)
    np.testing.assert_array_equal(dev.is_het, host.is_het)
    np.testing.assert_array_equal(dev.alt_count, host.alt_count)


def test_grouped_device_pileup_matches_per_contig():
    """Several small contigs in ONE grouped launch produce exactly the
    per-contig device/host results, with a single device dispatch."""
    import os
    import tempfile

    from duet_tpu.io.fasta import FastaFile
    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import (
        call_snps_device,
        call_snps_device_grouped,
    )
    from duet_tpu.sim import SimConfig, simulate_dataset
    from duet_tpu.utils import dispatch

    cfg = SnpCallConfig(device=True)
    with tempfile.TemporaryDirectory() as tmp:
        simulate_dataset(tmp, SimConfig(
            contigs={"a": 30_000, "b": 25_000, "c": 20_000}, seed=13,
            coverage=8.0))
        store = load_read_store(os.path.join(tmp, "reads.bam"))
        fa = FastaFile(os.path.join(tmp, "ref.fa"))
        refs = {n: fa.fetch_codes(n) for n in fa.contig_names}
    items = [(c, store.contigs[c], refs[c]) for c in ("a", "b", "c")]
    expected = {c: call_snps_device(c, cr, ref, cfg) for c, cr, ref in items}
    dispatch.reset()
    got = call_snps_device_grouped(items, cfg)
    assert dispatch.snapshot()["snp_pileup"].get("device", 0) == 1
    for c in ("a", "b", "c"):
        np.testing.assert_array_equal(got[c].pos, expected[c].pos, err_msg=c)
        np.testing.assert_array_equal(got[c].alt_code, expected[c].alt_code)
        np.testing.assert_array_equal(got[c].is_het, expected[c].is_het)
        np.testing.assert_array_equal(got[c].depth, expected[c].depth)
        np.testing.assert_array_equal(got[c].alt_count, expected[c].alt_count)
        np.testing.assert_array_equal(got[c].ref_code, expected[c].ref_code)
