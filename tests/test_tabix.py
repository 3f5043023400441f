"""Tabix index: build/query correctness and pipeline artifact parity
(the reference tabix-indexes its phased per-contig VCFs, snp_phasing.py:25)."""

import os

import numpy as np
import pytest

from duet_tpu.io.tabix import (
    query,
    read_tabix_index,
    reg2bin,
    reg2bins,
    write_tabix_index,
)
from duet_tpu.io.vcf import open_maybe_gzip, write_vcf


def test_reg2bin_scheme():
    assert reg2bin(0, 1) == 4681          # finest level, first window
    assert reg2bin(0, 1 << 29) == 0       # whole-chromosome bin
    assert reg2bin(1 << 17, (1 << 17) + 5) == 4681 + (1 << 3)  # one 16kb win
    assert reg2bin(0, (1 << 17) + 5) == 73                     # 1Mb level
    # every interval's bin is among the bins its range overlaps
    rng = np.random.default_rng(0)
    for _ in range(200):
        b = int(rng.integers(0, 1 << 28))
        e = b + int(rng.integers(1, 1 << 20))
        assert reg2bin(b, e) in reg2bins(b, e)


@pytest.fixture(scope="module")
def indexed_vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("tbx")
    rng = np.random.default_rng(3)
    pos = np.sort(rng.choice(np.arange(1, 500_000), size=800, replace=False))
    header = ["##fileformat=VCFv4.2", "##contig=<ID=chrT,length=500000>",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    recs = [f"chrT\t{p}\t.\tA\tC\t.\tPASS\t." for p in pos]
    path = str(d / "x.vcf.gz")
    write_vcf(path, header, recs)           # auto-indexes
    return path, pos


def test_write_vcf_autoindexes(indexed_vcf):
    path, _ = indexed_vcf
    assert os.path.exists(path + ".tbi")
    names, bins, linear = read_tabix_index(path + ".tbi")
    assert names == ["chrT"] and len(bins[0]) > 0 and len(linear[0]) > 0


def test_query_matches_scan(indexed_vcf):
    path, pos = indexed_vcf
    with open_maybe_gzip(path) as f:
        all_rec = [ln.rstrip("\n") for ln in f if not ln.startswith("#")]
    rng = np.random.default_rng(1)
    for _ in range(40):
        beg = int(rng.integers(0, 490_000))
        end = beg + int(rng.integers(1, 60_000))
        want = [r for r in all_rec
                if beg < int(r.split("\t")[1]) <= end]
        got = query(path, "chrT", beg, end)
        assert got == want, (beg, end)
    assert query(path, "chrMISSING", 0, 10) == []
    assert query(path, "chrT", 499_999, 500_000) == [r for r in all_rec
                                                     if int(r.split("\t")[1]) == 500_000]


def test_pipeline_artifacts_indexed(sim_dataset, tmp_path):
    from duet_tpu.pipeline import PipelineConfig, run_pipeline

    out, cfg, truth = sim_dataset
    run_pipeline(PipelineConfig(
        bam=f"{out}/reads.bam", reference=f"{out}/ref.fa",
        output=str(tmp_path / "o"), use_device_kernel=False))
    assert os.path.exists(tmp_path / "o" / "snp_calling" / "pileup.vcf.gz.tbi")
    phased = [p for p in os.listdir(tmp_path / "o" / "snp_phasing")
              if p.endswith(".vcf.gz")]
    for p in phased:
        assert os.path.exists(tmp_path / "o" / "snp_phasing" / (p + ".tbi"))
