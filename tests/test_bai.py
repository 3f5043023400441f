"""BAI index: real .bai content (not the old empty stub) with index-backed
region queries matching full scans on simulator BAMs (split reads and
supplementary alignments included)."""

import numpy as np
import pytest

from duet_tpu.io.bai import bam_query, read_bai, write_bai
from duet_tpu.io.bam import BamReader


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    from duet_tpu.sim import SimConfig, simulate_dataset

    d = tmp_path_factory.mktemp("bai")
    simulate_dataset(str(d), SimConfig(
        contigs={"chrA": 150_000, "chrB": 150_000}, seed=4, coverage=15.0,
        inv_fraction=0.2, dup_fraction=0.2, tra_count=1,
    ))
    return str(d / "reads.bam")


def test_bai_has_content(indexed_bam):
    bins, linear, n_no_coor = read_bai(indexed_bam + ".bai")
    assert len(bins) == 2
    assert all(len(b) > 0 for b in bins)
    assert all(len(lin) > 0 for lin in linear)
    assert n_no_coor == 0


def test_query_matches_scan(indexed_bam):
    with BamReader(indexed_bam) as r:
        names = r.header.ref_names
        all_reads = [(names[rd.ref_id], rd.pos, rd.ref_end(), rd.name, rd.flag)
                     for rd in r]
    rng = np.random.default_rng(5)
    for _ in range(30):
        contig = ["chrA", "chrB"][int(rng.integers(0, 2))]
        beg = int(rng.integers(0, 140_000))
        end = beg + int(rng.integers(500, 40_000))
        want = sorted((n, f) for c, p, e, n, f in all_reads
                      if c == contig and p < end and e > beg)
        got = sorted((rd.name, rd.flag)
                     for rd in bam_query(indexed_bam, contig, beg, end))
        assert got == want, (contig, beg, end, len(got), len(want))
    assert bam_query(indexed_bam, "chrMISSING", 0, 100) == []


def test_rewritten_index_identical(indexed_bam, tmp_path):
    out = tmp_path / "again.bai"
    write_bai(indexed_bam, str(out))
    assert out.read_bytes() == open(indexed_bam + ".bai", "rb").read()


def test_view_tool(indexed_bam, capsys):
    """samtools-view-like region CLI over the in-framework indexes."""
    from duet_tpu.tools.view import main, view_bam

    import io
    sink = io.StringIO()
    n = view_bam(indexed_bam, "chrA:1-150000", out=sink)
    lines = [ln for ln in sink.getvalue().splitlines() if ln]
    assert n == len(lines) and n > 0
    cols = lines[0].split("\t")
    assert len(cols) >= 11 and cols[2] == "chrA" and cols[5] != "*"
    # count mode via the CLI entry
    assert main([indexed_bam, "chrA:1-1000", "--count"]) == 0
    out = capsys.readouterr().out.strip()
    assert out.isdigit()
