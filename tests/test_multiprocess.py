"""Multi-process (multi-host) pipeline: contig ownership, part-file
exchange, global BND merge, single-writer emission.

Processes are EMULATED: the ownership/merge logic is parameterized on
(process_id, num_processes), so two sequential runs against one shared
OUTPUT dir reproduce exactly what two hosts on a shared filesystem do —
without needing jax.distributed (SURVEY.md §5.8; tests strategy §4(d))."""

import json
import os

import pytest

from duet_tpu.pipeline import PipelineConfig, _owned_contigs, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


@pytest.fixture(scope="module")
def multi_demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp")
    truth = simulate_dataset(str(d), SimConfig(
        contigs={"chrA": 120_000, "chrB": 120_000, "chrC": 120_000},
        seed=11, coverage=18.0, tra_count=1,
    ))
    return d, truth


def _cfg(d, out, **kw):
    return PipelineConfig(
        bam=f"{d}/reads.bam", reference=f"{d}/ref.fa", output=str(out),
        use_device_kernel=False, include_all_ctgs=True, **kw)


def test_ownership_partition():
    names = ["chrB", "chrA", "chrC", "chrD"]
    parts = [_owned_contigs(names, pid, 3) for pid in range(3)]
    assert sorted(sum(parts, [])) == sorted(names)       # complete
    assert not set(parts[0]) & set(parts[1])             # disjoint
    # deterministic regardless of input order
    assert parts == [_owned_contigs(names[::-1], pid, 3) for pid in range(3)]


def test_two_process_run_equals_single(multi_demo, tmp_path):
    d, _ = multi_demo
    single_out = run_pipeline(_cfg(d, tmp_path / "single"))

    shared = tmp_path / "shared"
    # emulate two hosts against the shared OUTPUT dir; process 1 first so
    # the single-writer barrier semantics (pid 0 merges last) are exercised
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=1))
    multi_out = run_pipeline(_cfg(d, shared, num_processes=2, process_id=0))

    assert open(multi_out).read() == open(single_out).read(), \
        "2-process phased_sv.vcf must equal the single-process run"
    single_variants = open(tmp_path / "single" / "sv_calling" / "variants.vcf").read()
    multi_variants = open(shared / "sv_calling" / "variants.vcf").read()
    assert multi_variants == single_variants

    # non-owner processes produced no final artifacts of their own
    assert os.path.exists(shared / "parts" / "sv.part0.pkl")
    assert os.path.exists(shared / "parts" / "sv.part1.pkl")
    assert os.path.exists(shared / "run_duet.p1.log")
    assert os.path.exists(shared / "metrics.p1.json")


def test_cross_process_bnd_junction(multi_demo, tmp_path):
    """The translocation pairs two contigs; with 2 processes the round-robin
    puts them on DIFFERENT owners, so the junction is only callable from the
    merged evidence on process 0."""
    d, truth = multi_demo
    (ca, pa, cb, pb, _), = truth.tra
    assert ca != cb
    shared = tmp_path / "shared"
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=1))
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=0))
    bnd_lines = [ln for ln in open(shared / "sv_calling" / "variants.vcf")
                 if "SVTYPE=BND" in ln]
    assert bnd_lines, "cross-process breakend must survive the merge"
    hit = any(
        ln.split("\t")[0] == ca and abs(int(ln.split("\t")[1]) - (pa + 1)) <= 100
        for ln in bnd_lines
    )
    assert hit, f"junction {ca}:{pa} not found in merged callset"


def test_per_process_metrics(multi_demo, tmp_path):
    d, _ = multi_demo
    shared = tmp_path / "shared"
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=1))
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=0))
    m0 = json.load(open(shared / "metrics.json"))
    m1 = json.load(open(shared / "metrics.p1.json"))
    # each process ingested only its owned contigs
    assert m0["counts"]["contigs"] + m1["counts"]["contigs"] == 3


def test_flag_validation(multi_demo, tmp_path):
    d, _ = multi_demo
    with pytest.raises(ValueError, match="requires --process-id"):
        run_pipeline(_cfg(d, tmp_path / "x", num_processes=2))
    with pytest.raises(ValueError, match="out of range"):
        run_pipeline(_cfg(d, tmp_path / "x", num_processes=2, process_id=2))
    with pytest.raises(ValueError, match="resume"):
        run_pipeline(_cfg(d, tmp_path / "x", num_processes=2, process_id=0,
                          resume=True))
    from duet_tpu.pipeline import run_phase_only, run_pipeline_streaming
    with pytest.raises(ValueError, match="stream"):
        run_pipeline_streaming(_cfg(d, tmp_path / "x", num_processes=2,
                                    process_id=0))
    with pytest.raises(ValueError, match="single-process"):
        run_phase_only(_cfg(d, tmp_path / "x", num_processes=2, process_id=0))


def test_merge_keeps_bam_header_contig_order(tmp_path):
    """chr10 sorts lexicographically BEFORE chr2: the part merge must keep
    BAM header order or multi-process artifacts diverge byte-wise."""
    d = tmp_path / "data"
    simulate_dataset(str(d), SimConfig(
        contigs={"chr2": 100_000, "chr10": 100_000}, seed=13, coverage=16.0))
    single = run_pipeline(_cfg(d, tmp_path / "single"))
    shared = tmp_path / "shared"
    run_pipeline(_cfg(d, shared, num_processes=2, process_id=1))
    multi = run_pipeline(_cfg(d, shared, num_processes=2, process_id=0))
    sv = "sv_calling/variants.vcf"
    assert open(shared / sv).read() == open(tmp_path / "single" / sv).read()
    assert open(multi).read() == open(single).read()
