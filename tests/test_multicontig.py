"""Multi-contig pipeline: mixed chrN/N naming, -a flag, metrics artifact."""

import json
import os

import pytest

from duet_tpu.eval.evaluate import evaluate_files
from duet_tpu.pipeline import PipelineConfig, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


@pytest.fixture(scope="module")
def multi_demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("multi")
    truth = simulate_dataset(str(d), SimConfig(
        contigs={"chr20": 120_000, "21": 120_000, "scaffold_7": 80_000},
        seed=4, coverage=20.0,
    ))
    return d, truth


def _run(d, out, **kw):
    return run_pipeline(PipelineConfig(
        bam=str(d / "reads.bam"), reference=str(d / "ref.fa"),
        output=str(d / out), use_device_kernel=False, **kw,
    ))


def test_standard_chromosomes_only(multi_demo):
    d, _ = multi_demo
    out = _run(d, "out_std")
    text = open(out).read()
    assert "chr20" in text and "21" in text
    assert "scaffold_7" not in text, "-a off must exclude non-standard contigs"
    res = evaluate_files(out, str(d / "truth.vcf"))
    assert res.calling[2] >= 0.85


def test_include_all_ctgs(multi_demo):
    d, _ = multi_demo
    out = _run(d, "out_all", include_all_ctgs=True)
    assert "scaffold_7" in open(out).read()
    res = evaluate_files(out, str(d / "truth.vcf"), all_ctgs=True)
    assert res.calling[2] >= 0.85
    assert res.phasing[2] >= 0.85


def test_metrics_artifact(multi_demo):
    d, _ = multi_demo
    _run(d, "out_metrics")
    m = json.load(open(d / "out_metrics" / "metrics.json"))
    assert set(m["stages"]) >= {"ingest", "snp_calling", "sv_calling",
                                "snp_phasing", "sv_phasing"}
    assert m["counts"]["reads"] > 0
    assert m["counts"]["snp_sites"] > 0
    assert m["counts"]["tagged_reads"] > 0
    assert m["ingest_reads_per_s"] > 0
    assert m["total_s"] > 0
    # ingest attribution: .fai read vs BAM decode, decoder throughput
    ing = m["ingest"]
    assert ing["backend"] in ("native", "python")
    assert ing["bam_decode_s"] <= m["stages"]["ingest"] + 1e-6
    assert ing["bam_decode_reads_per_s"] > 0
