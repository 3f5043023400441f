"""End-to-end pipeline test: simulate -> 4 stages -> phased_sv.vcf -> score."""

import os

import numpy as np
import pytest

from duet_tpu.eval.evaluate import evaluate_files
from duet_tpu.pipeline import PipelineConfig, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo")
    truth = simulate_dataset(str(d), SimConfig(
        contigs={"chr21": 120_000}, coverage=22.0, seed=7,
    ))
    return d, truth


def _cfg(d, out, **kw):
    return PipelineConfig(
        bam=str(d / "reads.bam"), reference=str(d / "ref.fa"),
        output=str(d / out), use_device_kernel=False, **kw,
    )


def test_full_pipeline_accuracy(demo):
    d, truth = demo
    out_vcf = run_pipeline(_cfg(d, "out"))
    assert os.path.exists(out_vcf)
    res = evaluate_files(out_vcf, str(d / "truth.vcf"))
    c, g, ph = res.calling, res.genotyping, res.phasing
    assert c[0] >= 0.9, f"calling precision {c[0]}"
    assert c[1] >= 0.6, f"calling recall {c[1]}"
    assert g[0] >= 0.8, f"genotyping precision {g[0]}"
    assert ph[2] >= 0.9, f"phasing f1 {ph[2]}"


def test_artifacts_layout(demo):
    d, _ = demo
    run_pipeline(_cfg(d, "out_layout"))
    out = d / "out_layout"
    assert (out / "snp_calling" / "pileup.vcf.gz").exists()
    assert (out / "sv_calling" / "variants.vcf").exists()
    assert (out / "run_duet.log").exists()
    phased = [p for p in (out / "snp_phasing").iterdir()
              if p.name.startswith("phased_")]
    assert phased, "per-contig phased SNP VCF missing"
    log = (out / "run_duet.log").read_text()
    for stage in ("SNP CALLING", "SV CALLING", "SNP PHASING", "SV PHASING"):
        assert f"{stage} STARTED" in log and "COMPLETED IN" in log


def test_resume_skips_completed_stages(demo):
    d, _ = demo
    first = run_pipeline(_cfg(d, "out_resume"))
    content = open(first).read()
    # corrupt nothing; resume run must reuse snp/sv artifacts and reproduce
    second = run_pipeline(_cfg(d, "out_resume", resume=True))
    assert open(second).read() == content


def test_missing_index_fails_fast(tmp_path, demo):
    d, _ = demo
    cfg = PipelineConfig(
        bam=str(d / "reads.bam"), reference=str(d / "ref.fa"),
        output=str(tmp_path / "x"),
    )
    cfg.bam = str(tmp_path / "nonexistent.bam")
    with pytest.raises(FileNotFoundError):
        run_pipeline(cfg)


def test_haplotag_accuracy_vs_truth(demo):
    """Phasing stage in isolation: >=95% of tagged reads on the right
    haplotype (up to a global flip), and site phases self-consistent."""
    from duet_tpu.io.fasta import FastaFile
    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import call_snps_for_store
    from duet_tpu.models.snp_phaser import phase_contig

    d, truth = demo
    store = load_read_store(str(d / "reads.bam"))
    fa = FastaFile(str(d / "ref.fa"))
    snps, _ = call_snps_for_store(store, {"chr21": fa.fetch_codes("chr21")})
    cr = store.contigs["chr21"]
    res = phase_contig(cr, snps["chr21"])
    agree = disagree = 0
    for i, name in enumerate(cr.names):
        if res.read_hap[i] == 0:
            continue
        if res.read_hap[i] - 1 == truth.read_hap[name]:
            agree += 1
        else:
            disagree += 1
    tagged = agree + disagree
    assert tagged >= cr.n * 0.8, f"only {tagged}/{cr.n} reads tagged"
    assert max(agree, disagree) / tagged >= 0.95
    # PC contract: tagged reads carry 1 <= pc <= 8100
    pcs = res.read_pc[res.read_hap != 0]
    assert pcs.min() >= 1 and pcs.max() <= 8100
