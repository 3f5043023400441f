"""Drop-in phase-only mode: reference-style artifacts -> identical phased VCF."""

import os
import shutil

import numpy as np

from duet_tpu.io.bam import BamHeader, BamRead, BamReader, BamWriter
from duet_tpu.io.haplotag_bam import read_hap_from_bam
from duet_tpu.pipeline import (
    PipelineConfig,
    read_haplotag_table,
    run_phase_only,
    run_pipeline,
)


def _strip_header(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_phase_only_from_tsv_tables(tmp_path, sim_dataset):
    out_dir, _, _ = sim_dataset
    full = tmp_path / "full"
    cfg = PipelineConfig(bam=f"{out_dir}/reads.bam", reference=f"{out_dir}/ref.fa",
                         output=str(full), use_device_kernel=False)
    full_vcf = run_pipeline(cfg)

    # copy only the final-stage inputs into a fresh dir
    po = tmp_path / "phase_only"
    (po / "sv_calling").mkdir(parents=True)
    (po / "snp_phasing").mkdir()
    shutil.copy(full / "sv_calling" / "variants.vcf", po / "sv_calling")
    for f in (full / "snp_phasing").iterdir():
        if f.name.endswith(".haplotags.tsv"):
            shutil.copy(f, po / "snp_phasing")
    cfg_po = PipelineConfig(bam="", reference="", output=str(po),
                            use_device_kernel=False)
    po_vcf = run_phase_only(cfg_po)
    assert _strip_header(po_vcf) == _strip_header(full_vcf)


def test_phase_only_from_haplotagged_bam(tmp_path, sim_dataset):
    """Reference-style data plane: haplotagged per-chrom BAM with HP/PC/PS
    tags instead of the framework's tsv tables."""
    out_dir, _, _ = sim_dataset
    full = tmp_path / "full2"
    cfg = PipelineConfig(bam=f"{out_dir}/reads.bam", reference=f"{out_dir}/ref.fa",
                         output=str(full), use_device_kernel=False)
    full_vcf = run_pipeline(cfg)

    contig = "chr21"
    table = read_haplotag_table(full / "snp_phasing" / f"{contig}.haplotags.tsv")

    # write a minimal haplotagged BAM carrying those tags
    po = tmp_path / "phase_only2"
    (po / "sv_calling").mkdir(parents=True)
    (po / "snp_phasing").mkdir()
    shutil.copy(full / "sv_calling" / "variants.vcf", po / "sv_calling")
    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:chr21\tLN:1000000\n",
                       ["chr21"], [1_000_000])
    bam_path = po / "snp_phasing" / f"{contig}.bam"
    with BamWriter(str(bam_path), header) as w:
        for i, (name, (hap, ps, pc)) in enumerate(table.items()):
            w.write(BamRead(
                name, 0, 0, i * 10, 60,
                np.array([[0, 4]], dtype=np.int32),
                np.zeros(4, dtype=np.uint8), np.full(4, 30, np.uint8),
                {"HP": hap, "PC": pc, "PS": ps},
            ))

    assert read_hap_from_bam(str(bam_path)) == table

    cfg_po = PipelineConfig(bam="", reference="", output=str(po),
                            use_device_kernel=False)
    po_vcf = run_phase_only(cfg_po)
    assert _strip_header(po_vcf) == _strip_header(full_vcf)


def test_haplotag_bam_output_roundtrips(tmp_path, sim_dataset):
    """--haplotag-bam artifact carries the same tags as the tsv table and
    feeds phase-only mode."""
    out_dir, _, _ = sim_dataset
    full = tmp_path / "full3"
    cfg = PipelineConfig(bam=f"{out_dir}/reads.bam", reference=f"{out_dir}/ref.fa",
                         output=str(full), use_device_kernel=False,
                         haplotag_bam=True)
    run_pipeline(cfg)
    bam = full / "snp_phasing" / "chr21.bam"
    assert bam.exists()
    from_bam = read_hap_from_bam(str(bam))
    from_tsv = read_haplotag_table(full / "snp_phasing" / "chr21.haplotags.tsv")
    assert from_bam == from_tsv
