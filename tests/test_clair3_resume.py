"""--resume with a REAL Clair3-style pileup artifact.

The reference's SNP stage artifact is Clair3's pileup.vcf.gz
(snp_calling.py:13-17, FORMAT GT:GQ:DP:AF); a reference user resuming from
it must get a working run — read_pileup_vcf is FORMAT-aware.
"""

import os

import numpy as np

from duet_tpu.io.vcf import write_vcf
from duet_tpu.models.snp_caller import read_pileup_vcf
from duet_tpu.pipeline import PipelineConfig, run_pipeline


def _clair3_style_vcf(path, snps):
    header = [
        "##fileformat=VCFv4.2",
        "##source=Clair3",
        "##contig=<ID=chr21>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="GQ">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="DP">',
        '##FORMAT=<ID=AF,Number=1,Type=Float,Description="AF">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE",
    ]
    recs = []
    for contig, s in snps.items():
        for k in range(len(s.pos)):
            gt = "0/1" if s.is_het[k] else "1/1"
            af = s.alt_count[k] / max(int(s.depth[k]), 1)
            recs.append(
                f"{contig}\t{s.pos[k] + 1}\t.\t"
                f"{'ACGT'[s.ref_code[k]]}\t{'ACGT'[s.alt_code[k]]}\t12.3\t"
                f"PASS\t.\tGT:GQ:DP:AF\t{gt}:15:{s.depth[k]}:{af:.4f}"
            )
    write_vcf(path, header, recs)


def test_resume_from_clair3_style_pileup(sim_dataset, tmp_path):
    data_dir, _, _ = sim_dataset
    # run once to get the framework's own sites, then re-emit them in
    # Clair3's layout and resume from that artifact
    base_out = str(tmp_path / "base")
    run_pipeline(PipelineConfig(
        bam=os.path.join(data_dir, "reads.bam"),
        reference=os.path.join(data_dir, "ref.fa"), output=base_out))
    own = read_pileup_vcf(os.path.join(base_out, "snp_calling",
                                       "pileup.vcf.gz"))

    resume_out = str(tmp_path / "resume")
    os.makedirs(os.path.join(resume_out, "snp_calling"))
    clair3 = os.path.join(resume_out, "snp_calling", "pileup.vcf.gz")
    _clair3_style_vcf(clair3, own)

    # the Clair3-layout artifact parses back to the same sites
    reparsed = read_pileup_vcf(clair3)
    for contig in own:
        np.testing.assert_array_equal(reparsed[contig].pos, own[contig].pos)
        np.testing.assert_array_equal(reparsed[contig].is_het,
                                      own[contig].is_het)
        np.testing.assert_array_equal(reparsed[contig].alt_code,
                                      own[contig].alt_code)

    out = run_pipeline(PipelineConfig(
        bam=os.path.join(data_dir, "reads.bam"),
        reference=os.path.join(data_dir, "ref.fa"), output=resume_out,
        resume=True))
    with open(out) as f:
        got = f.read()
    with open(os.path.join(base_out, "phased_sv.vcf")) as f:
        want = f.read()
    assert got == want  # same sites -> same phased callset


def test_clair3_parser_edge_cases(tmp_path):
    """Indel records skipped, 0/0 and ./. dropped, phased separators and
    AD-based depth accepted, multi-allelic ALT keeps the first allele."""
    path = str(tmp_path / "p.vcf")
    header = ["##fileformat=VCFv4.2",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    recs = [
        "chr1\t100\t.\tA\tC\t.\tPASS\t.\tGT:DP:AF\t0/1:20:0.45",
        "chr1\t200\t.\tG\tT,A\t.\tPASS\t.\tGT:DP:AF\t1|1:30:0.97",
        "chr1\t300\t.\tACG\tA\t.\tPASS\t.\tGT:DP:AF\t0/1:25:0.4",   # indel
        "chr1\t400\t.\tC\tG\t.\tPASS\t.\tGT:DP:AF\t0/0:25:0.01",    # homref
        "chr1\t500\t.\tT\tA\t.\tPASS\t.\tGT:AD\t0/1:11,9",
    ]
    write_vcf(path, header, recs, index=False)
    out = read_pileup_vcf(path)["chr1"]
    assert list(out.pos) == [99, 199, 499]
    assert list(out.is_het) == [True, False, True]
    assert out.alt_count[0] == 9          # round(0.45 * 20)
    assert out.alt_code[1] == 3           # first ALT allele T
    assert out.depth[2] == 20 and out.alt_count[2] == 9  # AD-derived


def test_multiallelic_het_resumes_as_het(tmp_path):
    """A Clair3 1/2 site (two distinct non-zero alleles) is heterozygous;
    it must not resume as hom-alt (that would skew phasing inputs)."""
    header = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr21>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="DP">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE",
    ]
    recs = [
        "chr21\t100\t.\tA\tC,G\t10\tPASS\t.\tGT:DP\t1/2:20",   # het (multi-allelic)
        "chr21\t200\t.\tA\tC\t10\tPASS\t.\tGT:DP\t0/1:20",     # het
        "chr21\t300\t.\tA\tC\t10\tPASS\t.\tGT:DP\t1|1:20",     # hom
        "chr21\t400\t.\tA\tC,G\t10\tPASS\t.\tGT:DP\t2/1:20",   # het, reversed
    ]
    path = str(tmp_path / "pileup.vcf.gz")
    write_vcf(path, header, recs)
    snps = read_pileup_vcf(path)["chr21"]
    np.testing.assert_array_equal(snps.pos, [99, 199, 299, 399])
    np.testing.assert_array_equal(snps.is_het, [True, True, False, True])
    # multi-allelic keeps the first ALT (one alt per site downstream)
    assert snps.alt_code[0] == 1  # C
