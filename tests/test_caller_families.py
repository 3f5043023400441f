"""The three SV-caller family layouts: emitted, parsed, and phased alike."""

import pytest

from duet_tpu.eval.evaluate import evaluate_files
from duet_tpu.io.vcf import parse_sv_vcf
from duet_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def family_outputs(tmp_path_factory, sim_dataset):
    out, _, _ = sim_dataset
    base = tmp_path_factory.mktemp("fams")
    vcfs = {}
    for fam in ("cutesv", "sniffles", "svim"):
        vcfs[fam] = run_pipeline(PipelineConfig(
            bam=f"{out}/reads.bam", reference=f"{out}/ref.fa",
            output=str(base / fam), sv_caller=fam, use_device_kernel=False,
        ))
    return out, base, vcfs


def test_each_family_parses_and_scores(family_outputs):
    out, base, vcfs = family_outputs
    for fam, vcf in vcfs.items():
        res = evaluate_files(vcf, f"{out}/truth.vcf")
        assert res.calling[2] >= 0.85, f"{fam}: calling f1 {res.calling[2]}"


def test_gap_families_identical(family_outputs):
    _, base, vcfs = family_outputs
    strip = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert strip(vcfs["cutesv"]) == strip(vcfs["sniffles"])


def test_layout_roundtrip_fields(family_outputs):
    """Each family's variants.vcf re-parses with identical downstream fields."""
    _, base, _ = family_outputs
    parsed = {}
    for fam in ("cutesv", "sniffles", "svim"):
        per = parse_sv_vcf(str(base / fam / "sv_calling" / "variants.vcf"), False)
        parsed[fam] = {
            (r.chrom, r.pos): (r.svlen, r.svtype, r.support,
                               tuple(r.read_names), r.gt, r.ref_reads, r.var_reads)
            for recs in per.values() for r in recs
        }
    # gap-linkage families carry the same calls; every field must survive
    # both the sniffles (no-comma) and cutesv (5-field) layouts
    assert parsed["cutesv"] == parsed["sniffles"]
    for fields in parsed["svim"].values():
        svlen, svtype, support, names, gt, dr, dv = fields
        assert support == len(names) and dv == support
