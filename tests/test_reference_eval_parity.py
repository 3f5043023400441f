"""The --reference-semantics scorer vs the reference's actual evaluation.py.

Loads /root/reference/src/scripts/evaluation.py by file path (skip-if-absent)
and pins duet_tpu.eval.reference_semantics numerically identical to it on
random truth/call VCF pairs covering DUP-as-INS, missing SVLEN, '.' allele
normalization, unphased '1/1', per-PS polarity ties, and BED confinement.
"""

import importlib.util
import os

import numpy as np
import pytest

REF_EVAL = "/root/reference/src/scripts/evaluation.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_EVAL),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_eval():
    spec = importlib.util.spec_from_file_location("ref_evaluation", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _records(rng, n):
    out = []
    for i in range(n):
        out.append({
            "chrom": f"chr{rng.choice(['1', '2', '10', 'X'])}",
            "pos": int(rng.integers(1_000, 900_000)),
            "svtype": str(rng.choice(["INS", "DEL", "DUP"])),
            "svlen": int(rng.choice([30, 60, 120, 400, 1500])),
            "hp": str(rng.choice(["1|0", "0|1", "1|1", "1/1", "0/1", ".|1"])),
            "ps": int(rng.choice([1111, 2222, 3333])),
            "no_svlen": bool(rng.random() < 0.15),
        })
    return out


def _perturb(rng, recs):
    """Call set derived from the truth: jittered positions/lengths, random
    re-phasing — guarantees matches exist (the reference scorer divides by
    zero otherwise) while still exercising misses."""
    out = []
    for r in recs:
        if rng.random() < 0.2:
            continue  # missed call
        c = dict(r)
        c["pos"] = max(1, r["pos"] + int(rng.integers(-1_300, 1_300)))
        c["svlen"] = max(30, r["svlen"] + int(rng.integers(-30, 30)))
        if rng.random() < 0.3:
            c["hp"] = str(rng.choice(["1|0", "0|1", "1|1", "1/1"]))
        c["no_svlen"] = bool(rng.random() < 0.15)
        out.append(c)
    out.extend(_records(rng, 10))  # false positives
    return out


def write_vcf(recs, path):
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tVALUE"]
    for i, r in enumerate(recs):
        signed = -r["svlen"] if r["svtype"] == "DEL" else r["svlen"]
        if r["no_svlen"]:
            ref, alt = ("N" * (r["svlen"] + 1), "N") if r["svtype"] == "DEL" \
                else ("N", "N" * (r["svlen"] + 1))
            info = f"SVTYPE={r['svtype']}"
        else:
            ref, alt = "N", f"<{r['svtype']}>"
            info = f"SVLEN={signed};SVTYPE={r['svtype']}"
        lines.append(
            f"{r['chrom']}\t{r['pos']}\tid{i}\t{ref}\t{alt}\t.\tPASS\t{info}"
            f"\tHP:PS\t{r['hp']}:{r['ps']}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def synth_vcf(rng, path, n=60):
    write_vcf(_records(rng, n), path)


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("skip_phasing", [False, True])
def test_reference_semantics_match(ref_eval, tmp_path, seed, skip_phasing):
    from duet_tpu.eval.reference_semantics import (
        evaluation_reference,
        parse_vcf_reference,
    )

    rng = np.random.default_rng(seed)
    truth = str(tmp_path / "truth.vcf")
    call = str(tmp_path / "call.vcf")
    truth_recs = _records(rng, 60)
    # the reference scorer IndexErrors on a chrom with calls of a type but
    # no truth of that type — keep every (chrom, type) populated
    for chrom in ("chr1", "chr2", "chr10", "chrX"):
        for svtype in ("INS", "DEL"):
            truth_recs.append({
                "chrom": chrom, "pos": int(rng.integers(1_000, 900_000)),
                "svtype": svtype, "svlen": 100, "hp": "1|0", "ps": 1111,
                "no_svlen": False,
            })
    write_vcf(truth_recs, truth)
    write_vcf(_perturb(rng, truth_recs), call)

    base_ref = ref_eval.parse_vcf(truth, skip_phasing, "")
    call_ref = ref_eval.parse_vcf(call, skip_phasing, "")
    base_got = parse_vcf_reference(truth, skip_phasing)
    call_got = parse_vcf_reference(call, skip_phasing)
    assert base_got == base_ref
    assert call_got == call_ref

    want = ref_eval.evaluation(base_ref, call_ref, 1000, 0.0)
    got = evaluation_reference(base_got, call_got, 1000, 0.0)
    (avg, p, r, f1, p_gt, r_gt, f1_gt, p_hp, r_hp, f1_hp) = want
    assert got["avg_sv_per_phase_set"] == avg
    assert (got["calling"]["precision"], got["calling"]["recall"],
            got["calling"]["f1"]) == (p, r, f1)
    assert (got["genotyping"]["precision"], got["genotyping"]["recall"],
            got["genotyping"]["f1"]) == (p_gt, r_gt, f1_gt)
    assert (got["phasing"]["precision"], got["phasing"]["recall"],
            got["phasing"]["f1"]) == (p_hp, r_hp, f1_hp)
    if seed == 0 and not skip_phasing:
        assert p > 0 and r > 0  # non-vacuous scenario


def test_bed_confinement_matches(ref_eval, tmp_path):
    from duet_tpu.eval.reference_semantics import parse_vcf_reference

    rng = np.random.default_rng(42)
    vcf = str(tmp_path / "c.vcf")
    synth_vcf(rng, vcf, n=80)
    bed = str(tmp_path / "win.bed")
    with open(bed, "w") as f:
        f.write("chr1\t1000\t400000\nchr10\t50000\t800000\n")
    assert parse_vcf_reference(vcf, False, bed) == \
        ref_eval.parse_vcf(vcf, False, bed)
