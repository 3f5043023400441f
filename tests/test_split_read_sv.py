"""Split-read SV types: INV/DUP simulation, detection, and full-pipeline scoring."""

from collections import Counter

import numpy as np
import pytest

from duet_tpu.eval.evaluate import evaluate_files
from duet_tpu.io.readstore import load_read_store
from duet_tpu.models.sv_caller import SvCallConfig, call_svs_for_contig
from duet_tpu.pipeline import PipelineConfig, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


@pytest.fixture(scope="module")
def invdup_demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("invdup")
    truth = simulate_dataset(str(d), SimConfig(
        contigs={"chr21": 300_000}, seed=5, coverage=22.0,
        inv_fraction=0.3, dup_fraction=0.3,
    ))
    return d, truth


def test_supplementary_segments_present(invdup_demo):
    d, truth = invdup_demo
    store = load_read_store(f"{d}/reads.bam")
    cr = store.contigs["chr21"]
    assert cr.supp.sum() > 0, "simulator must emit supplementary alignments"
    # split segments of one read share its name
    names = np.array(cr.names)
    supp_names = set(names[cr.supp == 1])
    prim_names = set(names[cr.supp == 0])
    assert supp_names <= prim_names


def test_inv_dup_detection_matches_truth(invdup_demo):
    d, truth = invdup_demo
    store = load_read_store(f"{d}/reads.bam")
    calls = call_svs_for_contig(store.contigs["chr21"], SvCallConfig())
    kinds = truth.sv_kind["chr21"]
    names = "INS DEL INV DUP".split()
    truth_set = {(int(p), names[int(k)])
                 for p, k in zip(truth.sv_pos["chr21"], kinds)}
    by_type = Counter(c.svtype for c in calls)
    assert by_type["INV"] > 0 and by_type["DUP"] > 0
    matched = sum(
        any(t[1] == c.svtype and abs(t[0] - c.pos) <= 1000 for t in truth_set)
        for c in calls
    )
    assert matched / len(calls) >= 0.9, "precision of typed calls"


def test_full_pipeline_with_inv_dup(invdup_demo, tmp_path):
    d, _ = invdup_demo
    out = run_pipeline(PipelineConfig(
        bam=f"{d}/reads.bam", reference=f"{d}/ref.fa",
        output=str(tmp_path / "out"), use_device_kernel=False,
    ))
    res = evaluate_files(out, f"{d}/truth.vcf")
    assert res.calling[0] >= 0.9,  f"calling precision {res.calling[0]}"
    assert res.calling[1] >= 0.7,  f"calling recall {res.calling[1]}"
    assert res.phasing[2] >= 0.85, f"phasing f1 {res.phasing[2]}"
    text = open(out).read()
    assert "SVTYPE=<INV>" in text and "SVTYPE=<DUP>" in text


def test_ins_alt_sequence_resolved(invdup_demo):
    """INS calls report the actual inserted bases in ALT (cuteSV-style
    sequence-resolved records), matching the simulated insert."""
    from duet_tpu.io.fasta import decode_bases
    from duet_tpu.models.sv_caller import SvCallConfig as _Cfg

    d, truth = invdup_demo
    store = load_read_store(f"{d}/reads.bam")
    calls = call_svs_for_contig(store.contigs["chr21"], _Cfg())
    ins_truth = {int(p): decode_bases(s) for p, k, s in
                 zip(truth.sv_pos["chr21"], truth.sv_kind["chr21"],
                     truth.sv_ins_seq["chr21"]) if k == 0}
    checked = 0
    for c in calls:
        if c.svtype != "INS":
            continue
        assert c.alt_seq is not None and len(c.alt_seq) == c.length
        near = [s for p, s in ins_truth.items() if abs(p - c.pos) <= 100]
        if near and len(near[0]) == len(c.alt_seq):
            ident = sum(a == b for a, b in zip(near[0], c.alt_seq)) / c.length
            assert ident >= 0.85, f"insert identity {ident} at {c.pos}"
            checked += 1
    assert checked > 0
