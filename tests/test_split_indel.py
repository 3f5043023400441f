"""Split-read INS/DEL: long deletions emitted as colinear split alignments
(aligner behavior for events beyond CIGAR-run sizes) must cluster with — and
call like — CIGAR-run signatures (cuteSV-equivalent capability)."""

import numpy as np
import pytest

from duet_tpu.eval.evaluate import evaluate_files
from duet_tpu.io.readstore import load_read_store
from duet_tpu.models.sv_caller import SvCallConfig, call_svs_for_contig
from duet_tpu.pipeline import PipelineConfig, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


@pytest.fixture(scope="module")
def split_del_demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("splitdel")
    truth = simulate_dataset(str(d), SimConfig(
        contigs={"chr21": 300_000}, seed=9, coverage=22.0,
        sv_len_min=300, sv_len_max=1500, split_del_min=700,
    ))
    return d, truth


def test_split_del_signatures_detected(split_del_demo):
    d, truth = split_del_demo
    store = load_read_store(f"{d}/reads.bam")
    calls = call_svs_for_contig(store.contigs["chr21"], SvCallConfig())
    big_dels = [(int(p), int(-l)) for p, l, k in
                zip(truth.sv_pos["chr21"], truth.sv_len["chr21"],
                    truth.sv_kind["chr21"]) if k == 1 and -l >= 700]
    assert big_dels, "fixture must contain split-aligned deletions"
    for pos, size in big_dels:
        hit = [c for c in calls if c.svtype == "DEL"
               and abs(c.pos - pos) <= 200 and abs(c.length - size) <= 100]
        assert hit, f"split-read DEL at {pos} (len {size}) missed"
        assert hit[0].support >= 2


def test_full_pipeline_with_split_dels(split_del_demo, tmp_path):
    d, _ = split_del_demo
    out = run_pipeline(PipelineConfig(
        bam=f"{d}/reads.bam", reference=f"{d}/ref.fa",
        output=str(tmp_path / "out"), use_device_kernel=False,
    ))
    res = evaluate_files(out, f"{d}/truth.vcf")
    assert res.calling[2] >= 0.85, f"calling f1 {res.calling[2]}"
    assert res.genotyping[2] >= 0.8, f"genotyping f1 {res.genotyping[2]}"
