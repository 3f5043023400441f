"""Composition: host-level multi-process ownership x device-level mesh.

docs/SCALING.md claims the two scaling axes compose — per-host contig
ownership with part-file exchange on top, a (dp, sp) device mesh inside each
process.  This test runs 2 emulated processes, EACH sharding its stages over
a 4-device mesh, and pins the final phased_sv.vcf byte-identical to the
plain single-process single-device run.
"""

from duet_tpu.pipeline import PipelineConfig, run_pipeline
from duet_tpu.sim import SimConfig, simulate_dataset


def test_two_process_mesh_equals_single_device(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    simulate_dataset(str(d), SimConfig(
        contigs={"chrA": 120_000, "chrB": 120_000}, seed=13, coverage=16.0))

    def cfg(out, **kw):
        return PipelineConfig(
            bam=f"{d}/reads.bam", reference=f"{d}/ref.fa", output=str(out),
            include_all_ctgs=True, **kw)

    single_out = run_pipeline(cfg(tmp_path / "single"))

    shared = tmp_path / "shared"
    run_pipeline(cfg(shared, num_processes=2, process_id=1, mesh="2,2"))
    multi_out = run_pipeline(cfg(shared, num_processes=2, process_id=0,
                                 mesh="2,2"))

    assert open(multi_out).read() == open(single_out).read(), \
        "2-process x 4-device-mesh run must equal single-process single-device"
    n = sum(1 for ln in open(multi_out) if ln.strip() and not ln.startswith("#"))
    assert n > 0
