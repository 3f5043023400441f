"""Determinism: thread fan-out and repeated runs yield byte-identical output
(the structural no-race guarantee the reference gets from per-chromosome
process isolation, SURVEY.md §5.2)."""

from duet_tpu.pipeline import PipelineConfig, run_pipeline


def test_threaded_equals_serial(tmp_path, sim_dataset):
    out_dir, _, _ = sim_dataset

    def run(tag, threads):
        return open(run_pipeline(PipelineConfig(
            bam=f"{out_dir}/reads.bam", reference=f"{out_dir}/ref.fa",
            output=str(tmp_path / tag), threads=threads,
            use_device_kernel=False,
        ))).read()

    serial = run("t1", 1)
    threaded = run("t4", 4)
    rerun = run("t4b", 4)
    assert serial == threaded == rerun
