"""Streaming (contig-major) pipeline: identical artifacts to the batch run."""

import numpy as np

from duet_tpu.io.readstore import load_read_store, stream_contig_reads
from duet_tpu.pipeline import PipelineConfig, run_pipeline, run_pipeline_streaming


def test_stream_decode_matches_batch(sim_dataset):
    out, _, _ = sim_dataset
    batch = load_read_store(f"{out}/reads.bam")
    streamed = {}
    for cr, lengths in stream_contig_reads(f"{out}/reads.bam"):
        streamed[cr.contig] = cr
    assert set(streamed) == set(batch.contigs)
    for name, a in batch.contigs.items():
        b = streamed[name]
        assert a.names == b.names
        np.testing.assert_array_equal(a.starts, b.starts)
        np.testing.assert_array_equal(a.seq, b.seq)


def test_streaming_pipeline_equals_batch(tmp_path, sim_dataset):
    out, _, _ = sim_dataset

    def cfg(tag):
        return PipelineConfig(
            bam=f"{out}/reads.bam", reference=f"{out}/ref.fa",
            output=str(tmp_path / tag), use_device_kernel=False,
        )

    batch_vcf = run_pipeline(cfg("batch"))
    stream_vcf = run_pipeline_streaming(cfg("stream"))
    strip = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert strip(stream_vcf) == strip(batch_vcf)
    # intermediate artifacts byte-match too
    for rel in ("sv_calling/variants.vcf",):
        a = open(tmp_path / "batch" / rel).read()
        b = open(tmp_path / "stream" / rel).read()
        assert a == b, rel
