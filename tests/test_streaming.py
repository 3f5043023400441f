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


def test_stream_rejects_unsorted_bam(tmp_path):
    """A contig appearing in two stream segments (non-coordinate-sorted
    BAM) must fail loudly: the first segment's results are already
    released, so silently keeping the last would drop reads."""
    import numpy as np
    import pytest

    from duet_tpu.io.bam import BamHeader, BamRead, BamWriter, write_bam_index
    from duet_tpu.io.fasta import write_fasta
    from duet_tpu.pipeline import PipelineConfig, run_pipeline_streaming

    rng = np.random.default_rng(11)
    seqs = {c: "".join(rng.choice(list("ACGT"), 4000)) for c in ("c1", "c2")}
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, seqs)
    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:c1\tLN:4000\n"
                       "@SQ\tSN:c2\tLN:4000\n", ["c1", "c2"], [4000, 4000])
    path = str(tmp_path / "reads.bam")
    with BamWriter(path, header) as w:
        for k, rid in enumerate((0, 1, 0)):  # c1, c2, c1 again
            seq = rng.integers(0, 4, size=200).astype(np.uint8)
            w.write(BamRead(f"r{k}", 0, rid, 100, 60,
                            np.array([[0, 200]], np.int32), seq,
                            np.full(200, 30, np.uint8), {}))
    write_bam_index(path)
    cfg = PipelineConfig(bam=path, reference=ref,
                         output=str(tmp_path / "out"),
                         use_device_kernel=False, include_all_ctgs=True)
    with pytest.raises(ValueError, match="coordinate-sorted"):
        run_pipeline_streaming(cfg)


def test_streaming_metrics_stage_attribution(tmp_path, sim_dataset):
    """Streaming metrics.json carries per-stage cumulative seconds and RSS
    high-water marks (observability parity with batch mode)."""
    import json

    out, _, _ = sim_dataset
    run_pipeline_streaming(PipelineConfig(
        bam=f"{out}/reads.bam", reference=f"{out}/ref.fa",
        output=str(tmp_path / "m"), use_device_kernel=False))
    m = json.load(open(tmp_path / "m" / "metrics.json"))
    for key in ("ingest", "snp_calling", "sv_calling", "snp_phasing",
                "sv_phasing"):
        assert key in m["stages"], key
        assert m["stages"][key] >= 0
        assert m["stage_peak_rss_mb"][key] > 0
    assert m["mode"] == "streaming"


def test_prefetch_iter_order_and_errors():
    """prefetch_iter preserves order, re-raises producer exceptions, and
    stops the producer when abandoned."""
    import pytest

    from duet_tpu.io.readstore import prefetch_iter

    assert list(prefetch_iter(iter(range(100)))) == list(range(100))

    def boom():
        yield 1
        raise ValueError("decode error")

    it = prefetch_iter(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode error"):
        next(it)

    # abandoning mid-stream must not hang on a full queue
    it2 = prefetch_iter(iter(range(1000)), depth=1)
    assert next(it2) == 0
    it2.close()


def test_prefetch_bounds_live_items():
    """depth=1 means at most TWO items exist at once (one consumed + one
    decoded/queued): the producer reserves a slot BEFORE decoding, so a
    third item can never materialize inside the generator."""
    import threading
    import time

    from duet_tpu.io.readstore import prefetch_iter

    live: list = []
    peak = [0]
    lock = threading.Lock()

    class Item:
        def __init__(self):
            with lock:
                live.append(self)
                peak[0] = max(peak[0], len(live))

        def done(self):
            with lock:
                live.remove(self)

    def gen():
        for _ in range(6):
            yield Item()

    n = 0
    for item in prefetch_iter(gen(), depth=1):
        time.sleep(0.03)  # slow consumer: producer runs ahead if it can
        item.done()
        n += 1
    assert n == 6
    assert peak[0] <= 2, f"{peak[0]} items were live simultaneously"
