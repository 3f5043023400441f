"""Native (C++) BAM ingest: column-for-column parity with the Python reader."""

import numpy as np
import pytest

try:
    from duet_tpu.io.native_ingest import NativeUnavailable, get_lib
    get_lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native toolchain unavailable")


def test_native_matches_python(sim_dataset):
    from duet_tpu.io.native_ingest import load_read_store_native
    from duet_tpu.io.readstore import load_read_store

    out, cfg, truth = sim_dataset
    py = load_read_store(f"{out}/reads.bam")
    nat = load_read_store_native(f"{out}/reads.bam")
    assert set(py.contigs) == set(nat.contigs)
    assert py.contig_lengths == nat.contig_lengths
    for name in py.contigs:
        a, b = py.contigs[name], nat.contigs[name]
        assert a.n == b.n
        assert a.names == b.names
        for f in ("starts", "ends", "strand", "mapq", "cigar_off",
                  "cigar_ops", "cigar_lens", "seq_off", "seq", "qual"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_min_mapq_filter(sim_dataset):
    from duet_tpu.io.native_ingest import load_read_store_native

    out, _, _ = sim_dataset
    full = load_read_store_native(f"{out}/reads.bam", min_mapq=0)
    hi = load_read_store_native(f"{out}/reads.bam", min_mapq=61)
    assert sum(c.n for c in hi.contigs.values()) == 0 or \
        sum(c.n for c in hi.contigs.values()) < sum(c.n for c in full.contigs.values())


def test_invalid_file_raises(tmp_path):
    from duet_tpu.io.native_ingest import load_read_store_native

    p = tmp_path / "junk.bam"
    p.write_bytes(b"this is not a bam file at all, not even a little")
    with pytest.raises(ValueError):
        load_read_store_native(str(p))
