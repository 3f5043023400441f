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


def test_streaming_native_matches_python(tmp_path):
    """Native streaming iterator: same contigs, same columns, same order as
    the Python streaming reader; only_contigs filters at decode time."""
    from duet_tpu.io.native_ingest import stream_read_store_native
    from duet_tpu.io.readstore import stream_contig_reads
    from duet_tpu.sim import SimConfig, simulate_dataset

    simulate_dataset(str(tmp_path), SimConfig(
        contigs={"chrA": 90_000, "chrB": 90_000, "chrC": 90_000},
        seed=21, coverage=10.0))
    bam = str(tmp_path / "reads.bam")
    py = list(stream_contig_reads(bam))
    nat = list(stream_read_store_native(bam))
    assert [c.contig for c, _ in nat] == [c.contig for c, _ in py]
    for (a, la), (b, lb) in zip(py, nat):
        assert la == lb
        assert a.names == b.names
        for f in ("starts", "ends", "strand", "mapq", "supp", "cigar_off",
                  "cigar_ops", "cigar_lens", "seq_off", "seq", "qual"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f"{a.contig}.{f}")

    only = list(stream_read_store_native(bam, only_contigs={"chrB"}))
    assert [c.contig for c, _ in only] == ["chrB"]
    assert only[0][0].n == [c for c, _ in py if c.contig == "chrB"][0].n


def test_load_only_contigs_filters_during_decode(sim_dataset):
    from duet_tpu.io.native_ingest import load_read_store_native

    out, _, _ = sim_dataset
    full = load_read_store_native(f"{out}/reads.bam")
    name = next(iter(full.contigs))
    sub = load_read_store_native(f"{out}/reads.bam", only_contigs={name})
    assert set(sub.contigs) == {name}
    assert sub.contigs[name].n == full.contigs[name].n


def test_native_pileup_matches_numpy(sim_dataset):
    """Native pileup observation pass + count image vs the numpy scans."""
    from duet_tpu.io.fasta import FastaFile
    from duet_tpu.io.native_ingest import pileup_obs_native
    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import (
        SnpCallConfig,
        count_alleles,
        pileup_observations,
    )

    out, _, _ = sim_dataset
    store = load_read_store(f"{out}/reads.bam")
    fa = FastaFile(f"{out}/ref.fa")
    cfg = SnpCallConfig()
    for contig, cr in store.contigs.items():
        L = len(fa.fetch_codes(contig))
        want = pileup_observations(cr, cfg)
        want_counts = count_alleles(want[0], want[1], want[2], L,
                                    cfg.min_base_qual)
        (pos, base, qual, read), counts = pileup_obs_native(
            cr, cfg.min_mapq, cfg.min_base_qual, L)
        np.testing.assert_array_equal(pos, want[0])
        np.testing.assert_array_equal(base, want[1])
        np.testing.assert_array_equal(qual, want[2])
        np.testing.assert_array_equal(read, want[3])
        np.testing.assert_array_equal(counts, want_counts)


def test_rolling_buffer_compaction(tmp_path):
    """Regression: refill() compacts the rolling buffers mid-ensure and
    rebases scan_pos/metas — a stale by-value offset surfaced as a
    'truncated BAM record' on multi-contig inputs.  Tiny compaction
    thresholds force many rebases on a small file."""
    from duet_tpu.io.native_ingest import stream_read_store_native
    from duet_tpu.io.readstore import stream_contig_reads
    from duet_tpu.sim import SimConfig, simulate_dataset

    simulate_dataset(str(tmp_path), SimConfig(
        contigs={"chrA": 150_000, "chrB": 150_000, "chrC": 150_000},
        seed=29, coverage=12.0))
    bam = str(tmp_path / "reads.bam")
    py = list(stream_contig_reads(bam))
    nat = list(stream_read_store_native(bam, compact_bytes=4096))
    assert [c.contig for c, _ in nat] == [c.contig for c, _ in py]
    for (a, _), (b, _) in zip(py, nat):
        assert a.names == b.names
        np.testing.assert_array_equal(a.starts, b.starts)
        np.testing.assert_array_equal(a.seq, b.seq)
        np.testing.assert_array_equal(a.cigar_lens, b.cigar_lens)


def test_corrupt_inputs_raise_cleanly(tmp_path, sim_dataset):
    """Truncated/garbage inputs surface as ValueError, never a crash."""
    from duet_tpu.io.native_ingest import stream_read_store_native

    out, _, _ = sim_dataset
    with open(f"{out}/reads.bam", "rb") as f:
        data = f.read()

    garbage = tmp_path / "garbage.bam"
    garbage.write_bytes(b"\x00" * 512)
    with pytest.raises(ValueError):
        list(stream_read_store_native(str(garbage)))

    # BGZF-valid but record-corrupt: flip bytes inside a record region by
    # re-compressing a mangled inflated stream
    import gzip
    import struct

    from duet_tpu.io.bgzf import BgzfReader, BgzfWriter

    with BgzfReader(f"{out}/reads.bam") as r:
        raw = r.read()
    raw = bytearray(raw)
    # find first record after header and corrupt its l_read_name/sizes
    l_text = struct.unpack("<i", raw[4:8])[0]
    off = 8 + l_text
    n_ref = struct.unpack("<i", raw[off:off + 4])[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack("<i", raw[off:off + 4])[0]
        off += 8 + l_name
    # block_size stays; claim an enormous l_seq
    raw[off + 4 + 16:off + 4 + 20] = struct.pack("<i", 2**30)
    bad = tmp_path / "bad.bam"
    with BgzfWriter(str(bad)) as w:
        w.write(bytes(raw))
    with pytest.raises(ValueError, match="malformed|truncated"):
        list(stream_read_store_native(str(bad)))


def test_empty_contig_filter_keeps_nothing(sim_dataset):
    """An ownership filter matching no contigs decodes nothing (a
    multi-process run can own zero contigs when processes outnumber them);
    the C filter API's n==0 means 'reset', so the wrapper must not pass it
    through."""
    from duet_tpu.io.native_ingest import (
        load_read_store_native,
        stream_read_store_native,
    )

    out, _, _ = sim_dataset
    assert list(stream_read_store_native(f"{out}/reads.bam",
                                         only_contigs={"nope"})) == []
    store = load_read_store_native(f"{out}/reads.bam", only_contigs=set())
    assert store.contigs == {}
    # header contig lengths survive (Python-reader parity)
    assert len(store.contig_lengths) > 0


def test_unsorted_bam_matches_python_loader(tmp_path):
    """Non-coordinate-sorted input: the native loader re-sorts per contig
    (and merges a contig split across stream segments), matching the
    Python loader's pack_contig ordering."""
    from duet_tpu.io.bam import BamHeader, BamRead, BamWriter
    from duet_tpu.io.native_ingest import load_read_store_native
    from duet_tpu.io.readstore import load_read_store

    rng = np.random.default_rng(3)
    names = ["c1", "c2"]
    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:c1\tLN:50000\n"
                       "@SQ\tSN:c2\tLN:50000\n", names, [50000, 50000])
    path = str(tmp_path / "unsorted.bam")
    with BamWriter(path, header) as w:
        for i in range(80):
            rid = int(rng.integers(0, 2))
            pos = int(rng.integers(0, 45_000))
            seq = rng.integers(0, 4, size=60).astype(np.uint8)
            cigar = np.array([[0, 60]], np.int32)
            w.write(BamRead(f"r{i}", 0, rid, pos, 60, cigar, seq,
                            np.full(60, 30, np.uint8), {}))
    py = load_read_store(path)
    nat = load_read_store_native(path)
    assert set(py.contigs) == set(nat.contigs)
    for c in py.contigs:
        a, b = py.contigs[c], nat.contigs[c]
        assert a.names == b.names
        for f in ("starts", "ends", "cigar_off", "cigar_ops", "cigar_lens",
                  "seq_off", "seq", "qual"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f"{c}.{f}")


def test_pileup_exotic_cigar_ops(tmp_path):
    """N (ref skip), P (padding), X/= (match variants), hard clips, and
    leading insertions: native pileup == numpy pileup on all of them."""
    from duet_tpu.io.bam import BamHeader, BamRead, BamWriter
    from duet_tpu.io.native_ingest import load_read_store_native, pileup_obs_native
    from duet_tpu.models.snp_caller import (
        SnpCallConfig,
        count_alleles,
        pileup_observations,
    )

    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:c\tLN:5000\n", ["c"], [5000])
    path = str(tmp_path / "exotic.bam")
    rng = np.random.default_rng(8)

    def rd(name, pos, cigar):
        qlen = sum(int(l) for op, l in cigar if op in (0, 1, 4, 7, 8))
        seq = rng.integers(0, 4, size=qlen).astype(np.uint8)
        return BamRead(name, 0, 0, pos, 60,
                       np.array(cigar, np.int32).reshape(-1, 2), seq,
                       np.full(qlen, 30, np.uint8), {})

    reads = [
        rd("r_n", 100, [(0, 30), (3, 200), (0, 30)]),          # N skip
        rd("r_pad", 150, [(0, 20), (6, 5), (0, 20)]),          # P padding
        rd("r_eqx", 400, [(7, 25), (8, 5), (7, 20)]),          # =/X
        rd("r_hard", 700, [(5, 40), (0, 50), (5, 10)]),        # hard clips
        rd("r_leadins", 900, [(1, 12), (0, 40)]),              # leading I
        rd("r_mix", 1200, [(4, 8), (0, 15), (2, 9), (0, 15), (1, 6),
                           (0, 10), (4, 3)]),
    ]
    with BamWriter(path, header) as w:
        for r in sorted(reads, key=lambda r: r.pos):
            w.write(r)
    store = load_read_store_native(path)
    cr = store.contigs["c"]
    cfg = SnpCallConfig()
    want = pileup_observations(cr, cfg)
    want_counts = count_alleles(want[0], want[1], want[2], 5000,
                                cfg.min_base_qual)
    (pos, base, qual, read), counts = pileup_obs_native(
        cr, cfg.min_mapq, cfg.min_base_qual, 5000)
    np.testing.assert_array_equal(pos, want[0])
    np.testing.assert_array_equal(base, want[1])
    np.testing.assert_array_equal(read, want[3])
    np.testing.assert_array_equal(counts, want_counts)
    # at-site filter parity on the exotic layout too
    sites = np.array([110, 340, 405, 710, 910, 1215], np.int64)
    (fp, fb, fq, fr), _ = pileup_obs_native(cr, cfg.min_mapq, site_pos=sites)
    keep = np.isin(want[0], sites)
    np.testing.assert_array_equal(fp, want[0][keep])
    np.testing.assert_array_equal(fr, want[3][keep])


def test_past_end_read_raises_native(tmp_path):
    """Native pileup on a read aligned past the contig end fails loudly,
    mirroring the host twin (count_alleles) instead of silently dropping
    the out-of-range observations."""
    import pytest

    from duet_tpu.io.bam import BamHeader, BamRead, BamWriter
    from duet_tpu.io.native_ingest import (
        load_read_store_native,
        pileup_counts_native,
        pileup_obs_native,
    )

    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:c1\tLN:500\n", ["c1"], [500])
    path = str(tmp_path / "past.bam")
    with BamWriter(path, header) as w:
        seq = np.zeros(200, np.uint8)
        w.write(BamRead("r0", 0, 0, 400, 60, np.array([[0, 200]], np.int32),
                        seq, np.full(200, 30, np.uint8), {}))  # ends at 600
    store = load_read_store_native(path)
    cr = store.contigs["c1"]
    with pytest.raises(ValueError, match="beyond contig length"):
        pileup_counts_native(cr, 0, 10, 500)
    with pytest.raises(ValueError, match="beyond contig length"):
        pileup_obs_native(cr, 0, 10, length=500)


def test_candidate_scan_matches_numpy():
    """The native single-pass candidate scan equals the numpy pre-filter
    bit for bit: same candidates, first-max argmax with the reference
    allele excluded, N-reference rows skipped."""
    import numpy as np

    from duet_tpu.io.native_ingest import candidate_scan_native

    rng = np.random.default_rng(5)
    L = 50_000
    counts = rng.integers(0, 20, (L, 4)).astype(np.int32)
    counts[rng.random(L) < 0.5] = 0          # sparse coverage
    ref = rng.integers(0, 5, L).astype(np.uint8)  # incl. N (=4)
    # engineered ties: two equal non-ref alleles -> first index wins
    counts[100] = [7, 7, 7, 0]
    ref[100] = 2
    min_depth, min_alt = 4, 2
    pos, alt_code, alt_count, depth = candidate_scan_native(
        counts, ref, min_depth, min_alt)

    ref_safe = np.minimum(ref, 3).astype(np.int64)
    depth_all = counts.sum(axis=1)
    ref_count = np.take_along_axis(counts, ref_safe[:, None], axis=1)[:, 0]
    cand = np.flatnonzero((depth_all >= min_depth)
                          & (depth_all - ref_count >= min_alt) & (ref < 4))
    sub = counts[cand].copy()
    sub[np.arange(len(cand)), ref_safe[cand]] = -1
    np.testing.assert_array_equal(pos, cand)
    np.testing.assert_array_equal(alt_code, sub.argmax(axis=1))
    np.testing.assert_array_equal(alt_count, counts[cand, sub.argmax(axis=1)])
    np.testing.assert_array_equal(depth, depth_all[cand])


def test_truncation_sweep_raises_never_silent(tmp_path, sim_dataset):
    """A BAM truncated at ANY byte offset (mid-header, mid-member, at a
    member boundary, mid-EOF-marker) raises ValueError on BOTH decoders —
    a cut at a BGZF member boundary must not decode as a clean-looking
    partial dataset."""
    from duet_tpu.io.readstore import load_read_store

    out, _, _ = sim_dataset
    data = open(f"{out}/reads.bam", "rb").read()
    # include a cut exactly at the EOF-marker boundary (silent-partial
    # candidate) plus assorted interior offsets
    cuts = [200, len(data) // 3, len(data) // 2, len(data) - 28,
            len(data) - 5]
    for cut in cuts:
        p = tmp_path / f"t{cut}.bam"
        p.write_bytes(data[:cut])
        with pytest.raises(ValueError):
            from duet_tpu.io.native_ingest import stream_read_store_native

            for _ in stream_read_store_native(str(p)):
                pass
        with pytest.raises(ValueError):
            load_read_store(str(p))


def test_native_fasta_codes_matches_numpy(tmp_path):
    """One-pass native FASTA decode == the numpy path, including lowercase,
    N/ambiguity codes, a short final line, and multiple contigs."""
    from duet_tpu.io.fasta import FastaFile, write_fasta
    from duet_tpu.io.native_ingest import fasta_codes_native

    rng = np.random.default_rng(17)
    contigs = {
        "c1": "".join(rng.choice(list("ACGTacgtNnRY"), size=257)),
        "c2": "".join(rng.choice(list("ACGT"), size=70)),   # exact one line
        "c3": "".join(rng.choice(list("acgt"), size=1403)),
    }
    path = str(tmp_path / "ref.fa")
    write_fasta(path, contigs, line_width=70)
    fa = FastaFile(path)
    for name in contigs:
        length, offset, linebases, linewidth = fa.index[name]
        nat = fasta_codes_native(path, offset, length, linebases, linewidth)
        # numpy reference path, inlined from FastaFile.fetch_codes
        from duet_tpu.io.fasta import BASE_TO_CODE

        with open(path, "rb") as f:
            f.seek(offset)
            nlines = (length + linebases - 1) // linebases
            raw = f.read(length + nlines * (linewidth - linebases))
        arr = np.frombuffer(raw, dtype=np.uint8)
        full = length // linebases
        body = arr[: full * linewidth].reshape(full, linewidth)[:, :linebases].reshape(-1)
        tail = arr[full * linewidth: full * linewidth + (length - full * linebases)]
        ref = BASE_TO_CODE[(np.concatenate([body, tail]) if len(tail) else body)[:length]]
        np.testing.assert_array_equal(nat, ref, err_msg=name)

    import pytest

    with pytest.raises(ValueError, match="FASTA read failed"):
        fasta_codes_native(path, 10**9, 100, 70, 71)  # past EOF


def test_missing_eof_marker_escape_hatch(tmp_path, sim_dataset, monkeypatch):
    """DUET_TPU_ALLOW_NO_BGZF_EOF=1 accepts a marker-less (legacy-writer)
    BAM on both decoders; without it both raise."""
    from duet_tpu.io.bam import BamReader
    from duet_tpu.io.native_ingest import stream_read_store_native

    out, _, _ = sim_dataset
    data = open(f"{out}/reads.bam", "rb").read()
    legacy = tmp_path / "legacy.bam"
    legacy.write_bytes(data[:-28])  # strip only the EOF marker
    with pytest.raises(ValueError, match="EOF marker"):
        BamReader(str(legacy))
    with pytest.raises(ValueError, match="EOF marker"):
        list(stream_read_store_native(str(legacy)))
    monkeypatch.setenv("DUET_TPU_ALLOW_NO_BGZF_EOF", "1")
    n_py = sum(1 for _ in BamReader(str(legacy)))
    n_nat = sum(cr.n for cr, _ in stream_read_store_native(str(legacy)))
    n_ref = sum(cr.n for cr, _ in stream_read_store_native(f"{out}/reads.bam"))
    assert n_nat == n_ref and n_py >= n_nat  # python iter incl. filtered


def test_native_decode_stats_recorded(sim_dataset):
    """The decoder's interior cost split (inflate vs scan vs fill, byte
    volumes, fault deltas) is captured after every native decode — the
    attribution the production metrics ingest block carries."""
    from duet_tpu.io import native_ingest as ni

    data_dir, _, _ = sim_dataset
    import os

    bam = os.path.join(data_dir, "reads.bam")
    ni.load_read_store_native(bam)
    st = ni.LAST_DECODE_STATS
    assert st is not None
    assert st["bytes_inflated"] > st["bytes_compressed"] > 0
    assert st["bgzf_members"] > 0 and st["inflate_batches"] > 0
    for k in ("fread_s", "inflate_s", "scan_s", "size_s", "fill_s",
              "py_fetch_s"):
        assert st[k] >= 0.0, k
    assert st["minor_faults"] >= 0
