"""Codec round-trip tests: BGZF, BAM, FASTA, VCF parsing semantics."""

import io
import os

import numpy as np
import pytest

from duet_tpu.io.bgzf import BgzfReader, BgzfWriter, bgzf_compress_bytes, is_bgzf
from duet_tpu.io.bam import BamHeader, BamRead, BamReader, BamWriter
from duet_tpu.io.fasta import FastaFile, encode_bases, decode_bases, write_fasta
from duet_tpu.io.vcf import list_chroms, parse_sv_vcf, write_vcf


def test_bgzf_roundtrip(tmp_path):
    data = os.urandom(300_000) + b"tail"
    p = str(tmp_path / "x.bgz")
    with BgzfWriter(p) as w:
        for i in range(0, len(data), 7919):
            w.write(data[i : i + 7919])
    assert is_bgzf(p)
    with BgzfReader(p) as r:
        assert r.read() == data
    # chunked reads
    with BgzfReader(p) as r:
        out = bytearray()
        while True:
            chunk = r.read(12345)
            if not chunk:
                break
            out += chunk
        assert bytes(out) == data


def test_bgzf_empty(tmp_path):
    p = str(tmp_path / "e.bgz")
    with BgzfWriter(p) as w:
        pass
    with BgzfReader(p) as r:
        assert r.read() == b""


def test_fasta_roundtrip(tmp_path):
    seqs = {"chr1": "ACGT" * 100 + "ACG", "chrM": "TTTTACGTACGA"}
    p = str(tmp_path / "ref.fa")
    write_fasta(p, seqs, line_width=25)
    fa = FastaFile(p)
    assert fa.contig_names == ["chr1", "chrM"]
    for name, seq in seqs.items():
        assert fa.fetch(name) == seq
        assert fa.contig_length(name) == len(seq)
    assert fa.fetch("chr1", 10, 20) == seqs["chr1"][10:20]


def test_base_codes():
    assert decode_bases(encode_bases("ACGTNacgtn")) == "ACGTNACGTN"


def test_bam_roundtrip(tmp_path):
    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n", ["chr1"], [1000])
    rng = np.random.default_rng(0)
    reads = []
    for i in range(25):
        n = int(rng.integers(10, 300))
        cigar = np.array([[0, n // 2], [1, 3], [0, n - n // 2 - 3]], dtype=np.int32)
        reads.append(
            BamRead(
                name=f"r{i}", flag=0 if i % 2 else 16, ref_id=0,
                pos=int(rng.integers(0, 500)), mapq=60, cigar=cigar,
                seq_codes=rng.integers(0, 4, n).astype(np.uint8),
                quals=rng.integers(5, 40, n).astype(np.uint8),
                tags={"HP": int(1 + i % 2), "PS": 1000, "PC": 42, "XS": "hello"},
            )
        )
    p = str(tmp_path / "t.bam")
    with BamWriter(p, header) as w:
        for r in reads:
            w.write(r)
    with BamReader(p) as r:
        assert r.header.ref_names == ["chr1"]
        assert r.header.ref_lengths == [1000]
        got = list(r)
    assert len(got) == len(reads)
    for a, b in zip(reads, got):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.pos == b.pos
        assert np.array_equal(a.cigar, b.cigar)
        assert np.array_equal(a.seq_codes, b.seq_codes)
        assert np.array_equal(a.quals, b.quals)
        assert b.tags["HP"] == a.tags["HP"]
        assert b.tags["PS"] == a.tags["PS"]
        assert b.tags["PC"] == a.tags["PC"]
        assert b.tags["XS"] == "hello"


CUTESV_LINE = (
    "chr21\t500\tcuteSV.DEL.0\tN\t<DEL>\t.\tPASS\t"
    "SVTYPE=DEL;SVLEN=-120;RE=5;RNAMES=r1,r2,r3,r4,r5\t"
    "GT:DR:DV:PL:GQ\t0/1:8:5:.,.,.:20"
)
SVIM_LINE = (
    "chr21\t900\tsvim.INS.1\tN\t<INS>\t4\tPASS\t"
    "SVTYPE=INS;SVLEN=80;SUPPORT=4;READS=a,b,c,d\tGT:DP:AD\t0/1:12:8,4"
)
SNIFFLES_LINE = (
    "21\t1200\tSniffles2.DEL.1\tN\t<DEL>\t.\tPASS\t"
    "SVTYPE=DEL;SVLEN=-200;SUPPORT=6;RNAMES=x,y,z,w,u,v\tGT:DR:DV\t1/1:2:6"
)


def test_parse_sv_vcf_formats(tmp_path):
    p = str(tmp_path / "v.vcf")
    write_vcf(p, ["##fileformat=VCFv4.2", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"],
              [CUTESV_LINE, SVIM_LINE, SNIFFLES_LINE])
    calls = parse_sv_vcf(p, include_all_ctgs=False)
    recs = calls["21"]
    assert len(recs) == 3
    cute, svim, snif = recs
    assert (cute.svlen, cute.svtype, cute.support) == (-120, "DEL", 5)
    assert cute.read_names == ["r1", "r2", "r3", "r4", "r5"]
    assert (cute.gt, cute.ref_reads, cute.var_reads) == ("0/1", 8, 5)
    assert (svim.svlen, svim.support) == (80, 4)
    assert svim.read_names == ["a", "b", "c", "d"]
    assert (svim.gt, svim.ref_reads, svim.var_reads) == ("0/1", 8, 4)
    assert (snif.gt, snif.ref_reads, snif.var_reads) == ("1/1", 2, 6)
    assert snif.support == 6


def test_parse_svlen_quirks(tmp_path):
    lines = [
        "chr1\t10\ta\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=.\tGT:DR:DV\t0/1:1:2",
        "chr1\t20\tb\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=>77\tGT:DR:DV\t0/1:1:2",
        "chr1\t30\tc\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL\tGT:DR:DV\t0/1:1:2",
    ]
    p = str(tmp_path / "q.vcf")
    write_vcf(p, ["#h"], lines)
    recs = parse_sv_vcf(p, include_all_ctgs=False)["1"]
    assert [r.svlen for r in recs] == [0, 77, 0]


def test_list_chroms_gz(tmp_path):
    p = str(tmp_path / "x.vcf.gz")
    write_vcf(p, ["##x", "#CHROM"], [
        "chr2\t1\t.\tA\tC\t.\t.\t.",
        "chr2\t5\t.\tA\tC\t.\t.\t.",
        "chr10\t3\t.\tG\tT\t.\t.\t.",
    ])
    assert list_chroms(p) == ["chr2", "chr10"]


def test_sim_dataset_roundtrip(sim_dataset):
    out, cfg, truth = sim_dataset
    fa = FastaFile(os.path.join(out, "ref.fa"))
    assert fa.contig_names == ["chr21"]
    assert fa.contig_length("chr21") == 200_000
    with BamReader(os.path.join(out, "reads.bam")) as r:
        n = 0
        span_total = 0
        for read in r:
            n += 1
            # CIGAR query-length must equal sequence length
            q = sum(int(l) for o, l in read.cigar if o in (0, 1, 4, 7, 8))
            assert q == len(read.seq_codes)
            span_total += read.ref_end() - read.pos
        assert n > 100
        # coverage sanity
        assert span_total / 200_000 > 10
    assert os.path.exists(os.path.join(out, "reads.bam.bai"))
    assert os.path.exists(os.path.join(out, "truth.vcf"))
