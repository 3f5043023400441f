"""Diploid genome + ONT-like long-read simulator.

The reference validates itself against a downloadable HG00733 chr21 demo
(reference README.md:81-92); with no network egress this module provides the
equivalent reproducible test bed: a random reference contig, a phased diploid
variant set (het/hom SNPs, INS/DEL SVs with known haplotype), and noisy long
reads written as a real BAM through duet_tpu.io — exercising the full ingest
path end-to-end. The truth VCF feeds the evaluation harness
(reference src/scripts/evaluation.py semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from duet_tpu.io.bam import BamHeader, BamRead, BamWriter, write_bai_stub
from duet_tpu.io.fasta import decode_bases, write_fasta
from duet_tpu.io.vcf import write_vcf


@dataclass
class SimConfig:
    contigs: dict[str, int] = field(default_factory=lambda: {"chr21": 400_000})
    seed: int = 0
    coverage: float = 20.0
    read_len_mean: int = 12_000
    read_len_sigma: float = 0.35  # lognormal-ish spread
    snp_rate: float = 1.0 / 1000  # het SNP density
    hom_snp_fraction: float = 0.35
    sv_count_per_mb: float = 60.0
    sv_len_min: int = 60
    sv_len_max: int = 600
    hom_sv_fraction: float = 0.25
    sub_error: float = 0.02
    indel_error: float = 0.01  # small 1-3bp sequencing indels
    qual_mean: int = 22


@dataclass
class SimTruth:
    # per contig
    snp_pos: dict[str, np.ndarray]       # 0-based positions
    snp_ref: dict[str, np.ndarray]       # base codes
    snp_alt: dict[str, np.ndarray]
    snp_gt: dict[str, np.ndarray]        # (n,2) alt-presence per hap
    sv_pos: dict[str, np.ndarray]        # 0-based position (base before event)
    sv_len: dict[str, np.ndarray]        # +ins / -del
    sv_gt: dict[str, np.ndarray]         # (n,2) presence per hap
    sv_ins_seq: dict[str, list]          # inserted sequences (codes) or None
    read_hap: dict[str, int]             # read name -> haplotype (0/1)


def _rand_codes(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def _simulate_variants(rng, length, cfg):
    """Phased SNPs + SVs for one contig; SVs kept clear of each other and of
    SNP positions."""
    n_snp = rng.poisson(length * cfg.snp_rate)
    snp_pos = np.sort(rng.choice(np.arange(500, length - 500), size=min(n_snp, length // 4), replace=False))
    hom = rng.random(len(snp_pos)) < cfg.hom_snp_fraction
    which_hap = rng.integers(0, 2, size=len(snp_pos))
    snp_gt = np.zeros((len(snp_pos), 2), dtype=np.int8)
    snp_gt[hom] = 1
    snp_gt[~hom, which_hap[~hom]] = 1

    n_sv = max(2, rng.poisson(length / 1e6 * cfg.sv_count_per_mb))
    # place SVs on a coarse grid to avoid overlap
    grid = np.arange(2_000, length - 3_000, max(cfg.sv_len_max * 4, 3_000))
    rng.shuffle(grid)
    sv_pos = np.sort(grid[: min(n_sv, len(grid))].copy())
    sv_is_ins = rng.random(len(sv_pos)) < 0.5
    sv_size = rng.integers(cfg.sv_len_min, cfg.sv_len_max + 1, size=len(sv_pos))
    sv_len = np.where(sv_is_ins, sv_size, -sv_size).astype(np.int64)
    hom_sv = rng.random(len(sv_pos)) < cfg.hom_sv_fraction
    sv_hap = rng.integers(0, 2, size=len(sv_pos))
    sv_gt = np.zeros((len(sv_pos), 2), dtype=np.int8)
    sv_gt[hom_sv] = 1
    sv_gt[~hom_sv, sv_hap[~hom_sv]] = 1
    ins_seq = [(_rand_codes(rng, s) if i else None) for i, s in zip(sv_is_ins, sv_size)]

    # drop SNPs inside deletion spans so hap sequences stay consistent
    keep = np.ones(len(snp_pos), dtype=bool)
    for p, l in zip(sv_pos, sv_len):
        if l < 0:
            keep &= ~((snp_pos > p) & (snp_pos <= p - l))
    return (snp_pos[keep], snp_gt[keep], sv_pos, sv_len, sv_gt, ins_seq)


def _simulate_read(rng, ref_codes, start, target_span, hap,
                   snp_pos, snp_gt, snp_alt, sv_pos, sv_len, sv_gt, ins_seq, cfg):
    """Walk the reference from `start`, emitting the haplotype's bases with
    sequencing errors; returns (seq_codes, quals, cigar_ops[list[(op,len)]]).
    Alignment is exact by construction (the simulator plays aligner)."""
    seq = []
    cig: list[list[int]] = []  # [op, len]; op: 0=M 1=I 2=D

    def add(op, ln):
        if ln <= 0:
            return
        if cig and cig[-1][0] == op:
            cig[-1][1] += ln
        else:
            cig.append([op, ln])

    # variant lookup structures
    sv_idx = np.searchsorted(sv_pos, start)
    snp_idx = np.searchsorted(snp_pos, start)
    pos = start
    end_target = min(start + target_span, len(ref_codes))
    while pos < end_target:
        # next event position
        next_sv = sv_pos[sv_idx] if sv_idx < len(sv_pos) else end_target
        next_snp = snp_pos[snp_idx] if snp_idx < len(snp_pos) else end_target
        nxt = min(next_sv, next_snp, end_target)
        if nxt > pos:
            seg = ref_codes[pos:nxt].copy()
            seq.append(seg)
            add(0, nxt - pos)
            pos = nxt
            continue
        if sv_idx < len(sv_pos) and pos == sv_pos[sv_idx]:
            if sv_gt[sv_idx, hap]:
                ln = sv_len[sv_idx]
                if ln > 0:
                    # emit the anchor base then the insertion
                    seq.append(ref_codes[pos : pos + 1].copy())
                    add(0, 1)
                    seq.append(ins_seq[sv_idx].copy())
                    add(1, ln)
                    pos += 1
                else:
                    seq.append(ref_codes[pos : pos + 1].copy())
                    add(0, 1)
                    add(2, -ln)
                    pos += 1 - ln
            sv_idx += 1
            # skip SNPs consumed by a deletion
            while snp_idx < len(snp_pos) and snp_pos[snp_idx] < pos:
                snp_idx += 1
            continue
        # SNP site
        base = ref_codes[pos]
        if snp_gt[snp_idx, hap]:
            base = snp_alt[snp_idx]
        seq.append(np.array([base], dtype=np.uint8))
        add(0, 1)
        pos += 1
        snp_idx += 1

    codes = np.concatenate(seq) if seq else np.zeros(0, dtype=np.uint8)

    # sequencing errors: substitutions + small indels (query-space edit)
    n = len(codes)
    if n == 0:
        return codes, np.zeros(0, dtype=np.uint8), cig
    sub_mask = rng.random(n) < cfg.sub_error
    if sub_mask.any():
        codes = codes.copy()
        codes[sub_mask] = (codes[sub_mask] + rng.integers(1, 4, size=int(sub_mask.sum()))) % 4
    quals = np.clip(rng.normal(cfg.qual_mean, 4, size=len(codes)), 5, 40).astype(np.uint8)
    # small indels are folded into the CIGAR as 1-3 bp I/D between M runs
    # (kept rare; they never reach SV size so downstream filters drop them)
    if rng.random() < cfg.indel_error * 10 and len(cig) > 0 and cig[0][1] > 20:
        k = int(rng.integers(1, 4))
        cut = int(rng.integers(5, min(cig[0][1] - 5, 2000)))
        first = cig[0]
        rest = cig[1:]
        if rng.random() < 0.5:
            ins = _rand_codes(rng, k)
            codes = np.concatenate([codes[:cut], ins, codes[cut:]])
            quals = np.concatenate([quals[:cut], np.full(k, cfg.qual_mean, np.uint8), quals[cut:]])
            cig = [[0, cut], [1, k], [0, first[1] - cut]] + rest
        else:
            if first[1] - cut > k + 5:
                codes = np.concatenate([codes[:cut], codes[cut + k:]])
                quals = np.concatenate([quals[:cut], quals[cut + k:]])
                cig = [[0, cut], [2, k], [0, first[1] - cut - k]] + rest
    return codes, quals, cig


def simulate_dataset(out_dir: str, cfg: SimConfig | None = None):
    """Write <out_dir>/{ref.fa,.fai, reads.bam,.bai, truth.vcf}; returns SimTruth."""
    import os

    cfg = cfg or SimConfig()
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(out_dir, exist_ok=True)

    contig_seqs: dict[str, str] = {}
    truth = SimTruth({}, {}, {}, {}, {}, {}, {}, {}, {})
    contig_codes: dict[str, np.ndarray] = {}
    variants = {}
    for name, length in cfg.contigs.items():
        codes = _rand_codes(rng, length)
        contig_codes[name] = codes
        contig_seqs[name] = decode_bases(codes)
        snp_pos, snp_gt, sv_pos, sv_len, sv_gt, ins_seq = _simulate_variants(rng, length, cfg)
        snp_ref = codes[snp_pos]
        snp_alt = (snp_ref + rng.integers(1, 4, size=len(snp_pos))) % 4
        variants[name] = (snp_pos, snp_gt, snp_alt, sv_pos, sv_len, sv_gt, ins_seq)
        truth.snp_pos[name] = snp_pos
        truth.snp_ref[name] = snp_ref.astype(np.uint8)
        truth.snp_alt[name] = snp_alt.astype(np.uint8)
        truth.snp_gt[name] = snp_gt
        truth.sv_pos[name] = sv_pos
        truth.sv_len[name] = sv_len
        truth.sv_gt[name] = sv_gt
        truth.sv_ins_seq[name] = ins_seq

    ref_path = os.path.join(out_dir, "ref.fa")
    write_fasta(ref_path, contig_seqs)

    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in cfg.contigs.items()
    )
    header = BamHeader(header_text, list(cfg.contigs), list(cfg.contigs.values()))
    bam_path = os.path.join(out_dir, "reads.bam")
    read_counter = 0
    with BamWriter(bam_path, header) as w:
        for ref_id, (name, length) in enumerate(cfg.contigs.items()):
            snp_pos, snp_gt, snp_alt, sv_pos, sv_len, sv_gt, ins_seq = (
                variants[name][0], variants[name][1], variants[name][2],
                variants[name][3], variants[name][4], variants[name][5],
                variants[name][6],
            )
            codes = contig_codes[name]
            n_reads = int(cfg.coverage * length / cfg.read_len_mean)
            starts = np.sort(rng.integers(0, max(1, length - 200), size=n_reads))
            spans = (cfg.read_len_mean * np.exp(rng.normal(0, cfg.read_len_sigma, n_reads))).astype(int)
            spans = np.clip(spans, 500, None)
            haps = rng.integers(0, 2, size=n_reads)
            for i in range(n_reads):
                seq, quals, cig = _simulate_read(
                    rng, codes, int(starts[i]), int(spans[i]), int(haps[i]),
                    snp_pos, snp_gt, snp_alt, sv_pos, sv_len, sv_gt, ins_seq, cfg,
                )
                if len(seq) < 200:
                    continue
                rname = f"read_{read_counter}"
                read_counter += 1
                truth.read_hap[rname] = int(haps[i])
                flag = 16 if rng.random() < 0.5 else 0
                cigar = np.array(cig, dtype=np.int32)
                w.write(BamRead(rname, flag, ref_id, int(starts[i]),
                                60, cigar, seq, quals, {}))
    write_bai_stub(bam_path)

    _write_truth_vcf(os.path.join(out_dir, "truth.vcf"), cfg, truth)
    return truth


def _write_truth_vcf(path: str, cfg: SimConfig, truth: SimTruth) -> None:
    header = [
        "##fileformat=VCFv4.2",
        "##source=duet_tpu.sim",
    ] + [f"##contig=<ID={n},length={l}>" for n, l in cfg.contigs.items()] + [
        '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="SV type">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Phased genotype">',
        '##FORMAT=<ID=PS,Number=1,Type=String,Description="Phase set">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE",
    ]
    records = []
    for name in truth.sv_pos:
        for i, (p, l, gt) in enumerate(
            zip(truth.sv_pos[name], truth.sv_len[name], truth.sv_gt[name])
        ):
            svtype = "INS" if l > 0 else "DEL"
            gts = f"{gt[0]}|{gt[1]}"
            records.append(
                f"{name}\t{p + 1}\ttruth.{name}.{i}\tN\t<{svtype}>\t.\tPASS\t"
                f"SVLEN={l};SVTYPE={svtype}\tGT:PS\t{gts}:1"
            )
    write_vcf(path, header, records)
