"""Vectorized split-signature extractor vs the per-read loop oracle.

The production extractor (models.sv_caller.extract_split_signatures) is a
lexsort + pair-mask formulation; this oracle is the straightforward per-read
Python walk with identical semantics.  Final calls are invariant to
signature emission ORDER (clustering sorts by position and every per-cluster
statistic is order-free), so parity is on the multiset of
(svtype, pos, len, anchor-name) tuples.
"""

import numpy as np
import pytest

from duet_tpu.models.sv_caller import (
    SVTYPE_DEL,
    SVTYPE_DUP,
    SVTYPE_INS,
    SVTYPE_INV,
    SvCallConfig,
    contig_tables,
    extract_split_signatures,
)


def oracle_split_signatures(cr, cfg, tables):
    fwd_qs, fwd_qe = tables.fwd_qs, tables.fwd_qe
    by_name = {}
    for i, name in enumerate(cr.names):
        by_name.setdefault(name, []).append(i)
    out = []
    for name, rows in by_name.items():
        if len(rows) < 2:
            continue
        if any(cr.mapq[i] < cfg.min_mapq for i in rows):
            continue
        rows = sorted(rows, key=lambda i: int(fwd_qs[i]))
        strands = np.array([cr.strand[i] for i in rows])
        if (strands == 1).sum() * 2 == len(rows):
            prim = [i for i in rows if not cr.supp[i]]
            dominant = int(cr.strand[prim[0]]) if prim else 0
        else:
            dominant = int(round((strands == 1).mean()))
        anchor = rows[0]
        for i in rows:
            if int(cr.strand[i]) != dominant:
                span = int(cr.ends[i] - cr.starts[i])
                if span >= cfg.sig_min:
                    out.append((SVTYPE_INV, int(cr.starts[i]), span, anchor))
        for a, b in zip(rows[:-1], rows[1:]):
            if cr.strand[a] != cr.strand[b]:
                continue
            ov_lo = int(max(cr.starts[a], cr.starts[b]))
            ov_hi = int(min(cr.ends[a], cr.ends[b]))
            dup_len = ov_hi - ov_lo
            if dup_len >= cfg.sig_min:
                out.append((SVTYPE_DUP, ov_lo, dup_len, anchor))
                continue
            if cr.strand[a] == 0:
                ref_gap = int(cr.starts[b] - cr.ends[a])
                gap_pos = int(cr.ends[a])
            else:
                ref_gap = int(cr.starts[a] - cr.ends[b])
                gap_pos = int(cr.ends[b])
            q_gap = int(fwd_qs[b] - fwd_qe[a])
            if q_gap < 0:
                continue
            if ref_gap >= 0 and ref_gap - q_gap >= cfg.sig_min:
                out.append((SVTYPE_DEL, gap_pos, ref_gap - q_gap, anchor))
            elif q_gap - ref_gap >= cfg.sig_min:
                out.append((SVTYPE_INS, min(gap_pos, gap_pos + ref_gap),
                            q_gap - ref_gap, anchor))
    return out


def random_split_contig(rng, n_reads=60):
    """Random multi-segment alignments: per name 1-4 segments with clips
    encoding random query offsets, mixed strands/mapq/supplementary flags."""
    from duet_tpu.io.readstore import ContigReads

    names, starts, ends, strand, mapq, supp = [], [], [], [], [], []
    cigar_off = [0]
    cigar_ops, cigar_lens = [], []
    for r in range(n_reads):
        n_seg = int(rng.integers(1, 5))
        qlen = int(rng.integers(2_000, 12_000))
        cursor = 0
        for s in range(n_seg):
            seg_q = int(rng.integers(100, max(200, qlen // n_seg)))
            seg_q = min(seg_q, qlen - cursor - 1)
            if seg_q < 50:
                break
            lead = cursor
            trail = qlen - cursor - seg_q
            st = int(rng.integers(0, 500_000))
            names.append(f"rd{r}")
            starts.append(st)
            sv = int(rng.integers(-300, 600))  # ref span vs query span delta
            ends.append(st + max(seg_q + sv, 30))
            is_minus = int(rng.random() < 0.4)
            strand.append(is_minus)
            mapq.append(int(rng.choice([0, 5, 20, 60], p=[.05, .05, .2, .7])))
            supp.append(0 if s == 0 else 1)
            # stored orientation: minus strand stores lead/trail swapped
            lo, hi = (trail, lead) if is_minus else (lead, trail)
            ops, lens = [], []
            if lo:
                ops.append(4)
                lens.append(lo)
            ops.append(0)
            lens.append(seg_q)
            if hi:
                ops.append(4)
                lens.append(hi)
            cigar_ops.extend(ops)
            cigar_lens.extend(lens)
            cigar_off.append(len(cigar_ops))
            cursor += seg_q + int(rng.integers(0, 400))
            if cursor >= qlen - 60:
                break
    n = len(names)
    order = np.argsort(np.array(starts), kind="stable")
    seq_off = np.zeros(n + 1, dtype=np.int64)
    cr = ContigReads(
        contig="chrT", n=n,
        names=[names[i] for i in order],
        starts=np.array(starts, np.int64)[order],
        ends=np.array(ends, np.int64)[order],
        strand=np.array(strand, np.uint8)[order],
        mapq=np.array(mapq, np.uint8)[order],
        supp=np.array(supp, np.uint8)[order],
        cigar_off=np.zeros(n + 1, np.int64),
        cigar_ops=np.zeros(0, np.int8),
        cigar_lens=np.zeros(0, np.int32),
        seq_off=seq_off,
        seq=np.zeros(0, np.uint8),
        qual=np.zeros(0, np.uint8),
    )
    # rebuild flat cigars in the sorted order
    ops_l, lens_l, off = [], [], [0]
    co = np.array(cigar_off)
    for i in order:
        a, b = co[i], co[i + 1]
        ops_l.extend(cigar_ops[a:b])
        lens_l.extend(cigar_lens[a:b])
        off.append(len(ops_l))
    cr.cigar_ops = np.array(ops_l, np.int8)
    cr.cigar_lens = np.array(lens_l, np.int32)
    cr.cigar_off = np.array(off, np.int64)
    return cr


@pytest.mark.parametrize("seed", range(12))
def test_vectorized_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    cfg = SvCallConfig()
    cr = random_split_contig(rng)
    tables = contig_tables(cr, cfg)
    got = extract_split_signatures(cr, cfg, tables)
    got_set = sorted(
        (int(got.svtype[i]), int(got.pos[i]), int(got.length[i]),
         cr.names[int(got.read_idx[i])])
        for i in range(len(got.pos))
    )
    want = sorted(
        (t, p, l, cr.names[a])
        for t, p, l, a in oracle_split_signatures(cr, cfg, tables)
    )
    assert got_set == want
    if seed == 0:
        assert len(want) > 0
