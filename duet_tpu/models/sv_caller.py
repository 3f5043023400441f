"""SV calling: per-read INS/DEL signature extraction + clustering + genotyping.

The framework's replacement for the reference's external base callers
(cuteSV/Sniffles/SVIM, reference src/duet/sv_calling.py:13-20).  The contract
downstream (sv_phasing) needs is a per-contig callset with SVLEN/SVTYPE,
support-read count, the supporting READ NAMES (the reference turns on
--report_readid/--read_names/--output-rnames for exactly this join,
sv_calling.py:14-20), a genotype, and ref/var read depths.

Pipeline per contig:
  1. signature scan   — walk each read's CIGAR, take I/D runs >= sig_min
  2. within-read merge — same-type signatures closer than merge_dist fuse
     (long ONT indels fragment across small alignment gaps)
  3. clustering       — position-sorted same-type signatures chain into
     clusters; two linkage modes:
       'gap'  : break when the position gap exceeds max_dist (cuteSV-style)
       'span' : break when (|dpos| + |dlen|) / max(len) exceeds
                cluster_max_distance (SVIM-style span-position distance,
                the consumer of the reference -c flag, sv_calling.py:15)
  4. consensus        — call position/length = lower median over members
  5. genotyping       — DV = distinct supporting reads, DR = spanning
     non-supporting reads, thresholds on DV/(DR+DV)

The chain/segment-reduce formulation is shared with the device kernel in
duet_tpu.ops.cluster (sorted positions -> boundary flags -> segment ids ->
segment reductions), so host and TPU paths are statistic-for-statistic
identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from duet_tpu.io.readstore import ContigReads, ReadStore
from duet_tpu.io.vcf import write_vcf

SVTYPE_INS = 0
SVTYPE_DEL = 1
SVTYPE_INV = 2
SVTYPE_DUP = 3
TYPE_NAMES = ("INS", "DEL", "INV", "DUP")


@dataclass
class SvCallConfig:
    sig_min: int = 25              # min CIGAR run length to record a signature
    merge_dist: int = 500          # within-read same-type merge window
    linkage: str = "gap"           # 'gap' (cuteSV-like) | 'span' (SVIM-like)
    max_dist_ins: int = 100        # gap-linkage window for INS
    max_dist_del: int = 200        # gap-linkage window for DEL
    max_dist_bnd: int = 200        # gap-linkage window for breakend pairs
    cluster_max_distance: float = 0.9  # span linkage threshold (reference -c)
    min_size: int = 50             # reference -s sv_min_size
    min_support: int = 2           # reference -r min_support_read
    span_buffer: int = 50          # ref-spanning test half-window for DR
    af_hom: float = 0.8
    af_absent: float = 0.25
    min_mapq: int = 10
    device: bool = False           # cluster through the jitted device kernel
                                   # (duet_tpu.ops.cluster.cluster_device) —
                                   # bit-identical to the host path; the
                                   # pipeline enables it on accelerators
    device_min_k: int = 65536      # auto-mode size gate: below this many
                                   # signatures the host path wins (the
                                   # kernel's compile + transfer latency
                                   # dwarfs sub-ms numpy work — on the
                                   # remote-compile tunnel by minutes);
                                   # --device-stages on sets it to 0


@dataclass
class Signatures:
    """All SV signatures of one contig, parallel arrays."""

    svtype: np.ndarray   # (k,) int8  0=INS 1=DEL
    pos: np.ndarray      # (k,) int64 0-based ref position of the event start
    length: np.ndarray   # (k,) int64 event length (positive)
    read_idx: np.ndarray # (k,) int32 index into ContigReads
    # query offset of the event in the read's STORED sequence (-1 when the
    # bases are unavailable, e.g. split signatures or merged runs) — lets
    # INS calls resolve the actual inserted sequence for the ALT column
    qpos: np.ndarray | None = None

    def qpos_or_none(self, i: int) -> int:
        return -1 if self.qpos is None else int(self.qpos[i])


def extract_signatures(cr: ContigReads, cfg: SvCallConfig) -> Signatures:
    """CIGAR scan + within-read merge. Vectorized over the flat cigar arrays:
    per-op ref positions come from exclusive scans of the ref-consuming
    lengths, so no per-read Python walk is needed."""
    ops = cr.cigar_ops.astype(np.int64)
    lens = cr.cigar_lens.astype(np.int64)
    n_ops = len(ops)
    if n_ops == 0:
        e = np.zeros(0, dtype=np.int64)
        return Signatures(e.astype(np.int8), e, e, e.astype(np.int32), e)

    # read id per op
    op_read = np.repeat(np.arange(cr.n, dtype=np.int32),
                        np.diff(cr.cigar_off).astype(np.int64))
    # ref position of each op = read start + cumulative ref-consumed before it
    consumes_ref = ((ops == 0) | (ops == 2) | (ops == 3) | (ops == 7) | (ops == 8))
    ref_adv = np.where(consumes_ref, lens, 0)
    cum = np.cumsum(ref_adv) - ref_adv  # exclusive scan
    # reset the scan at read boundaries
    start_of_read = cr.cigar_off[:-1]
    read_first_cum = cum[np.minimum(start_of_read, n_ops - 1)]
    op_ref_pos = cr.starts[op_read] + (cum - read_first_cum[op_read])

    mapq_ok = cr.mapq[op_read] >= cfg.min_mapq
    is_sig = ((ops == 1) | (ops == 2)) & (lens >= cfg.sig_min) & mapq_ok
    sig_type = np.where(ops[is_sig] == 1, SVTYPE_INS, SVTYPE_DEL).astype(np.int8)
    sig_pos = op_ref_pos[is_sig]
    sig_len = lens[is_sig]
    sig_read = op_read[is_sig]
    # query offsets (stored orientation): exclusive scan of query-consuming
    # lens, reset per read — where an I run's bases live in cr.seq
    consumes_q = ((ops == 0) | (ops == 1) | (ops == 4) | (ops == 7) | (ops == 8))
    q_adv = np.where(consumes_q, lens, 0)
    qcum = np.cumsum(q_adv) - q_adv
    read_first_qcum = qcum[np.minimum(start_of_read, n_ops - 1)]
    sig_qpos = (qcum - read_first_qcum[op_read])[is_sig]
    # soft clips (4) consume stored bases and count; hard clips (5) are
    # absent from cr.seq and do not — offsets index cr.seq directly

    # within-read merge: consecutive same-type signatures of one read closer
    # than merge_dist fuse into one event (summed length, first position)
    order = np.lexsort((sig_pos, sig_type, sig_read))
    t, p, l, r, q = (sig_type[order], sig_pos[order], sig_len[order],
                     sig_read[order], sig_qpos[order])
    if len(t):
        new_group = np.ones(len(t), dtype=bool)
        same = (r[1:] == r[:-1]) & (t[1:] == t[:-1]) & (p[1:] - p[:-1] <= cfg.merge_dist)
        new_group[1:] = ~same
        gid = np.cumsum(new_group) - 1
        ng = gid[-1] + 1
        m_pos = np.full(ng, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m_pos, gid, p)
        m_len = np.bincount(gid, weights=l).astype(np.int64)
        first = np.zeros(ng, dtype=np.int64)
        first[gid[::-1]] = np.arange(len(t))[::-1]
        # merged events span several runs: their bases are not contiguous,
        # so only singleton groups keep a resolvable query offset
        singleton = np.bincount(gid, minlength=ng) == 1
        m_q = np.where(singleton, q[first], -1)
        t, p, l, r, q = t[first], m_pos, m_len, r[first], m_q
    return Signatures(t, p, l, r, q)


def cmd_as_rational(cmd: float) -> tuple[int, int]:
    """cluster_max_distance as an exact small rational so the host and the
    integer device kernel compare identically (0.9 -> 9/10)."""
    from fractions import Fraction

    f = Fraction(cmd).limit_denominator(10_000)
    return f.numerator, f.denominator


def _segment_table(cr: ContigReads, cfg: SvCallConfig):
    """Per-alignment split-read geometry: (name_id, strand, ref_start,
    ref_end, fwd_qstart, fwd_qend, n_segments_of_read).

    Query offsets come from leading/trailing clips (S or H) and are
    normalized to FORWARD-read coordinates: a minus-strand alignment stores
    its sequence reference-forward, so its stored leading clip counts from
    the read's tail (fwd_qstart = L - stored_lead - aligned_len).

    Vectorized over the flat cigar arrays (no per-read Python walk): first/
    last op per read come straight from cigar_off, and per-read aligned
    query length is a bincount segment-sum."""
    ops = cr.cigar_ops
    lens = cr.cigar_lens.astype(np.int64)
    n_ops = len(ops)
    lead = np.zeros(cr.n, dtype=np.int64)
    trail = np.zeros(cr.n, dtype=np.int64)
    qaln = np.zeros(cr.n, dtype=np.int64)
    if n_ops:
        counts = np.diff(cr.cigar_off).astype(np.int64)
        has = counts > 0
        first = np.minimum(cr.cigar_off[:-1], n_ops - 1)
        last = np.maximum(cr.cigar_off[1:] - 1, 0)
        f_clip = has & ((ops[first] == 4) | (ops[first] == 5))
        lead[f_clip] = lens[first[f_clip]]
        t_clip = (counts > 1) & ((ops[last] == 4) | (ops[last] == 5))
        trail[t_clip] = lens[last[t_clip]]
        op_read = np.repeat(np.arange(cr.n, dtype=np.int64), counts)
        q_ops = (ops == 0) | (ops == 1) | (ops == 7) | (ops == 8)
        qaln = np.bincount(op_read, weights=np.where(q_ops, lens, 0),
                           minlength=cr.n).astype(np.int64)
    L = lead + qaln + trail
    minus = cr.strand == 1
    fwd_qstart = np.where(minus, trail, lead)
    return fwd_qstart, fwd_qstart + qaln, L


@dataclass
class ContigTables:
    """Once-per-contig host scans shared by intra-contig SV calling and
    breakend evidence (both need the split-segment geometry and the
    spanning DR pool; computing them twice doubles the hot host loop)."""

    fwd_qs: np.ndarray
    fwd_qe: np.ndarray
    read_len: np.ndarray
    pool_starts: np.ndarray
    pool_ends_sorted: np.ndarray
    prim_span: dict


def contig_tables(cr: ContigReads, cfg: SvCallConfig) -> ContigTables:
    fwd_qs, fwd_qe, L = _segment_table(cr, cfg)
    pool_starts, pool_ends_sorted, prim_span = _spanning_pool(cr, cfg)
    return ContigTables(fwd_qs, fwd_qe, L,
                        pool_starts, pool_ends_sorted, prim_span)


def extract_split_signatures(cr: ContigReads, cfg: SvCallConfig,
                             tables: ContigTables | None = None) -> Signatures:
    """INS/DEL/INV/DUP signatures from split alignments (primary +
    supplementary).

    Per read (grouped by name), segments sorted by forward-query offset:
      INV — a segment whose strand differs from the read's majority strand
            (strand-flip breakpoints); span = that segment's ref span
      DUP — adjacent same-strand segments whose reference windows OVERLAP:
            the read passes the same reference span twice (tandem copy);
            len = overlap = min(ends) - max(starts).  The overlap test is
            strand-symmetric: colinear splits have non-positive overlap in
            either orientation and never fire.
      DEL/INS — adjacent same-strand COLINEAR segments: aligners emit large
            indels as split alignments instead of one long CIGAR run, so the
            reference-gap vs query-gap imbalance is the event size
            (ref_gap - q_gap >= sig_min -> DEL at the gap start;
            q_gap - ref_gap >= sig_min -> INS).  These merge into the same
            clusters as the CIGAR-run signatures of other reads.

    Fully vectorized over name groups: rows are lexsorted by (read-name
    group, forward-query offset), INV candidates are a mask over rows, and
    the DUP/DEL/INS geometry is computed on the consecutive-row pair arrays
    — no per-read Python loop (per-cluster stats downstream are invariant
    to signature emission order, so the grouped-by-type layout here equals
    the old interleaved per-read emission).
    """
    tables = tables or contig_tables(cr, cfg)
    fwd_qs, fwd_qe = tables.fwd_qs, tables.fwd_qe
    empty = Signatures(np.zeros(0, np.int8), np.zeros(0, np.int64),
                       np.zeros(0, np.int64), np.zeros(0, np.int32))
    if cr.n == 0:
        return empty

    _, gid = np.unique(np.asarray(cr.names), return_inverse=True)
    G = int(gid.max()) + 1
    sizes = np.bincount(gid, minlength=G)
    gmin_mapq = np.full(G, 255, dtype=np.int64)
    np.minimum.at(gmin_mapq, gid, cr.mapq.astype(np.int64))
    group_ok = (sizes >= 2) & (gmin_mapq >= cfg.min_mapq)
    if not group_ok.any():
        return empty

    # rows sorted by (group, fwd_qstart), stable on the original index
    order = np.lexsort((fwd_qs, gid))
    keep = group_ok[gid[order]]
    order = order[keep]
    g_s = gid[order]
    strand_s = cr.strand[order].astype(np.int64)
    starts_s = cr.starts[order]
    ends_s = cr.ends[order]

    # dominant strand per group: majority; exact tie -> the first primary's
    # strand in query order (0 when the read has no primary here)
    minus = np.bincount(gid, weights=(cr.strand == 1), minlength=G).astype(np.int64)
    tie = minus * 2 == sizes
    dom = (minus * 2 > sizes).astype(np.int64)
    if tie.any():
        idx_s = np.arange(len(order))
        prim_pos = np.full(G, len(order), dtype=np.int64)
        prim_rows = np.flatnonzero(cr.supp[order] == 0)
        np.minimum.at(prim_pos, g_s[prim_rows], idx_s[prim_rows])
        prim_strand = np.zeros(G, dtype=np.int64)
        has_prim = prim_pos < len(order)
        prim_strand[has_prim] = strand_s[prim_pos[has_prim]]
        dom[tie] = prim_strand[tie]

    # anchor = the group's first row in query order
    grp_start = np.ones(len(order), dtype=bool)
    grp_start[1:] = g_s[1:] != g_s[:-1]
    start_idx = np.flatnonzero(grp_start)
    anchor_of = np.zeros(G, dtype=np.int64)
    anchor_of[g_s[start_idx]] = order[start_idx]

    # INV: rows on the minority strand whose ref span clears sig_min
    span = ends_s - starts_s
    inv = (strand_s != dom[g_s]) & (span >= cfg.sig_min)
    inv_t = np.full(int(inv.sum()), SVTYPE_INV, dtype=np.int8)
    inv_p = starts_s[inv]
    inv_l = span[inv]
    inv_r = anchor_of[g_s[inv]].astype(np.int32)

    # consecutive same-group same-strand pairs in query order
    pair = (g_s[1:] == g_s[:-1]) & (strand_s[1:] == strand_s[:-1])
    a = np.flatnonzero(pair)
    b = a + 1
    ov_lo = np.maximum(starts_s[a], starts_s[b])
    ov_hi = np.minimum(ends_s[a], ends_s[b])
    dup_len = ov_hi - ov_lo
    is_dup = dup_len >= cfg.sig_min
    # colinear split: minus-strand pairs walk the reference backwards in
    # query order, so the gap orientation flips
    plus = strand_s[a] == 0
    ref_gap = np.where(plus, starts_s[b] - ends_s[a], starts_s[a] - ends_s[b])
    gap_pos = np.where(plus, ends_s[a], ends_s[b])
    q_gap = fwd_qs[order[b]] - fwd_qe[order[a]]
    lin = ~is_dup & (q_gap >= 0)
    is_del = lin & (ref_gap >= 0) & (ref_gap - q_gap >= cfg.sig_min)
    # ref_gap may be slightly NEGATIVE for INS (microhomology at the
    # breakpoint, bounded by -sig_min since larger overlaps took DUP) —
    # the query surplus is still the inserted length
    is_ins = lin & ~is_del & (q_gap - ref_gap >= cfg.sig_min)
    pair_anchor = anchor_of[g_s[a]].astype(np.int32)

    return Signatures(
        np.concatenate([
            inv_t,
            np.full(int(is_dup.sum()), SVTYPE_DUP, dtype=np.int8),
            np.full(int(is_del.sum()), SVTYPE_DEL, dtype=np.int8),
            np.full(int(is_ins.sum()), SVTYPE_INS, dtype=np.int8),
        ]),
        np.concatenate([
            inv_p, ov_lo[is_dup], gap_pos[is_del],
            np.minimum(gap_pos, gap_pos + ref_gap)[is_ins],
        ]).astype(np.int64),
        np.concatenate([
            inv_l, dup_len[is_dup], (ref_gap - q_gap)[is_del],
            (q_gap - ref_gap)[is_ins],
        ]).astype(np.int64),
        np.concatenate([
            inv_r, pair_anchor[is_dup], pair_anchor[is_del],
            pair_anchor[is_ins],
        ]).astype(np.int32),
    )


def _cluster_one_type(pos, length, read_idx, cfg: SvCallConfig, svtype: int,
                      mesh):
    """Mesh-sharded single-type clustering (coordinate halos over the sp
    axis, duet_tpu.parallel.shard_cluster) -> list of (call_pos, call_len,
    member_rows), member_rows indexing the input signature arrays.  The
    host and single-device backends go through the one-pass multi-type
    path in _all_clusters instead."""
    from duet_tpu.ops.cluster import GAP, SPAN
    from duet_tpu.parallel.shard_cluster import cluster_sharded

    k = len(pos)
    if k == 0:
        return []
    num, den = cmd_as_rational(cfg.cluster_max_distance)
    max_dist = cfg.max_dist_ins if svtype == SVTYPE_INS else cfg.max_dist_del
    linkage = SPAN if cfg.linkage == "span" else GAP
    call_pos, call_len, support, count, seg_of_input = cluster_sharded(
        mesh, pos, length, read_idx, linkage, max_dist, num, den)
    order = np.argsort(seg_of_input, kind="stable")
    bounds = np.zeros(len(call_pos) + 1, dtype=np.int64)
    np.cumsum(count, out=bounds[1:])
    out = []
    for s in range(len(call_pos)):
        rows = order[bounds[s]:bounds[s + 1]]
        out.append((int(call_pos[s]), int(call_len[s]), rows))
    return out


@dataclass
class SvCall:
    contig: str
    pos: int          # 0-based
    svtype: str
    length: int       # positive
    support: int
    read_names: list[str]
    gt: str
    dr: int
    dv: int
    alt_seq: str | None = None  # resolved inserted sequence (INS only)


def _genotype(af: float, depth: int, cfg: SvCallConfig) -> str:
    if depth == 0:
        return "./."
    if af < cfg.af_absent:
        return "0/0"
    if af <= cfg.af_hom:
        return "0/1"
    return "1/1"


def _spanning_pool(cr: ContigReads, cfg: SvCallConfig):
    """DR pool, built once per contig: PRIMARY alignments long enough to
    possibly span (length >= 2*span_buffer — shorter ones can never satisfy
    both ends).  cr.starts is position-sorted; a sorted copy of ends gives
    O(log n) spanning counts per call: |start <= A| - |end < B| is exact for
    this pool because end < B implies start < B - 2*buf = A."""
    buf = cfg.span_buffer
    pool = np.flatnonzero(
        (cr.supp == 0) & (cr.mapq >= cfg.min_mapq)
        & (cr.ends - cr.starts >= 2 * buf)
    )
    pool_starts = cr.starts[pool]
    pool_ends_sorted = np.sort(cr.ends[pool])
    prim_span = {cr.names[i]: (int(cr.starts[i]), int(cr.ends[i]))
                 for i in pool}
    return pool_starts, pool_ends_sorted, prim_span


def _spanning_dr(pool_starts, pool_ends_sorted, prim_span, names,
                 pos: int, buf: int) -> int:
    """Distinct spanning primaries at pos, excluding supporting reads whose
    own primary spans (the same DR definition the indel path uses)."""
    A, B = pos - buf, pos + buf
    spanning = int(np.searchsorted(pool_starts, A, "right")) \
        - int(np.searchsorted(pool_ends_sorted, B, "left"))
    support_spanning = sum(
        1 for nm in names
        if nm in prim_span
        and prim_span[nm][0] <= A and prim_span[nm][1] >= B
    )
    return max(spanning - support_spanning, 0)


def _all_clusters(sigs: Signatures, cfg: SvCallConfig, mesh=None):
    """Yield (svtype, call_pos, call_len, member_rows) for every cluster of
    every SV type, member_rows indexing the full signature arrays.

    Host and single-device paths cluster ALL types in ONE pass
    (ops.cluster.cluster_multi: sort by (type, pos), type changes break) —
    one kernel invocation per contig instead of four, which matters when
    every invocation is a host<->device round-trip.  The mesh path keeps
    per-type coordinate sharding."""
    from duet_tpu.ops.cluster import GAP, SPAN, cluster_multi

    if mesh is not None:
        from duet_tpu.utils import dispatch

        for svtype in (SVTYPE_INS, SVTYPE_DEL, SVTYPE_INV, SVTYPE_DUP):
            m = sigs.svtype == svtype
            sig_idx = np.flatnonzero(m)
            if m.any():
                dispatch.record("sv_cluster", "mesh")
            for cp, cl, rows_f in _cluster_one_type(
                    sigs.pos[m], sigs.length[m], sigs.read_idx[m], cfg,
                    svtype, mesh=mesh):
                yield svtype, cp, cl, sig_idx[rows_f]
        return
    k = len(sigs.pos)
    if k == 0:
        return
    num, den = cmd_as_rational(cfg.cluster_max_distance)
    md_by_type = (cfg.max_dist_ins, cfg.max_dist_del,
                  cfg.max_dist_del, cfg.max_dist_del)
    call_pos, call_len, support, count, seg_of_input, call_type = \
        cluster_multi(sigs.svtype.astype(np.int32), sigs.pos, sigs.length,
                      sigs.read_idx,
                      SPAN if cfg.linkage == "span" else GAP, md_by_type,
                      num, den,
                      device=cfg.device and k >= cfg.device_min_k)
    order = np.argsort(seg_of_input, kind="stable")
    bounds = np.zeros(len(call_pos) + 1, dtype=np.int64)
    np.cumsum(count, out=bounds[1:])
    # emission in per-type order (INS, DEL, INV, DUP), positions ascending
    # within each type — identical to the old per-type loop, so downstream
    # call ordering (stable pos sort) is unchanged
    seg_order = np.lexsort((call_pos, call_type))
    for s in seg_order:
        yield (int(call_type[s]), int(call_pos[s]), int(call_len[s]),
               order[bounds[s]:bounds[s + 1]])


def call_svs_for_contig(cr: ContigReads, cfg: SvCallConfig,
                        tables: ContigTables | None = None,
                        mesh=None) -> list[SvCall]:
    tables = tables or contig_tables(cr, cfg)
    cig = extract_signatures(cr, cfg)
    spl = extract_split_signatures(cr, cfg, tables)
    sigs = Signatures(
        np.concatenate([cig.svtype, spl.svtype]),
        np.concatenate([cig.pos, spl.pos]),
        np.concatenate([cig.length, spl.length]),
        np.concatenate([cig.read_idx, spl.read_idx]),
        np.concatenate([
            cig.qpos if cig.qpos is not None
            else np.full(len(cig.pos), -1, dtype=np.int64),
            np.full(len(spl.pos), -1, dtype=np.int64),
        ]),
    )
    calls: list[SvCall] = []
    buf = cfg.span_buffer
    pool_starts = tables.pool_starts
    pool_ends_sorted = tables.pool_ends_sorted
    prim_span = tables.prim_span
    for svtype, cp, cl, member_sigs in _all_clusters(sigs, cfg, mesh):
        if cl < cfg.min_size:
            continue
        member_reads = sigs.read_idx[member_sigs]
        uniq_rows = np.unique(member_reads)
        names = sorted({cr.names[i] for i in uniq_rows})
        support = len(names)
        if support < cfg.min_support:
            continue
        # DR: distinct read names whose PRIMARY alignment spans the
        # locus and that do not support the event
        dr = _spanning_dr(pool_starts, pool_ends_sorted, prim_span,
                          names, cp, buf)
        dv = support
        af = dv / max(dv + dr, 1)
        # resolve the inserted sequence from the representative member:
        # the one whose length IS the call's lower-median length (cuteSV
        # likewise reports one supporting read's insert)
        alt_seq = None
        if svtype == SVTYPE_INS:
            from duet_tpu.io.fasta import decode_bases

            for j in member_sigs:
                q = sigs.qpos_or_none(j)
                if sigs.length[j] != cl or q < 0:
                    continue
                rd = int(sigs.read_idx[j])
                s0 = int(cr.seq_off[rd]) + q
                if s0 + cl <= int(cr.seq_off[rd + 1]):
                    alt_seq = decode_bases(cr.seq[s0:s0 + cl])
                    break
        calls.append(SvCall(
            contig=cr.contig, pos=cp, svtype=TYPE_NAMES[svtype], length=cl,
            support=support, read_names=names,
            gt=_genotype(af, dv + dr, cfg), dr=dr, dv=dv, alt_seq=alt_seq,
        ))
    calls.sort(key=lambda c: c.pos)
    return calls


def call_svs_for_store(store: ReadStore, cfg: SvCallConfig | None = None) -> dict[str, list[SvCall]]:
    cfg = cfg or SvCallConfig()
    return {contig: call_svs_for_contig(cr, cfg) for contig, cr in store.contigs.items()}


# -----------------------------------------------------------------------------
# Inter-contig breakends (BND) — the translocation family of the base callers
# (cuteSV/Sniffles/SVIM all emit SVTYPE=BND mate pairs; the reference parser
# passes them through, read_file.py:25-77, and its phasing stage drops them
# via the SVLEN>=min_size filter, sv_phasing_fn.py:189).
# -----------------------------------------------------------------------------


@dataclass
class BndCall:
    """One junction as a mated breakend pair, canonically ordered so evidence
    from reads traversing it in either direction merges.

    side1/side2: 'L' = the retained segment lies LEFT of the breakpoint
    (junction at its right edge), 'R' = retained segment lies RIGHT of it —
    the four (side1, side2) combinations map 1:1 onto the four VCF breakend
    ALT bracket forms."""

    contig1: str
    pos1: int        # 0-based
    contig2: str
    pos2: int        # 0-based
    side1: str
    side2: str
    support: int
    read_names: list[str]
    gt: str
    dr: int
    dv: int


@dataclass
class BndEvidence:
    """Per-contig split-alignment summary + DR pool: everything BND calling
    needs after the contig's full read columns are released (streaming mode
    keeps only this across the contig pass)."""

    contig: str
    # (name, fwd_qstart, ref_start, ref_end, strand) of split candidates
    segs: list[tuple]
    pool_starts: np.ndarray
    pool_ends_sorted: np.ndarray
    prim_span: dict[str, tuple[int, int]]


def bnd_evidence_for_contig(cr: ContigReads, cfg: SvCallConfig,
                            tables: ContigTables | None = None) -> BndEvidence:
    """Split-candidate alignments: rows whose clipped tail is large enough to
    hold a partner segment (clip >= sig_min).  Cross-contig pairing happens
    later over all contigs' summaries."""
    tables = tables or contig_tables(cr, cfg)
    fwd_qs, fwd_qe = tables.fwd_qs, tables.fwd_qe
    clip = tables.read_len - (fwd_qe - fwd_qs)
    rows = np.flatnonzero((clip >= cfg.sig_min) & (cr.mapq >= cfg.min_mapq))
    segs = [
        (cr.names[i], int(fwd_qs[i]), int(cr.starts[i]), int(cr.ends[i]),
         int(cr.strand[i]))
        for i in rows
    ]
    # only split-candidate names can support a BND; keep the map small
    names = {s[0] for s in segs}
    prim_span = {n: v for n, v in tables.prim_span.items() if n in names}
    return BndEvidence(cr.contig, segs, tables.pool_starts,
                       tables.pool_ends_sorted, prim_span)


def _bnd_signatures(evidence: dict[str, BndEvidence], cfg: SvCallConfig):
    """Adjacent (in forward-query order) alignment segments of one read on
    DIFFERENT contigs -> one breakend signature
    (c1, p1, side1, c2, p2, side2, name), canonically ordered."""
    by_name: dict[str, list[tuple]] = {}
    for contig, ev in evidence.items():
        for name, qs, rs, re_, strand in ev.segs:
            by_name.setdefault(name, []).append((qs, contig, rs, re_, strand))
    sigs = []
    for name, segs in by_name.items():
        if len({s[1] for s in segs}) < 2:
            continue
        segs.sort(key=lambda s: s[0])
        for a, b in zip(segs[:-1], segs[1:]):
            if a[1] == b[1]:
                continue
            # earlier segment: junction at ref end (+) / ref start (-);
            # 'L' breakends sit ON the last retained base, so the exclusive
            # segment end is decremented (VCF breakend convention)
            p1, s1 = (a[3] - 1, "L") if a[4] == 0 else (a[2], "R")
            # later segment: junction at ref start (+) / ref end (-)
            p2, s2 = (b[2], "R") if b[4] == 0 else (b[3] - 1, "L")
            c1, c2 = a[1], b[1]
            if (c2, p2) < (c1, p1):
                c1, p1, s1, c2, p2, s2 = c2, p2, s2, c1, p1, s1
            sigs.append((c1, p1, s1, c2, p2, s2, name))
    return sigs


def _lower_median(vals: list[int]) -> int:
    srt = sorted(vals)
    return srt[(len(srt) - 1) // 2]


def call_bnds(evidence: dict[str, BndEvidence],
              cfg: SvCallConfig) -> list[BndCall]:
    """Cluster breakend signatures per (contig pair, orientation) with gap
    linkage on BOTH breakpoints; genotype against contig1's spanning pool."""
    sigs = _bnd_signatures(evidence, cfg)
    groups: dict[tuple, list[tuple]] = {}
    for c1, p1, s1, c2, p2, s2, name in sigs:
        groups.setdefault((c1, c2, s1, s2), []).append((p1, p2, name))
    calls: list[BndCall] = []
    for (c1, c2, s1, s2), members in groups.items():
        members.sort(key=lambda m: (m[0], m[1]))
        cluster: list[tuple] = []
        clusters = []
        for m in members:
            if cluster and (m[0] - cluster[-1][0] > cfg.max_dist_bnd
                            or abs(m[1] - cluster[-1][1]) > cfg.max_dist_bnd):
                clusters.append(cluster)
                cluster = []
            cluster.append(m)
        if cluster:
            clusters.append(cluster)
        ev1 = evidence[c1]
        for cl in clusters:
            names = sorted({m[2] for m in cl})
            if len(names) < cfg.min_support:
                continue
            p1 = _lower_median([m[0] for m in cl])
            p2 = _lower_median([m[1] for m in cl])
            dv = len(names)
            dr = _spanning_dr(ev1.pool_starts, ev1.pool_ends_sorted,
                              ev1.prim_span, names, p1, cfg.span_buffer)
            af = dv / max(dv + dr, 1)
            calls.append(BndCall(
                contig1=c1, pos1=p1, contig2=c2, pos2=p2, side1=s1, side2=s2,
                support=dv, read_names=names,
                gt=_genotype(af, dv + dr, cfg), dr=dr, dv=dv,
            ))
    calls.sort(key=lambda c: (c.contig1, c.pos1, c.contig2, c.pos2))
    return calls


def call_bnds_for_store(store: ReadStore,
                        cfg: SvCallConfig | None = None) -> list[BndCall]:
    cfg = cfg or SvCallConfig()
    evidence = {c: bnd_evidence_for_contig(cr, cfg)
                for c, cr in store.contigs.items()}
    return call_bnds(evidence, cfg)


def call_contig_with_evidence(cr: ContigReads, cfg: SvCallConfig, mesh=None):
    """(intra-contig calls, breakend evidence) sharing one table scan —
    what the pipeline stages use."""
    tables = contig_tables(cr, cfg)
    return (call_svs_for_contig(cr, cfg, tables, mesh=mesh),
            bnd_evidence_for_contig(cr, cfg, tables))


def bnd_alt(side_this: str, side_mate: str, mate_contig: str,
            mate_pos1: int) -> str:
    """VCF breakend ALT bracket notation for one record of a mate pair."""
    bracket = (f"[{mate_contig}:{mate_pos1}[" if side_mate == "R"
               else f"]{mate_contig}:{mate_pos1}]")
    return "N" + bracket if side_this == "L" else bracket + "N"


def write_sv_vcf(path: str, calls: dict[str, list[SvCall]],
                 contig_lengths: dict[str, int], family: str = "cutesv",
                 bnds: list[BndCall] | None = None) -> None:
    """variants.vcf in the selected caller family's layout.

    All three layouts the reference parser handles (read_file.py:34-76) can
    be emitted, so every downstream parse path is exercised end-to-end:
      cutesv   SVLEN/SVTYPE/RE/RNAMES;      GT:DR:DV:PL:GQ  (>4-field path)
      sniffles SVLEN/SVTYPE/SUPPORT/RNAMES; GT:DR:DV        (no-comma path)
      svim     SVLEN/SVTYPE/SUPPORT/READS;  GT:DP:AD, AD='DR,DV' (comma path)

    BND junctions are written as mated breakend record pairs (bracket ALTs,
    CHR2/END/MATEID INFO) interleaved position-sorted with each contig's
    intra-contig calls; no SVLEN field, so a reference-semantics parser
    assigns 0 (read_file.py:34-35) and its phasing filter drops them.
    """
    bnds = bnds or []
    contig_order = list(calls)
    for b in bnds:  # a junction partner may live on an otherwise call-free contig
        for c in (b.contig1, b.contig2):
            if c not in contig_order:
                contig_order.append(c)
    header = [
        "##fileformat=VCFv4.2",
        f"##source=duet_tpu.sv_caller ({family} layout)",
    ] + [
        f"##contig=<ID={c},length={contig_lengths.get(c, 0)}>"
        for c in contig_order
    ] + [
        '##ALT=<ID=INS,Description="Insertion">',
        '##ALT=<ID=DEL,Description="Deletion">',
        '##ALT=<ID=INV,Description="Inversion">',
        '##ALT=<ID=DUP,Description="Duplication">',
        '##ALT=<ID=BND,Description="Breakend">',
        '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="SV type">',
        '##INFO=<ID=CHR2,Number=1,Type=String,Description="Partner contig of a breakend">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="Partner position of a breakend">',
        '##INFO=<ID=MATEID,Number=1,Type=String,Description="ID of the mate breakend record">',
        '##INFO=<ID=RE,Number=1,Type=Integer,Description="Supporting reads">',
        '##INFO=<ID=SUPPORT,Number=1,Type=Integer,Description="Supporting reads">',
        '##INFO=<ID=RNAMES,Number=.,Type=String,Description="Supporting read names">',
        '##INFO=<ID=READS,Number=.,Type=String,Description="Supporting read names">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="# ref reads">',
        '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="# var reads">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Phred GT likelihoods">',
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allele depths">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE",
    ]
    def _fmt_sample(c, extra_info: str):
        names = ",".join(c.read_names)
        if family == "sniffles":
            info = f"{extra_info}SUPPORT={c.support};RNAMES={names}"
            fmt, sample = "GT:DR:DV", f"{c.gt}:{c.dr}:{c.dv}"
        elif family == "svim":
            info = f"{extra_info}SUPPORT={c.support};READS={names}"
            fmt, sample = "GT:DP:AD", f"{c.gt}:{c.dr + c.dv}:{c.dr},{c.dv}"
        else:
            info = f"{extra_info}RE={c.support};RNAMES={names}"
            fmt, sample = "GT:DR:DV:PL:GQ", f"{c.gt}:{c.dr}:{c.dv}:.,.,.:."
        return info, fmt, sample

    per_contig: dict[str, list[tuple[int, str]]] = {c: [] for c in contig_order}
    idx = 0
    for contig, contig_calls in calls.items():
        for c in contig_calls:
            svlen = -c.length if c.svtype == "DEL" else c.length
            info, fmt, sample = _fmt_sample(
                c, f"SVLEN={svlen};SVTYPE={c.svtype};")
            # sequence-resolved INS (REF base + inserted bases, cuteSV-style);
            # symbolic ALT otherwise
            alt = ("N" + c.alt_seq if c.svtype == "INS" and c.alt_seq
                   else f"<{c.svtype}>")
            per_contig[contig].append((c.pos, (
                f"{contig}\t{c.pos + 1}\tduet_tpu.{c.svtype}.{idx}\tN\t"
                f"{alt}\t.\tPASS\t{info}\t{fmt}\t{sample}"
            )))
            idx += 1
    for k, b in enumerate(bnds):
        ids = (f"duet_tpu.BND.{k}.1", f"duet_tpu.BND.{k}.2")
        ends = ((b.contig1, b.pos1, b.side1), (b.contig2, b.pos2, b.side2))
        for this, (mate_c, mate_p, mate_s), id_this, id_mate in (
            (ends[0], ends[1], ids[0], ids[1]),
            (ends[1], ends[0], ids[1], ids[0]),
        ):
            c_this, p_this, s_this = this
            alt = bnd_alt(s_this, mate_s, mate_c, mate_p + 1)
            info, fmt, sample = _fmt_sample(
                b, f"SVTYPE=BND;CHR2={mate_c};END={mate_p + 1};"
                   f"MATEID={id_mate};")
            per_contig[c_this].append((p_this, (
                f"{c_this}\t{p_this + 1}\t{id_this}\tN\t{alt}\t.\tPASS\t"
                f"{info}\t{fmt}\t{sample}"
            )))
    records = []
    for contig in contig_order:
        for _, line in sorted(per_contig[contig], key=lambda t: t[0]):
            records.append(line)
    write_vcf(path, header, records)
