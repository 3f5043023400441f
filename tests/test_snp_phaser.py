"""SNP phasing unit tests: chain init, switch-error correction, haplotag."""

import numpy as np
import pytest

from duet_tpu.models import snp_phaser as sp


def matrix_from_dense(D, weights=None):
    """Dense (reads x sites) array in {+1,-1,0} -> AlleleMatrix."""
    row, col = np.nonzero(D)
    w = (weights[row, col] if weights is not None
         else np.full(len(row), 30.0)).astype(np.float32)
    return sp.AlleleMatrix(
        n_reads=D.shape[0], n_sites=D.shape[1],
        site_pos=np.arange(D.shape[1], dtype=np.int64) * 1000 + 100,
        row=row.astype(np.int32), col=col.astype(np.int32),
        allele=D[row, col].astype(np.int8), weight=w,
    )


def diploid_matrix(rng, n_reads, n_sites, span, err=0.0):
    """Simulated diploid reads: hap-0 reads show +1 at every covered site
    (alt on hap1 convention), hap-1 reads show -1; errors flip entries."""
    D = np.zeros((n_reads, n_sites), dtype=np.int8)
    haps = rng.integers(0, 2, n_reads)
    for r in range(n_reads):
        start = rng.integers(0, max(n_sites - span, 1))
        sign = 1 if haps[r] == 0 else -1
        D[r, start:start + span] = sign
    if err:
        flips = rng.random(D.shape) < err
        D = np.where(flips, -D, D)
    return D, haps


def test_switch_correct_repairs_suffix_flip():
    rng = np.random.default_rng(0)
    D, haps = diploid_matrix(rng, n_reads=60, n_sites=40, span=12)
    am = matrix_from_dense(D)
    block_id = np.zeros(40, dtype=np.int32)
    # correct phase is all +1 (alt on hap1 everywhere); flip a suffix
    phase = np.ones(40, dtype=np.int8)
    phase[25:] = -1
    fixed = sp._switch_correct(am, phase, block_id)
    assert (fixed == fixed[0]).all(), "suffix flip not repaired"


def test_switch_correct_noop_when_consistent():
    rng = np.random.default_rng(1)
    D, _ = diploid_matrix(rng, n_reads=60, n_sites=40, span=12)
    am = matrix_from_dense(D)
    phase = np.ones(40, dtype=np.int8)
    fixed = sp._switch_correct(am, phase, np.zeros(40, dtype=np.int32))
    np.testing.assert_array_equal(fixed, phase)


def test_switch_correct_respects_blocks():
    """Sites of different blocks never exchange flip evidence."""
    rng = np.random.default_rng(2)
    D, _ = diploid_matrix(rng, n_reads=40, n_sites=20, span=6)
    am = matrix_from_dense(D)
    block_id = np.zeros(20, dtype=np.int32)
    block_id[10:] = 1
    phase = np.ones(20, dtype=np.int8)
    phase[10:] = -1  # second block globally flipped — that is legal
    fixed = sp._switch_correct(am, phase, block_id)
    # each block keeps one consistent orientation
    assert (fixed[:10] == fixed[0]).all() and (fixed[10:] == fixed[10]).all()


@pytest.mark.parametrize("err", [0.0, 0.05])
def test_full_phasing_recovers_haplotypes(err):
    rng = np.random.default_rng(3)
    D, haps = diploid_matrix(rng, n_reads=120, n_sites=60, span=15, err=err)
    am = matrix_from_dense(D)
    phase, block_id, block_ps = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, sweeps=2)
    phase = sp._switch_correct(am, phase, block_id)
    phase = sp._power_refine(am, phase, block_id, sweeps=2)
    hap, ps, pc = sp._haplotag(am, phase, block_id, block_ps)
    tagged = hap != 0
    match = (hap[tagged] - 1) == haps[tagged]
    acc = max(match.mean(), 1 - match.mean())
    assert acc >= 0.97, f"haplotag accuracy {acc}"


def test_weak_junction_split_knob():
    """min_junction_evidence splits a block at a junction bridged by a
    single thin read, leaving both sides internally phased (opt-in knob;
    default 0 keeps one block)."""
    import numpy as np

    from duet_tpu.models import snp_phaser as sp

    # 8 sites; reads densely cover sites 0-3 and 4-7; ONE weak read links
    # site 3 to site 4 with low-weight observations
    rows, cols, alleles, weights = [], [], [], []
    rid = 0
    for lo in (0, 4):
        for _ in range(6):
            for j in range(lo, lo + 4):
                rows.append(rid); cols.append(j)
                alleles.append(1 if (j % 2 == 0) else -1)
                weights.append(30.0)
            rid += 1
    rows += [rid, rid]; cols += [3, 4]; alleles += [-1, 1]; weights += [4.0, 4.0]
    rid += 1
    am = sp.AlleleMatrix(
        n_reads=rid, n_sites=8,
        site_pos=np.arange(8, dtype=np.int64) * 100 + 1000,
        row=np.array(rows, np.int32), col=np.array(cols, np.int32),
        allele=np.array(alleles, np.int8), weight=np.array(weights, np.float32),
        row_names=[f"r{i}" for i in range(rid)],
    )
    phase, block_id, block_ps = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, 2)
    assert len(np.unique(block_id[block_id >= 0])) == 1
    new_id, new_ps = sp._split_weak_junctions(am, phase, block_id, 2000.0)
    assert new_ps is not None and len(new_ps) == 2
    assert (new_id[:4] == new_id[0]).all() and (new_id[4:] == new_id[4]).all()
    assert new_id[0] != new_id[4]
    # default-off: no change
    same_id, same_ps = sp._split_weak_junctions(am, phase, block_id, 0.0)
    assert same_ps is None


def test_split_preserves_gap_containing_blocks():
    """Interior uncovered (-1) sites are normal inside a block; splitting at
    a weak junction in ANOTHER block must not fragment them (regression:
    raw block_id transitions b -> -1 -> b counted as two starts)."""
    import numpy as np

    from duet_tpu.models import snp_phaser as sp

    # block 0: sites 0,1,3,4 covered (site 2 uncovered), strongly linked;
    # block 1: sites 5..12 with ONE thin single-read junction at 8|9
    rows, cols, alleles, weights = [], [], [], []
    rid = 0
    for _ in range(6):                      # block 0: reads span 0,1,3,4
        for j in (0, 1, 3, 4):
            rows.append(rid); cols.append(j)
            alleles.append(1 if j % 2 == 0 else -1); weights.append(30.0)
        rid += 1
    for lo in (5, 9):                       # block 1 halves
        for _ in range(6):
            for j in range(lo, lo + 4):
                rows.append(rid); cols.append(j)
                alleles.append(1 if j % 2 == 0 else -1); weights.append(30.0)
            rid += 1
    rows += [rid, rid]; cols += [8, 9]; alleles += [1, -1]; weights += [4.0, 4.0]
    rid += 1
    site_pos = np.arange(13, dtype=np.int64) * 100 + 1000
    am = sp.AlleleMatrix(rid, 13, site_pos,
                         np.array(rows, np.int32), np.array(cols, np.int32),
                         np.array(alleles, np.int8),
                         np.array(weights, np.float32),
                         row_names=[f"r{i}" for i in range(rid)])
    phase, block_id, _ = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, 2)
    # block 0 contains the uncovered site 2; ensure two blocks exist
    assert block_id[2] == -1 or block_id[0] == block_id[4]
    new_id, new_ps = sp._split_weak_junctions(am, phase, block_id, 2000.0)
    assert new_ps is not None
    # block 0 (sites 0,1,3,4) stays ONE block despite its interior gap
    assert new_id[0] == new_id[1] == new_id[3] == new_id[4]
    # block 1 split exactly at the weak junction
    assert new_id[5] == new_id[8] and new_id[9] == new_id[12]
    assert new_id[8] != new_id[9]


def test_min_junction_evidence_splits_blocks():
    """A synthetic weak junction: two well-covered site groups joined by a
    single low-quality spanning read.  With the splitting enabled the block
    ends at the weak junction; with it disabled one block spans all sites.
    Phases within each side are unchanged either way."""
    import numpy as np

    from duet_tpu.models.snp_phaser import (
        AlleleMatrix,
        _initial_phase,
        _split_weak_junctions,
    )

    m = 40
    rows, cols, alleles, weights = [], [], [], []
    rid = 0
    # systematic tiling inside each half: a read starting at every site
    for lo, hi in ((0, 20), (20, 40)):
        for a in range(lo, hi - 1):
            for c in range(a, min(a + 8, hi)):
                rows.append(rid)
                cols.append(c)
                alleles.append(1 if (c % 2 == 0) else -1)
                weights.append(35.0)
            rid += 1
    # one weak bridge read
    for c in (18, 19, 20, 21):
        rows.append(rid)
        cols.append(c)
        alleles.append(1 if (c % 2 == 0) else -1)
        weights.append(10.0)
    rid += 1
    am = AlleleMatrix(
        n_reads=rid, n_sites=m,
        site_pos=np.arange(100, 100 + m * 50, 50, dtype=np.int64),
        row=np.array(rows, np.int32), col=np.array(cols, np.int32),
        allele=np.array(alleles, np.int8),
        weight=np.array(weights, np.float32),
    )
    phase, block_id, block_ps = _initial_phase(am)
    assert block_id.max() == 0  # bridged: one block without splitting
    new_id, new_ps = _split_weak_junctions(am, phase, block_id, min_e=5000.0)
    assert new_ps is not None and len(new_ps) >= 2
    assert new_id[0] != new_id[m - 1]


def _brute_boundary_stats(am, phase, block_id, b):
    """O(reads x sites) reference for _boundary_stats: per boundary i of
    block b, E = sum_r L_r*R_r, M = sum_r |L_r|*|R_r|, N = #spanning."""
    cols_b = np.flatnonzero(block_id == b)
    m = len(cols_b)
    local = {int(c): i for i, c in enumerate(cols_b)}
    E = np.zeros(m - 1)
    M = np.zeros(m - 1)
    N = np.zeros(m - 1)
    per_read: dict[int, list] = {}
    for r, c, a, w in zip(am.row, am.col, am.allele, am.weight):
        if int(c) in local:
            per_read.setdefault(int(r), []).append(
                (local[int(c)], float(a) * float(w) * float(phase[c])))
    for obs in per_read.values():
        for i in range(m - 1):
            L = sum(v for j, v in obs if j <= i)
            R = sum(v for j, v in obs if j > i)
            has_l = any(j <= i for j, _ in obs)
            has_r = any(j > i for j, _ in obs)
            if has_l and has_r:
                E[i] += L * R
                M[i] += abs(L) * abs(R)
                N[i] += 1
    return E, M, N


def test_boundary_stats_match_bruteforce():
    """The event-driven prefix scan's (E, M, N) equal the quadratic
    reference on random sparse matrices, flipped phases included."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        D, _ = diploid_matrix(rng, n_reads=30, n_sites=20, span=7, err=0.1)
        w = rng.integers(5, 41, D.shape).astype(np.float32)
        am = matrix_from_dense(D, w)
        phase, block_id, _ = sp._initial_phase(am)
        # arbitrary (non-converged) phases must work too
        phase = np.where(rng.random(20) < 0.3, -phase, phase).astype(np.int8)
        for b, (cols_b, E, M, N) in sp._junction_evidence(
                am, phase, block_id).items():
            Eb, Mb, Nb = _brute_boundary_stats(am, phase, block_id, b)
            np.testing.assert_allclose(E, Eb, atol=1e-6)
            np.testing.assert_allclose(M, Mb, atol=1e-6)
            np.testing.assert_allclose(N, Nb, atol=1e-6)


def test_adaptive_split_spares_strong_and_splits_weak():
    """The adaptive rule splits a disagreeing relative-outlier junction but
    spares (a) strong junctions and (b) weak junctions in uniformly weak
    blocks (median-relative: nothing is an outlier)."""
    # two dense halves joined by TWO conflicting bridge reads (rho ~ 0 at
    # the junction) -> adaptive splits with no absolute threshold
    rows, cols, alleles, weights = [], [], [], []
    rid = 0
    for lo in (0, 4):
        for _ in range(8):
            for j in range(lo, lo + 4):
                rows.append(rid); cols.append(j)
                alleles.append(1 if (j % 2 == 0) else -1)
                weights.append(30.0)
            rid += 1
    # bridge reads disagree about the relative orientation
    rows += [rid, rid]; cols += [3, 4]; alleles += [-1, 1]; weights += [20.0, 20.0]
    rid += 1
    rows += [rid, rid]; cols += [3, 4]; alleles += [-1, -1]; weights += [20.0, 20.0]
    rid += 1
    am = sp.AlleleMatrix(
        n_reads=rid, n_sites=8,
        site_pos=np.arange(8, dtype=np.int64) * 100 + 1000,
        row=np.array(rows, np.int32), col=np.array(cols, np.int32),
        allele=np.array(alleles, np.int8), weight=np.array(weights, np.float32))
    phase, block_id, _ = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, 2)
    new_id, new_ps = sp._split_weak_junctions(am, phase, block_id, 0.0,
                                              adaptive=True)
    assert new_ps is not None and len(new_ps) == 2
    assert new_id[3] != new_id[4]
    # uniformly weak block: every junction bridged by one thin read ->
    # median-relative rule keeps it whole (absolute 2000 would shatter it)
    rows2, cols2, al2, w2 = [], [], [], []
    for r in range(6):
        for j in (r, r + 1):
            rows2.append(r); cols2.append(j)
            al2.append(1 if j % 2 == 0 else -1); w2.append(6.0)
    am2 = sp.AlleleMatrix(
        n_reads=6, n_sites=7,
        site_pos=np.arange(7, dtype=np.int64) * 100 + 1000,
        row=np.array(rows2, np.int32), col=np.array(cols2, np.int32),
        allele=np.array(al2, np.int8), weight=np.array(w2, np.float32))
    phase2, block_id2, _ = sp._initial_phase(am2)
    _, ps2 = sp._split_weak_junctions(am2, phase2, block_id2, 0.0,
                                      adaptive=True)
    assert ps2 is None  # nothing is a 20x outlier vs the block median
    # explicit absolute threshold takes precedence over the adaptive rule:
    # with min_e set, results equal the pure absolute rule
    id3, ps3 = sp._split_weak_junctions(am, phase, block_id, 2000.0,
                                        adaptive=True)
    id4, ps4 = sp._split_weak_junctions(am, phase, block_id, 2000.0,
                                        adaptive=False)
    np.testing.assert_array_equal(id3, id4)
    assert (ps3 is None) == (ps4 is None)


def test_phase_contig_adaptive_knob(tmp_path):
    """phase_contig plumbing: adaptive_junction_split on vs off changes the
    block structure on a dataset with a weak disagreeing junction, and the
    CLI flag maps to the config."""
    from duet_tpu.cli import build_parser
    from duet_tpu.pipeline import PipelineConfig

    args = build_parser().parse_args(["r.bam", "ref.fa", "out"])
    assert args.junction_split == "adaptive"
    args_off = build_parser().parse_args(
        ["r.bam", "ref.fa", "out", "--junction-split", "off"])
    assert args_off.junction_split == "off"
    # config default: adaptive on, absolute override wins inside the model
    assert PipelineConfig(bam="x", reference="y",
                          output="z").adaptive_junction_split


def test_protect_intervals_suppress_split_inside_sv_span():
    """A weak junction inside an SV support read's span is NOT split
    (would push the call into the two-PS decision regime); the same
    junction without protection, or with protection elsewhere, splits."""
    import numpy as np

    from duet_tpu.models import snp_phaser as sp

    rows, cols, alleles, weights = [], [], [], []
    rid = 0
    for lo in (0, 4):
        for _ in range(6):
            for j in range(lo, lo + 4):
                rows.append(rid); cols.append(j)
                alleles.append(1 if (j % 2 == 0) else -1)
                weights.append(30.0)
            rid += 1
    rows += [rid, rid]; cols += [3, 4]; alleles += [-1, 1]; weights += [4.0, 4.0]
    rid += 1
    am = sp.AlleleMatrix(
        n_reads=rid, n_sites=8,
        site_pos=np.arange(8, dtype=np.int64) * 100 + 1000,
        row=np.array(rows, np.int32), col=np.array(cols, np.int32),
        allele=np.array(alleles, np.int8), weight=np.array(weights, np.float32),
        row_names=[f"r{i}" for i in range(rid)],
    )
    phase, block_id, _ = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, 2)
    # junction between sites 3 (pos 1300) and 4 (pos 1400)
    covering = (np.array([1200], np.int64), np.array([1500], np.int64))
    _, ps_prot = sp._split_weak_junctions(am, phase, block_id, 2000.0,
                                          protect=covering)
    assert ps_prot is None  # suppressed: span covers the junction gap
    elsewhere = (np.array([100], np.int64), np.array([1250], np.int64))
    _, ps_free = sp._split_weak_junctions(am, phase, block_id, 2000.0,
                                          protect=elsewhere)
    assert ps_free is not None and len(ps_free) == 2


def test_support_read_intervals_groups_split_alignments():
    """Split alignments of one read name pool into one protected span."""
    import numpy as np

    from duet_tpu.io.readstore import ContigReads
    from duet_tpu.models.snp_phaser import support_read_intervals

    n = 3
    off = np.arange(n + 1, dtype=np.int64)
    cr = ContigReads(
        "c", n, ["a", "b", "a"],
        np.array([100, 400, 900], np.int64), np.array([200, 600, 1100], np.int64),
        np.zeros(n, np.uint8), np.full(n, 60, np.uint8), np.zeros(n, np.uint8),
        off, np.zeros(n, np.int8), np.ones(n, np.int32),
        off, np.zeros(n, np.uint8), np.zeros(n, np.uint8),
    )
    out = support_read_intervals(cr, {"a"})
    starts, max_end = out
    # name "a" spans [100, 1100) pooled across its two segments
    assert list(starts) == [100] and list(max_end) == [1100]
    assert support_read_intervals(cr, {"zzz"}) is None
