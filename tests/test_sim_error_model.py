"""ONT-shaped simulator error model: alignment-consistency invariants.

The round-5 error model performs cigar surgery (homopolymer +-1bp
indels) on every segment; a bookkeeping bug there would silently corrupt
every simulated dataset.  These tests pin the invariants the surgery
must preserve and the statistical shape it exists to produce."""

import numpy as np
import pytest

from duet_tpu.sim.simulate import SimConfig, _apply_hp_indels, simulate_dataset


def _cigar_lengths(cig):
    q = sum(ln for op, ln in cig if op in (0, 1))
    r = sum(ln for op, ln in cig if op in (0, 2))
    return q, r


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hp_indel_surgery_preserves_alignment(seed):
    """Query length == len(codes), reference span unchanged, quals
    parallel to codes — for random cigars with M/I/D structure."""
    rng = np.random.default_rng(seed)
    cfg = SimConfig(hp_indel_rate=0.3)  # high rate: force many events
    for _ in range(50):
        # build a random consistent segment
        cig = []
        n_ops = int(rng.integers(1, 6))
        for k in range(n_ops):
            op = int(rng.choice([0, 0, 0, 1, 2]))
            if k == 0:
                op = 0
            cig.append([op, int(rng.integers(5, 200))])
        q_len, r_len = _cigar_lengths(cig)
        # runs of identical bases make homopolymers likely
        codes = rng.choice(4, size=q_len, p=[0.4, 0.4, 0.1, 0.1])
        codes = codes.astype(np.uint8)
        quals = rng.integers(5, 41, size=q_len).astype(np.uint8)
        c2, q2, cig2 = _apply_hp_indels(rng, codes, quals, cig, cfg)
        q_len2, r_len2 = _cigar_lengths(cig2)
        assert q_len2 == len(c2) == len(q2)
        assert r_len2 == r_len, "reference span must survive the surgery"
        # cigar stays canonical-ish: no zero-length ops
        assert all(ln > 0 for _, ln in cig2)


def test_hp_indels_concentrate_in_homopolymers():
    """A read over a long homopolymer draws far more indels than one over
    alternating bases (the error SHAPE the model exists for)."""
    rng = np.random.default_rng(7)
    cfg = SimConfig(hp_indel_rate=0.05)
    hp = np.full(2000, 1, np.uint8)          # one 2000-base run
    alt = np.tile(np.array([0, 1, 2, 3], np.uint8), 500)  # no runs >= 3
    n_hp = n_alt = 0
    for _ in range(50):
        _, _, cig = _apply_hp_indels(rng, hp.copy(),
                                     np.full(2000, 20, np.uint8),
                                     [[0, 2000]], cfg)
        n_hp += sum(1 for op, _ in cig if op in (1, 2))
        _, _, cig = _apply_hp_indels(rng, alt.copy(),
                                     np.full(2000, 20, np.uint8),
                                     [[0, 2000]], cfg)
        n_alt += sum(1 for op, _ in cig if op in (1, 2))
    assert n_hp > 0 and n_alt == 0


def test_quality_wander_tracks_error_rate(tmp_path):
    """Per-read error multiplier must show up in BOTH directions: reads
    with more mismatches carry lower mean quals (phred-consistent)."""
    from duet_tpu.io.fasta import FastaFile
    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import SnpCallConfig, match_op_table

    simulate_dataset(str(tmp_path), SimConfig(
        contigs={"chrW": 200_000}, seed=5, coverage=12.0,
        sv_count_per_mb=0.0, snp_rate=0.0, read_qual_wander=0.6))
    store = load_read_store(str(tmp_path / "reads.bam"))
    codes = FastaFile(str(tmp_path / "ref.fa")).fetch_codes("chrW")
    cr = store.contigs["chrW"]
    op_ref, op_q, op_len, op_read = match_op_table(cr, 0)
    mism = np.zeros(cr.n)
    tot = np.zeros(cr.n)
    meanq = np.zeros(cr.n)
    for r0, q0, ln, ridx in zip(op_ref, op_q, op_len, op_read):
        seg_ref = codes[r0:r0 + ln]
        seg_q = cr.seq[q0:q0 + ln]
        mism[ridx] += int((seg_ref != seg_q).sum())
        tot[ridx] += ln
        meanq[ridx] += float(cr.qual[q0:q0 + ln].sum())
    ok = tot > 1000
    rate = mism[ok] / tot[ok]
    mq = meanq[ok] / tot[ok]
    # noisy reads must carry lower quals: strong negative correlation
    corr = float(np.corrcoef(rate, mq)[0, 1])
    assert corr < -0.5, corr
    # and the rates themselves must spread (wander exists): the noisiest
    # decile errs at >= 2x the cleanest decile
    lo, hi = np.quantile(rate, [0.1, 0.9])
    assert hi >= 2 * max(lo, 1e-4), (lo, hi)
