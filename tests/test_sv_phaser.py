"""Parity tests: vectorized SV phaser vs the independent per-call oracle."""

import numpy as np
import pytest

from duet_tpu.io.vcf import SVRecord
from duet_tpu.models import sv_phaser as svp

from reference_oracle import oracle_phase_chromosome


def random_callset(rng: np.random.Generator, n_calls: int, chrom="chr21"):
    """Random calls + read-hap joins exercising all regimes and edge cases."""
    ps_anchors = sorted(rng.choice(np.arange(1000, 10_000_000), size=6, replace=False))
    calls = []
    records = []
    read_hap: dict[str, tuple[int, int, int]] = {}
    ridx = 0
    for i in range(n_calls):
        n_reads = int(rng.integers(1, 14))
        reads = []
        names = []
        for _ in range(n_reads):
            name = f"r{ridx}"
            ridx += 1
            names.append(name)
            kind = rng.random()
            if kind < 0.25:
                reads.append(None)  # untagged read
            else:
                hap = int(rng.integers(1, 3))
                # bias toward anchor PS values, sometimes foreign PS
                if rng.random() < 0.8:
                    ps = int(rng.choice(ps_anchors[:3]))
                else:
                    ps = int(rng.choice([77, 88, 99]))
                # pc straddles the 8100 confidence cut
                pc = int(rng.choice([0, 50, 3000, 8100, 8101, 20000]))
                reads.append((hap, ps, pc))
                read_hap[name] = (hap, ps, pc)
        svlen = int(rng.choice([30, 50, 80, 200, -60, -400]))
        svread = int(rng.integers(1, 25))
        refread = int(rng.choice([0, 0, 1, 3, 8, 11, 15]))
        gt = str(rng.choice(["0/1", "1/1", "./.", "0/0"]))
        svtype = "INS" if svlen > 0 else "DEL"
        pos = int(rng.integers(1, 5_000_000))
        calls.append({
            "chrom": chrom, "pos": pos, "svlen": svlen, "svtype": svtype,
            "ref": "N", "alt": f"<{svtype}>", "gt": gt,
            "svread": svread, "refread": refread, "reads": reads,
        })
        records.append(SVRecord(
            chrom=chrom, pos=pos, call_id=f"c{i}", ref="N", alt=f"<{svtype}>",
            qual=".", filt="PASS", info="", fmt="", sample="",
            svlen=svlen, svtype=svtype, support=svread,
            read_names=names, gt=gt, ref_reads=refread,
        ))
    return calls, records, read_hap


@pytest.mark.parametrize("seed", range(25))
def test_phaser_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    calls, records, read_hap = random_callset(rng, n_calls=40)
    got = svp.phase_chromosome(records, read_hap, svlen_min=50, support_min=2)
    want = oracle_phase_chromosome(calls, svlen_min=50, support_min=2)
    assert got == want


def test_empty_oneps_skips_chromosome():
    rng = np.random.default_rng(123)
    calls, records, read_hap = random_callset(rng, n_calls=10)
    # strip all haplotype info -> no single-PS calls -> no anchors
    read_hap = {}
    for c in calls:
        c["reads"] = [None] * len(c["reads"])
    got = svp.phase_chromosome(records, read_hap, svlen_min=50, support_min=2)
    assert got == oracle_phase_chromosome(calls, 50, 2) == []


def test_nearest_ps_tie_prefers_right():
    anchors = np.array([100, 300], dtype=np.int64)
    # pos 200 is equidistant -> right element wins (strictly-closer rule)
    assert svp._nearest_ps(anchors, np.array([200]))[0] == 300
    assert svp._nearest_ps(anchors, np.array([199]))[0] == 100
    assert svp._nearest_ps(anchors, np.array([201]))[0] == 300
    assert svp._nearest_ps(anchors, np.array([5]))[0] == 100
    assert svp._nearest_ps(anchors, np.array([10_000]))[0] == 300


def test_global_sort_is_lexicographic():
    per_chrom = {}
    read_haps = {}
    recs = {}
    for chrom in ("chr2", "chr10"):
        rng = np.random.default_rng(hash(chrom) % 2**32)
        calls, records, read_hap = random_callset(rng, 30, chrom=chrom)
        per_chrom[chrom] = records
        read_haps[chrom] = read_hap
    phased = svp.phase_callset(per_chrom, read_haps, 50, 2)
    keys = [(c["chrom"], c["pos"]) for c in phased]
    assert keys == sorted(keys)  # 'chr10' sorts before 'chr2'
    if len({c["chrom"] for c in phased}) == 2:
        assert phased[0]["chrom"] == "chr10"
