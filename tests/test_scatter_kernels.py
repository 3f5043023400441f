"""Fuzz parity for the round-5 scatter-based kernels.

The pileup histogram, sparse scorer, and refine sweeps were rewritten
from sort+cumsum+searchsorted to scatter-add forms (ops/pileup.py
_hist_counts, ops/sparse_power._score/_refine).  The structured parity
suites pin them through the pipeline; these tests pin the kernels
DIRECTLY against independent numpy oracles over randomized inputs, so a
future formulation change cannot silently drift on shapes the structured
cases miss."""

import numpy as np
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hist_counts_matches_bincount(seed):
    from duet_tpu.ops.pileup import _hist_counts

    rng = np.random.default_rng(seed)
    L = int(rng.integers(50, 5000))
    n = int(rng.integers(1, 100_000))
    # mix of real keys and the sentinel (dropped observations)
    key = rng.integers(0, L * 4 + 1, n).astype(np.int32)
    want = np.bincount(key, minlength=L * 4 + 1)[: L * 4].reshape(L, 4)
    got = np.asarray(_hist_counts(key, L))
    np.testing.assert_array_equal(got, want)


def test_hist_counts_negative_keys_dropped():
    """Malformed negative keys must not wrap into real bins (JAX indexing
    wraps; the kernel routes them to the sentinel explicitly)."""
    from duet_tpu.ops.pileup import _hist_counts

    L = 4
    key = np.array([-1, -16, 0, 5], dtype=np.int32)
    got = np.asarray(_hist_counts(key, L))
    want = np.zeros((L, 4), np.int64)
    want[0, 0] = 1   # key 0
    want[1, 1] = 1   # key 5
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_score_matches_numpy_oracle(seed):
    """_score's per-read (hap, pc, best_block, overflow) against a direct
    per-read numpy evaluation — random COO with pads, zero-phase sites,
    and multi-block reads (some beyond SLOT_K)."""
    import jax.numpy as jnp

    from duet_tpu.ops.sparse_power import (PC_MAX, PC_PER_MARGIN, SLOT_K,
                                           _score)

    rng = np.random.default_rng(seed)
    n_reads = int(rng.integers(5, 200))
    n_sites = int(rng.integers(5, 300))
    nnz = int(rng.integers(1, 2000))
    nnz_pad = 1 << (nnz - 1).bit_length()
    row = np.full(nnz_pad, n_reads, np.int32)
    col = np.full(nnz_pad, n_sites, np.int32)
    av = np.zeros(nnz_pad, np.int32)
    row[:nnz] = rng.integers(0, n_reads, nnz)
    col[:nnz] = rng.integers(0, n_sites, nnz)
    av[:nnz] = rng.integers(-40, 41, nnz)
    phase = np.zeros(n_sites + 1, np.int32)
    phase[:n_sites] = rng.choice([-1, 0, 1], n_sites)
    # block ids non-decreasing in site order (intervals of the site axis)
    blk = np.zeros(n_sites + 1, np.int32)
    blk[:n_sites] = np.sort(rng.integers(0, max(n_sites // 8, 1), n_sites))
    hap, pc, best, ovf = (np.asarray(a) for a in _score(
        jnp.asarray(row), jnp.asarray(col), jnp.asarray(av),
        jnp.asarray(phase), jnp.asarray(blk), n_reads, n_sites))

    for r in range(n_reads):
        sel = np.flatnonzero(row[:nnz] == r)
        pv = phase[col[sel]]
        signed = int((av[sel] * pv).sum())
        total = int((np.abs(av[sel]) * (pv != 0)).sum())
        tagged = total > 0 and signed != 0
        if tagged:
            assert hap[r] == (1 if signed > 0 else 2), r
            assert pc[r] == min(max(PC_PER_MARGIN * abs(signed), 1), PC_MAX)
        else:
            assert hap[r] == 0 and pc[r] == -1, r
        if len(sel):
            b = blk[col[sel]]
            assert ovf[r] == (int(b.max()) - int(b.min()) >= SLOT_K), r
            if not ovf[r] and tagged:
                # best block: argmax of per-block |av| sums, earliest wins
                b_lo = int(b.min())
                slots = np.clip(b - b_lo, 0, SLOT_K - 1)
                w = np.zeros(SLOT_K, np.int64)
                np.add.at(w, slots, np.abs(av[sel]))
                assert best[r] == b_lo + int(np.argmax(w)), r
        else:
            assert not ovf[r], r


@pytest.mark.parametrize("seed", [7, 8])
def test_refine_matches_numpy_oracle(seed):
    import jax.numpy as jnp

    from duet_tpu.ops.sparse_power import _refine

    rng = np.random.default_rng(seed)
    n_reads, n_sites = 120, 90
    nnz = 700
    nnz_pad = 1024
    row = np.full(nnz_pad, n_reads, np.int32)
    col = np.full(nnz_pad, n_sites, np.int32)
    av = np.zeros(nnz_pad, np.float32)
    row[:nnz] = rng.integers(0, n_reads, nnz)
    col[:nnz] = rng.integers(0, n_sites, nnz)
    av[:nnz] = rng.integers(-40, 41, nnz)
    covered = rng.random(n_sites) < 0.9
    phase0 = np.where(covered, rng.choice([-1.0, 1.0], n_sites), 0.0) \
        .astype(np.float32)
    sweeps = 3
    got = np.asarray(_refine(
        jnp.asarray(row), jnp.asarray(col), jnp.asarray(av),
        jnp.asarray(phase0), jnp.asarray(covered), sweeps, n_reads,
        n_sites))

    ph = phase0.copy()
    for _ in range(sweeps):
        s = np.zeros(n_reads + 1, np.int64)
        np.add.at(s, row[:nnz], (av[:nnz] * ph[col[:nnz]]).astype(np.int64))
        h = np.sign(s)
        v = np.zeros(n_sites + 1, np.int64)
        np.add.at(v, col[:nnz], (av[:nnz] * h[row[:nnz]]).astype(np.int64))
        v = v[:n_sites]
        ph = np.where(v > 0, 1.0, np.where(v < 0, -1.0, ph))
        ph = np.where(covered, ph, 0.0).astype(np.float32)
    np.testing.assert_array_equal(got, ph)
