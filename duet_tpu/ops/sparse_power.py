"""Device sparse phasing power iteration + scoring (COO segment sums).

The phasing refinement alternates
    read haps   h = sign(A @ phase)
    site phases phase = sign(A^T @ h)
over the sparse (reads x het-sites) allele matrix.  The COO form maps
directly onto `jax.ops.segment_sum` — two segment reductions per sweep,
fixed shapes via power-of-two padding, fully device-resident.

`haplotag_score_sparse` extends the same formulation to the final read
scoring (the dense windowed kernels in ops.haplotag/ops.pallas_haplotag
compute the identical quantities as MXU matmuls).  Shipping the COO moves
~12 bytes per observation across the host->device link instead of the
~860 bytes/obs the dense (reads x sites) window inflation costs at
production sparsity (~0.4%), and the whole contig scores in ONE device
call — measured through the TPU tunnel this is what makes the device path
competitive (docs/SCALING.md, VERDICT r2 #2/#4).  The per-read phase-set
choice (host: largest summed weight per (read, block), earliest block on
ties) uses the fact that phase-set blocks are INTERVALS of the position-
sorted site axis: a read's candidate blocks form the contiguous range
[min block, max block] over its observations, so per-read relative slots
(block - min_block, capped at SLOT_K) turn the choice into a fixed-width
segment reduction + first-max argmax; reads spanning > SLOT_K blocks
(pathological fragmentation) are flagged for the host fallback.

Exactness: entry values are integers (allele * quality <= 40); float32
segment sums of integers are exact far beyond any realistic per-read or
per-site count, so sign decisions match the float64 host path bit for bit
(pinned in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pow2(x: int, floor: int = 8) -> int:
    return max(floor, 1 << (max(x, 1) - 1).bit_length())


@partial(jax.jit, static_argnames=("sweeps", "n_reads", "n_sites"))
def _refine(row, col, av, phase0, covered, sweeps: int, n_reads: int,
            n_sites: int):
    """row/col padded with sentinel n_reads / n_sites (one junk segment)."""

    def sweep(phase, _):
        s = jax.ops.segment_sum(av * phase[col], row,
                                num_segments=n_reads + 1)
        h = jnp.sign(s)
        v = jax.ops.segment_sum(av * h[row], col,
                                num_segments=n_sites + 1)[:n_sites]
        new_phase = jnp.where(v > 0, 1.0, jnp.where(v < 0, -1.0, phase))
        return jnp.where(covered, new_phase, 0.0), None

    phase, _ = jax.lax.scan(sweep, phase0, None, length=sweeps)
    return phase


def power_refine_device(am, phase: np.ndarray, block_id: np.ndarray,
                        sweeps: int = 2) -> np.ndarray:
    """Drop-in device twin of models.snp_phaser._power_refine."""
    from duet_tpu.utils import dispatch

    nnz = len(am.row)
    if nnz == 0 or am.n_sites == 0:
        return phase
    dispatch.record("phase_refine", "device")
    n_reads = _pow2(am.n_reads)
    n_sites = _pow2(am.n_sites)
    nnz_pad = _pow2(nnz)
    row = np.full(nnz_pad, n_reads, dtype=np.int32)
    col = np.full(nnz_pad, n_sites, dtype=np.int32)
    av = np.zeros(nnz_pad, dtype=np.float32)
    row[:nnz] = am.row
    col[:nnz] = am.col
    av[:nnz] = am.allele.astype(np.float32) * am.weight
    phase_pad = np.zeros(n_sites, dtype=np.float32)
    phase_pad[:am.n_sites] = phase
    covered = np.zeros(n_sites, dtype=bool)
    covered[:am.n_sites] = block_id >= 0
    out = _refine(jnp.asarray(row), jnp.asarray(col), jnp.asarray(av),
                  jnp.asarray(phase_pad), jnp.asarray(covered),
                  sweeps, n_reads, n_sites)
    return np.sign(np.asarray(out)[:am.n_sites]).astype(np.int8)


SLOT_K = 8       # per-read relative block slots (reads spanning more fall back)
PC_PER_MARGIN = 10
PC_MAX = 8100


@partial(jax.jit, static_argnames=("n_reads", "n_sites"))
def _score(row, col, av, phase, block_id, n_reads: int, n_sites: int):
    """Sparse scoring over one contig's COO (padded; sentinel row/col index
    the junk segment).  Returns per-read (hap, pc, best_block, overflow)."""
    pv = phase[col]
    signed = jax.ops.segment_sum(av * pv, row, num_segments=n_reads + 1)
    absav = jnp.abs(av)
    total = jax.ops.segment_sum(absav * (pv != 0), row,
                                num_segments=n_reads + 1)
    blk = block_id[col]
    # per-read contiguous block range -> fixed-width relative slots
    b_lo = jax.ops.segment_min(blk, row, num_segments=n_reads + 1)
    slot = blk - b_lo[row]
    overflow = jax.ops.segment_max(
        slot, row, num_segments=n_reads + 1) >= SLOT_K
    key = row * SLOT_K + jnp.clip(slot, 0, SLOT_K - 1)
    blockw = jax.ops.segment_sum(
        absav, key, num_segments=(n_reads + 1) * SLOT_K,
    ).reshape(n_reads + 1, SLOT_K)
    best_slot = jnp.argmax(blockw, axis=1)   # XLA: first max = earliest block
    best_block = b_lo + best_slot.astype(jnp.int32)

    tagged = (total > 0) & (signed != 0)
    hap = jnp.where(tagged, jnp.where(signed > 0, 1, 2), 0).astype(jnp.int32)
    pc = jnp.clip(jnp.rint(PC_PER_MARGIN * jnp.abs(signed)), 1, PC_MAX)
    pc = jnp.where(tagged, pc.astype(jnp.int32), -1)
    return hap, pc, best_block, overflow


def haplotag_score_sparse(am, phase: np.ndarray, block_id: np.ndarray):
    """Device twin of models.snp_phaser._haplotag's scoring math on the COO.

    Returns (hap, pc, best_block, overflow) numpy arrays of length
    am.n_reads; `overflow` marks reads whose observations span more than
    SLOT_K phase-set blocks — score those on the host.  best_block indexes
    block_ps (caller maps to PS and applies `overflow`/`tagged`)."""
    from duet_tpu.utils import dispatch

    nnz = len(am.row)
    n_reads = _pow2(am.n_reads)
    n_sites = _pow2(am.n_sites)
    nnz_pad = _pow2(nnz)
    dispatch.record("haplotag", "device")
    row = np.full(nnz_pad, n_reads, dtype=np.int32)
    col = np.full(nnz_pad, n_sites, dtype=np.int32)
    av = np.zeros(nnz_pad, dtype=np.float32)
    row[:nnz] = am.row
    col[:nnz] = am.col
    av[:nnz] = am.allele.astype(np.float32) * am.weight
    phase_pad = np.zeros(n_sites + 1, dtype=np.float32)
    phase_pad[:am.n_sites] = phase
    blk_pad = np.zeros(n_sites + 1, dtype=np.int32)
    blk_pad[:am.n_sites] = block_id
    hap, pc, best, overflow = _score(
        jnp.asarray(row), jnp.asarray(col), jnp.asarray(av),
        jnp.asarray(phase_pad), jnp.asarray(blk_pad), n_reads, n_sites)
    n = am.n_reads
    return (np.asarray(hap)[:n].astype(np.int8), np.asarray(pc)[:n],
            np.asarray(best)[:n], np.asarray(overflow)[:n])
