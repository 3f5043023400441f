"""Device sparse phasing power iteration (COO segment-sum formulation).

The phasing refinement alternates
    read haps   h = sign(A @ phase)
    site phases phase = sign(A^T @ h)
over the sparse (reads x het-sites) allele matrix.  The dense windowed form
(ops.haplotag) suits the final scoring pass; for the global refinement the
COO form maps directly onto `jax.ops.segment_sum` — two segment reductions
per sweep, fixed shapes via power-of-two padding, fully device-resident.

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
