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
    """row/col padded with sentinel n_reads / n_sites (one junk segment).

    Scatter-free: entries arrive COLUMN-sorted (the allele matrix's
    natural order), one device sort by row yields the row-major
    permutation, and both per-sweep reductions become int32 cumulative
    sums differenced at searchsorted bounds (see _score for why scatter
    is the wrong primitive on TPU and why int32 sums are exact here)."""
    av32 = av.astype(jnp.int32)
    idx = jnp.arange(row.shape[0], dtype=jnp.int32)
    row_s, perm_r = jax.lax.sort((row, idx), num_keys=1)
    col_s, perm_c = jax.lax.sort((col, idx), num_keys=1)
    av_r, col_r = av32[perm_r], col[perm_r]
    av_c, row_c = av32[perm_c], row[perm_c]
    rb = jnp.searchsorted(row_s, jnp.arange(n_reads + 2, dtype=row.dtype))
    cb = jnp.searchsorted(col_s, jnp.arange(n_sites + 2, dtype=col.dtype))

    def range_sum(vals, b):
        c = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(vals)])
        return c[b[1:]] - c[b[:-1]]

    def sweep(phase, _):
        pi = phase.astype(jnp.int32)
        s = range_sum(av_r * pi[col_r], rb)            # per-read signed score
        h = jnp.sign(s)
        v = range_sum(av_c * h[row_c], cb)[:n_sites]   # per-site votes
        new_phase = jnp.where(v > 0, 1.0, jnp.where(v < 0, -1.0, phase))
        return jnp.where(covered, new_phase, 0.0), None

    phase, _ = jax.lax.scan(sweep, phase0, None, length=sweeps)
    return phase


def power_refine_device(am, phase: np.ndarray, block_id: np.ndarray,
                        sweeps: int = 2) -> np.ndarray:
    """Drop-in device twin of models.snp_phaser._power_refine."""
    from duet_tpu.utils import devcost, dispatch

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
    dev = devcost.put("phase_refine", row, col, av, phase_pad, covered)
    out = devcost.run("phase_refine",
                      lambda: _refine(*dev, sweeps, n_reads, n_sites))
    return np.sign(
        devcost.get("phase_refine", out)[:am.n_sites]).astype(np.int8)


SLOT_K = 8       # per-read relative block slots (reads spanning more fall back)
PC_PER_MARGIN = 10
PC_MAX = 8100
# int32 running sums over |allele*quality| <= 40 entries stay exact up to
# ~53M observations; callers route larger contigs to the float64 host twins
# (both the scorer and the refine use global int32 cumsums)
INT32_EXACT_NNZ = 40_000_000


@partial(jax.jit, static_argnames=("n_reads", "n_sites"))
def _score(row, col, av, phase, block_id, n_reads: int, n_sites: int):
    """Sparse scoring over one contig's COO (padded; sentinel row/col index
    the junk segment).  Returns per-read (hap, pc, best_block, overflow).

    SORT-CENTRIC, scatter-free: XLA lowers segment_sum to a serialized
    scatter on TPU (~0.5 us/element — measured to dominate the device
    path, docs/SCALING.md), so every per-read reduction here is one
    two-key lax.sort by (read, block) followed by int32 cumulative sums
    differenced at searchsorted segment bounds — all parallel-friendly
    primitives.  The sort stays IN-graph deliberately: it adds no jit
    shape (same pow2-bucketed nnz), the chip sorts 16.7M keys in ~0.07s
    (docs/TPU_RUNS.md round 3), and a host lexsort would serialize on
    exactly the slow host memory the device path exists to avoid.

    Arithmetic is EXACT: every product allele*quality*phase
    is an integer with |.| <= 40, so int32 running sums are exact up to
    ~53M observations per contig (far beyond any chromosome) and the
    results match the float64 host scorer bit for bit."""
    pv = phase[col]                       # int32 in {-1, 0, +1}
    v = av * pv
    absav = jnp.abs(av)
    inf = absav * (pv != 0)
    blk = block_id[col]
    row_s, blk_s, v_s, inf_s, absav_s = jax.lax.sort(
        (row, blk, v, inf, absav), num_keys=2)

    # per-read ranges in the sorted order
    rb = jnp.searchsorted(row_s, jnp.arange(n_reads + 2, dtype=row.dtype))
    lo, hi = rb[:-1], rb[1:]
    has = hi > lo
    last = jnp.maximum(hi - 1, 0)
    nnz_pad = row.shape[0]
    safe_lo = jnp.minimum(lo, nnz_pad - 1)

    def range_sum(vals):
        c = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(vals.astype(jnp.int32))])
        return c[hi] - c[lo]

    signed = range_sum(v_s)
    total = range_sum(inf_s)
    # blocks are intervals of the site axis, so a read's candidate blocks
    # are the contiguous [first, last] of its (block-sorted) entries
    b_lo = blk_s[safe_lo]
    b_hi = blk_s[last]
    overflow = has & ((b_hi - b_lo) >= SLOT_K)

    # per-(read, slot) weight sums: the (row, blk) sort makes
    # row*SLOT_K + slot monotone, so one more cumsum + bounds suffices
    slot = jnp.clip(blk_s - b_lo[row_s], 0, SLOT_K - 1)
    key2 = row_s * SLOT_K + slot
    c2 = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(absav_s.astype(jnp.int32))])
    kb = jnp.searchsorted(
        key2, jnp.arange((n_reads + 1) * SLOT_K + 1, dtype=key2.dtype))
    blockw = (c2[kb[1:]] - c2[kb[:-1]]).reshape(n_reads + 1, SLOT_K)
    best_slot = jnp.argmax(blockw, axis=1)   # XLA: first max = earliest block
    best_block = b_lo + best_slot.astype(jnp.int32)

    tagged = (total > 0) & (signed != 0)
    hap = jnp.where(tagged, jnp.where(signed > 0, 1, 2), 0).astype(jnp.int32)
    pc = jnp.clip(PC_PER_MARGIN * jnp.abs(signed), 1, PC_MAX)
    pc = jnp.where(tagged, pc.astype(jnp.int32), -1)
    return hap, pc, best_block, overflow


def haplotag_score_sparse_multi(items):
    """ONE device launch scoring SEVERAL contigs' COO matrices at once.

    `items`: list of (am, phase, block_id) per contig.  Per-contig COO
    blocks concatenate with read/site/block offsets into one big sparse
    matrix — reads never straddle contigs, sites stay position-sorted
    within their contig, and phase-set blocks remain intervals of the
    concatenated site axis, so the single-contig kernel (_score) applies
    unchanged and the ~0.3s per-call device floor (docs/TPU_RUNS.md) is
    paid once per BATCH instead of once per contig (VERDICT r3 weak #6).

    Returns a list of (hap, pc, best_block, overflow) per item with
    best_block re-based to the item's own block table.  Raises ValueError
    past the int32-exactness bound — callers split batches below it."""
    from duet_tpu.utils import devcost, dispatch

    tot_nnz = sum(len(it[0].row) for it in items)
    if tot_nnz > INT32_EXACT_NNZ:
        raise ValueError(
            f"batched nnz {tot_nnz} exceeds the int32-exactness bound "
            f"{INT32_EXACT_NNZ}; split the batch")
    tot_reads = sum(it[0].n_reads for it in items)
    tot_sites = sum(it[0].n_sites for it in items)
    n_reads = _pow2(tot_reads)
    n_sites = _pow2(tot_sites)
    nnz_pad = _pow2(max(tot_nnz, 1))
    row = np.full(nnz_pad, n_reads, dtype=np.int32)
    col = np.full(nnz_pad, n_sites, dtype=np.int32)
    av = np.zeros(nnz_pad, dtype=np.int32)
    phase_pad = np.zeros(n_sites + 1, dtype=np.int32)
    blk_pad = np.zeros(n_sites + 1, dtype=np.int32)
    metas = []
    r_off = s_off = b_off = z = 0
    for am, phase, block_id in items:
        k = len(am.row)
        row[z:z + k] = am.row + r_off
        col[z:z + k] = am.col + s_off
        av[z:z + k] = am.allele.astype(np.int32) * am.weight.astype(np.int32)
        phase_pad[s_off:s_off + am.n_sites] = phase
        # block -1 (site with no observations) never appears in col, so the
        # offset shift only needs to be right for covered sites
        blk_pad[s_off:s_off + am.n_sites] = block_id + b_off
        metas.append((r_off, am.n_reads, b_off))
        r_off += am.n_reads
        s_off += am.n_sites
        b_off += int(block_id.max()) + 1 if len(block_id) else 0
        z += k
    dispatch.record("haplotag", "device")
    dev = devcost.put("haplotag", row, col, av, phase_pad, blk_pad)
    hap, pc, best, ovf = devcost.run(
        "haplotag", lambda: _score(*dev, n_reads, n_sites))
    hap = devcost.get("haplotag", hap)
    pc = devcost.get("haplotag", pc)
    best = devcost.get("haplotag", best)
    ovf = devcost.get("haplotag", ovf)
    return [
        (hap[r0:r0 + nr].astype(np.int8), pc[r0:r0 + nr],
         best[r0:r0 + nr] - b0, ovf[r0:r0 + nr])
        for r0, nr, b0 in metas
    ]


def haplotag_score_sparse(am, phase: np.ndarray, block_id: np.ndarray):
    """Device twin of models.snp_phaser._haplotag's scoring math on the COO.

    Returns (hap, pc, best_block, overflow) numpy arrays of length
    am.n_reads; `overflow` marks reads whose observations span more than
    SLOT_K phase-set blocks — score those on the host.  best_block indexes
    block_ps (caller maps to PS and applies `overflow`/`tagged`)."""
    from duet_tpu.utils import devcost, dispatch

    nnz = len(am.row)
    n_reads = _pow2(am.n_reads)
    n_sites = _pow2(am.n_sites)
    nnz_pad = _pow2(nnz)
    dispatch.record("haplotag", "device")
    row = np.full(nnz_pad, n_reads, dtype=np.int32)
    col = np.full(nnz_pad, n_sites, dtype=np.int32)
    av = np.zeros(nnz_pad, dtype=np.int32)
    row[:nnz] = am.row
    col[:nnz] = am.col
    # quality weights are integer-valued; int32 products keep every device
    # sum exact (see _score)
    av[:nnz] = am.allele.astype(np.int32) * am.weight.astype(np.int32)
    phase_pad = np.zeros(n_sites + 1, dtype=np.int32)
    phase_pad[:am.n_sites] = phase
    blk_pad = np.zeros(n_sites + 1, dtype=np.int32)
    blk_pad[:am.n_sites] = block_id
    dev = devcost.put("haplotag", row, col, av, phase_pad, blk_pad)
    hap, pc, best, overflow = devcost.run(
        "haplotag", lambda: _score(*dev, n_reads, n_sites))
    n = am.n_reads
    return (devcost.get("haplotag", hap)[:n].astype(np.int8),
            devcost.get("haplotag", pc)[:n],
            devcost.get("haplotag", best)[:n],
            devcost.get("haplotag", overflow)[:n])
