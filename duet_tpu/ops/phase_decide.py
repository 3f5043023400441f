"""K3 — fused SV phase-decision kernel (JAX, device-resident).

One jitted call takes the packed (calls x support-read-slots) arrays and
produces the haplotype prediction + phase set for every call at once:
regime classification, masked feature tallies, nearest-anchor fallback and
the T1-T5 decision tree of the reference (src/duet/sv_phasing_fn.py:70-183),
fully vectorized and branchless.

Exactness without float64: every decision in the reference tree compares a
ratio of integer tallies against a decimal literal. Each comparison is
restated in pure int32 arithmetic (a/b <= p/q  <=>  a*q <= p*b), which is
*exact* — no rounding at all — provided the intermediate products fit int32.
With pc <= 8100 (the confidence cut) and S support-read slots the largest
product is 8100*S*S, so exactness holds for S <= MAX_SLOTS_EXACT (= 500);
`pack` asserts this bound. Tested bit-identical against the float64 host
path (duet_tpu.models.sv_phaser) and the independent oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_SLOTS_EXACT = 500  # 8100 * 500 * 500 < 2**31
PC_MAX = 8100
_PC_PAD = np.int32(2**30)


def _regime(tagged, ps):
    """0/1/2 distinct phase sets among tagged reads (no pc cut)."""
    p = jnp.where(tagged, ps, -1)
    srt = jnp.sort(p, axis=1)
    changes = ((srt[:, 1:] != srt[:, :-1]) & (srt[:, 1:] >= 0)).sum(axis=1)
    # +1 only when slot 0 of the sort is already valid (no -1 padding): with
    # padding present, the -1 -> first-valid transition is already counted.
    first = (srt[:, :1] >= 0)[:, 0].astype(jnp.int32)
    return jnp.minimum(changes + first, 2)


def _nearest(oneps, pos):
    """Nearest anchor, right element on exact ties (reference :106-111)."""
    idx = jnp.searchsorted(oneps, pos)
    left = jnp.maximum(idx - 1, 0)
    right = jnp.minimum(idx, len(oneps) - 1)
    take_left = jnp.abs(pos - oneps[left]) < jnp.abs(pos - oneps[right])
    return jnp.where(take_left, oneps[left], oneps[right])


@partial(jax.jit, static_argnames=())
def phase_decide(pos, svread, refread, n_slots, hap, ps, pc, tagged, oneps):
    """Returns (pred int32 in {0,1,2,3}, ps int32) per call.

    `oneps` must be the sorted, non-empty anchor array for the chromosome
    (the caller skips chromosomes with no anchors, reference :209-210).
    """
    n, S = tagged.shape
    regime = _regime(tagged, ps)
    q = tagged & (pc <= PC_MAX)

    # regime-1 tallies --------------------------------------------------
    m1 = q & (hap == 1)
    m2 = q & (hap == 2)
    h1_r1 = m1.sum(axis=1)
    h2_r1 = m2.sum(axis=1)
    sc1_r1 = jnp.where(m1, pc, 0).sum(axis=1)
    sc2_r1 = jnp.where(m2, pc, 0).sum(axis=1)
    any_q = q.any(axis=1)
    last_q = S - 1 - jnp.argmax(q[:, ::-1], axis=1)
    ps_r1 = jnp.where(any_q, jnp.take_along_axis(ps, last_q[:, None], axis=1)[:, 0], 0)

    # regime-2 tallies: best-supported phase set among the anchors -------
    loc = jnp.searchsorted(oneps, ps.reshape(-1)).reshape(n, S)
    in_ops = q & (oneps[jnp.minimum(loc, len(oneps) - 1)] == ps)
    same = in_ops[:, :, None] & in_ops[:, None, :] & (ps[:, :, None] == ps[:, None, :])
    tot = same.sum(axis=2)
    tot_masked = jnp.where(in_ops, tot, -1)
    best = jnp.argmax(tot_masked, axis=1)  # earliest slot of max-count PS
    has_ops = in_ops.any(axis=1)
    ps_best = jnp.take_along_axis(ps, best[:, None], axis=1)[:, 0]
    sel = in_ops & (ps == ps_best[:, None])
    s1 = sel & (hap == 1)
    s2 = sel & (hap == 2)
    h1_r2 = jnp.where(has_ops, s1.sum(axis=1), 0)
    h2_r2 = jnp.where(has_ops, s2.sum(axis=1), 0)
    sc1_r2 = jnp.where(has_ops, jnp.where(s1, pc, 0).sum(axis=1), 0)
    sc2_r2 = jnp.where(has_ops, jnp.where(s2, pc, 0).sum(axis=1), 0)
    allhap_r2 = q.sum(axis=1)
    hap0 = jnp.where(has_ops, allhap_r2 - h1_r2 - h2_r2, 0)

    is1 = regime == 1
    is2 = regime == 2
    h1 = jnp.where(is1, h1_r1, jnp.where(is2, h1_r2, 0))
    h2 = jnp.where(is1, h2_r1, jnp.where(is2, h2_r2, 0))
    sc1 = jnp.where(is1, sc1_r1, jnp.where(is2, sc1_r2, 0))
    sc2 = jnp.where(is1, sc2_r1, jnp.where(is2, sc2_r2, 0))
    allhap = jnp.where(is1, h1_r1 + h2_r1, jnp.where(is2, allhap_r2, 0))
    ps_out = jnp.where(is1, ps_r1, jnp.where(is2, jnp.where(has_ops, ps_best, 0), 0))

    fallback = (regime == 0) | ((h1 == 0) & (h2 == 0))
    ps_out = jnp.where(fallback, _nearest(oneps, pos), ps_out)

    # ---- decision tree, exact integer comparisons ----------------------
    a = svread
    T = svread + refread
    m1c = jnp.maximum(h1, 1)
    m2c = jnp.maximum(h2, 1)
    P = m1c * m2c
    avg_diff_num = jnp.abs(sc2 * m1c - sc1 * m2c)  # |avg2-avg1| * P

    pred = jnp.zeros(n, jnp.int32)

    # regime 0: sv_ratio == 1 and sv_num >= 4
    pred = jnp.where((regime == 0) & (refread == 0) & (a >= 4), 3, pred)

    # regime 2: sv_ratio >= 0.72; avg diff <= 1369.50 ? sv_num>=3 : hap0>=6
    le_13695 = avg_diff_num <= 1369 * P + P // 2
    r2_hit = (25 * a >= 18 * T) & jnp.where(le_13695, a >= 3, hap0 >= 6)
    pred = jnp.where(is2 & r2_hit, 3, pred)

    # regime 1
    onehap = (sc1 > 0) ^ (sc2 > 0)
    gate = ((4 * allhap <= 3 * n_slots) & (avg_diff_num <= 2400 * P)) | (
        4 * allhap > 3 * n_slots
    )
    side_avg = jnp.where(sc1 > 0, 1, 2)
    side_tot = jnp.where(sc1 > sc2, 1, 2)
    b_mid = (25 * a > 6 * T) & (10 * a <= 9 * T) & gate
    b_hi = (10 * a > 9 * T) & gate
    p_one = jnp.where(b_mid, side_avg, jnp.where(b_hi, 3, 0))

    lo = jnp.minimum(sc1, sc2)
    hi = jnp.maximum(sc1, sc2)
    ratio_le_972 = jnp.where(lo > 0, 25 * hi <= 243 * lo, True)  # 0 <= 9.72
    band2 = (10 * a > 3 * T) & (20 * a <= 9 * T)
    band3 = (20 * a > 9 * T) & (4 * a <= 3 * T)
    band4 = 4 * a > 3 * T
    p_both = jnp.where(band2, jnp.where(refread > 10, 0, side_tot), 0)
    p_both = jnp.where(band3, jnp.where(ratio_le_972, 3, side_tot), p_both)
    p_both = jnp.where(band4, 3, p_both)

    pred = jnp.where(is1, jnp.where(onehap, p_one, p_both), pred)
    return pred, ps_out


def _pow2(x: int, floor: int = 8) -> int:
    return max(floor, 1 << (max(x, 1) - 1).bit_length())


def phase_decide_packed(packed, oneps_sorted: np.ndarray):
    """Convenience host wrapper: PackedCalls + anchors -> numpy (pred, ps).

    Shapes are bucketed to powers of two (calls, support slots, anchors) so
    one compiled program serves many chromosomes/runs: padded calls carry no
    support and are dropped after unpadding; padded slots are untagged;
    padded anchors repeat the last value (duplicates change nothing in the
    membership test or the nearest-anchor search).  Padding happens
    host-side so the staged device_put (utils.devcost) times the real
    transfer; the put/run/get split lands in metrics' device_cost."""
    from duet_tpu.utils import devcost

    if packed.tagged.shape[1] > MAX_SLOTS_EXACT:
        raise ValueError(
            f"support-read slots {packed.tagged.shape[1]} > "
            f"{MAX_SLOTS_EXACT}: int32 exactness bound exceeded; use the "
            "host path")
    n, S = packed.tagged.shape
    n_pad = _pow2(n)
    s_pad = min(_pow2(S), MAX_SLOTS_EXACT)
    if s_pad < S:
        s_pad = S  # exactness bound wins over bucketing
    a_pad = _pow2(len(oneps_sorted), floor=4)

    def pad1(x, fill, dtype=np.int32):
        return np.pad(np.asarray(x, dtype), (0, n_pad - n),
                      constant_values=fill)

    def pad2(x, fill, dtype=np.int32):
        return np.pad(np.asarray(x, dtype), ((0, n_pad - n), (0, s_pad - S)),
                      constant_values=fill)

    oneps = np.asarray(oneps_sorted, np.int32)
    oneps = np.pad(oneps, (0, a_pad - len(oneps)), mode="edge")
    dev = devcost.put(
        "sv_decide",
        pad1(packed.pos, 0), pad1(packed.svread, 0),
        pad1(packed.refread, 1), pad1(packed.n_slots, 1),
        pad2(packed.hap, 0), pad2(packed.ps, -1),
        pad2(np.minimum(packed.pc, _PC_PAD), _PC_PAD),
        pad2(packed.tagged, False, dtype=bool), oneps)
    pred, ps = devcost.run("sv_decide", lambda: phase_decide(*dev))
    return (devcost.get("sv_decide", pred)[:n],
            devcost.get("sv_decide", ps)[:n])
