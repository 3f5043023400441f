"""Independent per-call oracle for the SV-phasing decision procedure.

A deliberately plain, dict-per-call implementation of the algorithm
documented in SURVEY.md §2.2 (reference src/duet/sv_phasing_fn.py:70-230),
used only in tests to cross-check duet_tpu.models.sv_phaser's vectorized
implementation. Two independently-written implementations agreeing on
randomized inputs is the parity evidence standing in for the (unavailable)
HG00733 demo golden file.
"""

from __future__ import annotations

import numpy as np


def oracle_features(call: dict, regime: int, oneps: set) -> dict:
    """call: {'pos', 'svread', 'refread', 'reads': [(hap, ps, pc) | None, ...]}"""
    hap1 = hap2 = hap0 = allhap = 0
    sc1 = sc2 = 0
    ps_out = 0
    reads = call["reads"]
    if regime == 1:
        for r in reads:
            if r is not None and r[2] <= 8100:
                ps_out = r[1]
                if r[0] == 1:
                    hap1 += 1
                    sc1 += r[2]
                elif r[0] == 2:
                    hap2 += 1
                    sc2 += r[2]
        allhap = hap1 + hap2
    elif regime == 2:
        groups: dict[int, list] = {}
        for r in reads:
            if r is not None and r[2] <= 8100:
                allhap += 1
                if r[1] in oneps:
                    g = groups.setdefault(r[1], [0, 0, 0, 0, 0])  # n, n1, n2, s1, s2
                    g[0] += 1
                    g[r[0]] += 1
                    g[2 + r[0]] += r[2]
        best_n = 0
        for ps_val, g in groups.items():  # insertion order: first-seen wins ties
            if g[0] > best_n:
                best_n = g[0]
                hap1, hap2, sc1, sc2, ps_out = g[1], g[2], g[3], g[4], ps_val
                hap0 = allhap - hap1 - hap2
    if regime == 0 or (hap1 == 0 and hap2 == 0):
        ls = np.sort(np.array(list(oneps)))
        i = np.searchsorted(ls, call["pos"])
        lo, hi = max(i - 1, 0), min(i, len(ls) - 1)
        ps_out = int(ls[lo] if abs(call["pos"] - ls[lo]) < abs(call["pos"] - ls[hi]) else ls[hi])

    f = {"hap1": hap1, "hap2": hap2, "hap0": hap0, "ps": ps_out}
    f["hapread_ratio"] = allhap / len(reads)
    f["hap1_avgsc"] = sc1 / hap1 if hap1 > 0 else 0
    f["hap2_avgsc"] = sc2 / hap2 if hap2 > 0 else 0
    f["sv_ratio"] = call["svread"] / (call["svread"] + call["refread"])
    lo_sc, hi_sc = min(sc1, sc2), max(sc1, sc2)
    f["totsc_ratio"] = hi_sc / lo_sc if lo_sc > 0 else 0
    f["onehap_totsc"] = hi_sc if lo_sc == 0 else 0
    f["hap_avgsc_diff"] = abs(f["hap2_avgsc"] - f["hap1_avgsc"])
    f["hap1_totsc"], f["hap2_totsc"] = sc1, sc2
    f["ref_num"], f["sv_num"] = call["refread"], call["svread"]
    return f


def oracle_predict(call: dict, regime: int, oneps: set) -> tuple[int, int]:
    f = oracle_features(call, regime, oneps)
    out = 0
    if regime == 0:
        if f["sv_ratio"] == 1 and f["sv_num"] >= 4:
            out = 3
    elif regime == 2:
        if f["sv_ratio"] >= 0.72:
            if f["hap_avgsc_diff"] <= 1369.50:
                if f["sv_num"] >= 3:
                    out = 3
            elif f["hap0"] >= 6:
                out = 3
    else:
        if f["onehap_totsc"] != 0:
            if f["sv_ratio"] <= 0.24:
                out = 0
            elif f["sv_ratio"] <= 0.9:
                if f["hapread_ratio"] <= 0.75 and f["hap_avgsc_diff"] <= 2400 or f["hapread_ratio"] > 0.75:
                    out = 1 if f["hap1_avgsc"] > 0 else 2
            else:
                if f["hapread_ratio"] <= 0.75 and f["hap_avgsc_diff"] <= 2400 or f["hapread_ratio"] > 0.75:
                    out = 3
        else:
            if f["sv_ratio"] <= 0.3:
                out = 0
            elif f["sv_ratio"] <= 0.45:
                out = 0 if f["ref_num"] > 10 else (1 if f["hap1_totsc"] > f["hap2_totsc"] else 2)
            elif f["sv_ratio"] <= 0.75:
                out = 3 if f["totsc_ratio"] <= 9.72 else (1 if f["hap1_totsc"] > f["hap2_totsc"] else 2)
            else:
                out = 3
    return out, f["ps"]


def oracle_phase_chromosome(calls: list[dict], svlen_min: int, support_min: int) -> list[dict]:
    """calls: dicts with chrom,pos,svlen(signed),svtype,ref,alt,gt,svread,refread,reads."""
    kept = [
        c for c in calls
        if abs(c["svlen"]) >= svlen_min and c["svread"] >= support_min and c["gt"] != "./."
    ]
    by_regime: dict[int, list] = {0: [], 1: [], 2: []}
    for c in kept:
        distinct = {r[1] for r in c["reads"] if r is not None}
        by_regime[min(len(distinct), 2)].append(c)
    oneps: set[int] = set()
    for c in by_regime[1]:
        for r in c["reads"]:
            if r is not None and r[2] <= 8100:
                oneps.add(r[1])
                break
    if not oneps:
        return []
    out = []
    hp_of = {1: "1|0", 2: "0|1", 3: "1|1"}
    for regime in (0, 1, 2):
        for c in by_regime[regime]:
            pred, ps = oracle_predict(c, regime, oneps)
            if pred == 0:
                continue
            out.append({
                "ps": ps, "hp": hp_of[pred], "chrom": c["chrom"], "pos": c["pos"],
                "svlen": abs(c["svlen"]) if c["svtype"] in ("INS", "DUP") else -abs(c["svlen"]),
                "svtype": c["svtype"], "ref": c["ref"], "alt": c["alt"],
            })
    return out
