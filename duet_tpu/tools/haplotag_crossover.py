"""Measure the haplotag-stage host/device crossover (VERDICT r2 #2/#4).

The phasing stage's device path is latency-bound at small inputs: the
auto-mode size gate (`PipelineConfig.phasing_device_min_nnz`) must sit at
the allele-matrix size where the batched device dispatch actually beats
the sparse host scorer ON THIS ENVIRONMENT'S chip+tunnel.  Round 2 set it
at 1M nnz with serial per-chunk dispatch; the batched launch (one kernel
call per 16 window chunks, models/snp_phaser.py) amortizes the tunnel
round-trip, so the crossover must be re-measured.

Builds synthetic single-contig phasing problems shaped like production
data (reads covering ~9 contiguous het sites, 2048-site windows), then
times `_haplotag` (host sparse numpy) vs `_haplotag_device` (batched
device dispatch, Pallas on TPU) at increasing nnz, asserting equal
outputs.  Prints one JSON document; docs/SCALING.md carries the captured
crossover and the gate constant references it.

    python -m duet_tpu.tools.haplotag_crossover [--sizes 50,100,200,400,800]
        (sizes are nnz in thousands; first device call pays the jit compile
         and is reported separately as compile_s)
    python -m duet_tpu.tools.haplotag_crossover --multi 2,4,8 --sizes 512
        (multi-contig batched launch, round 4: K contigs of `sizes[0]` nnz
         each scored in ONE haplotag_score_sparse_multi call vs K host
         passes vs K serial device calls — the per-call device floor
         amortization measurement behind the batch gate)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_problem(nnz_target: int, seed: int = 0, obs_per_read: int = 9):
    """Synthetic AlleleMatrix + converged phase shaped like real contigs:
    reads cover `obs_per_read` consecutive sites, ~12 reads per site."""
    from duet_tpu.models.snp_phaser import AlleleMatrix

    rng = np.random.default_rng(seed)
    n_reads = max(nnz_target // obs_per_read, 1)
    reads_per_site = 12
    m = max(n_reads * obs_per_read // reads_per_site, obs_per_read + 1)
    start = rng.integers(0, m - obs_per_read, size=n_reads)
    row = np.repeat(np.arange(n_reads, dtype=np.int32), obs_per_read)
    col = (start[:, None] + np.arange(obs_per_read)[None, :]).reshape(-1)
    order = np.argsort(col, kind="stable")
    row, col = row[order], col[order].astype(np.int32)
    phase = rng.choice(np.array([-1, 1], np.int8), size=m)
    truth_hap = rng.integers(0, 2, size=n_reads)
    agree = rng.random(len(row)) < 0.95
    sign = np.where(truth_hap[row] == 0, 1, -1) * np.where(agree, 1, -1)
    allele = (sign * phase[col]).astype(np.int8)
    weight = rng.integers(10, 41, size=len(row)).astype(np.float32)
    am = AlleleMatrix(n_reads=n_reads, n_sites=m, site_pos=np.arange(m) * 1500,
                      row=row, col=col, allele=allele, weight=weight)
    block_id = np.zeros(m, dtype=np.int32)
    block_ps = np.array([1], dtype=np.int64)
    return am, phase, block_id, block_ps


def run_multi(ks: list[int], nnz_each: int) -> int:
    """K-contig batched-launch benchmark: host per-contig loop vs K serial
    sparse device calls vs ONE batched multi launch, equality-asserted."""
    import jax

    from duet_tpu.models.snp_phaser import _haplotag, _haplotag_sparse_device
    from duet_tpu.ops.sparse_power import haplotag_score_sparse_multi

    rows = []
    for K in ks:
        problems = [make_problem(nnz_each, seed=100 + i) for i in range(K)]
        t0 = time.perf_counter()
        host = [_haplotag(am, ph, bid, bps) for am, ph, bid, bps in problems]
        host_s = time.perf_counter() - t0
        # serial per-contig device calls (pays the per-call floor K times)
        t0 = time.perf_counter()
        serial = [_haplotag_sparse_device(am, ph, bid, bps)
                  for am, ph, bid, bps in problems]
        serial_first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        serial = [_haplotag_sparse_device(am, ph, bid, bps)
                  for am, ph, bid, bps in problems]
        serial_s = time.perf_counter() - t0
        # one batched launch
        items = [(am, ph, bid) for am, ph, bid, _ in problems]
        t0 = time.perf_counter()
        multi = haplotag_score_sparse_multi(items)
        multi_first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        multi = haplotag_score_sparse_multi(items)
        multi_s = time.perf_counter() - t0
        for (am, ph, bid, bps), h, s, m in zip(problems, host, serial, multi):
            hap, pc, best, ovf = m
            tagged = (hap != 0) & ~ovf
            np.testing.assert_array_equal(h[0][tagged], hap[tagged])
            np.testing.assert_array_equal(h[1][tagged], bps[best[tagged]])
            np.testing.assert_array_equal(h[2][tagged], pc[tagged])
            for a, b in zip(h, s):
                np.testing.assert_array_equal(a, b)
        rows.append({
            "contigs": K, "nnz_each": nnz_each, "host_s": round(host_s, 4),
            "serial_device_s": round(serial_s, 4),
            "serial_first_s": round(serial_first_s, 4),
            "multi_s": round(multi_s, 4),
            "multi_first_s": round(multi_first_s, 4),
            "multi_vs_host": round(host_s / multi_s, 2),
            "multi_vs_serial": round(serial_s / multi_s, 2),
        })
        print("# K=%d host=%.3fs serial=%.3fs multi=%.3fs" %
              (K, host_s, serial_s, multi_s), file=sys.stderr)
    print(json.dumps({"backend": jax.default_backend(), "mode": "multi",
                      "rows": rows}))
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sizes = [int(s) * 1000 for s in (
        argv[argv.index("--sizes") + 1] if "--sizes" in argv
        else "50,100,200,400,800").split(",")]
    modes = (argv[argv.index("--modes") + 1].split(",")
             if "--modes" in argv else ["sparse", "dense"])
    if "--multi" in argv:
        ks = [int(k) for k in argv[argv.index("--multi") + 1].split(",")]
        return run_multi(ks, sizes[0])
    import jax

    from duet_tpu.models.snp_phaser import _haplotag, _haplotag_device

    rows = []
    for nnz in sizes:
        am, phase, block_id, block_ps = make_problem(nnz)
        t0 = time.perf_counter()
        host = _haplotag(am, phase, block_id, block_ps)
        host_s = time.perf_counter() - t0
        row = {"nnz": nnz, "reads": am.n_reads, "sites": am.n_sites,
               "host_s": round(host_s, 4)}
        for mode in modes:
            t0 = time.perf_counter()
            dev = _haplotag_device(am, phase, block_id, block_ps, mode=mode)
            first_s = time.perf_counter() - t0  # compile on first shape
            t0 = time.perf_counter()
            dev = _haplotag_device(am, phase, block_id, block_ps, mode=mode)
            dev_s = time.perf_counter() - t0
            for h, d in zip(host, dev):
                np.testing.assert_array_equal(h, d)
            row[f"{mode}_s"] = round(dev_s, 4)
            row[f"{mode}_first_s"] = round(first_s, 4)
            row[f"{mode}_speedup"] = round(host_s / dev_s, 2)
        rows.append(row)
        print("# nnz=%d host=%.3fs %s" % (nnz, host_s, " ".join(
            f"{m}={row[f'{m}_s']:.3f}s(first {row[f'{m}_first_s']:.1f}s)"
            for m in modes)), file=sys.stderr)
    # per-mode crossover; the top-level key reports the first requested
    # mode so a dense-only run still gets a meaningful value
    crossings = {
        m: next((r["nnz"] for r in rows
                 if r.get(f"{m}_speedup", 0) > 1.0), None)
        for m in modes
    }
    print(json.dumps({"backend": jax.default_backend(),
                      "crossover_nnz": crossings[modes[0]],
                      "crossover_nnz_by_mode": crossings, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
