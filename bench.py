"""Benchmark: haplotag-scoring kernel throughput (reads/s) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

The measured op is the framework's hot inner loop (K1): fused phasing
power-iteration + per-read haplotype scoring over a dense reads x het-sites
window (duet_tpu.ops.haplotag.phase_and_tag) — the TPU-native replacement
for WhatsHap haplotag, the dominant per-read cost of the reference pipeline
(SURVEY.md §2.2 hot loops).  `vs_baseline` is the speedup of the device
kernel over the same computation on the host CPU (numpy float32 BLAS), i.e.
the per-chip acceleration of the measured inner loop; the driver-set target
is >= 10x (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_batch(R, S, B, density, seed=0):
    rng = np.random.default_rng(seed)
    cov = rng.random((R, S)) < density
    alleles = np.where(cov, rng.choice([-1, 1], size=(R, S)), 0).astype(np.int8)
    weights = np.where(cov, rng.integers(10, 41, (R, S)), 0).astype(np.float32)
    phase0 = rng.choice([-1.0, 1.0], size=S).astype(np.float32)
    block_id = np.sort(rng.integers(0, B, S))
    onehot = np.zeros((S, B), dtype=np.float32)
    onehot[np.arange(S), block_id] = 1.0
    return alleles, weights, phase0, onehot


def host_reference(alleles, weights, phase0, onehot, sweeps=2):
    """Same math in numpy float32 (the CPU baseline)."""
    aw = alleles.astype(np.float32) * weights
    abs_aw = np.abs(aw)
    phase = phase0.copy()
    covered = phase0 != 0
    for _ in range(sweeps):
        signed = aw @ phase
        h = np.sign(signed).astype(np.float32)
        votes = aw.T @ h
        phase = np.where(votes > 0, 1.0, np.where(votes < 0, -1.0, phase))
        phase = np.where(covered, phase, 0.0).astype(np.float32)
    signed = aw @ phase
    rest = abs_aw @ np.concatenate(
        [(phase != 0).astype(np.float32)[:, None], onehot], axis=1
    )
    return signed, rest


def main() -> int:
    quick = "--quick" in sys.argv
    R, S, B = (8192, 1024, 16) if quick else (32768, 4096, 64)
    iters = 5 if quick else 20
    batch = make_batch(R, S, B, density=0.05)

    # --- device timing -----------------------------------------------------
    import jax
    import jax.numpy as jnp

    from duet_tpu.ops.haplotag import phase_and_tag

    dev_args = [jax.device_put(a) for a in batch]

    def time_dev(fn):
        out = fn()  # compile + warmup
        jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out))
        return (time.perf_counter() - t0) / iters

    dev_s = time_dev(lambda: phase_and_tag(*dev_args, sweeps=2))
    # fully fused Pallas path (single-pass HBM traffic); keep whichever
    # implementation is faster in this environment
    try:
        from duet_tpu.ops.pallas_haplotag import phase_and_tag_fused

        alleles, weights, phase0, onehot = dev_args
        w16 = jax.device_put(np.asarray(batch[1], np.float32).astype(jnp.bfloat16))
        fused_s = time_dev(
            lambda: phase_and_tag_fused(alleles, w16, phase0, onehot, sweeps=2)
        )
        dev_s = min(dev_s, fused_s)
    except Exception as e:  # pallas unavailable on this backend: keep jnp path
        print(f"# fused pallas path skipped: {e}", file=sys.stderr)
    reads_per_s = R / dev_s

    # --- host baseline (fewer iters; it is much slower) --------------------
    host_reference(*batch)  # warmup / page-in
    h_iters = 1 if quick else 3
    t0 = time.perf_counter()
    for _ in range(h_iters):
        host_reference(*batch)
    host_s = (time.perf_counter() - t0) / h_iters
    host_reads_per_s = R / host_s

    print(json.dumps({
        "metric": "haplotag_scoring_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / host_reads_per_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
