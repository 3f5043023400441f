"""Host->device link probe: one cached bandwidth measurement per process.

The auto-mode device gates trade a host pass against shipping data to the
accelerator, so the right size threshold depends on the LINK, not just the
kernel: this repo's tunneled chip moves ~0.2 GB/s host->device (where the
host sparse scorer wins to at least 4M combined nnz — docs/TPU_RUNS.md
round-4 multi-launch table), while a PCIe/ICI-attached chip moves
10-100 GB/s (where the device wins from ~1M nnz, docs/SCALING.md).

The probe ships two 16 MB buffers and keeps the faster one (single
measurements through the tunnel scatter >20x — CLAUDE.md); the result is
cached for the process.  Callers only probe when an accelerator backend is
live and a gate decision is actually pending, so CPU runs and sub-gate
inputs never pay it.
"""

from __future__ import annotations

_cached: float | None = None

PROBE_BYTES = 16 * 1024 * 1024


def h2d_bandwidth_mb_s() -> float:
    """Measured host->device bandwidth in MB/s (cached per process)."""
    global _cached
    if _cached is None:
        import time

        import jax
        import numpy as np

        best = float("inf")
        for seed in (0, 1):
            buf = np.full(PROBE_BYTES, seed, dtype=np.uint8)
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            best = min(best, time.perf_counter() - t0)
        _cached = PROBE_BYTES / 1e6 / max(best, 1e-9)
    return _cached
