"""Host->device link probe: one cached bandwidth measurement per process.

The auto-mode device gates trade a host pass against shipping data to the
accelerator, so the right size threshold depends on the LINK, not just the
kernel: this repo's tunneled chip moves ~0.2 GB/s host->device (where the
host sparse scorer wins to at least 4M combined nnz — docs/TPU_RUNS.md
round-4 multi-launch table), while a PCIe/ICI-attached chip moves
10-100 GB/s (where the device wins from ~1M nnz, docs/SCALING.md).

The probe ships three 16 MB buffers and keeps the SLOWEST (pessimistic):
single measurements through the tunnel scatter >20x (CLAUDE.md) and are
bimodal — a lucky 16 MB put once measured 1.7 GB/s minutes before bulk
transfers crawled at tens of MB/s, which routed a production run onto the
device and cost 5x (the first 100 Mb/22x streaming run after the gates
went link-aware).  A genuinely fast link is fast on every probe; a flaky
one only has to be slow once to stay on the host, which is the safe side
of the trade.

The FIRST probe deliberately includes backend/connection setup (no
discarded warmup put): a link whose first operation takes seconds is not
a fast link for gating purposes — this tunnel's first put measured
2 MB/s minutes after sustained puts measured 1.1 GB/s, and a 1 KB put
once STALLED for >5 minutes.  Per-operation latency/jitter, which the
setup-inclusive probe captures, is what actually predicted the measured
5-60x device-path losses here; steady-state bandwidth alone did not.

The result is cached for the process.  Callers only probe when an
accelerator backend is live and a gate decision is actually pending, so
CPU runs and sub-gate inputs never pay it.
"""

from __future__ import annotations

import threading

_cached: float | None = None
_lock = threading.Lock()

PROBE_BYTES = 16 * 1024 * 1024


def h2d_bandwidth_mb_s() -> float:
    """Measured host->device bandwidth in MB/s (cached per process;
    pessimistic: the slowest of three probes).  Serialized under a lock —
    concurrent probes from a stage thread pool would contend on the link
    and record the contention as the bandwidth."""
    global _cached
    with _lock:
        if _cached is None:
            import time

            import jax
            import numpy as np

            worst = 0.0
            for seed in (0, 1, 2):
                buf = np.full(PROBE_BYTES, seed, dtype=np.uint8)
                t0 = time.perf_counter()
                jax.block_until_ready(jax.device_put(buf))
                worst = max(worst, time.perf_counter() - t0)
            _cached = PROBE_BYTES / 1e6 / max(worst, 1e-9)
        return _cached
