"""Host->device link probe: bandwidth + per-operation latency, cached.

The auto-mode device gates trade a host pass against shipping data to the
accelerator, so the right size threshold depends on the LINK, not just the
kernel: this repo's tunneled chip moves ~0.2 GB/s host->device (where the
host sparse scorer wins to at least 4M combined nnz — docs/TPU_RUNS.md
round-4 multi-launch table), while a PCIe/ICI-attached chip moves
10-100 GB/s (where the device wins from ~1M nnz, docs/SCALING.md).

Two measured quantities, because they fail independently:

  bandwidth   three 16 MB puts, keep the SLOWEST (pessimistic): single
              measurements through the tunnel scatter >20x (CLAUDE.md) and
              are bimodal — a lucky 16 MB put once measured 1.7 GB/s
              minutes before bulk transfers crawled at tens of MB/s, which
              routed a production run onto the device and cost 5x.
  latency     three SMALL (64 KB) puts, keep the WORST: the per-operation
              floor.  A 64 KB put is bandwidth-negligible on any real
              link (<1 ms at 100 MB/s), so its wall time IS the
              per-operation cost — and per-operation latency/jitter, not
              steady-state bandwidth, is what actually predicted the
              measured 5-60x device-path losses here (a 1 KB put once
              STALLED >5 minutes while bulk bandwidth looked healthy).
              A fast-bandwidth/high-jitter link must NOT gate fast.

The FIRST probe deliberately includes backend/connection setup (no
discarded warmup put): a link whose first operation takes seconds is not a
fast link for gating purposes — this tunnel's first put measured 2 MB/s
minutes after sustained puts measured 1.1 GB/s.

A link classifies FAST iff worst-of-3 bandwidth >= FAST_MIN_MB_S (1 GB/s)
AND worst small-put < FAST_MAX_PUT_S (100 ms).

Why those thresholds — the crossover, derived (replaces the round-2/3
"inherited constants"; inputs cited from the measured tables):

  device cost for one batched stage call on N input units of b bytes:
      T_dev ~= k_ops * L + (N * b) / BW + T_kernel
  where k_ops ~= 6 (5 uploads + 1 readback in the sparse phasing batch),
  L = worst per-op latency, T_kernel ~= 0.1 s class on-chip
  (docs/TPU_RUNS.md round 3: 16.7M-obs score in 0.067 s).
  host cost: T_host ~= N / R_host, with the float64 sparse scorer at
  R_host ~= 2-5M nnz/s (docs/TPU_RUNS.md: ~1-2 s at 4M nnz).

  FAST class (PCIe/ICI: BW >= 1 GB/s, L <= 100 ms, b = 12 B/nnz):
      crossover N* ~= (k_ops*L + T_kernel) / (1/R_host - b/BW)
                   ~= (0.6 + 0.1) / (3e-7 - 1.2e-8)  ~= 2.4M  (L = 100 ms)
                   ~= (0.006 + 0.1) / 2.9e-7         ~= 0.4M  (L = 1 ms)
  The 1M-nnz fast gate sits inside that band; on a genuinely fast link
  (L ~ 1 ms) the device wins from a few hundred k nnz and the gate is
  conservative by design (bit-identical either way, so the cost of
  gating late is seconds, of gating early 5-60x).
  SLOW class (this tunnel: BW ~= 0.2 GB/s, L ~= 0.3-10 s observed):
      k_ops*L alone is 2-60 s — the host wins until N/R_host reaches
  that, i.e. N* ~= R_host * k_ops * L ~= 8M nnz at the optimistic end,
  matching the measured host wins <= 4M / wash ~13M.  Hence the 8M slow
  gate.  The sv-cluster gates follow the same arithmetic with its own
  measured per-process floor (~60 s executable load through the tunnel,
  docs/TPU_RUNS.md round-4 production run) -> 10M slow / 65k fast.

The result is cached for the process.  Callers only probe when an
accelerator backend is live and a gate decision is actually pending, so
CPU runs and sub-gate inputs never pay it.

Reference analogue: the -t/threads operating point the reference asks its
user to pick by hand (/root/reference/src/duet/utils.py:23) — here the
machine picks its own operating point from a measurement.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

_lock = threading.Lock()

PROBE_BYTES = 16 * 1024 * 1024
SMALL_PROBE_BYTES = 64 * 1024
FAST_MIN_MB_S = 1000.0
FAST_MAX_PUT_S = 0.1


@dataclass(frozen=True)
class LinkProfile:
    """One process's measured link character."""

    mb_s: float          # worst-of-3 16MB-put bandwidth (pessimistic)
    worst_put_s: float   # worst single small-put wall seconds
    put_s: tuple         # all probe wall times, big then small (diagnostics)

    def is_fast(self, min_mb_s: float = FAST_MIN_MB_S,
                max_put_s: float = FAST_MAX_PUT_S) -> bool:
        """Fast links must be fast on BOTH axes: sustained bandwidth AND
        per-operation latency (a high-jitter link loses on the per-call
        floor no matter what bulk puts measure)."""
        return self.mb_s >= min_mb_s and self.worst_put_s < max_put_s


_cached_profile: LinkProfile | None = None
# back-compat alias consumed by metrics blocks ("the gate's evidence");
# kept in sync with _cached_profile.mb_s
_cached: float | None = None


def probe_link() -> LinkProfile:
    """Measure (once per process) and cache the link profile.  Serialized
    under a lock — concurrent probes from a stage thread pool would
    contend on the link and record the contention as the bandwidth."""
    global _cached_profile, _cached
    with _lock:
        if _cached_profile is None:
            import time

            import jax
            import numpy as np

            times = []
            worst_big = 0.0
            for seed in (0, 1, 2):
                buf = np.full(PROBE_BYTES, seed, dtype=np.uint8)
                t0 = time.perf_counter()
                jax.block_until_ready(jax.device_put(buf))
                dt = time.perf_counter() - t0
                times.append(dt)
                worst_big = max(worst_big, dt)
            mb_s = PROBE_BYTES / 1e6 / max(worst_big, 1e-9)
            # latency probes only when bandwidth already passes the fast
            # bar: a slow-bandwidth link gates slow regardless, and a
            # small put through a flaky tunnel can STALL for minutes
            # (observed here) — don't hold the pipeline hostage to measure
            # a link that already failed.  The per-big-put floor stands in
            # as the (pessimistic) latency bound for the profile.
            if mb_s >= FAST_MIN_MB_S:
                worst_small = 0.0
                for seed in (3, 4, 5):
                    buf = np.full(SMALL_PROBE_BYTES, seed, dtype=np.uint8)
                    t0 = time.perf_counter()
                    jax.block_until_ready(jax.device_put(buf))
                    dt = time.perf_counter() - t0
                    times.append(dt)
                    worst_small = max(worst_small, dt)
                    if worst_small >= FAST_MAX_PUT_S:
                        # the gate is already decided (slow) — stop
                        # probing a link whose small puts can stall for
                        # minutes; one stall bounds the damage, three
                        # would triple it
                        break
            else:
                worst_small = worst_big
            _cached_profile = LinkProfile(
                mb_s=mb_s,
                worst_put_s=worst_small,
                put_s=tuple(round(t, 6) for t in times),
            )
            _cached = _cached_profile.mb_s
        return _cached_profile


def h2d_bandwidth_mb_s() -> float:
    """Measured host->device bandwidth in MB/s (pessimistic; see
    probe_link)."""
    return probe_link().mb_s


def is_fast_link() -> bool:
    """The gate predicate: bandwidth AND latency both pass (see module
    docstring for the derived thresholds)."""
    return probe_link().is_fast()
