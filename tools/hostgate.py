"""Host-interference gate shared by bench.py and tools/bench_scale_100x.py.

The bench host is shared: rounds 7-10 measured identical code drifting
up to 10x across hours (hypervisor contention), which forced prose
"window narratives" around committed numbers. This module makes the
distinction MECHANICAL: every sample carries fixed-work calibration
measurements taken immediately before and after it, plus the /proc/stat
steal counter read around the saturated spin, and the harness rejects
samples whose calibration deviates from the session's best by more than
the tolerance — a noisy HOST shows as the calibration slowing down,
while a noisy ROW shows spread under matching calibrations.

Two fixed workloads, both deterministic and COMPUTE-BOUND (the spin
array fits in L2, so the statistic measures CPU availability without
inheriting DRAM-bandwidth jitter):

- ``cal1``: single-core spin — 1600 in-place numpy sqrt passes over a
  100k float64 array, min-of-3 in-process (~0.3 s/pass). Measured
  idle-window spread ~4%; gated at ``TOL1`` = 15% (the VERDICT r10
  prescription — stable enough here to support it).
- ``cal32``: whole-host spin — one subprocess per CPU, each running
  12800 fixed passes (~2.5 s saturated; one INTEGRATED pass, like a
  real query experiences, not min-of-short-bursts). Under full 32-vCPU
  saturation this host's capacity fluctuates ~25-35% second-to-second
  even in otherwise-normal windows (measured this round: 4.8-6.3 s
  across 5 back-to-back passes, with 2-3% hypervisor steal accruing
  ONLY while saturated — steal is invisible at idle on this Firecracker
  host, so it must be read around a saturating spin, which cal32 is).
  Gated at ``TOL32`` = 40%: wide enough that normal saturation jitter
  passes, tight enough that the r10 failure mode (identical code 5-10x
  slower = calibration proportionally degraded) is rejected
  mechanically. The raw numbers ride with every sample, so the
  tolerance choice is auditable, not load-bearing prose.

``steal_pct_cal32``: steal jiffies accrued during the cal32 spin as a
percentage of its cpu-seconds — the direct hypervisor-contention
signal, recorded per measurement (corroborating evidence; the
calibration wall time already internalizes its effect).

Call :func:`warm` once per process before the first :func:`measure` —
the first spin pays one-time page-cache/import costs that would
otherwise read as a slow host.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

TOL1 = 0.15  # single-core calibration tolerance vs session best
TOL32 = 0.40  # whole-host calibration tolerance vs session best

_SPIN_SRC = (
    "import numpy as np\n"
    "a = np.arange(100_000, dtype=np.float64)\n"
    "for _ in range(12800):\n"
    "    np.sqrt(a * 1.0001 + 1.0, out=a)\n"
)


def read_steal() -> int:
    """Aggregate steal jiffies from /proc/stat (0 if unavailable)."""
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    parts = line.split()
                    return int(parts[8]) if len(parts) > 8 else 0
    except OSError:
        pass
    return 0


def _spin1_once() -> float:
    import numpy as np

    a = np.arange(100_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(1600):
        np.sqrt(a * 1.0001 + 1.0, out=a)
    return time.perf_counter() - t0


def spin1(k: int = 3) -> float:
    """Single-core calibration: min of k in-process fixed-work passes."""
    return round(min(_spin1_once() for _ in range(k)), 3)


def spin_all(ncpu: int | None = None) -> float:
    """Whole-host calibration: one integrated pass — one fixed-work
    subprocess per CPU, launched together (~2.5 s saturated)."""
    n = ncpu or os.cpu_count() or 32
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SPIN_SRC],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(n)
    ]
    for p in procs:
        p.wait()
    return round(time.perf_counter() - t0, 3)


def warm() -> None:
    """Throwaway spins so the first real measurement doesn't absorb
    one-time import/page-cache costs."""
    _spin1_once()
    # short saturating warm (1/4 work): touches the interpreter+numpy
    # images for all worker slots without a full-length pass
    n = os.cpu_count() or 32
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SPIN_SRC.replace("12800", "1600")],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(n)
    ]
    for p in procs:
        p.wait()


def measure() -> dict:
    """One gate measurement:
    {cal1_s, cal32_s, steal_pct_cal32, steal_jiffies, t}."""
    cal1 = spin1()
    s0 = read_steal()
    t0 = time.perf_counter()
    cal32 = spin_all()
    wall = time.perf_counter() - t0
    s1 = read_steal()
    ncpu = os.cpu_count() or 32
    return {
        "cal1_s": cal1,
        "cal32_s": cal32,
        "steal_pct_cal32": round(
            100.0 * ((s1 - s0) / 100.0) / max(wall * ncpu, 1e-3), 2
        ),
        "steal_jiffies": s1,
        "t": round(time.time(), 1),
    }


def _low_quantile(vals: list[float], q: float) -> float:
    """Value at the q-quantile from the FAST end: sorted()[floor(q*n)].
    Degenerates to min() for small n (floor(q*n) == 0 while n < 1/q),
    so few-measurement users (bench.py brackets one run with 2 gates)
    keep raw-min behavior."""
    vs = sorted(vals)
    return vs[min(int(q * len(vs)), len(vs) - 1)]


def best_cals(measurements: list[dict], q: float = 0.25) -> dict:
    """Session-baseline calibration: per-key lower QUANTILE (default
    P25) over all measurements, not the raw minimum. This host's
    capacity spikes ABOVE its sustained clean level in RECURRENT short
    turbo bursts (r12 live observation: preflight cal1 readings of
    0.214-0.23 s against a 0.24-0.26 s sustained-clean band, ~10-15%
    of the pool; cal32 once at 2.42 s against a 3.4-3.8 s band; r11's
    two 100%-rejected batches carried bests with the same signature).
    A raw-min baseline rejects every sustained-clean sample after one
    turbo reading; P10 still anchored on turbo once bursts exceeded a
    tenth of the pool. The P25 anchor lands in the sustained-clean
    cluster while remaining far from contended readings (+40-100%);
    the raw per-reading data always rides with the artifact, so the
    baseline choice stays auditable, and the independent spread_scaled
    <= 1.3 bar certifies the landed cells regardless of anchor."""
    return {
        "cal1_s": _low_quantile([m["cal1_s"] for m in measurements], q),
        "cal32_s": _low_quantile([m["cal32_s"] for m in measurements], q),
    }


def accept(
    sample_gates: list[dict],
    best: dict,
    tol1: float = TOL1,
    tol32: float = TOL32,
) -> bool:
    """True iff every calibration attached to one sample (typically
    [before, after]) is within its tolerance of the session best."""
    return all(
        g["cal1_s"] <= (1.0 + tol1) * best["cal1_s"]
        and g["cal32_s"] <= (1.0 + tol32) * best["cal32_s"]
        for g in sample_gates
    )


if __name__ == "__main__":
    warm()
    print(measure())
