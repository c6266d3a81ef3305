"""Measure per-core memory-bandwidth contention of wide vs narrow load.

Companion to clock_probe.py (which showed ~0.97 clock parity at 16 vs 4
busy cores, ruling out turbo asymmetry as the scaling-pair gap). The
flagship kernel is pandas/string-heavy — a bandwidth-bound profile — so
the relevant hardware question is how much per-core BANDWIDTH survives
when 4 cores grow to 16 on one socket. A fixed-work single-thread
streaming pass (numpy add over arrays far larger than LLC) is timed
while B neighbor processes run the same streaming loop; the slowdown
from B=3 to B=15 is the memory subsystem's wide-load penalty,
independent of Spark. Real N vs 4N executor CLUSTERS scale bandwidth
with node count — this box cannot, which is precisely the resource the
north rule's two-cluster-size criterion varies.

    engine_efficiency ≈ raw_pair_efficiency / bandwidth_ratio(16/4)

Usage: python BENCH/bandwidth_probe.py   (prints one JSON line)
"""

import json
import subprocess
import sys
import time

import numpy as np

MB = 160  # per-array; 2 arrays + result ≈ 480 MB streamed per pass
REPS = 6

NEIGHBOR = (
    "import numpy as np\n"
    f"a = np.ones({MB} * 131072); b = np.ones({MB} * 131072)\n"
    "while True:\n"
    "    c = a + b\n"
)


def read_stat():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[7]


def probe_once(a, b):
    t0 = time.perf_counter()
    c = a + b
    dt = time.perf_counter() - t0
    del c
    return dt


def condition(n_busy):
    a = np.ones(MB * 131072)
    b = np.ones(MB * 131072)
    spinners = [subprocess.Popen([sys.executable, "-c", NEIGHBOR])
                for _ in range(n_busy)]
    try:
        time.sleep(2.0)
        tot0, st0 = read_stat()
        best = min(probe_once(a, b) for _ in range(REPS))
        tot1, st1 = read_stat()
    finally:
        for s in spinners:
            s.kill()
        for s in spinners:
            s.wait()
    steal_pct = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
    gbps = (3 * MB / 1024.0) / best
    return best, steal_pct, gbps


def main():
    out = {"array_mb": MB, "reps": REPS}
    seq = [(3, "busy4_a"), (15, "busy16_a"), (15, "busy16_b"),
           (3, "busy4_b")]
    for n_busy, key in seq:
        t, steal, gbps = condition(n_busy)
        out[key] = {"sec": round(t, 4), "steal_pct": round(steal, 2),
                    "probe_gbps": round(gbps, 2)}
        time.sleep(2.0)
    t4 = min(out["busy4_a"]["sec"], out["busy4_b"]["sec"])
    t16 = min(out["busy16_a"]["sec"], out["busy16_b"]["sec"])
    out["bandwidth_ratio_16_over_4"] = round(t4 / t16, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
