"""Measure the host's per-core clock penalty of wide vs narrow load.

The scaling pair (bench.py --scaling) divides 16-core by 4-core
throughput; on this sandbox chip 4 active cores turbo higher than 16,
so the RAW ratio under-reports the ENGINE's scaling (real N vs 4N
executor *clusters* run at identical clocks). Spinner-pinning the
narrow leg over-corrects (spinners consume real CPU). This probe
measures the clock factor directly: a fixed-work single-thread loop is
timed while B other cores run busy loops — the probe's slowdown from
B=3 to B=15 is the hardware's wide-load clock penalty, independent of
Spark. Per-condition /proc/stat steal is recorded so a throttled
(rather than merely de-turboed) window is visible in the artifact.

    engine_efficiency = raw_pair_efficiency / clock_ratio(16-busy / 4-busy)

Usage: python BENCH/clock_probe.py   (prints one JSON line)
"""

import json
import subprocess
import sys
import time

ITERS = 2_000_000
REPS = 7


def read_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7]  # total ticks, steal ticks


def probe_once():
    x = 1.0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = x * 1.0000001 + 1e-9
    return time.perf_counter() - t0


def condition(n_busy):
    spinners = [subprocess.Popen(
        [sys.executable, "-c", "while True: pass"]) for _ in range(n_busy)]
    try:
        time.sleep(1.0)  # let the scheduler spread them
        best = min(probe_once() for _ in range(REPS))
        tot0, st0 = read_stat()
        mid = min(probe_once() for _ in range(REPS))
        tot1, st1 = read_stat()
        best = min(best, mid)
    finally:
        for s in spinners:
            s.kill()
        for s in spinners:
            s.wait()
    steal_pct = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
    return best, steal_pct


def main():
    out = {"iters": ITERS, "reps": REPS}
    # interleave narrow/wide twice so budget drift shows up as
    # disagreement between the two passes rather than silent bias
    seq = [(3, "busy4_a"), (15, "busy16_a"), (15, "busy16_b"),
           (3, "busy4_b")]
    for n_busy, key in seq:
        t, steal = condition(n_busy)
        out[key] = {"sec": round(t, 4), "steal_pct": round(steal, 2)}
        time.sleep(2.0)
    t4 = min(out["busy4_a"]["sec"], out["busy4_b"]["sec"])
    t16 = min(out["busy16_a"]["sec"], out["busy16_b"]["sec"])
    out["clock_ratio_16_over_4"] = round(t4 / t16, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
