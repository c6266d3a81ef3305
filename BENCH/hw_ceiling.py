import multiprocessing as mp
import sys
import time

from osm2lanes_spark.fixtures.golden import load_cases
from osm2lanes_spark.core.tags_to_lanes import tags_to_lanes
from osm2lanes_spark.core.locale import Locale

CASES = load_cases()
LOCS = [Locale.build(c['iso_3166_2'], c['driving_side']) for c in CASES]


def work(n_rounds: int) -> int:
    n = 0
    for _ in range(n_rounds):
        for c, l in zip(CASES, LOCS):
            tags_to_lanes(c['tags'], l)
            n += 1
    return n


def run(procs: int, rounds: int) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        total = sum(pool.map(work, [rounds] * procs))
        dt = time.perf_counter() - t0
    return total / dt


if __name__ == "__main__":
    for procs in (1, 4, 8, 16, 32):
        rate = run(procs, 60)
        print(f"procs={procs}: {rate:.0f} ways/s total, {rate/procs:.0f}/core", flush=True)
