"""Unit tests for operators/temporal.py (as-of join + sessionization).

Scenario tests on tiny frames where the expected matches are hand-
checkable; the sf0.01 parity vs DuckDB's native ASOF JOIN runs through
the driver contract (queries ``asof_latest_view`` / ``sessions`` /
``events_rollup``).
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from osm2lanes_spark.operators.temporal import asof_join, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c"),
         (3, _ts(30), "d")],
        "k int, ts timestamp, l string")
    right = spark.createDataFrame(
        [(1, _ts(8), 100), (1, _ts(10), 150), (1, _ts(25), 200),
         (2, _ts(7), 300)],
        "k int, ts timestamp, v int")
    return left, right


def test_backward_basic(spark, frames):
    left, right = frames
    out = {(r.k, r.l): r.v
           for r in asof_join(left, right, on="k").collect()}
    # ties match (l.ts >= r.ts): the 00:10 left row takes the 00:10 right
    assert out == {(1, "a"): 150, (1, "b"): 150, (2, "c"): None,
                   (3, "d"): None}


def test_forward_basic(spark, frames):
    left, right = frames
    out = {(r.k, r.l): r.v
           for r in asof_join(left, right, on="k",
                              direction="forward").collect()}
    assert out == {(1, "a"): 150, (1, "b"): 200, (2, "c"): 300,
                   (3, "d"): None}


def test_tolerance_nulls_far_matches(spark, frames):
    left, right = frames
    out = {(r.k, r.l): (r.v, r.asof_ts)
           for r in asof_join(left, right, on="k",
                              tolerance_seconds=120).collect()}
    # "b" at 00:20 only has the 00:10 right (600 s away) → nulled
    assert out[(1, "a")] == (150, _ts(10))
    assert out[(1, "b")] == (None, None)
    assert out[(2, "c")] == (None, None)


def test_tiebreak_greatest_wins(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 7, "lo"), (1, _ts(10), 9, "hi"), (1, _ts(10), 8, "mid")],
        "k int, ts timestamp, pri int, tag string")
    row = asof_join(left, right, on="k", tiebreak="pri").collect()[0]
    assert (row.pri, row.tag) == (9, "hi")
    fwd = asof_join(left, right, on="k", direction="forward",
                    tiebreak="pri").collect()[0]
    assert (fwd.pri, fwd.tag) == (9, "hi")


def test_payload_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "l"), on="k")


def test_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="nearest")


def test_asof_single_shuffle_plan(spark, frames):
    """The union-window formulation must cost ONE data exchange (hash on
    the key) — no range-join blowup, no join-back shuffle."""
    left, right = frames
    plan = (asof_join(left, right, on="k")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bucketed_carry_across_empty_buckets(spark, frames):
    """bucket_seconds=60 puts every fixture row in its own minute
    bucket; the (1, 00:20) left row's match lives 10 empty buckets back
    and must arrive via the carry sentinel."""
    left, right = frames
    out = {(r.k, r.l): r.v
           for r in asof_join(left, right, on="k",
                              bucket_seconds=60).collect()}
    assert out == {(1, "a"): 150, (1, "b"): 150, (2, "c"): None,
                   (3, "d"): None}
    fwd = {(r.k, r.l): r.v
           for r in asof_join(left, right, on="k", direction="forward",
                              bucket_seconds=60).collect()}
    assert fwd == {(1, "a"): 150, (1, "b"): 200, (2, "c"): 300,
                   (3, "d"): None}


def test_bucketed_equals_plain_randomized(spark):
    """The skew-safe path must be OUTPUT-IDENTICAL to the plain path:
    400x300 random rows with a hot key, duplicate timestamps (tiebreak
    resolves), both directions, with and without tolerance."""
    import random

    rnd = random.Random(42)
    lrows = [(rnd.choice([1, 1, 1, 1, 2, 3]),
              _ts(rnd.randrange(60), rnd.randrange(60)), f"l{i}")
             for i in range(400)]
    rrows = [(rnd.choice([1, 1, 1, 2, 4]),
              _ts(rnd.randrange(60), rnd.randrange(60)), i)
             for i in range(300)]
    left = spark.createDataFrame(lrows, "k int, ts timestamp, l string")
    right = spark.createDataFrame(rrows, "k int, ts timestamp, v int")
    for direction in ("backward", "forward"):
        for tol in (None, 180):
            kw = dict(on="k", direction=direction,
                      tolerance_seconds=tol, tiebreak="v")
            plain = asof_join(left, right, **kw).collect()
            buck = asof_join(left, right, bucket_seconds=120,
                             **kw).collect()
            canon = lambda rows: sorted(
                (r.k, r.ts, r.l, r.v, r.asof_ts) for r in rows)
            assert canon(plain) == canon(buck), (direction, tol)


def test_bucketed_window_partitions_by_bucket(spark, frames):
    """The point of bucketing: the main window's partition spec includes
    the bucket, so a hot key cannot serialize onto one task."""
    left, right = frames
    plan = (asof_join(left, right, on="k", bucket_seconds=60)
            ._jdf.queryExecution().executedPlan().toString())
    assert "__bkt" in plan  # bucket participates in the partitioning


def test_sessionize_gap_strict(spark):
    # gap == threshold does NOT break the session (strictly greater does)
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(20, 1)), (2, _ts(0))],
        "k int, ts timestamp")
    out = {(r.k, r.ts.minute): r.session_id
           for r in sessionize(df, key="k", ts="ts",
                               gap_seconds=600).collect()}
    assert out == {(1, 0): 1, (1, 10): 1, (1, 20): 2, (2, 0): 1}


def test_sessionize_scale_safe_boundary_rows(spark):
    """Events 10 min apart, gap 600 s (ties stay), forced through 5 tiny
    range partitions: partition-boundary rows must NOT open sessions."""
    df = spark.createDataFrame(
        [(1, _ts(10 * i)) for i in range(6)] + [(2, _ts(0)), (2, _ts(59))],
        "k int, ts timestamp")
    out = {(r.k, r.ts.minute): r.session_id
           for r in sessionize(df, key="k", ts="ts", gap_seconds=600,
                               scale_safe=True, num_partitions=5).collect()}
    assert out == {(1, 0): 1, (1, 10): 1, (1, 20): 1, (1, 30): 1,
                   (1, 40): 1, (1, 50): 1, (2, 0): 1, (2, 59): 2}


def test_sessionize_scale_safe_equals_plain_randomized(spark):
    """scale_safe=True must be output-identical to the windowed path:
    500 random events, one hot key, duplicate timestamps (tiebreak),
    many partition boundaries."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.choice([1, 1, 1, 1, 2, 3]),
             _ts(rnd.randrange(60), rnd.choice([0, 30])), i)
            for i in range(500)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, i int")
    kw = dict(key="k", ts="ts", gap_seconds=240, tiebreak="i")
    plain = {(r.k, r.i): r.session_id
             for r in sessionize(df, **kw).collect()}
    safe = {(r.k, r.i): r.session_id
            for r in sessionize(df, scale_safe=True, num_partitions=11,
                                **kw).collect()}
    assert plain == safe


def test_sessionize_scale_safe_checkpoints_slim_projection(spark):
    """VERDICT r05 #2: the range-partitioned pass must checkpoint ONLY
    the (key, ts, tiebreak) projection — on a wide 100 TB events table a
    full-width localCheckpoint persists a copy of the relation. Payload
    columns may appear in the plan only on the original scan side of the
    final join-back, never inside a checkpointed ExistingRDD scan."""
    rows = [(1, _ts(i % 60), i, "x" * 20, float(i)) for i in range(40)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, i int, wide_payload string, val double")
    out = sessionize(df, key="k", ts="ts", gap_seconds=600, tiebreak="i",
                     scale_safe=True, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the checkpointed ranged relation is the __pid-stamped ExistingRDD
    # (the local-rows input also scans as ExistingRDD — that one is the
    # untouched join-back side and legitimately carries the payload)
    ckpt = [ln for ln in plan.splitlines()
            if "Scan ExistingRDD" in ln and "__pid" in ln]
    assert ckpt, plan  # the checkpoint must exist (pid pinning)
    for ln in ckpt:
        assert "wide_payload" not in ln and "val#" not in ln, ln
    # and the result still carries the payload + correct sessions
    got = out.orderBy("i").collect()
    assert len(got) == 40 and all(r.wide_payload == "x" * 20 for r in got)


def test_sessionize_scale_safe_duplicate_sort_keys(spark):
    """Exact duplicate (key, ts, tiebreak) rows share a session and must
    come back with their original multiplicity — the slim distinct +
    join-back must not multiply or drop rows."""
    df = spark.createDataFrame(
        [(1, _ts(0), 7, "a"), (1, _ts(0), 7, "b"), (1, _ts(30), 8, "c"),
         (None, _ts(5), 9, "d"), (None, _ts(5), 9, "e")],
        "k int, ts timestamp, i int, payload string")
    kw = dict(key="k", ts="ts", gap_seconds=600, tiebreak="i")
    plain = sessionize(df, **kw).collect()
    safe = sessionize(df, scale_safe=True, num_partitions=3, **kw).collect()
    assert len(safe) == len(plain) == 5
    key = lambda r: (r.k, r.i, r.payload)  # noqa: E731
    assert ({key(r): r.session_id for r in safe}
            == {key(r): r.session_id for r in plain})


def test_sessionize_auto_picks_plain_below_crossover(spark):
    """auto + default 1M crossover on a tiny input → plain path: no
    checkpointed range stage in the plan, output identical."""
    df = spark.createDataFrame(
        [(1, _ts(10 * i), i) for i in range(6)],
        "k int, ts timestamp, i int")
    out = sessionize(df, key="k", ts="ts", gap_seconds=600, tiebreak="i",
                     scale_safe="auto", auto_probe_fraction=1.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__pid" not in plan, plan
    assert ({(r.i, r.session_id) for r in out.collect()}
            == {(r.i, r.session_id)
                for r in sessionize(df, key="k", ts="ts", gap_seconds=600,
                                    tiebreak="i").collect()})


def test_sessionize_auto_picks_distributed_above_crossover(spark):
    """auto + a lowered crossover on a hot-keyed input → distributed
    path (checkpointed __pid stage present), output identical."""
    df = spark.createDataFrame(
        [(1, _ts(i % 60, i % 45), i) for i in range(50)],
        "k int, ts timestamp, i int")
    kw = dict(key="k", ts="ts", gap_seconds=240, tiebreak="i")
    out = sessionize(df, scale_safe="auto", auto_probe_fraction=1.0,
                     auto_threshold_rows=10, **kw)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan, plan
    assert ({(r.i, r.session_id) for r in out.collect()}
            == {(r.i, r.session_id) for r in sessionize(df, **kw).collect()})


def test_sessionize_auto_bad_string_raises(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k int, ts timestamp")
    with pytest.raises(ValueError, match="auto"):
        sessionize(df, key="k", ts="ts", scale_safe="yes")


def test_asof_auto_bucket_both_sides_of_crossover(spark, frames):
    """bucket_seconds='auto': tiny input under the default crossover →
    unbucketed plan (no __bkt); lowered crossover → bucketed plan; both
    match the plain output."""
    left, right = frames
    plain = {(r.k, r.l): r.v
             for r in asof_join(left, right, on="k").collect()}
    below = asof_join(left, right, on="k", bucket_seconds="auto",
                      auto_probe_fraction=1.0)
    assert "__bkt" not in below._jdf.queryExecution().executedPlan().toString()
    assert {(r.k, r.l): r.v for r in below.collect()} == plain
    above = asof_join(left, right, on="k", bucket_seconds="auto",
                      auto_probe_fraction=1.0, auto_threshold_rows=2)
    assert "__bkt" in above._jdf.queryExecution().executedPlan().toString()
    assert {(r.k, r.l): r.v for r in above.collect()} == plain


def test_asof_auto_bad_string_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="auto"):
        asof_join(left, right, on="k", bucket_seconds="hourly")


def test_sessionize_types(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k int, ts timestamp")
    out = sessionize(df, key="k", ts="ts")
    assert dict(out.dtypes)["session_id"] == "bigint"


def test_rolling_stats_range_frame(spark):
    """Trailing range window: inclusive cutoff at exactly window_seconds,
    timestamp peers aggregate together (RANGE, not ROWS)."""
    from osm2lanes_spark.operators.temporal import rolling_stats

    h1 = dt.datetime(2024, 1, 1, 1, 0, 0)  # exactly +1h from _ts(0)
    rows = [(1, 1, _ts(0), 1.0),
            (2, 1, _ts(30), 2.0),  # 30 min later: in 1h window of #3
            (3, 1, h1, 4.0),       # exactly 60 min after #1: inclusive
            (4, 1, h1, 8.0),       # peer of #3: same frame both ways
            (5, 2, _ts(0), 16.0)]  # other key untouched
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts timestamp, value double")
    out = {r["event_id"]: (r["n_win"], r["sum_win"])
           for r in rolling_stats(df, window_seconds=3600).collect()}
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (4, 15.0)  # includes #1 (exactly -1h) and peer #4
    assert out[4] == (4, 15.0)  # peers share the frame
    assert out[5] == (1, 16.0)


def test_window_funnel_semantics(spark):
    """Greedy earliest-chain: order matters, horizon cuts, the depth is
    the longest in-horizon PREFIX, keys without step 1 report 0."""
    from osm2lanes_spark.operators.temporal import window_funnel

    rows = [
        # u1: full chain within horizon
        (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "purchase", _ts(2)),
        # u2: click BEFORE view never matches -> depth 1
        (2, "click", _ts(0)), (2, "view", _ts(1)),
        # u3: purchase outside the 600s horizon -> depth 2
        (3, "view", _ts(0)), (3, "click", _ts(0, 30)),
        (3, "purchase", _ts(20)),
        # u4: purchase without click -> depth 1 (prefix rule)
        (4, "view", _ts(0)), (4, "purchase", _ts(1)),
        # u5: only unrelated events -> depth 0, null t_first
        (5, "error", _ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp")
    out = {r["user_id"]: (r["funnel_depth"], r["t_first"] is not None)
           for r in window_funnel(df, ["view", "click", "purchase"],
                                  horizon_seconds=600).collect()}
    assert out == {1: (3, True), 2: (1, True), 3: (2, True),
                   4: (1, True), 5: (0, False)}
    with pytest.raises(ValueError):
        window_funnel(df, [])


def test_retention_cohorts_triangle(spark):
    from osm2lanes_spark.operators.temporal import retention_cohorts

    day = 86400
    base = dt.datetime(2024, 1, 4)  # bucket boundaries are epoch-aligned
    rows = [(1, base), (1, base + dt.timedelta(days=7)),   # wk0 + wk1
            (1, base + dt.timedelta(days=7)),              # same wk: once
            (2, base),                                     # wk0 only
            (3, base + dt.timedelta(days=7))]              # later cohort
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {(r["cohort"], r["offset"]): r["n_active"]
           for r in retention_cohorts(df, bucket_seconds=7 * day).collect()}
    cohorts = sorted({c for c, _ in out})
    c0, c1 = cohorts[0], cohorts[-1]
    assert out[(c0, 0)] == 2          # u1, u2 in week 0
    assert out[(c0, 1)] == 1          # only u1 returns
    assert out[(c1, 0)] == 1          # u3's own cohort


def test_interval_join_bucketed_equals_plain(spark):
    """Property: the bucketed equi-join decomposition emits exactly the
    plain overlap predicate's pairs — no duplicates from multi-cell
    overlaps (canonical-cell dedup), no losses — across bucket widths
    smaller, comparable and larger than the interval lengths."""
    import random

    from osm2lanes_spark.operators.temporal import interval_join

    random.seed(11)
    L = [(i, i % 4, s := random.randint(0, 2000), s + random.randint(0, 200))
         for i in range(300)]
    R = [(j + 10_000, j % 4, s := random.randint(0, 2000),
          s + random.randint(0, 120)) for j in range(200)]
    l = spark.createDataFrame(L, "lid long, k long, s long, e long")
    r = spark.createDataFrame(R, "rid long, k long, s long, e long")
    want = sorted((li, rj) for (li, lk, ls, le) in L
                  for (rj, rk, rs, re) in R
                  if lk == rk and ls <= re and rs <= le)
    plain = sorted(map(tuple, interval_join(l, r, "s", "e", "s", "e",
                                            by=["k"])
                       .select("lid", "rid").collect()))
    assert plain == want
    for w in (16, 128, 4096):
        got = sorted(map(tuple, interval_join(l, r, "s", "e", "s", "e",
                                              by=["k"], bucket=w)
                         .select("lid", "rid").collect()))
        assert got == want, f"bucket={w}"


def test_interval_join_edges(spark):
    """Touching endpoints match (closed intervals); NULL and inverted
    intervals are dropped; colliding right column names get the
    suffix; no-key global join works."""
    from osm2lanes_spark.operators.temporal import interval_join

    l = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30), (3, None, 5), (4, 9, 7)],
        "lid long, s long, e long")
    r = spark.createDataFrame(
        [(7, 10, 15), (8, 31, 40), (9, 5, None)],
        "rid long, s long, e long")
    out = interval_join(l, r, "s", "e", "s", "e")
    assert out.columns == ["lid", "s", "e", "rid", "s_r", "e_r"]
    pairs = sorted((row["lid"], row["rid"]) for row in out.collect())
    assert pairs == [(1, 7)]          # touch at 10; NULLs/inverted gone
    buck = interval_join(l, r, "s", "e", "s", "e", bucket=4)
    assert sorted((row["lid"], row["rid"]) for row in buck.collect()) \
        == [(1, 7)]


def test_scd2_build_semantics(spark):
    """Hand-checkable change log: consecutive identical states merge,
    NULL attr values compare NULL-safe, same-ts changes order by the
    tiebreak, the last run is open (is_current)."""
    from osm2lanes_spark.operators.temporal import scd2_build

    rows = [
        (1, 100, "a", 1),
        (1, 200, "a", 2),     # same state: merges into the first run
        (1, 300, "b", 3),
        (1, 300, "c", 4),     # same ts as the 'b' row: tiebreak orders
        (1, 400, None, 5),
        (1, 500, None, 6),    # NULL == NULL (null-safe): merges
        (2, 100, "x", 7),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, s string, tb long")
    out = scd2_build(df, key="k", ts="ts", attrs=["s"], tiebreak="tb")
    got = set(map(tuple, out.select(
        "k", "s", "valid_from_us", "valid_to_us", "is_current")
        .collect()))
    assert got == {
        (1, "a", 100, 300, False),
        (1, "b", 300, 300, False),    # closed by the same-ts 'c' change
        (1, "c", 300, 400, False),
        (1, None, 400, None, True),
        (2, "x", 100, None, True),
    }


def test_scd2_point_in_time_via_asof(spark):
    """Synergy: an as-of join against valid_from_us reproduces the
    state each interval claims — half-open [from, to) semantics."""
    from osm2lanes_spark.operators.temporal import asof_join, scd2_build

    rows = [(1, 100, "a", 1), (1, 300, "b", 2), (1, 500, "c", 3)]
    df = spark.createDataFrame(rows, "k long, ts long, s string, tb long")
    hist = scd2_build(df, key="k", ts="ts", attrs=["s"], tiebreak="tb")
    probes = spark.createDataFrame(
        [(1, 100), (1, 299), (1, 300), (1, 9999)], "k long, ts long")
    got = {r["ts"]: r["s"] for r in asof_join(
        probes, hist.select("k", F.col("valid_from_us").alias("ts"), "s"),
        on="k", ts="ts").collect()}
    assert got == {100: "a", 299: "a", 300: "b", 9999: "c"}


def test_densify_counts_zero_fill_and_bounds(spark):
    from datetime import datetime

    from osm2lanes_spark.operators.temporal import densify_counts

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 5), "a"),
         (datetime(2024, 1, 1, 0, 55), "a"),
         (datetime(2024, 1, 1, 3, 10), "b"),
         (None, "a")],
        "ts timestamp_ntz, k string")
    got = {(r.bucket_ts.hour, r.k): r.n
           for r in densify_counts(df, "ts", by_col="k").collect()}
    # observed range hours 0..3 x keys {a, b} = 8 cells, gaps at 0
    assert len(got) == 8
    assert got[(0, "a")] == 2 and got[(3, "b")] == 1
    assert got[(1, "a")] == 0 and got[(2, "b")] == 0
    # global flavor (no key): 4 cells
    g = {r.bucket_ts.hour: r.n
         for r in densify_counts(df, "ts").collect()}
    assert g == {0: 2, 1: 0, 2: 0, 3: 1}
    with pytest.raises(ValueError, match="bucket_seconds"):
        densify_counts(df, "ts", bucket_seconds=0)
