"""Registry-vs-driver-artifact guard (VERDICT r05 #1).

Round 5 registered two queries (`sessions_scale`, `events_rollup`) that
never received a row in the driver's committed correctness artifact —
the README claimed "52 oracled" while CORRECTNESS_r05.json proved 50.
This test makes that drift loud: every `queries()` key must either
appear in the NEWEST committed `CORRECTNESS_r*.json` or be explicitly
declared below as added since that artifact was produced. The allowlist
is self-expiring — once a newer artifact covers an allowlisted query,
the test fails until the stale entry is removed.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import __spark_entry__ as E

REPO = Path(__file__).resolve().parents[1]

# Queries registered AFTER the newest committed CORRECTNESS artifact was
# generated (the driver gate runs after the round's commits, so the
# current round's additions are necessarily absent from the last
# artifact). Every entry MUST be deleted as soon as a gate file covers
# it — the staleness assert below enforces that.
ADDED_SINCE_LAST_GATE = {
    # r05 additions the r05 gate file predates (VERDICT r05 #1):
    "sessions_scale",
    "events_rollup",
    # r06 additions (gate runs after this round's commits):
    "token_quantiles_global",
    "line_dedup",
    "duplicate_spans",
    "strip_spans",
    "classifier_score",
    "classifier_score_trained",
    "budget_selection",
    "domain_cap",
    "kmeans_centroids",
    "unigram_ppl",
    "dsir_select",
    "ppl_buckets",
    "ann_pq",
    "semdedup",
    "gopher_rules",
    "rolling_stats",
    "bm25",
    "funnel",
    "retention",
    "bloom_contamination",
    "hll_users",
    "interval_overlap",
    "order_priority",
    "cms_tokens",
    "cust_order_dist",
    "weighted_docs",
    "scd2_status",
    "pagerank",
    "qsketch_chars",
    "dq_checks",
    "pivot_events",
    "nation_pairs",
    "cheapest_supplier",
    "vocab_coverage",
    "source_overlap",
    "fuzzy_names",
    "small_qty_revenue",
    "late_suppliers",
    "idle_rich",
    "mad_outliers",
    "jaccard_prefix",
    "cdc_merge",
    "cdc_compact",
    "price_histogram",
    "part_skyline",
    "events_gapfill",
    "balance_deciles",
    "supplier_reach",
    "value_quantiles_cont",
    "distance_pairs",
    "geohash_binning",
    "dbscan_clusters",
    "cluster_stats",
    "idw_events",
    "trajectories",
    "raster_focal",
    "sssp_costs",
    "triangles",
    "raster_peaks",
    "tile_pyramid",
    "revenue_cube",
    "market_share",
    "returned_revenue",
    "volume_customers",
    "brand_revenue_bands",
    "trips",
}


def _newest_gate():
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    assert arts, "no CORRECTNESS_r*.json artifact committed"
    with open(arts[-1]) as fh:
        return arts[-1].name, json.load(fh)


def test_every_registered_query_has_a_gate_row():
    name, gate = _newest_gate()
    registered = set(E.queries())
    missing = registered - set(gate) - ADDED_SINCE_LAST_GATE
    assert not missing, (
        f"queries registered but absent from {name} and not declared in "
        f"ADDED_SINCE_LAST_GATE: {sorted(missing)}")


def test_added_since_allowlist_is_not_stale():
    name, gate = _newest_gate()
    stale = ADDED_SINCE_LAST_GATE & set(gate)
    assert not stale, (
        f"{sorted(stale)} are covered by {name} — remove them from "
        "ADDED_SINCE_LAST_GATE")


def test_gate_rows_are_green_for_registered_queries():
    """A committed red row must fail the suite, not hide in the artifact."""
    name, gate = _newest_gate()
    registered = set(E.queries())
    oracled = set(E.oracle_sql())
    bad = {
        k: v for k, v in gate.items()
        if k in registered and (
            v.get("err") is not None
            or (k in oracled
                and not (v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match"))))
    }
    assert not bad, f"non-green rows in {name}: {sorted(bad)}"


def test_oracles_cover_registry():
    """Every oracle key must name a registered query (dangling oracles
    are dead weight the driver never exercises). Queries WITHOUT an
    oracle are legal (iterative ops get the rows-only driver check)
    but must declare it in their docstring."""
    import inspect

    dangling = set(E.oracle_sql()) - set(E.queries())
    assert not dangling, f"oracle_sql keys with no query: {sorted(dangling)}"
    for name, fn in E.queries().items():
        if name not in set(E.oracle_sql()):
            doc = inspect.getdoc(fn.__wrapped__
                                 if hasattr(fn, "__wrapped__") else fn) or ""
            assert "rows-only" in doc, (
                f"{name} has no oracle_sql entry and its docstring does "
                "not declare the rows-only check")
