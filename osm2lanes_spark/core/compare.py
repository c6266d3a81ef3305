"""Golden-corpus comparison semantics.

Replicates the asymmetric ``EqExpected`` compare of the reference test
runner (`/root/reference/osm2lanes/src/test.rs:133-265`): expected-``None``
optional fields match any actual value; lane lists must have equal length;
marking lists are zip-compared (shorter expected list matches a longer
actual one); non-optional enums compare exactly.
"""

from __future__ import annotations

from typing import Optional


def _opt_eq(actual, expected, eq=None) -> bool:
    """Option<T> eq_exp (test.rs:137-145): expected None matches anything."""
    if expected is None:
        return True
    if actual is None:
        return False
    return eq(actual, expected) if eq else actual == expected


def _speed_eq(actual, expected) -> bool:
    """Speeds compare exactly (unit + value)."""
    return tuple(actual) == tuple(expected)


def _marking_eq(actual: dict, expected: dict) -> bool:
    return (actual.get("style") == expected.get("style")
            and _opt_eq(actual.get("color"), expected.get("color"))
            and _opt_eq(actual.get("width"), expected.get("width")))


def _markings_eq(actual: list, expected: list) -> bool:
    return all(_marking_eq(a, e) for a, e in zip(actual, expected))


def _access_eq(actual: dict, expected: dict) -> bool:
    """AccessByType compares exactly (test.rs:261-265)."""
    return actual == expected


def lane_eq_expected(actual: dict, expected: dict) -> bool:
    ta, te = actual.get("type"), expected.get("type")
    if ta != te:
        return False
    if ta == "separator":
        return (_opt_eq(actual.get("markings"), expected.get("markings"), _markings_eq)
                and _opt_eq(actual.get("semantic"), expected.get("semantic")))
    if ta == "travel":
        return (actual.get("designated") == expected.get("designated")
                and actual.get("direction") == expected.get("direction")
                and _opt_eq(actual.get("width"), expected.get("width"))
                and _opt_eq(actual.get("max_speed"), expected.get("max_speed"), _speed_eq)
                and _opt_eq(actual.get("access"), expected.get("access"), _access_eq))
    if ta == "parking":
        return (actual.get("designated") == expected.get("designated")
                and actual.get("direction") == expected.get("direction")
                and _opt_eq(actual.get("width"), expected.get("width")))
    if ta == "shoulder":
        return _opt_eq(actual.get("width"), expected.get("width"))
    return actual == expected


def road_eq_expected(actual_lanes: list, expected_lanes: list) -> bool:
    """Road eq_exp (test.rs:147-157): equal lane count + per-lane compare."""
    if len(actual_lanes) != len(expected_lanes):
        return False
    return all(lane_eq_expected(a, e) for a, e in zip(actual_lanes, expected_lanes))


def diff_road(actual_lanes: list, expected_lanes: list) -> Optional[str]:
    """Human-readable first mismatch, for pytest output."""
    if len(actual_lanes) != len(expected_lanes):
        return (f"lane count {len(actual_lanes)} != {len(expected_lanes)}\n"
                f"actual:   {[l.get('type') for l in actual_lanes]}\n"
                f"expected: {[l.get('type') for l in expected_lanes]}")
    for i, (a, e) in enumerate(zip(actual_lanes, expected_lanes)):
        if not lane_eq_expected(a, e):
            return f"lane[{i}]:\n  actual:   {a}\n  expected: {e}"
    return None
