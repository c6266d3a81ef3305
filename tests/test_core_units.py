"""Unit tests mirroring the reference's unit-test layer (SURVEY.md §5):
speed serde (metric.rs:302-383), Infer lattice (infer.rs:68-75 doctests),
cycleway scheme cases (cycleway.rs:517-763), lane-dependent access,
locale building (locale.rs:252-267)."""

from __future__ import annotations

import pytest

from osm2lanes_spark.core.infer import Infer, InferConflict
from osm2lanes_spark.core.locale import Locale
from osm2lanes_spark.core.model import (SpeedError, parse_speed, speed_class,
                                        speed_kph, speed_to_osm)
from osm2lanes_spark.core.schemes import (LaneAccessError,
                                          lane_dependent_access,
                                          parse_highway)
from osm2lanes_spark.core.tags_to_lanes import (Warnings, cycleway_scheme,
                                                oneway_from_tags)
from osm2lanes_spark.core.model import RoadError


# --- Speed (metric.rs) ------------------------------------------------------

def test_speed_parse():
    assert parse_speed("60") == ("kph", 60.0)
    assert parse_speed("30 mph") == ("mph", 30.0)
    assert parse_speed("5 knots") == ("knots", 5.0)
    for bad in ["", "abc", "30 kph", "400", "-5", "30 MPH"]:
        with pytest.raises(SpeedError):
            parse_speed(bad)


def test_speed_kph_and_serialize():
    assert speed_kph(("mph", 10.0)) == pytest.approx(16.0934)
    assert speed_to_osm(("kph", 60.0)) == "60"
    assert speed_to_osm(("mph", 30.0)) == "30 mph"
    assert speed_to_osm(("kph", 30.5)) == "30.5"


def test_speed_class():
    assert speed_class(("kph", 10.0)) == "walking"
    assert speed_class(("kph", 30.0)) == "living"
    assert speed_class(("kph", 50.0)) == "intra"
    assert speed_class(("kph", 80.0)) == "inter"
    assert speed_class(("kph", 120.0)) == "max"


# --- Infer lattice (infer.rs doctest) ---------------------------------------

def test_infer_set_doctest():
    i = Infer.default(0)
    i.set(Infer.direct(1))  # higher confidence replaces
    assert i.some() == 1
    with pytest.raises(InferConflict):
        i.set(Infer.direct(2))  # same confidence, different value
    i.set(Infer.default(3))  # lower confidence ignored
    assert i.some() == 1
    i.set(Infer.none())  # none ignored
    assert i.some() == 1


# --- Locale builder (locale.rs:252-267) --------------------------------------

def test_locale_build():
    locale = Locale.build("DE-NW", "right")
    assert locale.country == "DE" and locale.subdivision == "NW"
    assert Locale.build("GBR").country == "GB"
    assert Locale.build(None).driving_side == "right"
    assert Locale.build("GB").travel_width("motor_vehicle") == 3.0
    assert Locale.build("NL").travel_width("bus") == 3.35
    assert Locale.build("US").separator_motor_color() == "yellow"
    assert Locale.build("DE").separator_motor_color() == "white"
    assert Locale.build("GB").separator_motor_width() == 0.1


# --- Highway lifecycle (highway.rs:230-248) ----------------------------------

def test_highway_lifecycle():
    assert parse_highway({"highway": "trunk"}) == {
        "highway": "trunk", "lifecycle": "active"}
    assert parse_highway({"highway": "construction", "construction": "motorway"}) == {
        "highway": "motorway", "lifecycle": "construction"}
    # the reference maps proposed→construction lifecycle (highway.rs:246)
    assert parse_highway({"highway": "proposed", "proposed": "trunk"}) == {
        "highway": "trunk", "lifecycle": "construction"}
    assert parse_highway({}) is None


# --- Oneway (oneway.rs) ------------------------------------------------------

def test_oneway():
    w = Warnings()
    assert oneway_from_tags({"oneway": "yes"}, w) is True
    assert oneway_from_tags({"junction": "roundabout"}, w) is True
    assert oneway_from_tags({}, w) is False
    with pytest.raises(RoadError):
        oneway_from_tags({"oneway": "no", "junction": "roundabout"}, w)
    with pytest.raises(RoadError):
        oneway_from_tags({"oneway": "-1"}, w)


# --- Cycleway scheme (cycleway.rs:517-763 test cases) ------------------------

def _scheme(tags, oneway=False, side="right"):
    w = Warnings()
    s = cycleway_scheme(tags, Locale.build(None, side), oneway, w)
    return s, w


def test_cycleway_lane():
    s, w = _scheme({"cycleway": "lane"})
    assert not w.items
    assert s[0] == "both"
    assert s[1].variant == "lane" and s[1].direction == "forward"
    assert s[2].variant == "lane" and s[2].direction == "backward"


def test_cycleway_oneway_opposite_track():
    s, _ = _scheme({"cycleway": "opposite_track"}, oneway=True)
    assert s[0] == "backward"
    assert s[1].variant == "track" and s[1].direction == "backward"


def test_cycleway_forward_lane():
    s, w = _scheme({"cycleway:right": "lane"})
    assert not w.items
    assert s[0] == "forward" and s[1].variant == "lane"
    assert s[1].direction == "forward"


def test_cycleway_backward_track():
    s, w = _scheme({"cycleway:left": "track"})
    assert not w.items
    assert s[0] == "backward" and s[1].variant == "track"
    assert s[1].direction == "backward"


def test_cycleway_backward_lane_min1():
    s, w = _scheme({"cycleway:left": "track", "cycleway:left:oneway": "-1"})
    assert not w.items
    assert s[0] == "backward" and s[1].direction == "backward"


def test_cycleway_opposite():
    s, w = _scheme({"cycleway": "opposite"}, oneway=True)
    assert not w.items
    assert s[0] == "backward" and s[1].variant == "shared_motor"
    assert s[1].direction == "backward"


def test_cycleway_opposite_twoway_errors():
    with pytest.raises(RoadError):
        _scheme({"cycleway": "opposite"}, oneway=False)


def test_cycleway_warn_shoulder():
    _, w = _scheme({"cycleway": "shoulder"})
    assert w.items


def test_cycleway_warn_no_lane_conflict():
    _, w = _scheme({"cycleway": "no", "cycleway:left": "lane"})
    assert len(w.items) == 1


def test_cycleway_err_lane_track_conflict():
    _, w = _scheme({"cycleway:both": "lane", "cycleway:right": "track"})
    assert len(w.items) == 1


# --- Lane-dependent access (access_by_lane.rs) --------------------------------

def test_lane_dependent_access():
    assert lane_dependent_access({"bus:lanes": "|designated|"}, "bus:lanes") == \
        ("ltr", ["", "designated", ""])
    assert lane_dependent_access(
        {"bus:lanes:forward": "designated|"}, "bus:lanes") == \
        ("forward", ["designated", ""])
    kind, (f, b) = lane_dependent_access(
        {"bus:lanes:forward": "designated|", "bus:lanes:backward": ""},
        "bus:lanes")
    assert kind == "fb" and f == ["designated", ""] and b == [""]
    with pytest.raises(LaneAccessError):
        lane_dependent_access({"bus:lanes": "designated|unknown_value"}, "bus:lanes")
    with pytest.raises(LaneAccessError):
        lane_dependent_access(
            {"bus:lanes": "designated|", "bus:lanes:forward": "|designated"},
            "bus:lanes")


# --- Interior-bike positional roundtrip (lanes_to_tags.py:_set_cycleway) ----

@pytest.mark.parametrize("side,iso", [("left", "GB"), ("right", "US")])
@pytest.mark.parametrize("case", ["forward", "backward"])
def test_interior_bike_positional_roundtrip(side, iso, case):
    """The cycleway:lanes:<dir> emitter must match the consumer's zip
    order: forward lists are road-ltr, backward lists reversed road-ltr,
    in BOTH locales (ADVICE r02 #1 — the old driving-side term inverted
    LHT output, misplacing the interior bike lane)."""
    from osm2lanes_spark.core.lanes_to_tags import lanes_to_tags
    from osm2lanes_spark.core.tags_to_lanes import tags_to_lanes

    loc = Locale.build(iso_3166=iso, driving_side=side)
    if case == "forward":
        tags = {"highway": "residential", "oneway": "yes", "lanes": "3",
                "cycleway:lanes:forward": "no|lane|no|no"}
    else:
        tags = {"highway": "residential", "lanes": "4", "lanes:forward": "2",
                "lanes:backward": "2", "cycleway:lanes:backward": "no|lane|no"}
    res = tags_to_lanes(tags, loc, include_separators=False)
    out = lanes_to_tags(res["road"], loc, check_roundtrip=False)
    key = f"cycleway:lanes:{case}"
    assert out[key] == tags[key]
    res2 = tags_to_lanes(out, loc, include_separators=False)
    assert res2["road"]["lanes"] == res["road"]["lanes"]
