"""Property-based invariants of the transform (hypothesis fuzzing).

No Rust binary is available to differential-test against, so these pin
engine invariants: the transform either raises a typed RoadError or
yields a well-formed road; serialization round-trips; the reverse
transform's output re-parses.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from osm2lanes_spark.core.locale import Locale
from osm2lanes_spark.core.model import RoadError
from osm2lanes_spark.core.serialize import road_json
from osm2lanes_spark.core.tags_to_lanes import tags_to_lanes

HIGHWAYS = ["motorway", "trunk", "primary", "residential", "service",
            "path", "steps", "cycleway", "unclassified", "road",
            "construction", "proposed", "nonsense"]
KEYS = ["highway", "lanes", "lanes:forward", "lanes:backward",
        "lanes:both_ways", "oneway", "junction", "busway", "busway:left",
        "busway:right", "busway:both", "oneway:bus", "cycleway",
        "cycleway:left", "cycleway:right", "cycleway:both",
        "cycleway:left:oneway", "cycleway:right:oneway", "oneway:bicycle",
        "sidewalk", "sidewalk:left", "sidewalk:right", "sidewalk:both",
        "shoulder", "parking:lane:left", "parking:lane:right",
        "parking:lane:both", "maxspeed", "construction", "proposed",
        "centre_turn_lane", "access", "bus", "psv", "bicycle",
        "bus:lanes", "psv:lanes", "lanes:bus:forward", "lanes:psv",
        "motorroad", "name", "ref", "lit", "surface",
        "parking:condition:both",
        # round-2 kernel extensions (positional lists + scheme mixes)
        "maxspeed:lanes", "maxspeed:lanes:forward", "maxspeed:lanes:backward",
        "cycleway:lanes", "cycleway:lanes:forward", "cycleway:lanes:backward",
        "access:lanes", "access:lanes:backward", "bus:lanes:backward",
        "lanes:bus:backward", "cycleway:left:lane"]
VALUES = ["yes", "no", "both", "left", "right", "lane", "track",
          "opposite", "opposite_lane", "opposite_track", "separate",
          "none", "designated", "1", "2", "3", "0", "-1", "30 mph",
          "50", "designated|", "|designated", "parallel", "roundabout",
          "no_stopping", "trunk", "shared_lane", "junk value", "",
          "no|lane|no", "lane|lane", "100|100|80", "a|b", "|", "||",
          "advisory", "yes|no|yes", "100||", "designated|no"]


@st.composite
def tag_maps(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    tags = {}
    for _ in range(n):
        tags[draw(st.sampled_from(KEYS))] = draw(st.sampled_from(VALUES))
    if draw(st.booleans()):
        tags["highway"] = draw(st.sampled_from(HIGHWAYS))
    return tags


@given(tags=tag_maps(),
       side=st.sampled_from(["left", "right"]),
       iso=st.sampled_from([None, "US-WA", "GB", "NL", "DE", "JP"]))
@settings(max_examples=400, deadline=None)
def test_transform_total(tags, side, iso):
    locale = Locale.build(iso, side)
    try:
        res = tags_to_lanes(tags, locale)
    except RoadError:
        return  # typed rejection is a valid outcome
    road = res["road"]
    assert road["lanes"], "a successful transform yields at least one lane"
    for lane in road["lanes"]:
        assert lane["type"] in ("travel", "parking", "shoulder", "separator")
        if lane["type"] == "travel":
            assert lane["designated"] in ("foot", "bicycle", "motor_vehicle", "bus")
            if lane["designated"] == "foot":
                assert "direction" not in lane
    # serde shape is JSON-serializable and stable
    j = json.dumps(road_json(road), sort_keys=True)
    assert json.loads(j)
    # deterministic: same input → same output
    res2 = tags_to_lanes(tags, locale)
    assert res2["road"] == road
    assert len(res2["warnings"]) == len(res["warnings"])


@given(tags=tag_maps(),
       side=st.sampled_from(["left", "right"]),
       iso=st.sampled_from([None, "US-WA", "GB", "NL"]))
@settings(max_examples=300, deadline=None)
def test_reverse_total_after_forward(tags, side, iso):
    """Forward∘reverse on arbitrary tag shapes: whenever the forward
    transform succeeds, the reverse transform either (a) round-trips
    strictly (check_roundtrip=True passes: re-parsing its tags
    reproduces the exact lane array), or (b) raises a typed
    LanesToTagsError — never a stray exception. This fuzzes the
    kernel pair far beyond the curated corpus."""
    from osm2lanes_spark.core.lanes_to_tags import (LanesToTagsError,
                                                    lanes_to_tags)

    locale = Locale.build(iso, side)
    try:
        res = tags_to_lanes(tags, locale)
    except RoadError:
        return
    road = {"highway": res["road"]["highway"],
            "lifecycle": res["road"]["lifecycle"],
            "lanes": res["road"]["lanes"]}
    try:
        out = lanes_to_tags(road, locale, check_roundtrip=True)
    except LanesToTagsError:
        return  # typed rejection (incl. roundtrip divergence) is valid
    assert isinstance(out, dict) and out.get("highway")
