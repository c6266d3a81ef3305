"""Serde-shape JSON serialization of roads/lanes.

Byte-compatible with the reference's serde output:
- lane variants flatten with a ``type`` discriminator, snake_case, and
  None fields omitted (road/lane.rs:8-40);
- Speed is asymmetric: kph → bare number, mph/knots →
  ``{"unit": ..., "value": ...}`` (metric.rs:181-201);
- Road flattens Highway: ``highway`` + ``lifecycle`` (omitted when
  active) (osm-tag-schemes/highway.rs:152-166, road/mod.rs:14-31).
"""

from __future__ import annotations

from typing import Optional


def speed_json(speed: Optional[tuple]):
    if speed is None:
        return None
    unit, value = speed
    if unit == "kph":
        return value
    return {"unit": unit, "value": value}


def lane_json(lane: dict) -> dict:
    """Internal lane dict → serde-shaped JSON object (ordered keys)."""
    t = lane["type"]
    out: dict = {"type": t}
    if t == "travel":
        for k in ("direction", "designated", "width"):
            if lane.get(k) is not None:
                out[k] = lane[k]
        if lane.get("max_speed") is not None:
            out["max_speed"] = speed_json(lane["max_speed"])
        if lane.get("access") is not None:
            out["access"] = lane["access"]
    elif t == "parking":
        out["direction"] = lane["direction"]
        out["designated"] = lane["designated"]
        if lane.get("width") is not None:
            out["width"] = lane["width"]
    elif t == "shoulder":
        if lane.get("width") is not None:
            out["width"] = lane["width"]
    else:  # separator
        if lane.get("semantic") is not None:
            out["semantic"] = lane["semantic"]
        if lane.get("markings") is not None:
            out["markings"] = [
                {k: m[k] for k in ("style", "width", "color") if k in m}
                for m in lane["markings"]
            ]
    return out


def road_json(road: dict) -> dict:
    """Road dict (from tags_to_lanes) → serde-shaped JSON object."""
    out: dict = {}
    if road.get("name") is not None:
        out["name"] = road["name"]
    if road.get("ref") is not None:
        out["ref"] = road["ref"]
    out["highway"] = road["highway"]
    if road.get("lifecycle") not in (None, "active"):
        out["lifecycle"] = road["lifecycle"]
    for k in ("lit", "tracktype", "smoothness"):
        if road.get(k) is not None:
            out[k] = road[k]
    out["lanes"] = [lane_json(l) for l in road["lanes"]]
    return out
