"""The reverse transform: lane array → OSM tag map.

Mirrors `/root/reference/osm2lanes/src/transform/lanes_to_tags/mod.rs:139-526`
— an aggregation pipeline over the lane array (counts, oneway detection,
shoulder/sidewalk/parking/cycleway/busway emission, max-speed consensus,
locale additions) with an optional forward-roundtrip check.
"""

from __future__ import annotations

from typing import Optional

from .locale import Locale, opposite_side
from .model import (BACKWARD, BOTH, FORWARD, MOTOR, RED, format_float,
                    is_bicycle, is_bus, is_foot, is_motor, is_separator,
                    is_shoulder, speed_to_osm)


class LanesToTagsError(Exception):
    def __init__(self, kind: str, detail: str = ""):
        super().__init__(f"{kind}: {detail}" if detail else kind)
        self.kind = kind


def _checked_insert(tags: dict, k: str, v: str) -> None:
    """osm-tags checked_insert (lib.rs:227-239): duplicate keys error."""
    if k in tags:
        raise LanesToTagsError("duplicate_key", k)
    tags[k] = v


def _direction(lane: dict) -> Optional[str]:
    return lane.get("direction") if lane.get("type") == "travel" else None


def lanes_to_tags(road: dict, locale: Locale, check_roundtrip: bool = True) -> dict[str, str]:
    """Convert a road dict (as produced by tags_to_lanes) back to tags."""
    lanes: list[dict] = road["lanes"]
    tags: dict[str, str] = {}

    if not any(is_motor(l) or is_bus(l) for l in lanes):
        _checked_insert(tags, "highway", "path")
        return tags

    _checked_insert(tags, "highway", road["highway"])
    if road.get("lifecycle") in ("construction", "proposed"):
        raise LanesToTagsError("unimplemented", "construction=*")

    lane_count = _set_lanes(lanes, tags)
    oneway = _set_oneway(lanes, tags, locale, lane_count)
    _set_shoulder(lanes, tags)
    _set_pedestrian(lanes, tags)
    _set_parking(lanes, tags)
    _set_cycleway(lanes, tags, oneway, locale)
    _set_busway(lanes, tags, oneway)
    max_speed = _get_max_speed(lanes, tags)
    _locale_additions(max_speed, locale, tags)

    if check_roundtrip:
        _check_roundtrip(tags, locale, lanes)
    return tags


def _set_lanes(lanes: list[dict], tags: dict) -> int:
    """lanes_to_tags/mod.rs:183-198 — motor+bus travel lane count."""
    n = sum(1 for l in lanes
            if l.get("type") == "travel" and l.get("designated") in (MOTOR, "bus"))
    _checked_insert(tags, "lanes", str(n))
    return n


def _set_oneway(lanes: list[dict], tags: dict, locale: Locale, lane_count: int) -> bool:
    """lanes_to_tags/mod.rs:201-270."""
    motors = [l for l in lanes if is_motor(l)]
    if all(l.get("direction") == FORWARD for l in motors):
        _checked_insert(tags, "oneway", "yes")
        return True
    fwd = sum(1 for l in lanes
              if l.get("type") == "travel" and l.get("designated") in (MOTOR, "bus")
              and l.get("direction") == FORWARD)
    _checked_insert(tags, "lanes:forward", str(fwd))
    bwd = sum(1 for l in lanes
              if l.get("type") == "travel" and l.get("designated") in (MOTOR, "bus")
              and l.get("direction") == BACKWARD)
    _checked_insert(tags, "lanes:backward", str(bwd))
    if any(is_motor(l) and l.get("direction") == BOTH for l in lanes):
        _checked_insert(tags, "lanes:both_ways", "1")
        if lane_count >= 3:
            _checked_insert(tags, "turn:lanes:both_ways",
                            opposite_side(locale.driving_side))
    return False


def _set_shoulder(lanes: list[dict], tags: dict) -> None:
    first, last = is_shoulder(lanes[0]), is_shoulder(lanes[-1])
    value = {(False, False): "no", (True, False): "left",
             (False, True): "right", (True, True): "both"}[(first, last)]
    _checked_insert(tags, "shoulder", value)


def _set_pedestrian(lanes: list[dict], tags: dict) -> None:
    first, last = is_foot(lanes[0]), is_foot(lanes[-1])
    value = {(False, False): "no", (True, False): "left",
             (False, True): "right", (True, True): "both"}[(first, last)]
    _checked_insert(tags, "sidewalk", value)


def _take_while(lanes, pred):
    out = []
    for l in lanes:
        if not pred(l):
            break
        out.append(l)
    return out


def _skip_while(lanes, pred):
    out = []
    skipping = True
    for l in lanes:
        if skipping and pred(l):
            continue
        skipping = False
        out.append(l)
    return out


def _set_parking(lanes: list[dict], tags: dict) -> None:
    """lanes_to_tags/mod.rs:308-336."""
    left = any(l.get("type") == "parking"
               for l in _take_while(lanes, lambda l: not is_motor(l)))
    right = any(l.get("type") == "parking"
                for l in _skip_while(lanes, lambda l: not is_motor(l)))
    if left and right:
        _checked_insert(tags, "parking:lane:both", "parallel")
    elif left:
        _checked_insert(tags, "parking:lane:left", "parallel")
    elif right:
        _checked_insert(tags, "parking:lane:right", "parallel")

    first = lanes[0]
    if is_separator(first):
        markings = first.get("markings") or []
        if markings and markings[0].get("color") == RED:
            _checked_insert(tags, "parking:condition:both", "no_stopping")


def _set_cycleway(lanes: list[dict], tags: dict, oneway: bool, locale: Locale) -> None:
    """lanes_to_tags/mod.rs:338-428, plus positional emission for INTERIOR
    bicycle lanes (between motor lanes) which edge tags cannot express —
    the forward counterpart consumes cycleway:lanes:<dir>
    (tests.yml case/0030 roundtrip; the reference silently drops them)."""
    left = next((l for l in _take_while(lanes, lambda l: not is_motor(l))
                 if is_bicycle(l)), None)
    right = next((l for l in _take_while(list(reversed(lanes)), lambda l: not is_motor(l))
                  if is_bicycle(l)), None)
    for backward in (False, True):
        want = BACKWARD if backward else FORWARD
        seg = [l for l in lanes if l.get("type") == "travel"
               and _direction(l) == want
               and l.get("designated") in ("motor_vehicle", "bus", "bicycle")]
        interior_bike = any(is_bicycle(l) and l is not left and l is not right
                            for l in seg)
        if not interior_bike:
            continue
        # the forward consumer zips cycleway:lanes:forward against
        # forward_ltr (road-ltr order in BOTH locales) and
        # cycleway:lanes:backward against backward_ltr (reversed road-ltr
        # in BOTH locales) — so reverse iff backward, independent of
        # driving side
        ltr_seg = list(seg)
        if backward:
            ltr_seg = list(reversed(ltr_seg))
        _checked_insert(tags, f"cycleway:lanes:{want}",
                        "|".join("lane" if is_bicycle(l) else "no"
                                 for l in ltr_seg))
        if backward:
            left = None if left in seg else left
        else:
            right = None if right in seg else right
    if left is not None and right is not None:
        _checked_insert(tags, "cycleway:both", "lane")
    elif left is not None:
        _checked_insert(tags, "cycleway:left", "lane")
    elif right is not None:
        _checked_insert(tags, "cycleway:right", "lane")

    if oneway and ((left is not None and _direction(left) == BACKWARD)
                   or (right is not None and _direction(right) == BACKWARD)):
        _checked_insert(tags, "oneway:bicycle", "no")

    for lane, key in ((left, "cycleway:left:oneway"), (right, "cycleway:right:oneway")):
        if lane is None:
            continue
        d = _direction(lane)
        if d == FORWARD:
            _checked_insert(tags, key, "yes")
        elif d == BACKWARD:
            _checked_insert(tags, key, "-1")
        elif d == BOTH:
            _checked_insert(tags, key, "no")

    if left is not None and left.get("width") is not None:
        _checked_insert(tags, "cycleway:left:width", format_float(left["width"]))
    if right is not None and right.get("width") is not None:
        _checked_insert(tags, "cycleway:right:width", format_float(right["width"]))

    # Shared-lane marker roundtrip (mod.rs:414-425)
    if len(lanes) == 1:
        lane = lanes[-1] if locale.driving_side == "right" else lanes[0]
        access = (lane.get("access") or {}).get("bicycle") if lane.get("type") == "travel" else None
        if access is not None and oneway and access.get("access") == "yes" \
                and access.get("direction") == BOTH:
            _checked_insert(tags, "cycleway", "opposite")


def _set_busway(lanes: list[dict], tags: dict, oneway: bool) -> None:
    """lanes_to_tags/mod.rs:430-466."""
    left = next((l for l in _take_while(lanes, lambda l: not is_motor(l))
                 if is_bus(l)), None)
    right = next((l for l in _take_while(list(reversed(lanes)), lambda l: not is_motor(l))
                  if is_bus(l)), None)
    if left is None and right is None and any(is_bus(l) for l in lanes):
        # positional list over the VEHICLE lanes only — that is what the
        # forward scheme zips against (foot/bicycle lanes are appended by
        # later stages and are not part of the road at bus time); an entry
        # per output lane over-counts and the roundtrip errors
        # (tests.yml case/0059)
        vehicles = [l for l in lanes
                    if l.get("type") == "travel"
                    and l.get("designated") in ("motor_vehicle", "bus")]
        _checked_insert(tags, "bus:lanes",
                        "|".join("designated" if is_bus(l) else ""
                                 for l in vehicles))
        return

    def value(lane: dict) -> str:
        if oneway and _direction(lane) == BACKWARD:
            return "opposite_lane"
        return "lane"

    if left is not None and right is not None:
        _checked_insert(tags, "busway:both", "lane")
    elif left is not None:
        _checked_insert(tags, "busway:left", value(left))
    elif right is not None:
        _checked_insert(tags, "busway:right", value(right))


def _get_max_speed(lanes: list[dict], tags: dict):
    """lanes_to_tags/mod.rs:468-493 — all travel lanes must agree, except
    the oneway per-lane case, which round-trips through ``maxspeed:lanes``
    (forward counterpart in tags_to_lanes._apply_maxspeed_lanes;
    tests.yml case/0060 — the reference raises unimplemented here)."""
    travel = [l for l in lanes if l.get("type") == "travel"]
    speeds = [tuple(l["max_speed"]) if l.get("max_speed") is not None
              else None for l in travel]
    present = [s for s in speeds if s is not None]
    if not present:
        return None
    if any(s != present[0] for s in present[1:]):
        if all(l.get("direction") == "forward" for l in travel):
            _checked_insert(tags, "maxspeed:lanes",
                            "|".join("" if s is None else speed_to_osm(s)
                                     for s in speeds))
            return None
        raise LanesToTagsError("unimplemented", "different max speeds per lane")
    _checked_insert(tags, "maxspeed", speed_to_osm(present[0]))
    return present[0]


def _locale_additions(max_speed, locale: Locale, tags: dict) -> None:
    """lanes_to_tags/mod.rs:495-504 — NL 100 kph implies motorroad."""
    if max_speed == ("kph", 100.0) and locale.country == "NL":
        _checked_insert(tags, "motorroad", "yes")


def _check_roundtrip(tags: dict, locale: Locale, lanes: list[dict]) -> None:
    """lanes_to_tags/mod.rs:506-526 — forward∘reverse must be identity."""
    from .tags_to_lanes import tags_to_lanes

    try:
        result = tags_to_lanes(tags, locale, error_on_warnings=True)
    except Exception as e:
        raise LanesToTagsError("roundtrip", str(e))
    if result["road"]["lanes"] != lanes:
        raise LanesToTagsError("roundtrip")
