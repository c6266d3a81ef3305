"""Arrow-batched lane transform stages.

The reference's public API is three pure functions
(`tags_to_lanes`, `lanes_to_tags`, locale builder — SURVEY.md §2.10);
here each becomes ONE ``mapInPandas`` stage over Arrow record batches:
the batch arrives as pandas columns, a plain-Python loop runs the row
kernel per way (allowed: the no-per-row-Python mandate bans per-row
*Spark* UDFs, not loops inside an Arrow batch), and the result leaves as
nested Arrow structs. No shuffle is introduced — the stage is a pure
narrow map, so it pipelines with the scan and with downstream writes.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.compare import road_eq_expected
from ..core.lanes_to_tags import lanes_to_tags
from ..core.locale import Locale
from ..core.model import RoadError
from ..core.tags_to_lanes import tags_to_lanes
from ..schemas import ROAD_SCHEMA, TAGS_SCHEMA
from .span_assembly import with_tags

_ACCESS_MODES = ("foot", "bicycle", "taxi", "bus", "motor")


def _norm_lane(lane: dict) -> dict:
    """Internal lane dict → full-key dict matching LANE_TYPE."""
    ms = lane.get("max_speed")
    access = lane.get("access")
    if access is not None:
        access = {
            m: (None if access.get(m) is None else
                {"access": access[m].get("access"),
                 "direction": access[m].get("direction")})
            for m in _ACCESS_MODES
        }
    markings = lane.get("markings")
    if markings is not None:
        markings = [{"style": m.get("style"), "width": m.get("width"),
                     "color": m.get("color")} for m in markings]
    return {
        "type": lane.get("type"),
        "direction": lane.get("direction"),
        "designated": lane.get("designated"),
        "width": lane.get("width"),
        "max_speed": None if ms is None else {"unit": ms[0], "value": ms[1]},
        "access": access,
        "semantic": lane.get("semantic"),
        "markings": markings,
    }


class _TransformCache:
    """Bounded memo of (tags, locale, config) → output row.

    OSM corpora are dominated by repeated tag-sets (a plain residential
    road tags identically millions of times), so the per-way transform is
    dictionary-encodable: compute once per distinct input per worker,
    share the (read-only, immediately Arrow-serialized) result dict.
    FIFO-bounded so skew can't grow worker memory.
    """

    __slots__ = ("cache", "max_size")

    def __init__(self, max_size: int = 65536):
        self.cache: dict = {}
        self.max_size = max_size

    def get(self, key):
        return self.cache.get(key)

    def put(self, key, value) -> None:
        if len(self.cache) >= self.max_size:
            self.cache.pop(next(iter(self.cache)))
        self.cache[key] = value


def _transform_row(tags: Optional[dict], iso: Optional[str],
                   driving_side: Optional[str], include_separators: bool,
                   tags_error: Optional[str] = None) -> dict:
    out = {"name": None, "ref": None, "highway": None, "lifecycle": None,
           "lit": None, "tracktype": None, "smoothness": None,
           "lanes": None, "warnings": None, "error": None}
    if tags is None:
        out["error"] = tags_error or "duplicate_key"
        return out
    locale = Locale.build(iso, driving_side)
    try:
        res = tags_to_lanes(dict(tags), locale,
                            include_separators=include_separators)
    except RoadError as e:
        out["error"] = e.kind
        return out
    except Exception as e:  # defensive: never kill the batch
        out["error"] = f"internal:{type(e).__name__}"
        return out
    road = res["road"]
    out.update(
        name=road["name"], ref=road["ref"], highway=road["highway"],
        lifecycle=road["lifecycle"], lit=road["lit"],
        tracktype=road["tracktype"], smoothness=road["smoothness"],
        lanes=[_norm_lane(l) for l in road["lanes"]],
        warnings=[f"{w['kind']}:{w['detail']}" for w in res["warnings"]],
    )
    return out


def tags_to_lanes_stage(df: DataFrame, include_separators: bool = True,
                        locale_resolver=None) -> DataFrame:
    """documents(+locale columns) → ROAD_SCHEMA rows.

    Expects columns: ``doc_id``, ``spans`` and optionally ``iso_3166_2`` /
    ``driving_side`` (produced upstream by the spatial locale join or
    carried on the fixture). Narrow map stage — no shuffle.

    ``locale_resolver``: optional fused spatial-locale resolution — a
    callable ``(cell:int64 ndarray, lon, lat ndarray) → (iso, side) object
    arrays`` (see ``spatial.joins.make_locale_resolver``). When given, the
    ``cell`` is computed JVM-side and locale resolves inside THIS Arrow
    stage, so the whole pipeline is one Python stage per task (two stacked
    Python runners per core measurably degrade throughput).
    """
    cols = ["doc_id", "tags", "tags_error"]
    has_iso = "iso_3166_2" in df.columns and locale_resolver is None
    has_side = "driving_side" in df.columns and locale_resolver is None
    has_inc = "include_separators" in df.columns  # per-row config override
    if has_iso:
        cols.append("iso_3166_2")
    if has_side:
        cols.append("driving_side")
    if has_inc:
        cols.append("include_separators")
    prepared = with_tags(df)
    if locale_resolver is not None:
        from ..spatial.joins import cell_expr
        prepared = prepared.withColumn(
            "cell", cell_expr(F.col("lon"), F.col("lat"),
                              locale_resolver.level))
        cols += ["cell", "lon", "lat"]
    prepared = prepared.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        memo = _TransformCache()
        for pdf in batches:
            rows = []
            if locale_resolver is not None:
                iso_np, side_np = locale_resolver(
                    pdf["cell"].to_numpy(), pdf["lon"].to_numpy(np.float64),
                    pdf["lat"].to_numpy(np.float64))
            else:
                iso_np = pdf["iso_3166_2"].to_numpy() if has_iso else None
                side_np = pdf["driving_side"].to_numpy() if has_side else None
            inc_np = pdf["include_separators"].to_numpy() if has_inc else None
            doc_ids = pdf["doc_id"].to_numpy()
            tags_np = pdf["tags"].to_numpy()
            err_np = pdf["tags_error"].to_numpy()
            for i in range(len(pdf)):
                tags = tags_np[i] if err_np[i] is None else None
                inc = bool(inc_np[i]) if inc_np is not None else include_separators
                iso = iso_np[i] if iso_np is not None else None
                side = side_np[i] if side_np is not None else None
                key = (err_np[i] if tags is None else tuple(sorted(tags.items())),
                       iso, side, inc)
                cached = memo.get(key)
                if cached is None:
                    cached = _transform_row(tags, iso, side, inc, err_np[i])
                    memo.put(key, cached)
                row = dict(cached)  # shallow: nested values shared read-only
                row["doc_id"] = doc_ids[i]
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in ROAD_SCHEMA.fields])

    return prepared.mapInPandas(run, schema=ROAD_SCHEMA)


def _denorm_lane(lane: dict) -> dict:
    """Arrow row dict → internal sparse lane dict (inverse of _norm_lane)."""
    out = {"type": lane["type"]}
    for k in ("direction", "designated", "width", "semantic"):
        if lane.get(k) is not None:
            out[k] = lane[k]
    if lane.get("max_speed") is not None:
        out["max_speed"] = (lane["max_speed"]["unit"], lane["max_speed"]["value"])
    if lane.get("access") is not None:
        acc = {}
        for m in _ACCESS_MODES:
            v = lane["access"].get(m)
            if v is not None:
                a = {"access": v["access"]}
                if v.get("direction") is not None:
                    a["direction"] = v["direction"]
                acc[m] = a
        if acc:
            out["access"] = acc
    if lane.get("markings") is not None:
        out["markings"] = [
            {k: v for k, v in (("style", m["style"]), ("width", m["width"]),
                               ("color", m["color"])) if v is not None}
            for m in lane["markings"]
        ]
    return out


def lanes_to_tags_stage(df: DataFrame, check_roundtrip: bool = True) -> DataFrame:
    """ROAD_SCHEMA rows → tag maps (the reverse transform, L1-L10)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # numpy column access instead of pdf.iloc[i] row Series
            # construction — same conversion the forward stage got in
            # commit 8d17860 (measured faster); VERDICT r01 #4
            doc_np = pdf["doc_id"].to_numpy()
            hw_np = pdf["highway"].to_numpy()
            lc_np = pdf["lifecycle"].to_numpy()
            lanes_np = pdf["lanes"].to_numpy()
            iso_np = pdf["iso_3166_2"].to_numpy() if "iso_3166_2" in pdf else None
            side_np = pdf["driving_side"].to_numpy() if "driving_side" in pdf else None
            for i in range(len(pdf)):
                out = {"doc_id": doc_np[i], "tags": None, "error": None}
                try:
                    lanes = lanes_np[i]
                    lanes = [] if lanes is None else list(lanes)
                    road = {
                        "highway": hw_np[i],
                        "lifecycle": lc_np[i],
                        "lanes": [_denorm_lane(l) for l in lanes],
                    }
                    locale = Locale.build(
                        iso_np[i] if iso_np is not None else None,
                        side_np[i] if side_np is not None else None)
                    out["tags"] = lanes_to_tags(road, locale,
                                                check_roundtrip=check_roundtrip)
                except Exception as e:
                    out["error"] = f"{type(e).__name__}: {e}"
                rows.append(out)
            yield pd.DataFrame(rows, columns=[f.name for f in TAGS_SCHEMA.fields])

    cols = ["doc_id", "highway", "lifecycle", "lanes"]
    for extra in ("iso_3166_2", "driving_side"):
        if extra in df.columns:
            cols.append(extra)
    return df.select(*cols).mapInPandas(run, schema=TAGS_SCHEMA)


def arrow_lanes_to_internal(lanes) -> list[dict]:
    """Helper for tests: ROAD_SCHEMA lanes (Row/dict) → internal dicts."""
    out = []
    for lane in lanes:
        d = lane.asDict(recursive=True) if hasattr(lane, "asDict") else dict(lane)
        out.append(_denorm_lane(d))
    return out


__all__ = ["tags_to_lanes_stage", "lanes_to_tags_stage",
           "arrow_lanes_to_internal", "road_eq_expected"]
