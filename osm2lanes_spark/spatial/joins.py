"""Spatial joins: cell-indexed containment (broadcast-or-salted) and kNN.

Replaces the reference's Overpass client queries:
- way→country containment (``is_in`` — overpass.rs:147-157,201-213) becomes
  a cell equi-join against a covered polygon dim + ray-casting refinement;
- nearest-way kNN (``get_nearby`` — overpass.rs:193-242) becomes an
  expanding k-ring candidate join + ``row_number() == 1``.

Scale design (100 TB / 10^12 docs):
- the polygon dim (countries/admin areas) is tiny → **broadcast** join, no
  shuffle of the fact side at all;
- if a cell dim ever exceeds the broadcast threshold, the **salted** path
  replicates the dim S ways and hashes facts into salt buckets, keeping
  hot city cells from pinning a single reducer;
- the PIP refinement runs only on boundary cells (``full`` covering cells
  skip it) and is a vectorized numpy kernel inside Arrow batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells as C
from . import polygons as P

DEFAULT_LEVEL = 12


# ---------------------------------------------------------------------------
# Encode kernel (Arrow-batched)
# ---------------------------------------------------------------------------

def _spread_bits(col):
    """Morton bit-spread, pure JVM column arithmetic (mirrors
    cells._part1by1 so JVM and numpy encoders agree bit-for-bit)."""
    masks = [(16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
             (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
             (1, 0x5555555555555555)]
    out = col.bitwiseAND(F.lit(0xFFFFFFFF).cast("long"))
    for shift, mask in masks:
        out = (out.bitwiseOR(F.shiftleft(out, shift))
               .bitwiseAND(F.lit(mask).cast("long")))
    return out


def _grid_xy(lon, lat, level: int):
    """Clamped integer grid coordinates of (lon, lat) at ``level``."""
    n = 1 << level
    x = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
                           .cast("long"), F.lit(0)), F.lit(n - 1))
    y = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n)
                           .cast("long"), F.lit(0)), F.lit(n - 1))
    return x, y


def _cell_from_xy(x, y, level: int):
    """Morton-compose grid coordinates into the packed int64 cell id."""
    morton = _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))
    return F.shiftleft(morton, 6).bitwiseOR(F.lit(level)).cast("long")


def cell_expr(lon, lat, level: int):
    """int64 cell id of (lon, lat) at ``level`` — whole-stage-codegen'd.

    This is the hot-path encoder: at 10^12 rows the encode must not leave
    the JVM. The numpy kernel in :mod:`cells` is the batch-side twin used
    inside Arrow UDFs (e.g. multi-vertex way geometries); both produce
    identical ids (asserted in tests).
    """
    x, y = _grid_xy(lon, lat, level)
    return _cell_from_xy(x, y, level)


def with_cell(df: DataFrame, level: int = DEFAULT_LEVEL,
              lon: str = "lon", lat: str = "lat",
              out: str = "cell") -> DataFrame:
    """Add the int64 index cell of (lon, lat) at ``level`` (JVM-side)."""
    return df.withColumn(out, cell_expr(F.col(lon), F.col(lat), level))


def explode_ring_cells(df: DataFrame, lon, lat, level: int, ring_k: int,
                       out: str = "cell") -> DataFrame:
    """JVM k-ring: one row per cell within Chebyshev distance ``ring_k``
    of the point's cell — the hot path of the kNN loop (the Python k-ring
    UDF costs an Arrow round-trip per ring).

    Shape matters: the integer grid coordinates are projected ONCE before
    a literal (dx, dy) offset array is exploded — Generate is a barrier
    CollapseProject cannot cross, so the post-explode bit-spread
    duplicates only a leaf attribute. Building the ring as a
    (2k+1)²-element array of full encode expressions instead overflows
    janino's method limit (interpreted fallback, 5× slower), and
    re-deriving x/y from the packed cell after the explode duplicates the
    decode chain exponentially (every bit-twiddling step references its
    input twice), drowning the optimizer in a megabyte expression tree —
    both measured, both rejected. Integer-domain offsets (never lon/lat
    plus multiples of the cell width, where float rounding at a boundary
    could skip a neighbor) keep the set exactly ``cells.k_ring``'s:
    out-of-world offsets clamp to the edge and the downstream dedup
    collapses them."""
    n = 1 << level
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-ring_k, ring_k + 1)
        for dy in range(-ring_k, ring_k + 1)])
    x, y = _grid_xy(lon, lat, level)
    base = (df.withColumn("_x", x).withColumn("_y", y)
            .select("*", F.explode(offsets).alias("_o")))
    xx = F.least(F.greatest(F.col("_x") + F.col("_o.dx"), F.lit(0)),
                 F.lit(n - 1))
    yy = F.least(F.greatest(F.col("_y") + F.col("_o.dy"), F.lit(0)),
                 F.lit(n - 1))
    cell = _cell_from_xy(xx, yy, level)
    return base.withColumn(out, cell).drop("_x", "_y", "_o")


# ---------------------------------------------------------------------------
# Polygon dim: covering cells
# ---------------------------------------------------------------------------

def polygon_cells_pdf(polygons: dict[str, np.ndarray], level: int) -> pd.DataFrame:
    """Driver-side covering of a *small* polygon dim.

    polygons: key → (V,2) ring array. Returns pandas DF
    (cell:int64, key:str, full:bool); ``full`` cells skip PIP refinement.
    """
    rows = []
    for key, ring in polygons.items():
        covering = P.cover_polygon(ring, level)
        full = P.classify_cells(ring, covering)
        for cell, f in zip(covering.tolist(), full.tolist()):
            rows.append((cell, key, f))
    return pd.DataFrame(rows, columns=["cell", "key", "full"])


def polygon_cells_pdf_s2(polygons: dict[str, np.ndarray],
                         level: int) -> pd.DataFrame:
    """S2-backend covering dim (same shape as :func:`polygon_cells_pdf`).

    The S2 coverer is conservative and unclassified, so every cell is a
    boundary cell (``full=False`` → every candidate refines through exact
    PIP; correctness identical to the morton backend, slightly more PIP
    work)."""
    from . import s2 as S2

    rows = []
    for key, ring in polygons.items():
        cover = S2.cover_polygon(np.asarray(ring, np.float64), level)
        for cell in cover.tolist():
            rows.append((cell, key, False))
    return pd.DataFrame(rows, columns=["cell", "key", "full"])


def with_cell_s2(df: DataFrame, level: int, lon: str = "lon",
                 lat: str = "lat", out: str = "cell") -> DataFrame:
    """S2 counterpart of :func:`with_cell` (Arrow-batched numpy kernel)."""
    from .s2 import s2_encode_udf

    return df.withColumn(out, s2_encode_udf(level)(F.col(lon), F.col(lat)))


def polygon_cells_pdf_h3(polygons: dict[str, np.ndarray],
                         res: int) -> pd.DataFrame:
    """H3-backend covering dim (the north rule's primary cell system —
    import-gated on the ``h3`` bindings, v4 API; VERDICT r02 #5a).

    Conservative covering = center-inside fill ∪ densely-sampled boundary
    cells ∪ a 1-ring dilation of both (``polygon_to_cells`` alone keeps
    only cells whose CENTER is inside, which under-covers boundaries and
    can miss a sliver polygon entirely). The boundary is sampled along
    each edge at half-hex-edge spacing in degrees — NOT via
    ``grid_path_cells``, whose grid-ij line can deviate from the true
    lon/lat segment on long edges and raises across icosahedron faces
    (round-3 review). Degree-based spacing is conservative everywhere: a
    degree of longitude only shrinks in km toward the poles, so samples
    get denser in ground distance, never sparser. Every cell is a
    boundary cell (``full=False``) so downstream exact PIP refines each
    candidate — identical results to the morton/S2 backends."""
    import math

    import h3

    edge_km = h3.average_hexagon_edge_length(res, unit="km")
    step_deg = max(edge_km / 111.0 / 2.0, 1e-5)
    rows = []
    for key in sorted(polygons):
        ring = np.asarray(polygons[key], np.float64)
        latlng = [(float(la), float(lo)) for lo, la in ring]
        cells = set(h3.polygon_to_cells(h3.LatLngPoly(latlng), res))
        boundary = set()
        for (la0, lo0), (la1, lo1) in zip(latlng, latlng[1:] + latlng[:1]):
            seg_len = math.hypot(lo1 - lo0, la1 - la0)
            n = max(1, int(math.ceil(seg_len / step_deg)))
            for t in np.linspace(0.0, 1.0, n + 1):
                boundary.add(h3.latlng_to_cell(la0 + (la1 - la0) * t,
                                               lo0 + (lo1 - lo0) * t, res))
        for c in list(cells | boundary):
            cells |= set(h3.grid_disk(c, 1))
        for c in cells:
            rows.append((int(np.uint64(h3.str_to_int(c)).astype(np.int64)),
                         key, False))
    return pd.DataFrame(rows, columns=["cell", "key", "full"])


def with_cell_h3(df: DataFrame, res: int, lon: str = "lon",
                 lat: str = "lat", out: str = "cell") -> DataFrame:
    """H3 counterpart of :func:`with_cell` (Arrow-batched; the h3 C calls
    run per row inside the batch — bindings expose no vector API)."""

    @F.pandas_udf(T.LongType())
    def _udf(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        import h3

        return pd.Series([
            int(np.uint64(h3.str_to_int(
                h3.latlng_to_cell(float(la), float(lo), res)))
                .astype(np.int64))
            for lo, la in zip(lon_s, lat_s)])

    return df.withColumn(out, _udf(F.col(lon), F.col(lat)))


def containment_join(points: DataFrame, polygons: dict[str, np.ndarray],
                     level: int = DEFAULT_LEVEL,
                     strategy: str = "map",
                     salt_buckets: int = 16,
                     point_id: str = "doc_id",
                     cell_backend: str = "morton") -> DataFrame:
    """Assign each point the key of the polygon containing it.

    points: DataFrame with ``point_id``, ``lon``, ``lat``.
    Returns points columns + ``key`` (nullable — no containing polygon).

    strategy='map':       ZERO-shuffle narrow map — the covering-cell
    index (a broadcast-sized dict) and the PIP refinement run in one Arrow
    stage. The optimal shape while the polygon dim fits in worker memory
    (countries/admin areas always do); the plan stays a pure pipeline with
    the scan and downstream stages.
    strategy='broadcast': dim as broadcast hash join; one groupBy shuffle
    to resolve multi-cell candidates.
    strategy='salted':    explicit replicate-by-salt hash join — the
    fallback shape for dims above the broadcast threshold; the dim is
    replicated ``salt_buckets`` ways so a hot cell spreads over buckets.

    cell_backend='morton' (default) uses the JVM bit-arithmetic quadtree;
    's2' uses real S2 cell ids (`spatial/s2.py` — Arrow-batched encode +
    conservative covering); 'h3' uses real H3 cells via the ``h3``
    bindings where installed (``level`` is then the H3 resolution). Every
    non-morton candidate PIP-refines, so results are identical across
    backends (tests/test_s2.py + test_spatial.py pin the equality); note
    an S2 level is per cube face, so granularity ≈ the morton level + 2.
    """
    spark: SparkSession = points.sparkSession
    if cell_backend not in ("morton", "s2", "h3"):
        raise ValueError(f"unknown cell_backend: {cell_backend}")
    if strategy == "map":
        if cell_backend != "morton":
            raise ValueError(
                "strategy='map' fuses the morton covering into the Arrow "
                "stage; use strategy='broadcast'/'salted' with "
                f"cell_backend={cell_backend!r}")
        return _containment_map(points, polygons, level, point_id)
    if cell_backend == "s2":
        dim_pdf = polygon_cells_pdf_s2(polygons, level)
        pts = with_cell_s2(points, level)
    elif cell_backend == "h3":
        dim_pdf = polygon_cells_pdf_h3(polygons, level)
        pts = with_cell_h3(points, level)
    else:
        dim_pdf = polygon_cells_pdf(polygons, level)
        pts = with_cell(points, level)

    if strategy == "salted":
        salted = dim_pdf.loc[dim_pdf.index.repeat(salt_buckets)].reset_index(drop=True)
        salted["salt"] = np.tile(np.arange(salt_buckets), len(dim_pdf))
        dim = spark.createDataFrame(salted)
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(point_id), F.lit(salt_buckets)))
        joined = pts.join(dim, ["cell", "salt"], "left").drop("salt")
    else:
        dim = F.broadcast(spark.createDataFrame(dim_pdf))
        joined = pts.join(dim, "cell", "left")

    # PIP refinement only for boundary cells (full=false)
    rings_items = sorted(polygons.items())
    ring_keys = [k for k, _ in rings_items]
    ring_arrays = [np.asarray(r, np.float64) for _, r in rings_items]

    @F.pandas_udf(T.BooleanType())
    def pip_udf(lon_s: pd.Series, lat_s: pd.Series, key_s: pd.Series) -> pd.Series:
        lon = lon_s.to_numpy()
        lat = lat_s.to_numpy()
        out = np.zeros(len(lon), dtype=bool)
        keys = key_s.to_numpy()
        for k, ring in zip(ring_keys, ring_arrays):
            mask = keys == k
            if mask.any():
                out[mask] = P.point_in_polygon(lon[mask], lat[mask], ring)
        return pd.Series(out)

    # Match flag: covering-cell hit refined by PIP only on boundary cells.
    matched_key = F.when(
        F.col("key").isNotNull()
        & (F.col("full") | pip_udf(F.col("lon"), F.col("lat"), F.col("key"))),
        F.col("key"))

    # Single-shuffle finalize: per point take the min matching key (border
    # points in two coverings get a deterministic winner) and carry the
    # original row along — no join-back to the fact table.
    other_cols = [c for c in points.columns if c != point_id]
    return (joined
            .withColumn("_mkey", matched_key)
            .groupBy(point_id)
            .agg(F.min("_mkey").alias("key"),
                 *[F.first(c).alias(c) for c in other_cols])
            .select(point_id, *other_cols, "key"))


def _containment_map(points: DataFrame, polygons: dict[str, np.ndarray],
                     level: int, point_id: str) -> DataFrame:
    """Shuffle-free containment: cell→candidates dict + PIP in one kernel."""
    dim_pdf = polygon_cells_pdf(polygons, level)
    cell_index: dict[int, list[tuple[str, bool]]] = {}
    for cell, key, full in dim_pdf.itertuples(index=False):
        cell_index.setdefault(int(cell), []).append((key, bool(full)))
    rings = {k: np.asarray(r, np.float64) for k, r in polygons.items()}

    @F.pandas_udf(T.StringType())
    def resolve_udf(cell_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        cells_arr = cell_s.to_numpy()
        lon = lon_s.to_numpy(np.float64)
        lat = lat_s.to_numpy(np.float64)
        out = np.full(len(cells_arr), None, dtype=object)
        pending: dict[str, list[int]] = {}
        for i, c in enumerate(cells_arr):
            for key, full in cell_index.get(int(c), ()):  # few candidates
                if full:
                    if out[i] is None or key < out[i]:
                        out[i] = key
                else:
                    pending.setdefault(key, []).append(i)
        # vectorized PIP per polygon over its boundary-cell points
        for key in sorted(pending):
            idx = np.array(pending[key])
            hit = P.point_in_polygon(lon[idx], lat[idx], rings[key])
            for i in idx[hit]:
                if out[i] is None or key < out[i]:
                    out[i] = key
        return pd.Series(out)

    pts = with_cell(points, level)
    return (pts.withColumn(
        "key", resolve_udf(F.col("cell"), F.col("lon"), F.col("lat")))
        .drop("cell"))


def repartition_by_cell_range(df: DataFrame, num_partitions: int,
                              cell_col: str = "cell") -> DataFrame:
    """Range-partition facts by raw cell id = spatial co-location.

    Because descendants of a coarser cell form one contiguous morton range
    (``cells.prefix_range``), range partitioning on the int64 id puts
    spatially adjacent rows in the same partition: downstream per-area
    stages (zonal joins, per-region compaction, polygon-local writes)
    read/shuffle locally, and Iceberg-style min/max file pruning on the
    cell column becomes effective for spatial predicates.
    """
    return df.repartitionByRange(num_partitions, F.col(cell_col))


class LocaleResolver:
    """Batch kernel: (cell, lon, lat) arrays → (alpha2, driving_side).

    Built driver-side once (covering index + rings + driving-side dim) and
    shipped in the UDF closure; used by the fused lane-transform stage so
    spatial locale resolution costs zero extra Python stages.
    """

    def __init__(self, polygons: dict[str, np.ndarray], level: int):
        from ..core.locale import COUNTRIES

        self.level = level
        dim_pdf = polygon_cells_pdf(polygons, level)
        self.cell_index: dict[int, list[tuple[str, bool]]] = {}
        for cell, key, full in dim_pdf.itertuples(index=False):
            self.cell_index.setdefault(int(cell), []).append((key, bool(full)))
        self.rings = {k: np.asarray(r, np.float64) for k, r in polygons.items()}
        self.side = {a2: side for a2, (_, _, side) in COUNTRIES.items()}

    def __call__(self, cells_arr, lon, lat):
        out = np.full(len(cells_arr), None, dtype=object)
        pending: dict[str, list[int]] = {}
        for i, c in enumerate(cells_arr):
            for key, full in self.cell_index.get(int(c), ()):
                if full:
                    if out[i] is None or key < out[i]:
                        out[i] = key
                else:
                    pending.setdefault(key, []).append(i)
        for key in sorted(pending):
            idx = np.array(pending[key])
            hit = P.point_in_polygon(lon[idx], lat[idx], self.rings[key])
            for i in idx[hit]:
                if out[i] is None or key < out[i]:
                    out[i] = key
        sides = np.array([self.side.get(k) if k else None for k in out],
                         dtype=object)
        return out, sides


def make_locale_resolver(polygons: dict[str, np.ndarray],
                         level: int = DEFAULT_LEVEL) -> LocaleResolver:
    return LocaleResolver(polygons, level)


# ---------------------------------------------------------------------------
# kNN via expanding k-ring (J4)
# ---------------------------------------------------------------------------

def knn_join(queries: DataFrame, ways: DataFrame, k: int = 1,
             level: int = DEFAULT_LEVEL, max_ring: int = 8,
             query_id: str = "query_id", way_id: str = "way_id") -> DataFrame:
    """Exact nearest-``k`` ways per query point (reference k=1 —
    overpass.rs:222-235, expanding-radius Overpass search).

    queries: (query_id, lon, lat); ways: (way_id, geometry) where geometry
    is array<struct<lon,lat>> — the reference's LineString.

    Shape: queries explode to k-ring candidate cells (the ring doubles each
    round, only for the *unfinished* remainder), ways are indexed by the
    cells their vertices touch, the equi-join on cell yields candidates,
    a numpy point→polyline kernel computes distances, and
    ``row_number() OVER (PARTITION BY query ORDER BY dist)`` takes k.

    Exactness: a query finishes only when its kth-best distance is within
    the ring's geometric guarantee (cells beyond Chebyshev ring r are at
    least ``r * min_cell_dim`` away), so no unseen cell can hold a closer
    way. Queries still unfinished at ``max_ring`` fall back to a brute
    force against the full way set — they are the sparse remainder, so the
    cross join is small.
    """
    spark = queries.sparkSession

    # ways → (cell, way_id, geometry) index; a way appears once per distinct
    # vertex cell
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def way_cells_udf(geom: pd.Series) -> pd.Series:
        out = []
        for g in geom:
            pts = np.array([[p["lon"], p["lat"]] for p in g], np.float64)
            out.append(C.cover_polyline(pts, level).tolist())
        return pd.Series(out)

    from ..util import spread

    # cached once — every expanding-ring round joins against it, and
    # re-running the covering UDF per round would dominate the loop.
    # persist (not localCheckpoint): the index has static lineage, so it
    # needs caching, not truncation — an eager checkpoint pays an extra
    # materialize+copy job up front (~1.4 s at sf0.1) for nothing.
    # Single-vertex geometries (POI sites) index JVM-side — their covering
    # IS the point's cell, so the Arrow covering stage runs only for real
    # polylines (r02 profiling: the covering UDF was ~1/3 of kNN cold time
    # on a point-site corpus).
    spread_ways = spread(ways, way_id)
    # one cheap JVM pass answers both planning questions: are there any
    # real polylines (else the Arrow covering branch is skipped — an
    # empty-but-scheduled Python stage still launches a worker per task,
    # ~1 s at 64 partitions), and how many ways there are (the density
    # seed below; a lower bound on index entries, so a sparse corpus can
    # only over-seed the ring, never under-search it)
    stats = spread_ways.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.size("geometry") > 1).cast("int")).alias("nm")).first()
    n_ways, n_multi = stats["n"], stats["nm"] or 0
    g1 = F.element_at("geometry", 1)
    single = (spread_ways.where(F.size("geometry") <= 1)
              .withColumn("cell", cell_expr(g1["lon"], g1["lat"], level)))
    if n_multi == 0:
        way_index = single.select("cell", way_id, "geometry").persist()
    else:
        multi = (spread_ways.where(F.size("geometry") > 1)
                 .withColumn("cell",
                             F.explode(way_cells_udf(F.col("geometry")))))
        way_index = (single.unionByName(multi)
                     .select("cell", way_id, "geometry")
                     .persist())

    def query_cells(df: DataFrame, ring_k: int) -> DataFrame:
        # the Arrow k-ring: one batched UDF over the (small) unfinished
        # remainder. A JVM alternative exists (explode_ring_cells) but
        # measured at parity here — the candidates it feeds go through the
        # Python dist kernel regardless, so the ring's Arrow round-trip is
        # a minor term; it wins only when queries vastly outnumber
        # candidates (grid co-location joins — its own test covers it).
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def cells_udf(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
            base = C.encode(lon_s.to_numpy(), lat_s.to_numpy(), level)
            return pd.Series([C.k_ring(int(c), ring_k).tolist() for c in base])

        return df.withColumn("cell", F.explode(cells_udf(F.col("lon"), F.col("lat"))))

    @F.pandas_udf(T.DoubleType())
    def dist_udf(lon_s: pd.Series, lat_s: pd.Series, geom: pd.Series) -> pd.Series:
        out = np.empty(len(lon_s))
        lons = lon_s.to_numpy()
        lats = lat_s.to_numpy()
        for i, g in enumerate(geom):
            ring = np.array([[p["lon"], p["lat"]] for p in g], np.float64)
            if len(ring) == 1:
                out[i] = float(np.hypot(lons[i] - ring[0, 0], lats[i] - ring[0, 1]))
            else:
                out[i] = float(P.point_to_segment_dist(
                    np.array([lons[i]]), np.array([lats[i]]), ring)[0])
        return pd.Series(out)

    min_cell_dim = 180.0 / (1 << level)  # lat extent is the tighter one

    def topk_of(cand: DataFrame) -> DataFrame:
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(),
                                                 F.col(way_id).asc())
        return (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))

    # Driver-safe expanding loop (VERDICT r01 #2): finished/remaining splits
    # are semi/anti joins — never a collect()+isin() round-trip. Exactly
    # ONE eager materialization per round (the round's topk,
    # localCheckpoint'ed): the semi/anti splits stay lazy over it, so the
    # iteration lineage is flat (each round builds on checkpointed blocks,
    # max log2(max_ring) shallow joins deep) and the final union never
    # recomputes a ring. Checkpoint blocks are freed with the session.
    remaining = queries.localCheckpoint()
    finished_parts: list[DataFrame] = []
    # seed the ring from way density (VERDICT r02 #8): a ring whose
    # expected candidate count is under 2k can't finish a query — skip
    # those provably-thin early rings. Exactness is untouched: the
    # per-ring geometric guarantee still gates completion.
    world = 1 << level
    density = n_ways / float(world * world)
    ring_k = 1
    while (ring_k * 2 <= max_ring and ring_k * 2 < world
           and density * (2 * ring_k + 1) ** 2 < 2 * k):
        ring_k *= 2
    while ring_k <= max_ring and ring_k < world:
        cand = (query_cells(remaining, ring_k)
                .join(way_index, "cell")
                .withColumn("dist", dist_udf(F.col("lon"), F.col("lat"),
                                             F.col("geometry")))
                .drop("geometry", "cell")
                .dropDuplicates([query_id, way_id]))
        topk = topk_of(cand).localCheckpoint()
        # finished: kth best within the ring guarantee (no unseen supercover
        # cell can hold anything closer than ring_k * min_cell_dim)
        guarantee = ring_k * min_cell_dim
        done = (topk.groupBy(query_id)
                .agg(F.max("dist").alias("_kth"), F.count("*").alias("_n"))
                .where((F.col("_n") >= k) & (F.col("_kth") <= guarantee))
                .select(query_id))
        finished_parts.append(topk.join(done, query_id, "left_semi"))
        remaining = remaining.join(done, query_id, "left_anti")
        if remaining.isEmpty():
            break
        ring_k *= 2
    if not remaining.isEmpty():
        # sparse remainder: exact brute force (small side crossJoin)
        brute = (F.broadcast(remaining).crossJoin(
                    ways.select(way_id, "geometry"))
                 .withColumn("dist", dist_udf(F.col("lon"), F.col("lat"),
                                              F.col("geometry")))
                 .drop("geometry")
                 .dropDuplicates([query_id, way_id]))
        finished_parts.append(topk_of(brute))
    # every surviving part sits on checkpointed topk blocks (or on `ways`
    # directly, for the brute remainder) — the cached index can go
    way_index.unpersist()
    if not finished_parts:
        return spark.createDataFrame(
            [], queries.schema.add(way_id, T.StringType())
            .add("dist", T.DoubleType()).add("rank", T.IntegerType()))
    out = finished_parts[0]
    for part in finished_parts[1:]:
        out = out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Within-radius distance join
# ---------------------------------------------------------------------------

EARTH_RADIUS_KM = 6371.0
_DEG2RAD = 0.017453292519943295  # float64(pi/180) — literal in BOTH engines

# Oracle twin of haversine_km(): interpolate the four coordinate SQL
# expressions. Every operation and its order matches the Column builder
# exactly (x * 0.017453292519943295, never RADIANS(x): Java's toRadians
# is x / 180 * pi while DuckDB multiplies by pi/180 — up to 1 ulp apart,
# which a hash compare would see).
HAVERSINE_SQL = (
    "2.0 * 6371.0 * asin(sqrt("
    "sin(({lat2} - {lat1}) * 0.017453292519943295 / 2.0)"
    " * sin(({lat2} - {lat1}) * 0.017453292519943295 / 2.0)"
    " + cos({lat1} * 0.017453292519943295)"
    " * cos({lat2} * 0.017453292519943295)"
    " * sin(({lon2} - {lon1}) * 0.017453292519943295 / 2.0)"
    " * sin(({lon2} - {lon1}) * 0.017453292519943295 / 2.0)))")


def haversine_km(lon1, lat1, lon2, lat2):
    """Great-circle distance in km as a pure-Catalyst Column.

    Fixed IEEE operation order (squares via multiplication, degree→radian
    by a literal factor) so a SQL engine replaying ``HAVERSINE_SQL``
    reproduces the double bit-for-bit up to libm's ≤1-ulp sin/cos/asin
    wiggle — far below any sane output rounding.
    """
    dlat_h = F.sin((lat2 - lat1) * F.lit(_DEG2RAD) / F.lit(2.0))
    dlon_h = F.sin((lon2 - lon1) * F.lit(_DEG2RAD) / F.lit(2.0))
    a = (dlat_h * dlat_h
         + F.cos(lat1 * F.lit(_DEG2RAD)) * F.cos(lat2 * F.lit(_DEG2RAD))
         * dlon_h * dlon_h)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def distance_join(left: DataFrame, right: DataFrame, radius_km: float,
                  *, lon: str = "lon", lat: str = "lat",
                  level: Optional[int] = None,
                  dist_col: str = "dist_km") -> DataFrame:
    """All (left, right) pairs within ``radius_km`` great-circle distance.

    The scale shape (the reference resolves near-way lookups one Overpass
    ``around`` call at a time — overpass.rs:193-242; a cluster needs the
    set-at-once join):

    1. index the right side by its home grid cell (one narrow projection);
    2. explode each left row to the cells its radius can reach — a
       *per-row* ring: ``dy`` is a constant (latitude degrees are uniform)
       while ``dx`` widens with ``1/cos(|lat| + r)`` so high-latitude rows
       scan exactly the lon band they need (x wraps modulo n across the
       antimeridian; y clamps at the poles — correct while
       ``radius < (90° − max|lat|) · 111 km``, i.e. no cross-pole pairs);
    3. ONE cell equi-join (no crossJoin anywhere), then the exact
       haversine filter. Candidate factor = ring area / cell area ≈ 9-25
       for radius ≈ cell size; AQE's skew split handles dense city cells.

    Everything is whole-stage-codegen'd Catalyst (bit-spread cell encode,
    HOF ring build, haversine) — no Python in the path. Both coordinate
    columns must be named ``lon``/``lat``-as-passed on BOTH inputs; other
    column collisions are the caller's to alias. Output = left columns +
    right columns (minus the right's coordinates) + ``dist_col``.

    ``level`` defaults to a grid whose cell height ≈ radius/4: the ring
    then hugs the disc (candidate overshoot ≈ 2× the true-bounding-box
    instead of the up-to-14× a radius-sized cell costs — measured on the
    800 km self-join: ring 2278 deg² vs 163 deg² disc at the coarse
    default). The explode fan-out grows to ~45-120 cells/row, but those
    are narrow pre-join rows; the candidate rows they prune are wide
    post-join rows (guide §2.3 — shuffle fewer bytes). Pass a coarser
    level to trade back when samples are sparse.
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be positive: {radius_km!r}")
    r_deg = radius_km / EARTH_RADIUS_KM * (180.0 / np.pi)
    if level is None:
        level = max(1, min(14, int(np.floor(np.log2(180.0 / r_deg))) + 2))
    n = 1 << level
    cell_h = 180.0 / n
    cell_w = 360.0 / n
    dy = int(r_deg / cell_h) + 1

    from ..util import spread as _spread
    rx, ry = _grid_xy(F.col(lon), F.col(lat), level)
    # spread the right side as well: when the planner broadcasts the
    # exploded LEFT (BuildLeft — observed on the idw shape), the right
    # side is the streamed one, and a single-row-group scan would run
    # the whole probe+haversine pass on one task (37 s of 54 s at
    # sf1.0). No-op once the input has real parallelism.
    right_idx = (_spread(right, lon)
                 .withColumnRenamed(lon, "__rlon")
                 .withColumnRenamed(lat, "__rlat")
                 .withColumn("__cell", _cell_from_xy(
                     *_grid_xy(F.col("__rlon"), F.col("__rlat"), level),
                     level=level)))

    # per-row lon ring width: the partner's latitude is at most r_deg
    # further poleward, so bound cos by the worst latitude in reach
    phi_w = F.least(F.abs(F.col(lat)) + F.lit(r_deg), F.lit(89.9))
    dx = F.least(
        F.floor(F.lit(r_deg) / (F.cos(phi_w * F.lit(_DEG2RAD))
                                * F.lit(cell_w))).cast("int") + F.lit(1),
        F.lit(n // 2))
    lx, ly = _grid_xy(F.col(lon), F.col(lat), level)
    # spread the left side before the ring explode: a single-row-group
    # parquet scan is ONE task, and everything from the explode through
    # the cell join and haversine filter inherits that parallelism
    # (guide §2.5/§6.1). No-op once input partitions ≥ the session's
    # default parallelism (the 100 TB case).
    base = (_spread(left, lon)
            .withColumn("__x", lx).withColumn("__y", ly)
            .withColumn("__dx", dx))
    # x wraps (antimeridian), y clamps (poles); array_distinct collapses
    # the duplicates both produce at the caps
    xs = F.transform(F.sequence(-F.col("__dx"), F.col("__dx")),
                     lambda d: F.pmod(F.col("__x") + d, F.lit(n)))
    ys = F.transform(F.sequence(F.lit(-dy), F.lit(dy)),
                     lambda d: F.least(F.greatest(F.col("__y") + d,
                                                  F.lit(0)),
                                       F.lit(n - 1)))
    cells = F.array_distinct(F.flatten(F.transform(
        xs, lambda xx: F.transform(ys,
                                   lambda yy: _cell_from_xy(xx, yy, level)))))
    cand = (base.withColumn("__cell", F.explode(cells))
            .drop("__x", "__y", "__dx")
            .join(right_idx, "__cell")
            .drop("__cell"))
    d = haversine_km(F.col(lon), F.col(lat),
                     F.col("__rlon"), F.col("__rlat"))
    return (cand.withColumn(dist_col, d)
            .where(F.col(dist_col) <= F.lit(float(radius_km)))
            .drop("__rlon", "__rlat"))
