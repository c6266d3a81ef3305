"""Raster ↔ vector: per-tile rasterization and zonal joins.

North-rule requirement with no reference counterpart (design freedom):
a raster layer (e.g. a speed-limit or population grid) is materialized as
rows of ``(cell, value)`` at a fixed level — the relational encoding of a
tile — and joined back to vector ways by cell equi-join, aggregating over
each way's covered cells. All shuffle-side logic is plain Spark; only the
cell encode is a numpy kernel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells as C


def rasterize_points(points: DataFrame, value_col: str, level: int,
                     agg: str = "avg") -> DataFrame:
    """Aggregate point values into a raster of (cell, value) tiles.

    One shuffle (groupBy cell) with map-side partial aggregation.
    """
    from .joins import with_cell

    agg_fn = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}[agg]
    return (with_cell(points, level)
            .groupBy("cell")
            .agg(agg_fn(value_col).alias("value"),
                 F.count(F.lit(1)).alias("n_points")))


def way_cells(ways: DataFrame, level: int,
              geometry: str = "geometry") -> DataFrame:
    """Explode each way into the distinct cells its vertices touch."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cells_udf(geom: pd.Series) -> pd.Series:
        out = []
        for g in geom:
            lons = np.array([p["lon"] for p in g], np.float64)
            lats = np.array([p["lat"] for p in g], np.float64)
            out.append(np.unique(C.encode(lons, lats, level)).tolist())
        return pd.Series(out)

    return ways.withColumn("cell", F.explode(cells_udf(F.col(geometry))))


def zonal_join(ways: DataFrame, raster: DataFrame, level: int,
               way_id: str = "way_id", agg: str = "max",
               broadcast_raster: bool = False) -> DataFrame:
    """Zonal statistics: per way, aggregate raster values over its cells.

    ``raster`` must be keyed by cells at the same ``level``. With
    ``broadcast_raster`` the tile side is broadcast (small rasters);
    otherwise a plain shuffled equi-join (AQE handles skew).
    """
    agg_fn = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}[agg]
    r = F.broadcast(raster) if broadcast_raster else raster
    wc = way_cells(ways.select(way_id, "geometry"), level)
    return (wc.join(r, "cell")
            .groupBy(way_id)
            .agg(agg_fn("value").alias(f"zonal_{agg}"),
                 F.count(F.lit(1)).alias("n_cells")))
