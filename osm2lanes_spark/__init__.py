"""osm2lanes_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
``a-b-street/osm2lanes`` (Rust) as a Spark-first engine:

- the ``tags_to_lanes`` / ``lanes_to_tags`` transforms become vectorized
  Arrow-batched stages over an Iceberg/parquet table of interleaved
  text+media documents (``osm2lanes_spark.operators.lane_transform``),
- locale resolution (the reference's Overpass ``is_in``) becomes a
  cell-indexed spatial containment join (``osm2lanes_spark.spatial``),
- plus the large-scale training-data operators (dedup, similarity search,
  text analysis) a 100 TB corpus pipeline needs.

Everything here derives from public knowledge only: the PySpark API and the
reference repo's observable behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"
