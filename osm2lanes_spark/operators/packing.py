"""Context-window packing for training pipelines.

``contiguous_packs`` assigns documents to fixed-token-budget packs by
cumulative offset within a partition key (e.g. per source), in a stable
order: pack = floor(preceding-tokens / budget). This is the
SQL-expressible streaming approximation of greedy packing — a document
is placed by where its first token lands, so a pack overflows by at most
one document; in exchange the whole operator is two window functions
inside one shuffle (partitionBy key, orderBy id), scales to any corpus,
and replays exactly in the DuckDB oracle. An exact greedy packer (new
pack when fill + tokens > budget) needs a sequential scan per key — the
``applyInPandas`` extension point is noted below, not shipped, because
the offset variant is what a 100 TB pipeline can actually afford.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_packs(df: DataFrame, token_col: str, budget: int,
                     order_col: str = "doc_id",
                     part_col: str | None = None,
                     out: str = "pack_id") -> DataFrame:
    """Add ``pack_id``: fixed-budget contiguous packing by cumulative
    token offset, deterministic under (part_col, order_col) ordering."""
    w = (Window.partitionBy(part_col) if part_col else
         Window.partitionBy(F.lit(1)))
    w = w.orderBy(F.col(order_col).asc()) \
         .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    preceding = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(out, F.floor(preceding / F.lit(budget)))
