#!/usr/bin/env python
"""Dump the formatted physical plans of the headline queries to
BENCH/PLANS.md — the curated plan audit (re-run after plan-shape changes).

Each section is the output of ``df.explain('formatted')`` plus a short
hand-written verdict of WHY the plan is the right one at 100 TB (what
shuffles, what broadcasts, what stays in WholeStageCodegen).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NOTES = {
    "semdedup": """\
SemDeDup cluster-then-prune: centroid assignment is a BroadcastNested-
LoopJoin of the corpus against k centroids (k tiny by construction —
never corpus x corpus; no CartesianProduct in the plan) with a per-id
argmax window; the prune self-joins on the CLUSTER id only, so the
only O(corpus) shuffles key on cluster/id. Intra-cluster pair cost is
O(sum c_i^2) — bounded by raising k, the knob the paper itself turns;
a hot cluster is an AQE skew-join split, not a serialized window.""",
    "gopher_rules": """\
Gopher rule filter: one zero-shuffle codegen map stage over a single
column-pruned scan — tokenization, line split, and all six rule
signals fuse into the scan's narrow stage. At 100 TB this is the
cheapest possible shape: cost = one pass over the text column.""",
    "rolling_stats": """\
Trailing range-window aggregates: exactly ONE hash exchange on the key
feeds a per-key sort with an O(1)-per-row sliding RANGE frame — no
self-join, no explode, no single-partition stage. The decimal(18,6)
sum makes the result independent of partial-aggregation order.""",
    "bm25": """\
BM25 retrieval: one column-pruned scan tokenizes each doc (the token
array is materialized BEFORE the per-term lambda — the interpreted-HOF
re-evaluation trap); zero-tf rows drop inside the scan stage; df_t and
N/avgdl ride BroadcastExchanges (at most |terms| + 1 rows); the only
O(matches) shuffle is the per-doc score fold, partial-combined
map-side; selection is TakeOrderedAndProject — per-partition top-k +
driver merge of k*P rows, never a global sort.""",
    "bloom_contamination": """\
Bloom decontamination (the huge-reference scale path): the reference
compresses to an m-bit filter via ONE map-side-combined bit_or groupBy
(table size m/63 rows — independent of reference size); corpus grams
probe k BroadcastHashJoins with pure bitwise codegen membership tests
and one partial-combined groupBy on the id finishes. The corpus never
shuffles by gram; the reference's grams never travel.""",
    "hll_users": """\
Deterministic HyperLogLog: the register max partial-aggregates
map-side, so the exchange carries at most 2^p rows per input
partition no matter the row count; the estimate groupBy runs over
≤2^p rows per group. Mergeable sketch tables make day→month rollups
touch sketches, never raw data.""",
    "interval_overlap": """\
Interval overlap join: fixed-width cell decomposition turns the
theta-join (BroadcastNestedLoop at best) into ONE equi-join on
(user, cell) — ordinary hash shuffle both sides, AQE-skew-splittable
— with canonical-cell dedup instead of a distinct shuffle. Cost
scales with overlaps per cell, not pairs per key.""",
    "order_priority": """\
EXISTS/NOT-EXISTS chain: LeftSemi + LeftAnti hash joins on the order
key, lineitem predicates pushed to the parquet scans, one shuffle per
join, partial-combined count on the priority finishes.""",
    "cms_tokens": """\
Count-Min sketch: counter sums partial-aggregate map-side (shuffle
capped at depth×width rows per partition); probe lookup broadcasts
the ≤8k-row sketch and min-combines per probe. Integer md5 arithmetic
only — the estimate is bit-exact in any engine.""",
    "cust_order_dist": """\
Q13 outer-join histogram: the priority predicate pushes to the orders
scan, the outer join shuffles both sides once on the customer key,
and both aggregations partial-combine map-side (the c_count histogram
is at most |distinct counts| rows).""",
    "weighted_docs": """\
Gumbel-top-k weighted sampling: keys are a narrow projection over the
scan; the k-th-key threshold is TakeOrderedAndProject (per-task top-k,
driver merge of k·tasks rows) aggregated to ONE row and broadcast —
no global sort, no single-partition window; the flag join is a
broadcast nested-scalar crossJoin of one row.""",
    "scd2_status": """\
SCD2 history builder: ONE hash exchange on the key feeds both windows
(lag change-detect + lead interval close share partitioning and
ordering — the sort is paid once); the run-length dedup is a filter,
never a second shuffle. Hot-key bound is the inherent per-key
ordering; the sessionize bucket decomposition applies if needed.""",
    "funnel": """\
Conversion funnel: greedy earliest-chain = k-1 conditional-aggregation
groupBys on the key (each partial-combined map-side) chained by hash
joins — never a per-key sorted window or a collected event array, so a
hot key combines like any groupBy. Depth is pure codegen CASE logic.""",
    "retention": """\
Retention triangle: (key, bucket)-distinct collapses each key's events
map-side, first-seen is a min groupBy on the same shuffle key (reused
partitioning), the triangle is one count on (cohort, offset). No
windows, no per-key ordering, no single-partition stage.""",
    "ann_pq": """\
PQ asymmetric-distance search: the encode argmin is ONE map-side-
combined groupBy(id) with an m-column when-pivot of min-structs over
the broadcast codebook join (no per-(id, sub) intermediate shuffle);
the ADC LUT is queries x codebooks (tiny, broadcast) and the candidate
sum partial-aggregates before one (query, vec) shuffle; ranks are a
per-query window, quantized to 6 decimals + id tie-break. Compose with
IVF cell filtering for sub-corpus candidate sets at 10^12 vectors.""",
    "ppl_buckets": """\
CCNet tercile split: the NLL scoring plan (vocab fit + hash join + one
per-doc mean) feeds the global grouped_quantiles range-partitioned
prefix; the two thresholds pivot to ONE broadcast row
(BroadcastNestedLoopJoin on a single row — declared, bounded) and the
band CASE is codegen over the scored relation. No single-partition
window, no join by id for the labeling.""",
    "dsir_select": """\
DSIR resampling: the two bucket-count fits and the broadcast-ratio
scoring join live inside the checkpointed slim relation (Scan
ExistingRDD in this plan — computed once, three narrow columns); the
top-k threshold is TakeOrderedAndProject aggregated to ONE broadcast
row (never a global sort or single-partition window), and the flag
joins back onto the untouched input by id. The only O(corpus) shuffles
are the bounded bucket counts and the per-doc sum.""",
    "unigram_ppl": """\
Unigram LM scoring: the vocabulary fit is one map-side-combined count
shuffle over exploded tokens; totals ride a 1-row broadcast
(BroadcastNestedLoopJoin on a single row — declared, bounded); scoring
joins tokens to the vocabulary as a shuffled hash join (probe side has
no ordering — AQE splits hot tokens) and the per-doc mean partial-
aggregates before one doc_id shuffle; the score joins back broadcast.""",
    "duplicate_spans": """\
Exact substring dedup: windows are built in the scan's narrow stage
(transform/slice/xxhash64 over the token array — Generate + codegen, no
shuffle); the doc-frequency pass is distinct+count over 8-byte gram
hashes, BOTH partial-combined map-side (a billion-occurrence navbar
gram combines down to one row per map task); the flagged set joins back
as a BroadcastHashJoin; the only per-doc work (span merge window)
partitions by doc_id — bounded by a document's own flagged windows.""",
    "strip_spans": """\
duplicate_spans' passes plus reconstruction: covered positions explode
from the tiny span table, the token anti-join is keyed (doc, pos), the
rebuild is one map-side-combined collect_list aggregate per FLAGGED doc
(unflagged docs never explode — a left_semi prunes them), and the final
stitch joins the rebuilt text back onto the untouched input by id.""",
    "classifier_score": """\
ZERO Exchange: tokenize, bucket (md5 mod), weight (md5 stretch), mean
and sigmoid are one narrow Project over the parquet scan — the hashed
linear model is pure whole-stage-codegen expression work and scales
embarrassingly at any corpus size.""",
    "classifier_score_trained": """\
The trained-weights flavor: tokens explode in the narrow stage, the
weight vector joins as a BroadcastHashJoin (a 2^16-bucket model is a
few MB), and the per-document mean partial-aggregates map-side before
ONE hash shuffle on doc_id; the score joins back to the untouched input
broadcast-side. No per-row Python anywhere.""",
    "budget_selection": """\
The packing two-pass prefix shape: a slim (source, doc_id, n_tokens)
projection range-shuffles ONCE (checkpointed — shows as Scan
ExistingRDD), local prefix windows key by (__pid, source) so a hot
source spreads over all range partitions, the O(#partitions + #keys)
subtotal table broadcasts back, and the selected flag joins onto the
untouched input. No per-key window over the data anywhere.""",
    "domain_cap": """\
cap_per_key's scale_safe flavor — the same checkpointed range stage and
broadcast subtotal table as budget_selection with the summand fixed to
1 (prefix COUNT): rank-within-key without a per-key window task at any
skew. The plain flavor (one row_number window) stays the right call
below ~1M rows per key; this dump pins the skew-proof shape.""",
    "mixture_sample": """\
The mixture operator contributes ZERO exchanges: rate CASE, md5-uniform
and explode(sequence) run in the scan's narrow stage (Generate splits
the codegen span but not the stage). All three Exchanges in this plan
belong to the DEMO aggregation, not the operator: two-phase
count-distinct (partial by (source, doc_id), then merge by source) plus
the orderBy range sort — each partial-combined map-side first. At
100 TB the operator adds zero data movement to whatever consumes it.""",
    "stratified_sample": """\
Two tiny jobs + one window: per-stratum counts aggregate (rows =
#strata), broadcast back (BroadcastHashJoin — no shuffle of the corpus),
prefilter to ~n survivors per stratum, then the row_number window sorts
only survivors — a 90%-hot stratum contributes ~n rows to its window
task instead of its full size. The undershoot fallback plan only exists
for strata the Chernoff margin missed (driver-checked; empty in
practice).""",
    "asof_latest_view": """\
Union-window as-of join: both sides are tagged and unioned (no join
node at all), then ONE hash Exchange on the key feeds the per-key sort
and the last(ignorenulls) propagation — the same single shuffle an
equi-join would pay, with no range-join quadratic blowup. Plan-asserted
single Exchange in tests/test_plans.py.""",
    "asof_bucketed": """\
The skew-safe flavor: the main window's Exchange keys include the time
bucket (hashpartitioning(user_id, __bkt)), so one hot user spreads over
its hours instead of serializing; the extra subtree is the carry
computation — a row_number over (key, bucket) on the right side plus a
bucket-granularity as-of whose window table has one row per occupied
(key, bucket), bounded by time-span/bucket regardless of skew.""",
    "sessions_scale": """\
The skew-safe sessionize: repartitionByRange on (user, ts, event) gives
equal-sized partitions under any user skew; the per-(partition, user)
windows are bounded by partition size, and both the lag and the session
prefix count cross partition borders through ONE broadcast-joined tiny
subtotal table (one row per partition-user segment). No per-user task
anywhere; the checkpointed range stage truncates out of this dump.""",
    "sessions": """\
One hash Exchange on user_id shared by the lag and the running-sum
windows (same partitioning, one sort); session boundaries are integer-
microsecond arithmetic inside codegen.""",
    "ngram_topk": """\
Exact heavy hitters with no full sort: explode feeds a map-side
partial_count (the hottest n-gram is the MOST combined — skew helps),
ONE Exchange keyed by the ngram, and TakeOrderedAndProject merges each
task's local top-20 — the count table is never materialized or sorted.
Scan reads the text column only. Plan-asserted in tests/test_plans.py.""",
    "token_quantiles": """\
Exact quantiles without sorting rows: the only full-data pass is the
partial-combined (source, value) histogram aggregate; the windows,
quantile explode and min-selection all run over the O(distinct values)
histogram — thousands of rows regardless of corpus size. No
SinglePartition exchange (grouped flavor). Plan-asserted.""",
    "contamination": """\
Decontamination never shuffles the corpus by n-gram: the eval set's
distinct grams (small by definition) are built with one tiny exchange
and BROADCAST into the corpus-side join; the corpus pays ONE scan
(explode_outer keeps zero-gram docs as a null-gram row — no re-attach
join, review r05) + one partial-combined hash exchange on doc_id for
the per-doc stats. broadcast_reference=False switches the gram join to
a hash join for corpus-vs-corpus screening.
Plan-asserted: BroadcastHashJoin on __gram, <=2 hash exchanges.""",
    "line_dedup": """\
Cross-doc line dedup: the doc-frequency side is TWO map-side-combined
aggregates over (id, fingerprint) — the hot navbar fingerprint is the
MOST combined, so skew helps — and the >=min_docs set comes back as a
BROADCAST anti join (no corpus shuffle by fingerprint; the hash-join
fallback for huge boilerplate vocabularies carries no ordering
requirement, so AQE skew split applies). Reconstruction is one
(doc)-keyed ObjectHashAggregate with in-row array_sort ordering, then
one id-keyed stitch back to the untouched input. The line explode is
narrow. Plan-asserted BroadcastHashJoin + partial aggregates.""",
    "token_quantiles_global": """\
The by=None quantile flavor over an all-distinct double column — the
histogram is O(rows), so no single-partition window may touch it: the
range shuffle on the value lives behind the slim checkpoint, the
cumulative count is per range partition (hashpartitioning(__pid)) with
one broadcast subtotal stitch, and the only SinglePartition exchanges
are the O(#partitions)-row subtotal window and the 1-row global total.
Plan-asserted in tests/test_plans.py.""",
    "pii_redact": """\
Redaction is a pure scan-stage expression chain — counts
(regexp_extract_all/size) and global replacements all inside ONE
WholeStageCodegen project, zero exchanges, zero Python. At 100 TB this
is scan-bandwidth-bound, exactly as a row-local scrub should be.
Plan-asserted: no Exchange, no Python stage.""",
    "packed_texts": """\
Pack materialization (the emit step after pack assignment): ONE data
shuffle keyed by (source, pack_id) with partial_collect_list combining
map-side (ObjectHashAggregate); per-pack state is bounded by the
2048-token BUDGET by construction, never by corpus or key size; the
in-row array_sort + transform + array_join ordering is JVM-side. The
remaining subtree is contiguous_packs' audited machinery. md5 of every
emitted sequence is byte-exact against DuckDB string_agg ORDER BY.""",
    "doc_chunks": """\
Overlapping chunking is a pure scan-stage pipeline: tokenize once,
transform(sequence)+slice builds every chunk, posexplode emits them —
ZERO exchanges, zero Python. At 100 TB this is scan-bandwidth-bound and
embarrassingly parallel; chunk arithmetic (stride 56, inclusive slices)
is replayed verbatim by the DuckDB oracle against md5-pinned chunk
strings. Plan-asserted no-Exchange.""",
    "tfidf_terms": """\
TF-IDF keyword extraction: tf = one partial-combined (doc, term)
aggregate; document frequencies re-derive distinct (doc, term) from a
second column-pruned scan (Catalyst does not share the unmaterialized
tf subtree — two scans of one string column beat materializing tf
unless storage is slower than shuffle); N broadcasts as a 1-row
aggregate (the only SinglePartition); the top-k window benefits from
WindowGroupLimit — each map task keeps only k rows per doc BEFORE the
doc-id shuffle. Plan-asserted.""",
    "curation_pipeline": """\
The end-to-end curation DAG (token gate -> langid -> mixture -> train
split -> packing -> pack stats): since r07 the three row-level gates
fuse into ONE Filter above the SPREAD barrier (Scan ExistingRDD — the
lazy-localCheckpoint repartition that parallelizes the tokenize/langid
and pins the token-gate filter ABOVE the exchange; without it Catalyst
pushed the gate below the repartition and ran the regex twice, once on
the single-task scan). The mixture explode is narrow above the gate;
the only other exchanges are the packer's documented range+hash pair
plus the final two-phase count-distinct aggregate. Zero Python stages.
At 100 TB the spread is a no-op (input partitions already exceed the
session parallelism) and the corpus pays one scan + the packer's
shuffles. Plan-asserted (no Exchange between the mixture Generate and
the barrier leaf).""",
    "lanes_pipeline": """\
ONE Python stage, ZERO Exchange: span assembly (Catalyst HOFs), the JVM
morton-cell encode, and the Arrow-batched tags_to_lanes kernel with fused
in-stage locale resolution all collapse into a single narrow
MapInPandas over the scan. At 100 TB this is embarrassingly parallel —
no shuffle, no broadcast wait (the polygon covering rides inside the UDF
closure), no driver round-trip; asserted in tests/test_plans.py.""",
    "region_revenue": """\
The fact table (lineitem) is scanned once and never shuffled for the
dimensions: orders joins by SortMergeJoin/shuffle (fact-fact), while
nation and region arrive as BroadcastHashJoin (explicit F.broadcast).
Final agg is partial (map-side combine) before one exchange on r_name.""",
    "dedup_exact": """\
One shuffle total, keyed by the 16-byte md5 fingerprint; the min-id
survivor comes from a window over that same partitioning (no second
exchange). Left-semi join back to the corpus broadcasts the survivor
ids only when small — at scale it degrades to a shuffled semi join on
the id, never a cross product.""",
    "minhash_pairs": """\
Signatures: explode(shingles) -> HashAggregate with 64 min() buffers —
the per-hash work stays inside WholeStageCodegen with map-side partial
aggregation (see BENCH/BASELINE.md for the two rejected pure-expression
rewrites). In rescan mode the shingle relation checkpoints ONCE (Scan
ExistingRDD — it previously re-evaluated for the signature pass and
both verify sides; r07). Candidates: self-equi-join on (band,
band_hash) — only colliding bands co-shuffle; never an all-pairs
product. Exact-Jaccard verification re-joins the shingle arrays by id
for candidates only.""",
    "ann_ivf_nprobe4": """\
Centroid selection is one long-buffer HashAggregate + broadcast
join-back (never a corpus sort); corpus->centroid assignment is a
max(struct) partial aggregate (one combined shuffle row per vector);
probes broadcast onto the assigned corpus so only nprobe/K of the data
shuffles into the per-query ranking window.""",
    "promo_revenue": """\
Part is an explicit BroadcastHashJoin dim (the fact scan is filtered by
the pushed shipdate range before the join); the conditional promo/total
sums are ONE partial aggregate — a single exchange on p_brand.""",
    "hash_split": """\
The md5-derived split assignment is pure JVM expression work inside
WholeStageCodegen over the scan — no shuffle until the final (source,
split) partial aggregate. Determinism = reproducible splits on re-runs
and backfills with zero coordination.""",
    "doc_packing": """\
Range-partitioned two-pass prefix sum (r04): no per-key single-task
sort anywhere. Shuffle accounting (corrected r05, ADVICE r04): one
RANGE exchange on (source, doc_id) — equal-sized partitions under any
source skew — plus one well-distributed HASH exchange on (__pid,
source) feeding the local-cumsum window and the subtotal aggregate,
then a broadcast O(#partitions + #sources) subtotal-prefix stitch and
a hash join back to the input (the checkpoint holds only the slim
(key, order, token) projection since r05). The r03
per-source window serialized each source into ONE task (a 90%-skew
corpus ran on one core: 3.3-5.6x slower at 2-8M docs,
BENCH/packing_skew.py); byte-identical output, same oracle. The range
stage is localCheckpoint'ed and truncates out of this dump (both
readers scan the SAME ExistingRDD — load-bearing: exchange reuse does
NOT deduplicate the two range shuffles because column pruning makes
them non-canonical, measured round 4, and independent executions
re-sample boundaries); the RangePartitioning assert lives in
tests/test_plans.py.""",
    "doc_packing_exact": """\
The budget-strict greedy packer, distributed since r05 (VERDICT r04
#1): boundaries are searchsorted jumps over the two-pass prefix sums
(interval-bucket equi-join), compressed per (range-partition, key)
segment by a numpy doubling pass grouped by __pid, then pointer-doubled
over segment exits in log2(#partitions) join rounds. The dumped plan is
the final stitch: the flag table lives in a checkpointed leaf (the
doubling rounds were driver-side control flow, like dedup_components),
so the visible plan is the prefix-count windows + the join back to the
input — no FlatMapGroupsInPandas survives into it, and no exchange
anywhere keys a whole source into one task. 90%-skew A/B: 7.3x@2M,
9.2x@8M over the per-key sequential task (BENCH/BASELINE.md r05).""",
    "label_centroids": """\
posexplode then partial-aggregated (label, pos) means: the heavy
explode stays a narrow map, sums combine map-side, and exactly one
exchange moves labels x dims partial rows (not vectors). Fixed-width agg
buffers — no collect_list SortAggregate fallback.""",
    "dedup_components": """\
The dumped plan is the final survivor join: converged labels live in
localCheckpoint'ed blocks (each propagation round was one equi-join +
one map-side-combined min-agg, lineage truncated per round; convergence
by an exact change-join between consecutive checkpointed label leaves —
id-type-agnostic, so string doc ids work — no driver-side graph, no
collect). The corpus join is a broadcast of the small component table;
at 100 TB it degrades to a shuffled equi-join on the id, never a cross
product.""",
    "knn_round": """\
One expanding-ring round: queries explode to their k-ring cells and
equi-join the cached supercover way index (cell = join key, no distance
crossJoin); per-pair distance is a vectorized Arrow UDF; ranking is one
window per query. Ring state advances by left-semi/left-anti joins over
a localCheckpoint'ed round result — no driver collect, no IN-literals
(the loop itself is driver-side control flow, so this dumps the plan of
a single round body). Round 3: point (single-vertex) ways index through
the JVM morton encoder (the Arrow covering stage is skipped entirely for
an all-points corpus — one cheap JVM aggregate decides), and the first
ring radius is seeded from way density so provably-thin early rings are
never joined; the per-ring geometric guarantee is unchanged.""",
    "grid_binning": """\
Cell ids are pure JVM bit arithmetic (cell_expr) — the groupBy shuffles
once on the cell id with partial counts; scan->project->agg all inside
WholeStageCodegen.""",
    "s2_binning": """\
Real S2 cell ids from the Arrow-batched numpy kernel (ArrowEvalPython
stage — the north rule's prescribed shape for the encode), then one
partial-agg shuffle on the cell id. The S2 id computation itself is
hash-verified against a full DuckDB replay (oracle s2_binning).""",
    "zonal": """\
Raster side aggregates per cell first (partial agg), then equi-joins the
vector side by cell id — rasterize-then-join, never point-in-polygon per
event row.""",
    "distance_pairs": """\
Within-radius join: each left row explodes to its per-row reachable
cell ring (lon width adapts to latitude; antimeridian wraps; cell ≈
radius/4 since r07, so the ring hugs the search disc — ~2x candidate
overshoot instead of up to 14x at the old radius-sized cells), then
ONE cell equi-join against the indexed right side and the codegen'd
haversine filter — no CartesianProduct/BNLJ anywhere, no Python; both
sides spread (no-op at real input scale).""",
    "geohash_binning": """\
Geohash encode is the same Morton bit-spread chain as the grid cells
plus a base32 array lookup — all JVM bit arithmetic inside
WholeStageCodegen; one partial-agg shuffle on the geohash.""",
    "sssp_costs": """\
Bounded-hop Bellman-Ford: per round ONE equi-join onto the cached
adjacency + a map-side-combined min-agg; integer cent weights keep
sums exact. Rounds checkpoint with capped leaf stats; the dumped plan
is the final materialized distance leaf.""",
    "triangles": """\
a<b<c orientation finds each triangle once: two hash equi-joins over
the canonical checkpointed edge leaf + one partial-combined count —
no cross product; hub vertices ride AQE skew splits. r07: on graphs past 2M
edges a broadcast packed-63-bit-word Bloom filter over the edge keys
(15 bits/edge, k=2, sized from the checkpointed edge count) drops ~97%
of wedges BEFORE the closing-edge exchange — the wedge set
(sum_b in(b)·out(b), ~40x the edges on the co-purchase graph) no
longer shuffles; the unchanged exact join removes the false positives.
Below 2M edges the filter build costs more than the wedge shuffle it
saves (A/B at sf0.1) and the plan goes straight to the exact join.""",
    "trips": """\
Trip segmentation: lag window, running break count and the per-trip
roll-up all share ONE entity-keyed exchange; cross-cut steps are
zeroed so trip paths are internal-only.""",
    "market_share": """\
Q8 shape: both nation roles and the region gate ride broadcasts; ONE
fact shuffle chain; num/den sum as exact decimals with a single final
double division.""",
    "returned_revenue": """\
Q10 shape: date + returnflag predicates push to the scans, nation dim
broadcasts, top-20 is TakeOrderedAndProject on (exact-decimal revenue,
custkey) — never a global sort.""",
    "volume_customers": """\
Q18 shape: the quantity HAVING cut partial-combines map-side before
one orderkey shuffle; customer/order joins follow the filtered (small)
order set.""",
    "brand_revenue_bands": """\
Q19 shape: the OR-of-ANDs disjunction stays a pushable scan filter
(brand/size on the broadcast part side, quantity on lineitem), one
final 1-row aggregate.""",
    "revenue_cube": """\
CUBE lattice in ONE pass: Expand emits the four grouping-set rows
map-side, a single partial-combined exchange aggregates all of them —
one shuffle, not one per grouping set.""",
    "raster_peaks": """\
Non-max suppression: same scatter shape as the focal sum (center
offset excluded, max agg), then one left equi-join back — strict
compare, no cross product.""",
    "tile_pyramid": """\
Whole pyramid in ONE pass: explode each base cell to its (level,
parent) tuples, one map-side-combined groupBy — a hierarchy shuffle,
not a job per zoom level.""",
    "raster_focal": """\
Focal convolution by scatter: explode each populated cell to its 3x3
targets (constant fan-out), ONE map-side-combined regroup on the target
cell. Integer-quantized values keep the sums order-exact.""",
    "idw_events": """\
IDW interpolation = the distance-join candidate set (cell ring explode
+ ONE equi-join; both sides spread since r07 — the planner builds the
exploded point side as broadcast, so the sample side is the STREAMED
one and a single-task sample scan serialized the whole probe; ring
cells ≈ radius/4 so the candidate overshoot is ~2x not ~6x) followed
by one map-side-combined integer-sum aggregate keyed on the query
point — weights and values quantized so the mean is partitioning-order
exact.""",
    "trajectories": """\
Per-user trace roll-up: the lag window and the summary aggregate share
a single entity-keyed exchange; step distances quantize to integers
before summing. All haversine/bearing math is codegen'd JVM column
arithmetic.""",
    "cluster_stats": """\
DBSCAN→zonal composition: converged labels equi-join the points once,
then one map-side-combined aggregate per cluster (counts, bbox,
quantized-sum centroid).""",
    "dbscan_clusters": """\
Dumped plan = the final checkpointed label leaf (ε-graph, components
and border assignment run as driver-side rounds over checkpointed
blocks; the leaf is materialized so the ε-graph blocks can be freed —
ADVICE r06 #5). The ε-graph is ONE grid equi-join (distance_pairs
shape, both sides spread, cell ≈ radius/4 since r07); cores are one
map-side-combined degree agg; the point-bounded core-id/label tables
BROADCAST into the core-edge semi-joins and the border join (the
avoided shuffles are O(points x degree)); components pass
symmetric=True (the ε-graph already carries both directions — skips
the mirror-union+dedup) and broadcast the per-round labels only when
the graph is dense (avg degree >= 8, A/B'd both ways), with capped
leaf stats (util._cap_leaf_stats).""",
    "cdc_merge": """\
MERGE INTO semantics: the three-arm merge is ONE full-outer
SortMergeJoin on the key (the change batch here derives from the base
so both sides shuffle; a real daily delta takes broadcast_source=True
and the base never moves); delete filtering and matched/insert column
selection are pure codegen CASE work above the join, and the rollup
partial-combines. No per-arm passes — one join resolves all three.""",
    "cdc_compact": """\
Change-log compaction: ONE hash exchange on the log's user key feeds a
row_number window ordered by the unique event id with the
delete-preference tie-break; survivors filter inside the window stage
and the rollup partial-combines. The base table is never read — apply
survivors with merge_upsert(broadcast_source=True).""",
    "price_histogram": """\
Equi-width histogram: two partial-combined aggregates — per-group
min/max (≤ |groups| rows, BroadcastHashJoin back) and the binned count
(≤ |groups|·bins rows) — with bin assignment as pure codegen double
arithmetic. Never a sort, never a window, no Python; the same op order
is replayed by the oracle so the histogram hashes bit-equal.""",
    "part_skyline": """\
2-D Pareto frontier without the quadratic dominator join: the input
reduces map-side to one (x, min y) row per distinct x; the reduced
table range-shuffles ONCE (checkpointed — Scan ExistingRDD — so both
readers agree on partition ids, the round-4 lesson); the
strictly-preceding running MIN is per range partition with a
broadcast O(#partitions) subtotal stitch (its window is the only
SinglePartition stage, bounded by #partitions rows); the frontier
joins back as an ordinary x-keyed hash join AQE can broadcast. The
oracle is the literal NOT EXISTS dominator.""",
    "events_gapfill": """\
Densified time series: the count aggregate partial-combines map-side
to ≤ |buckets|·|keys| rows; the dense grid derives from a 1-row bounds
aggregate (explode(sequence)) × the distinct key list — both
time-span-bounded, their cross join declared and tiny — and the counts
join in as the build side. The raw events scan once; no window.""",
    "balance_deciles": """\
ntile bucketing: ONE hash exchange on the nation key feeds the decile
window over a (balance, custkey) total order (ties deterministic);
the decile stats partial-combine after it. Min/max output — no sums,
no float-order exposure.""",
    "supplier_reach": """\
Bounded-hop frontier BFS: the adjacency localCheckpoints once (the
dumped plan's leaves are the converged reached/frontier checkpoints —
rounds are driver-side control flow like dedup_components); per round
the only full-size exchanges key on the node id (frontier join,
distinct, anti-join against reached), and the frontier shrinks
monotonically. Integer distances — engine-exact vs the recursive-CTE
oracle.""",
    "value_quantiles_cont": """\
Interpolated (percentile_cont) global quantiles over a continuous
column: the token_quantiles_global machinery (range-partitioned
two-pass prefix count behind a slim checkpoint — no single-partition
window over the O(rows) histogram) answering BOTH neighbour ranks from
the same cumulative relation, then a fixed-op-order linear blend in
codegen. The only SinglePartition stages are the O(#partitions)
subtotal window and the 1-row total.""",
    "pagerank": """\
Iterative PageRank: the edge build (fact-fact join + distinct) and its
degree pre-join localCheckpoint ONCE (cache_edges=True — without it
every round re-executed the upstream join; 20.2→4.7 s at sf0.1), then
each round is one equi-join of ranks onto the materialized adjacency
leaf plus one map-side-combined sum shuffle on the destination key;
rounds past 4 iterations localCheckpoint the (node, rank) pair so the
dumped plan is the final round's leaf joins, not an unrolled tree
(measured: truncation beats re-planning the self-referencing tree even
at 5 rounds). Integer rank units (scaled long arithmetic) make every
round bit-exact across engines and partitionings — no float drift.""",
    "qsketch_chars": """\
Mergeable dyadic quantile sketch: values decompose to O(log U) dyadic
levels in the scan's narrow stage (Generate), counts partial-combine
map-side before ONE (group, level, bucket) shuffle — sketch size is
bounded by levels x buckets regardless of rows — and the quantile walk
runs over the tiny sketch table. Day→month rollups merge sketches by
summing counters, never re-reading raw data.""",
    "dq_checks": """\
Deequ-style quality report: every metric and constraint is an
aggregate over ONE scan — partial-combined map-side to a single row —
and the unpivot to (metric, value) runs on that one row. Validating a
petabyte table costs exactly one read of the referenced columns; no
per-metric pass, no Python.""",
    "pivot_events": """\
Relational PIVOT with an explicit value list: no pre-scan for distinct
pivot values, so the whole query is ONE map-side-combined aggregate
with conditional counters — a single shuffle of (cohort x 5) partial
rows regardless of event count.""",
    "nation_pairs": """\
TPC-H Q7 snowflake: supplier/customer/nation(x2 roles) all ride
BroadcastHashJoins; the only real exchange is lineitem⋈orders on the
order key plus the final partial-combined agg (≤ nations² x years
rows). Revenue sums in decimal(18,6) — order-independent, so partial
aggregation cannot flip cent boundaries against the oracle.""",
    "cheapest_supplier": """\
Argmin-per-group: ONE hash exchange on the high-cardinality part key
feeds a row_number window; WindowGroupLimit keeps each map task's
per-part top-1 BEFORE the shuffle, so the exchange carries ~1 row per
(task, part). No per-key skew exposure — parts are uniform by
construction of the key.""",
    "vocab_coverage": """\
Vocabulary coverage curve: one explode + one map-side-combined token
count (the hottest token combines hardest), selection is
TakeOrderedAndProject (per-task top-N, driver merge of N·tasks rows —
never a global sort), the corpus total is a 1-row broadcast, and the
only SinglePartition window runs over exactly top_n rows. Integer
counts make the shares bit-exact in any engine.""",
    "source_overlap": """\
Cross-source n-gram overlap matrix: ONE full-data pass (explode into
the distinct (key, gram) partial-combined aggregate); the pair join
keys on the GRAM with per-gram fan-out bounded by |keys| (never rows),
and the final count shuffles ≤ |keys|² partial rows. No all-pairs
product of documents anywhere.""",
    "fuzzy_names": """\
Blocked Levenshtein entity resolution, band flavor: both sides SPREAD
before the block join (r07 — the block-squared pair fan-out otherwise
ran on the single-task scan of a one-row-group file: 512.9 s at the
driver's sf1.0, 13 s spread), then an ordinary hash equi-join on the
(nation, segment) block key (no ordering requirement — AQE skew split
applies). The length-band filter prunes |len gap| > t pairs BEFORE any
distance call and the distance is the BANDED levenshtein(a, b, t)
(O(t·n) early-abandon, -1 past the bound — exact for survivors), all
inside whole-stage codegen — zero Python, zero crossJoin. Band is the
measured winner on this DENSE ID-like corpus (candidates ≈ output);
method='segment' (PassJoin pigeonhole — same result set, equivalence
pinned in tests) is the default and the only feasible path in the
sparse/unblocked regime (~240x at 50k rows, BENCH/BASELINE.md r06
sixth wave).""",
    "small_qty_revenue": """\
Q17 decorrelated: the per-part average is a partial-combined aggregate
hash-joined back on the part key (exactly what Catalyst would emit for
the scalar correlated subquery); part is a BroadcastHashJoin dim. The
fact table is scanned twice (avg + probe) — cheaper than caching at
100 TB since both scans prune to 3 columns. Integer-valued quantities
make the 0.2·avg threshold engine-exact.""",
    "late_suppliers": """\
Q21 quantifier chain: EXISTS compiles to a LeftSemi and NOT EXISTS to
a LeftAnti hash join, both keyed on the high-cardinality ORDER key
with non-equi supplier guards as join residuals; the supplier dim
broadcasts and top-20 is TakeOrderedAndProject. No window, no
correlated re-execution.""",
    "idle_rich": """\
Q22 shape: the balance threshold is ONE 1-row broadcast (decimal-sum /
count — exact, so the comparison cannot drift between engines), the
no-orders test is a LeftAnti hash join on the customer key, and the
per-nation rollup partial-combines to ≤ |nations| rows.""",
    "mad_outliers": """\
Robust median/MAD profile: both medians reuse grouped_quantiles'
histogram rank rule — the only full-data passes are two map-side-
combined (lang, value) aggregates; medians and MADs join back as
broadcast dims (≤ |langs| rows) and every comparison is integer. The
corpus is never sorted.""",
    "jaccard_prefix": """\
PPJoin prefix-filtered Jaccard join — the scale path for the all-pairs
ngram_jaccard baseline (lossless: equivalence pinned in
tests/test_training_ops.py). r07 shape: shingles fingerprint to
xxhash64 longs up front (8-byte keys in every exchange/probe/
intersection — the MinHash-band fingerprint-equality assumption); the
shared shingle and prefix relations checkpoint once (Scan ExistingRDD
leaves — each previously re-evaluated per join side); candidates come
from an equi-join on prefix tokens with the min>=t*max size prune AND
the PPJoin positional filter (1 + min(sz-pos) >= ceil(t/(1+t)·(sza+
szb)) — a true pair's first shared token always passes, so the pair
set is unchanged); exact Jaccard verifies BEFORE the distinct so the
dedup aggregate keys on surviving pairs only. Zero cross products —
plan-asserted.""",
}


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from osm2lanes_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    sections: list[tuple[str, str]] = []

    def grab(name, df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        sections.append((name, buf.getvalue()))

    # flagship — over a materialized input table (so the plan shows the
    # pipeline, not the bench-corpus construction)
    import tempfile

    from osm2lanes_spark.fixtures.geography import all_country_polygons
    from osm2lanes_spark.pipeline import lanes_pipeline
    import bench
    tmp = tempfile.mkdtemp()
    bench.build_bench_docs(spark, 4000).write.parquet(f"{tmp}/docs")
    docs = spark.read.parquet(f"{tmp}/docs")
    grab("lanes_pipeline", lanes_pipeline(docs, all_country_polygons(), level=10))

    for name in ("region_revenue", "dedup_exact", "minhash_pairs",
                 "grid_binning", "s2_binning", "zonal", "promo_revenue",
                 "hash_split", "doc_packing", "label_centroids",
                 "mixture_sample", "stratified_sample",
                 "asof_latest_view", "asof_bucketed", "sessions",
                 "sessions_scale", "ngram_topk", "token_quantiles",
                 "curation_pipeline", "contamination", "pii_redact",
                 "doc_chunks", "tfidf_terms", "packed_texts",
                 "line_dedup", "token_quantiles_global",
                 "duplicate_spans", "strip_spans", "classifier_score",
                 "classifier_score_trained", "budget_selection",
                 "domain_cap", "unigram_ppl", "dsir_select",
                 "ppl_buckets", "ann_pq",
                 "semdedup", "gopher_rules", "rolling_stats", "bm25",
                 "funnel", "retention", "bloom_contamination",
                 "hll_users", "interval_overlap", "order_priority",
                 "cms_tokens", "cust_order_dist", "weighted_docs",
                 "scd2_status", "pagerank", "qsketch_chars",
                 "dq_checks", "pivot_events", "nation_pairs",
                 "cheapest_supplier", "vocab_coverage",
                 "source_overlap", "fuzzy_names", "small_qty_revenue",
                 "late_suppliers", "idle_rich", "mad_outliers",
                 "jaccard_prefix", "cdc_merge", "cdc_compact",
                 "price_histogram", "part_skyline", "events_gapfill",
                 "balance_deciles", "supplier_reach",
                 "value_quantiles_cont",
                 "distance_pairs", "geohash_binning",
                 "idw_events", "trajectories", "raster_focal",
                 "triangles", "raster_peaks", "tile_pyramid",
                 "revenue_cube", "market_share", "returned_revenue",
                 "volume_customers", "brand_revenue_bands", "trips"):
        grab(name, qs[name](spark, SF_DIR))

    # dbscan: the dumped plan is the final border-assignment join over
    # the converged core labels (the ε-graph build + component rounds are
    # driver-side control flow over checkpointed blocks, like knn/cc)
    grab("dbscan_clusters", qs["dbscan_clusters"](spark, SF_DIR))
    grab("cluster_stats", qs["cluster_stats"](spark, SF_DIR))
    # sssp: the dumped plan is the checkpointed final distance leaf
    # (relaxation rounds are driver-side control flow, like pagerank)
    grab("sssp_costs", qs["sssp_costs"](spark, SF_DIR))

    # components: the dumped plan is the converged labels' final join
    # back onto the corpus (the propagation rounds are driver-side control
    # flow over checkpointed blocks, like the knn rings)
    grab("dedup_components", qs["dedup_components"](spark, SF_DIR))

    # IVF at the partial-probe config
    from osm2lanes_spark.operators.similarity import ivf_topk
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .withColumn("embedding", F.col("embedding").cast("array<double>")))
    grab("ann_ivf_nprobe4",
         ivf_topk(emb.where(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("query_id"), "embedding"),
                  emb, k=5, n_centroids=16, nprobe=4))

    grab("doc_packing_exact", qs["doc_packing_exact"](spark, SF_DIR))

    # the knn result plan (ring rounds already ran as driver-side control
    # flow; the dumped plan shows the checkpointed round unions)
    grab("knn_round", qs["knn"](spark, SF_DIR))

    out = ["# Plan audit (generated by BENCH/plan_audit.py)\n",
           "`df.explain('formatted')` of every headline query at "
           f"`{SF_DIR}`, with the 100 TB rationale per plan.\n"]
    for name, plan in sections:
        out.append(f"\n## {name}\n")
        out.append(NOTES.get(name, "") + "\n")
        out.append("```\n" + plan.rstrip() + "\n```\n")
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("wrote BENCH/PLANS.md", sum(len(p) for _, p in sections), "chars")
    spark.stop()


if __name__ == "__main__":
    main()
