"""Corpus profiling operators for training-data pipelines.

Before curating a 100 TB corpus you profile it: what are the dominant
n-grams (boilerplate detection, contamination screens), and how are
document lengths distributed (packing-budget and truncation decisions)?
Both operators here are EXACT — no sketches — yet scale-shaped:

- :func:`ngram_top_k` — exact heavy hitters over sliding word n-grams.
  The n-gram expansion is a Catalyst ``zip_with`` composition of
  shifted token arrays (JVM-side, no Python — see :func:`ngrams` for
  why not ``transform(sequence(...))``), the count is one hash
  aggregate with map-side partial combine (the shuffle carries one row
  per *distinct* n-gram per task, not one per occurrence), and the
  top-k is ``TakeOrderedAndProject`` — each task keeps only its local
  k, the driver merges k·tasks rows. Nothing materializes the full
  sorted count table.
- :func:`grouped_quantiles` — exact rank-based quantiles computed from
  a value-histogram, not a row sort. The only full-data operation is
  one map-side-combined ``groupBy(group, value).count()``; everything
  after runs on the distinct-value table (O(distinct values) rows —
  for integer token counts, thousands — never O(rows)). The quantile
  definition is the classic selection rule ``value at 1-based rank
  floor((n-1)·q) + 1`` of the ascending sort, i.e. the smallest value
  whose cumulative count reaches the target rank — deterministic and
  replayable by any engine (the DuckDB oracles in
  ``__spark_entry__.py`` do exactly that).

At 1000 executors: the n-gram shuffle is bounded by distinct n-grams
(heavy hitters combine map-side by definition — the hottest key is the
MOST combined, so skew helps rather than hurts), and the quantile
window runs over the histogram, whose size is independent of corpus
row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens
from ..util import spread as _spread  # single-file-scan guard (guide §2.5):
# a one-row-group parquet file scans as ONE task, so every explode /
# regex / md5 pass fused into the scan stage runs single-threaded
# regardless of cluster width; spreading first is a no-op once input
# partitions reach the session parallelism (the 100 TB case).


def ngrams(text: Column, n: int, lowercase: bool = True) -> Column:
    """Sliding word n-grams of ``text`` as an array column (empty when
    the text has fewer than ``n`` tokens). Pure Catalyst expressions,
    built by ``zip_with``-composing shifted token arrays — NOT by
    ``transform(sequence(...), i -> slice(toks, i, n))``: a lambda that
    references the token subtree re-evaluates the whole
    regexp-tokenization once PER ELEMENT (interpreted HOF path, no
    common-subexpression reuse), which made gram construction O(tokens)
    regex passes per document (measured 5x end-to-end on the DSIR leg).
    ``zip_with`` lambdas touch only their element arguments, so the
    tokenization runs O(n) times per row."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens(F.lower(text) if lowercase else text)
    if n == 1:
        return toks
    grams = toks
    for k in range(2, n + 1):
        # tokens shifted by k-1: positions k..size (empty when size < k)
        shifted = F.slice(
            toks, k, F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0)))
        grams = F.zip_with(
            F.slice(grams, 1, F.size(shifted)), shifted,
            lambda a, b: F.concat(a, F.lit(" "), b))
    return (F.when(F.size(toks) >= F.lit(n), grams)
            .otherwise(F.array().cast("array<string>")))


def ngram_counts(df: DataFrame, n: int = 2, text_col: str = "text",
                 lowercase: bool = True) -> DataFrame:
    """Exact corpus-wide n-gram counts: ``(ngram, count)``. One explode +
    one hash aggregate (map-side partial combine — the shuffle carries
    per-task distinct n-grams, so hot n-grams are combined hardest)."""
    grams = _spread(df, text_col).select(
        F.explode(ngrams(F.col(text_col), n, lowercase)).alias("ngram"))
    return grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("count"))


def ngram_top_k(df: DataFrame, n: int = 2, k: int = 20,
                text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """Exact top-k n-grams by count, ties broken by n-gram ascending (a
    total order, so the cut is deterministic). The plan is
    ``TakeOrderedAndProject`` over the partial-combined aggregate — no
    full sort, no full materialization."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (ngram_counts(df, n, text_col, lowercase)
            .orderBy(F.col("count").desc(), F.col("ngram").asc())
            .limit(k))


def ngram_overlap(corpus: DataFrame, reference: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  ref_text_col: str | None = None,
                  lowercase: bool = True,
                  broadcast_reference: bool = True) -> DataFrame:
    """Eval-set decontamination screen: per corpus document, how many of
    its distinct word ``n``-grams appear anywhere in ``reference`` (the
    eval/benchmark set). The standard pre-training hygiene step — docs
    with high overlap are dropped or flagged before training.

    Returns ``(id_col, n_ngrams, n_contaminated, contamination_ratio)``
    for EVERY corpus row (docs with fewer than ``n`` tokens get 0/0/NULL).

    Scale shape: with ``broadcast_reference=True`` (default — an eval
    set is small by definition) the reference's distinct n-grams are
    broadcast, so the optimizer never shuffles the corpus by gram; the
    corpus side explodes ``array_distinct`` n-grams (JVM-side), takes
    one broadcast left join, and aggregates by document id — ONE hash
    shuffle of (id, gram-stats), partial-combined. For corpus-vs-corpus
    screening where the reference itself is huge, pass
    ``broadcast_reference=False``: the gram join becomes a hash join
    partitioned by gram (one extra full-data shuffle, but no
    driver-memory ceiling). Zero-gram docs ride the SAME single pass:
    ``explode_outer`` keeps them as one null-gram row (null matches
    nothing in the join and ``count(__gram)`` skips it), so the corpus
    is scanned exactly once — no re-attach join.
    """
    from pyspark.sql.functions import broadcast

    ref_col = ref_text_col or text_col
    ref_grams = (reference
                 .select(F.explode(ngrams(F.col(ref_col), n, lowercase))
                         .alias("__gram"))
                 .distinct()
                 .withColumn("__hit", F.lit(1)))
    if broadcast_reference:
        ref_grams = broadcast(ref_grams)
    doc_grams = _spread(corpus, id_col).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(ngrams(F.col(text_col), n, lowercase)))
        .alias("__gram"))
    return (doc_grams
            .join(ref_grams, "__gram", "left")
            .groupBy(id_col)
            .agg(F.count("__gram").alias("n_ngrams"),
                 F.coalesce(F.sum("__hit"), F.lit(0)).cast("long")
                 .alias("n_contaminated"))
            .withColumn(
                "contamination_ratio",
                F.when(F.col("n_ngrams") > 0,
                       F.round(F.col("n_contaminated") / F.col("n_ngrams"),
                               6))))


def grouped_quantiles(df: DataFrame, value_col: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
                      by: str | Sequence[str] | None = None,
                      interpolate: bool = False) -> DataFrame:
    """Exact quantiles of ``value_col`` per ``by`` group (or globally).

    Selection rule: for a group of ``total`` rows, quantile ``q`` is the
    value at 1-based rank ``floor((total - 1) * q) + 1`` of the
    ascending sort — equivalently the smallest value whose cumulative
    count reaches that rank. Computed from the value histogram:

    1. ``groupBy(by, value).count()`` — the ONLY full-data pass,
       map-side combined (shuffle rows = distinct values, not rows);
    2. cumulative count + group total over the histogram. With ``by``
       groups this is a per-group window (O(distinct) rows per group —
       bounded for categorical/integer values). With ``by=None`` the
       histogram is GLOBAL, and for a high-cardinality value column
       (e.g. doubles, distinct ≈ N) a single-partition window over it
       would funnel the whole histogram through one task (VERDICT r05
       #3) — so the global flavor instead reuses the packing operator's
       range-partitioned two-pass prefix sum: repartitionByRange on the
       value, local cumulative counts per range partition, and a
       broadcast-stitched per-partition subtotal table. No task ever
       holds more than one range partition of the histogram.
    3. one generated row per requested ``q`` (array literal + explode),
       answered by ``min(value) where cum >= rank``.

    Returns ``(by?, q, value)`` sorted by (group, q). NULL values are
    excluded (rank is over non-null values, like SQL ordered-set
    aggregates). Raises on empty ``qs`` or q outside [0, 1].

    ``interpolate=True`` switches to percentile_cont semantics: with
    0-based position ``p = (total − 1)·q``, the result is the linear
    blend ``v⌊p⌋ + (p − ⌊p⌋)·(v⌊p⌋₊₁ − v⌊p⌋)`` (always a double). Both
    neighbour ranks are answered by the SAME cumulative histogram —
    no extra pass — and the blend is written in exactly that operation
    order so any engine replaying it reproduces the bits.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    if by is None:
        group_cols = []
    elif isinstance(by, str):
        group_cols = [by]
    else:
        group_cols = list(by)
    clashes = [c for c in group_cols if c in ("q", "value")]
    if clashes:
        raise ValueError(
            f"group column(s) {clashes} collide with the output columns "
            f"('q', 'value'); rename them before calling")
    hist = (df.where(F.col(value_col).isNotNull())
            .groupBy(*group_cols, value_col)
            .agg(F.count(F.lit(1)).alias("__cnt")))
    if group_cols:
        w_group = Window.partitionBy(*group_cols)
        cum = (hist
               .withColumn("__cum", F.sum("__cnt").over(
                   w_group.orderBy(value_col)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)))
               .withColumn("__total", F.sum("__cnt").over(w_group)))
    else:
        # distributed global prefix: no single-partition window over the
        # histogram (its row count is the value cardinality — unbounded
        # for continuous columns). The checkpoint pins partition ids
        # across the prefix pass's two readers (packing's measured
        # range-reshuffle pitfall); it persists only (value, count).
        from .packing import _ranged, _two_pass_prefix
        ranged = (_ranged(hist, value_col, [], None)
                  .localCheckpoint(eager=False))
        total = ranged.agg(F.sum("__cnt").alias("__total"))
        cum = (_two_pass_prefix(ranged, "__cnt", value_col, [])
               .withColumn("__cum", F.col("__pre") + F.col("__cnt"))
               .crossJoin(F.broadcast(total))
               .drop("__pre", "__pid"))
    q_lit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("__q")
    expanded = cum.select(*group_cols, value_col, "__cum", "__total", q_lit)
    pos0 = F.floor((F.col("__total") - F.lit(1)) * F.col("__q")) \
        .cast("long")
    rank = pos0 + F.lit(1)
    if not interpolate:
        return (expanded
                .groupBy(*group_cols, "__q")
                .agg(F.min(F.when(F.col("__cum") >= rank,
                                  F.col(value_col))).alias("value"))
                .withColumnRenamed("__q", "q")
                .select(*group_cols, "q", "value")
                .orderBy(*group_cols, "q"))
    rank_hi = F.least(pos0 + F.lit(2), F.col("__total"))
    v = F.col(value_col).cast("double")
    frac = ((F.col("__total") - F.lit(1)) * F.col("__q") - pos0)
    blended = (expanded
               .groupBy(*group_cols, "__q")
               .agg(F.min(F.when(F.col("__cum") >= rank, v))
                    .alias("__vlo"),
                    F.min(F.when(F.col("__cum") >= rank_hi, v))
                    .alias("__vhi"),
                    F.first(frac).alias("__frac")))
    return (blended
            .select(*group_cols, F.col("__q").alias("q"),
                    (F.col("__vlo") + F.col("__frac")
                     * (F.col("__vhi") - F.col("__vlo"))).alias("value"))
            .orderBy(*group_cols, "q"))


def tfidf_top_terms(df: DataFrame, k: int = 1, id_col: str = "doc_id",
                    text_col: str = "text",
                    lowercase: bool = True) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (smooth idf,
    ``ln((N+1)/(df+1)) + 1`` — the sklearn formulation), deterministic
    tie-break (score desc, term asc). Returns
    ``(id_col, term, tf, term_df, score)``.

    Scale shape (as actually planned — Catalyst does NOT share the
    unmaterialized ``tf`` subtree): term frequencies are one map-side-
    combined ``groupBy(id, term)``; document frequencies re-derive the
    distinct (doc, term) pairs from a SECOND column-pruned scan and
    aggregate by term — two scans of one string column, each
    partial-combined (cheaper than materializing tf at 100 TB unless
    your storage is slower than a shuffle write; ``df.persist()`` the
    input to trade scan for memory). N joins in as a broadcast 1-row
    aggregate; the idf join is keyed by term (broadcast when the
    vocabulary is small, hash otherwise — and under a Zipfian vocabulary
    a hot term like "the" hashes ALL its (doc, term) rows to one
    partition: the rows carry no per-key ordering requirement, so AQE
    skew-join splitting, on by default in
    :func:`~osm2lanes_spark.session.get_spark`, safely splits them);
    the top-k window shuffles once by doc id and Spark's
    WindowGroupLimit keeps only k rows per doc PER MAP TASK before that
    shuffle. No driver-side collect anywhere.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    text = F.col(text_col)
    toks = tokens(F.lower(text) if lowercase else text)
    pairs = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__N"))
    from pyspark.sql.functions import broadcast
    scored = (tf.join(dfreq, "term")
              .crossJoin(broadcast(n_docs))
              .withColumn(
                  "score",
                  F.round(F.col("tf")
                          * (F.log((F.col("__N") + F.lit(1)).cast("double")
                                   / (F.col("term_df") + F.lit(1)))
                             + F.lit(1.0)), 6)))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (scored
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(id_col, "term", "tf", "term_df", "score"))


# ---------------------------------------------------------------------------
# Unigram LM perplexity (CCNet-style quality signal)
# ---------------------------------------------------------------------------

def with_unigram_logprob(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         train: DataFrame | None = None,
                         alpha: float = 1.0,
                         out: str = "nll",
                         broadcast_vocab: bool = False) -> DataFrame:
    """Score every document by its mean negative log-probability under
    an add-``alpha``-smoothed unigram language model — the
    perplexity-style quality filter of CCNet (Wenzek et al. 2020 §4.3;
    boilerplate and natural prose score low, gibberish and rare-token
    spam score high; no reference counterpart — engine-side operator).

    The model is fit on ``train`` (default: ``df`` itself — the usual
    self-scored corpus profile): ``p(t) = (count(t) + alpha) /
    (total + alpha * (V + 1))``, with unseen tokens (possible only when
    ``train`` is a different corpus) falling back to the
    ``count = 0`` mass of the same formula. Returns df.* + ``out``
    (mean −ln p per token, NULL for NULL text, 0.0 for token-less
    text) + ``ppl`` (exp(out)).

    Scale shape at 100 TB: the vocabulary fit is ONE map-side-combined
    count shuffle over tokens (hot tokens combine hardest); totals ride
    a 1-row broadcast. Scoring joins exploded tokens to the vocabulary
    — a hash join by default (a web-corpus vocab is GBs; AQE's skew
    split handles hot tokens since the probe side carries no ordering),
    ``broadcast_vocab=True`` when the vocabulary is known small — then
    one map-side-combined mean per document and a join back to the
    untouched input.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    reserved = {out, "ppl"}
    clash = sorted(reserved.intersection(df.columns))
    if clash:
        raise ValueError(f"output column(s) {clash} already exist in the "
                         "input — rename them or pass a different out=")

    fit_on = df if train is None else train
    tok_train = _spread(fit_on, text_col, min_bytes=4 << 20).select(
        F.explode(tokens(F.col(text_col))).alias("__tok"))
    vocab = tok_train.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__cnt"))
    totals = F.broadcast(vocab.agg(
        F.sum("__cnt").alias("__total"),
        F.count(F.lit(1)).alias("__v")))

    scored_toks = _spread(df, id_col, min_bytes=4 << 20).select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("__tok"))
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    # log p = ln(cnt + alpha) - ln(total + alpha*(V+1)); unseen → cnt 0
    joined = (scored_toks
              .join(v, "__tok", "left")
              .crossJoin(totals)
              .withColumn(
                  "__lp",
                  F.log(F.coalesce(F.col("__cnt"), F.lit(0)) + F.lit(alpha))
                  - F.log(F.col("__total")
                          + F.lit(alpha) * (F.col("__v") + 1))))
    per_doc = (joined
               .groupBy(id_col)
               .agg((-F.avg("__lp")).alias("__nll"))
               .select(F.col(id_col).alias("__lm_id"), "__nll"))
    nll = F.when(F.col(text_col).isNotNull(),
                 F.coalesce(F.col("__nll"), F.lit(0.0)))
    return (df.join(per_doc, df[id_col] == F.col("__lm_id"), "left")
            .withColumn(out, nll)
            .withColumn("ppl", F.exp(nll))
            .drop("__lm_id", "__nll"))


def with_quantile_buckets(df: DataFrame, value_col: str,
                          qs: Sequence[float] = (1 / 3, 2 / 3),
                          labels: Sequence[str] = ("head", "middle",
                                                   "tail"),
                          out: str = "bucket",
                          decimals: int = 6) -> DataFrame:
    """Label every row by which global quantile band of ``value_col``
    it falls in — the CCNet head/middle/tail split (Wenzek et al. 2020
    §4.3: terciles of the perplexity score partition the corpus into
    quality bands; compose with
    :func:`with_unigram_logprob` for the full filter). Generic: any
    score column, any band edges.

    ``labels[i]`` is assigned where ``value <= threshold(qs[i])`` (first
    match), ``labels[-1]`` above all thresholds, NULL value → NULL
    label. Thresholds are the exact selection-rule quantiles of
    :func:`grouped_quantiles`. Both sides of each comparison are
    rounded to ``decimals`` so engine-level float-sum jitter (~1e-13)
    cannot flip a band assignment at a threshold boundary (the
    dsir_resample quantization lesson).

    Scale shape at 100 TB: the quantile pass is the global
    grouped_quantiles flavor (range-partitioned two-pass prefix over
    the value histogram — no single-partition window); the thresholds
    pivot to ONE broadcast row; the labeling is a codegen CASE over the
    untouched input. No per-row Python, no join by id.
    """
    if len(labels) != len(qs) + 1:
        raise ValueError(f"need len(qs)+1 labels, got {len(labels)} "
                         f"labels for {len(qs)} quantiles")
    if list(qs) != sorted(set(qs)):
        raise ValueError(f"qs must be strictly increasing, got {qs}")
    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists in the "
                         "input — pass a different out=")

    th = grouped_quantiles(df, value_col, qs=list(qs), by=None)
    one = F.broadcast(th.agg(*[
        F.min(F.when(F.col("q") == F.lit(float(q)), F.col("value")))
        .alias(f"__t{i}") for i, q in enumerate(qs)]))
    v = F.round(F.col(value_col), decimals)
    label = F.when(F.col(value_col).isNull(),
                   F.lit(None).cast("string"))
    for i in range(len(qs)):
        label = label.when(v <= F.round(F.col(f"__t{i}"), decimals),
                           F.lit(labels[i]))
    label = label.otherwise(F.lit(labels[-1]))
    return (df.crossJoin(one)
            .withColumn(out, label)
            .drop(*[f"__t{i}" for i in range(len(qs))]))


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

def bm25_topk(df: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Okapi BM25 top-``k`` retrieval (Robertson & Zaragoza 2009) for a
    fixed query-term set — the lexical-search complement of the
    embedding ANN operators. Returns ``(id_col, bm25)``, the ``k``
    best-scoring documents.

    idf = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) (the standard
    non-negative formulation); per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Scale shape: ONE column-pruned scan tokenizes each doc (hoisted into
    a materialized column — HOF lambdas touch only their element args,
    the interpreted-eval re-evaluation trap); the query terms explode
    against it (|terms| rows per doc, zero-tf rows dropped immediately);
    df_t is a map-side-combined count on at most |terms| keys joined
    back as a broadcast; N/avgdl ride a broadcast 1-row aggregate. The
    per-doc score folds term contributions in SORTED term order
    (array_sort -> aggregate), so the float sum is order-independent —
    partial-aggregation order can never perturb it (the dsir
    float-boundary discipline applied to SUM). Final selection is
    orderBy(quantized score, id).limit(k) — Spark plans
    TakeOrderedAndProject, a per-partition top-k + driver merge of k*P
    rows, never a single-partition global sort.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    text = F.col(text_col)
    base = (_spread(df, id_col, barrier=True)
            .select(F.col(id_col),
                    F.transform(tokens(text), F.lower).alias("_toks"))
            .withColumn("_dl", F.size(F.col("_toks")))
            .where(F.col("_dl") > 0))
    stats = F.broadcast(base.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum("_dl") / F.count(F.lit(1))).alias("_avgdl")))

    term_lits = F.array(*[F.lit(t) for t in sorted(set(terms))])
    tf_rows = (base.select(
        F.col(id_col), "_dl",
        F.explode(term_lits).alias("_term"), F.col("_toks"))
        .withColumn("_tf", F.size(F.filter(
            F.col("_toks"), lambda x: x == F.col("_term"))))
        .where(F.col("_tf") > 0)
        .drop("_toks"))
    dfreq = tf_rows.groupBy("_term").agg(F.count(F.lit(1)).alias("_dft"))

    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_dft") + F.lit(0.5))
                / (F.col("_dft") + F.lit(0.5)))
    denom = (F.col("_tf") + F.lit(k1)
             * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")))
    contrib = idf * (F.col("_tf") * F.lit(k1 + 1.0)) / denom
    scored = (tf_rows.join(F.broadcast(dfreq), "_term")
              .crossJoin(stats)
              .withColumn("_c", contrib))
    per_doc = (scored.groupBy(id_col)
               .agg(F.aggregate(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("_term"), F.col("_c")))),
                   F.lit(0.0), lambda acc, x: acc + x["_c"])
                   .alias("_score")))
    return (per_doc
            .withColumn("bm25", F.round(F.col("_score"), 6))
            .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "bm25"))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the huge-reference scale path)
# ---------------------------------------------------------------------------

def _bloom_hex32(s: Column) -> Column:
    """First 8 md5 hex chars as a 32-bit integer — the token_bucket /
    hash-uniform chain (replayable in DuckDB via strpos arithmetic)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def bloom_build(reference: DataFrame, n: int = 8, m_bits: int = 1 << 20,
                k: int = 3, text_col: str = "text", lowercase: bool = True,
                seed: int = 0) -> DataFrame:
    """Build a distributed Bloom filter over the reference set's distinct
    word n-grams: ``(word, bits)`` where word ``w`` packs filter
    positions ``[63w, 63w+62]`` into one BIGINT (63 bits per word — the
    sign bit stays clear, so shifts behave identically in every engine).

    Position ``j`` of a gram is ``md5("bf:<seed>:<j>:" + gram) mod
    m_bits`` — k independent deterministic hashes, bit-replayable in any
    engine with md5 (no xxhash in the oracle engine).

    Scale shape: explode per-doc-distinct grams × k positions, ONE
    map-side-combined ``bit_or`` groupBy on the word index — the filter
    table is at most ``m_bits/63`` rows (a 2^20-bit filter is ~16k rows
    / ~130 KB) regardless of reference size. There is deliberately NO
    global gram distinct: ``bit_or`` is idempotent, so duplicate grams
    cost only a rehash, never a shuffle — the reference's grams never
    leave their input partition, and the only Exchange in the build is
    the ≤m_bits/63-key word shuffle after the partial combine. THIS is
    the decontamination path when the eval/reference set is too large
    to broadcast as gram strings: the bloom compresses any reference to
    ``m_bits`` bits at a false-positive rate you pick via m/k.
    """
    grams = _spread(reference, text_col).select(
        F.explode(F.array_distinct(ngrams(F.col(text_col), n, lowercase)))
        .alias("__gram"))
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j")
    pos = (_bloom_hex32(F.concat(F.lit(f"bf:{seed}:"),
                                 F.col("__j").cast("string"),
                                 F.lit(":"), F.col("__gram")))
           % F.lit(m_bits))
    return (grams.select("__gram", js)
            .select((pos - pos % 63).cast("long").alias("__p0"),
                    (pos % 63).cast("int").alias("__bit"))
            .select((F.col("__p0") / 63).cast("long").alias("word"),
                    # powers of two are exact doubles at every exponent,
                    # so pow(2, bit) is a bit-replayable column shift
                    # (shiftleft only takes literal counts in the API)
                    F.pow(F.lit(2.0), F.col("__bit"))
                    .cast("long").alias("__mask"))
            .groupBy("word")
            .agg(F.bit_or("__mask").alias("bits")))


def bloom_contamination(corpus: DataFrame, bloom: DataFrame,
                        n: int = 8, m_bits: int = 1 << 20, k: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        lowercase: bool = True, seed: int = 0,
                        broadcast_bloom: bool = True) -> DataFrame:
    """Probe every corpus document's distinct n-grams against a
    ``bloom_build`` filter: ``(id, n_ngrams, n_flagged, flag_ratio)``
    where a gram is flagged iff ALL k of its filter bits are set
    (Bloom semantics — no false negatives; false-positive rate set by
    m/k, ~0.1% at m=2^20/k=3 for a few thousand reference grams).

    Scale shape: the corpus explodes distinct grams ONCE (explode_outer
    — zero-gram docs ride the same pass); each of the k probes is a
    LEFT JOIN against the (word, bits) table — broadcast by default
    (the filter is ~m_bits/63 rows, size-independent of the reference),
    or hash-partitioned with ``broadcast_bloom=False`` for gigabit
    filters; the membership test is pure bitwise codegen; one
    partial-combined groupBy on the id finishes. The corpus never
    shuffles by gram and the reference's grams never travel — the
    whole reference footprint is the m-bit filter.
    """
    from pyspark.sql.functions import broadcast

    doc_grams = _spread(corpus, id_col).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(ngrams(F.col(text_col), n, lowercase)))
        .alias("__gram"))
    probed = doc_grams
    hit = F.col("__gram").isNotNull()
    for j in range(k):
        pos = (_bloom_hex32(F.concat(F.lit(f"bf:{seed}:{j}:"),
                                     F.col("__gram")))
               % F.lit(m_bits))
        mask = F.pow(F.lit(2.0), (pos % 63).cast("int")).cast("long")
        side = bloom.select(((F.col("word"))).alias(f"__w{j}"),
                            F.col("bits").alias(f"__b{j}"))
        if broadcast_bloom:
            side = broadcast(side)
        probed = (probed
                  .withColumn(f"__word{j}",
                              ((pos - pos % 63) / 63).cast("long"))
                  .withColumn(f"__mask{j}", mask)
                  .join(side, F.col(f"__word{j}") == F.col(f"__w{j}"),
                        "left"))
        hit = hit & (F.col(f"__b{j}").isNotNull()
                     & (F.col(f"__b{j}").bitwiseAND(F.col(f"__mask{j}"))
                        == F.col(f"__mask{j}")))
    return (probed
            .groupBy(id_col)
            .agg(F.count("__gram").alias("n_ngrams"),
                 F.sum(F.when(hit, 1).otherwise(0)).alias("n_flagged"))
            .withColumn("flag_ratio",
                        F.when(F.col("n_ngrams") > 0,
                               F.round(F.col("n_flagged")
                                       / F.col("n_ngrams"), 6))))


def dq_report(df: DataFrame, metrics: dict[str, Column],
              checks: dict[str, Column] | None = None) -> DataFrame:
    """Deequ-style single-pass data-quality report.

    ``metrics`` maps metric name → an aggregate Column (count, null
    count, distinct count, min/max, ratios …); ``checks`` maps
    constraint name → a boolean aggregate predicate. Everything is
    computed in ONE ``agg`` over the input — one scan, one
    partial-combined reduction to a single row, however many metrics —
    then unpivoted to the long ``(metric, value)`` shape dashboards
    and freshness monitors ingest. Check results are encoded 1.0/0.0
    so the report is a single double-typed column.

    100 TB shape: the scan is the only full-data pass; every aggregate
    partial-combines map-side, the unpivot runs on ONE row. Validating
    a petabyte table costs exactly one read of the columns referenced.
    """
    checks = checks or {}
    names = list(metrics) + list(checks)
    if len(set(names)) != len(names):
        raise ValueError("metric and check names must be distinct")
    aggs = [c.cast("double").alias(n) for n, c in metrics.items()]
    aggs += [F.when(c, 1.0).otherwise(0.0).alias(n)
             for n, c in checks.items()]
    one = df.agg(*aggs)
    return (one.unpivot([], names, "metric", "value")
            .select("metric", F.round("value", 6).alias("value")))


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   top_n: int = 100, lowercase: bool = True) -> DataFrame:
    """Tokenizer-vocabulary coverage curve: the ``top_n`` most frequent
    tokens with their cumulative corpus-coverage share — the standard
    diagnostic for sizing a vocabulary (what fraction of all token
    occurrences the first N entries absorb).

    Returns ``(rank, token, cnt, cum_share)`` ordered by count
    descending, token ascending (deterministic tie-break);
    ``cum_share`` is rounded to 6 decimals. Counts and the total are
    exact integers, so the ratio is bit-identical in any engine.

    100 TB shape: one explode + one map-side-combined count shuffle
    (the hottest token combines hardest); selection is
    ``TakeOrderedAndProject`` (per-task top-N, driver merge of N·tasks
    rows — never a global sort); the corpus total rides a 1-row
    broadcast and the ranking window runs over exactly ``top_n`` rows.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    col = F.col(text_col)
    toks = _spread(df, text_col, min_bytes=4 << 20).select(
        F.explode(tokens(F.lower(col) if lowercase else col))
        .alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()) \
                .limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (top.crossJoin(F.broadcast(total))
            .select(F.row_number().over(w).alias("rank"),
                    "token", "cnt",
                    F.round(F.sum("cnt").over(cum) / F.col("__total"), 6)
                    .alias("cum_share")))


def key_ngram_overlap(df: DataFrame, key_col: str, text_col: str = "text",
                      n: int = 3, lowercase: bool = True) -> DataFrame:
    """Pairwise n-gram overlap matrix between key groups (e.g. corpus
    sources): for every pair ``key_a < key_b``, the number of distinct
    word n-grams both groups contain. The cross-source screening step
    before mixing corpora — high overlap means shared boilerplate or
    scraped-twice content that exact per-document dedup misses.

    100 TB shape: the only full-data pass is the explode into the
    distinct ``(key, gram)`` aggregate (map-side partial combine — a
    billion-occurrence gram collapses per map task); the pair join is
    an equi-join ON THE GRAM whose fan-out per gram is bounded by the
    number of keys carrying it (≤ |keys|, never rows), and the final
    count shuffles at most |keys|² partial rows. No all-pairs product
    anywhere.
    """
    grams = (_spread(df, text_col)
             .select(F.col(key_col).alias("key_a"),
                     F.explode(ngrams(F.col(text_col), n, lowercase))
                     .alias("gram"))
             .distinct())
    other = grams.select(F.col("key_a").alias("key_b"), "gram")
    return (grams.join(other, "gram")
            .where(F.col("key_a") < F.col("key_b"))
            .groupBy("key_a", "key_b")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def numeric_histogram(df: DataFrame, value_col: str, bins: int = 20,
                      by: "str | None" = None) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bin, lo_edge,
    hi_edge, n)``, optionally per ``by`` group with PER-GROUP bounds.
    Nulls are dropped; the max value lands in the last bin (half-open
    bins, closed on top).

    Engine-exact: bin assignment is ``floor((v − lo) · bins / (hi −
    lo))`` clamped to ``bins − 1`` — identical IEEE double arithmetic
    in any engine, so the histogram hashes bit-equal cross-engine.

    100 TB shape: TWO passes — a per-group min/max partial-combined
    aggregate (≤ |groups| rows, broadcast back; 1-row broadcast when
    ``by=None``) and the binned count (partial-combined, ≤
    |groups|·bins rows). The data is never sorted and no window runs.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value_col).cast("double")
    data = df.where(v.isNotNull())
    group = [by] if by else []
    bounds = (data.groupBy(*group)
              .agg(F.min(v).alias("__lo"), F.max(v).alias("__hi")))
    joined = (data.join(F.broadcast(bounds), on=group) if group
              else data.crossJoin(F.broadcast(bounds)))
    span = F.col("__hi") - F.col("__lo")
    bin_ = F.when(span > 0,
                  F.least(F.lit(bins - 1),
                          F.floor((v - F.col("__lo")) * bins / span)
                          .cast("int"))).otherwise(F.lit(0))
    return (joined.withColumn("bin", bin_.cast("int"))
            .groupBy(*group, "bin", "__lo", "__hi")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(*group, "bin",
                    F.round(F.col("__lo")
                            + F.col("bin") * (F.col("__hi")
                                              - F.col("__lo")) / bins,
                            6).alias("lo_edge"),
                    F.round(F.col("__lo")
                            + (F.col("bin") + 1)
                            * (F.col("__hi") - F.col("__lo")) / bins,
                            6).alias("hi_edge"),
                    "n"))


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str,
                       num_partitions: "int | None" = None) -> DataFrame:
    """2-D Pareto frontier (skyline), minimizing both columns: rows for
    which no other row is ≤ in both dimensions and strictly < in at
    least one. Identical duplicates are NOT dominated by each other
    (both survive) — the standard skyline semantics, and exactly what
    a ``NOT EXISTS`` dominator oracle computes.

    The multi-objective profiling primitive (cheapest-AND-smallest
    part, best quality at lowest perplexity, …) without the quadratic
    dominator join.

    100 TB shape (the packing/sessionize range-prefix discipline, here
    as a prefix-MIN): the input reduces to one ``(x, min y)`` row per
    distinct x (map-side-combined aggregate); that reduced table
    range-shuffles ONCE on x (checkpointed — two readers must agree on
    partition ids, the measured round-4 divergence), the
    strictly-preceding running min is local per range partition, and
    partitions stitch through a broadcast O(#partitions) subtotal
    whose only single-partition window covers #partitions rows. The
    frontier test is then a broadcast-sized semi-join back onto the
    input. No global sort of the data, no per-key window, no cross
    product.
    """
    x, y = F.col(x_col), F.col(y_col)
    data = df.where(x.isNotNull() & y.isNotNull())
    red = data.groupBy(x_col).agg(F.min(y).alias("__ymin"))
    ranged = (red.repartitionByRange(num_partitions, x.asc())
              if num_partitions
              else red.repartitionByRange(x.asc()))
    ranged = (ranged.withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=False))
    w_loc = (Window.partitionBy("__pid").orderBy(x.asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    sub = ranged.groupBy("__pid").agg(F.min("__ymin").alias("__sub"))
    w_sub = (Window.orderBy(F.col("__pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    carry = sub.select("__pid", F.min("__sub").over(w_sub).alias("__carry"))
    frontier_x = (ranged.join(F.broadcast(carry), "__pid")
                  .withColumn("__prev",
                              F.least(F.min("__ymin").over(w_loc),
                                      F.col("__carry")))
                  .where(F.col("__prev").isNull()
                         | (F.col("__ymin") < F.col("__prev")))
                  .select(x_col, "__ymin"))
    # no forced broadcast: a frontier is TYPICALLY tiny (AQE broadcasts
    # it at runtime) but anti-correlated data can make it O(distinct x),
    # where this must stay an ordinary x-keyed hash join
    return (data.join(frontier_x, on=x_col)
            .where(y == F.col("__ymin"))
            .drop("__ymin"))
