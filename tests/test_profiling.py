"""Unit tests for operators/profiling.py (exact n-gram heavy hitters and
histogram-based exact quantiles). The sf0.01 DuckDB cross-checks live in
test_oracle_parity.py (``ngram_topk``, ``token_quantiles``,
``curation_pipeline``); these pin the operator-level edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2lanes_spark.operators.profiling import (grouped_quantiles,
                                                 ngram_counts, ngram_top_k,
                                                 ngrams)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ngrams_basic_and_short_text(spark):
    df = _docs(spark, [("a", "The quick brown fox"),
                       ("b", "one"),
                       ("c", ""),
                       ("d", "   "),
                       ("e", "Tab\tand  newline\nsplit")])
    out = {r["doc_id"]: r["g"] for r in
           df.select("doc_id", ngrams(F.col("text"), 2).alias("g")).collect()}
    assert out["a"] == ["the quick", "quick brown", "brown fox"]
    assert out["b"] == []          # fewer tokens than n
    assert out["c"] == []          # empty text
    assert out["d"] == []          # whitespace-only text
    assert out["e"] == ["tab and", "and newline", "newline split"]


def test_ngrams_n1_equals_tokens_and_case_toggle(spark):
    df = _docs(spark, [("a", "One TWO two")])
    lowered = df.select(ngrams(F.col("text"), 1).alias("g")).first()["g"]
    assert lowered == ["one", "two", "two"]
    kept = df.select(
        ngrams(F.col("text"), 1, lowercase=False).alias("g")).first()["g"]
    assert kept == ["One", "TWO", "two"]
    with pytest.raises(ValueError, match="n must be"):
        ngrams(F.col("text"), 0)


def test_ngram_top_k_counts_and_tiebreak(spark):
    # "b c" and "a b" both occur twice; tie resolves ngram-ascending,
    # and k cuts INSIDE the tie group deterministically
    df = _docs(spark, [("1", "a b c"), ("2", "b c d"), ("3", "a b")])
    counts = {r["ngram"]: r["count"]
              for r in ngram_counts(df, n=2).collect()}
    assert counts == {"a b": 2, "b c": 2, "c d": 1}
    top = [(r["ngram"], r["count"])
           for r in ngram_top_k(df, n=2, k=2).collect()]
    assert top == [("a b", 2), ("b c", 2)]
    top1 = [(r["ngram"], r["count"])
            for r in ngram_top_k(df, n=2, k=1).collect()]
    assert top1 == [("a b", 2)]
    with pytest.raises(ValueError, match="k must be"):
        ngram_top_k(df, k=0)


def test_grouped_quantiles_selection_rule(spark):
    # group g: values 10,20,30,40 (n=4): rank(q)=floor(3q)+1
    #   q=0    -> rank 1 -> 10        q=0.5 -> rank 2 -> 20
    #   q=0.75 -> rank 3 -> 30        q=1   -> rank 4 -> 40
    rows = [("g", v) for v in (40, 10, 30, 20)] + [("h", 7)]
    df = spark.createDataFrame(rows, "grp string, v int")
    out = {(r["grp"], r["q"]): r["value"]
           for r in grouped_quantiles(df, "v", (0.0, 0.5, 0.75, 1.0),
                                      by="grp").collect()}
    assert out == {("g", 0.0): 10, ("g", 0.5): 20, ("g", 0.75): 30,
                   ("g", 1.0): 40,
                   ("h", 0.0): 7, ("h", 0.5): 7, ("h", 0.75): 7,
                   ("h", 1.0): 7}


def test_grouped_quantiles_global_duplicates_and_nulls(spark):
    # duplicates weight the histogram; NULLs are excluded from ranks
    rows = [(1,), (1,), (1,), (9,), (None,)]
    df = spark.createDataFrame(rows, "v int")
    out = {r["q"]: r["value"]
           for r in grouped_quantiles(df, "v", (0.5, 1.0)).collect()}
    # n=4 non-null: rank(0.5)=floor(1.5)+1=2 -> 1; rank(1)=4 -> 9
    assert out == {0.5: 1, 1.0: 9}


def test_grouped_quantiles_global_high_cardinality_doubles(spark):
    """VERDICT r05 #3: the by=None flavor must stay exact when every
    value is distinct (continuous column — histogram rows ≈ N), the
    regime where the old single-partition window was the scale-killer.
    Oracle: the selection rule applied to the python sort."""
    import random

    rnd = random.Random(13)
    vals = [rnd.uniform(-1e6, 1e6) for _ in range(5003)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    got = {r.q: r.value for r in grouped_quantiles(df, "v", qs).collect()}
    srt = sorted(vals)
    want = {q: srt[int((len(srt) - 1) * q)] for q in qs}
    assert got == pytest.approx(want)


def test_grouped_quantiles_validation(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(df, "v", ())
    with pytest.raises(ValueError, match="outside"):
        grouped_quantiles(df, "v", (1.5,))


def test_ngram_overlap_counts_and_zero_gram_docs(spark):
    from osm2lanes_spark.operators.profiling import ngram_overlap

    corpus = _docs(spark, [
        ("c1", "the quick brown fox jumps"),   # grams incl. "the quick"
        ("c2", "totally different words here"),
        ("c3", "tiny"),                        # < n tokens -> 0 grams
        ("c4", "the quick the quick brown"),   # duplicate grams count once
    ])
    ref = _docs(spark, [("e1", "I saw the quick brown dog")])
    out = {r["doc_id"]: (r["n_ngrams"], r["n_contaminated"],
                         r["contamination_ratio"])
           for r in ngram_overlap(corpus, ref, n=2).collect()}
    # ref grams: "i saw","saw the","the quick","quick brown","brown dog"
    assert out["c1"] == (4, 2, 0.5)        # "the quick","quick brown"
    assert out["c2"] == (3, 0, 0.0)
    assert out["c3"] == (0, 0, None)       # ratio NULL for gramless docs
    # c4 distinct grams: "the quick","quick the","quick brown" -> 2 hits
    assert out["c4"] == (3, 2, round(2 / 3, 6))


def test_with_redactions_order_and_counts(spark):
    from osm2lanes_spark.operators.text import with_redactions

    df = _docs(spark, [
        ("a", "mail a@b.co and c@d.org now"),
        ("b", "see https://x.io/u?e=a@b.co deep"),   # email inside URL
        ("c", "clean text"),
    ])
    out = {r["doc_id"]: (r["n_url"], r["n_email"], r["redacted"])
           for r in with_redactions(df).collect()}
    assert out["a"] == (0, 2, "mail <EMAIL> and <EMAIL> now")
    # the URL pass swallows the embedded address -> email count 0
    assert out["b"] == (1, 0, "see <URL> deep")
    assert out["c"] == (0, 0, "clean text")


def test_with_redactions_custom_patterns(spark):
    from osm2lanes_spark.operators.text import with_redactions

    df = _docs(spark, [("a", "ssn 123-45-6789 twice 987-65-4321")])
    out = with_redactions(
        df, patterns={"ssn": (r"\d{3}-\d{2}-\d{4}", "<SSN>")}).first()
    assert out["n_ssn"] == 2
    assert out["redacted"] == "ssn <SSN> twice <SSN>"


def test_chunk_documents_boundaries(spark):
    from osm2lanes_spark.operators.packing import chunk_documents

    df = _docs(spark, [
        ("a", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  # 10 toks
        ("b", "x y"),                              # <= chunk -> 1 chunk
        ("c", ""),                                 # empty -> 0 chunks
    ])
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1)
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"],
                                           r["n_chunk_tokens"])
           for r in out.collect()}
    # stride 3: starts at tokens 1, 4, 7, ceil((10-1)/3)=3 chunks,
    # every token covered, chunk 2 overlaps chunk 3 by one token
    assert got[("a", 0)] == ("t1 t2 t3 t4", 4)
    assert got[("a", 1)] == ("t4 t5 t6 t7", 4)
    assert got[("a", 2)] == ("t7 t8 t9 t10", 4)
    assert got[("b", 0)] == ("x y", 2)
    assert not any(k[0] == "c" for k in got)


def test_chunk_documents_short_tail_and_validation(spark):
    import pytest as _pytest

    from osm2lanes_spark.operators.packing import chunk_documents

    df = _docs(spark, [("a", "t1 t2 t3 t4 t5")])  # 5 toks, chunk 4, ov 1
    out = sorted((r["chunk_idx"], r["chunk_text"]) for r in
                 chunk_documents(df, ("text"), 4, 1).collect())
    # ceil((5-1)/3)=2 chunks; the tail chunk is short (2 tokens)
    assert out == [(0, "t1 t2 t3 t4"), (1, "t4 t5")]
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with _pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_tfidf_top_terms_values(spark):
    import math

    from osm2lanes_spark.operators.profiling import tfidf_top_terms

    df = _docs(spark, [
        ("a", "apple apple banana"),
        ("b", "banana cherry"),
        ("c", "cherry cherry cherry durian"),
    ])
    out = {r["doc_id"]: (r["term"], r["tf"], r["term_df"], r["score"])
           for r in tfidf_top_terms(df, k=1).collect()}
    idf = lambda d: math.log(4 / (d + 1)) + 1  # N=3 -> (N+1)=4
    assert out["a"] == ("apple", 2, 1, round(2 * idf(1), 6))
    # b: banana tf1 df2, cherry tf1 df2 -> tie on score, term asc wins
    assert out["b"][0] == "banana"
    assert out["c"] == ("cherry", 3, 2, round(3 * idf(2), 6))


def test_ngram_overlap_non_broadcast_path_same_result(spark):
    from osm2lanes_spark.operators.profiling import ngram_overlap

    corpus = _docs(spark, [("c1", "the quick brown fox jumps"),
                           ("c2", "totally different words here"),
                           ("c3", "tiny")])
    ref = _docs(spark, [("e1", "I saw the quick brown dog")])
    a = sorted(map(tuple, ngram_overlap(corpus, ref, n=2).collect()))
    b = sorted(map(tuple, ngram_overlap(
        corpus, ref, n=2, broadcast_reference=False).collect()))
    assert a == b
    # and the non-broadcast plan really does drop the broadcast hint
    plan = ngram_overlap(corpus, ref, n=2, broadcast_reference=False) \
        ._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan


def test_grouped_quantiles_multi_column_groups(spark):
    rows = [("g", "x", 1), ("g", "x", 3), ("g", "y", 9), ("h", "x", 5)]
    df = spark.createDataFrame(rows, "a string, b string, v int")
    out = {(r["a"], r["b"], r["q"]): r["value"]
           for r in grouped_quantiles(df, "v", (0.0, 1.0),
                                      by=["a", "b"]).collect()}
    assert out == {("g", "x", 0.0): 1, ("g", "x", 1.0): 3,
                   ("g", "y", 0.0): 9, ("g", "y", 1.0): 9,
                   ("h", "x", 0.0): 5, ("h", "x", 1.0): 5}


def test_with_redactions_column_collision_raises(spark):
    import pytest as _pytest

    from osm2lanes_spark.operators.text import with_redactions

    df = _docs(spark, [("a", "x")]).withColumn("n_url", F.lit(1))
    with _pytest.raises(ValueError, match="already exist"):
        with_redactions(df)


# --- round-5 review regressions -------------------------------------------

def test_with_redactions_self_collision_raises(spark):
    import pytest as _pytest

    from osm2lanes_spark.operators.text import with_redactions

    df = _docs(spark, [("a", "see https://x.io now")])
    # out name equal to a generated count name used to silently destroy
    # the count column
    with _pytest.raises(ValueError, match="collide among"):
        with_redactions(df, out="n_url")


def test_grouped_quantiles_reserved_group_names_raise(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1)], "q string, v int")
    with _pytest.raises(ValueError, match="collide with the output"):
        grouped_quantiles(df, "v", (0.5,), by="q")
    # a VALUE column named q is fine (internals are __-prefixed)
    df2 = spark.createDataFrame([("g", 1), ("g", 3)], "grp string, q int")
    out = {r["q"]: r["value"] for r in
           grouped_quantiles(df2, "q", (0.0, 1.0), by="grp").collect()}
    assert out == {0.0: 1, 1.0: 3}


def test_whitespace_class_engine_parity_on_vertical_tab(spark):
    """ADVICE r05: Java \\s includes \\x0B, RE2 (DuckDB) \\s does not —
    the explicit WS_CLASS must make both engines tokenize and normalize
    vertical-tab text identically."""
    import duckdb

    from osm2lanes_spark.operators.text import WS_CLASS, normalized, tokens

    text = "\x0Balpha\x0Bbeta gamma\t\x0B"
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(tokens(F.col("text")).alias("t"),
                    normalized(F.col("text")).alias("n")).first()
    assert row["t"] == ["alpha", "beta", "gamma"]
    assert row["n"] == "alpha beta gamma"
    con = duckdb.connect()
    trim = f"regexp_replace(?, '^{WS_CLASS}+|{WS_CLASS}+$', '', 'g')"
    duck = con.execute(
        f"SELECT regexp_split_to_array({trim}, '{WS_CLASS}+'),"
        f" trim(regexp_replace(lower(?), '{WS_CLASS}+', ' ', 'g'))",
        [text, text]).fetchone()
    assert duck[0] == row["t"] and duck[1] == row["n"]
    # and the OLD '\\s' disagreement is real (regression guard: RE2
    # leaves \x0B in place, so the classes are not interchangeable)
    legacy = con.execute(
        r"SELECT regexp_replace(?, '^\s+|\s+$', '', 'g')", [text]).fetchone()
    assert legacy[0] != "alpha\x0Bbeta gamma"  # \x0B not stripped by RE2


def test_tokens_strip_all_whitespace(spark):
    """F.trim strips only spaces: tab/newline-padded text used to leak
    an empty first token into every gram/chunk/count."""
    from osm2lanes_spark.operators.packing import chunk_documents
    from osm2lanes_spark.operators.text import tokens
    from osm2lanes_spark.operators.profiling import ngrams as _ngrams

    df = _docs(spark, [("a", "\tfoo bar\n"), ("b", " \t\n ")])
    toks = {r["doc_id"]: r["t"] for r in
            df.select("doc_id", tokens(F.col("text")).alias("t")).collect()}
    assert toks["a"] == ["foo", "bar"]
    assert toks["b"] == []          # whitespace-only -> empty, not ['']
    grams = df.select("doc_id", _ngrams(F.col("text"), 2).alias("g")) \
        .collect()
    assert {r["doc_id"]: r["g"] for r in grams} == {"a": ["foo bar"],
                                                    "b": []}
    chunks = chunk_documents(df, chunk_tokens=1).collect()
    got = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"],
                  r["n_chunk_tokens"]) for r in chunks)
    assert got == [("a", 0, "foo", 1), ("a", 1, "bar", 1)]


def test_chunk_token_count_is_arithmetic(spark):
    """n_chunk_tokens = least(chunk, remaining), never a re-split of the
    joined string (which both recomputed and miscounted)."""
    from osm2lanes_spark.operators.packing import chunk_documents

    df = _docs(spark, [("a", "t1 t2 t3 t4 t5 t6 t7")])  # 7 toks
    out = sorted((r["chunk_idx"], r["n_chunk_tokens"]) for r in
                 chunk_documents(df, chunk_tokens=3, overlap_tokens=1)
                 .collect())
    # stride 2: ceil((7-1)/2)=3 chunks at 1,3,5 -> sizes 3,3,3
    assert out == [(0, 3), (1, 3), (2, 3)]
    out2 = sorted((r["chunk_idx"], r["n_chunk_tokens"]) for r in
                  chunk_documents(df, chunk_tokens=4, overlap_tokens=0)
                  .collect())
    assert out2 == [(0, 4), (1, 3)]  # arithmetic short tail


def test_pack_texts_order_and_global(spark):
    from osm2lanes_spark.operators.packing import pack_texts

    rows = [("s", 2, "bb", 0), ("s", 1, "aa", 0), ("s", 3, "cc", 1),
            ("t", 9, "zz", 0)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, text string, pack_id long")
    out = {(r["source"], r["pack_id"]): (r["n_docs"], r["pack_text"])
           for r in pack_texts(df, part_col="source").collect()}
    # concatenation strictly in doc_id order regardless of input order
    assert out[("s", 0)] == (2, "aa bb")
    assert out[("s", 1)] == (1, "cc")
    assert out[("t", 0)] == (1, "zz")
    glob = {r["pack_id"]: r["pack_text"]
            for r in pack_texts(df.drop("source")).collect()}
    assert glob == {0: "aa bb zz", 1: "cc"}


def test_pack_texts_duplicate_order_keys_tiebreak_by_text(spark):
    """ADVICE r05: duplicated order keys tie-break by the text itself
    (struct sort's second field) — deterministic, and the documented
    contract any external replay must add to its ORDER BY."""
    from osm2lanes_spark.operators.packing import pack_texts

    rows = [("s", 1, "bb", 0), ("s", 1, "aa", 0), ("s", 1, "cc", 0)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, text string, pack_id long")
    out = pack_texts(df, part_col="source").collect()
    assert len(out) == 1 and out[0]["pack_text"] == "aa bb cc"


# ---------------------------------------------------------------------------
# with_unigram_logprob (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------

def test_unigram_logprob_matches_python(spark):
    import math

    from osm2lanes_spark.operators.profiling import with_unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in with_unigram_logprob(df).collect()}
    # corpus: a:2 b:2 c:1, total 5, V=3; p(t) = (c+1)/(5+1*4)
    p = {"a": 3 / 9, "b": 3 / 9, "c": 2 / 9}
    nll1 = -(math.log(p["a"]) * 2 + math.log(p["b"])) / 3
    nll2 = -(math.log(p["b"]) + math.log(p["c"])) / 2
    assert out[1].nll == pytest.approx(nll1)
    assert out[2].nll == pytest.approx(nll2)
    assert out[1].ppl == pytest.approx(math.exp(nll1))
    # token-less text scores 0 (ppl 1); NULL text stays NULL
    assert out[3].nll == 0.0 and out[3].ppl == 1.0
    assert out[4].nll is None and out[4].ppl is None


def test_unigram_logprob_external_train_and_unseen(spark):
    import math

    from osm2lanes_spark.operators.profiling import with_unigram_logprob

    train = spark.createDataFrame([(10, "x x y")],
                                  "doc_id long, text string")
    score = spark.createDataFrame([(1, "x z")],
                                  "doc_id long, text string")
    out = with_unigram_logprob(score, train=train).collect()[0]
    # train: x:2 y:1, total 3, V=2; p(x)=(2+1)/(3+3)=.5,
    # unseen z → (0+1)/(3+3)
    want = -(math.log(0.5) + math.log(1 / 6)) / 2
    assert out.nll == pytest.approx(want)


def test_unigram_logprob_flavors_and_validation(spark):
    from osm2lanes_spark.operators.profiling import with_unigram_logprob

    df = spark.createDataFrame(
        [(i, f"t{i % 3} common") for i in range(20)],
        "doc_id long, text string")
    hashj = {(r.doc_id, round(r.nll, 9))
             for r in with_unigram_logprob(df).collect()}
    bcast = {(r.doc_id, round(r.nll, 9))
             for r in with_unigram_logprob(
                 df, broadcast_vocab=True).collect()}
    assert hashj == bcast
    with pytest.raises(ValueError, match="alpha"):
        with_unigram_logprob(df, alpha=0)
    with pytest.raises(ValueError, match="already exist"):
        with_unigram_logprob(df.withColumn("ppl", F.lit(1.0)))


# ---------------------------------------------------------------------------
# with_quantile_buckets (CCNet head/middle/tail split)
# ---------------------------------------------------------------------------

def test_quantile_buckets_semantics(spark):
    from osm2lanes_spark.operators.profiling import with_quantile_buckets

    # values 1..9: terciles of the selection rule are rank
    # floor(8*q)+1 → t0 = value at rank 3 (=3), t1 = rank 6 (=6)
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 10)],
                               "doc_id long, score double")
    got = {r.doc_id: r.bucket
           for r in with_quantile_buckets(df, "score").collect()}
    assert got == {1: "head", 2: "head", 3: "head",
                   4: "middle", 5: "middle", 6: "middle",
                   7: "tail", 8: "tail", 9: "tail"}


def test_quantile_buckets_nulls_custom_and_validation(spark):
    from osm2lanes_spark.operators.profiling import with_quantile_buckets

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, None)],
        "doc_id long, score double")
    # single threshold (median of 1..4 = rank floor(3*.5)+1 = 2): two bands
    got = {r.doc_id: r.b
           for r in with_quantile_buckets(
               df, "score", qs=(0.5,), labels=("lo", "hi"),
               out="b").collect()}
    assert got == {1: "lo", 2: "lo", 3: "hi", 4: "hi", 5: None}
    with pytest.raises(ValueError, match="labels"):
        with_quantile_buckets(df, "score", qs=(0.5,), labels=("a",))
    with pytest.raises(ValueError, match="increasing"):
        with_quantile_buckets(df, "score", qs=(0.7, 0.3),
                              labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="already exist"):
        with_quantile_buckets(df.withColumn("bucket", F.lit("x")), "score")


def test_quantile_buckets_quantized_boundary(spark):
    from osm2lanes_spark.operators.profiling import with_quantile_buckets

    # a value 1e-13 above the threshold rounds onto it at 6 decimals →
    # same band as the threshold (the float-jitter discipline: sub-1e-6
    # differences cannot flip a band)
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 2.0 + 1e-13), (4, 9.0)],
        "doc_id long, score double")
    got = {r.doc_id: r.bucket
           for r in with_quantile_buckets(
               df, "score", qs=(0.5,), labels=("lo", "hi"),
               out="bucket").collect()}
    # median rank floor(3*.5)+1 = 2 → t = 2.0; doc 3 quantizes to 2.0
    assert got == {1: "lo", 2: "lo", 3: "lo", 4: "hi"}


def test_dq_report_metrics_checks_and_dup_names(spark):
    from osm2lanes_spark.operators.profiling import dq_report

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k long, s string")
    got = {r.metric: r.value for r in dq_report(
        df,
        {"rows": F.count(F.lit(1)),
         "null_k": F.count_if(F.col("k").isNull()),
         "distinct_s": F.countDistinct("s")},
        {"no_null_k": F.count_if(F.col("k").isNull()) == 0,
         "has_rows": F.count(F.lit(1)) > 0}).collect()}
    assert got == {"rows": 4.0, "null_k": 1.0, "distinct_s": 2.0,
                   "no_null_k": 0.0, "has_rows": 1.0}
    with pytest.raises(ValueError, match="distinct"):
        dq_report(df, {"x": F.count(F.lit(1))},
                  {"x": F.count(F.lit(1)) > 0})


def test_vocab_coverage_ranks_and_shares(spark):
    from osm2lanes_spark.operators.profiling import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "A b  a"), (3, "   ")],
        "doc_id long, text string")
    rows = vocab_coverage(df, top_n=2).collect()
    # totals: a=4 (lowercased), b=2, c=1 → 7 tokens
    assert [(r.rank, r.token, r.cnt) for r in rows] == [(1, "a", 4),
                                                        (2, "b", 2)]
    assert rows[0].cum_share == round(4 / 7, 6)
    assert rows[1].cum_share == round(6 / 7, 6)
    with pytest.raises(ValueError, match="top_n"):
        vocab_coverage(df, top_n=0)


def test_key_ngram_overlap_counts_distinct_shared(spark):
    from osm2lanes_spark.operators.profiling import key_ngram_overlap

    df = spark.createDataFrame(
        [("s1", "x y z w"), ("s1", "x y z"), ("s2", "X y z q"),
         ("s3", "nothing shared here"), ("s2", "too")],
        "source string, text string")
    got = {(r.key_a, r.key_b): r.n_shared
           for r in key_ngram_overlap(df, "source", n=3).collect()}
    # shared distinct 3-grams s1∩s2: only "x y z" (case-folded);
    # "too" has <3 tokens → no grams; s3 shares nothing
    assert got == {("s1", "s2"): 1}


def test_edit_distance_pairs_blocking_band_and_threshold(spark):
    from osm2lanes_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "B", "kitten"), (2, "B", "sitten"), (3, "B", "sittin"),
         (4, "B", "kitchen"), (5, "C", "kitten"), (6, "B", "aaaaaaaaaa")],
        "id long, blk string, name string")
    got = {(r.id_a, r.id_b): r.distance
           for r in edit_distance_pairs(
               df, id_col="id", text_col="name", block_by=("blk",),
               threshold=2).collect()}
    # 1-2 (1 sub), 1-3 (2 subs), 2-3 (1 sub), 1-4 (t→c sub + h ins);
    # 2-4/3-4 are distance 3/4 (out); 5 is another block even though
    # identical to 1; 6 is out of the length band
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 1, (1, 4): 2}
    # unblocked flavor crosses blocks (declared all-pairs baseline)
    full = {(r.id_a, r.id_b): r.distance
            for r in edit_distance_pairs(
                df, id_col="id", text_col="name", threshold=0).collect()}
    assert full == {(1, 5): 0}
    with pytest.raises(ValueError, match="threshold"):
        edit_distance_pairs(df, id_col="id", text_col="name",
                            threshold=-1)
    with pytest.raises(ValueError, match="method"):
        edit_distance_pairs(df, id_col="id", text_col="name",
                            method="nope")


def test_edit_distance_segment_equals_band_mixed_lengths(spark):
    """The PassJoin pigeonhole path returns EXACTLY the banded result
    on a corpus with empty, short (< 2t+1) and long strings at every
    threshold — the equivalence that licenses sharing one oracle."""
    from osm2lanes_spark.operators.dedup import edit_distance_pairs

    rows, h = [], lambda i, j: (i * 2654435761 + j * 40503) % 5
    for i in range(120):
        L = (i * 7) % 13  # lengths 0..12, includes empties
        rows.append((i, i % 2, "".join("abcde"[h(i, j)]
                                       for j in range(L))))
    df = spark.createDataFrame(rows, "id long, blk int, name string")
    for t in (0, 1, 2, 3):
        band = {(r.id_a, r.id_b): r.distance
                for r in edit_distance_pairs(
                    df, "id", "name", ("blk",), t,
                    method="band").collect()}
        seg = {(r.id_a, r.id_b): r.distance
               for r in edit_distance_pairs(
                   df, "id", "name", ("blk",), t,
                   method="segment").collect()}
        assert seg == band, t
    assert band  # the corpus actually produces matches at t=3


def test_numeric_histogram_bins_edges_and_degenerate(spark):
    from osm2lanes_spark.operators.profiling import numeric_histogram

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 2.5), ("a", 5.0), ("a", 10.0), ("a", None),
         ("b", 7.0), ("b", 7.0)],
        "g string, v double")
    got = {(r.g, r.bin): (r.lo_edge, r.hi_edge, r.n)
           for r in numeric_histogram(df, "v", bins=4, by="g").collect()}
    # group a: lo=0 hi=10, width 2.5; max value clamps into last bin
    assert got[("a", 0)] == (0.0, 2.5, 1)
    assert got[("a", 1)] == (2.5, 5.0, 1)
    assert got[("a", 2)] == (5.0, 7.5, 1)
    assert got[("a", 3)] == (7.5, 10.0, 1)
    # degenerate group (span 0) → everything in bin 0
    assert got[("b", 0)] == (7.0, 7.0, 2)
    # global flavor: one bounds row, nulls dropped
    g = {r.bin: r.n for r in numeric_histogram(df, "v", bins=2).collect()}
    assert g == {0: 2, 1: 4}
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(df, "v", bins=0)


def test_pareto_frontier_2d_semantics(spark):
    from osm2lanes_spark.operators.profiling import pareto_frontier_2d

    df = spark.createDataFrame(
        [(1, 1.0, 9), (2, 2.0, 5), (3, 2.0, 7),   # 3 dominated by 2
         (4, 3.0, 5),                              # dominated by 2 (y tie, x worse)
         (5, 4.0, 2), (6, 4.0, 2),                 # identical duplicates both kept
         (7, 5.0, 1), (8, 6.0, 3),                 # 8 dominated by 5/7
         (9, None, 0), (10, 0.5, None)],           # nulls excluded
        "id long, x double, y int")
    got = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
    assert got == [1, 2, 5, 6, 7]
    # python brute-force oracle on a pseudo-random cloud
    pts = [(i, float((i * 37) % 101), ((i * 53) % 97))
           for i in range(300)]
    big = spark.createDataFrame(pts, "id long, x double, y int")
    want = sorted(i for i, x, y in pts
                  if not any((x2 <= x and y2 <= y and (x2 < x or y2 < y))
                             for _, x2, y2 in pts))
    assert sorted(r.id for r in
                  pareto_frontier_2d(big, "x", "y").collect()) == want


def test_grouped_quantiles_interpolated(spark):
    # values 10,20,30,40 (n=4): p(q)=3q → q=0.5: p=1.5 → 20+0.5*10=25;
    # q=0/1 hit exact ranks; grouped flavor too
    df = spark.createDataFrame(
        [("g", v) for v in (40, 10, 30, 20)] + [("h", 7)],
        "grp string, v int")
    out = {(r.grp, r.q): r.value
           for r in grouped_quantiles(df, "v", (0.0, 0.5, 1.0),
                                      by="grp",
                                      interpolate=True).collect()}
    assert out == {("g", 0.0): 10.0, ("g", 0.5): 25.0, ("g", 1.0): 40.0,
                   ("h", 0.0): 7.0, ("h", 0.5): 7.0, ("h", 1.0): 7.0}
    # global distributed path agrees with numpy's linear interpolation
    import numpy as np

    vals = [float((i * 31) % 97) + 0.25 for i in range(500)]
    big = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.q: r.value
           for r in grouped_quantiles(big, "v", (0.1, 0.5, 0.77),
                                      interpolate=True).collect()}
    for q, v in got.items():
        assert v == pytest.approx(float(np.quantile(vals, q)), abs=1e-9)
