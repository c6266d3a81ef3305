"""Text analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen); no Python UDFs. Each operator has a deterministic
definition so a DuckDB oracle can replicate it exactly (see
``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small function-word profile per language. Real pipelines would use
# char-n-gram profiles; marker words keep the operator fully JVM-side and
# oracle-checkable. Public-knowledge stopword lists.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "not"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que", "en", "no"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "en", "ne", "pas"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


# Engine-independent whitespace. Java regex \s is [ \t\n\x0B\f\r] while
# RE2 (DuckDB, the oracle engine) \s excludes \x0B — text containing a
# vertical tab would tokenize/normalize/redact differently across the
# two (ADVICE r05). The explicit class equals Java's \s exactly, so
# every Spark-side result is bit-identical to before; only the oracle
# side gains \x0B. Both engines accept \xhh inside a class.
WS_CHARS = r" \t\n\r\f\x0B"
WS_CLASS = rf"[{WS_CHARS}]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/whitespace-only text → empty array.

    Trims ALL leading/trailing whitespace by regex — ``F.trim`` strips
    only spaces, which would leave an empty first token (and corrupt
    every downstream n-gram/chunk/count) for tab- or newline-padded
    text. The DuckDB oracles replay the same
    ``regexp_replace(text, '^[ \\t\\n\\r\\f\\x0B]+|[ \\t\\n\\r\\f\\x0B]+$',
    '', 'g')`` trim (``WS_CLASS`` — engine-independent whitespace)."""
    trimmed = F.regexp_replace(text, rf"^{WS_CLASS}+|{WS_CLASS}+$", "")
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, rf"{WS_CLASS}+"))


def with_token_count(df: DataFrame, text_col: str = "text",
                     out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(F.col(text_col))))


def with_bpe_ish_token_count(df: DataFrame, text_col: str = "text",
                             out: str = "n_subtokens") -> DataFrame:
    """BPE-approximating count: word-piece regex splits on case/digit
    boundaries and punctuation — a deterministic proxy for tokenizer cost."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(rf"[A-Za-z]+|\d+|[^{WS_CHARS}A-Za-z\d]"), F.lit(0))
    # long words cost extra subtokens: ceil(len/6) pieces each
    return df.withColumn(
        out,
        F.aggregate(pieces, F.lit(0),
                    lambda acc, p: acc + F.ceil(F.length(p) / F.lit(6.0)).cast("int")))


def normalized(text: Column) -> Column:
    """Lowercase + collapsed whitespace — the dedup canonical form."""
    return F.trim(F.regexp_replace(F.lower(text), rf"{WS_CLASS}+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of the normalized text."""
    return df.withColumn(out, F.md5(normalized(F.col(text_col))))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length/punctuation/stopword/uppercase signals.

    quality_score ∈ [0,1]: penalizes very short docs, high punctuation
    density and absence of function words (boilerplate/code smells).
    """
    text = F.col(text_col)
    toks = tokens(text)
    n_chars = F.length(text)
    n_toks = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(rf"[^\w{WS_CHARS}]"), F.lit(0)))
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.transform(toks, F.lower), stop))
    n_upper = F.size(F.regexp_extract_all(text, F.lit(r"[A-Z]"), F.lit(0)))
    mean_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    stop_hit = F.when(n_toks > 0, F.least(F.lit(1.0), n_stop / F.lit(3.0))).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_toks / F.lit(20.0))
    score = (F.lit(0.4) * length_score + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
             + F.lit(0.2) * stop_hit + F.lit(0.1) * (F.lit(1.0) - upper_ratio))
    return (df.withColumn("n_tokens", n_toks)
            .withColumn("punct_ratio", F.round(punct_ratio, 6))
            .withColumn("upper_ratio", F.round(upper_ratio, 6))
            .withColumn("mean_token_len", F.round(mean_len, 6))
            .withColumn("quality_score", F.round(score, 6)))


def with_langid(df: DataFrame, text_col: str = "text",
                out: str = "lang_pred") -> DataFrame:
    """Marker-word language ID; deterministic argmax with code tie-break.

    Scores = count of tokens in each language's function-word profile
    (zh additionally matches by contains since it is unsegmented).
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        if lang == "zh":
            score = F.aggregate(
                F.array(*[F.lit(m) for m in markers]), F.lit(0),
                lambda acc, m: acc + F.when(F.contains(F.col(text_col), m), 1).otherwise(0))
        else:
            arr = F.array(*[F.lit(m) for m in markers])
            score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # argmax: max score wins; ties resolve to the *earliest* code, so invert
    # the lang ordering inside the comparator via array_sort on (-score, lang)
    best = F.array_sort(
        F.array(*scores),
        lambda a, b: F.when(a["score"] > b["score"], F.lit(-1))
        .when(a["score"] < b["score"], F.lit(1))
        .when(a["lang"] < b["lang"], F.lit(-1))
        .when(a["lang"] > b["lang"], F.lit(1)).otherwise(F.lit(0)))[0]
    return df.withColumn(out, best["lang"]).withColumn(out + "_score", best["score"])


# Deterministic PII-shaped patterns, applied in dict order (URLs first so
# an address inside a URL is swallowed by <URL>, not double-counted).
# Conservative syntax (explicit character classes, no lookaround) chosen
# to behave identically under Java regex (Spark) and RE2-style engines
# (the DuckDB oracle replays these verbatim).
REDACTION_PATTERNS: dict[str, tuple[str, str]] = {
    "url": (rf"https?://[^{WS_CHARS}]+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
}


def with_redactions(df: DataFrame, text_col: str = "text",
                    out: str = "redacted",
                    patterns: dict[str, tuple[str, str]] | None = None,
                    count_prefix: str = "n_") -> DataFrame:
    """Scrub PII-shaped spans from ``text_col``: each pattern is counted
    on the CURRENT text (i.e. after earlier patterns already replaced
    their spans — so an email inside a URL counts once, as a URL) and
    then globally replaced by its placeholder. Adds one ``n_<name>``
    count column per pattern plus the fully-redacted ``out`` column.

    Entirely ``regexp_extract_all``/``regexp_replace`` built-ins —
    JVM-side, codegen, zero shuffles; the curation gate before any text
    leaves the pipeline. Order = dict insertion order (deterministic,
    replayable by the oracle).
    """
    patterns = REDACTION_PATTERNS if patterns is None else patterns
    taken = [out] + [count_prefix + name for name in patterns]
    dupes = sorted({c for c in taken if taken.count(c) > 1})
    if dupes:
        raise ValueError(f"output column name(s) {dupes} collide among "
                         f"out=/count_prefix= outputs themselves")
    clashes = [c for c in taken if c in df.columns]
    if clashes:
        raise ValueError(f"output column(s) {clashes} already exist in "
                         f"the input; pass a different out=/count_prefix=")
    cur = F.col(text_col)
    counts: list[tuple[str, Column]] = []
    for name, (pat, repl) in patterns.items():
        counts.append((count_prefix + name,
                       F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))))
        cur = F.regexp_replace(cur, pat, repl)
    res = df
    for cname, cexpr in counts:
        res = res.withColumn(cname, cexpr)
    return res.withColumn(out, cur)
