"""Text-analysis operators for training-data pipelines.

All per-row work is JVM built-in expressions (regexp_count, length,
split) — whole-stage codegen, no Python UDFs. Heuristics are deliberately
SQL-expressible so DuckDB oracles can replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.rounding import round2

# tiny marker-word sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "los", "que", "es", "y"],
    "it": ["il", "che", "di", "e", "sono"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _word_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def token_count(text: Column) -> Column:
    r"""Whitespace token count (regexp \S+)."""
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: split words and punctuation like a GPT-2
    pre-tokenizer would (letters runs, digit runs, punctuation singles)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality scores: length, token stats, punctuation/digit/upper
    ratios, stopword ratio, mean word length."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)

    def ratio(c):
        # round_bin double-rounding, NOT F.round (CLAUDE.md invariant:
        # F.round rounds the shortest decimal repr and disagrees with
        # DuckDB on true ...5 boundaries); NaN -> NULL for SQL semantics
        r = round2(c, 7, 4)
        return F.when(F.isnan(r), F.lit(None)).otherwise(r)

    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_tokens": n_tok,
            "q_punct_ratio": ratio(F.regexp_count(t, F.lit(r"[.,;:!?]")) / n_chars),
            "q_digit_ratio": ratio(F.regexp_count(t, F.lit(r"[0-9]")) / n_chars),
            "q_upper_ratio": ratio(F.regexp_count(t, F.lit(r"[A-Z]")) / n_chars),
            "q_stopword_ratio": ratio(_word_count(t, STOPWORDS) / n_tok),
            "q_mean_word_len": ratio(F.regexp_count(t, F.lit(r"\S")) / n_tok),
        }
    )


DEFAULT_QUALITY_RULES: list[tuple[str, str]] = [
    # (rule name, SQL boolean expr over quality_features columns) — a doc
    # is kept iff EVERY rule holds; the first failing rule is recorded
    # (C4/Gopher-style heuristic filter chain, fully JVM-evaluated)
    ("min_chars", "q_n_chars >= 32"),
    ("min_tokens", "q_n_tokens >= 8"),
    ("max_punct", "q_punct_ratio IS NULL OR q_punct_ratio <= 0.2"),
    ("max_digit", "q_digit_ratio IS NULL OR q_digit_ratio <= 0.3"),
    ("mean_word_len", "q_mean_word_len BETWEEN 2 AND 12"),
]


def quality_filter(
    df: DataFrame,
    rules: list[tuple[str, str]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Heuristic quality-filter chain for training-data curation: adds
    `keep` (all rules pass) and `drop_reason` (first failing rule, NULL
    when kept). One scan, whole-stage codegen; rules are plain SQL
    predicates over the quality feature columns so the chain is
    oracle-replicable and user-extensible."""
    rules = rules if rules is not None else DEFAULT_QUALITY_RULES
    q = quality_features(df, text_col)
    keep = F.lit(True)
    reason = F.lit(None).cast("string")
    # first failing rule wins: build the CASE from the last rule backward
    for name, expr in reversed(rules):
        ok = F.expr(expr)
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    for _, expr in rules:
        keep = keep & F.expr(expr)
    return q.withColumn("keep", keep).withColumn("drop_reason", reason)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts,
    'und' when no marker matches. Deterministic tie-break by language code
    order (greatest-with-struct trick keeps it one JVM expression)."""
    t = F.col(text_col)
    scored = F.array(
        *[
            F.struct(
                _word_count(t, words).alias("score"),
                # invert code so ties pick the alphabetically-first language
                F.lit(len(LANG_MARKERS) - i).alias("pref"),
                F.lit(code).alias("lang"),
            )
            for i, (code, words) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        "lang_pred", F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    ).withColumn("lang_score", best["score"])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased text with
    whitespace collapsed — catches trivial reformat duplicates."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Winnowing (Schleimer et al.): per window of `window` consecutive
    k-gram hashes keep the minimum -> robust local fingerprints.
    JVM-side: shingle hashes via transform, window minima via transform
    over an index sequence + slice + array_min, then explode distinct.
    hash_family='md5' = cross-engine hash for DuckDB oracle parity."""
    from ..functions.hashing import md5_64

    gram_hash = md5_64 if hash_family == "md5" else F.xxhash64
    t = F.col(text_col)
    # guard: Spark sequence(1, 0) is the DESCENDING [1, 0], not empty
    n = F.length(t) - F.lit(k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(idx, lambda i: gram_hash(t.substr(i, F.lit(k))))
    nw = F.size(hashes) - F.lit(window - 1)
    widx = F.when(nw >= 1, F.sequence(F.lit(1), nw)).otherwise(
        F.array().cast("array<int>")
    )
    mins = F.transform(
        widx, lambda i: F.array_min(F.slice(hashes, i, window))
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp"))
    )
