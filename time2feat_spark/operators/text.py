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


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher-style repetition/structure signals (Rae et al. 2021,
    "Scaling Language Models", App. A quality heuristics; same family as
    C4's rules) for training-data curation:

    - ``rep_dup_line_frac``: fraction of non-empty lines that are
      repeats of an earlier line.
    - ``rep_dup_line_char_frac``: fraction of line characters sitting in
      those repeated occurrences.
    - ``rep_bullet_line_frac`` / ``rep_ellipsis_line_frac``: fraction of
      lines starting with a bullet / ending with an ellipsis.
    - ``rep_top{n}gram_char_frac``: chars covered by the single most
      frequent word n-gram / total chars, for each n in ``ngram_ns``.

    Scale posture: the line rules are pure array expressions (one scan,
    no shuffle). Duplicate detection is O(L log L) per doc: repeats =
    total - distinct, and the chars they cover fall out of `array_sort`
    — after sorting, exactly the occurrences equal to their left
    neighbor are the repeat occurrences, so one zip-with-shifted pass
    sums their lengths. (The pre-r5 formulation re-scanned all earlier
    lines per line — O(L^2) per doc, a scale-killer on 100k-line crawl
    docs that this operator sees BEFORE any length filtering.)
    The n-gram mode is NOT expressible without a per-doc quadratic blow-
    up on long docs, so it uses the standard scalable shape: explode ->
    two-level aggregate keyed on (doc, n, gram) -> max-struct per doc —
    shuffles are partitioned by doc and combine map-side.
    """
    t = F.col(text_col)
    lines = F.filter(
        F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    # occurrence i is a REPEAT if an earlier index holds the same line:
    # repeats = total - distinct, and their chars come from one sorted
    # adjacent-equal pass (zip each sorted line with its left neighbor
    # via a null-padded shift; zip_with pads the shorter side with NULL,
    # so the extra tail element compares null==x -> 0)
    rep_lines = n_lines - F.size(F.array_distinct(lines))
    sorted_lines = F.array_sort(lines)
    prev_padded = F.concat(
        F.array(F.lit(None).cast("string")), sorted_lines
    )
    rep_chars = F.aggregate(
        F.zip_with(
            sorted_lines,
            prev_padded,
            lambda cur, prev: F.when(cur == prev, F.length(cur)).otherwise(0),
        ),
        F.lit(0),
        lambda acc, c: acc + c,
    )

    def frac(num, den):
        # try_divide: zero lines/chars => NULL (ANSI mode raises on /0)
        r = round2(F.try_divide(num, den), 7, 4)
        return F.when(F.isnan(r), F.lit(None)).otherwise(r)

    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    with_lines = df.withColumns(
        {
            "rep_dup_line_frac": frac(rep_lines, n_lines),
            "rep_dup_line_char_frac": frac(rep_chars, line_chars),
            "rep_bullet_line_frac": frac(bullets, n_lines),
            "rep_ellipsis_line_frac": frac(ellipsis, n_lines),
        }
    )

    # --- top n-gram coverage: explode -> count -> max-struct per doc ---
    words = F.filter(
        F.split(F.lower(t), r"\s+"), lambda w: F.length(w) > 0
    )
    # closure factories, NOT default-arg lambdas: a two-parameter lambda
    # in F.transform is the (element, index) form, so `lambda g, n=n`
    # would silently bind n to the ELEMENT INDEX
    def _gram_of(nv):
        return lambda i: F.concat_ws(" ", F.slice(words, i.cast("int"), nv))

    def _tag_of(nv):
        return lambda g: F.struct(F.lit(nv).alias("n"), g.alias("gram"))

    gram_structs = []
    for n in ngram_ns:
        gi = F.when(
            F.size(words) - (n - 1) >= 1,
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(gi, _gram_of(n))
        gram_structs.append(F.transform(grams, _tag_of(n)))
    exploded = df.select(
        F.col(id_col),
        F.length(t).alias("_nc"),
        F.explode(F.flatten(F.array(*gram_structs))).alias("g"),
    )
    top = (
        exploded.groupBy(id_col, "_nc", F.col("g.n").alias("_n"),
                         F.col("g.gram").alias("_gram"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col, "_nc", "_n")
        .agg(
            F.max(
                F.struct(
                    F.col("_cnt"),
                    (F.col("_cnt") * F.length("_gram")).alias("_chars"),
                )
            )["_chars"].alias("_top_chars")
        )
        .groupBy(id_col)
        .pivot("_n", list(ngram_ns))
        .agg(
            F.first(
                round2(F.try_divide(F.col("_top_chars"), F.col("_nc")), 7, 4)
            )
        )
    )
    renamed = top.select(
        F.col(id_col),
        *[
            F.col(str(n)).alias(f"rep_top{n}gram_char_frac")
            for n in ngram_ns
        ],
    )
    return with_lines.join(renamed, id_col, "left")


#: Gopher-flavored keep-rules over repetition_features columns, usable
#: with quality_filter(rules=...) after joining the features (thresholds
#: from the published Gopher table, rounded).
GOPHER_REPETITION_RULES: list[tuple[str, str]] = [
    ("dup_line_frac", "rep_dup_line_frac IS NULL OR rep_dup_line_frac <= 0.3"),
    ("dup_line_char_frac",
     "rep_dup_line_char_frac IS NULL OR rep_dup_line_char_frac <= 0.2"),
    ("bullet_lines",
     "rep_bullet_line_frac IS NULL OR rep_bullet_line_frac <= 0.9"),
    ("ellipsis_lines",
     "rep_ellipsis_line_frac IS NULL OR rep_ellipsis_line_frac <= 0.3"),
    ("top2gram", "rep_top2gram_char_frac IS NULL OR rep_top2gram_char_frac <= 0.2"),
    ("top3gram", "rep_top3gram_char_frac IS NULL OR rep_top3gram_char_frac <= 0.18"),
    ("top4gram", "rep_top4gram_char_frac IS NULL OR rep_top4gram_char_frac <= 0.16"),
]


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


# ---------------------------------------------------------------------------
# PII / boilerplate redaction (C4-style cleanup)
# ---------------------------------------------------------------------------

#: (placeholder, java regex) applied in order — order matters: URLs are
#: matched before emails so "user@host" inside a URL is not re-redacted,
#: and emails before bare domains would be if a domain rule is added.
REDACTION_PATTERNS: list[tuple[str, str]] = [
    ("<URL>", r"(?i)\bhttps?://[^\s<>\"]+|\bwww\.[^\s<>\"]+"),
    ("<EMAIL>", r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"),
    ("<IP>", r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
             r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"),
    # country code OPTIONAL: plain 10-digit forms (555-123-4567,
    # (555) 123-4567) must match too, not only +1-prefixed ones. The
    # trailing guard rejects a CONTINUING number (digit, or .digit as in
    # decimals/IPs) but must allow a sentence-ending period.
    ("<PHONE>", r"(?<![\d.])(?:\+?\d{1,2}[\s.-]?)?\(?\d{3}\)?[\s.-]?"
                r"\d{3}[\s.-]?\d{4}(?!\.?\d)"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    out_col: str = "text_redacted",
) -> DataFrame:
    """Replace URLs / emails / IPs / phone numbers with typed
    placeholders and count the replacements per category — the standard
    pre-training scrub. One chained `regexp_replace` expression per
    pattern, whole-stage codegen, no Python. Each category is counted
    against the text AFTER the earlier patterns were applied, so
    `redact_<name>` equals the number of replacements that pattern
    actually made (an email swallowed inside an already-redacted URL is
    NOT counted — counts and the redacted text always agree). Adds
    `{out_col}` plus `redact_<name>` count columns (name = placeholder
    without brackets, lowercased)."""
    patterns = patterns if patterns is not None else REDACTION_PATTERNS
    red = F.col(text_col)
    counts = {}
    for placeholder, pat in patterns:
        name = placeholder.strip("<>").lower()
        # count on the progressively-redacted state (the expression tree
        # repeats the earlier replaces per count column; all codegen)
        counts[f"redact_{name}"] = F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, placeholder)
    return df.withColumns({out_col: red, **counts})


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    candidates_per_partition: int | None = None,
    with_guarantee: bool = False,
) -> DataFrame:
    """Top-k most frequent values WITHOUT shuffling the full key space:
    pass 1 computes per-partition frequency summaries and keeps each
    partition's top candidates (Misra-Gries/SpaceSaving argument: any
    value with global count > N/(c+1) survives in at least one
    partition's top-c summary); pass 2 exactly recounts ONLY the
    candidate set via a broadcast semi-join. At corpus scale this
    replaces a shuffle keyed on EVERY distinct token (billions of
    groups, giant hash state) with one keyed on <= 16c * partitions
    candidates; pass-1 worker state is BOUNDED at O(c) via batched
    Misra-Gries decrements: whenever the summary exceeds 16c entries,
    the (4c+1)-th largest count is subtracted from every entry and
    non-positive ones dropped. Each decrement step removes >= 4c*thresh
    mass, so the threshes sum to <= N_p/(4c), and EVERY entry still in
    the summary is yielded as a candidate (ranking residuals and cutting
    at c would break this — residuals depend on arrival order). Hence
    any value with partition frequency > N_p/(4c) reaches pass 2 and its
    final count is exact. Pick c >> k (default 8k) for slack on
    skewless data.

    `with_guarantee=True` adds a constant `guarantee_bound` column: the
    total decrement mass across all partition summaries. Any value
    absent from the candidate set has global count <= that bound, so
    the result is PROVABLY the exact top-k iff its k-th `count` exceeds
    `guarantee_bound`; when it does not (adversarially flat data with a
    too-small c), callers should re-run with a larger
    `candidates_per_partition` instead of trusting the tail. Computing
    the bound materializes the candidate pass eagerly (one
    localCheckpoint + a scalar agg) — the default stays fully lazy."""
    import pandas as pd

    c = candidates_per_partition or 8 * k
    keep_at, prune_at = 4 * c, 16 * c
    field = df.schema[col]

    def summarize(batches):
        counts: dict = {}
        dec = 0  # total decrement mass = this partition's undercount bound
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf[col].value_counts()
            for v, n in vc.items():
                counts[v] = counts.get(v, 0) + int(n)
            if len(counts) > prune_at:
                # batched Misra-Gries decrement: bound state at O(c)
                thresh = sorted(counts.values(), reverse=True)[keep_at]
                dec += thresh
                counts = {v: n - thresh for v, n in counts.items() if n > thresh}
        if not counts:
            return
        if len(counts) > prune_at:
            thresh = sorted(counts.values(), reverse=True)[keep_at]
            dec += thresh
            counts = {v: n - thresh for v, n in counts.items() if n > thresh}
        # the WHOLE surviving summary (<= 16c entries) is the candidate
        # set — see the survival guarantee in the docstring; _dec rides
        # along on the first row only so sum(_dec) = sum over partitions
        yield pd.DataFrame(
            {col: list(counts), "_dec": [dec] + [0] * (len(counts) - 1)}
        )

    from pyspark.sql.types import LongType, StructField, StructType

    summary = df.select(col).mapInPandas(
        summarize, StructType([field, StructField("_dec", LongType())])
    )
    bound = None
    if with_guarantee:
        # candidate pass is read twice (bound agg + semi join) — reuse
        # via localCheckpoint, NOT cache() (CLAUDE.md: checkpoint blocks
        # are reclaimed by the ContextCleaner; cache() entries leak)
        summary = summary.localCheckpoint(eager=True)
        bound = summary.agg(F.sum("_dec")).first()[0] or 0
    cand = summary.select(col).distinct()
    exact = (
        df.join(F.broadcast(cand), col, "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    out = exact.orderBy(F.desc("count"), F.asc(col)).limit(k)
    if with_guarantee:
        out = out.withColumn("guarantee_bound", F.lit(bound).cast("long"))
    return out


# --------------------------------------------------------------------------
# term weighting / retrieval / decontamination (r5)
# --------------------------------------------------------------------------


def _words(t: Column) -> Column:
    """Lowercased whitespace tokens as an array (empty strings dropped)."""
    return F.filter(F.split(F.lower(t), r"\s+"), lambda w: F.length(w) > 0)


def word_ngrams(t: Column, n: int) -> Column:
    """Array of space-joined word n-grams of `t` (empty when the doc has
    fewer than n words).

    Built by zipping n shifted slices of the word array instead of a
    transform-over-index-sequence with per-position F.slice — the
    zip-of-shifts form is ~6x faster (measured at sf0.1: 0.86 s vs
    5.0 s for the corpus bigram aggregate) because each shift is ONE
    array op instead of one slice allocation per gram position. The
    slice length is clamped to >= 0 (negative length raises; 0 yields
    the empty array for docs shorter than n words).

    Each shifted slice is aliased explicitly before zipping: arrays_zip
    derives struct field names from its input EXPRESSIONS, which for
    non-attribute inputs is version-sensitive auto-numbering — the
    alias pins '0'..'n-1' regardless of Spark version."""
    words = _words(t)
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    shifts = [F.slice(words, k + 1, m).alias(str(k)) for k in range(n)]
    zipped = F.arrays_zip(*shifts)
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn's smooth_idf convention: idf = ln((N+1)/(df+1)) + 1).

    Returns (id, term, tf, df_t, tfidf, rank) with rank 1..k per doc,
    tie-broken (tfidf desc, term asc) on the ROUNDED score so both
    engines order identically.

    Scale shape: explode -> map-side-combined groupBy (doc, term) for tf;
    term-keyed groupBy for document frequency; the (N)-row corpus-size agg
    is broadcast. The tf<->df join shuffles on term — the unavoidable
    vocabulary-keyed exchange — and everything stays whole-stage codegen
    (no Python). Survives 100 TB: state per key is O(1), no per-doc
    vocabulary is ever collected."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(_words(F.col(text_col))).alias("term"))
    # tf feeds BOTH the df_t aggregate and the score join; without reuse
    # Spark recomputes its lineage (a second full corpus scan + explode).
    # localCheckpoint, not cache() (CLAUDE.md: checkpoint blocks are
    # reclaimed by the ContextCleaner; cache() entries leak)
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("_n"))
    idf = F.log((F.col("_n") + 1) / (F.col("df_t") + 1)) + 1
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", round2(F.col("tf") * idf, 7, 4))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_t", "tfidf", "rank")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a bag-of-words query
    (Robertson & Zaragoza 2009 formulation):

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)

    Cross-engine determinism: each per-term score is snapped to an exact
    integer micro-score floor(s*1e6 + 0.5) BEFORE the per-doc sum, so the
    summation is integer arithmetic (order-independent — a float sum's
    value depends on reduction order, which Spark does not fix); the
    reported `score` re-scales and rounds to 4 decimals and is the sort
    key, doc id breaking ties.

    Scale shape: the corpus is tokenized ONCE — a per-doc pass keeps
    (id, dl, query-term hits) and is checkpointed, so the (N, avgdl)
    stats agg and the postings explode both read the tiny per-doc frame
    instead of re-tokenizing the corpus (r6: the stats branch was a
    second full tokenize pass). Only query-term hits are ever exploded
    (the candidate set, not the corpus vocabulary, is shuffled); corpus
    stats are one broadcast agg row; final top-k is TakeOrdered (no
    global sort materialization)."""
    terms = [t.lower() for t in query_terms]
    words = _words(F.col(text_col))
    terms_lit = F.array(*[F.lit(t) for t in terms])
    perdoc = df.select(
        F.col(id_col),
        F.size(words).alias("dl"),
        F.filter(words, lambda w: F.array_contains(terms_lit, w)).alias(
            "_hits"
        ),
    ).localCheckpoint(eager=True)  # ONE tokenize: feeds stats AND postings
    tf = (
        perdoc.select(F.col(id_col), "dl", F.explode("_hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # avg over an exact integer sum/count — partitioning-independent
    stats = perdoc.agg(
        F.count_distinct(F.col(id_col)).alias("_n"),
        F.avg(F.col("dl")).alias("_avgdl"),
    )
    idf = F.log((F.col("_n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1)
    s = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    micro = (F.floor(F.abs(s * 1e6) + F.lit(0.5)) * F.signum(s)).cast("long")
    per_doc = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_ms", micro)
        .groupBy(id_col)
        .agg(
            F.sum("_ms").alias("_msum"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .select(
            F.col(id_col),
            round2(F.col("_msum") / 1e6, 7, 4).alias("score"),
            "n_terms_hit",
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose word n-grams
    overlap an evaluation set (the GPT-3 appendix-C / PaLM n-gram
    collision rule — training docs sharing enough n-grams with a test
    benchmark must be dropped before training).

    Per corpus doc over its DISTINCT word n-grams:
      decon_ngrams — how many; decon_hits — how many also occur anywhere
      in the eval set; decon_frac = hits/ngrams (NULL when the doc has
      fewer than n words); decon_flag = frac >= threshold.

    Scale shape: the eval n-gram set (benchmarks are ~MBs vs a 100 TB
    corpus) is collapsed to DISTINCT and broadcast — the corpus side
    streams through a broadcast left-join with NO corpus shuffle on the
    gram key; the only corpus exchange is the per-doc (id, gram)
    de-duplicating aggregate, keyed on the doc id. Docs with zero
    n-grams are preserved via the final left join."""
    grams = word_ngrams(F.col(text_col), n)
    eval_set = (
        eval_df.select(F.explode(grams).alias("gram")).distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = (
        corpus.select(F.col(id_col), F.explode(grams).alias("gram"))
        .distinct()
    )
    agg = (
        doc_grams.join(F.broadcast(eval_set), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("decon_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("decon_hits"),
        )
    )
    frac = round2(F.try_divide(F.col("decon_hits"), F.col("decon_ngrams")), 7, 4)
    return (
        corpus.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("decon_ngrams", F.lit(0)).alias("decon_ngrams"),
            F.coalesce("decon_hits", F.lit(0)).alias("decon_hits"),
            frac.alias("decon_frac"),
            F.coalesce(frac >= threshold, F.lit(False)).alias("decon_flag"),
        )
    )


def unigram_crossentropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-style quality score from a corpus-self-trained unigram
    LM (the shape of CCNet's KenLM filter, Wenzek et al. 2020, with the
    n-gram model reduced to unigrams so it trains in one aggregate):
    per doc, the average negative log-likelihood of its tokens under
    the corpus token distribution p(t) = count(t)/N, plus the
    perplexity exp(H). Boilerplate/templated docs score LOW (their
    tokens are corpus-frequent), lorem-ipsum/noise scores HIGH — filter
    both tails like CCNet's head/middle/tail buckets.

    Cross-engine determinism: each token's -ln p is snapped to an
    integer micro-score before the tf-weighted per-doc sum (float
    reduction order never matters — the BM25 pattern); H and ppl are
    round_bin'd after one final division/exp.

    Scale shape: token stats are one map-side-combined explode +
    two-level aggregate; the per-term model joins the per-doc tf table
    on the term key (the vocabulary exchange); N rides along as a
    broadcast one-row agg. Output: (id, n_tokens, xent, ppl) — xent in
    nats; docs with no tokens get NULLs."""
    toks = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    )
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)  # feeds term counts AND the score join
    )
    ct = tf.groupBy("term").agg(F.sum("tf").alias("c_t"))
    n_total = tf.agg(F.sum("tf").alias("_n"))
    neg_ln_p = -F.log(F.col("c_t") / F.col("_n"))
    micro = (F.floor(F.abs(neg_ln_p * 1e6) + F.lit(0.5))).cast("long")
    per_doc = (
        tf.join(ct, "term")
        .crossJoin(F.broadcast(n_total))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * micro).alias("_msum"),
            F.sum("tf").alias("n_tokens"),
        )
    )
    h = F.col("_msum") / 1e6 / F.col("n_tokens")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            round2(h, 7, 4).alias("xent"),
            round2(F.exp(h), 7, 4).alias("ppl"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information
    (Church & Hanks 1990): PMI(a,b) = ln(c_ab * N / (c_a * c_b)) over
    adjacent word pairs, with a `min_count` support floor (PMI without
    support surfaces hapax noise). Classic vocabulary/phrase-mining
    pass over a corpus ("new york", "machine learning").

    N is the bigram total; unigram counts use the same token stream.
    Ranked on the ROUNDED score (ties: bigram asc) so engines order
    identically. Scale shape: two explode+aggregate passes (bigrams,
    unigrams) joined on the word keys — map-side combined, vocabulary-
    keyed exchanges only; top-k is TakeOrdered. The bigram pass groups
    on the (w1, w2) word PAIR and builds the "w1 w2" display string
    only for the groups that survive the support floor (r6) — the
    previous form concatenated a bigram string per corpus position and
    then re-split it per surviving group, so every occurrence paid a
    string allocation that the aggregate immediately discarded."""
    words = _words(F.col(text_col))
    m2 = F.greatest(F.size(words) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(words, 1, m2).alias("0"), F.slice(words, 2, m2).alias("1")
    )
    big = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
        .withColumn("bigram", F.concat_ws(" ", "w1", "w2"))
    )
    uni = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # joined twice (w1 and w2)
    )
    n_big = df.select(
        F.coalesce(
            F.sum(F.greatest(F.size(words) - 1, F.lit(0))), F.lit(0)
        ).alias("_n")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        F.col("c_ab").cast("double") * F.col("_n")
        / (F.col("c_a").cast("double") * F.col("c_b"))
    )
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_big))
        .select(
            "bigram", "c_ab", "c_a", "c_b",
            round2(pmi, 7, 4).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


def source_kl_divergence(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mixture diagnostics: KL(p_source || p_corpus) of each source's
    unigram token distribution against the whole corpus — the standard
    'how far does this slice drift from the mix' number used when
    re-weighting training mixtures (large KL = distinct vocabulary,
    near-zero = redundant slice).

    KL = sum_t p_s(t) * ln(p_s(t) / p(t)) over the source's tokens
    (p_s(t) > 0 terms only; p(t) > 0 always since the corpus includes
    the source). Per-term ln ratios are snapped to integer micro-nats
    before the weighted sum (the repo's order-independent float rule);
    output KL is rounded 7->4. One explode + two-level aggregate; the
    corpus totals ride a broadcast join on the term key."""
    toks = df.select(
        F.col(source_col).alias("src"),
        F.explode(_words(F.col(text_col))).alias("term"),
    )
    st = (
        toks.groupBy("src", "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=True)  # feeds corpus totals AND the KL join
    )
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    n_src = st.groupBy("src").agg(F.sum("c_st").alias("n_s"))
    n_tot = st.agg(F.sum("c_st").alias("_n"))
    # ln(p_s/p) = ln((c_st/n_s) / (c_t/N)) = ln(c_st * N / (n_s * c_t));
    # micro-int BEFORE the weighted sum; weight = c_st (x1e6 scale keeps
    # the final divide-by-n_s exact-integer until one rounding)
    lr = F.log(
        F.col("c_st").cast("double") * F.col("_n")
        / (F.col("n_s").cast("double") * F.col("c_t"))
    )
    micro = (F.floor(F.abs(lr * 1e6) + F.lit(0.5)) * F.signum(lr)).cast("long")
    per = (
        st.join(ct, "term")
        .join(F.broadcast(n_src), "src")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("src", "n_s")
        .agg(F.sum(F.col("c_st") * micro).alias("_msum"))
    )
    return per.select(
        F.col("src").alias(source_col),
        F.col("n_s").alias("n_tokens"),
        round2(F.col("_msum") / 1e6 / F.col("n_s"), 7, 4).alias("kl_nats"),
    )
