"""Gopher-style repetition/structure quality signals
(operators/text.py::repetition_features) against hand-computed truth —
duplicate-line fractions, bullet/ellipsis line structure, and top word
n-gram character coverage (overlapping occurrences deliberately count
like the published implementations, so the fraction can exceed 1)."""

from __future__ import annotations

import pytest

from time2feat_spark.operators.text import (
    GOPHER_REPETITION_RULES,
    repetition_features,
)

DOCS = [
    # A: one repeated line out of three; "aaa bbb" is the top 2-gram
    ("A", "aaa bbb\naaa bbb\nccc ddd\n"),
    # B: bullet lines + an ellipsis line, no duplicate lines
    ("B", "- item one\n- item two\nmore text...\n"),
    # C: single line, heavy overlapping repetition
    ("C", "hello world hello world hello"),
    # D: whitespace only -> every fraction NULL
    ("D", "   "),
]


@pytest.fixture(scope="module")
def rep(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = repetition_features(df).toPandas().set_index("doc_id")
    return out


def test_duplicate_line_fractions(rep):
    # A: lines [aaa bbb, aaa bbb, ccc ddd] -> 1 repeat of 3; 7 of 21 chars
    assert rep.loc["A", "rep_dup_line_frac"] == 0.3333
    assert rep.loc["A", "rep_dup_line_char_frac"] == 0.3333
    assert rep.loc["B", "rep_dup_line_frac"] == 0.0
    assert rep.loc["C", "rep_dup_line_frac"] == 0.0


def test_structure_fractions(rep):
    assert rep.loc["B", "rep_bullet_line_frac"] == 0.6667  # 2 of 3
    assert rep.loc["B", "rep_ellipsis_line_frac"] == 0.3333  # 1 of 3
    assert rep.loc["A", "rep_bullet_line_frac"] == 0.0
    assert rep.loc["A", "rep_ellipsis_line_frac"] == 0.0


def test_top_ngram_char_fractions(rep):
    # A: text len 24; "aaa bbb" twice -> 2*7/24; all 3-grams unique,
    # longest 11 chars; 4-grams unique, longest 15
    assert rep.loc["A", "rep_top2gram_char_frac"] == 0.5833
    assert rep.loc["A", "rep_top3gram_char_frac"] == 0.4583
    assert rep.loc["A", "rep_top4gram_char_frac"] == 0.625
    # B: len 35; "- item" twice (12); unique 3/4-grams, longest 16 / 21
    assert rep.loc["B", "rep_top2gram_char_frac"] == 0.3429
    assert rep.loc["B", "rep_top3gram_char_frac"] == 0.4571
    assert rep.loc["B", "rep_top4gram_char_frac"] == 0.6
    # C: len 29; "hello world" x2 (22/29); overlapping
    # "hello world hello" x2 -> 34/29 > 1 (published-impl semantics)
    assert rep.loc["C", "rep_top2gram_char_frac"] == 0.7586
    assert rep.loc["C", "rep_top3gram_char_frac"] == 1.1724
    assert rep.loc["C", "rep_top4gram_char_frac"] == 0.7931


def test_empty_doc_is_all_null(rep):
    row = rep.loc["D"]
    for c in rep.columns:
        if c.startswith("rep_"):
            assert row[c] is None or row[c] != row[c], c  # NULL/NaN


def test_gopher_rules_chain(spark):
    """The rule set plugs into quality_filter as a keep-chain with
    first-failing-rule attribution: A trips dup_line_frac (0.3333 >
    0.3), B trips ellipsis_lines (1 of 3 lines), C trips top2gram
    (0.7586 > 0.2), and the all-NULL doc passes (nothing to judge —
    length rules handle empties upstream)."""
    from time2feat_spark.operators.text import quality_filter

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = (
        quality_filter(repetition_features(df), rules=GOPHER_REPETITION_RULES)
        .select("doc_id", "keep", "drop_reason")
        .toPandas()
        .set_index("doc_id")
    )
    names = {n for n, _ in GOPHER_REPETITION_RULES}
    assert set(out.drop_reason.dropna()) <= names
    assert (out.keep == out.drop_reason.isna()).all()
    assert not out.loc["A", "keep"] and out.loc["A", "drop_reason"] == "dup_line_frac"
    assert not out.loc["B", "keep"] and out.loc["B", "drop_reason"] == "ellipsis_lines"
    assert not out.loc["C", "keep"] and out.loc["C", "drop_reason"] == "top2gram"
    assert out.loc["D", "keep"]  # all-NULL fractions pass (nothing to judge)


def test_redact_pii(spark):
    """URL/email/IP/phone scrub with per-category counts; JVM-only."""
    import pandas as pd

    from time2feat_spark.operators.text import redact_pii

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "see https://example.com/a?b=1 or www.test.org now",
                "mail bob.smith+x@corp.io from 192.168.0.1 or call "
                "+1 (555) 123-4567",
                "clean text with no identifiers at all",
                # country code must be OPTIONAL: plain 10-digit forms
                "dial 555-123-4567 or (555) 987.6543 today",
                "end of sentence: 555-123-4567. Next.",
            ],
        }
    )
    out = (
        redact_pii(spark.createDataFrame(docs))
        .toPandas()
        .set_index("doc_id")
    )
    assert (
        out.loc[1, "text_redacted"] == "see <URL> or <URL> now"
    )
    assert out.loc[1, "redact_url"] == 2
    assert out.loc[2, "text_redacted"] == "mail <EMAIL> from <IP> or call <PHONE>"
    assert (
        out.loc[2, ["redact_email", "redact_ip", "redact_phone"]] == 1
    ).all()
    assert out.loc[4, "text_redacted"] == "dial <PHONE> or <PHONE> today"
    assert out.loc[4, "redact_phone"] == 2
    # a sentence-ending period must not shield the number
    assert out.loc[5, "text_redacted"] == "end of sentence: <PHONE>. Next."
    assert out.loc[3, "text_redacted"] == out.loc[3, "text"]
    assert (
        out.loc[3, ["redact_url", "redact_email", "redact_ip", "redact_phone"]]
        == 0
    ).all()


def test_heavy_hitters_matches_exact_topk(spark):
    """Two-pass candidate+recount top-k == the full groupBy top-k on
    Zipf-skewed tokens, with ties broken identically; the full-key
    shuffle only ever sees the candidate set."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from time2feat_spark.operators.text import heavy_hitters

    rng = np.random.default_rng(11)
    toks = [f"tok{int(z)}" for z in rng.zipf(1.3, 40_000) % 2000]
    df = spark.createDataFrame(
        pd.DataFrame({"tok": toks})
    ).repartition(8)
    got = heavy_hitters(df, "tok", 20).toPandas()
    want = (
        df.groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(20)
        .toPandas()
    )
    assert list(got.tok) == list(want.tok)
    assert list(got["count"]) == list(want["count"])


def test_heavy_hitters_bounded_state_prune_path(spark):
    """With a tiny candidate budget the batched Misra-Gries prune kicks
    in (summary capped at 16c entries) and the dominant values still
    reach the exact recount."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from time2feat_spark.operators.text import heavy_hitters

    rng = np.random.default_rng(3)
    # 5000 distinct rare tokens + 5 dominant ones, one partition so the
    # per-partition summary must prune repeatedly (prune_at = 16*8 = 128)
    toks = [f"rare{i}" for i in range(5000)] + [
        f"hot{j}" for j in range(5) for _ in range(2000)
    ]
    rng.shuffle(toks)
    df = spark.createDataFrame(
        pd.DataFrame({"tok": toks})
    ).coalesce(1)
    got = heavy_hitters(df, "tok", 5, candidates_per_partition=8).toPandas()
    assert list(got.tok) == [f"hot{j}" for j in range(5)]
    assert (got["count"] == 2000).all()


def test_long_doc_dup_lines_linear(spark):
    """A 20k-line doc must complete in seconds: the r5 sorted-adjacent
    formulation is O(L log L) per doc (the old per-line rescan was
    O(L^2) — ~2x10^8 comparisons for this doc). Truth: 5000 distinct
    lines x4 occurrences -> 15000/20000 repeats; every line is 8 chars
    ("line0000") so the char fraction matches the line fraction."""
    lines = [f"line{i:04d}" for i in range(5000)] * 4
    doc = "\n".join(lines)
    df = spark.createDataFrame([("L", doc)], "doc_id string, text string")
    row = (
        repetition_features(df, ngram_ns=(2,))
        .select("rep_dup_line_frac", "rep_dup_line_char_frac")
        .first()
    )
    assert row["rep_dup_line_frac"] == 0.75
    assert row["rep_dup_line_char_frac"] == 0.75


def test_redact_counts_match_replacements(spark):
    """Counts are taken against the progressively-redacted text, so an
    email living INSIDE a URL (swallowed by the earlier <URL> rule) is
    not double-counted: redact_* always equals the replacements made."""
    from time2feat_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "login at https://x.io/reset?user=bob@corp.io then "
             "mail bob@corp.io")],
        "doc_id int, text string",
    )
    row = redact_pii(df).first()
    assert row["text_redacted"] == "login at <URL> then mail <EMAIL>"
    assert row["redact_url"] == 1
    assert row["redact_email"] == 1  # only the bare one; in-URL swallowed


def test_heavy_hitters_guarantee_bound(spark):
    """with_guarantee=True reports the total decrement mass: on skewed
    data the k-th count clears it (provably exact top-k); on
    adversarially flat data with a starved candidate budget the bound
    exposes that the tail is NOT trustworthy."""
    import pandas as pd

    from time2feat_spark.operators.text import heavy_hitters

    # skewed: hot tokens dominate, bound stays far below the k-th count
    toks = [f"hot{j}" for j in range(5) for _ in range(500)] + [
        f"rare{i}" for i in range(2000)
    ]
    df = spark.createDataFrame(pd.DataFrame({"tok": toks})).coalesce(1)
    got = heavy_hitters(df, "tok", 5, candidates_per_partition=8,
                        with_guarantee=True).toPandas()
    assert list(got.tok) == [f"hot{j}" for j in range(5)]
    assert (got["count"] > got["guarantee_bound"]).all()  # provably exact

    # flat: every value occurs once -> nothing can clear the bound
    flat = spark.createDataFrame(
        pd.DataFrame({"tok": [f"v{i}" for i in range(3000)]})
    ).coalesce(1)
    gf = heavy_hitters(flat, "tok", 5, candidates_per_partition=8,
                       with_guarantee=True).toPandas()
    assert (gf["count"] <= gf["guarantee_bound"]).all()  # tail untrusted
