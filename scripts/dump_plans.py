"""Dump .explain("formatted") for named driver queries to files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (default: a fixed hot
set). Plans are built (not executed) at $SPARK_GRAFT_SF_DIR (default
sf0.1) — plan SHAPE is SF-independent; AQE runtime rewrites are noted in
OPTIMIZATION_r06.md where they matter.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "minhash_near_dups",
    "bm25_dbterms",
    "pmi_collocations",
    "tfidf_top_terms",
    "token_window_dups",
    "hll_tier_1h",
    "rollup_1h_basic",
    "gapfill_locf_1h",
    "text_quality",
    "heavy_hitters_tokens",
    "unigram_xent",
    "source_kl",
    "cms_token_estimates",
    "interval_join",
    "embedding_topk",
    "semantic_dedup",
    "curation_pipeline",
    "decontaminate",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from time2feat_spark.session import get_spark

    spark = get_spark(
        "plan-dump",
        master="local[4]",
        extra={"spark.ui.enabled": "false"},
    )
    qs = E.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not a declared query")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {outdir}/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
