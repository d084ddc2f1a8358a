"""Deterministic synthetic `sequences` table (FIXTURES.md F1).

Input shape is exactly BASELINE.json `input_hint`:
  sequences(doc_id string, tokens array<int32>, n_tok int32, source string)

Generation is pure splitmix64 arithmetic — the same row i always yields the
same tokens on any machine / partitioning, so tests, the oracle, and the
bench all agree without shipping data. Scales to any row count via Spark
(`sequences_df` fans the id range out over partitions; each partition
generates its slice with vectorized numpy inside mapInPandas — no per-row
Python).

Spec (seed 42):
  h(i)      = splitmix64(seed * GOLDEN + i)
  source    = "src_{zipf_bucket}" over 16 sources, Zipf(1.2) mass
  n_tok     = 64 + (h2(i) % 1985)           (ragged, 64..2048)
  tokens[k] = int32((h(i)*2654435761 + k*2246822519) mod 50257)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
N_SOURCES = 16
ZIPF_S = 1.2
VOCAB = 50257
SEED = 42


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + GOLDEN).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, N_SOURCES + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(w / w.sum())


_ZIPF_CDF = _zipf_cdf()


def gen_arrow(i0: int, i1: int, seed: int = SEED) -> pa.Table:
    """Generate rows [i0, i1) as an Arrow table (vectorized, loop-free)."""
    with np.errstate(over="ignore"):
        i = np.arange(i0, i1, dtype=np.uint64)
        h = _splitmix64(np.uint64(seed) * GOLDEN + i)
        h2 = _splitmix64(h ^ GOLDEN)
        u = h.astype(np.float64) / 2.0**64
        bucket = np.searchsorted(_ZIPF_CDF, u, side="right")
        n_tok = (64 + (h2 % np.uint64(1985))).astype(np.int64)

        offsets = np.zeros(len(i) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        total = int(offsets[-1])
        k = np.arange(total, dtype=np.uint64) - np.repeat(
            offsets[:-1].astype(np.uint64), n_tok
        )
        h_flat = np.repeat(h, n_tok)
        toks = (
            (h_flat * np.uint64(2654435761) + k * np.uint64(2246822519))
            % np.uint64(VOCAB)
        ).astype(np.int32)

    doc_id = pd.Series(np.arange(i0, i1)).map("doc_{:08d}".format)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(toks, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok.astype(np.int32), type=pa.int32()),
            "source": pa.array(
                pd.Series(bucket).map("src_{}".format), type=pa.string()
            ),
        }
    )


def gen_pandas(i0: int, i1: int, seed: int = SEED) -> pd.DataFrame:
    return gen_arrow(i0, i1, seed).to_pandas()


def sequences_df(spark, n_rows: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: id range -> mapInPandas -> sequences rows."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
            StructField("source", StringType()),
        ]
    )
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_rows, 1, parts)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids within a partition of spark.range are contiguous
            yield gen_pandas(int(ids[0]), int(ids[-1]) + 1, seed)

    return rng.mapInPandas(gen, schema)


def write_sequences(spark, path: str, n_rows: int, seed: int = SEED,
                    partitions: int | None = None) -> None:
    sequences_df(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(path)
