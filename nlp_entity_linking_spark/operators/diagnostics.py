"""Grouped-map / grouped-agg pandas surfaces (SURVEY.md §2 F5, U):
per-group diagnostics computed inside applyInPandas — the idiom for
per-block statistics and per-group calibration that don't decompose into
built-in aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_STATS_SCHEMA = (
    "source string, n_docs long, sum_chars long, mean_chars double, "
    "max_chars long, top_lang string"
)


def grouped_doc_stats(docs: DataFrame) -> DataFrame:
    """documents -> one row per source with batch-computed stats
    (applyInPandas grouped map; exact int sums so the SQL oracle matches)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        s = int(pdf["n_chars"].sum())
        langs = pdf["lang"].value_counts()
        top = sorted(
            ((int(c), l) for l, c in langs.items()), key=lambda x: (-x[0], x[1])
        )[0][1]
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [n],
                "sum_chars": [s],
                "mean_chars": [s / n],
                "max_chars": [int(pdf["n_chars"].max())],
                "top_lang": [top],
            }
        )

    return docs.groupBy("source").applyInPandas(stats, schema=GROUP_STATS_SCHEMA)


def block_diagnostics_grouped(blocks_with_norm: DataFrame) -> DataFrame:
    """Per-block diagnostics via grouped-agg pandas UDF shapes: block size,
    distinct surfaces, surface-length spread — the skew-hunting view the
    salting stage feeds on."""

    @F.pandas_udf("double")
    def _len_spread(norms: pd.Series) -> float:
        lens = norms.str.len()
        return float(lens.max() - lens.min()) if len(lens) else 0.0

    # a grouped-agg pandas UDF cannot share a groupBy with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run the two aggregations separately
    # and join on the (already shuffled) group key.
    jvm_side = blocks_with_norm.groupBy("block_key").agg(
        F.count("*").alias("n_records"),
        F.countDistinct("norm").alias("n_distinct_surfaces"),
    )
    pandas_side = blocks_with_norm.groupBy("block_key").agg(
        _len_spread("norm").alias("len_spread")
    )
    return jvm_side.join(pandas_side, "block_key")
