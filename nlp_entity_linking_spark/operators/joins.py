"""Join operators beyond plain equi-joins (SURVEY.md §2 E5/E6).

asof_join — "latest right row at or before each left timestamp", per key.
Spark has no native AS-OF join; the scalable formulation (SURVEY.md E6)
unions both sides on a single timeline and carries the right side forward
with last(ignorenulls) over an ordered window per key — one shuffle on the
key, no range-join blowup, no per-group pandas. (DuckDB's native ASOF JOIN
serves as the oracle in __spark_entry__.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row of the same `key` with
    right_ts <= left_ts. Left rows with no prior right row get NULLs.

    Tie policy: a right row at exactly left_ts matches; among right rows
    with identical timestamps the LAST under a deterministic
    (right_ts, right_cols) sort wins.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_rrow"),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    # right rows sort BEFORE left rows at equal timestamps (_is_left asc),
    # so an exactly-coincident right row is visible to the left row. `_rrow`
    # (the right payload struct, NULL on left rows) completes the total
    # order: among right rows with identical (key, ts) the max payload
    # struct sorts last and is the one last(ignorenulls) picks — without it
    # the tie would resolve by partition order (nondeterministic).
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_is_left", F.col("_rrow"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l.unionByName(r).withColumn(
        "_match", F.last("_rrow", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_left") == 1).select(
        F.col("_lrow.*"),
        *[F.col("_match")[c].alias(c + suffix) for c in right_cols],
    )
    return out
