"""As-of join — the classic time-series operator Spark lacks natively
(BASELINE north-star example list). Implemented as a composition of
existing DataFrame ops (SURVEY.md §7.3 strategy (a)): union both sides
tagged, one window pass per key carries the latest right-side row
forward, then keep left rows. Cost: ONE shuffle on the key + a local
sort per key slice — the same shape DuckDB/kdb use for merge-as-of, and
at 1000 executors each user's timeline sorts locally.

Matching semantics = ``left.ts >= right.ts`` (latest right row at or
before the left row), identical to DuckDB's native ASOF JOIN, which the
oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the LATEST right
    row of the same ``on`` key with ``right_ts <= left_ts``.

    ``how='inner'`` drops left rows with no prior right row (DuckDB
    ASOF default); ``how='left'`` keeps them with nulls."""
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c) for c in value_cols],
    )
    # align schemas: left side carries null value_cols before the fill
    lt = lt.select(
        *[F.col(c) for c in left.columns],
        "__t",
        "__is_left",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in value_cols],
    )
    merged = _merged(lt, rt, left, on, value_cols)
    # ties: right rows sort BEFORE left rows at the same timestamp so an
    # equal-timestamp right row is visible (the >= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct (marker + all value cols) with ignorenulls on the
    # struct itself, not per-column: a matched right row whose value
    # columns are NULL must still count as the as-of match (per-column
    # carry would skip it and surface an older value, diverging from
    # DuckDB ASOF semantics on nullable value columns).
    matched = F.when(
        F.col("__is_left") == 0,
        F.struct(F.lit(1).alias("__m"), *[F.col(c) for c in value_cols]),
    )
    filled = merged.select(
        "*",
        F.last(matched, ignorenulls=True).over(w).alias("__asof"),
    )
    out = (
        filled.where(F.col("__is_left") == 1)
        .drop("__t", "__is_left", *value_cols)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__asof.{c}").alias(c) for c in value_cols],
            F.col("__asof.__m").alias("__matched"),
        )
    )
    if how == "inner":
        out = out.where(F.col("__matched").isNotNull())
    return out.drop("__matched")


def _merged(lt: DataFrame, rt: DataFrame, left: DataFrame, on: str, value_cols: list[str]) -> DataFrame:
    rt_full = rt.select(
        *[
            F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(c)
            for c in left.columns
            if c != on
        ],
        F.col(on),
        "__t",
        "__is_left",
        *[F.col(c) for c in value_cols],
    )
    return lt.unionByName(rt_full)
