"""Skew-mitigation operators (SURVEY.md north-star: "skewed keys →
salting or AQE skew-join").

AQE's skew-join splitter (enabled in session.py) handles JOIN skew at
runtime; these helpers cover the two places AQE cannot:

* ``salted_count_distinct`` — a single hot GROUP BY key funnels every
  row of that key through one reducer. Two-level aggregation splits the
  key across N salts (partial distinct per (key, salt)) and merges —
  the hot key's work spreads over N reducers. Exact, not approximate.
* ``salted_broadcast_left`` — replicate-and-salt for joins whose BUILD
  side is small but PROBE side is skewed AND the join must shuffle
  (e.g. a non-broadcastable aggregation follows on the same key).

Both are pure DataFrame rewrites — no RDDs, no custom partitioners —
so Catalyst/AQE still optimize around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str | Column,
    out_name: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group via two-level aggregation.

    Level 1 groups by (group_cols, salt = hash(x) % n_salts) and
    distinct-counts within the salt — each group's heavy lifting spreads
    over ``n_salts`` reducers. Because the salt is a FUNCTION OF THE
    DISTINCT VALUE, a value lands in exactly one salt, so level 2 can
    simply SUM the partial distinct counts: Σ is exact, no overlap."""
    c = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    salt = F.pmod(F.hash(c), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*group_cols, c.alias("__v"), salt)
        .groupBy(*group_cols, "__salt")
        .agg(F.countDistinct("__v").alias("__partial"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial").cast("bigint").alias(out_name)
    )


def salted_broadcast_left(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof shuffled equi join: the skewed probe side gets a
    random-ish salt derived from a high-cardinality expression; the
    small build side is replicated n_salts times with every salt value.
    The join key becomes (on, salt) — a hot key now hashes to n_salts
    different reducers. Exact same output rows as the plain join."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [on, "__salt"]).drop("__salt")


def bloom_semijoin(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    refine: bool = True,
) -> DataFrame:
    """EXPLICIT BLOOM SEMI-JOIN PUSHDOWN: shrink the fact side BEFORE
    the shuffle join when the other side is a selective key set — the
    runtime-filter optimization Spark applies opaquely, made visible
    and tunable. The key set folds into a BITSET TABLE (word index →
    OR-ed bit mask, ≈ n_bits/64 rows — a guaranteed broadcast); the
    fact computes its key's (word, bit) map-side, broadcast-joins the
    bitset (map-side hash lookup, no shuffle of the fact), and only
    rows whose bit is set continue to the EXACT semi join. False
    positives are filtered by that refinement — the result is exactly
    the plain semi join, only cheaper: at 100 TB the big shuffle sees
    survivors, not the table.

    Hash = the engine's md5-prefix (deterministic everywhere); one
    hash function keeps the false-positive rate ~keys/n_bits — raise
    ``n_bits`` for bigger key sets (the bitset broadcast grows as
    n_bits/8 bytes)."""
    from etl_python_airflow_bigquery_spark.queries.text import hex_hash

    pos = lambda c: hex_hash(F.col(c).cast("string")) % n_bits  # noqa: E731
    bitset = (
        keys.select((pos(key_col) % n_bits).alias("p"))
        .select(
            F.expr("p div 64").alias("palabra"),
            F.expr("CAST(1 AS BIGINT) << CAST(p % 64 AS INT)").alias("bit"),
        )
        .groupBy("palabra")
        .agg(F.bit_or("bit").alias("mascara"))
    )
    marcado = fact.withColumn("__p", pos(fact_key)).withColumn(
        "__palabra", F.expr("__p div 64")
    )
    sobrevivientes = (
        marcado.join(
            F.broadcast(bitset), marcado.__palabra == bitset.palabra, "left"
        )
        .where(
            F.col("mascara").isNotNull()
            & (
                F.expr("mascara & (CAST(1 AS BIGINT) << CAST(__p % 64 AS INT))")
                != 0
            )
        )
        .drop("__p", "__palabra", "palabra", "mascara")
    )
    if not refine:
        # the raw prefilter output (superset: true matches + Bloom false
        # positives) — exposed for measurement/tests; consumers wanting
        # exact semantics keep refine=True
        return sobrevivientes
    # exact refinement: the semi join runs on the pre-filtered fact
    return sobrevivientes.join(
        keys.select(F.col(key_col).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
