"""Interval operators — the engine's keystone (SURVEY.md §7.1).

The reference's signature operator is the interval-overlap join followed by
interval clipping: playback sessions ``[start_date, end_date)`` joined to
period rows ``[inicio, fin)`` on ``start < fin AND end >= inicio`` and the
overlap measured with ``LEAST/GREATEST`` diffs (reference
indicadores_cia.py:152-165, audio_digital.py:397-399,
consumo_registrados.py:165-170, q_registrados_.py:90-99).

Spark-first execution strategy, chosen for 100 TB scale:

* **Grid-aligned periods** (hora/diario/mensual buckets): don't join at
  all — ``explode`` each session into the buckets it covers
  (``sequence()`` over integer bucket indices). Cost is O(rows x
  buckets-per-session) map-side work, zero shuffle, and clipping makes the
  duplication semantically correct by design (SURVEY.md §7.4.1). This is
  strictly better than a broadcast nested-loop join against a grid dim,
  which would compare every session with every grid row.

* **Arbitrary intervals** (program airings, validity windows):
  bucket-refine. Both sides explode into coarse buckets, equi-join on the
  bucket key (a normal shuffled/broadcast hash join Catalyst can
  optimize), then the exact overlap predicate refines, and duplicate
  pairs (intervals sharing >1 bucket) are dropped. Turns an O(n*m)
  nested-loop into a hash join with bounded fan-out.

All arithmetic is epoch-microsecond integer math (see functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    US_PER_HOUR,
    clipped_micros,
    event_ts_us,
)


def sessions_from_events(events: DataFrame) -> DataFrame:
    """Model the ``events`` stream table as playback sessions: ``ts`` is the
    session start and ``value`` its duration in minutes (FIXTURES.md maps
    events → consumo_detalle, whose rows are [start_date, end_date] spans,
    reference consumo_detalle.py:270-306).

    Output adds ``s_us``/``e_us`` epoch-µs bounds. Duration uses
    floor(value*60e6) so both engines truncate identically. ``ts`` is read
    through the schema-adaptive accessor — never assume its physical type.
    """
    s_us = event_ts_us(events)
    dur = F.floor(F.col("value") * F.lit(60_000_000)).cast("long")
    return events.withColumn("s_us", s_us).withColumn("e_us", s_us + dur)


def explode_to_buckets(
    df: DataFrame,
    s_us: Column,
    e_us: Column,
    bucket_us: int,
    index_name: str = "bucket_idx",
) -> DataFrame:
    """Explode each half-open interval [s_us, e_us) into every fixed-width
    bucket it overlaps; emits the bucket index (epoch µs / width).

    This is the scale-path building block: per-row fan-out is bounded by
    interval length / bucket width, all map-side (no shuffle). The e_us-1
    keeps intervals ending exactly on a boundary out of the next bucket.
    """
    start_idx = F.floor(s_us / F.lit(bucket_us))
    end_idx = F.floor((e_us - 1) / F.lit(bucket_us))
    return df.where(e_us > s_us).withColumn(
        index_name, F.explode(F.sequence(start_idx, end_idx))
    )


def explode_to_hour_grid(sessions: DataFrame) -> DataFrame:
    """Session rows → one row per (session, hour-bucket) with clipped
    overlap. Reproduces the hour-grid interval join of the superposition
    notebooks (GENERATE_TIMESTAMP_ARRAY ... interval join, cell 2) and the
    dicc_fechas hora join (indicadores_cia.py:130-165) without any join.

    TWO-TIER explode: sessions first split at day boundaries (fan-out =
    days covered), then each day slice explodes into its hours (fan-out
    ≤ 24). Output rows are identical to a single-stage hour explode, but
    no single ``sequence()`` array ever exceeds max(days, 24) elements —
    a week-long session materializes 7 + 7×24 small rows instead of one
    168-element array, and a pathological months-long interval cannot
    blow a task's memory on one row (SCALING.md: session-length
    pathologies).

    Adds: hora_us (bucket start), clip_us (overlap µs within the bucket).
    """
    us_day = 24 * US_PER_HOUR
    days = explode_to_buckets(
        sessions, F.col("s_us"), F.col("e_us"), us_day, "__day_idx"
    )
    day_s = F.greatest(F.col("s_us"), (F.col("__day_idx") * us_day).cast("long"))
    day_e = F.least(F.col("e_us"), ((F.col("__day_idx") + 1) * us_day).cast("long"))
    out = days.withColumn(
        "hour_idx",
        F.explode(
            F.sequence(
                F.floor(day_s / F.lit(US_PER_HOUR)),
                F.floor((day_e - 1) / F.lit(US_PER_HOUR)),
            )
        ),
    ).drop("__day_idx")
    hora_us = (F.col("hour_idx") * F.lit(US_PER_HOUR)).cast("long")
    return out.withColumn("hora_us", hora_us).withColumn(
        "clip_us",
        clipped_micros(
            F.col("s_us"), F.col("e_us"), hora_us, hora_us + F.lit(US_PER_HOUR)
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_us: int = 24 * US_PER_HOUR,
    extra_on: list[str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """General interval-overlap join: rows where [l_start,l_end) overlaps
    [r_start,r_end), both epoch-µs columns. The reference brute-forces this
    predicate in BigQuery (SURVEY.md §2.4 J3); OSS Catalyst would plan the
    raw non-equi predicate as a nested-loop/cartesian join, so we rewrite
    it as bucket equi-join + refine + dedup (SURVEY.md §4 X5).

    ``extra_on`` adds equi keys (e.g. a brand column) to the bucket key.
    Left columns win on name collision; callers should pre-alias.
    """
    lb = explode_to_buckets(left, F.col(l_start), F.col(l_end), bucket_us, "__bkt")
    rb = explode_to_buckets(right, F.col(r_start), F.col(r_end), bucket_us, "__bkt")
    if broadcast_right:
        rb = F.broadcast(rb)
    on = ["__bkt"] + (extra_on or [])
    joined = lb.join(rb, on=on, how="inner").where(
        (F.col(l_start) < F.col(r_end)) & (F.col(l_end) > F.col(r_start))
    )
    # A pair sharing k buckets appears k times; keep the pair whose bucket
    # contains the overlap start — exact, no dropDuplicates shuffle needed.
    overlap_start = F.greatest(F.col(l_start), F.col(r_start))
    joined = joined.where(F.col("__bkt") == F.floor(overlap_start / F.lit(bucket_us)))
    return joined.drop("__bkt")
