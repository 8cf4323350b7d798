"""Dual-encoding regression tests for ``events.ts``.

Round 2 broke on exactly this: the testdata's physical encoding of
``events.ts`` flipped from TIMESTAMP(NANOS) (loaded as raw BIGINT under
``nanosAsLong``) to plain ``timestamp[us]`` (loaded as TIMESTAMP_NTZ),
and hardcoded ``ts div 1000`` arithmetic died at analysis time in 13
driver queries. These tests pin the contract: the SAME query over the
SAME logical data must return identical results whichever physical
encoding the parquet uses — the schema-adaptive accessors
(functions.event_us_sql / event_ts_us / event_day_num / event_hour /
event_ts_filter) are the only sanctioned readers of ``ts``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    US_PER_DAY,
    event_day_num,
    event_hour,
    event_ts_filter,
    event_ts_us,
)
from etl_python_airflow_bigquery_spark.operators.intervals import (
    sessions_from_events,
)
from etl_python_airflow_bigquery_spark.tables import load_table


@pytest.fixture(scope="module")
def dual_dirs(tmp_path_factory, sf_dir):
    """The same events rows written twice: once as timestamp[us], once as
    TIMESTAMP(NANOS) int64 — the two encodings the testdata has shipped."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts = src.column("ts")
    if pa.types.is_timestamp(ts.type):
        us_col = ts.cast(pa.timestamp("us"))
    else:  # int64 nanos drop
        us_col = ts.cast(pa.int64()).cast(pa.timestamp("ns")).cast(pa.timestamp("us"))
    ns_col = us_col.cast(pa.timestamp("ns")).cast(pa.int64())

    base = tmp_path_factory.mktemp("dual_encoding")
    out = {}
    for tag, col, typ in (
        ("us", us_col, pa.timestamp("us")),
        ("ns", ns_col, pa.int64()),
        # isAdjustedToUTC=true → Spark loads TIMESTAMP (LTZ): the
        # unix_micros accessor path must yield the same integers
        ("ltz", us_col.cast(pa.timestamp("us", tz="UTC")), pa.timestamp("us", tz="UTC")),
    ):
        tbl = src.set_column(src.schema.get_field_index("ts"), pa.field("ts", typ), col)
        d = base / tag
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"))
        out[tag] = str(d)
    return out


def _collect(df, *keys):
    return sorted(tuple(r) for r in df.collect())


def test_accessors_identical_across_encodings(spark, dual_dirs):
    frames = {t: load_table(spark, d, "events") for t, d in dual_dirs.items()}
    # the two encodings genuinely load as different physical types
    kinds = {t: f.schema["ts"].dataType.simpleString() for t, f in frames.items()}
    assert kinds["ns"] == "bigint"
    assert kinds["us"].startswith("timestamp")

    results = {}
    for tag, ev in frames.items():
        results[tag] = _collect(
            ev.select(
                "event_id",
                event_ts_us(ev).alias("t_us"),
                event_day_num(ev).alias("day_num"),
                event_hour(ev).alias("hora"),
            )
        )
    assert results["ns"] == results["us"] == results["ltz"]


def test_sessions_identical_across_encodings(spark, dual_dirs):
    got = {}
    for tag, d in dual_dirs.items():
        ev = load_table(spark, d, "events")
        got[tag] = _collect(
            sessions_from_events(ev).select("event_id", "s_us", "e_us")
        )
    assert got["ns"] == got["us"]


def test_range_filter_identical_and_pushed_down(spark, dual_dirs):
    lo, hi = 19723 * US_PER_DAY, 19754 * US_PER_DAY
    counts, plans = {}, {}
    for tag, d in dual_dirs.items():
        ev = load_table(spark, d, "events")
        filtered = ev.where(event_ts_filter(ev, lo, hi))
        counts[tag] = filtered.count()
        plans[tag] = filtered._jdf.queryExecution().executedPlan().toString()
    assert counts["ns"] == counts["us"]
    # the predicate reaches the parquet scan in both encodings
    for tag, plan in plans.items():
        assert "PushedFilters: [" in plan, tag
        assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan, (tag, plan)


def test_date_columns_adapt_to_date32(spark, tmp_path, sf_dir):
    """The same robustness contract for DATE-bearing columns: if a drop
    ships o_orderdate/l_shipdate as date32 instead of timestamp[us], the
    accessors (event_ts_us with DateType, ts_lit_for) must yield the
    midnight-equivalent epoch-µs and keep filters pushable."""
    import duckdb

    src = pq.read_table(os.path.join(sf_dir, "orders.parquet"))
    idx = src.schema.get_field_index("o_orderdate")
    as_date = src.column("o_orderdate").cast(pa.date32())
    tbl = src.set_column(idx, pa.field("o_orderdate", pa.date32()), as_date)
    d = tmp_path / "orders_date32"
    d.mkdir()
    pq.write_table(tbl, str(d / "orders.parquet"))

    orig = load_table(spark, sf_dir, "orders")
    dated = load_table(spark, str(d), "orders")
    assert dated.schema["o_orderdate"].dataType.simpleString() == "date"

    a = _collect(orig.select("o_orderkey", event_ts_us(orig, "o_orderdate").alias("us")))
    b = _collect(dated.select("o_orderkey", event_ts_us(dated, "o_orderdate").alias("us")))
    # timestamp[us] drop stores midnights, so µs must match exactly
    assert a == b

    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    cutoff = "1995-06-15 00:00:00"
    na = orig.where(F.col("o_orderdate") <= ts_lit_for(orig, "o_orderdate", cutoff)).count()
    nb = dated.where(F.col("o_orderdate") <= ts_lit_for(dated, "o_orderdate", cutoff)).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet') "
        f"WHERE o_orderdate <= TIMESTAMP '{cutoff}'"
    ).fetchone()[0]
    assert na == nb == want
    plan = (
        dated.where(F.col("o_orderdate") <= ts_lit_for(dated, "o_orderdate", cutoff))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "LessThanOrEqual(o_orderdate" in plan


def test_embeddings_adapt_to_double(spark, tmp_path, sf_dir):
    """An embeddings drop as array<double> instead of array<float> must
    yield BIT-IDENTICAL similarity results: all vector math casts each
    element to DOUBLE before the integer scaling, so the physical
    element type is invisible."""
    import shutil

    from etl_python_airflow_bigquery_spark.queries import REGISTRY

    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    idx = src.schema.get_field_index("embedding")
    dbl = src.column("embedding").cast(pa.list_(pa.float64()))
    tbl = src.set_column(idx, pa.field("embedding", pa.list_(pa.float64())), dbl)
    d = tmp_path / "emb_double"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"), str(d / "documents.parquet")
    )
    for q in ("similarity_lsh", "dedup_embedding_cosine"):
        a = _collect(REGISTRY[q].fn(spark, sf_dir))
        b = _collect(REGISTRY[q].fn(spark, str(d)))
        assert a == b, q


def test_orc_drop_loads_identically(spark, tmp_path, sf_dir):
    """A container-format switch (parquet → ORC) must be invisible to
    every consumer: load_table detects the file present and ORC keeps
    exact types, so the same query returns the same rows."""
    from etl_python_airflow_bigquery_spark.tables import load_table

    d = str(tmp_path / "orc_drop")
    for t in ("orders", "events"):
        load_table(spark, sf_dir, t).write.orc(f"{d}/{t}.orc")
    for t in ("orders", "events"):
        a = load_table(spark, sf_dir, t)
        b = load_table(spark, d, t)
        assert a.schema == b.schema, t
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())), t
    # and a real query runs unchanged over the ORC drop
    ev = load_table(spark, d, "events")
    assert ev.where(event_ts_filter(ev, 19723 * US_PER_DAY, 19760 * US_PER_DAY)).count() > 0


def test_streaming_source_adapts_encoding(spark, dual_dirs):
    """read_events_stream must take the schema from the files themselves:
    a µs drop yields timestamp, an ns drop yields long — both produce the
    same ts_utc instants (this was round 2's silent-corruption bug)."""
    from etl_python_airflow_bigquery_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory,
    )

    got = {}
    for tag, d in dual_dirs.items():
        stream = read_events_stream(spark, d)
        agg = (
            stream.groupBy(F.unix_micros("ts_utc").alias("t_us"))
            .count()
        )
        got[tag] = _collect(run_to_memory(agg, f"enc_{tag}"))
    assert got["ns"] == got["us"] == got["ltz"]
    assert len(got["us"]) > 0
