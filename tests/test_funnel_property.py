"""Property evidence for funnel_ventana's latest-reachable fold: on
random event sequences (ties, noise stages, windows straddled by a
single microsecond) the fold's stage-2/stage-3 reachability must equal
the brute-force existence definition — the optimality argument ("the
latest qualifying predecessor also qualifies") executed, not assumed."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.queries.joins import (
    _funnel_ventana_fold,
)

W = 10  # tiny window so sequences straddle it constantly

evento = st.tuples(
    st.integers(min_value=0, max_value=40),
    st.sampled_from(["view", "click", "purchase", "otro"]),
)


def _brute(evs, w):
    vs = [t for t, k in evs if k == "view"]
    cs = [t for t, k in evs if k == "click"]
    ps = [t for t, k in evs if k == "purchase"]
    c_ok = {c for c in cs if any(v < c <= v + w for v in vs)}
    p_ok = any(c < p <= c + w for c in c_ok for p in ps)
    return bool(c_ok), p_ok


@settings(max_examples=60, deadline=None)
@given(evs=st.lists(evento, min_size=0, max_size=14))
def test_fold_reachability_equals_bruteforce(spark_prop, evs):
    spark = spark_prop
    df = spark.createDataFrame(
        [(sorted(evs),)], "evs array<struct<t: bigint, tipo: string>>"
    )
    row = df.select(_funnel_ventana_fold(W).alias("s")).collect()[0]["s"]
    want2, want3 = _brute(evs, W)
    assert (row["l2a"] is not None) == want2, (evs, row)
    assert (row["l3"] is not None) == want3, (evs, row)
