"""Property evidence for TxTable.merge_into's clause semantics: on
random target/source tables and a random insert toggle, the one-join
CASE implementation must equal the obvious row-at-a-time reference
model (matched-delete wins over matched-update; unlisted columns keep
target values; unmatched targets survive; unmatched sources insert only
when asked). The clause interactions are exactly where a join+CASE
rewrite can drift from MERGE's specified semantics — so they are
executed here, not assumed."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings, strategies as st

from etl_python_airflow_bigquery_spark.operators.txlog import TxTable

fila = st.tuples(
    st.integers(min_value=0, max_value=9),   # key: small range → collisions
    st.integers(min_value=-5, max_value=5),  # value: negatives drive deletes
)


def _unique_by_key(rows):
    seen, out = set(), []
    for k, v in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v))
    return out


def _reference(target, source, insert_unmatched):
    """Row-at-a-time MERGE INTO with matched_delete='s.v < 0' and
    matched_update={'v': 't.v + s.v'}."""
    src = dict(source)
    out = {}
    for k, v in target:
        if k in src:
            if src[k] < 0:
                continue  # matched + delete condition
            out[k] = v + src[k]  # matched update
        else:
            out[k] = v  # unmatched target survives
    if insert_unmatched:
        tgt_keys = {k for k, _ in target}
        for k, sv in source:
            if k not in tgt_keys:
                out[k] = sv
    return out


@settings(max_examples=20, deadline=None)
@given(
    target=st.lists(fila, min_size=0, max_size=8).map(_unique_by_key),
    source=st.lists(fila, min_size=0, max_size=8).map(_unique_by_key),
    insert_unmatched=st.booleans(),
)
def test_merge_into_equals_reference(spark_prop, target, source, insert_unmatched):
    spark = spark_prop
    d = tempfile.mkdtemp(prefix="merge_prop_")
    try:
        t = TxTable(d + "/t")
        t.overwrite(spark.createDataFrame(target, "k bigint, v bigint"))
        src = spark.createDataFrame(source, "k bigint, v bigint")
        t.merge_into(
            spark,
            src,
            ["k"],
            matched_update={"v": "t.v + s.v"},
            matched_delete="s.v < 0",
            insert_unmatched=insert_unmatched,
        )
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got == _reference(target, source, insert_unmatched)
    finally:
        shutil.rmtree(d, ignore_errors=True)
