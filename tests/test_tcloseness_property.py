"""Property evidence for t_cercania's integer EMD: on random tiny
customer tables, the Spark pipeline's scaled EMD must equal an
INDEPENDENT pure-Python implementation of the ordered-attribute Earth
Mover's Distance (cumulative |P−Q| sums over exact fractions cleared to
integers). The oracle already pins Spark against DuckDB running the
same algebra; this pins both against the textbook definition computed a
different way — the zero-fill grid, the window cumsums, and the
|A_i·N − B_i·n| clearing are executed, not assumed."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from etl_python_airflow_bigquery_spark.queries.extras import t_cercania

cliente = st.tuples(
    st.integers(min_value=0, max_value=3),        # nation (QI class)
    st.integers(min_value=-2000, max_value=5000),  # acctbal -> band
)


def _reference(rows):
    """Textbook ordered-EMD per class, python ints only: for each class
    P and the global Q over the observed band domain,
    emd_scaled = sum_i |A_i*N - B_i*n| with A/B cumulative counts."""
    # python // IS floor division (toward -inf), matching Spark's
    # floor(acctbal / 1000) exactly at these magnitudes
    def band(b):
        return b // 1000

    bands = sorted({band(b) for _, b in rows})

    total = len(rows)
    global_counts = {t: 0 for t in bands}
    per_class: dict[int, dict[int, int]] = {}
    for nac, bal in rows:
        t = band(bal)
        global_counts[t] += 1
        per_class.setdefault(nac, {t2: 0 for t2 in bands})
    for nac, bal in rows:
        per_class[nac][band(bal)] += 1
    out = {}
    for nac, counts in per_class.items():
        n = sum(counts.values())
        a = b = acc = 0
        for t in bands:
            a += counts[t]
            b += global_counts[t]
            acc += abs(a * total - b * n)
        out[nac] = (n, acc)
    return out


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(cliente, min_size=1, max_size=25))
def test_t_cercania_equals_textbook_emd(spark_prop, rows):
    spark = spark_prop
    d = tempfile.mkdtemp(prefix="tcerca_prop_")
    try:
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(range(len(rows)), pa.int64()),
                    "c_name": pa.array([f"c{i}" for i in range(len(rows))]),
                    "c_nationkey": pa.array(
                        [r[0] for r in rows], pa.int32()
                    ),
                    "c_acctbal": pa.array(
                        [float(r[1]) for r in rows], pa.float64()
                    ),
                    "c_mktsegment": pa.array(["X"] * len(rows)),
                }
            ),
            os.path.join(d, "customer.parquet"),
        )
        got = {
            r["nacion"]: (r["miembros"], r["emd_escalado"])
            for r in t_cercania(spark, d).collect()
        }
        assert got == _reference(rows)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
