"""Local Spark-vs-DuckDB oracle comparison, mimicking the driver's check
(row count + schema + order-insensitive value hash).

Usage:
    python tools/compare.py [sf_dir] [query ...]   # default: all queries
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_python_airflow_bigquery_spark.tables import TABLES  # noqa: E402


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — order-insensitive
    canonical form for value comparison."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    if len(a) != len(b):
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            eq = (av.astype("object").where(av.notna(), None)
                  == bv.astype("object").where(bv.notna(), None))
            eq = eq | (av.isna() & bv.isna())  # null == null
        except Exception as exc:  # noqa: BLE001
            problems.append(f"col {col}: compare error {exc}")
            continue
        n_bad = int((~eq).sum())
        if n_bad:
            idx = eq[~eq].index[:3]
            examples = [(col, i, av.iloc[i], bv.iloc[i]) for i in idx]
            problems.append(f"col {col}: {n_bad} value mismatches, e.g. {examples}")
        if str(av.dtype) != str(bv.dtype):
            problems.append(f"col {col}: dtype spark={av.dtype} oracle={bv.dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from etl_python_airflow_bigquery_spark.queries import REGISTRY
    from etl_python_airflow_bigquery_spark.session import get_spark

    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("compare")
    con = duckdb_con(sf_dir)
    failed = []
    for name in names:
        q = REGISTRY[name]
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"ok    {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            oracle_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            failed.append(name)
            continue
        problems = compare_frames(spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows hash-match")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
