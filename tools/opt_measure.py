"""Optimization-loop measurement harness (rounds 14-15): time a subset of
registry queries with the bench's exact methodology (cache-cleared reps,
checksum materialization) and optionally dump each query's formatted
plan to plans/r15/<name>_<tag>.txt — the before/after evidence files the
round's deliverables require.

Usage:
    PYTHONPATH=. python tools/opt_measure.py [--plans TAG] [--reps N] q1 q2 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line: {"queries": {name: best_sec}, "runs": {name: [..]}}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_python_airflow_bigquery_spark.queries import REGISTRY  # noqa: E402
from etl_python_airflow_bigquery_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _materialize(df) -> None:
    from pyspark.sql import functions as F

    df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.expr("bit_xor(h)")
    ).collect()


def main() -> int:
    args = sys.argv[1:]
    plans_tag = None
    reps = 3
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_tag = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args or [n for n, q in REGISTRY.items() if q.bench]

    spark = get_spark("opt-measure")
    from etl_python_airflow_bigquery_spark.queries.dedup import (
        clear_session_caches,
    )

    # JVM/codegen warm-up on the first query
    _materialize(REGISTRY[names[0]].fn(spark, SF_DIR))

    out_runs: dict[str, list[float]] = {}
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    for name in names:
        spark.sparkContext.setJobDescription(f"opt: {name}")
        runs = []
        # --reps 0: plan-dump only, skip the timed materializations
        for _ in range(reps):
            clear_session_caches()
            t0 = time.perf_counter()
            _materialize(REGISTRY[name].fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        out_runs[name] = runs
        if plans_tag:
            os.makedirs(plans_dir, exist_ok=True)
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            plan = re.sub(r"\[codegen id : \d+\]", "", plan)
            with open(
                os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as fh:
                fh.write(plan.rstrip() + "\n")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "queries": {n: min(r) for n, r in out_runs.items() if r},
        "runs": out_runs,
        "sf_dir": SF_DIR,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
