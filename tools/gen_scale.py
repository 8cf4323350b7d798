"""Materialize a persistent scaled dataset from sf0.1 (default 10x = an
sf1-equivalent) for scale-point measurements: the same deterministic
consistently-shifted-keys replication as tools/scale_probe.py, written to
a named directory instead of a throwaway tmp dir.

Usage: PYTHONPATH=. python tools/gen_scale.py [K] [out_dir]
Defaults: K=10, out_dir=/root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from etl_python_airflow_bigquery_spark.session import get_spark
    from tools.scale_probe import replicate

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)
    replicate(spark, "/root/testdata/sf0.1", out, k)
    print(f"wrote x{k} replica of sf0.1 to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
