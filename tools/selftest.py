"""One-shot round-start health check (the verify skill's step 0-2 in a
single command): physical-schema drift, flagship smoke, and the FULL
registry compared against its DuckDB oracles at sf0.001.

Usage: PYTHONPATH=. python tools/selftest.py [sf_dir]
Exit 0 = everything green; nonzero names the first broken layer.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    print("[1/3] schema drift check", file=sys.stderr)
    rc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "schema_check.py")]
    ).returncode
    if rc != 0:
        print("FAIL: schema drift — extend the functions.py accessors")
        return 1

    print("[2/3] flagship smoke", file=sys.stderr)
    from etl_python_airflow_bigquery_spark.session import get_spark

    spark = get_spark("selftest")
    import __spark_entry__ as entry_mod

    n = entry_mod.entry(spark).count()
    if n <= 0:
        print("FAIL: entry() returned no rows")
        return 2
    print(f"  entry rows: {n}", file=sys.stderr)

    print("[3/3] full-registry oracle compare", file=sys.stderr)
    rc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "compare.py"), sf_dir]
    ).returncode
    if rc != 0:
        print("FAIL: oracle mismatches — see compare output above")
        return 3
    print("selftest: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
