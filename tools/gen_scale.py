"""Materialize a persistent scaled dataset from sf0.1 (default 10x = an
sf1-equivalent) for scale-point measurements: the same deterministic
consistently-shifted-keys replication as tools/scale_probe.py, written to
a named directory instead of a throwaway tmp dir.

Usage: PYTHONPATH=. python tools/gen_scale.py [K] [out_dir]
       [--extended] [--dedup-real]
Defaults: K=10, out_dir=/root/repo/.scale/sf1

``--extended`` (VERDICT r11 #8): the TIME-EXTENDED replica — copy i's
events shift by i × the source calendar span, so the calendar grows
with the volume and per-day density stays ~constant. This is the
linear regime interval joins target; the default +i-days replica
densifies a fixed calendar (the quadratic stress mode).

``--dedup-real`` (VERDICT r13 #3): the PRODUCTION-SHAPED dedup replica
(default out .scale/sf1dd) — copy i>0's documents rehash every word
with a copy-specific salt so cross-copy near-dups vanish, except a
deterministic ~3% of base docs that keep the clone form: realistic
near-dup density for the dedup-state fold's honest 10× reading (the
default replica makes EVERY doc a K-member clone family — the
adversarial stress regime).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from etl_python_airflow_bigquery_spark.session import get_spark
    from tools.scale_probe import replicate

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    extended = "--extended" in sys.argv[1:]
    dedup_real = "--dedup-real" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 10
    out = args[1] if len(args) > 1 else (
        "/root/repo/.scale/sf1dd" if dedup_real
        else "/root/repo/.scale/sf1ext" if extended
        else "/root/repo/.scale/sf1"
    )
    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)
    replicate(
        spark, "/root/testdata/sf0.1", out, k,
        time_extended=extended, dedup_real=dedup_real,
    )
    etiqueta = (" time-extended" if extended else "") + (
        " dedup-real" if dedup_real else ""
    )
    print(f"wrote x{k}{etiqueta} replica of sf0.1 to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
