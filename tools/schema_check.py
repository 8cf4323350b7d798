"""Round-start schema drift check: verify every testdata table's PHYSICAL
schema is one the engine's adaptive accessors support, before any query
runs. Round 2 lost 21 operators to an unannounced encoding flip of
events.ts; this makes the next flip a 5-second diagnosis instead.

Usage: python tools/schema_check.py [sf_dir ...]   (default: all three SFs)
Exit 0 = every column loadable+supported; 1 = drift outside the supported
set (the message names the column, the new type, and the accessor to fix).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

# per-table: column -> set of supported physical encodings (pyarrow repr
# prefixes; timestamps may also arrive as int64 raw nanos)
TIME_OK = ("timestamp[us", "timestamp[ns", "timestamp[ms", "int64", "date32")
SUPPORTED = {
    "events": {"ts": TIME_OK},
    "orders": {"o_orderdate": TIME_OK},
    "lineitem": {"l_shipdate": TIME_OK},
    "embeddings": {"embedding": ("list<element: float", "list<element: double")},
}
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
FORMATS = (".parquet", ".orc", ".csv", ".json")


def check_dir(sf_dir: str) -> list[str]:
    problems = []
    for t in TABLES:
        path = next(
            (
                os.path.join(sf_dir, f"{t}{ext}")
                for ext in FORMATS
                if os.path.exists(os.path.join(sf_dir, f"{t}{ext}"))
            ),
            None,
        )
        if path is None:
            problems.append(f"{sf_dir}: table {t!r} missing (no {FORMATS} file)")
            continue
        if not path.endswith(".parquet"):
            print(f"  note: {t} ships as {path.rsplit('.', 1)[1]} (non-parquet drop)")
            continue
        schema = pq.read_schema(path)
        for col, allowed in SUPPORTED.get(t, {}).items():
            if col not in schema.names:
                problems.append(f"{sf_dir}/{t}: column {col!r} GONE")
                continue
            typ = str(schema.field(col).type)
            if not any(typ.startswith(a) for a in allowed):
                problems.append(
                    f"{sf_dir}/{t}.{col}: physical type {typ!r} outside the "
                    f"supported set {allowed} — extend functions.event_us_sql"
                    " / ts_lit_for (and tests/test_event_encoding.py) first"
                )
    return problems


def main() -> int:
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    bad = []
    for d in dirs:
        print(f"checking {d}")
        bad += check_dir(d)
    if bad:
        print("\nSCHEMA DRIFT:")
        for p in bad:
            print(" -", p)
        return 1
    print("all physical schemas inside the supported envelope")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
