"""Snapshot the PHYSICAL-PLAN SHAPE of every driver-tier query.

The hand-written pins in tests/test_plans.py guard the shapes we know
matter (no cartesians, pushed filters, broadcast dims); this tool casts
a WIDE net over everything else: for each driver query it records the
multiset of physical operator NODE TYPES in the pre-execution plan
(ids, partition counts, and expression text stripped — only the node
names count, so the snapshot is stable across sessions and shuffle
settings). tests/test_plan_shapes.py regenerates the shapes in-memory
and diffs them against the committed PLANSHAPES.json: an unintended
extra Exchange, a join strategy flip, or a sort sneaking into a
map-only pipeline fails CI with a per-query node diff.

Regenerate after an INTENTIONAL plan change:

    PYTHONPATH=. python tools/plan_shapes.py > PLANSHAPES.json
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter

# A physical node line looks like "   +- NodeName [args…]" or
# ":- NodeName …"; the node name is the first identifier after the tree
# art. Subquery headers ("Subquery:…") and section markers are skipped.
_NODE_RE = re.compile(r"^[\s:+*\-]*([A-Za-z][A-Za-z0-9_]+)")

# Nodes whose presence/count varies with data-file layout rather than
# the logical plan (file counts change scan node splits etc.) — keep
# them, they are stable; nothing excluded currently.


def pinned(name: str, q) -> bool:
    """Which registry rows get a plan pin: the driver surface, the
    bench-gated set, and the demoted ``*_plano``/``*_plana`` baselines —
    so a rotation that moves a query OUT of the driver tier never
    silently drops its plan pin (VERDICT r11 #7)."""
    return bool(
        q.driver or q.bench or name.endswith(("_plano", "_plana"))
    )


def plan_shape(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts: Counter[str] = Counter()
    for line in plan.splitlines():
        line = line.strip()
        if not line or line.startswith("==") or line.startswith("Subquery"):
            continue
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        # plan-tree lines only: the toString also prints Output/Arguments
        # detail sections in some modes; node lines start with tree art
        # or the root node, and detail lines never match common node
        # casing (they start lowercase) — filter on leading capital.
        if name[0].isupper():
            counts[name] += 1
    return dict(sorted(counts.items()))


def main() -> int:
    sys.path.insert(0, ".")
    from etl_python_airflow_bigquery_spark.queries import REGISTRY
    from etl_python_airflow_bigquery_spark.session import get_spark

    spark = get_spark("plan-shapes")
    sf_dir = "/root/testdata/sf0.001"
    out = {}
    for name, q in sorted(REGISTRY.items()):
        if not pinned(name, q):
            continue
        try:
            out[name] = plan_shape(q.fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — snapshot must be total
            out[name] = {"__error__": str(exc)[:120]}
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
