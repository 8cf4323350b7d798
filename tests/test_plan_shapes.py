"""Wide-net physical-plan regression guard: every driver query's plan
NODE-TYPE multiset must match the committed PLANSHAPES.json snapshot.
The hand-written pins in test_plans.py guard known-critical shapes;
this catches everything else — an extra Exchange, a join-strategy flip,
a sort appearing in a map-only pipeline — anywhere in the driver
surface. After an INTENTIONAL plan change, regenerate with
`PYTHONPATH=. python tools/plan_shapes.py > PLANSHAPES.json`."""

from __future__ import annotations

import json
import os

import pytest

from etl_python_airflow_bigquery_spark.queries import REGISTRY
from tools.plan_shapes import pinned, plan_shape

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SNAP = os.path.join(_ROOT, "PLANSHAPES.json")


@pytest.fixture(scope="module")
def snapshot():
    if not os.path.exists(_SNAP):
        pytest.skip("PLANSHAPES.json not generated yet")
    return json.load(open(_SNAP))


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if pinned(n, q))
)
def test_driver_plan_shape_is_pinned(spark, sf_dir, snapshot, name):
    # a pinned query missing from the snapshot is a FAILURE, not a skip:
    # rotations must never silently drop plan pins (VERDICT r11 #7) —
    # regenerate with `PYTHONPATH=. python tools/plan_shapes.py >
    # PLANSHAPES.json` after any intentional surface or plan change.
    assert name in snapshot, (
        f"{name} is pinned (driver/bench/demoted baseline) but absent "
        "from PLANSHAPES.json — regenerate the snapshot"
    )
    want = snapshot[name]
    if "__error__" in want:
        pytest.skip(f"snapshot recorded an error for {name}")
    got = plan_shape(REGISTRY[name].fn(spark, sf_dir))
    diff = {
        k: (want.get(k, 0), got.get(k, 0))
        for k in set(want) | set(got)
        if want.get(k, 0) != got.get(k, 0)
    }
    assert not diff, (
        f"{name}: plan shape drifted (node: snapshot→now) {diff}; if "
        "intentional, regenerate PLANSHAPES.json (tools/plan_shapes.py)"
    )
