"""Orchestration shell (SURVEY.md §2.11 G1-G6): the reference's Airflow
DAG surface as plain driver-side Python — task graph with fan-out/fan-in,
per-task retry, success/failure flags feeding a run manifest, holiday
gating, and the parametric job matrix. No scheduler dependency: the
driver process IS the orchestrator; Spark handles all distribution.
"""

from __future__ import annotations

import itertools
import time
import traceback
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field


@dataclass
class Task:
    """One node of the pipeline graph (≈ a PythonOperator body)."""

    name: str
    fn: Callable[[], object]
    depends_on: tuple[str, ...] = ()
    retries: int = 1
    retry_delay_s: float = 0.0
    gate: Callable[[], bool] | None = None  # G5: e.g. holiday skip


@dataclass
class RunManifest:
    """G3: the flag_on/flag_off status surface (audio_digital.py:563-570)
    consumed by the monitoring report (email_seguimiento.py:40-44)."""

    statuses: dict[str, str] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)
    timings_s: dict[str, float] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(s in ("ok", "skipped") for s in self.statuses.values())


def run_pipeline(tasks: Sequence[Task]) -> RunManifest:
    """G1/G2: execute the task graph in dependency order (a>>b>>c with
    fan-out/fan-in). Downstream tasks of a failure are marked blocked —
    the Airflow upstream_failed semantic."""
    manifest = RunManifest()
    by_name = {t.name: t for t in tasks}
    done: set[str] = set()
    pending = list(tasks)
    while pending:
        progressed = False
        for task in list(pending):
            if any(d not in done for d in task.depends_on):
                continue
            pending.remove(task)
            done.add(task.name)
            progressed = True
            if any(
                manifest.statuses.get(d) in ("failed", "blocked")
                for d in task.depends_on
            ):
                manifest.statuses[task.name] = "blocked"
                continue
            if task.gate is not None and not task.gate():
                manifest.statuses[task.name] = "skipped"
                continue
            t0 = time.perf_counter()
            # retries counts ATTEMPTS; a task always runs at least once —
            # retries=0 must not report "ok" for work that never executed.
            err: str | None = "never attempted"
            for attempt in range(max(1, task.retries)):
                try:
                    task.fn()
                    err = None
                    break
                except Exception:  # noqa: BLE001
                    err = traceback.format_exc(limit=3)
                    if task.retry_delay_s:
                        time.sleep(task.retry_delay_s * (attempt + 1))
            manifest.timings_s[task.name] = round(time.perf_counter() - t0, 3)
            if err is None:
                manifest.statuses[task.name] = "ok"
            else:
                manifest.statuses[task.name] = "failed"
                manifest.errors[task.name] = err
        if not progressed:
            for task in pending:  # unsatisfiable deps (cycle/missing)
                manifest.statuses[task.name] = "blocked"
                manifest.errors[task.name] = f"unresolved deps {task.depends_on}"
            break
    _ = by_name
    return manifest


def job_matrix(**axes: Iterable) -> list[dict]:
    """G6: the itertools.product fan-out over (aggs × content_types ×
    vips) (audio_digital.py:307, funnel_property.py:227) — each combo
    becomes one DataFrame branch, unioned by the caller."""
    names = list(axes)
    return [dict(zip(names, combo)) for combo in itertools.product(*axes.values())]
