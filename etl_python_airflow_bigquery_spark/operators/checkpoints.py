"""Lineage truncation for iterative operators — local by default,
RELIABLE on request.

Iterative plans (PageRank rounds, BFS frontiers, CC label propagation)
must cut their lineage each round or Catalyst replays the whole upstream
pipeline into every iteration. ``localCheckpoint`` does that cheaply but
stores blocks EXECUTOR-LOCALLY and non-replayably: on a real cluster an
executor loss mid-iteration fails the job (restart, not corruption).
At 100 TB the right trade is an opt-in RELIABLE checkpoint — blocks
written to a fault-tolerant directory that survivors re-read, so an
executor loss replays instead of failing.

Opt in by setting ``SPARK_GRAFT_CHECKPOINT_DIR`` (or calling
``set_reliable_checkpoint_dir``); every iterative operator routes its
per-round truncation through :func:`iter_checkpoint`, so one switch
covers them all. Default (unset) keeps the fast local path — bit-identical
results either way, pinned by tests/test_plans.py's reliable-checkpoint
test, which drops every persisted block after the run and shows the
reliable result still answers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def set_reliable_checkpoint_dir(path: str | None) -> None:
    """Process-wide switch; ``None`` reverts to localCheckpoint."""
    if path is None:
        os.environ.pop(_ENV, None)
    else:
        os.environ[_ENV] = path


def reliable_checkpoint_dir() -> str | None:
    return os.environ.get(_ENV) or None


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage: reliable ``checkpoint`` into the configured
    fault-tolerant directory when one is set, else ``localCheckpoint``.
    The txlog warehouse is a natural home for the directory in
    production; any shared filesystem path works."""
    path = reliable_checkpoint_dir()
    if path:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(path)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
