"""Transactional-table protocol tests (operators/txlog.py): snapshot
isolation, atomic version claims, conflict detection, time travel,
crashed-writer invisibility, vacuum root-set correctness."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.txlog import (
    CommitConflict,
    TxTable,
)


def _df(spark, lo, hi, val=1.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("v")
    )


def test_overwrite_append_read_roundtrip(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    assert t.version() == -1
    v0 = t.overwrite(_df(spark, 0, 5))
    assert v0 == 0 and t.read(spark).count() == 5
    v1 = t.append(_df(spark, 5, 8))
    assert v1 == 1 and t.read(spark).count() == 8
    # time travel: v0 still reads exactly its snapshot
    assert t.read(spark, version=0).count() == 5


def test_merge_upserts_and_inserts(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, 0, 5, val=1.0))
    staging = _df(spark, 3, 7, val=9.0)
    t.merge(spark, staging, key_cols=["k"])
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 9.0, 4: 9.0, 5: 9.0, 6: 9.0}


def test_concurrent_commit_conflicts_cleanly(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, 0, 3))
    # a second handle commits first; the slow writer's claim must fail
    t2 = TxTable(str(tmp_path / "t"))
    t2.append(_df(spark, 10, 12))
    files = t._write_files(_df(spark, 20, 22))
    with pytest.raises(CommitConflict):
        t._claim({"files": files, "op": "append", "schema": "{}"}, expected_parent=0)
    # loser's data files are orphans — invisible to readers
    assert t.read(spark).count() == 5
    assert {r["k"] for r in t.read(spark).collect()} == {0, 1, 2, 10, 11}


def test_crashed_writer_leaves_no_trace(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, 0, 4))
    # simulate a crash AFTER data files land but BEFORE the manifest claim
    t._write_files(_df(spark, 100, 200))
    assert t.read(spark).count() == 4  # orphans invisible
    # vacuum collects them (keep only the live version's root set)
    removed = t.vacuum(keep_versions=1)
    assert removed > 0
    assert t.read(spark).count() == 4


def test_vacuum_preserves_kept_versions(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, 0, 3))
    t.overwrite(_df(spark, 0, 6))
    t.overwrite(_df(spark, 0, 9))
    t.vacuum(keep_versions=2)
    assert t.read(spark, version=1).count() == 6  # kept
    assert t.read(spark).count() == 9
    with pytest.raises(FileNotFoundError):
        t._manifest(0)  # dropped manifest
    # old version's exclusive files are gone from data/
    assert t.version() == 2


def test_empty_append_then_read_schema(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.overwrite(_df(spark, 0, 0))  # zero rows
    df = t.read(spark)
    assert df.count() == 0
    assert set(df.columns) == {"k", "v"}
