"""Incremental connected components (dedup.cc_incremental): the star-
contraction merge of new edges into stored labels must equal a full
recluster of the union graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.queries.dedup import (
    cc_incremental,
    propagate_min_labels,
)


def _labels_of(spark, edges):
    sym_half = spark.createDataFrame(edges, "src bigint, dst bigint")
    sym = sym_half.unionByName(
        sym_half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return propagate_min_labels(sym).select("doc_id", "cluster_id")


def _as_map(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_incremental_equals_full_recluster(spark):
    # stored world: {1,2,3} and {10,11}; singleton 20 tracked as label-only
    viejo = _labels_of(spark, [(1, 2), (2, 3), (10, 11)]).unionByName(
        spark.createDataFrame([(20, 20)], "doc_id bigint, cluster_id bigint")
    )
    # new batch: 100 bridges the two old clusters (via 3 and 10), 101
    # attaches to 20, 102 is brand new and isolated
    nuevos = spark.createDataFrame(
        [(3, 100), (100, 10), (20, 101)], "src bigint, dst bigint"
    )
    inc = _as_map(cc_incremental(viejo, nuevos))
    # ground truth: full recluster over ALL original + new edges
    full = _as_map(
        _labels_of(spark, [(1, 2), (2, 3), (10, 11), (3, 100), (100, 10), (20, 101)])
    )
    # 102 (a no-edge doc) reaches cc_incremental only through the label
    # table or the edge list — absent here, absent from both sides
    assert inc == full
    # the bridge MERGED the two old clusters transitively
    assert inc[11] == inc[1] == 1


def test_isolated_new_docs_found_their_own_cluster(spark):
    viejo = spark.createDataFrame([(5, 5)], "doc_id bigint, cluster_id bigint")
    # a batch edge list mentioning a doc linked only to itself is not a
    # real edge; isolated docs arrive via the label-only path
    nuevos = spark.createDataFrame([(7, 8)], "src bigint, dst bigint")
    got = _as_map(cc_incremental(viejo, nuevos))
    assert got == {5: 5, 7: 7, 8: 7}


def test_representative_flag_consistent(spark):
    viejo = _labels_of(spark, [(1, 2)])
    nuevos = spark.createDataFrame([(2, 3)], "src bigint, dst bigint")
    out = cc_incremental(viejo, nuevos)
    reps = {r["doc_id"]: r["representante"] for r in out.collect()}
    assert reps == {1: True, 2: False, 3: False}
