"""Large-k IVF end to end on the sf1 replica (VERDICT r5 #5): build an
index with k ≥ 512 centroids — PAST the LITERAL_ASSIGN_MAX=256 dispatch
boundary, so every assign runs in the broadcast-argmin regime — on the
REAL 20k-vector corpus, pin the broadcast plan shape, and gate recall@3
against numpy brute force. This is the production-k regime the
K_CAP-policy queries never enter; the synthetic tie-break fixture only
proved equivalence, not behavior on a real corpus."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.queries.similarity import (
    DIM,
    LITERAL_ASSIGN_MAX,
    _assign_cells,
    _centroid_values_df,
    _int_vectors,
)

SF1 = "/root/repo/.scale/sf1"
K_TARGET = 512
NPROBE = 8
TOP_K = 3
QUERY_MOD = 500  # 40 queries over the 20k corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(SF1, "embeddings.parquet")),
    reason="sf1 replica absent — generate with tools/gen_scale.py",
)


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    enteros = _int_vectors(emb).localCheckpoint(eager=True)
    return enteros


def _fit_large_k(spark, enteros) -> dict[int, list[int]]:
    """Seed ~K_TARGET centroids by id-stride (the corpus-derived policy
    shape, uncapped), then one Lloyd refinement round — both assigns run
    the broadcast-argmin form because k > LITERAL_ASSIGN_MAX."""
    n = enteros.count()
    mod = max(1, n // K_TARGET)
    cent = {
        r["vec_id"]: list(r["ev"])
        for r in enteros.where(F.col("vec_id") % mod == 0).collect()
    }
    assert len(cent) > LITERAL_ASSIGN_MAX, len(cent)
    asig = _assign_cells(enteros, cent)
    upd = (
        asig.join(enteros, "vec_id")
        .select("celda", F.posexplode("ev").alias("k0", "x"))
        .groupBy("celda", (F.col("k0") + 1).alias("k"))
        .agg(
            F.floor(F.sum("x").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("cv")
        )
        .collect()
    )
    nuevo: dict[int, list[int]] = {}
    for r in upd:
        nuevo.setdefault(r["celda"], [0] * DIM)[r["k"] - 1] = r["cv"]
    return {**cent, **nuevo}


def test_large_k_assign_plan_is_broadcast_partial_argmin(spark, corpus):
    """Plan pin in the k>256 regime on the real corpus: the centroid
    table ships as ONE broadcast (no shuffle of the vector side before
    the argmin), and the argmin is a two-phase aggregate (partial map
    side, final after one n-row exchange) — the plan is O(1) in k."""
    n = corpus.count()
    mod = max(1, n // K_TARGET)
    cent = {
        r["vec_id"]: list(r["ev"])
        for r in corpus.where(F.col("vec_id") % mod == 0).collect()
    }
    assert len(cent) > LITERAL_ASSIGN_MAX
    plan = _assign_cells(corpus, cent)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # broadcast-dim cross, by design
    assert "BroadcastExchange" in plan
    # two-phase argmin: a PARTIAL min(struct) collapses n×k rows map-side
    # before the single vec_id exchange (struct min plans as
    # SortAggregate — it is not hash-aggregable — but partial/final
    # split is what makes the shuffle n rows, not n×k)
    assert "partial_min(struct(d2" in plan
    assert plan.count("SortAggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_large_k_ivf_recall_vs_brute_force(spark, corpus):
    """Recall gate at k≈512, nprobe=8 (~1.6% of cells scored/query):
    recall@3 must clear 0.5 — two orders of magnitude above the ~0.016
    a random same-sized candidate set would score — on the REAL sf1
    corpus, queries drawn from the corpus itself (self excluded)."""
    cent = _fit_large_k(spark, corpus)
    asig = _assign_cells(corpus, cent).localCheckpoint(eager=True)

    queries = corpus.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    cent_df = _centroid_values_df(spark, cent)
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("sv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("d2", "seed_id")
    qcells = (
        queries.crossJoin(F.broadcast(cent_df))
        .select("query_id", "seed_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= NPROBE)
        .select("query_id", F.col("seed_id").alias("celda"))
    )
    cands = qcells.join(asig, "celda").where(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", F.col("vec_id").alias("cand_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        cands.join(queries, "query_id")
        .join(corpus.select(F.col("vec_id").alias("cand_id"),
                            F.col("ev").alias("cv")), "cand_id")
        .select("query_id", "cand_id", dot.alias("dot"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    norms = corpus.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("ev"), F.col("ev"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("nn"),
    )
    got_rows = (
        scored.join(
            norms.select(F.col("vec_id").alias("query_id"),
                         F.col("nn").alias("nq")), "query_id")
        .join(
            norms.select(F.col("vec_id").alias("cand_id"),
                         F.col("nn").alias("nc")), "cand_id")
        .withColumn(
            "cos",
            F.col("dot").cast("double")
            / F.sqrt(F.col("nq").cast("double") * F.col("nc").cast("double")),
        )
        .withColumn("pos", F.row_number().over(wr))
        .where(F.col("pos") <= TOP_K)
        .collect()
    )
    got: dict[int, set[int]] = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])

    # numpy brute-force ground truth over the FULL corpus
    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.array(r["ev"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qmask = ids % QUERY_MOD == 0
    idx_of = {int(v): i for i, v in enumerate(ids)}
    hits = total = 0
    for qi in np.flatnonzero(qmask):
        cos = mat @ mat[qi]
        cos[qi] = -np.inf
        # ties-tolerant recall: the replica gives every vector 9 EXACT
        # clones (identical embeddings under shifted ids), so "the" top-3
        # is an arbitrary pick among cos=1.0 ties — a retrieved candidate
        # counts iff its true cosine clears the 3rd-best true cosine
        thresh = np.partition(cos, -TOP_K)[-TOP_K] - 1e-9
        hits += sum(
            1
            for c in got.get(int(ids[qi]), set())
            if cos[idx_of[c]] >= thresh
        )
        total += TOP_K
    recall = hits / total
    assert total == TOP_K * int(qmask.sum())
    assert recall >= 0.5, f"recall@{TOP_K} = {recall:.3f} at k={len(cent)}"
