"""sf1 correctness evidence for the quadratic-oracle class (VERDICT r8
#10): ``dedup_semantico`` / ``grafo_knn_mutuo`` / ``agrupacion_densidad``
/ ``tamanos_familias`` (and their round-9 hierarchical twins) compare
against DuckDB only at the 3 small SFs because their recursive/unrolled
oracles blow up at sf1 — so the 10× scale point, until now, only proved
EXECUTION. These are oracle-free property checks on the real 10× replica
(.scale/sf1, built by tools/gen_scale.py): conservation (per-cell counts
sum to the corpus), bounds (dups ≤ members, mutual ≤ directed ≤ k·nodes),
structural parity (mutual edges pair up; flat density clusters stay
cell-contained), and τ-monotonicity of the SemDeDup drop rate."""

from __future__ import annotations

import os

import pytest

from etl_python_airflow_bigquery_spark.queries import REGISTRY

SF1 = "/root/repo/.scale/sf1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(SF1, "embeddings.parquet")),
    reason="sf1 replica absent — generate with tools/gen_scale.py",
)


@pytest.fixture(scope="module")
def n_vectors(spark):
    return spark.read.parquet(os.path.join(SF1, "embeddings.parquet")).count()


@pytest.fixture(scope="module")
def n_docs(spark):
    return spark.read.parquet(os.path.join(SF1, "documents.parquet")).count()


def test_sf1_dedup_semantico_plano_conservation_and_bounds(spark, n_vectors):
    # flat K_CAP=64 baseline (the production name is the 2-probe form
    # since round 11; its conservation is pinned below)
    rows = REGISTRY["dedup_semantico_plano"].fn(spark, SF1).collect()
    assert sum(r["vecs"] for r in rows) == n_vectors  # cells partition n
    for r in rows:
        assert 0 <= r["duplicados"] <= r["vecs"]
        assert r["tasa_mili"] == r["duplicados"] * 1000 // r["vecs"]


def test_sf1_dedup_semantico_jerarquico_conservation(spark, n_vectors):
    rows = REGISTRY["dedup_semantico_jerarquico"].fn(spark, SF1).collect()
    assert sum(r["vecs"] for r in rows) == n_vectors  # leaves partition n
    assert len(rows) > 64  # the point of the hierarchy: leaves > K_CAP
    for r in rows:
        assert 0 <= r["duplicados"] <= r["vecs"]


def test_sf1_semdedup_drop_rate_monotone_in_tau(spark, monkeypatch):
    """A higher τ can only drop FEWER vectors — the monotonicity the
    threshold knob promises, checked on the real 10× corpus."""
    from etl_python_airflow_bigquery_spark.queries import similarity

    def total_dups() -> int:
        rows = REGISTRY["dedup_semantico"].fn(spark, SF1).collect()
        return sum(r["duplicados"] for r in rows)

    lo = total_dups()  # τ = 0.35 (the registered gate)
    monkeypatch.setattr(similarity, "_SEMDEDUP_TAU", 0.45)
    hi = total_dups()
    assert hi <= lo
    assert lo > 0  # the fixture has signal at the registered τ


def test_sf1_knn_mutuo_plano_bounds_and_pairing(spark):
    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _KNN_GRAFO_K,
    )

    rows = REGISTRY["grafo_knn_mutuo_plano"].fn(spark, SF1).collect()
    assert rows
    for r in rows:
        assert 0 < r["aristas_knn"] <= _KNN_GRAFO_K * r["miembros"]
        assert 0 <= r["aristas_mutuas"] <= r["aristas_knn"]
        # flat blocking: both endpoints share the cell, so each mutual
        # pair contributes exactly 2 directed edges to ITS OWN cell
        assert r["aristas_mutuas"] % 2 == 0
    # the graph is useful: some mutual structure exists at 10×
    assert sum(r["aristas_mutuas"] for r in rows) > 0


def test_sf1_knn_mutuo_jerarquico_bounds(spark):
    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _KNN_GRAFO_K,
    )

    rows = REGISTRY["grafo_knn_mutuo_jerarquico"].fn(spark, SF1).collect()
    assert len(rows) > 64  # leaf census, past the flat cap
    for r in rows:
        assert 0 < r["aristas_knn"] <= _KNN_GRAFO_K * r["miembros"]
        assert 0 <= r["aristas_mutuas"] <= r["aristas_knn"]
    # endpoints may have different PRIMARY leaves (the 2-probe rescue),
    # so evenness holds only for the TOTAL
    assert sum(r["aristas_mutuas"] for r in rows) % 2 == 0
    assert sum(r["aristas_mutuas"] for r in rows) > 0


def test_sf1_densidad_components_cell_contained(spark):
    """Flat blocking forms mutual edges only WITHIN a cell, so every
    component must span exactly one cell — the containment the
    per-group union-find relies on, asserted at 10×."""
    rows = REGISTRY["agrupacion_densidad_plana"].fn(spark, SF1).collect()
    assert rows
    for r in rows:
        assert r["miembros"] >= 2  # components come from edges
        assert r["celda_min"] == r["celda_max"]


def test_sf1_densidad_jerarquica_bounds(spark):
    """Components over the 2-probe graph keep their structural bounds at
    10×. NOTE: no cross-leaf cluster is asserted HERE — the sf1 replica
    is 10 shifted-id copies of sf0.1, so every vector has ≥9 exact
    clones (d2 = 0) that monopolize its top-3 and assign to its own
    leaf, making mutual edges same-leaf by data, not by construction.
    The cross-leaf rescue property is pinned on the organic corpus at
    sf0.01 (test_similarity_recall.py::
    test_two_probe_rescues_cross_leaf_clusters)."""
    rows = REGISTRY["agrupacion_densidad_jerarquica"].fn(spark, SF1).collect()
    assert rows
    for r in rows:
        assert r["miembros"] >= 2
        assert r["hoja_min"] <= r["hoja_max"]


def test_sf1_tamanos_familias_partition_and_ladder(spark, n_docs):
    rows = REGISTRY["tamanos_familias"].fn(spark, SF1).collect()
    assert sum(r["docs"] for r in rows) == n_docs  # families partition docs
    for r in rows:
        assert r["familias"] >= 1
        assert 1 <= r["tam_min"] <= r["tam_max"]
        # the log2 ladder bands are honest: 2^banda ≤ tam < 2^(banda+1)
        assert (1 << r["banda_log2"]) <= r["tam_min"]
        assert r["tam_max"] < (1 << (r["banda_log2"] + 1))


def test_sf1_cobertura_sondas_identity_and_gain(spark):
    row = REGISTRY["cobertura_sondas"].fn(spark, SF1).collect()[0]
    assert row["pares_2sondas"] == row["pares_1sonda"] + row["ganancia"]
    assert row["ganancia"] > 0 and row["pares_1sonda"] > 0


def test_sf1_calibracion_sondas_monotone_and_unique_choice(spark):
    """Recall@k can only grow with nprobe (a rung-r candidate set is a
    subset of every rung >= r), and the choice flag marks exactly the
    cheapest qualifying rung — checked on the real 10x corpus, where
    the curve's shape (not its small-SF values) is the deliverable."""
    from etl_python_airflow_bigquery_spark.queries.serving import (
        _CAL_TARGET_MILI,
    )

    rows = sorted(
        REGISTRY["calibracion_sondas"].fn(spark, SF1).collect(),
        key=lambda r: r["nprobe"],
    )
    recalls = [r["recall_mili"] for r in rows]
    assert all(0 <= x <= 1000 for x in recalls)
    assert recalls == sorted(recalls)  # monotone in nprobe
    elegidas = [r for r in rows if r["elegida"]]
    qualifying = [r for r in rows if r["recall_mili"] >= _CAL_TARGET_MILI]
    if qualifying:
        assert len(elegidas) == 1
        assert elegidas[0]["nprobe"] == qualifying[0]["nprobe"]
    else:
        assert not elegidas


def test_sf1_costo_minimo_regional_is_a_per_part_minimum(spark):
    """Q2 shape at 10x: every surviving offer's price IS its part's
    minimum (one distinct price per part), and parts don't leak."""
    df = REGISTRY["costo_minimo_regional"].fn(spark, SF1)
    from pyspark.sql import functions as F

    por_parte = df.groupBy("parte").agg(
        F.min("precio_centavos").alias("mn"),
        F.max("precio_centavos").alias("mx"),
    )
    assert por_parte.where(F.col("mn") != F.col("mx")).count() == 0
    n_parts = spark.read.parquet(os.path.join(SF1, "part.parquet")).count()
    assert 0 < por_parte.count() <= n_parts


def test_sf1_participacion_inventario_threshold_holds(spark):
    """Q11 shape at 10x: every emitted part really exceeds twice the
    average share, recomputed independently from the grouped frame."""
    from pyspark.sql import functions as F

    out = REGISTRY["participacion_inventario"].fn(spark, SF1)
    fila = out.agg(
        F.count(F.lit(1)).alias("emitidos"), F.min("valor_centavos").alias("mn")
    ).first()
    # reconstruct the global scalars the query derived
    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(SF1, "supplier.parquet"))
    nat = spark.read.parquet(os.path.join(SF1, "nation.parquet"))
    reg = spark.read.parquet(os.path.join(SF1, "region.parquet"))
    asia = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(
            reg.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    valores = (
        li.join(asia, li.l_suppkey == asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("v")
        )
    )
    esc = valores.agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("grupos")
    ).first()
    assert fila["emitidos"] > 0
    # the smallest emitted value still clears the bar
    assert fila["mn"] * esc["grupos"] > 2 * esc["total"]
    # and the emitted count equals the independent recount
    recuento = valores.where(
        F.col("v") * F.lit(esc["grupos"]) > F.lit(2) * F.lit(esc["total"])
    ).count()
    assert fila["emitidos"] == recuento


def test_sf1_calibration_meets_recall_target(spark, tmp_path_factory):
    """VERDICT r12 #5: probe calibration at the 10x replica's geometry.
    calibrate_index on the sf1 index must record a rung whose measured
    recall meets the 900-milli target (the auto-extending ladder
    guarantees reachability — a full probe is exact), and the
    parameterless serve resolves that rung. On this replica the clone
    structure makes low rungs sufficient (a query's true neighbors are
    its shifted copies, co-located in its own cell) — the recall pin is
    the invariant; the cheap rung is the replica-shape bonus."""
    from pyspark.sql import functions as F

    from etl_python_airflow_bigquery_spark.operators.ann_index import (
        build_ivf_index,
        calibrate_index,
        read_index_meta,
    )
    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _emb,
        _int_vectors,
        _query_mod,
    )

    emb = _emb(spark, SF1)
    path = str(tmp_path_factory.mktemp("sf1idx"))
    build_ivf_index(spark, emb, path)
    n = emb.count()
    consultas = _int_vectors(emb).where(
        F.col("vec_id") % _query_mod(n) == 0
    ).select(F.col("vec_id").alias("query_id"), F.col("ev").alias("qv"))

    rung = calibrate_index(spark, consultas, path, target_mili=900)
    meta = read_index_meta(path)
    assert meta["nprobe_calibrado"] == rung >= 1
    assert meta["recall_mili_calibrado"] >= 900
