"""Pins the corpus-size-derived ANN selection policy (VERDICT r3 #1/#2):

- the Python helpers (`_k_target` / `_seed_mod` / `_query_mod`) and the
  DuckDB `_PARAMS_SQL` mirror must stay BIT-IDENTICAL for every n —
  the oracle and the Spark plan choose seeds/queries from the same rule;
- k (centroid count → driver dict, broadcast size, per-vector assign
  cost) is HARD-CAPPED at K_CAP, so the k-means assign step is O(n·K_CAP)
  — linear — once n ≥ CELL_TARGET·K_CAP;
- the query set is ~Q_TARGET rows for every corpus size, so the
  `similarity_topk_vectorized` driver collect is O(Q_TARGET·DIM), never
  O(n).

A fixed-literal modulus (the round-2/3 `vec_id % 100` / `% 50`) made both
grow linearly with the corpus; any edit that reintroduces that fails here.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_python_airflow_bigquery_spark.queries.similarity import (
    CELL_TARGET,
    K_CAP,
    Q_TARGET,
    _PARAMS_SQL,
    _k_target,
    _query_mod,
    _seed_mod,
)

NS = [0, 1, 5, 39, 40, 99, 100, 101, 500, 2000, 6399, 6400, 6401,
      20_000, 409_600, 10**6, 10**9, 10**12]


def test_python_duckdb_policy_identical():
    con = duckdb.connect()
    for n in NS:
        if n <= 20_000:
            # evaluate the exact SQL fragment the oracles embed, against
            # a synthetic `embeddings` relation of n rows
            con.execute("CREATE OR REPLACE VIEW embeddings AS "
                        f"SELECT * FROM range({n})")
            sql = ("WITH " + _PARAMS_SQL
                   + " SELECT seed_mod, query_mod FROM params")
        else:
            # huge n: same arithmetic with count(*) substituted (a real
            # range() view would materialize n rows)
            sql = ("WITH " + _PARAMS_SQL.replace("count(*)", str(n))
                   .replace("FROM embeddings", "")
                   + " SELECT seed_mod, query_mod FROM params")
        seed_mod, query_mod = con.execute(sql).fetchone()
        assert (seed_mod, query_mod) == (_seed_mod(n), _query_mod(n)), n


def test_k_is_hard_capped():
    assert _k_target(CELL_TARGET * K_CAP) == K_CAP
    for n in (10**6, 10**9, 10**12):
        assert _k_target(n) == K_CAP
        # once capped, seed_mod grows ∝ n: assign cost O(n·K_CAP), linear
        assert _seed_mod(n) == n // K_CAP


def test_query_set_is_bounded():
    for n in NS:
        if n == 0:
            continue
        # contiguous ids 0..n-1 → ceil(n / query_mod) selected queries;
        # worst case (n just under a modulus boundary, e.g. n=2Q-1 →
        # query_mod 1) is < 2·Q_TARGET — O(1) in the corpus size either way
        q = -(-n // _query_mod(n))
        assert q < 2 * Q_TARGET or q <= n, (n, q)
        assert q <= 2 * Q_TARGET or n < Q_TARGET, (n, q)
        if n >= Q_TARGET:
            assert q >= Q_TARGET // 2  # never degenerates to ~no queries


def test_testdata_scales_unchanged_from_r3():
    # at the driver's correctness (n=500) and bench (n=2000) scales the
    # derived moduli equal round-3's literals — bench numbers comparable
    assert _seed_mod(500) == 100 and _seed_mod(2000) == 100
    assert _query_mod(2000) == 50


def test_policy_is_monotone_never_zero():
    prev_k = 0
    for n in NS:
        k = _k_target(n)
        assert 1 <= k <= K_CAP
        assert k >= prev_k
        assert _seed_mod(n) >= 1 and _query_mod(n) >= 1
        prev_k = k


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_pq_policy_identical_and_bounded():
    """The PQ codebook seed modulus mirrors between Python and the
    DuckDB `pqparams` CTE for every n, and the codebook is BOUNDED:
    exactly K_PQ codewords per subspace regardless of corpus size
    (driver state M×K_PQ×SUB ints — the same fixed-size contract as
    the IVF centroid table)."""
    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _PQ_K,
        _PQPARAMS_SQL,
        _pq_mod,
    )

    con = duckdb.connect()
    for n in NS:
        if n <= 20_000:
            con.execute("CREATE OR REPLACE VIEW embeddings AS "
                        f"SELECT * FROM range({n})")
            got = con.execute(
                "WITH " + _PQPARAMS_SQL + " SELECT pq_mod FROM pqparams"
            ).fetchone()[0]
        else:
            got = con.execute(
                "SELECT " + _PQPARAMS_SQL.split("SELECT", 1)[1]
                .replace("count(*)", str(n)).replace("FROM embeddings)", "")
            ).fetchone()[0]
        assert got == _pq_mod(n), (n, got, _pq_mod(n))
        # seeds under the modulus: at most ~K_PQ+1 candidates before the
        # LIMIT, and the codebook itself is exactly min(n, K_PQ) rows
        if n:
            assert (n - 1) // _pq_mod(n) + 1 >= min(n, _PQ_K)


def test_kmeans_cache_path_signature_tracks_content(tmp_path):
    """ADVICE r8 (low): the session fit cache keys on a file-listing
    signature, so rewriting the dataset at the same path within a
    session changes the key (stale centroids are never served)."""
    import os
    import time

    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _path_signature,
    )

    emb = tmp_path / "embeddings.parquet"
    emb.mkdir()
    (emb / "part-0.parquet").write_bytes(b"aaaa")
    s1 = _path_signature(str(tmp_path))
    assert s1 == _path_signature(str(tmp_path))  # stable on same content
    time.sleep(0.01)
    (emb / "part-0.parquet").write_bytes(b"bbbbbb")  # in-session rewrite
    s2 = _path_signature(str(tmp_path))
    assert s2 != s1
    # layout change (new part file) also invalidates
    (emb / "part-1.parquet").write_bytes(b"cc")
    assert _path_signature(str(tmp_path)) not in (s1, s2)
    # a bare-file table (no embeddings.parquet subdir) signs the path itself
    solo = tmp_path / "solo"
    solo.mkdir()
    (solo / "data.parquet").write_bytes(b"x")
    assert _path_signature(str(solo))


def test_kmeans_cache_signature_sees_nested_partition_rewrites(tmp_path):
    """ADVICE r9 (low): under a PARTITIONED layout the top-level entries
    are partition directories — an in-place rewrite of a LEAF file that
    leaves the directory's own size/mtime untouched must still change
    the signature (the walk stats leaves, not just immediate children)."""
    import os

    from etl_python_airflow_bigquery_spark.queries.similarity import (
        _path_signature,
    )

    emb = tmp_path / "embeddings.parquet"
    part = emb / "fecha=2025-01-01"
    part.mkdir(parents=True)
    leaf = part / "part-0.parquet"
    leaf.write_bytes(b"aaaa")
    os.utime(part, (1_000_000_000, 1_000_000_000))  # pin the dir stats
    s1 = _path_signature(str(tmp_path))
    # same-size leaf rewrite with a bumped mtime; dir stats re-pinned
    leaf.write_bytes(b"bbbb")
    os.utime(leaf, (1_100_000_000, 1_100_000_000))
    os.utime(part, (1_000_000_000, 1_000_000_000))
    assert _path_signature(str(tmp_path)) != s1
