"""Property evidence for puntuacion_mmr and seleccion_coreset: on random
tiny embedding tables, the Spark pipelines must equal INDEPENDENT
pure-Python implementations of the textbook algorithms (greedy MMR with
λ = 0.7 over floored micro-cosines; k-center farthest-point traversal
over micro-scaled integer L2). The oracles already pin Spark against
DuckDB running the same unrolled algebra; these pin both against the
definitions computed a different way — pool ranking, tie-breaks, the
maxsim-over-selected fold, and the running min-distance update are
executed, not assumed."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from etl_python_airflow_bigquery_spark.queries.similarity import (
    _CORESET_K,
    _MMR_LAMBDA_DECI,
    _MMR_POOL,
    puntuacion_mmr,
    seleccion_coreset,
)

# small integer-grid components, first forced nonzero so no vector has a
# zero norm (cosine undefined); dim 4 keeps the reference fast
_comp = st.sampled_from([-1.0, -0.5, 0.5, 1.0])
_vec = st.tuples(
    st.sampled_from([0.5, 1.0]), _comp, _comp, _comp
).map(list)


def _write_embeddings(d: str, vecs: dict[int, list[float]]) -> None:
    ids = sorted(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in ids], pa.list_(pa.float64())
                ),
                "label": pa.array([i % 3 for i in ids], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def _idot(a, b):
    return sum(math.floor(x * y * 1e12) for x, y in zip(a, b))


def _ref_mmr(vecs: dict[int, list[float]]):
    lam, lam_c = _MMR_LAMBDA_DECI, 10 - _MMR_LAMBDA_DECI
    norms = {i: _idot(v, v) for i, v in vecs.items()}
    n = len(vecs)
    qm = max(1, n // 40)
    rows = set()
    for q in vecs:
        if q % qm != 0:
            continue
        rel = {}
        for c in vecs:
            if c == q:
                continue
            cos = _idot(vecs[q], vecs[c]) / math.sqrt(norms[q] * norms[c])
            rel[c] = math.floor(cos * 1e6)
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_POOL]
        sim = {
            (a, b): math.floor(
                _idot(vecs[a], vecs[b]) / math.sqrt(norms[a] * norms[b]) * 1e6
            )
            for a in pool
            for b in pool
            if a != b
        }
        sel: list[int] = []
        for pos in (1, 2, 3):
            best = None
            for c in pool:
                if c in sel:
                    continue
                ms = max((sim[(c, s)] for s in sel), default=0)
                punt = lam * rel[c] - lam_c * ms
                key = (punt, -c)
                if best is None or key > best[0]:
                    best = (key, c, punt)
            if best is None:
                break
            sel.append(best[1])
            rows.add((q, pos, best[1], best[2]))
    return rows


def _ref_coreset(vecs: dict[int, list[float]]):
    ev = {
        i: [math.floor(x * 1e6) for x in v] for i, v in vecs.items()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    if not ev:
        return set()
    first = min(ev)
    out = {(1, first, 0)}
    dm = {i: d2(ev[i], ev[first]) for i in ev if i != first}
    for pos in range(2, _CORESET_K + 1):
        if not dm:
            break
        c = max(dm, key=lambda i: (dm[i], -i))
        out.add((pos, c, dm[c]))
        cv = ev[c]
        del dm[c]
        for i in dm:
            dm[i] = min(dm[i], d2(ev[i], cv))
    return out


@settings(max_examples=8, deadline=None)
@given(
    raw=st.lists(_vec, min_size=2, max_size=14),
    stride=st.integers(min_value=1, max_value=5),
)
def test_mmr_equals_textbook_greedy(spark_prop, raw, stride):
    # non-contiguous ids exercise the % query_mod selection and tie-breaks
    vecs = {i * stride: v for i, v in enumerate(raw)}
    d = tempfile.mkdtemp(prefix="mmr_prop_")
    try:
        _write_embeddings(d, vecs)
        got = {
            (r["query_id"], r["pos"], r["cand_id"], r["punt"])
            for r in puntuacion_mmr(spark_prop, d).collect()
        }
        assert got == _ref_mmr(vecs)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    raw=st.lists(_vec, min_size=1, max_size=14),
    stride=st.integers(min_value=1, max_value=5),
)
def test_coreset_equals_farthest_point_traversal(spark_prop, raw, stride):
    vecs = {i * stride: v for i, v in enumerate(raw)}
    d = tempfile.mkdtemp(prefix="coreset_prop_")
    try:
        _write_embeddings(d, vecs)
        got = {
            (r["pos"], r["vec_id"], r["d2_sel"])
            for r in seleccion_coreset(spark_prop, d).collect()
        }
        assert got == _ref_coreset(vecs)
    finally:
        shutil.rmtree(d, ignore_errors=True)
