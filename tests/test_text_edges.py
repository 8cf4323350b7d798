"""Hostile-text edge cases for the text family (ADVICE r5, high):
legitimate corpora contain single-token docs (URLs, no-space scripts),
empty strings, and NULL text. Under Spark 4's default ANSI mode an
unguarded positional fan-out (sequence(1, size-1) with a floor of 1)
throws INVALID_ARRAY_INDEX on such docs, while the DuckDB oracle
returns normally — a silent engine divergence. These tests pin both
engines on a fixture that contains every hostile shape."""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_python_airflow_bigquery_spark.queries import REGISTRY
from tools.compare import compare_frames

HOSTILE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "hello world hello world", "en", "web", 23),
    (2, "single", "en", "web", 6),  # single token: no adjacent pair
    (3, "", "en", "web", 0),  # empty text
    (4, None, "en", "web", 0),  # NULL text
    (5, "http://example.com/no-space-url", "en", "web", 31),  # no-space doc
    (6, "hello world again", "en", "books", 17),
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("hostile_text"))
    cols = list(zip(*HOSTILE_DOCS))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out, "documents.parquet"))
    return out


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_busqueda_frases_hostile_docs_matches_oracle(spark, hostile_sf_dir):
    q = REGISTRY["busqueda_frases"]
    got = q.fn(spark, hostile_sf_dir).toPandas()
    want = _oracle(hostile_sf_dir, q.oracle)
    assert compare_frames(got, want) == []
    # the phrase is "hello world" (2+1 occurrences) and only docs 1 and 6 match
    assert set(got["doc_id"]) == {1, 6}
    assert (got["frase"] == "hello world").all()


@pytest.mark.parametrize(
    "name",
    ["reglas_gopher", "ley_heaps", "token_count", "lang_id_ngram",
     "doc_fingerprint", "dedup_subcadenas", "colocaciones_pmi",
     "corpus_sin_subcadenas", "corpus_sin_subcadenas_incremental"],
)
def test_text_family_survives_hostile_docs(spark, hostile_sf_dir, name):
    if name not in REGISTRY:
        pytest.skip(f"{name} not registered")
    df = REGISTRY[name].fn(spark, hostile_sf_dir)
    df.count()  # must not raise (INVALID_ARRAY_INDEX, div-by-zero, ...)


def test_corpus_sin_subcadenas_cuts_exactly_the_shared_spans(spark, tmp_path):
    """Content semantics pinned on a crafted corpus: two docs share one
    40-char block at stride-aligned offsets; the cut removes exactly that
    block (both tiles of the duplicated window) from BOTH docs and keeps
    the distinct surroundings; a third doc with no shared span and a
    short doc pass through byte-identical."""
    import hashlib
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = "X" * 19 + " " + "Y" * 19 + " "  # 40 chars, one window
    a_pre, a_post = "a" * 40, "b" * 40
    b_pre, b_post = "c" * 40, "d" * 40
    rows = [
        (1, a_pre + shared + a_post),
        (2, b_pre + shared + b_post),
        (3, "unique text with no shared span at all here"),
        (4, "short"),
    ]
    out = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["web"] * 4, pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        _os.path.join(out, "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in REGISTRY["corpus_sin_subcadenas"].fn(spark, out).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # the shared block occupies chars 41-80 of both docs — exactly window
    # i=2 (windows start at 0,20,40,...); it is the only window hashing
    # equal across distinct docs, so tiles {2,3} are cut and the pre
    # (tiles 0,1) / post (tiles 4,5) 40-char runs survive.
    assert got[1]["huella"] == md5(a_pre + a_post)
    assert got[1]["n_limpio"] == 80 and got[1]["n_original"] == 120
    assert got[2]["huella"] == md5(b_pre + b_post)
    assert got[3]["huella"] == md5(rows[2][1])  # untouched
    assert got[4]["huella"] == md5("short")  # sub-window doc passes whole


from hypothesis import given, settings, strategies as st  # noqa: E402


def _cut_reference(texts: list[str], w: int = 40, s: int = 20) -> dict[int, str]:
    """Pure-Python reference for the tile cut: windows at stride s of
    width w; a window duplicated across >=2 distinct docs cuts its two
    tiles; docs rebuild from surviving tiles."""
    wins: dict[str, set[int]] = {}
    per_doc: list[list[tuple[int, str]]] = []
    for d, t in enumerate(texts):
        t = t or ""
        ws = []
        if len(t) >= w:
            for i in range((len(t) - w) // s + 1):
                win = t[i * s : i * s + w]
                ws.append((i, win))
                wins.setdefault(win, set()).add(d)
        per_doc.append(ws)
    out = {}
    for d, t in enumerate(texts):
        t = t or ""
        cut: set[int] = set()
        for i, win in per_doc[d]:
            if len(wins[win]) >= 2:
                cut.update((i, i + 1))
        tiles = [
            t[k * s : k * s + s]
            for k in range((len(t) - 1) // s + 1)
            if k not in cut
        ] if t else []
        out[d] = "".join(tiles)
    return out


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abX ", min_size=0, max_size=120),
        min_size=1,
        max_size=6,
    )
)
def test_corpus_sin_subcadenas_matches_python_reference(
    spark_prop, tmp_path_factory, texts
):
    """Property pin for the tile-cut algebra: on random small-alphabet
    corpora (where 40-char windows collide constantly) the Spark cut
    must equal the pure-Python window/tile reference byte for byte."""
    import hashlib
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = spark_prop
    out = str(tmp_path_factory.mktemp("prop_cut"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["web"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        _os.path.join(out, "documents.parquet"),
    )
    got = {
        r["doc_id"]: r["huella"]
        for r in REGISTRY["corpus_sin_subcadenas"].fn(spark, out).collect()
    }
    want = _cut_reference(texts)
    for d, texto in want.items():
        assert got[d] == hashlib.md5(texto.encode()).hexdigest(), (
            d, texts[d], texto,
        )
