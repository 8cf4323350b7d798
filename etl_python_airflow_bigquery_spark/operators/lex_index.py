"""Persistent LEXICAL index: the inverted-postings twin of the ANN
index (operators/ann_index.py) — BM25 serving without a corpus rescan.

Every registered BM25 query (busqueda_bm25 / busqueda_invertida / the
hybrid's lexical leg) rebuilds tf/dl from the documents table inline so
the DuckDB oracle can replay the whole computation. Production does
not: an inverted index is built offline, STORED, and served per query —
the scan cost of a search is the QUERY TERMS' posting lists, not the
corpus. This module is that lifecycle over the engine's own txlog
tables:

* ``build_lex_index`` — one token explode → ``postings`` (token,
  doc_id, tf; range-clustered on token so per-file token min/max stats
  stay tight) + ``longitudes`` (doc_id, dl) + index metadata
  (n docs, avgdl in milli-units).
* ``add_to_lex_index`` — incremental growth: new documents' postings
  and lengths append as one manifest flip each; n/avgdl maintained in
  the metadata read-modify-write with the ann_index version-stamp
  self-heal discipline.
* ``search_bm25_lex_index`` — the serve: reads ONLY the query terms'
  posting files (``TxTable.read_in`` stats pruning on token), derives
  idf from those postings, scores with the engine's integer BM25
  (exactly busqueda_bm25's milli algebra — the index is EXACT, not
  approximate: served output equals the brute query row for row), and
  returns top-k via TakeOrderedAndProject.

* ``pin_lex_version`` / ``vacuum_lex_index`` / ``maybe_auto_vacuum_lex``
  — the same operational lifecycle as the ANN index (one shared
  keep+slack policy): ingest-triggered reclamation of superseded
  posting history, with tags as GC roots so a pinned time-travel serve
  provably survives any vacuum horizon. ``streaming.jobs.run_lex_ingest``
  is the continuous face: batch-only tokenize per micro-batch, flip,
  compact past the gate, vacuum past the horizon.

At 100 TB: postings are token-clustered so a 3-term query touches the
files covering 3 token ranges; ``longitudes`` joins doc-keyed on the
candidate set; the only corpus-scale work happened once, at build.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    in_literals,
    local_df,
    ranked_topk,
)
from etl_python_airflow_bigquery_spark.operators.txlog import TxTable

# Target file count for the token-range clustering of the postings
# table: enough ranges that a few-term query prunes most files, few
# enough that per-file overhead stays negligible.
_LEX_FILES = 16


def _tables(path: str) -> tuple[TxTable, TxTable]:
    return (
        TxTable(f"{path}/postings", stats_cols=["token"]),
        TxTable(f"{path}/longitudes"),
    )


def _meta_path(path: str) -> str:
    return os.path.join(path, "lex_meta.json")


def _write_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, f"_tmp_meta_{_uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _meta_path(path))


def read_lex_meta(path: str) -> dict:
    """{'n': doc count, 'dl_total': Σ doc lengths, 'avgdl_mili':
    (dl_total*1000) div n, 'version': postings version the counts were
    computed at}. Serve paths read corpus constants from HERE, never by
    recounting the source (the ann_index read_index_meta contract)."""
    with open(_meta_path(path)) as fh:
        return json.load(fh)


def lex_meta_current(spark: SparkSession, path: str) -> dict:
    """``read_lex_meta`` with the version-stamp self-heal (ADVICE r10
    discipline): on version mismatch, n/dl_total recount from the
    CURRENT longitudes snapshot and the cache heals."""
    post_tx, dl_tx = _tables(path)
    v = post_tx.version()
    meta = read_lex_meta(path)
    if meta.get("version") == v:
        return meta
    fila = dl_tx.read(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    meta["n"] = int(fila["n"])
    meta["dl_total"] = int(fila["t"] or 0)
    meta["avgdl_mili"] = (
        (meta["dl_total"] * 1000) // meta["n"] if meta["n"] else 1
    ) or 1
    meta["version"] = v
    _write_meta(path, meta)
    return meta


def _resolve_dl_version(path: str, postings_version: int, dl_tx: TxTable) -> int:
    """Map a POSTINGS version to the LENGTHS version that was current
    when it committed. The two tables' version counters desync the
    moment a postings-only compaction runs (``add_to_lex_index`` past
    the file gate compacts postings but not lengths), so a pinned serve
    or a pin tag must NOT reuse the postings version number against the
    lengths table — it would read a lengths manifest that never existed
    or one the vacuum is free to reclaim. The authoritative mapping is
    persisted in the index metadata (``dl_por_version``, maintained by
    every commit path); for pre-mapping indexes the counters were in
    lockstep, so fall back to the same number clamped to the lengths
    table's current version."""
    try:
        mapa = read_lex_meta(path).get("dl_por_version") or {}
    except FileNotFoundError:
        mapa = {}
    v = mapa.get(str(postings_version))
    if v is not None:
        return int(v)
    return min(postings_version, dl_tx.version())


def _postings_frame(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(postings, longitudes) from a documents frame — the one token
    explode; identical algebra to the inline BM25 queries
    (queries/text.py busqueda_bm25, similarity.hibrida_corpus_stats).

    The postings rows carry the document length DENORMALIZED
    (token, doc_id, tf, dl): BM25's per-row score needs dl, and storing
    it next to tf means every serve reads it from the already-pruned
    posting files instead of joining the corpus-sized ``longitudes``
    table per call (guide §6/§3 — at 100 TB that join is a full scan of
    one row per corpus document on every query). ``longitudes`` still
    persists as the authority for the corpus constants (n, avgdl) and
    for pre-denormalization readers. tf is checkpointed because BOTH
    the dl aggregate and the postings join consume it — the old shape
    re-tokenized the corpus once per output table anyway."""
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    ).localCheckpoint(eager=False)
    return tf.join(dl, "doc_id").select("token", "doc_id", "tf", "dl"), dl


def build_lex_index(spark: SparkSession, docs: DataFrame, path: str) -> dict:
    """Tokenize + invert + persist. Returns {'n', 'avgdl_mili',
    'version'}.

    The lengths write and the corpus-constant aggregate run overlapped
    with the postings write (guide §2.6): dl materializes eagerly first
    (its job also finalizes the shared tf checkpoint, so neither lane
    re-tokenizes), then the two table commits and the n/avgdl scalar
    are independent. The constants aggregate reads the dl FRAME (the
    exact rows both writes persist) instead of re-reading the table
    just written."""
    from concurrent.futures import ThreadPoolExecutor

    postings, dl = _postings_frame(docs)
    post_tx, dl_tx = _tables(path)
    # the constants aggregate runs FIRST: its job finalizes the shared
    # tf and dl checkpoints, so the two write lanes below read blocks
    # instead of re-tokenizing the corpus concurrently
    fila = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_post = pool.submit(
            lambda: post_tx.overwrite(
                postings.repartitionByRange(_LEX_FILES, "token", "doc_id")
            )
        )
        dl_v = dl_tx.overwrite(dl)
        v = f_post.result()
    n = int(fila["n"])
    dl_total = int(fila["t"] or 0)
    meta = {
        "n": n,
        "dl_total": dl_total,
        "avgdl_mili": ((dl_total * 1000) // n if n else 1) or 1,
        "version": v,
        "dl_por_version": {str(v): dl_v},
    }
    _write_meta(path, meta)
    return {"n": n, "avgdl_mili": meta["avgdl_mili"], "version": v}


def add_to_lex_index(spark: SparkSession, docs_new: DataFrame, path: str) -> int:
    """Incremental growth: the new documents' postings and lengths
    append — one manifest flip per table, no corpus retokenize. The
    postings table compacts (token-range-clustered) past the shared
    ann_index file gate so stats pruning survives streamed ingest;
    corpus constants maintain via the version-stamped metadata RMW
    (crash / lost-increment healed by ``lex_meta_current``)."""
    from etl_python_airflow_bigquery_spark.operators.ann_index import (
        _COMPACT_FILE_GATE,
    )

    postings, dl = _postings_frame(docs_new)
    post_tx, dl_tx = _tables(path)
    fila = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    v_append = post_tx.append(postings)
    dl_v = dl_tx.append(dl)
    v = v_append
    if len(post_tx._manifest(v)["files"]) >= _COMPACT_FILE_GATE:
        v = post_tx.optimize_compact(
            spark, n_files=_LEX_FILES, cluster_col="token"
        )
    try:
        meta = read_lex_meta(path)
        meta["n"] = meta.get("n", 0) + int(fila["n"])
        meta["dl_total"] = meta.get("dl_total", 0) + int(fila["t"] or 0)
        meta["avgdl_mili"] = (
            (meta["dl_total"] * 1000) // meta["n"] if meta["n"] else 1
        ) or 1
        meta["version"] = v
        # postings→lengths version map: the append AND the compacted
        # postings version both read lengths at dl_v (compaction touches
        # only the postings table). Prune entries whose postings
        # manifest is gone so the map stays bounded by version history.
        mapa = meta.get("dl_por_version") or {}
        mapa[str(v_append)] = dl_v
        mapa[str(v)] = dl_v
        vivos = {str(x) for x in post_tx._versions()}
        meta["dl_por_version"] = {
            k: x for k, x in mapa.items() if k in vivos
        }
        _write_meta(path, meta)
    except FileNotFoundError:
        pass  # pre-meta index — serve heals via lex_meta_current
    maybe_auto_vacuum_lex(path)
    return v


def search_bm25_lex_index(
    spark: SparkSession,
    terms: list[str],
    path: str,
    topk: int = 10,
    version: int | None = None,
) -> DataFrame:
    """BM25 top-k SERVED FROM THE STORED POSTINGS: reads only the files
    whose token stats admit a query term (``read_in`` — on the
    token-range-clustered table that is ~|terms|/|ranges| of the
    files), derives per-term df from those postings, scores candidates
    with the engine's integer BM25 (same k1/b/log2-idf ladder as
    busqueda_bm25 — the served ranking equals the brute query row for
    row, test-pinned), and ranks via TakeOrderedAndProject. ``version``
    pins the postings snapshot (time-travel serving)."""
    from etl_python_airflow_bigquery_spark.queries.text import (
        _BM25_B,
        _BM25_K1,
        _floor_log2_sql,
    )

    post_tx, dl_tx = _tables(path)
    if version is None:
        meta = lex_meta_current(spark, path)
        n, avgdl_mili = meta["n"], meta["avgdl_mili"]
        longitudes = dl_tx.read(spark)
    else:
        # a pinned serve pins the WHOLE snapshot: postings, lengths,
        # and the corpus constants (n/avgdl recomputed from the pinned
        # longitudes — idf and length normalization must not leak
        # post-pin growth into a time-travel read). The lengths version
        # is RESOLVED from the postings→lengths map, never reused
        # verbatim: postings-only compaction advances one counter and
        # not the other.
        longitudes = dl_tx.read(
            spark, version=_resolve_dl_version(path, version, dl_tx)
        )
        fila = longitudes.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).first()
        n = int(fila["n"])
        avgdl_mili = ((int(fila["t"] or 0) * 1000) // n if n else 1) or 1
    postings = post_tx.read_in(spark, "token", terms, version=version)
    # df via a token-partitioned window over the same pruned posting
    # rows the scoring consumes (one read of the pruned files instead
    # of two — posting lists are unique per (token, doc), so the window
    # count equals the old groupBy df exactly); idf computes inline
    from pyspark.sql import Window as _W

    con_df = postings.withColumn(
        "df", F.count(F.lit(1)).over(_W.partitionBy("token"))
    ).withColumn(
        "idf_q",
        F.expr(
            _floor_log2_sql(
                f"greatest(1L, ({n}L * 1000) div (df * 1000 + 500))"
            )
        ).cast("bigint"),
    )
    tf_comp = (
        f"(tf * {_BM25_K1 + 1000}L * 1000) div (tf * 1000 + "
        f"({_BM25_K1} * (1000 - {_BM25_B} + "
        f"(({_BM25_B} * dl * 1000) div {avgdl_mili}L))) div 1000)"
    )
    # dl rides the posting row (denormalized at build) — no corpus-sized
    # lengths join per serve; pre-denormalization snapshots fall back
    if "dl" not in con_df.columns:
        con_df = con_df.join(longitudes, "doc_id")
    scored = (
        con_df
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(f"({tf_comp}) * idf_q")).cast("bigint")
            .alias("score_mili")
        )
    )
    return ranked_topk(
        scored, topk, [F.desc("score_mili"), F.col("doc_id")], "pos"
    ).withColumn("pos", F.col("pos").cast("bigint"))


# Driver-state guard for the collected (query_id, token) anchor pairs:
# past this row count the serve falls back to the distributed frame
# (the collect is an optimization, never a scalability cliff).
_CONSULTA_COLLECT_CAP = 200_000


def hibrida_lexical_top_multi_indexada(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    qids: list[int],
    topk: int = 10,
    ctx: dict | None = None,
) -> DataFrame:
    """The hybrid's multi-query lexical ranker SERVED FROM THE STORED
    POSTINGS — per arriving anchor, BM25 over its distinct terms with
    the per-batch scan bounded by (a) the anchors' own rows in the
    documents table (doc_id IN pushdown — row-group pruned) for term
    lookup and (b) the UNION of their terms' posting files (read_in
    stats pruning). No per-batch tf/dl rebuild: the corpus-scale work
    happened once, at index build. Output (query_id, doc_id, pos_lex),
    the ranking window partitioned by query_id (WindowGroupLimit).
    Algebra identical to queries.similarity.hibrida_lexical_top_multi
    (exact index ⇒ row-identical output, test-pinned)."""
    from pyspark.sql import Window

    from etl_python_airflow_bigquery_spark.queries.text import (
        _BM25_B,
        _BM25_K1,
        _floor_log2_sql,
    )
    from etl_python_airflow_bigquery_spark.tables import load_table

    post_tx, dl_tx = _tables(path)
    if ctx is not None and "lex_n" in ctx:
        n, avgdl_mili = ctx["lex_n"], ctx["lex_avgdl_mili"]
        longitudes = ctx["longitudes"]
    else:
        meta = lex_meta_current(spark, path)
        n, avgdl_mili = meta["n"], meta["avgdl_mili"]
        longitudes = dl_tx.read(spark)

    docs = load_table(spark, sf_dir, "documents")
    consulta = (
        docs.where(in_literals("doc_id", [int(q) for q in qids]))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    # ONE anchor-pruned documents job yields BOTH the term set (for the
    # posting-file pruning below) and the (query_id, token) pairs — as
    # a local relation the fused plan carries no documents-scan subtree
    # and no second collect (the prior shape scanned documents once for
    # the term collect and AGAIN inside the scored plan). Driver state
    # is |anchors|×terms-per-doc pairs, capped: a pathologically large
    # batch falls back to the distributed frame unchanged.
    pares = consulta.limit(_CONSULTA_COLLECT_CAP + 1).collect()
    if len(pares) <= _CONSULTA_COLLECT_CAP:
        terms = sorted({r["token"] for r in pares})
        consulta = local_df(
            spark,
            [(int(r["query_id"]), r["token"]) for r in pares],
            "query_id BIGINT, token STRING",
        )
    else:
        terms = [
            r["token"] for r in consulta.select("token").distinct().collect()
        ]
    postings = post_tx.read_in(spark, "token", terms)
    # df via a token-partitioned window over the SAME pruned posting
    # rows the scoring consumes (guide §2.4: the old groupBy-df subtree
    # re-read every pruned posting file a second time; posting lists are
    # unique per (token, doc), and the window sits BEFORE the consulta
    # join, so the count is exactly the old per-token df even when
    # several queries share a term). idf then computes inline per row —
    # same integer formula, same per-row product, one posting scan.
    # SKEW NOTE (ADVICE r14): the window lands every posting row of a
    # token in one task (no partial aggregation) — a very common query
    # term over a large corpus becomes a single-partition hotspot. If
    # profiling ever shows it, pre-aggregate df per (token, doc-bucket)
    # and sum, or salt; at current scales the pruned per-term lists are
    # far below task size.
    w_df = Window.partitionBy("token")
    con_df = postings.withColumn(
        "df", F.count(F.lit(1)).over(w_df)
    ).withColumn(
        "idf_q",
        F.expr(
            _floor_log2_sql(
                f"greatest(1L, ({n}L * 1000) div (df * 1000 + 500))"
            )
        ).cast("bigint"),
    )
    tf_comp = (
        f"(tf * {_BM25_K1 + 1000}L * 1000) div (tf * 1000 + "
        f"({_BM25_K1} * (1000 - {_BM25_B} + "
        f"(({_BM25_B} * dl * 1000) div {avgdl_mili}L))) div 1000)"
    )
    # dl rides the posting row (denormalized at build) — no corpus-sized
    # lengths join per serve; pre-denormalization snapshots fall back
    puntuable = con_df.join(F.broadcast(consulta), "token").where(
        F.col("doc_id") != F.col("query_id")
    )
    if "dl" not in con_df.columns:
        puntuable = puntuable.join(longitudes, "doc_id")
    scored = (
        puntuable
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr(f"({tf_comp}) * idf_q")).alias("score"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("pos_lex", F.row_number().over(w_lex))
        .where(F.col("pos_lex") <= topk)
        .select("query_id", "doc_id", "pos_lex")
    )


def pin_lex_version(path: str, name: str, version: int | None = None) -> int:
    """PIN a postings/lengths snapshot against vacuum — the lexical twin
    of ``ann_index.pin_index_version``: tags are GC roots at the table
    layer, so a pinned version's manifest and data files survive ANY
    vacuum horizon until ``unpin_lex_version``. This is the survival
    contract for time-travel serving (``search_bm25_lex_index(version=)``
    pins idf/avgdl/postings to one snapshot). Pins the POSTINGS version
    given (default: current) and the lengths version the pinned serve
    will actually read — resolved through the metadata's
    postings→lengths version map, because a postings-only compaction
    desyncs the two tables' counters — under the same name; returns the
    pinned postings version."""
    post_tx, dl_tx = _tables(path)
    v = post_tx.version() if version is None else version
    post_tx.create_tag(name, v)
    dl_tx.create_tag(name, _resolve_dl_version(path, v, dl_tx))
    return v


def unpin_lex_version(path: str, name: str) -> None:
    """Release a ``pin_lex_version`` pin; the next vacuum may reclaim
    the snapshot once it falls outside the keep horizon."""
    post_tx, dl_tx = _tables(path)
    post_tx.delete_tag(name)
    dl_tx.delete_tag(name)


def vacuum_lex_index(
    path: str, keep_versions: int = 8, retention_s: float = 3600.0
) -> dict:
    """Reclaim posting/length files no surviving version references —
    same lifecycle stage and same generous default horizon as
    ``ann_index.vacuum_index`` (version-pinned serving is first-class;
    tag a snapshot via ``pin_lex_version`` to exempt it from any
    horizon). Returns {'postings': n_removed, 'longitudes': n_removed}.
    """
    post_tx, dl_tx = _tables(path)
    return {
        "postings": post_tx.vacuum(keep_versions, retention_s),
        "longitudes": dl_tx.vacuum(keep_versions, retention_s),
    }


def maybe_auto_vacuum_lex(path: str) -> dict | None:
    """Run ``vacuum_lex_index`` iff the postings table's manifest count
    exceeds the SHARED keep+slack gate (one policy governs both index
    families — the knobs live on ``operators.ann_index``). Called from
    ``add_to_lex_index``, so every batch or streaming ingest that grows
    the lexical index also bounds its on-disk footprint."""
    from etl_python_airflow_bigquery_spark.operators import ann_index as _ai

    post_tx, _ = _tables(path)
    if len(post_tx._versions()) < _ai._AUTO_VACUUM_KEEP + _ai._AUTO_VACUUM_SLACK:
        return None
    return vacuum_lex_index(
        path,
        keep_versions=_ai._AUTO_VACUUM_KEEP,
        retention_s=_ai._AUTO_VACUUM_RETENTION_S,
    )
