"""Corpus-curation audits beyond dedup: benchmark decontamination,
repetition-based quality (the Gopher duplicate-n-gram rules), and a
shingle-novelty audit — the three checks a training-data pipeline runs
AFTER cleaning/dedup to decide what actually enters the mix.

All three reuse the word-shingle machinery from dedup.py (md5-prefix
int64 hashes — 8-byte shuffle keys, identical in Spark and DuckDB) and
follow the same cross-engine determinism rules: integer counts, ratios
floor-scaled before comparison.

Scale shapes (the 100 TB arguments, one per query):
* decontamination — the benchmark side is SMALL by definition (an eval
  set, not the corpus), so its distinct shingle set broadcasts and the
  probe is a map-side semi-join style hash lookup; no all-pairs, no
  shuffle of the training corpus beyond its own per-doc roll-up.
* repetition — one explode + a two-level aggregation whose first level
  keys on (doc_id, bigram-hash): partial aggregation (map-side combine)
  collapses each doc's repeats before the exchange, so shuffled rows ≈
  distinct bigrams, not total words.
* novelty — first-owners come from a whole-partition window min over
  the shingle hash (no join, no second pass over the postings): the
  plan is exactly two exchanges of the posting list — one on the
  shingle hash, one for the per-doc roll-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.queries.dedup import _SHINGLES_SQL, _shingles
from etl_python_airflow_bigquery_spark.queries.text import _hex_hash_sql, hex_hash
from etl_python_airflow_bigquery_spark.tables import load_table

# Deterministic benchmark membership: ~2% of docs, by doc_id hash (in
# production this is a join against the eval-set registry; a hash gate
# keeps the query scale-factor-proof like muestra_estratificada).
_BENCH_MOD = 50

# --------------------------------------------------------------------------
# Benchmark decontamination — eval-set shingle overlap per training doc
# --------------------------------------------------------------------------

_CONTAM_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
bench_ids AS (
    SELECT doc_id FROM documents
    WHERE {_hex_hash_sql("CAST(doc_id AS VARCHAR)")} % {_BENCH_MOD} = 0
),
bench_sh AS (
    SELECT DISTINCT s FROM sh JOIN bench_ids USING (doc_id)
),
train AS (
    SELECT * FROM tam WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)
),
hits AS (
    SELECT sh.doc_id, count(*) AS n_contaminados
    FROM sh JOIN bench_sh USING (s)
    WHERE sh.doc_id IN (SELECT doc_id FROM train)
    GROUP BY 1
)
SELECT t.doc_id,
       CAST(t.n AS BIGINT) AS n_shingles,
       CAST(coalesce(h.n_contaminados, 0) AS BIGINT) AS n_contaminados,
       floor(CAST(coalesce(h.n_contaminados, 0) AS DOUBLE) * 1000 / t.n) / 1000
           AS ratio_contaminacion,
       CAST(coalesce(h.n_contaminados, 0) * 2 >= t.n AS BOOLEAN) AS contaminado
FROM train t LEFT JOIN hits h USING (doc_id)
"""


@register("contaminacion_benchmark", oracle=_CONTAM_ORACLE,
          ops=("J8", "TX4", "DD4"), driver=False)
def contaminacion_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    3-gram shingles overlap an eval set (here a deterministic ~2% hash
    slice of docs; in production the benchmark registry). The benchmark
    shingle set is small by construction, so it BROADCASTS — the probe
    over the training corpus is a map-side hash lookup followed by one
    per-doc roll-up; the training text itself never shuffles. A doc is
    `contaminado` when ≥ half its shingles appear in the eval set (the
    n-gram-overlap decontamination rule used by public LLM data
    pipelines). Reference semantics: SURVEY.md §2 training-pipeline
    addenda; shingle scheme shared with dedup.py."""
    sh = _shingles(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    is_bench = hex_hash(F.col("doc_id").cast("string")) % _BENCH_MOD == 0
    bench_ids = docs.where(is_bench).select("doc_id")
    bench_sh = sh.join(F.broadcast(bench_ids), "doc_id").select("s").distinct()
    tam = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    train = tam.join(F.broadcast(bench_ids), "doc_id", "left_anti")
    hits = (
        sh.join(F.broadcast(bench_ids), "doc_id", "left_anti")
        .join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminados"))
    )
    nc = F.coalesce(F.col("n_contaminados"), F.lit(0))
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_shingles"),
        nc.cast("bigint").alias("n_contaminados"),
        (F.floor(nc.cast("double") * 1000 / F.col("n")) / 1000).alias(
            "ratio_contaminacion"
        ),
        (nc * 2 >= F.col("n")).alias("contaminado"),
    )


# --------------------------------------------------------------------------
# Repetition quality — Gopher duplicate-bigram / top-bigram fractions
# --------------------------------------------------------------------------

_REP_ORACLE = f"""
WITH big AS (
    SELECT d.doc_id,
           {_hex_hash_sql("w[g.i] || ' ' || w[g.i+1]")} AS b
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
         LATERAL unnest(generate_series(1, len(d.w) - 1)) AS g(i)
    WHERE len(d.w) >= 2
),
conteo AS (
    SELECT doc_id, b, count(*) AS c FROM big GROUP BY 1, 2
),
stats AS (
    SELECT doc_id,
           sum(c) AS nb,
           count(*) AS db,
           max(c) AS tb
    FROM conteo GROUP BY 1
)
SELECT doc_id,
       CAST(nb AS BIGINT) AS n_bigramas,
       CAST(db AS BIGINT) AS n_distintos,
       floor(CAST(nb - db AS DOUBLE) * 1000 / nb) / 1000 AS ratio_duplicados,
       floor(CAST(tb AS DOUBLE) * 1000 / nb) / 1000 AS ratio_top,
       CAST((CAST(nb - db AS DOUBLE) / nb) <= 0.5
            AND (CAST(tb AS DOUBLE) / nb) <= 0.2 AS BOOLEAN) AS aprobado_rep
FROM stats
"""


@register("calidad_repeticion", oracle=_REP_ORACLE, ops=("TX2", "A2"),
          driver=False)
def calidad_repeticion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality (the Gopher duplicate-n-gram family):
    per document, the fraction of word bigrams that are repeats and the
    fraction owned by the single most frequent bigram; `aprobado_rep`
    applies the keep rule (dup fraction ≤ 0.5 AND top-bigram fraction
    ≤ 0.2). The (doc_id, bigram-hash) pre-aggregation gives one pass:
    sum(c)=total, count(*)=distinct, max(c)=mode — and map-side combine
    collapses repeats before the shuffle, so exchanged rows track
    distinct bigrams, not corpus length."""
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> CAST(conv(substring(md5("
                    "concat_ws(' ', w[i], w[i+1])), 1, 15), 16, 10)"
                    " AS BIGINT))"
                )
            ).alias("b"),
        )
    )
    conteo = big.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    stats = conteo.groupBy("doc_id").agg(
        F.sum("c").alias("nb"),
        F.count(F.lit(1)).alias("db"),
        F.max("c").alias("tb"),
    )
    dup = (F.col("nb") - F.col("db")).cast("double")
    return stats.select(
        "doc_id",
        F.col("nb").cast("bigint").alias("n_bigramas"),
        F.col("db").cast("bigint").alias("n_distintos"),
        (F.floor(dup * 1000 / F.col("nb")) / 1000).alias("ratio_duplicados"),
        (F.floor(F.col("tb").cast("double") * 1000 / F.col("nb")) / 1000).alias(
            "ratio_top"
        ),
        (
            (dup / F.col("nb") <= 0.5)
            & (F.col("tb").cast("double") / F.col("nb") <= 0.2)
        ).alias("aprobado_rep"),
    )


# --------------------------------------------------------------------------
# Shingle novelty — fraction of never-before-seen n-grams per document
# --------------------------------------------------------------------------

_NOVEDAD_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
dueno AS (
    SELECT s, min(doc_id) AS primer_doc FROM sh GROUP BY 1
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.primer_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nuevos,
       floor(CAST(sum(CASE WHEN d.primer_doc = sh.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) * 1000 / count(*)) / 1000 AS ratio_novedad
FROM sh JOIN dueno d USING (s)
GROUP BY 1
"""


@register("novedad_shingles", oracle=_NOVEDAD_ORACLE, ops=("TX4", "A2", "A8"),
          driver=False)
def novedad_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-novelty audit: per document (in doc_id = ingestion order),
    how many of its distinct word 3-grams have never appeared in any
    earlier document — the corpus-growth curve that tells a curation
    pipeline when a source stops contributing new content. Each
    shingle's first owner is a whole-partition window ``min`` over the
    shingle hash — no self-join, no second pass over the postings: the
    plan is one exchange on the hash plus the per-doc roll-up, and the
    window's sort is the same work a sort-merge re-join would have paid
    for only its build side."""
    sh = _shingles(spark, sf_dir)
    primer = F.min("doc_id").over(Window.partitionBy("s"))
    es_nuevo = F.when(F.col("primer_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.withColumn("primer_doc", primer)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(es_nuevo).cast("bigint").alias("n_nuevos"),
            (
                F.floor(F.sum(es_nuevo).cast("double") * 1000 / F.count(F.lit(1)))
                / 1000
            ).alias("ratio_novedad"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing — greedy token-budget binning (sample packing)
# --------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per packed sequence
_PACK_SHARDS = 8

_PACK_ORACLE = f"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           doc_id % {_PACK_SHARDS} AS shard,
           len(string_split(text, ' ')) AS tokens,
           row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                              ORDER BY doc_id) AS rn
    FROM documents
),
pack(shard, rn, doc_id, tokens, secuencia, filled) AS (
    SELECT shard, rn, doc_id, tokens, 0, tokens FROM toks WHERE rn = 1
    UNION ALL
    SELECT t.shard, t.rn, t.doc_id, t.tokens,
           CASE WHEN p.filled + t.tokens <= {_PACK_BUDGET}
                THEN p.secuencia ELSE p.secuencia + 1 END,
           CASE WHEN p.filled + t.tokens <= {_PACK_BUDGET}
                THEN p.filled + t.tokens ELSE t.tokens END
    FROM toks t JOIN pack p ON t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(secuencia AS BIGINT) AS secuencia,
       CAST(tokens AS BIGINT) AS tokens
FROM pack
"""


def _pack_fn(key, pdf):
    """Greedy first-fit-in-order packing of one shard: docs in doc_id
    order accumulate into the current sequence until the budget would
    overflow, then a new sequence starts (an oversized doc sits alone in
    its own sequence). Intrinsically sequential per shard — the
    archetypal applyInPandas case."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    seqs, filled, seq = [], 0, 0
    first = True
    for t in pdf["tokens"]:
        if not first and filled + t > _PACK_BUDGET:
            seq += 1
            filled = t
        else:
            filled += t
            first = False
        seqs.append(seq)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "shard": pdf["shard"].to_numpy(),
            "secuencia": seqs,
            "tokens": pdf["tokens"].to_numpy(),
        }
    )


@register("empaquetado_secuencias", oracle=_PACK_ORACLE, ops=("TX1", "U2"),
          driver=False)
def empaquetado_secuencias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE PACKING for LLM training: documents (in ingestion order)
    greedily pack into fixed token-budget sequences per shard — the step
    that turns a curated corpus into dense training batches. The
    within-shard scan is intrinsically sequential (each doc's sequence
    id depends on the running fill), so this is strategy (b) of the
    custom-operator ladder: ``groupBy(shard).applyInPandas`` with one
    Arrow batch per shard. At 100 TB the shard count scales with the
    corpus (shards are independent; 10k shards → 10k parallel packers,
    state per task = one integer), and only (doc_id, tokens) ints flow
    into the shuffle — never the text. Oracle: DuckDB recursive CTE
    unrolls the same greedy recurrence exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("tokens"),
    )
    return toks.groupBy("shard").applyInPandas(
        _pack_fn, schema="doc_id long, shard long, secuencia long, tokens long"
    )


# --------------------------------------------------------------------------
# Train/valid/test split leakage — cross-split near-dup audit
# --------------------------------------------------------------------------
# contaminacion_benchmark checks the corpus against an EXTERNAL eval
# set; this audits the split the pipeline itself creates: after a
# deterministic hash split (90/5/5 by doc_id — the standard
# reproducible assignment, no RNG state to version), any near-dup pair
# STRADDLING a split boundary is memorized-eval-leakage waiting to
# happen. Pairs come from the prefix-filtered exact-Jaccard engine
# (dedup_ngram_jaccard, J ≥ 0.5) — the audit inherits its scale shape:
# PPJoin candidates + map-side verification, then two doc_id equi
# joins to tag the endpoints and a constant-size roll-up per split
# combination.

_SPLIT_SQL = (
    "CASE WHEN {h} < 90 THEN 'train' "
    "WHEN {h} < 95 THEN 'valid' ELSE 'test' END"
).format(h=_hex_hash_sql("CAST(doc_id AS VARCHAR)", 100))

_FUGA_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pares AS (
    SELECT i.doc_a, i.doc_b,
           floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c)) / 1000
               AS jaccard
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
splits AS (
    SELECT doc_id, {_SPLIT_SQL} AS split FROM documents
),
clasif AS (
    SELECT least(sa.split, sb.split) AS particion_a,
           greatest(sa.split, sb.split) AS particion_b,
           p.jaccard
    FROM pares p
    JOIN splits sa ON sa.doc_id = p.doc_a
    JOIN splits sb ON sb.doc_id = p.doc_b
)
SELECT particion_a, particion_b,
       CAST(count(*) AS BIGINT) AS pares,
       max(jaccard) AS jaccard_max,
       CAST(particion_a != particion_b AS BOOLEAN) AS es_fuga
FROM clasif
GROUP BY 1, 2
"""


@register("fuga_particiones", oracle=_FUGA_ORACLE, ops=("DD4", "A8"),
          bench=True, driver=False)
def fuga_particiones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-LEAKAGE AUDIT: deterministic 90/5/5 hash split of the
    corpus, then every exact near-dup pair (J ≥ 0.5, the
    `dedup_ngram_jaccard` engine) is classified by the splits of its
    endpoints — a pair whose endpoints land in different partitions
    (`es_fuga`) means eval rows have a near-copy in training data. The
    roll-up per unordered split combination also reports the worst
    Jaccard, the triage order an operator fixes leaks in. Cost over the
    pair engine: one map-side split tag (md5 of the doc id), two equi
    joins on doc_id, a ≤6-row aggregate — nothing that changes the
    PPJoin scale shape."""
    from etl_python_airflow_bigquery_spark.queries.dedup import dedup_ngram_jaccard

    pares = dedup_ngram_jaccard(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    bucket = hex_hash(F.col("doc_id").cast("string"), 100)
    splits = docs.select(
        "doc_id",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test")
        .alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b"))
    clasif = (
        pares.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sp_a", "sp_b").alias("particion_a"),
            F.greatest("sp_a", "sp_b").alias("particion_b"),
            "jaccard",
        )
    )
    return clasif.groupBy("particion_a", "particion_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("pares"),
        F.max("jaccard").alias("jaccard_max"),
        (F.col("particion_a") != F.col("particion_b")).alias("es_fuga"),
    )


# --------------------------------------------------------------------------
# Source-diversity audit — inverse Simpson (effective source count)
# --------------------------------------------------------------------------

_DIVERSIDAD_ORACLE = """
WITH por_fuente AS (
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS fuentes,
       CAST(sum(docs) AS BIGINT) AS docs,
       CAST((1000 * sum(tokens) * sum(tokens))
            // sum(tokens * tokens) AS BIGINT) AS fuentes_efectivas_mili,
       CAST((1000 * max(tokens)) // sum(tokens) AS BIGINT)
           AS fuente_max_mili
FROM por_fuente
GROUP BY 1
"""


@register("diversidad_fuentes", oracle=_DIVERSIDAD_ORACLE, ops=("A3", "A1"),
          driver=False)
def diversidad_fuentes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-MIX DIVERSITY AUDIT per language: the effective number
    of sources by TOKEN MASS — inverse Simpson, (Σt)²/Σt², in floor-
    milli (2000 ⇒ the mix behaves like 2 equal sources however many
    nominally contribute) — plus the dominant source's share. The two
    numbers a data-mixing review reads first: mezcla_entrenamiento
    plans the target mix, this measures the mix a corpus actually has,
    and a collapse in fuentes_efectivas flags domination before
    training does. Integer-exact: Simpson needs only sums of squares,
    no logs (the entropy variant would need the log ladder; Simpson is
    the exact-arithmetic diversity index).

    Shape: one (lang, source) aggregation with map-side partial sums,
    then a languages-sized roll-up. Σt up to ~1e12 tokens squares to
    1e24 — the sums ride DECIMAL(38,0) on both engines at scale; at
    testdata scale int64 suffices and DuckDB widens automatically."""
    docs = load_table(spark, sf_dir, "documents")
    por_fuente = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens"),
    )
    d38 = "decimal(38,0)"
    return por_fuente.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("fuentes"),
        F.sum("docs").cast("bigint").alias("docs"),
        F.expr(
            f"CAST((1000 * CAST(sum(tokens) AS {d38}) * sum(tokens))"
            f" div sum(CAST(tokens AS {d38}) * tokens) AS BIGINT)"
        ).alias("fuentes_efectivas_mili"),
        F.expr(
            "CAST((1000 * max(tokens)) div sum(tokens) AS BIGINT)"
        ).alias("fuente_max_mili"),
    )


# --------------------------------------------------------------------------
# Boilerplate audit — high-document-frequency shingle share per source
# --------------------------------------------------------------------------

_PLANTILLAS_DF_MIN = 5  # a shingle in ≥ 5 docs is template material

_PLANTILLAS_ORACLE = f"""
WITH sh AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substring(md5(w[g.i] || ' ' || w[g.i+1] || ' ' ||
                                        w[g.i+2]), 1, 15)) AS BIGINT) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
         LATERAL unnest(generate_series(1, len(d.w) - 2)) AS g(i)
    WHERE len(d.w) >= 3
),
df AS (SELECT s, count(*) AS nd FROM sh GROUP BY 1),
por_doc AS (
    SELECT sh.doc_id,
           count(*) AS shingles,
           sum(CASE WHEN df.nd >= {_PLANTILLAS_DF_MIN} THEN 1 ELSE 0 END)
               AS plantilla
    FROM sh JOIN df USING (s)
    GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(p.plantilla) AS BIGINT) AS shingles_plantilla,
       CAST(sum(p.shingles) AS BIGINT) AS shingles,
       CAST((1000 * sum(p.plantilla)) // sum(p.shingles) AS BIGINT)
           AS proporcion_mili,
       CAST(sum(CASE WHEN 2 * p.plantilla > p.shingles THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_mayoria_plantilla
FROM documents d JOIN por_doc p USING (doc_id)
GROUP BY 1
"""


@register("proporcion_plantillas", oracle=_PLANTILLAS_ORACLE,
          ops=("TX4", "A3"), driver=False)
def proporcion_plantillas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE / TEMPLATE AUDIT per source — the C4/RefinedWeb
    curation step that strips navigation chrome and legal footers:
    a shingle appearing in ≥ 5 documents is template material, and each
    source reports its template-shingle share (floor-milli) plus the
    count of documents that are MAJORITY boilerplate (the removal
    candidates). Rides the SAME posting/df frames as the dedup family
    (`_shingles` + its session cache): the df aggregation is the
    posting-list groupBy, the per-doc share is one join back — at
    100 TB this audit is a by-product of indexes the dedup pipeline
    already maintains, not a new scan."""
    from etl_python_airflow_bigquery_spark.queries.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(spark, sf_dir)
    df_s = sh.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    por_doc = (
        sh.join(df_s, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("shingles"),
            F.sum(
                F.when(F.col("nd") >= _PLANTILLAS_DF_MIN, 1).otherwise(0)
            ).alias("plantilla"),
        )
    )
    return (
        docs.join(por_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("plantilla").cast("bigint").alias("shingles_plantilla"),
            F.sum("shingles").cast("bigint").alias("shingles"),
            F.expr(
                "CAST((1000 * sum(plantilla)) div sum(shingles) AS BIGINT)"
            ).alias("proporcion_mili"),
            F.sum(
                F.when(2 * F.col("plantilla") > F.col("shingles"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_mayoria_plantilla"),
        )
    )


# --------------------------------------------------------------------------
# The full curation FUNNEL — every gate composed, per-stage accounting
# --------------------------------------------------------------------------

_EMBUDO_ORACLE_TMPL = """
WITH tokw AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
por_doc AS (
    SELECT doc_id,
           CAST(count(*) FILTER (w != '') AS BIGINT) AS palabras,
           CAST(coalesce(sum(len(w)) FILTER (w != ''), 0) AS BIGINT) AS chars,
           CAST(count(*) FILTER (regexp_matches(w, '[#@%$]')) AS BIGINT)
               AS simbolos,
           CAST(count(*) FILTER (regexp_matches(w, '[A-Za-z]')) AS BIGINT)
               AS alfa,
           CAST(count(DISTINCT w) FILTER (list_contains({stops}, w))
                AS BIGINT) AS stops
    FROM tokw GROUP BY 1
),
aprobados AS (
    SELECT doc_id, palabras FROM por_doc
    WHERE palabras BETWEEN {minw} AND {maxw}
      AND {mwl_lo} * palabras <= chars AND chars <= {mwl_hi} * palabras
      AND 10 * simbolos < palabras
      AND 5 * alfa >= 4 * palabras
      AND stops >= 2
),
ventanas AS (
    SELECT doc_id, CAST(g.i AS BIGINT) AS i,
           {win_hash} AS h
    FROM documents,
         LATERAL unnest(generate_series(0, (length(text) - {W}) // {S})) AS g(i)
    WHERE length(text) >= {W}
),
rep AS (SELECT h FROM ventanas GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
cortes AS (
    SELECT DISTINCT v.doc_id, v.i + o.o AS tile
    FROM ventanas v JOIN rep USING (h), LATERAL unnest([0, 1]) AS o(o)
),
trozos AS (
    SELECT d.doc_id, CAST(g.t AS BIGINT) AS tile,
           substring(d.text, CAST(g.t * {S} + 1 AS INT), {S}) AS trozo
    FROM documents d,
         LATERAL unnest(generate_series(0, (length(d.text) - 1) // {S})) AS g(t)
    WHERE coalesce(length(d.text), 0) >= 1
),
limpio AS (
    SELECT t.doc_id,
           coalesce(string_agg(t.trozo, '' ORDER BY t.tile)
                    FILTER (c.tile IS NULL), '') AS texto
    FROM trozos t LEFT JOIN cortes c
      ON t.doc_id = c.doc_id AND t.tile = c.tile
    GROUP BY t.doc_id
),
texto_doc AS (
    SELECT d.doc_id, coalesce(l.texto, '') AS texto
    FROM documents d LEFT JOIN limpio l USING (doc_id)
),
tok_limpio AS (
    SELECT doc_id,
           CAST(coalesce(len(list_filter(string_split(texto, ' '),
                                         w -> w != '')), 0) AS BIGINT) AS toks,
           md5(texto) AS huella
    FROM texto_doc
),
familias AS (
    SELECT t.huella, CAST(max(t.toks) AS BIGINT) AS toks
    FROM tok_limpio t JOIN aprobados a USING (doc_id)
    GROUP BY t.huella
)
SELECT * FROM (
SELECT CAST(1 AS BIGINT) AS orden, 'bruto' AS etapa,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS docs,
       (SELECT CAST(coalesce(sum(palabras), 0) AS BIGINT) FROM por_doc) AS tokens
UNION ALL
SELECT 2, 'gopher',
       (SELECT CAST(count(*) AS BIGINT) FROM aprobados),
       (SELECT CAST(coalesce(sum(palabras), 0) AS BIGINT) FROM aprobados)
UNION ALL
SELECT 3, 'sin_spans',
       (SELECT CAST(count(*) AS BIGINT) FROM aprobados),
       (SELECT CAST(coalesce(sum(t.toks), 0) AS BIGINT)
        FROM tok_limpio t JOIN aprobados a USING (doc_id))
UNION ALL
SELECT 4, 'dedup',
       (SELECT CAST(count(*) AS BIGINT) FROM familias),
       (SELECT CAST(coalesce(sum(toks), 0) AS BIGINT) FROM familias)
)
"""


def _embudo_oracle() -> str:
    from etl_python_airflow_bigquery_spark.queries.text import (
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_WORDS,
        _GOPHER_MWL_HI,
        _GOPHER_MWL_LO,
        _STOP_LIST_SQL,
        _SUBC_S,
        _SUBC_W,
    )

    return _EMBUDO_ORACLE_TMPL.format(
        stops=_STOP_LIST_SQL,
        minw=_GOPHER_MIN_WORDS,
        maxw=_GOPHER_MAX_WORDS,
        mwl_lo=_GOPHER_MWL_LO,
        mwl_hi=_GOPHER_MWL_HI,
        W=_SUBC_W,
        S=_SUBC_S,
        win_hash=_hex_hash_sql(
            "substring(text, CAST(g.i * 20 + 1 AS INT), 40)"
        ),
    )


@register("embudo_curacion", oracle=_embudo_oracle(),
          ops=("TX2", "DD1", "A8"), bench=True, driver=False)
def embudo_curacion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation funnel in one query — every gate the engine
    ships, composed in production order, with per-stage doc/token
    accounting: raw corpus → Gopher quality gate (gopher_flags, the
    batch/stream-shared projection) → span-level cleaning (duplicated
    windows excised via the corpus_sin_subcadenas tile cut; the window
    index is corpus-wide, applied to the survivors) → exact content
    dedup of the CLEANED text (md5 families, one representative each).
    The output is the (stage, docs, tokens) table a training-data lead
    reads to see where the corpus went — each stage's marginal cost in
    tokens is the difference from the previous row.

    Scale shape: strictly the union of the component ops' shapes (each
    already probed ≤1.6 at 10×); the funnel adds only joins on doc_id
    between stages and four scalar aggregates. At 100 TB every stage
    keeps its own bounded plan — nothing new shuffles."""
    from etl_python_airflow_bigquery_spark.queries.text import (
        _rebuild_sin_cortes,
        gopher_flags,
        subcadena_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    palabras = docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w != ''))")
        .cast("long")
        .alias("palabras"),
    )
    # aprobados feeds THREE stage aggregates (e2, e3's join, e4 via
    # familias), the window-hash frame feeds both the repeated-tile set
    # and the cut join, and tok_limpio feeds e3 AND e4 — without
    # checkpoints each consumer re-executes the gopher/tile/rebuild
    # lineage (same pathology as _rankings_retrieval; measured A/B at
    # sf0.1: 2.5 -> 0.7 s for the four-row funnel; guide §2.4)
    aprobados = (
        gopher_flags(docs).where(F.col("aprobado")).select("doc_id")
        .join(palabras, "doc_id")
        .localCheckpoint(eager=False)
    )
    hs = subcadena_hashes(docs).localCheckpoint(eager=False)
    rep = (
        hs.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("d"))
        .where(F.col("d") >= 2)
        .select("h")
    )
    cortes = (
        hs.join(rep, "h")
        .select(
            "doc_id",
            F.explode(F.array(F.col("i"), F.col("i") + F.lit(1))).alias("tile"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tile").alias("cortes"))
    )
    tok_limpio = (
        docs.join(cortes, "doc_id", "left")
        .select("doc_id", _rebuild_sin_cortes().alias("texto"))
        .select(
            "doc_id",
            F.expr("size(filter(split(texto, ' '), w -> w != ''))")
            .cast("long")
            .alias("toks"),
            F.md5("texto").alias("huella"),
        )
        .localCheckpoint(eager=False)
    )
    familias = (
        tok_limpio.join(aprobados.select("doc_id"), "doc_id")
        .groupBy("huella")
        .agg(F.max("toks").alias("toks"))
    )

    def fila(orden: int, etapa: str, frame: DataFrame, col: str) -> DataFrame:
        return frame.agg(
            F.lit(orden).cast("bigint").alias("orden"),
            F.lit(etapa).alias("etapa"),
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.coalesce(F.sum(col), F.lit(0)).cast("bigint").alias("tokens"),
        )

    e1 = fila(1, "bruto", palabras, "palabras")
    e2 = fila(2, "gopher", aprobados, "palabras")
    e3 = fila(
        3, "sin_spans",
        tok_limpio.join(aprobados.select("doc_id"), "doc_id"), "toks",
    )
    e4 = fila(4, "dedup", familias, "toks")
    return e1.unionAll(e2).unionAll(e3).unionAll(e4)
