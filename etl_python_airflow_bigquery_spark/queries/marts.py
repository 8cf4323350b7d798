"""Bucketed-mart-backed queries (ROADMAP #5, VERDICT missing #6): the
amortized-shuffle pattern end to end.

The reference estate re-clusters the playback fact by user on every
query — each superposition / per-user notebook pays the same BigQuery
shuffle again (e.g. Complex_user_superposition_by_hour_etl.ipynb cell 2
re-groups consumo_detalle by user). Spark's ``bucketBy`` persists that
clustering in the table layout instead: the fact is written ONCE as a
``bucketBy(user_id)`` managed table per dataset (catalog.mart_name), and
every per-user aggregation or user-key join over it plans with ZERO
Exchange on user_id — the bucket files ARE the shuffle output, computed
at ingest. At 100 TB / 1000 executors this is the single biggest
repeated-shuffle saver: N per-user queries cost one shuffle, not N.

Two registered queries share the one mart: the first call in a session
builds it (one shuffle-equivalent write), every later call — including
the second query — reads it pre-clustered. ``tests/test_plans.py::
test_mart_queries_plan_no_user_exchange`` pins that neither query's plan
contains a hashpartitioning(user_id) Exchange.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.catalog import (
    DEFAULT_BUCKETS,
    ensure_bucketed_mart,
    mart_name,
    refresh_bucketed_mart,
)
from etl_python_airflow_bigquery_spark.functions import dsum, event_day_num
from etl_python_airflow_bigquery_spark.operators.intervals import (
    explode_to_hour_grid,
    sessions_from_events,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.queries.analytic import _SUPER_ORACLE
from etl_python_airflow_bigquery_spark.catalog import (
    record_mart_signature,
    source_signature,
)
from etl_python_airflow_bigquery_spark.tables import load_table

_log = logging.getLogger(__name__)

# Environment-degradation errors that legitimately demote a mart build to
# the unbucketed slow path: catalog/path analysis failures and
# filesystem-level write refusals. Anything else (OOM, codegen bugs,
# serialization errors) is a REAL build failure and must propagate —
# a broad `except Exception` here once swallowed those silently.
_IO_MARKERS = (
    "java.io.IOException",
    "java.nio.file.AccessDeniedException",
    "java.nio.file.FileSystemException",
    "Read-only file system",
    "Permission denied",
    "UnsupportedFileSystemException",
)


def _is_degradation(exc: Exception) -> bool:
    from pyspark.errors import AnalysisException

    if isinstance(exc, AnalysisException):
        return True
    msg = str(exc)
    return any(marker in msg for marker in _IO_MARKERS)


def _fallback(name: str, exc: Exception, frame: DataFrame) -> DataFrame:
    """Log-and-degrade for environment errors; re-raise genuine bugs."""
    if not _is_degradation(exc):
        raise exc
    _log.warning(
        "mart %s not built (%s: %s) — serving the unbucketed frame; "
        "correctness unaffected, layout amortization lost",
        name,
        type(exc).__name__,
        str(exc).splitlines()[0][:200],
    )
    return frame


_US_PER_DAY = 86_400_000_000


def _eventos_facts(events: DataFrame) -> DataFrame:
    """The user-day fact projection, factored so the full build and the
    window refresh can never drift."""
    return events.select(
        "user_id",
        event_day_num(events).cast("bigint").alias("day_num"),
        "event_type",
        "value",
    )


def _vigencia_mart(
    spark: SparkSession, name: str, sf_dir: str, table: str = "events"
) -> str:
    """Staleness gate every mart getter runs first: fingerprint the
    mart's OWN source table's content (``table`` — generalized in r13,
    ROADMAP r13 #4: a mart derived from documents must gate on
    documents, not on the events fingerprint) and DROP the mart if it
    was built from different content (the warehouse outlives datasets —
    regenerated testdata at the same path must never serve a stale
    layout). Returns the signature for the builder to record on
    success."""
    from etl_python_airflow_bigquery_spark.catalog import (
        mart_is_stale,
        source_signature,
    )

    sig = source_signature(sf_dir, table)
    if mart_is_stale(spark, name, sig):
        spark.sql(f"DROP TABLE `{name}`")
    return sig


def _sello_refresh_ventana(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    table: str,
    covers_source_changes: bool,
) -> None:
    """Signature stamping for a WINDOWED partial refresh (ADVICE r12,
    medium): a refresh of some day partitions only covers the source
    changes inside its window. Stamping the full current source
    signature after it would mark the whole mart fresh even when the
    source changed OUTSIDE the window (the regenerated-dataset scenario
    the staleness gate exists for), and ``_vigencia_mart`` would never
    drop/rebuild the untouched-but-stale partitions. So:

    * stored == current — the source did not change; the refresh was a
      recompute; re-stamp (a no-op) for symmetry.
    * stored != current and the caller ASSERTS coverage
      (``covers_source_changes=True`` — e.g. an orchestrator that
      derived ``day_nums`` from the change feed and therefore knows the
      delta is exactly those days) — stamp the current signature; the
      incremental path stays incremental.
    * stored != current otherwise — do NOT stamp. The stale stored
      signature stands, and the next getter access force-drops and
      full-rebuilds: correctness over amortization by default."""
    from etl_python_airflow_bigquery_spark.catalog import (
        record_mart_signature,
        source_signature,
        stored_mart_signature,
    )

    sig = source_signature(sf_dir, table)
    if covers_source_changes or stored_mart_signature(spark, name) == sig:
        record_mart_signature(spark, name, sig)


def eventos_usuario_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event user-day facts (user_id, day_num, event_type, value)
    persisted PARTITIONED BY day_num and bucketed+sorted by user_id,
    built at most once per dataset per warehouse. Returns the mart as a
    DataFrame whose scan carries the bucket distribution (per-user
    aggregations stay Exchange-free — the subset clustering rule, same
    as the atom mart). Round 11: day partitioning makes the mart
    MAINTAINABLE — ``refresh_eventos_usuario_mart`` rewrites only the
    day partitions whose source window changed; facts are per-event
    (day_num derives from ts directly, nothing spills across days), so
    the refresh needs no lookback margin at all."""
    name = mart_name("eventos_usuario", sf_dir)
    sig = _vigencia_mart(spark, name, sf_dir)
    if not spark.catalog.tableExists(name):
        facts = _eventos_facts(load_table(spark, sf_dir, "events"))
        try:
            refresh_bucketed_mart(
                spark, facts, name, "day_num", "user_id", DEFAULT_BUCKETS,
                sort_col="user_id",
            )
            record_mart_signature(spark, name, sig)
        except Exception as exc:  # noqa: BLE001 — triaged by _fallback
            # warehouse not writable in this harness (e.g. a read-only
            # driver cwd): answer from the unbucketed frame — correctness
            # never depends on the layout, only the Exchange count does.
            # Genuine build failures re-raise (see _fallback).
            return _fallback(name, exc, facts)
    return spark.table(name)


def refresh_eventos_usuario_mart(
    spark: SparkSession, sf_dir: str, day_nums,
    covers_source_changes: bool = False,
) -> DataFrame:
    """Incremental maintenance for the user-facts mart: recompute the
    facts for ``day_nums`` only and dynamic-partition-overwrite exactly
    those day partitions (K3 semantics on the managed bucketed layout).
    Unlike the atom mart there is no session spill — a fact's day is its
    own event's day — so the source window IS the refresh window.
    ``covers_source_changes``: see ``_sello_refresh_ventana`` — pass
    True only when ``day_nums`` provably spans every source change
    since the recorded signature (change-feed-derived windows)."""
    name = mart_name("eventos_usuario", sf_dir)
    dias = [int(d) for d in day_nums]
    events = load_table(spark, sf_dir, "events")
    dnum = event_day_num(events).cast("bigint")
    facts = _eventos_facts(events.where(dnum.isin(dias)))
    refresh_bucketed_mart(
        spark, facts, name, "day_num", "user_id", DEFAULT_BUCKETS,
        sort_col="user_id",
    )
    _sello_refresh_ventana(
        spark, name, sf_dir, "events", covers_source_changes
    )
    return spark.table(name)


_PERFIL_ORACLE = """
WITH f AS (
    SELECT user_id,
           epoch_us(ts) // 86400000000 AS day_num,
           event_type,
           value
    FROM events
),
a AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS eventos,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS minutos
    FROM f GROUP BY 1
),
b AS (
    SELECT user_id, CAST(count(DISTINCT day_num) AS BIGINT) AS dias_activos
    FROM f GROUP BY 1
),
c AS (
    SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS tipos_evento
    FROM f GROUP BY 1
)
SELECT a.user_id, a.eventos, a.minutos, b.dias_activos, c.tipos_evento
FROM a JOIN b USING (user_id) JOIN c USING (user_id)
"""


@register("perfil_usuario_bucketed", oracle=_PERFIL_ORACLE,
          ops=("A1", "A2", "J1"), driver=False)
def perfil_usuario_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consumption profile as THREE aggregations joined on
    user_id, all reading the bucketed mart: volume (event count, decimal
    minute sum) joined with breadth (distinct active days; distinct event
    types). Each distinct lives in its OWN single-distinct aggregate:
    Spark plans a multi-distinct agg as Expand + a compound-key shuffle
    (user_id, distinct cols, gid) that discards the bucket distribution,
    while a single-distinct agg plans as two hash aggregates whose
    ClusteredDistribution the bucket layout already satisfies. Over the
    bucketed mart all three aggregates and both joins are Exchange-free
    on user_id (plan-pinned); unbucketed, the same plan shuffles the
    fact three times."""
    f = eventos_usuario_mart(spark, sf_dir)
    a = f.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("eventos"),
        dsum("value").alias("minutos"),
    )
    b = f.groupBy("user_id").agg(
        F.countDistinct("day_num").cast("bigint").alias("dias_activos")
    )
    c = f.groupBy("user_id").agg(
        F.countDistinct("event_type").cast("bigint").alias("tipos_evento")
    )
    return a.join(b, "user_id").join(c, "user_id").select(
        "user_id", "eventos", "minutos", "dias_activos", "tipos_evento"
    )


_FRECUENCIA_ORACLE = """
WITH d AS (
    SELECT user_id,
           CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
               AS dias_activos
    FROM events GROUP BY 1
)
SELECT dias_activos, CAST(count(*) AS BIGINT) AS usuarios
FROM d GROUP BY 1
"""


@register("frecuencia_visitas_bucketed", oracle=_FRECUENCIA_ORACLE,
          ops=("A2", "A1"), driver=False)
def frecuencia_visitas_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit-frequency histogram (active-day count → how many users),
    REUSING the mart `perfil_usuario_bucketed` built — the second query
    in a session pays zero shuffle for the per-user stage: the distinct
    and per-user count collapse into the bucket distribution, leaving
    only the constant-size histogram aggregation to exchange."""
    f = eventos_usuario_mart(spark, sf_dir)
    per_user = f.groupBy("user_id").agg(
        F.countDistinct("day_num").cast("bigint").alias("dias_activos")
    )
    return per_user.groupBy("dias_activos").agg(
        F.count(F.lit(1)).cast("bigint").alias("usuarios")
    )


def _atoms_frame(events: DataFrame) -> DataFrame:
    """The atom computation, factored so the full build and the window
    refresh can never drift: distinct (user_id, day_num, hora) hour
    atoms from the playback sessions."""
    return (
        explode_to_hour_grid(sessions_from_events(events))
        .select(
            "user_id",
            F.floor(F.col("hour_idx") / 24).cast("bigint").alias("day_num"),
            (F.col("hour_idx") % 24).cast("bigint").alias("hora"),
        )
        .distinct()
    )


def atomos_usuario_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct user-hour atoms (user_id, day_num, hora) persisted
    PARTITIONED BY day_num and bucketed+sorted by user_id. The dedup
    shuffle is paid ONCE at mart build; every overlap/audience query
    after that reads atoms pre-clustered, and per-(user, day)
    aggregations stay Exchange-free because HashPartitioning(user_id)
    satisfies any clustering that CONTAINS user_id (Spark's subset
    rule) — plan-pinned by test_mart_queries_plan_no_user_exchange.

    Round 11 (VERDICT r10 #6): the layout moved from compound
    (user_id, day_num) bucketing to day PARTITIONS × user buckets so
    the mart is MAINTAINABLE — ``refresh_atomos_usuario_mart`` rewrites
    only the day partitions whose source window changed (the reference's
    lookback contract, consumo_detalle.py:317-340: each run re-derives a
    trailing window, never the full history). A hot user still spreads
    across tasks (one bucket file per day partition), the same de-skew
    the compound key bought."""
    name = mart_name("atomos_usuario_dia", sf_dir)
    sig = _vigencia_mart(spark, name, sf_dir)
    if not spark.catalog.tableExists(name):
        atoms = _atoms_frame(load_table(spark, sf_dir, "events"))
        try:
            refresh_bucketed_mart(
                spark,
                atoms,
                name,
                "day_num",
                "user_id",
                DEFAULT_BUCKETS,
                sort_col="user_id",
            )
            record_mart_signature(spark, name, sig)
        except Exception as exc:  # noqa: BLE001 — triaged by _fallback
            # warehouse not writable here — serve the unbucketed atoms
            # (same rows; only the amortized-shuffle layout is lost);
            # genuine build failures re-raise (see _fallback)
            return _fallback(name, exc, atoms)
    return spark.table(name)


def refresh_atomos_usuario_mart(
    spark: SparkSession, sf_dir: str, day_nums,
    covers_source_changes: bool = False,
) -> DataFrame:
    """INCREMENTAL MAINTENANCE for the atom mart (VERDICT r10 #6 /
    ROADMAP #6): recompute atoms for ``day_nums`` only and
    dynamic-partition-overwrite exactly those day partitions —
    untouched days keep their files byte-for-byte, the bucket layout
    (and with it every zero-user_id-Exchange plan) survives, and the
    write is one atomic overwrite per touched partition.

    Correctness of the windowed recompute: a session spills FORWARD
    only (e_us > s_us), by at most its duration, so every session that
    can place an atom inside the window starts within ``margen`` days
    before it — one cheap max(value) aggregate bounds the lookback, the
    reference's trailing-window contract made explicit. At 100 TB the
    daily run scans one lookback window and rewrites one day's buckets,
    never the table."""
    name = mart_name("atomos_usuario_dia", sf_dir)
    dias = sorted(int(d) for d in day_nums)
    if not dias:
        # mirror refresh_eventos_usuario_mart's tolerance of an empty
        # refresh window instead of an IndexError on dias[0] (ADVICE r11)
        return spark.table(name)
    events = load_table(spark, sf_dir, "events")
    max_min = events.agg(F.max("value")).first()[0] or 0.0
    margen = int(max_min // 1440) + 1
    dnum = event_day_num(events).cast("bigint")
    src = events.where((dnum >= dias[0] - margen) & (dnum <= dias[-1]))
    atoms = _atoms_frame(src).where(F.col("day_num").isin(dias))
    refresh_bucketed_mart(
        spark, atoms, name, "day_num", "user_id", DEFAULT_BUCKETS,
        sort_col="user_id",
    )
    _sello_refresh_ventana(
        spark, name, sf_dir, "events", covers_source_changes
    )
    return spark.table(name)


@register("superposicion_hora", oracle=_SUPER_ORACLE,
          ops=("J9", "A13", "A2"), bench=True)
def superposicion_hora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix (reference
    Complex_user_superposition_by_hour_etl.ipynb cells 2-4), DRIVER-TIER
    on the bucketed mart (VERDICT r3 #4) — the superposition WITHOUT its
    self-join: per (user, day) collect the hour set (an aggregation the
    compound-bucketed atom mart satisfies with zero Exchange), explode
    the set against itself map-side (≤24² pairs per user-day), and
    distinct-count users per hour pair. Same oracle as the pytest-tier
    ``superposicion_hora_selfjoin`` (the J9 join mechanics), but the
    only shuffle left in the whole plan is the final 576-group distinct
    aggregation — the join shuffle is gone, traded at ingest for the
    mart's one-time clustering. At 100 TB this is the amortization
    story: N overlap queries each save their join shuffle, and the
    (user_id, day_num) key de-skews hot users across buckets."""
    atoms = atomos_usuario_mart(spark, sf_dir)
    per_day = atoms.groupBy("user_id", "day_num").agg(
        F.collect_set("hora").alias("horas")
    )
    pairs = per_day.select(
        "user_id", F.explode("horas").alias("periodo"), "horas"
    ).select("user_id", "periodo", F.explode("horas").alias("periodo_referencia"))
    return pairs.groupBy("periodo", "periodo_referencia").agg(
        F.countDistinct("user_id").cast("bigint").alias("usuarios")
    )


# --------------------------------------------------------------------------
# Date-partitioned layout — partition pruning as a measured property
# --------------------------------------------------------------------------


def eventos_particionados_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION physical layout for the fact table: partitioned by
    day (the time axis every operational query filters on) AND bucketed
    by user_id (the join/aggregation key) — built once per dataset via
    `refresh_bucketed_mart`, whose dynamic-partition-overwrite is also
    the daily refresh path. A day-window query over this layout touches
    only its partitions' FILES (partition pruning, pinned in
    tests/test_plans.py) and keeps the zero-user-Exchange property of
    the bucketed scan."""
    from etl_python_airflow_bigquery_spark.catalog import (
        refresh_bucketed_mart,
    )

    name = mart_name("eventos_part", sf_dir)
    sig = _vigencia_mart(spark, name, sf_dir)
    if not spark.catalog.tableExists(name):
        events = load_table(spark, sf_dir, "events")
        facts = events.select(
            "user_id",
            "event_type",
            "value",
            event_day_num(events).cast("bigint").alias("dia"),
        )
        try:
            refresh_bucketed_mart(
                spark, facts, name, partition_col="dia", bucket_col="user_id"
            )
            record_mart_signature(spark, name, sig)
        except Exception as exc:  # noqa: BLE001 — triaged by _fallback
            return _fallback(name, exc, facts)
    return spark.table(name)


_VENTANA_ORACLE = """
WITH f AS (
    SELECT user_id, event_type,
           epoch_us(ts) // 86400000000 AS dia
    FROM events
),
limites AS (SELECT min(dia) AS d0 FROM f)
SELECT f.dia, CAST(count(*) AS BIGINT) AS eventos,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS usuarios
FROM f, limites l
WHERE f.dia BETWEEN l.d0 + 7 AND l.d0 + 13
GROUP BY 1
"""


def catalog_min_partition(spark: SparkSession, name: str) -> int | None:
    """Metadata-only window anchor: the minimum INTEGER partition value
    from the catalog listing (SHOW PARTITIONS — O(#partitions), zero
    data files touched). Non-numeric partition values are SKIPPED, not
    a ValueError — a null-day row materializes its partition directory
    as ``__HIVE_DEFAULT_PARTITION__``, which must not break the anchor
    (ADVICE r6). Returns None when no value parses, signalling the
    caller to fall back to its scan-derived anchor."""
    parts = []
    for r in spark.sql(f"SHOW PARTITIONS {name}").collect():
        v = r[0].split("=", 1)[1]
        try:
            parts.append(int(v))
        except ValueError:
            continue
    return min(parts) if parts else None


@register("ventana_particionada", oracle=_VENTANA_ORACLE, ops=("P3", "W2"),
          driver=False)
def ventana_particionada(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 7-DAY OPERATIONAL WINDOW over the date-partitioned fact layout
    — the query class that runs hourly in production and must read
    ~7/60ths of the table, not scan-and-filter all of it: the `dia`
    predicate prunes whole PARTITION DIRECTORIES at planning time
    (PartitionFilters in the scan, plan-pinned), which at 100 TB is the
    difference between touching a week and touching years. The window
    derives from the mart's own min day — read from the CATALOG
    partition listing (SHOW PARTITIONS, zero data files) — so
    the query is scale-factor-proof; the oracle filters the raw events
    identically."""
    mart = eventos_particionados_mart(spark, sf_dir)
    name = mart_name("eventos_part", sf_dir)
    if spark.catalog.tableExists(name):
        # metadata-only window anchor: partition VALUES come from the
        # catalog listing (SHOW PARTITIONS — O(#partitions), zero data
        # files touched), so anchoring no longer costs a full pre-prune
        # scan (the r5 soft spot). The fallback (unwritable warehouse)
        # keeps the scan-derived anchor on its plain frame.
        d0 = catalog_min_partition(spark, name)
        if d0 is None:
            d0 = mart.agg(F.min("dia")).collect()[0][0]
    else:
        d0 = mart.agg(F.min("dia")).collect()[0][0]
    if d0 is None:
        return mart.select(
            F.col("dia"),
            F.lit(0).cast("bigint").alias("eventos"),
            F.lit(0).cast("bigint").alias("usuarios"),
        ).limit(0)
    return (
        mart.where(F.col("dia").between(d0 + 7, d0 + 13))
        .groupBy("dia")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("eventos"),
            F.countDistinct("user_id").cast("bigint").alias("usuarios"),
        )
    )


# --------------------------------------------------------------------------
# Second-source mart (ROADMAP r13 #4): the staleness gate generalized
# --------------------------------------------------------------------------


def documentos_calidad_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain quality projection (doc_id, lang, source, n_chars,
    n_tokens) persisted partitioned by lang and bucketed by doc_id — the
    clustered base the text-analysis family's per-doc aggregations read
    without re-tokenizing or re-shuffling the corpus. Its staleness gate
    fingerprints the DOCUMENTS table (``_vigencia_mart(table=
    'documents')``): this is the second source family the generalized
    signature plumbing exists for — regenerating events must NOT
    invalidate it, regenerating documents MUST."""
    name = mart_name("documentos_calidad", sf_dir)
    sig = _vigencia_mart(spark, name, sf_dir, table="documents")
    if not spark.catalog.tableExists(name):
        from etl_python_airflow_bigquery_spark.catalog import (
            record_mart_signature as _record,
        )

        docs = load_table(spark, sf_dir, "documents")
        base = docs.select(
            "doc_id",
            "lang",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.size(
                F.filter(F.split("text", " "), lambda t: t != F.lit(""))
            ).cast("bigint").alias("n_tokens"),
        )
        try:
            refresh_bucketed_mart(
                spark, base, name, partition_col="lang",
                bucket_col="doc_id",
            )
            _record(spark, name, sig)
        except Exception as exc:  # noqa: BLE001 — triaged by _fallback
            return _fallback(name, exc, base)
    return spark.table(name)


_CALIDAD_FUENTE_ORACLE = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       CAST(sum(len(list_filter(str_split(text, ' '), x -> x <> '')))
            AS BIGINT) AS tokens_total
FROM documents
GROUP BY 1, 2
"""


@register("calidad_por_fuente", oracle=_CALIDAD_FUENTE_ORACLE,
          ops=("A1", "P1"), driver=True)
def calidad_por_fuente(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality rollup per (source, lang) over the documents-
    gated quality mart: doc counts, char mass, token mass — the
    monitoring query a training-data pipeline runs after every ingest.
    Reads the mart (tokenize paid once, at build); the oracle replays
    the same algebra over the raw documents table, so the mart's
    content — and its staleness gate — are value-checked, not just
    row-counted."""
    mart = documentos_calidad_mart(spark, sf_dir)
    return mart.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )
