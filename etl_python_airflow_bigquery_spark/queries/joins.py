"""Join-layer queries — the richest part of the reference (SURVEY.md §2.4).

Every join family gets a named, oracle-checked query: theta-on-threshold
(J4), bracket range (J5), anti (J7), semi (J8), right/calendar-completion
(J10), general interval overlap (J3), validity windows (P9), plus the
multi-branch registry union (O2/O3) over the snowflake dims (J1/J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.dims import (
    age_brackets_dim,
    day_grid,
    values_dim,
    vips_dim,
)
from etl_python_airflow_bigquery_spark.functions import (
    US_PER_DAY,
    US_PER_HOUR,
    clipped_micros,
    dsum,
    event_day_num,
    event_ts_filter,
    event_ts_us,
    trunc1,
)
from etl_python_airflow_bigquery_spark.operators.intervals import (
    interval_overlap_join,
    sessions_from_events,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

# --------------------------------------------------------------------------
# J4 — theta join on vip thresholds
# --------------------------------------------------------------------------

_FUNNEL_VIP_ORACLE = """
SELECT v.vip, e.event_type,
       CAST(count(*) AS BIGINT) AS starts,
       CAST(sum(CAST(coalesce(e.value, 0) AS DECIMAL(28,6))) AS DOUBLE) AS minutos,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS usuarios,
       CAST(count(DISTINCT md5(concat_ws('|', e.user_id, e.event_type))) AS BIGINT) AS dispositivos
FROM events e
JOIN (VALUES (0), (1), (5), (20), (40)) v(vip)
  ON coalesce(e.value, 0) >= v.vip
GROUP BY v.vip, e.event_type
"""


@register("funnel_vip", oracle=_FUNNEL_VIP_ORACLE, ops=("J4", "A1", "A2"), bench=True)
def funnel_vip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIP-tier funnel: each session row matches every tier ≤ its minutes —
    intentional row multiplication via a theta join (reference
    ``IFNULL(consumo.minutes,0) >= vips.vip``, audio_digital.py:395-396).

    Plan: the 5-row tier dim broadcasts; Catalyst plans a broadcast
    nested-loop join whose inner side is 5 rows — effectively a map-side
    flatMap, no shuffle until the final agg. Device identity is the
    md5 fingerprint idiom of consumo_registrados.py:113.
    """
    events = load_table(spark, sf_dir, "events")
    vips = vips_dim(spark)
    minutes = F.coalesce(F.col("value"), F.lit(0.0))
    return (
        events.join(F.broadcast(vips), minutes >= F.col("vip"))
        .groupBy("vip", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("starts"),
            dsum(minutes).alias("minutos"),
            F.countDistinct("user_id").cast("bigint").alias("usuarios"),
            F.countDistinct(F.md5(F.concat_ws("|", "user_id", "event_type")))
            .cast("bigint")
            .alias("dispositivos"),
        )
    )


# --------------------------------------------------------------------------
# J5 — bracket range join (age tramos)
# --------------------------------------------------------------------------

_TRAMO_ORACLE = """
WITH usuarios AS (
    SELECT c_custkey, c_acctbal, CAST(c_custkey % 80 + 10 AS INT) AS edad
    FROM customer
),
tramos(tramo, edad_inf, edad_sup) AS (
    VALUES ('13 a 17', 13, 17), ('18 a 24', 18, 24), ('25 a 34', 25, 34),
           ('35 a 44', 35, 44), ('45 a 54', 45, 54), ('55 a 64', 55, 64),
           ('65 o mas', 65, 200)
)
SELECT t.tramo,
       CAST(count(*) AS BIGINT) AS usuarios,
       CAST(sum(CAST(u.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS saldo_total,
       floor(CAST(sum(CAST(u.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(*) * 10) / 10 AS saldo_prom
FROM usuarios u
JOIN tramos t ON u.edad BETWEEN t.edad_inf AND t.edad_sup
GROUP BY t.tramo
"""


@register("tramo_etario", oracle=_TRAMO_ORACLE, ops=("J5", "A1", "A3"))
def tramo_etario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demographic split by age bracket — broadcast non-equi range join to
    the tramo dim (reference `edad between tramo.edad_inf and edad_sup`,
    Complex_user_superposition_by_hour_etl.ipynb cell 7)."""
    customer = load_table(spark, sf_dir, "customer")
    usuarios = customer.select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % 80 + 10).cast("int").alias("edad")
    )
    tramos = age_brackets_dim(spark)
    joined = usuarios.join(
        F.broadcast(tramos),
        F.col("edad").between(F.col("edad_inf"), F.col("edad_sup")),
    )
    agg = joined.groupBy("tramo").agg(
        F.count(F.lit(1)).cast("bigint").alias("usuarios"),
        dsum("c_acctbal").alias("saldo_total"),
    )
    return agg.select(
        "tramo",
        "usuarios",
        "saldo_total",
        trunc1(F.col("saldo_total") / F.col("usuarios")).alias("saldo_prom"),
    )


# --------------------------------------------------------------------------
# J7 — anti join (data-quality nulls report)
# --------------------------------------------------------------------------

_ANTI_NULOS_ORACLE = """
SELECT l.l_partkey,
       CAST(count(*) AS BIGINT) AS lineas,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS ordenes
FROM lineitem l
WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 7 != 0)
GROUP BY l.l_partkey
"""


@register("anti_join_nulos", oracle=_ANTI_NULOS_ORACLE, ops=("J7", "P10", "A2"), driver=False)
def anti_join_nulos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality anti-join: fact rows whose dimension key is missing
    from the (gappy) available-shows dim — the reference's scheduled
    nulls-report query (email_nulos.py:25-36), fixture-gapped per
    FIXTURES.md (p_partkey % 7 == 0 rows removed from the dim)."""
    li = load_table(spark, sf_dir, "lineitem")
    available = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 7 != 0)
    missing = li.join(
        F.broadcast(available.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_anti",
    )
    return missing.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("lineas"),
        F.countDistinct("l_orderkey").cast("bigint").alias("ordenes"),
    )


# --------------------------------------------------------------------------
# J7 chained — priority cohort segmentation
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH compradores AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
seg1 AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000),
seg2 AS (
    SELECT c.c_custkey FROM customer c
    WHERE c.c_custkey IN (SELECT user_id FROM compradores)
      AND c.c_custkey NOT IN (SELECT c_custkey FROM seg1)
),
seg3 AS (
    SELECT c.c_custkey FROM customer c
    WHERE c.c_mktsegment = 'BUILDING'
      AND c.c_custkey NOT IN (SELECT c_custkey FROM seg1)
      AND c.c_custkey NOT IN (SELECT c_custkey FROM seg2)
)
SELECT 'premium' AS segmento, c_custkey AS user_id FROM seg1
UNION ALL SELECT 'comprador', c_custkey FROM seg2
UNION ALL SELECT 'building', c_custkey FROM seg3
"""


@register("cohort_chain", oracle=_COHORT_ORACLE, ops=("J7", "J8", "O2", "P10"),
          driver=False)
def cohort_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority cohort chain: each segment excludes all earlier ones via
    stacked anti-joins (reference Bigquery_to_csv.ipynb cell 3's
    shows→deportivos→ficciones chain; 5-deep in Bigquery_to_csv_2.ipynb)."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    compradores = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_custkey"))
        .distinct()
    )
    seg1 = customer.where(F.col("c_acctbal") > 8000).select("c_custkey")
    seg2 = (
        customer.join(compradores, "c_custkey", "left_semi")
        .select("c_custkey")
        .join(seg1, "c_custkey", "left_anti")
    )
    seg3 = (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(seg1, "c_custkey", "left_anti")
        .join(seg2, "c_custkey", "left_anti")
    )
    tag = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("segmento"), F.col("c_custkey").alias("user_id")
    )
    return tag(seg1, "premium").unionByName(tag(seg2, "comprador")).unionByName(
        tag(seg3, "building")
    )


# --------------------------------------------------------------------------
# J8 — semi join (mailing segmentation)
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT lower(c_name) || '@rdf.cl' AS email, c_mktsegment AS segmento
FROM customer
WHERE c_custkey IN (
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 50
)
"""


@register("semi_join_mailing", oracle=_SEMI_ORACLE, ops=("J8",),
          driver=False)
def semi_join_mailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mailing-list membership: emails of users with qualifying consumption
    (reference Mailing_campaign_segmenttion.ipynb tag_shows cells) — a
    left-semi join, never a join+distinct."""
    customer = load_table(spark, sf_dir, "customer")
    listeners = (
        load_table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select(F.col("user_id").alias("c_custkey"))
    )
    return customer.join(listeners, "c_custkey", "left_semi").select(
        F.concat(F.lower("c_name"), F.lit("@rdf.cl")).alias("email"),
        F.col("c_mktsegment").alias("segmento"),
    )


# --------------------------------------------------------------------------
# J10 — right join calendar completion
# --------------------------------------------------------------------------

_CALENDAR_ORACLE = """
WITH dias AS (
    SELECT CAST(d.d AS DATE) AS fecha
    FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) d(d)
),
signups AS (
    SELECT epoch_us(ts) // 86400000000 AS day_num, count(*) AS q
    FROM events WHERE event_type = 'signup'
    GROUP BY 1
)
SELECT strftime(d.fecha, '%Y-%m-%d') AS fecha,
       day(d.fecha) IN (7, 19) AS feriado,
       CAST(coalesce(s.q, 0) AS BIGINT) AS q_signups
FROM signups s
RIGHT JOIN dias d
  ON DATE '1970-01-01' + CAST(s.day_num AS INT) = d.fecha
"""


@register("right_join_calendar", oracle=_CALENDAR_ORACLE, ops=("J10", "P6"))
def right_join_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar completion: sparse per-day counts right-joined to the full
    date range with zero/false-fill (reference ApiFeriados gen_df_final
    cell: holidays right-joined to all dates + fillna(False)).

    Reads the date-PARTITIONED mart: the calendar window becomes a
    PartitionFilter on `dia` (plan-pinned) — at 100 TB the scan touches
    31 partition directories, not the whole fact. The window filter was
    always implied by the right join; making it explicit on the
    partition column is what lets planning prune."""
    from etl_python_airflow_bigquery_spark.queries.marts import (
        eventos_particionados_mart,
    )

    mart = eventos_particionados_mart(spark, sf_dir)
    signups = (
        mart.where(
            (F.col("event_type") == "signup") & F.col("dia").between(19723, 19753)
        )
        .groupBy(F.col("dia").alias("day_num"))
        .agg(F.count(F.lit(1)).alias("q"))
    )
    # 2024-01-01 .. 2024-01-31 = epoch days 19723..19753
    dias = day_grid(spark, 19723, 19753).select("day_num", "fecha", "feriado")
    return signups.join(F.broadcast(dias), "day_num", "right").select(
        F.date_format("fecha", "yyyy-MM-dd").alias("fecha"),
        "feriado",
        F.coalesce(F.col("q"), F.lit(0)).cast("bigint").alias("q_signups"),
    )


# --------------------------------------------------------------------------
# J3 general — interval-overlap join against program airings
# --------------------------------------------------------------------------

_PROGRAMA_ORACLE = """
WITH sess AS (
    SELECT user_id,
           epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e_us
    FROM events
),
programas AS (
    SELECT o_orderkey AS programa_id,
           1704067200000000 + (o_orderkey % 720) * 3600000000 AS p_s_us,
           1704067200000000 + (o_orderkey % 720) * 3600000000
               + (o_orderkey % 4 + 1) * 3600000000 AS p_e_us
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderkey % 10 = 0
)
SELECT p.programa_id,
       CAST(count(*) AS BIGINT) AS sesiones,
       CAST(count(DISTINCT s.user_id) AS BIGINT) AS audiencia,
       CAST(sum(least(s.e_us, p.p_e_us) - greatest(s.s_us, p.p_s_us)) AS DOUBLE)
           / 60000000.0 AS minutos
FROM sess s
JOIN programas p
  ON s.s_us < p.p_e_us AND s.e_us > p.p_s_us
GROUP BY p.programa_id
"""


@register(
    "programas_live",
    oracle=_PROGRAMA_ORACLE,
    ops=("J3", "A4", "A2", "P6"),
    bench=True, driver=True)
def programas_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-program audience: sessions interval-overlap-joined to program
    airing windows with clipping (reference programas_live.py:443-452 +
    the J3 predicate of consumo_registrados.py:165-170).

    Programs are arbitrary (non-grid) intervals, so this exercises the
    bucketed interval_overlap_join: both sides explode into hour buckets,
    equi-join on bucket, refine by the exact predicate, dedup exactly via
    the overlap-start bucket. At scale this is a shuffled hash join on
    bucket — never a nested loop.
    """
    sessions = sessions_from_events(load_table(spark, sf_dir, "events")).select(
        "user_id", "s_us", "e_us"
    )
    orders = load_table(spark, sf_dir, "orders")
    base_us = F.lit(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z
    programas = (
        orders.where((F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 10 == 0))
        .select(
            F.col("o_orderkey").alias("programa_id"),
            (base_us + (F.col("o_orderkey") % 720) * F.lit(US_PER_HOUR)).alias("p_s_us"),
            (
                base_us
                + (F.col("o_orderkey") % 720) * F.lit(US_PER_HOUR)
                + (F.col("o_orderkey") % 4 + 1) * F.lit(US_PER_HOUR)
            ).alias("p_e_us"),
        )
    )
    joined = interval_overlap_join(
        sessions, programas, "s_us", "e_us", "p_s_us", "p_e_us", bucket_us=US_PER_HOUR
    )
    return joined.groupBy("programa_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sesiones"),
        F.countDistinct("user_id").cast("bigint").alias("audiencia"),
        (
            F.sum(
                clipped_micros(
                    F.col("s_us"), F.col("e_us"), F.col("p_s_us"), F.col("p_e_us")
                )
            ).cast("double")
            / F.lit(60_000_000.0)
        ).alias("minutos"),
    )


# --------------------------------------------------------------------------
# P9 — validity-window (SCD-ish) filter
# --------------------------------------------------------------------------

_VALIDITY_ORACLE = """
WITH soportes(event_type, dia_inicio, dia_fin) AS (
    VALUES ('click', 19723, 19737), ('view', 19730, 19753),
           ('purchase', 19723, 19753), ('signup', 19738, 19753),
           ('error', 19723, 19723)
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS eventos,
       CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS valor_total
FROM events e
JOIN soportes s ON e.event_type = s.event_type
WHERE epoch_us(e.ts) // 86400000000 BETWEEN s.dia_inicio AND s.dia_fin
GROUP BY e.event_type
"""


@register("validity_window", oracle=_VALIDITY_ORACLE, ops=("P9", "J1"))
def validity_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand validity-window clamp: rows only count inside their
    entity's [start_soporte, end_soporte] range (reference
    audio_digital.py:287-299, mapa_consumo.py:138-150).

    Reads the date-PARTITIONED mart: the coarse prefilter over the
    GLOBAL validity envelope [min(dia_inicio), max(dia_fin)] sits on the
    partition column, so it prunes whole partition DIRECTORIES at
    planning time (plan-pinned) instead of row-group pruning inside a
    full scan; the exact per-brand clamp refines after the broadcast
    join as before."""
    from etl_python_airflow_bigquery_spark.queries.marts import (
        eventos_particionados_mart,
    )

    soportes = values_dim(
        spark,
        [
            ("click", 19723, 19737),
            ("view", 19730, 19753),
            ("purchase", 19723, 19753),
            ("signup", 19738, 19753),
            ("error", 19723, 19723),
        ],
        ["event_type", "dia_inicio", "dia_fin"],
    )
    mart = eventos_particionados_mart(spark, sf_dir)
    return (
        mart.where(F.col("dia").between(19723, 19753))
        .join(F.broadcast(soportes), "event_type")
        .where(F.col("dia").between(F.col("dia_inicio"), F.col("dia_fin")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("eventos"),
            dsum("value").alias("valor_total"),
        )
    )


# --------------------------------------------------------------------------
# O2/O3 + J1/J2 — registry union over the snowflake dims
# --------------------------------------------------------------------------

_REGISTRY_UNION_ORACLE = """
WITH usuarios AS (
    SELECT c_custkey AS user_id, c_nationkey AS nationkey, 'radios' AS fuente
    FROM customer
    UNION ALL
    SELECT s_suppkey + 100000 AS user_id, s_nationkey, 'emisor' AS fuente
    FROM supplier
)
SELECT r.r_name AS region, n.n_name AS nacion, u.fuente,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS usuarios
FROM usuarios u
JOIN nation n ON u.nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name, u.fuente
"""


@register("registry_union", oracle=_REGISTRY_UNION_ORACLE, ops=("O2", "O3", "J1", "A2"))
def registry_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two user registries unioned then rolled up the snowflake dims
    (reference `userradios UNION ALL useremisor`,
    consumo_bloques_hora.py:119-129; FK→dim equi joins of §2.4 J1)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    usuarios = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit("radios").alias("fuente"),
    ).unionByName(
        supplier.select(
            (F.col("s_suppkey") + 100000).alias("user_id"),
            F.col("s_nationkey").alias("nationkey"),
            F.lit("emisor").alias("fuente"),
        )
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        usuarios.join(F.broadcast(nation), usuarios.nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nacion"),
            F.col("fuente"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("usuarios"))
    )


# --------------------------------------------------------------------------
# Ordered multi-step funnel — strict event-sequence conversion
# --------------------------------------------------------------------------

_FUNNEL_ORDENADO_ORACLE = """
WITH ev AS (
    SELECT user_id, event_type AS tipo, epoch_us(ts) AS t FROM events
),
v AS (SELECT user_id, min(t) AS t1 FROM ev WHERE tipo = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.t) AS t2
      FROM ev e JOIN v ON v.user_id = e.user_id AND e.t > v.t1
      WHERE e.tipo = 'click' GROUP BY 1),
p AS (SELECT e.user_id, min(e.t) AS t3
      FROM ev e JOIN c ON c.user_id = e.user_id AND e.t > c.t2
      WHERE e.tipo = 'purchase' GROUP BY 1)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS usuarios_vista,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS usuarios_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS usuarios_compra,
       floor((SELECT count(*) FROM c) * 1000.0
             / greatest((SELECT count(*) FROM v), 1)) / 1000 AS conv_click,
       floor((SELECT count(*) FROM p) * 1000.0
             / greatest((SELECT count(*) FROM c), 1)) / 1000 AS conv_compra
"""


@register("funnel_ordenado", oracle=_FUNNEL_ORDENADO_ORACLE,
          ops=("A8", "W1"), driver=False)
def funnel_ordenado(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-ORDER funnel (view → click → purchase): a user converts a
    stage only with an event strictly AFTER their previous stage's
    earliest completion — the product-analytics sequence constraint the
    unordered funnels (funnel_vip/funnel_condicional) don't impose.

    Spark-first: ONE groupBy(user) collecting the sorted (t, tipo)
    array, then a single fold computes (t1, t2, t3) greedily —
    earliest-first is optimal for sequence existence, and equals the
    oracle's chained min-after-min joins. No self-joins: the per-user
    event list folds in one codegen expression, so the whole funnel is
    one shuffle + one map pass at any scale."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        F.col("event_type").alias("tipo"),
        event_ts_us(events).alias("t"),
    ).where(F.col("tipo").isin("view", "click", "purchase"))
    por_usuario = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "tipo"))).alias("evs")
    )
    fold = F.expr(
        "aggregate(evs, "
        "struct(CAST(NULL AS BIGINT) AS t1, CAST(NULL AS BIGINT) AS t2, "
        "CAST(NULL AS BIGINT) AS t3), "
        "(acc, e) -> struct("
        "CASE WHEN acc.t1 IS NULL AND e.tipo = 'view' THEN e.t "
        "ELSE acc.t1 END AS t1, "
        "CASE WHEN acc.t2 IS NULL AND acc.t1 IS NOT NULL "
        "AND e.tipo = 'click' AND e.t > acc.t1 THEN e.t ELSE acc.t2 END AS t2, "
        "CASE WHEN acc.t3 IS NULL AND acc.t2 IS NOT NULL "
        "AND e.tipo = 'purchase' AND e.t > acc.t2 THEN e.t ELSE acc.t3 END AS t3))"
    )
    etapas = por_usuario.select(fold.alias("f")).select(
        F.col("f.t1").alias("t1"), F.col("f.t2").alias("t2"), F.col("f.t3").alias("t3")
    )
    agg = etapas.agg(
        F.count("t1").cast("bigint").alias("usuarios_vista"),
        F.count("t2").cast("bigint").alias("usuarios_click"),
        F.count("t3").cast("bigint").alias("usuarios_compra"),
    )
    return agg.select(
        "usuarios_vista",
        "usuarios_click",
        "usuarios_compra",
        (
            F.floor(
                F.col("usuarios_click") * 1000.0
                / F.greatest(F.col("usuarios_vista"), F.lit(1))
            )
            / 1000
        ).alias("conv_click"),
        (
            F.floor(
                F.col("usuarios_compra") * 1000.0
                / F.greatest(F.col("usuarios_click"), F.lit(1))
            )
            / 1000
        ).alias("conv_compra"),
    )


# --------------------------------------------------------------------------
# Cohort retention — first-seen cohorts × day offsets
# --------------------------------------------------------------------------

_RETENCION_ORACLE = """
WITH actividad AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dia FROM events
),
cohortes AS (
    SELECT user_id, min(dia) AS cohorte FROM actividad GROUP BY 1
)
SELECT CAST(c.cohorte AS BIGINT) AS cohorte,
       CAST(a.dia - c.cohorte AS BIGINT) AS dia_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS usuarios
FROM actividad a JOIN cohortes c ON c.user_id = a.user_id
WHERE a.dia - c.cohorte <= 7
GROUP BY 1, 2
"""


@register("retencion_cohortes", oracle=_RETENCION_ORACLE,
          ops=("A2", "J1", "W2"), driver=False)
def retencion_cohortes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the audience-analytics staple: users
    cohorted by FIRST active day, then counted per (cohort, day-offset)
    for the first week. Shape: the day-distinct activity dedups once
    (user-keyed shuffle), cohorts derive from the same frame with a
    map-side re-aggregation, and the join-back is user-keyed — at scale
    both sides share the user partitioning so AQE plans one exchange
    per side and the output is a constant ~cohorts×8 matrix."""
    events = load_table(spark, sf_dir, "events")
    actividad = events.select(
        "user_id", event_day_num(events).cast("long").alias("dia")
    ).distinct()
    cohortes = actividad.groupBy("user_id").agg(F.min("dia").alias("cohorte"))
    j = actividad.join(cohortes, "user_id").where(
        F.col("dia") - F.col("cohorte") <= 7
    )
    return j.groupBy(
        F.col("cohorte").cast("bigint").alias("cohorte"),
        (F.col("dia") - F.col("cohorte")).cast("bigint").alias("dia_offset"),
    ).agg(F.countDistinct("user_id").cast("bigint").alias("usuarios"))


# --------------------------------------------------------------------------
# Life table — survival-analysis hazard over user lifespans
# --------------------------------------------------------------------------

_VIDA_CENSURA = 7  # days of silence before the frontier = churn

_VIDA_ORACLE = f"""
WITH dias AS (
    SELECT user_id, epoch_us(ts) // 86400000000 AS dia FROM events
),
frontera AS (SELECT max(dia) AS f FROM dias),
usuarios AS (
    SELECT user_id, min(dia) AS primero, max(dia) AS ultimo
    FROM dias GROUP BY 1
),
vidas AS (
    SELECT u.ultimo - u.primero AS t,
           CASE WHEN u.ultimo < fr.f - {_VIDA_CENSURA} THEN 1 ELSE 0 END
               AS baja
    FROM usuarios u CROSS JOIN frontera fr
),
por_t AS (
    SELECT t, CAST(sum(baja) AS BIGINT) AS bajas,
           CAST(sum(1 - baja) AS BIGINT) AS censurados
    FROM vidas GROUP BY 1
),
riesgo AS (
    SELECT t, bajas, censurados,
           sum(bajas + censurados) OVER (ORDER BY t DESC) AS n_riesgo
    FROM por_t
)
SELECT CAST(t AS BIGINT) AS t,
       CAST(n_riesgo AS BIGINT) AS n_riesgo,
       bajas, censurados,
       CAST(1000 * bajas // n_riesgo AS BIGINT) AS riesgo_mili
FROM riesgo
"""


@register("tabla_vida", oracle=_VIDA_ORACLE, ops=("A8", "W1", "A6"), driver=False)
def tabla_vida(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIFE TABLE over user lifespans — the survival-analysis read-out
    of churn (the discrete actuarial estimator behind Kaplan-Meier):
    each user's lifespan t = last active day − first active day; users
    silent for more than {_VIDA_CENSURA} days before the data frontier
    COUNT AS CHURNED at t, the rest are right-CENSORED (still alive
    when observation ended — the distinction naive churn metrics drop,
    biasing hazard high for recent signups). Per lifespan t: the risk
    set n_t = users surviving at least t (reverse cumulative of deaths
    + censors), deaths, censors, and the discrete hazard in floor-milli
    1000·d_t/n_t — all exact integers, so the cross-engine hash pins
    the estimator itself. (The KM survival CURVE is the running product
    of (1 − hazard); products of rounded ratios aren't cross-engine
    exact, so the table emits the per-step hazards a consumer folds.)

    Shape: one user-grain aggregation over events (map-side
    combinable), the frontier as a 1-row broadcast, then everything is
    LIFESPAN-grain — the histogram, the reverse-cumulative window, and
    the output are all ≤ #distinct-lifespans rows (≤ calendar days)
    regardless of user count."""
    events = load_table(spark, sf_dir, "events")
    dias = events.select("user_id", event_day_num(events).alias("dia"))
    usuarios = dias.groupBy("user_id").agg(
        F.min("dia").alias("primero"), F.max("dia").alias("ultimo")
    )
    frontera = dias.agg(F.max("dia").alias("f"))
    vidas = usuarios.crossJoin(F.broadcast(frontera)).select(
        (F.col("ultimo") - F.col("primero")).alias("t"),
        F.when(F.col("ultimo") < F.col("f") - _VIDA_CENSURA, 1)
        .otherwise(0)
        .alias("baja"),
    )
    por_t = vidas.groupBy("t").agg(
        F.sum("baja").cast("bigint").alias("bajas"),
        F.sum(1 - F.col("baja")).cast("bigint").alias("censurados"),
    )
    w = Window.orderBy(F.desc("t"))
    return por_t.select(
        F.col("t").cast("bigint").alias("t"),
        F.sum(F.col("bajas") + F.col("censurados"))
        .over(w)
        .cast("bigint")
        .alias("n_riesgo"),
        "bajas",
        "censurados",
    ).withColumn(
        "riesgo_mili",
        F.expr("CAST((1000 * bajas) div n_riesgo AS BIGINT)"),
    )


# --------------------------------------------------------------------------
# DAU / WAU stickiness — rolling 7-day distinct audience
# --------------------------------------------------------------------------

_STICKINESS_ORACLE = """
WITH actividad AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dia FROM events
),
dau AS (
    SELECT dia, count(DISTINCT user_id) AS dau FROM actividad GROUP BY 1
),
ventana AS (
    SELECT d.dia, count(DISTINCT a.user_id) AS wau
    FROM (SELECT DISTINCT dia FROM actividad) d
    JOIN actividad a ON a.dia BETWEEN d.dia - 6 AND d.dia
    GROUP BY 1
)
SELECT CAST(d.dia AS BIGINT) AS dia,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(v.wau AS BIGINT) AS wau,
       floor(d.dau * 1000.0 / v.wau) / 1000 AS adherencia
FROM dau d JOIN ventana v ON v.dia = d.dia
"""


@register("dau_wau_adherencia", oracle=_STICKINESS_ORACLE,
          ops=("A2", "W2"), driver=False)
def dau_wau_adherencia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — rolling 7-day DISTINCT audience per day, the
    sliding-window distinct that plain window frames cannot express
    (distinct does not decompose over frames). Spark-first: the
    day-distinct activity dedups once, then each (user, day) atom
    EXPLODES into the ≤7 window anchors it serves (map-side sequence,
    the same trick as the hour grid) and one distinct-count per anchor
    day finishes it — candidate volume is exactly 7× the day-distinct
    atoms at any scale, never days × corpus."""
    events = load_table(spark, sf_dir, "events")
    actividad = events.select(
        "user_id", event_day_num(events).cast("long").alias("dia")
    ).distinct()
    dau = actividad.groupBy("dia").agg(
        F.countDistinct("user_id").alias("dau")
    )
    anchors = actividad.select(
        "user_id",
        F.explode(
            F.sequence(F.col("dia"), F.col("dia") + F.lit(6))
        ).alias("ancla"),
    )
    # anchors outside the observed day range would report partial weeks
    # of nothing — keep only anchors that are real activity days
    dias = actividad.select("dia").distinct()
    wau = anchors.join(
        dias.select(F.col("dia").alias("ancla")), "ancla"
    ).groupBy("ancla").agg(F.countDistinct("user_id").alias("wau"))
    j = dau.join(wau.select(F.col("ancla").alias("dia"), "wau"), "dia")
    return j.select(
        F.col("dia").cast("bigint").alias("dia"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        (F.floor(F.col("dau") * 1000.0 / F.col("wau")) / 1000).alias("adherencia"),
    )


# --------------------------------------------------------------------------
# Snowflake revenue pipeline — the TPC-H-Q5-shaped multi-hop join chain
# --------------------------------------------------------------------------

_INGRESOS_ORACLE = """
SELECT n.n_name AS nacion,
       CAST(count(*) AS BIGINT) AS lineas,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
            // 1000 AS BIGINT) AS ingreso_centavos
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND epoch_us(o.o_orderdate) >= 820454400000000
  AND epoch_us(o.o_orderdate) < 852076800000000
GROUP BY 1
"""


@register("ingresos_por_nacion", oracle=_INGRESOS_ORACLE,
          ops=("J1", "A1", "P3"), driver=False)
def ingresos_por_nacion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-SHAPED snowflake revenue pipeline: lineitem → orders →
    customer → supplier → nation → region, with the Q5 co-location
    predicate (supplier and customer share a nation) and a one-year
    order-date window — the canonical multi-hop OLAP join whose plan
    quality IS Catalyst's join reordering + broadcast selection doing
    their job: the snowflake dims (nation/region/supplier at dim scale)
    broadcast, the two fact-fact joins (lineitem⋈orders on orderkey,
    ⋈customer on custkey) are the only shuffles, and the date window
    pushes into the orders scan (P3 discipline via `ts_lit_for`).
    Revenue is integer-exact: centavos × milli-discount with one final
    floor — sum order cannot move the result.

    1996 window: epoch_us(1996-01-01) = 820454400000000,
    epoch_us(1997-01-01) = 852076800000000."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    o = orders.where(
        (F.col("o_orderdate") >= ts_lit_for(orders, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit_for(orders, "o_orderdate", "1997-01-01 00:00:00"))
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(customer, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supplier), li.l_suppkey == F.col("s_suppkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    ingreso = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    return joined.groupBy(F.col("n_name").alias("nacion")).agg(
        F.count(F.lit(1)).cast("bigint").alias("lineas"),
        # integer floor division — a float /1000 would round above 2^53
        # (reached by the 10× probe's revenue sums)
        ingreso.cast("bigint").alias("_bruto"),
    ).select(
        "nacion",
        "lineas",
        F.expr("_bruto div 1000").cast("bigint").alias("ingreso_centavos"),
    )


# --------------------------------------------------------------------------
# Bilateral trade volume — the TPC-H-Q7-shaped two-sided nation join
# --------------------------------------------------------------------------

_COMERCIO_ORACLE = """
SELECT ns.n_name AS proveedor,
       nc.n_name AS cliente,
       CAST(CASE WHEN epoch_us(o.o_orderdate) < 820454400000000
                 THEN 1995 ELSE 1996 END AS BIGINT) AS anio,
       CAST(count(*) AS BIGINT) AS lineas,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
            // 1000 AS BIGINT) AS ingreso_centavos
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
WHERE s.s_nationkey != c.c_nationkey
  AND epoch_us(o.o_orderdate) >= 788918400000000
  AND epoch_us(o.o_orderdate) < 852076800000000
GROUP BY 1, 2, 3
"""


@register("comercio_bilateral", oracle=_COMERCIO_ORACLE,
          ops=("J1", "A1", "P3"), bench=True, driver=False)
def comercio_bilateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-SHAPED bilateral trade matrix: cross-border revenue per
    (supplier nation, customer nation, year) — the two-sided dimension
    join Q5 lacks (the SAME nation table joins twice under different
    roles, so column disambiguation and the != co-location predicate
    both exercise paths the equi-chain never touches). Generalized from
    Q7's two-nation literal filter to the full pair matrix (nations²
    output bound). Year buckets are pure integer epoch comparisons —
    no session-tz-dependent year() extraction — over a two-year window
    pushed into the orders scan (P3 via ts_lit_for). Revenue follows
    the ingresos_por_nacion exact-integer discipline (centavos ×
    milli-discount, one final floor-div). Plan: both nation roles
    broadcast, supplier broadcasts, the two fact joins are the only
    shuffles — Catalyst's join-reorder target shape.

    1995 window anchors: epoch_us(1995-01-01) = 788918400000000,
    epoch_us(1996-01-01) = 820454400000000,
    epoch_us(1997-01-01) = 852076800000000."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lim95 = ts_lit_for(orders, "o_orderdate", "1995-01-01 00:00:00")
    lim96 = ts_lit_for(orders, "o_orderdate", "1996-01-01 00:00:00")
    lim97 = ts_lit_for(orders, "o_orderdate", "1997-01-01 00:00:00")
    o = orders.where(
        (F.col("o_orderdate") >= lim95) & (F.col("o_orderdate") < lim97)
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("proveedor")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cliente")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(customer, o.o_custkey == F.col("c_custkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
    )
    ingreso = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    return (
        joined.groupBy(
            "proveedor",
            "cliente",
            F.when(F.col("o_orderdate") < lim96, 1995)
            .otherwise(1996)
            .cast("bigint")
            .alias("anio"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("lineas"),
            ingreso.cast("bigint").alias("_bruto"),
        )
        .select(
            "proveedor",
            "cliente",
            "anio",
            "lineas",
            F.expr("_bruto div 1000").cast("bigint").alias("ingreso_centavos"),
        )
    )


# --------------------------------------------------------------------------
# Market share — the TPC-H-Q8-shaped share-of-total window
# --------------------------------------------------------------------------

_MERCADO_ORACLE = """
WITH ventas AS (
    SELECT r.r_name AS region, ns.n_name AS nacion,
           CAST(CASE WHEN epoch_us(o.o_orderdate) < 820454400000000
                     THEN 1995 ELSE 1996 END AS BIGINT) AS anio,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                    * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
                // 1000 AS BIGINT) AS ingreso
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN region r   ON ns.n_regionkey = r.r_regionkey
    WHERE epoch_us(o.o_orderdate) >= 788918400000000
      AND epoch_us(o.o_orderdate) < 852076800000000
    GROUP BY 1, 2, 3
)
SELECT region, nacion, anio, ingreso,
       CAST((1000 * ingreso)
            // sum(ingreso) OVER (PARTITION BY region, anio) AS BIGINT)
           AS cuota_mili
FROM ventas
"""


@register("mercado_participacion", oracle=_MERCADO_ORACLE,
          ops=("J1", "A1", "W1", "P3"), driver=False)
def mercado_participacion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-SHAPED MARKET SHARE: each supplier nation's floor-milli
    share of its REGION's revenue per year — the share-of-total pattern
    (an aggregate re-read by a window over its own output) Q5/Q7's
    plain roll-ups never exercise. The window partitions the
    ALREADY-AGGREGATED frame (regions × nations × 2 rows), so the
    share step is free at any corpus size; the fact-side plan is
    comercio_bilateral's (broadcast snowflake dims, pushed two-year
    window, exact centavos × milli-discount revenue). Integer
    floor-milli shares sum to ≤ 1000 per (region, year) — the
    release-audit property a reader can check by eye."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    lim95 = ts_lit_for(orders, "o_orderdate", "1995-01-01 00:00:00")
    lim96 = ts_lit_for(orders, "o_orderdate", "1996-01-01 00:00:00")
    lim97 = ts_lit_for(orders, "o_orderdate", "1997-01-01 00:00:00")
    o = orders.where(
        (F.col("o_orderdate") >= lim95) & (F.col("o_orderdate") < lim97)
    )
    ns = nation.select(
        "n_nationkey", F.col("n_name").alias("nacion"), "n_regionkey"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    ingreso_b = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    ventas = (
        joined.groupBy(
            F.col("r_name").alias("region"),
            "nacion",
            F.when(F.col("o_orderdate") < lim96, 1995)
            .otherwise(1996)
            .cast("bigint")
            .alias("anio"),
        )
        .agg(ingreso_b.cast("bigint").alias("_bruto"))
        .select(
            "region", "nacion", "anio",
            F.expr("_bruto div 1000").cast("bigint").alias("ingreso"),
        )
    )
    w = Window.partitionBy("region", "anio")
    return ventas.withColumn(
        "_tot", F.sum("ingreso").over(w)
    ).select(
        "region",
        "nacion",
        "anio",
        "ingreso",
        F.expr("(1000 * ingreso) div _tot").cast("bigint").alias("cuota_mili"),
    )


# --------------------------------------------------------------------------
# Shipping-delay distribution — the order-to-ship SLA percentiles
# --------------------------------------------------------------------------

_RETRASO_ORACLE = """
WITH demoras AS (
    SELECT o.o_orderpriority,
           epoch_us(l.l_shipdate) // 86400000000
             - epoch_us(o.o_orderdate) // 86400000000 AS dias
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS lineas,
       CAST(floor(2 * quantile_cont(dias, 0.5) + 0.5) AS BIGINT)
           AS mediana2_dias,
       CAST(floor(20 * quantile_cont(dias, 0.95) + 0.5) AS BIGINT)
           AS p95_20_dias,
       CAST(max(dias) AS BIGINT) AS max_dias
FROM demoras
GROUP BY 1
"""


@register("retraso_envios", oracle=_RETRASO_ORACLE, ops=("J1", "A3"),
          driver=False)
def retraso_envios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-TO-SHIP DELAY SLA per priority class: day-grain lag between
    order and line shipment, reported as SCALED exact quantiles —
    2×median and 20×p95: the type-7 interpolation weight at q = 19/20
    steps in twentieths, so the scaled value is an integer by
    construction and a half-ulp round guard absorbs float noise before
    the cast (the bare doubled p95 differed by one ulp between engines
    — caught by the oracle) — plus the worst case. The
    operational question — does URGENT actually ship faster, and is the
    tail under control — answered engine-identically.

    Shape: one orderkey equi join (fact-fact, the only shuffle), day
    lag as pure epoch-day arithmetic (tz-proof), exact per-priority
    quantiles over 5 calendar-bounded groups with approx_percentile as
    the named swap."""
    from etl_python_airflow_bigquery_spark.functions import micros

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # integer day indices: subtract the day remainder first so the final
    # division is exact (no float-boundary risk at large epochs)
    dia = lambda c: (  # noqa: E731
        (micros(c) - micros(c) % 86_400_000_000) / 86_400_000_000
    ).cast("bigint")
    demoras = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        (dia("l_shipdate") - dia("o_orderdate")).alias("dias"),
    )
    return demoras.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("lineas"),
        F.expr(
            "CAST(floor(2 * percentile(dias, 0.5D) + 0.5D) AS BIGINT)"
        ).alias("mediana2_dias"),
        F.expr(
            "CAST(floor(20 * percentile(dias, 0.95D) + 0.5D) AS BIGINT)"
        ).alias("p95_20_dias"),
        F.max("dias").cast("bigint").alias("max_dias"),
    )


# --------------------------------------------------------------------------
# Attribution-window funnel — conversion only counts within W of the
# previous stage (the time-bounded class funnel_ordenado doesn't impose)
# --------------------------------------------------------------------------

_VENTANA_FUNNEL_US = 30 * 60 * 1_000_000  # 30-minute attribution window

_FUNNEL_VENTANA_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_type AS tipo, epoch_us(ts) AS t FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
),
v AS (SELECT DISTINCT user_id FROM ev WHERE tipo = 'view'),
c2 AS (
    SELECT DISTINCT c.user_id
    FROM ev c JOIN ev v ON v.user_id = c.user_id
    WHERE c.tipo = 'click' AND v.tipo = 'view'
      AND v.t < c.t AND c.t - v.t <= {_VENTANA_FUNNEL_US}
),
c3 AS (
    SELECT DISTINCT p.user_id
    FROM ev p
    JOIN ev c ON c.user_id = p.user_id
    JOIN ev v ON v.user_id = p.user_id
    WHERE p.tipo = 'purchase' AND c.tipo = 'click' AND v.tipo = 'view'
      AND v.t < c.t AND c.t - v.t <= {_VENTANA_FUNNEL_US}
      AND c.t < p.t AND p.t - c.t <= {_VENTANA_FUNNEL_US}
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS usuarios_vista,
       CAST((SELECT count(*) FROM c2) AS BIGINT) AS usuarios_click_30m,
       CAST((SELECT count(*) FROM c3) AS BIGINT) AS usuarios_compra_30m,
       CAST((1000 * (SELECT count(*) FROM c2))
            // greatest((SELECT count(*) FROM v), 1) AS BIGINT)
           AS conv_click_milli,
       CAST((1000 * (SELECT count(*) FROM c3))
            // greatest((SELECT count(*) FROM c2), 1) AS BIGINT)
           AS conv_compra_milli
"""


def _funnel_ventana_fold(w_us: int):
    """The windowed-chain reachability fold over a sorted (t, tipo)
    event array. Stage-2 state is TWO-LEVEL — the latest reachable
    click l2a AND the latest reachable click strictly below it, l2b —
    because the window's two bounds pull opposite ways: the lower bound
    (c ≥ t−W) favors the LATEST reachable click, but the strict upper
    bound (c < t) can disqualify exactly that one when it shares the
    purchase's timestamp, while an earlier reachable click still
    qualifies. The hypothesis suite found the counterexample (view@0,
    click@1, click@2, purchase@2) against the single-level form; with
    both levels, the max reachable click strictly below t is always at
    hand, which is exact for existence. l1 needs no second level: the
    sort order puts a view after any same-timestamp click, so l1 < t
    holds at every click evaluation. Factored so the property test
    (tests/test_funnel_property.py) drives the SAME expression against
    brute force."""
    return F.expr(
        "aggregate(evs, "
        "struct(CAST(NULL AS BIGINT) AS l1, CAST(NULL AS BIGINT) AS l2a, "
        "CAST(NULL AS BIGINT) AS l2b, CAST(NULL AS BIGINT) AS l3), "
        "(acc, e) -> CASE "
        "WHEN e.tipo = 'view' THEN "
        "  struct(e.t AS l1, acc.l2a AS l2a, acc.l2b AS l2b, acc.l3 AS l3) "
        f"WHEN e.tipo = 'click' AND acc.l1 IS NOT NULL AND e.t > acc.l1 "
        f"  AND e.t - acc.l1 <= {w_us} "
        "  AND (acc.l2a IS NULL OR e.t > acc.l2a) THEN "
        "  struct(acc.l1 AS l1, e.t AS l2a, acc.l2a AS l2b, acc.l3 AS l3) "
        f"WHEN e.tipo = 'purchase' AND acc.l3 IS NULL AND ("
        f"  (acc.l2a IS NOT NULL AND e.t > acc.l2a"
        f"   AND e.t - acc.l2a <= {w_us}) OR "
        f"  (acc.l2b IS NOT NULL AND e.t > acc.l2b"
        f"   AND e.t - acc.l2b <= {w_us})) THEN "
        "  struct(acc.l1 AS l1, acc.l2a AS l2a, acc.l2b AS l2b, e.t AS l3) "
        "ELSE acc END)"
    )


@register("funnel_ventana", oracle=_FUNNEL_VENTANA_ORACLE,
          ops=("A8", "W1", "J9"), driver=False)
def funnel_ventana(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTRIBUTION-WINDOW funnel: view → click within 30 min → purchase
    within 30 min of a REACHABLE click — the time-bounded conversion
    class (strict order alone, funnel_ordenado, lets a Tuesday view
    convert a Friday click; ad attribution doesn't).

    Spark-first: one groupBy(user) collecting the sorted event array,
    then a single fold tracking the LATEST reachable completion per
    stage — exact for windowed chain existence because any qualifying
    predecessor in [t−W, t) implies the latest one also qualifies (it
    is ≥ the qualifier and < t). The oracle is the literal existence
    form (per-user windowed joins), so the fold's optimality argument
    is itself oracle-checked. One shuffle + one map pass at any scale;
    the per-user join blowup the oracle pays never happens Spark-side."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        F.col("event_type").alias("tipo"),
        event_ts_us(events).alias("t"),
    ).where(F.col("tipo").isin("view", "click", "purchase"))
    por_usuario = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "tipo"))).alias("evs")
    )
    fold = _funnel_ventana_fold(_VENTANA_FUNNEL_US)
    est = por_usuario.select(
        fold.alias("s"),
        F.exists("evs", lambda e: e["tipo"] == F.lit("view")).alias("vio"),
    )
    return est.agg(
        F.sum(F.when(F.col("vio"), 1).otherwise(0))
        .cast("bigint")
        .alias("usuarios_vista"),
        F.sum(F.when(F.col("s.l2a").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("usuarios_click_30m"),
        F.sum(F.when(F.col("s.l3").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("usuarios_compra_30m"),
        F.expr(
            "CAST((1000 * sum(CASE WHEN s.l2a IS NOT NULL THEN 1 ELSE 0 END))"
            " div greatest(sum(CASE WHEN vio THEN 1 ELSE 0 END), 1)"
            " AS BIGINT)"
        ).alias("conv_click_milli"),
        F.expr(
            "CAST((1000 * sum(CASE WHEN s.l3 IS NOT NULL THEN 1 ELSE 0 END))"
            " div greatest(sum(CASE WHEN s.l2a IS NOT NULL THEN 1 ELSE 0 END),"
            " 1) AS BIGINT)"
        ).alias("conv_compra_milli"),
    )


# --------------------------------------------------------------------------
# Q21-shaped sole-blame audit — EXISTS/NOT-EXISTS depth as one aggregation
# --------------------------------------------------------------------------

_MOROSOS_LATE_US = 90 * 86_400_000_000  # the 90-day lateness horizon

_MOROSOS_ORACLE = f"""
WITH lineas AS (
    SELECT l.l_orderkey, l.l_suppkey,
           CASE WHEN epoch_us(l.l_shipdate)
                     >= epoch_us(o.o_orderdate) + {_MOROSOS_LATE_US}
                THEN 1 ELSE 0 END AS tarde
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
),
por_orden AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_prov,
           count(DISTINCT CASE WHEN tarde = 1 THEN l_suppkey END) AS n_tarde
    FROM lineas GROUP BY 1
),
culpables AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineas l JOIN por_orden p USING (l_orderkey)
    WHERE l.tarde = 1 AND p.n_prov >= 2 AND p.n_tarde = 1
)
SELECT s.s_name AS proveedor, n.n_name AS nacion,
       CAST(count(*) AS BIGINT) AS pedidos_morosos
FROM culpables c
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


@register("proveedores_morosos", oracle=_MOROSOS_ORACLE,
          ops=("J8", "J7", "A2", "A8"), bench=True, driver=True)
def proveedores_morosos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-SHAPED sole-blame audit: suppliers who were the ONLY
    late shipper on a finished multi-supplier order (late = shipped ≥ 90
    days after the order date; the fixture has no commit/receipt dates,
    so the order date anchors lateness). Q21's correlated
    EXISTS (another supplier on the order) / NOT EXISTS (another LATE
    supplier) pair is rewritten as ONE per-order aggregation — distinct
    suppliers and distinct LATE suppliers per order — which is the
    Spark-first physical shape: the naive double self-join of lineitem
    against itself scans the fact three times and shuffles it twice,
    where the aggregate form pays one orderkey shuffle and a broadcast
    of nothing (the per-order frame joins back on the same key, so AQE
    plans it shuffle-free on the co-partitioned side). Lateness is pure
    epoch-µs integer arithmetic (micros(), tz-proof).
    Reference scope: the multi-level anti/semi cohort chains of
    Bigquery_to_csv_2.ipynb generalized to the correlated-blame shape."""
    from etl_python_airflow_bigquery_spark.functions import micros

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lineas = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                micros("l_shipdate")
                >= micros("o_orderdate") + F.lit(_MOROSOS_LATE_US)
            ).alias("tarde"),
        )
        .localCheckpoint(eager=False)  # feeds the per-order agg AND the blame side
    )
    por_orden = lineas.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_prov"),
        F.countDistinct(
            F.when(F.col("tarde"), F.col("l_suppkey"))
        ).alias("n_tarde"),
    )
    culpables = (
        lineas.where(F.col("tarde"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            por_orden.where(
                (F.col("n_prov") >= 2) & (F.col("n_tarde") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    return (
        culpables.join(
            F.broadcast(supplier), culpables.l_suppkey == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("s_name").alias("proveedor"), F.col("n_name").alias("nacion")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pedidos_morosos"))
    )


# --------------------------------------------------------------------------
# Q20-shaped dominant-supplier audit — aggregate-threshold semi join
# --------------------------------------------------------------------------

_EXCEDENTE_ORACLE = """
WITH por_ps AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(floor(l_quantity) AS BIGINT)) AS qty_ps
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= 788918400000000
      AND epoch_us(l_shipdate) < 820454400000000
    GROUP BY 1, 2
),
por_p AS (
    SELECT l_partkey, sum(qty_ps) AS qty_total,
           count(*) AS n_prov
    FROM por_ps GROUP BY 1
)
SELECT s.s_name AS proveedor, n.n_name AS nacion,
       CAST(count(*) AS BIGINT) AS partes_dominadas,
       CAST(sum(ps.qty_ps) AS BIGINT) AS unidades
FROM por_ps ps
JOIN por_p p ON p.l_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.n_prov >= 2 AND 2 * ps.qty_ps > p.qty_total
GROUP BY 1, 2
"""


@register("stock_excedente", oracle=_EXCEDENTE_ORACLE,
          ops=("J8", "A1", "P3"), driver=False)
def stock_excedente(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-SHAPED aggregate-threshold audit: suppliers who shipped
    the MAJORITY of a contested part's 1995 volume (strictly more than
    half of a part shipped by ≥ 2 suppliers — Q20's 'more than half the
    stock' correlated subquery, re-anchored on shipped quantity since
    the fixture carries no partsupp). The correlated IN (SELECT ... >
    0.5 * agg) becomes two stacked aggregations joined on partkey — the
    second aggregate REUSES the first's (partkey) partitioning, so
    Catalyst plans the threshold join without a new Exchange on the
    already-partitioned side. Quantities floor to integer units (the
    fixture ships integral doubles), keeping both engines bit-equal.
    Window pushed into the scan: epoch_us(1995-01-01) = 788918400000000,
    epoch_us(1996-01-01) = 820454400000000."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ventana = li.where(
        (F.col("l_shipdate") >= ts_lit_for(li, "l_shipdate", "1995-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit_for(li, "l_shipdate", "1996-01-01 00:00:00"))
    )
    por_ps = ventana.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_ps")
    )
    por_p = por_ps.groupBy("l_partkey").agg(
        F.sum("qty_ps").alias("qty_total"),
        F.count(F.lit(1)).alias("n_prov"),
    )
    dominantes = por_ps.join(por_p, "l_partkey").where(
        (F.col("n_prov") >= 2) & (2 * F.col("qty_ps") > F.col("qty_total"))
    )
    return (
        dominantes.join(
            F.broadcast(supplier), dominantes.l_suppkey == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("s_name").alias("proveedor"), F.col("n_name").alias("nacion")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("partes_dominadas"),
            F.sum("qty_ps").cast("bigint").alias("unidades"),
        )
    )


# --------------------------------------------------------------------------
# Q22-shaped dormant-capital audit — cleared-fraction scalar + anti join
# --------------------------------------------------------------------------

_SIN_CONTACTO_ORACLE = """
WITH saldos AS (
    SELECT c_custkey, c_nationkey,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS saldo_cent
    FROM customer
),
umbral AS (
    SELECT sum(saldo_cent) AS suma_pos, count(*) AS n_pos
    FROM saldos WHERE saldo_cent > 0
),
ricos AS (
    SELECT s.c_custkey, s.c_nationkey, s.saldo_cent
    FROM saldos s, umbral u
    WHERE s.saldo_cent * u.n_pos > u.suma_pos
),
dormidos AS (
    SELECT r.* FROM ricos r
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = r.c_custkey
                        AND epoch_us(o.o_orderdate) >= 915148800000000)
)
SELECT n.n_name AS nacion,
       CAST(count(*) AS BIGINT) AS clientes,
       CAST(sum(d.saldo_cent) AS BIGINT) AS saldo_centavos
FROM dormidos d JOIN nation n ON n.n_nationkey = d.c_nationkey
GROUP BY 1
"""


@register("clientes_sin_contacto", oracle=_SIN_CONTACTO_ORACLE,
          ops=("J7", "A6", "A1"), driver=False)
def clientes_sin_contacto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-SHAPED dormant-capital audit: customers whose balance
    beats the average POSITIVE balance yet placed no order since
    1999-01-01 — per nation, how many and how much capital sits dormant
    (the fixture has no phone column, so nation stands in for Q22's
    country code, and every synthetic customer has SOME order, so
    Q22's 'never ordered' becomes the operationally-identical recency
    window; epoch_us(1999-01-01) = 915148800000000). The scalar
    subquery is the cleared-fraction integer comparison
    (saldo · n_pos > Σ_pos — comparing against the mean WITHOUT a
    division, so both engines agree to the centavo); the NOT EXISTS is
    a left-anti join against the date-pruned orders scan, which at
    scale is the cheap side: the anti join runs on the
    already-thresholded rich-customer subset, not the full customer
    table. The 1-row threshold attaches via a broadcast cross join —
    the global-scalar idiom (A6)."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    saldos = customer.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("saldo_cent"),
    )
    umbral = saldos.where(F.col("saldo_cent") > 0).agg(
        F.sum("saldo_cent").alias("suma_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    ricos = saldos.crossJoin(F.broadcast(umbral)).where(
        F.col("saldo_cent") * F.col("n_pos") > F.col("suma_pos")
    )
    recientes = orders.where(
        F.col("o_orderdate")
        >= ts_lit_for(orders, "o_orderdate", "1999-01-01 00:00:00")
    ).select(F.col("o_custkey").alias("c_custkey"))
    dormidos = ricos.join(recientes, "c_custkey", "left_anti")
    return (
        dormidos.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("nacion"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("clientes"),
            F.sum("saldo_cent").cast("bigint").alias("saldo_centavos"),
        )
    )


# --------------------------------------------------------------------------
# Q4-shaped priority audit — correlated EXISTS as a semi join
# --------------------------------------------------------------------------

_PRIORIDAD_ORACLE = """
SELECT o.o_orderpriority AS prioridad,
       CAST(count(*) AS BIGINT) AS pedidos
FROM orders o
WHERE epoch_us(o.o_orderdate) >= 788918400000000
  AND epoch_us(o.o_orderdate) < 796694400000000
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate)
                    > epoch_us(o.o_orderdate) + 2592000000000)
GROUP BY 1
"""


@register("prioridad_pedidos", oracle=_PRIORIDAD_ORACLE,
          ops=("J8", "P3", "A1"), driver=False)
def prioridad_pedidos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-SHAPED order-priority audit: per priority class, how
    many 1995-Q1 orders had at least one line shipped more than 30 days
    after ordering (the fixture's lateness anchor, as in
    proveedores_morosos). Q4's correlated EXISTS is a LEFT SEMI join —
    but the correlation touches BOTH tables (l_shipdate vs o_orderdate),
    so the semi join's probe side is the pre-joined late-line key set:
    the quarter window prunes the orders scan first, lineitem joins
    only surviving keys, and the distinct late-order keys semi-join
    back. epoch anchors: 1995-01-01 = 788918400000000, 1995-04-01 =
    796694400000000, 30 days = 2592000000000 µs."""
    from etl_python_airflow_bigquery_spark.functions import micros, ts_lit_for

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= ts_lit_for(orders, "o_orderdate", "1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit_for(orders, "o_orderdate", "1995-04-01 00:00:00"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    tardias = (
        li.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            micros("l_shipdate")
            > micros("o_orderdate") + F.lit(30 * 86_400_000_000)
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        o.join(tardias, o.o_orderkey == tardias.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("prioridad"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pedidos"))
    )


# --------------------------------------------------------------------------
# Q15-shaped star supplier — window revenue + global-max equality (ties kept)
# --------------------------------------------------------------------------

_ESTRELLA_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
               * (1000 - CAST(floor(l_discount * 1000) AS BIGINT))) AS bruto
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= 788918400000000
      AND epoch_us(l_shipdate) < 804556800000000
    GROUP BY 1
)
SELECT s.s_name AS proveedor, n.n_name AS nacion,
       CAST(r.bruto // 1000 AS BIGINT) AS ingreso_centavos
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE r.bruto = (SELECT max(bruto) FROM rev)
"""


@register("proveedor_estrella", oracle=_ESTRELLA_ORACLE,
          ops=("A6", "A1", "P3"), driver=False)
def proveedor_estrella(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-SHAPED top supplier: the supplier(s) with maximum
    revenue in 1995-H1 — Q15's CREATE VIEW + scalar-max + equality
    join, which unlike a LIMIT 1 KEEPS TIES (the correctness detail
    Q15 exists to test). The revenue aggregate computes once and feeds
    both the global max (1-row broadcast) and the equality filter —
    localCheckpoint pins the single materialization, the exact pattern
    a production 'top partner this quarter' report runs. Integer
    centavos × milli-discount revenue (the comercio_bilateral
    discipline). epoch anchors: 1995-01-01 = 788918400000000,
    1995-07-01 = 804556800000000."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.where(
            (F.col("l_shipdate") >= ts_lit_for(li, "l_shipdate", "1995-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts_lit_for(li, "l_shipdate", "1995-07-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
                * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
            ).alias("bruto")
        )
        .localCheckpoint(eager=False)  # one materialization, two consumers
    )
    tope = rev.agg(F.max("bruto").alias("tope"))
    return (
        rev.crossJoin(F.broadcast(tope))
        .where(F.col("bruto") == F.col("tope"))
        .join(F.broadcast(supplier), rev.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("proveedor"),
            F.col("n_name").alias("nacion"),
            F.expr("bruto div 1000").cast("bigint").alias("ingreso_centavos"),
        )
    )


# --------------------------------------------------------------------------
# Q17-shaped fractional-demand audit — cleared-fraction correlated filter
# --------------------------------------------------------------------------

_FRACCIONADA_ORACLE = """
WITH pa AS (
    SELECT l_partkey,
           sum(CAST(floor(l_quantity) AS BIGINT)) AS sq,
           count(*) AS n
    FROM lineitem GROUP BY 1
)
SELECT p.p_brand AS marca,
       CAST(count(*) AS BIGINT) AS lineas_fraccionadas,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS importe_centavos
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * CAST(floor(l.l_quantity) AS BIGINT) * pa.n < pa.sq
GROUP BY 1
"""


@register("demanda_fraccionada", oracle=_FRACCIONADA_ORACLE,
          ops=("A6", "A1", "J1"), driver=False)
def demanda_fraccionada(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-SHAPED small-order audit: lines whose quantity is
    under 20% of their part's average order quantity — the correlated
    scalar subquery (0.2 * avg(l_quantity) per part) CLEARED to integers
    (5·qty·n < Σqty — no division, so both engines agree exactly),
    reported per brand with the money those fractional lines carry.
    The per-part aggregate joins back on partkey — the stacked-agg
    partitioning-reuse shape of stock_excedente — and the brand dim
    broadcasts. This is Q17's 'should we stop selling in small lots'
    decision readout generalized from one brand+container literal to
    the full brand table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.floor("l_quantity").cast("bigint")).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(pa, "l_partkey")
        .where(
            5 * F.floor("l_quantity").cast("bigint") * F.col("n") < F.col("sq")
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("marca"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("lineas_fraccionadas"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("importe_centavos"),
        )
    )


# --------------------------------------------------------------------------
# Q18-shaped volume customers — HAVING over a grouped join
# --------------------------------------------------------------------------

_VOLUMEN_ORACLE = """
WITH grandes AS (
    SELECT l_orderkey,
           sum(CAST(floor(l_quantity) AS BIGINT)) AS cantidad_total
    FROM lineitem GROUP BY 1
    HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 200
)
SELECT c.c_name AS cliente,
       o.o_orderkey AS pedido,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS fecha_us,
       CAST(g.cantidad_total AS BIGINT) AS cantidad_total
FROM grandes g
JOIN orders o ON o.o_orderkey = g.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("clientes_volumen", oracle=_VOLUMEN_ORACLE,
          ops=("A1", "J1", "O1"), driver=False)
def clientes_volumen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-SHAPED large-volume orders: orders whose total quantity
    exceeds 200 units, with their customer — Q18's HAVING-over-a-join
    shape. The aggregate runs FIRST (lineitem groups to orderkey before
    any join, so the join probe side is only the surviving big orders —
    the order every optimizer wants but a naive join-then-having SQL
    denies it), then orders and customer attach by key. Order dates
    surface as epoch-µs integers (tz-proof, the engine-wide timestamp
    egress rule)."""
    from etl_python_airflow_bigquery_spark.functions import micros

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    grandes = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("cantidad_total"))
        .where(F.col("cantidad_total") > 200)
    )
    return (
        grandes.join(orders, grandes.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("cliente"),
            F.col("o_orderkey").alias("pedido"),
            micros("o_orderdate").cast("bigint").alias("fecha_us"),
            F.col("cantidad_total").cast("bigint").alias("cantidad_total"),
        )
    )


# --------------------------------------------------------------------------
# Q13-shaped engagement histogram — left join + count-of-counts
# --------------------------------------------------------------------------

_DISTRIBUCION_ORACLE = """
WITH cc AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS pedidos
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                       AND o.o_orderpriority != '1-URGENT'
    GROUP BY 1
)
SELECT CAST(pedidos AS BIGINT) AS pedidos,
       CAST(count(*) AS BIGINT) AS clientes
FROM cc GROUP BY 1
"""


@register("distribucion_pedidos", oracle=_DISTRIBUCION_ORACLE,
          ops=("J2", "A1", "A2"), driver=False)
def distribucion_pedidos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-SHAPED engagement histogram: how many customers placed
    exactly N qualifying orders — INCLUDING the zero bucket, which is
    the whole reason Q13 exists: an inner join silently drops the
    never-ordered customers, so the count must come from a LEFT join
    with the order predicate IN THE JOIN CONDITION (pushed to WHERE it
    would turn the left join back into an inner one — the classic
    outer-join-filter trap, here exercised deliberately). count(col)
    over the null-extended side yields the correct 0. Two stacked
    aggregations: per-customer counts, then the count-of-counts —
    both map-side combinable, output bounded by max orders/customer."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    cc = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("pedidos"))
    )
    return cc.groupBy(F.col("pedidos").cast("bigint").alias("pedidos")).agg(
        F.count(F.lit(1)).cast("bigint").alias("clientes")
    )


# --------------------------------------------------------------------------
# Q16-shaped supplier-variety audit — distinct count behind an anti join
# --------------------------------------------------------------------------

_VARIEDAD_ORACLE = """
WITH excluidos AS (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p.p_brand AS marca,
       CAST(p.p_size % 5 AS BIGINT) AS banda_tamano,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS proveedores
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excluidos)
GROUP BY 1, 2
"""


@register("variedad_proveedores", oracle=_VARIEDAD_ORACLE,
          ops=("J7", "A2", "J1"), driver=False)
def variedad_proveedores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-SHAPED supplier-variety audit: distinct suppliers able
    to serve each (brand, size-band), EXCLUDING flagged suppliers —
    Q16's NOT IN complaint-subquery shape (here the negative-balance
    flag stands in for the complaint scan). The NOT IN is a left-anti
    join against the tiny flagged set (broadcast — the fact side never
    shuffles for the exclusion); the part dim broadcasts; the only
    shuffle is the final distinct-count aggregate on the
    (brand, band) key. At 100 TB the anti join's broadcast side is the
    flagged-supplier list — naturally small — and the distinct count
    is the one genuine exchange, exactly where it belongs."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    excluidos = supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluidos), "l_suppkey", "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("marca"),
            (F.col("p_size") % 5).cast("bigint").alias("banda_tamano"),
        )
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("proveedores"))
    )


# --------------------------------------------------------------------------
# Round-11 relational depth: Q3 / Q10 / Q14 / Q19 shapes
# --------------------------------------------------------------------------
# Epoch anchors (UTC dates, integer day arithmetic — no tz dependence):
# 1996-06-01 = 833587200000000 µs, 1996-01-01 = 820454400000000,
# 1996-04-01 = 828316800000000, 1996-09-01 = 841536000000000,
# 1996-10-01 = 844128000000000.

_PRIORIDAD_ENVIO_ORACLE = """
WITH rev AS (
    SELECT l.l_orderkey,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                    * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
                // 1000 AS BIGINT) AS ingreso_centavos,
           CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
               AS dia_pedido,
           o.o_orderpriority AS prioridad
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND epoch_us(o.o_orderdate) < 833587200000000
      AND epoch_us(l.l_shipdate) > 833587200000000
    GROUP BY 1, 3, 4
)
SELECT l_orderkey, ingreso_centavos, dia_pedido, prioridad
FROM (
    SELECT *, row_number() OVER (
        ORDER BY ingreso_centavos DESC, l_orderkey) AS rn
    FROM rev
) WHERE rn <= 10
"""


@register("prioridad_envio", oracle=_PRIORIDAD_ENVIO_ORACLE,
          ops=("J1", "O7", "P3"), driver=False)
def prioridad_envio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-SHAPED shipping priority: the top-10 unshipped BUILDING
    orders by outstanding revenue as of a cut date — orders placed
    before it, line items shipping after it, so BOTH date predicates
    push into their own fact scans (P3 on two tables at once, the shape
    Q1's single-sided filter never exercises). Revenue follows the
    comercio_bilateral exact-integer discipline (centavos ×
    milli-discount, one final floor-div), so the top-k ordering is
    integer-deterministic cross-engine. Plan: customer broadcasts into
    orders, the order→lineitem join is the one fact shuffle, top-10 via
    orderBy+limit → TakeOrderedAndProject over the ≤|orders| aggregated
    rows (never a single-task window sort — VERDICT r11)."""
    from etl_python_airflow_bigquery_spark.functions import micros, ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    corte_o = ts_lit_for(orders, "o_orderdate", "1996-06-01 00:00:00")
    corte_l = ts_lit_for(li, "l_shipdate", "1996-06-01 00:00:00")
    base = (
        li.where(F.col("l_shipdate") > corte_l)
        .join(
            orders.where(F.col("o_orderdate") < corte_o),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    bruto = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    return (
        base.groupBy(
            "l_orderkey",
            F.floor(micros("o_orderdate") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("dia_pedido"),
            F.col("o_orderpriority").alias("prioridad"),
        )
        .agg(bruto.cast("bigint").alias("_bruto"))
        .select(
            "l_orderkey",
            F.expr("_bruto div 1000").cast("bigint").alias("ingreso_centavos"),
            "dia_pedido",
            "prioridad",
        )
        # top-10 via TakeOrderedAndProject (per-partition heap + k-row
        # driver merge), never an unpartitioned window's single-task
        # sort of the order-grain rows (VERDICT r11)
        .orderBy(F.desc("ingreso_centavos"), "l_orderkey")
        .limit(10)
    )


_DEVOLUCIONES_ORACLE = """
WITH rev AS (
    SELECT c.c_custkey, c.c_name, n.n_name AS nacion,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                    * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
                // 1000 AS BIGINT) AS ingreso_centavos,
           CAST(count(*) AS BIGINT) AS lineas_devueltas
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND epoch_us(o.o_orderdate) >= 820454400000000
      AND epoch_us(o.o_orderdate) < 828316800000000
    GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, nacion, ingreso_centavos, lineas_devueltas
FROM (
    SELECT *, row_number() OVER (
        ORDER BY ingreso_centavos DESC, c_custkey) AS rn
    FROM rev
) WHERE rn <= 20
"""


@register("clientes_devoluciones", oracle=_DEVOLUCIONES_ORACLE,
          ops=("J1", "A1", "O7", "P3"), driver=False)
def clientes_devoluciones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-SHAPED returned-item report: the 20 customers who
    returned the most revenue in a quarter, with their nation — the
    4-table chain (fact → orders → customer → nation) whose selective
    predicates live on DIFFERENT tables (returnflag on the fact, the
    quarter on orders), so join reordering and both pushdowns matter at
    once. Exact-integer revenue (comercio_bilateral discipline); top-20
    by (revenue DESC, custkey) is integer-deterministic. Plan: the
    quarter-filtered orders side shuffles once against the
    returnflag-filtered fact; customer joins on the aggregated ≤
    |customers| rows; nation broadcasts."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    o = orders.where(
        (F.col("o_orderdate")
         >= ts_lit_for(orders, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate")
           < ts_lit_for(orders, "o_orderdate", "1996-04-01 00:00:00"))
    )
    bruto = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    por_cliente = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            bruto.cast("bigint").alias("_bruto"),
            F.count(F.lit(1)).cast("bigint").alias("lineas_devueltas"),
        )
    )
    return (
        por_cliente.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nacion"),
            F.expr("_bruto div 1000").cast("bigint").alias("ingreso_centavos"),
            "lineas_devueltas",
        )
        # top-20 via TakeOrderedAndProject, never an unpartitioned
        # window's single-task sort of the customer-grain rows
        # (VERDICT r11)
        .orderBy(F.desc("ingreso_centavos"), "c_custkey")
        .limit(20)
    )


_PROMOCIONAL_ORACLE = """
WITH base AS (
    SELECT CAST(floor(l.l_extendedprice * 100) AS BIGINT)
           * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)) AS bruto,
           CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS es_promo
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE epoch_us(l.l_shipdate) >= 841536000000000
      AND epoch_us(l.l_shipdate) < 844128000000000
)
SELECT CAST(sum(es_promo * bruto) // 1000 AS BIGINT) AS promo_centavos,
       CAST(sum(bruto) // 1000 AS BIGINT) AS total_centavos,
       CAST((1000 * sum(es_promo * bruto)) // sum(bruto) AS BIGINT)
           AS cuota_mili
FROM base
"""


@register("cuota_promocional", oracle=_PROMOCIONAL_ORACLE,
          ops=("A8", "A3", "J1", "P3"), driver=False)
def cuota_promocional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-SHAPED promotion share: the fraction of one month's
    shipped revenue that came from PROMO-typed parts — the conditional
    aggregation (A8) computed as one scan with a broadcast dimension
    join, and the share as a zero-safe integer floor-milli ratio (A3).
    Exact-integer revenue; everything reduces to one global row."""
    from etl_python_airflow_bigquery_spark.functions import ts_lit_for

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    mes = li.where(
        (F.col("l_shipdate")
         >= ts_lit_for(li, "l_shipdate", "1996-09-01 00:00:00"))
        & (F.col("l_shipdate")
           < ts_lit_for(li, "l_shipdate", "1996-10-01 00:00:00"))
    )
    bruto = (
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    base = mes.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        bruto.alias("bruto"),
        F.when(F.col("p_type") == "PROMO", F.lit(1))
        .otherwise(F.lit(0))
        .alias("es_promo"),
    )
    return base.agg(
        F.expr("sum(es_promo * bruto) div 1000")
        .cast("bigint")
        .alias("promo_centavos"),
        F.expr("sum(bruto) div 1000").cast("bigint").alias("total_centavos"),
        F.expr("(1000 * sum(es_promo * bruto)) div sum(bruto)")
        .cast("bigint")
        .alias("cuota_mili"),
    )


_BRACKETS_ORACLE = """
SELECT bracket,
       CAST(count(*) AS BIGINT) AS lineas,
       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
            // 1000 AS BIGINT) AS ingreso_centavos
FROM (
    SELECT l_extendedprice, l_discount,
           CASE
             WHEN p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
                  AND l.l_quantity BETWEEN 1 AND 11 THEN 'chico'
             WHEN p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
                  AND l.l_quantity BETWEEN 10 AND 20 THEN 'mediano'
             WHEN p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                  AND l.l_quantity BETWEEN 20 AND 30 THEN 'grande'
           END AS bracket
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
) l
WHERE bracket IS NOT NULL
GROUP BY 1
"""


@register("ingreso_brackets", oracle=_BRACKETS_ORACLE,
          ops=("J1", "A8", "P5"), driver=False)
def ingreso_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-SHAPED discounted revenue under an OR-of-conjuncts
    bracket predicate: three (brand, size range, quantity range)
    brackets whose conditions span BOTH join sides — the disjunctive
    multi-column filter class (P5's membership generalized to compound
    brackets) that exercises Catalyst's CNF conversion and partial
    pushdown (the part-side conjuncts can prune the dimension before
    the join even though the full predicate needs both sides).
    Per-bracket census instead of Q19's single scalar so every bracket
    is value-checked independently. Exact-integer revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    bracket = (
        F.when(
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11),
            F.lit("chico"),
        )
        .when(
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20),
            F.lit("mediano"),
        )
        .when(
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30),
            F.lit("grande"),
        )
    )
    bruto = F.sum(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        * (1000 - F.floor(F.col("l_discount") * 1000).cast("bigint"))
    )
    return (
        j.select("l_extendedprice", "l_discount", bracket.alias("bracket"))
        .where(F.col("bracket").isNotNull())
        .groupBy("bracket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("lineas"),
            bruto.cast("bigint").alias("_bruto"),
        )
        .select(
            "bracket",
            "lineas",
            F.expr("_bruto div 1000").cast("bigint").alias("ingreso_centavos"),
        )
    )


# --------------------------------------------------------------------------
# Q2-shaped regional minimum-cost offer — correlated MIN decorrelated
# --------------------------------------------------------------------------

_COSTO_MINIMO_ORACLE = """
WITH regional AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
), ofertas AS (
    SELECT l.l_partkey, rg.s_name, rg.s_acctbal,
           CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS precio_centavos,
           min(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
               OVER (PARTITION BY l.l_partkey) AS minimo
    FROM lineitem l JOIN regional rg ON rg.s_suppkey = l.l_suppkey
)
SELECT DISTINCT o.l_partkey AS parte, p.p_brand AS marca,
       o.s_name AS proveedor,
       CAST(floor(o.s_acctbal * 100) AS BIGINT) AS saldo_centavos,
       o.precio_centavos
FROM ofertas o JOIN part p ON p.p_partkey = o.l_partkey
WHERE o.precio_centavos = o.minimo
"""


@register("costo_minimo_regional", oracle=_COSTO_MINIMO_ORACLE,
          ops=("J1", "W1", "P10"), driver=True)
def costo_minimo_regional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-SHAPED minimum-cost offer: for every part, the EUROPE
    supplier(s) whose line price hits that part's regional minimum —
    Q2's correlated `price = (SELECT min(..) WHERE same part)`
    subquery. The decorrelation is the point: instead of re-scanning
    the fact per part (what the correlated form literally says), the
    per-part minimum is a window `min() OVER (PARTITION BY partkey)`
    on ONE scan — one hash-partition shuffle on the part key, then a
    same-row equality filter keeps the offers that achieve it (ties
    kept, Q2 semantics). The regional supplier set is a two-dim snow-
    flake (supplier⨝nation⨝region) collapsed driver-free and BROADCAST
    into the fact scan, so the fact never shuffles for the region
    filter; part attributes attach by broadcast after the minimum
    filter has already shrunk the rows. Prices and balances egress as
    centavos BIGINTs (the engine-wide exact-integer money rule).

    Reference parity: the warehouse-side min-cost lookups the DAGs
    push into BigQuery SQL (SURVEY §2.4 correlated-aggregate family).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    regional = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    ofertas = li.join(
        F.broadcast(regional), li.l_suppkey == F.col("s_suppkey")
    ).select(
        "l_partkey",
        "s_name",
        "s_acctbal",
        F.floor(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("precio_centavos"),
    )
    w = Window.partitionBy("l_partkey")
    minimas = ofertas.withColumn(
        "_minimo", F.min("precio_centavos").over(w)
    ).where(F.col("precio_centavos") == F.col("_minimo"))
    return (
        minimas.join(
            F.broadcast(part), minimas.l_partkey == part.p_partkey
        )
        .select(
            F.col("l_partkey").alias("parte"),
            F.col("p_brand").alias("marca"),
            F.col("s_name").alias("proveedor"),
            F.floor(F.col("s_acctbal") * 100)
            .cast("bigint")
            .alias("saldo_centavos"),
            "precio_centavos",
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Q9-shaped profit rollup — product-line profit by nation and year
# --------------------------------------------------------------------------

_BENEFICIO_ORACLE = """
SELECT n.n_name AS nacion,
       CAST(year(o.o_orderdate) AS BIGINT) AS anio,
       CAST(sum(
         (CAST(floor(l.l_extendedprice * 100) AS BIGINT)
           * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT))) // 1000
         - (CAST(floor(p.p_retailprice * 100) AS BIGINT)
           * CAST(floor(l.l_quantity) AS BIGINT)) // 2
       ) AS BIGINT) AS beneficio_centavos
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


@register("beneficio_por_nacion", oracle=_BENEFICIO_ORACLE,
          ops=("J1", "A1", "P8"), driver=False)
def beneficio_por_nacion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-SHAPED product-line profit: for the parts whose name
    matches a product family ('%widget%' — Q9's `LIKE '%green%'`),
    profit per supplier nation per order year, where profit =
    discounted revenue minus a quantity-scaled cost basis (the fixture
    has no partsupp, so half the part's retail price stands in for
    ps_supplycost — same arithmetic shape, exact-integer centavos ×
    milli-discount with one final floor-div each).

    Plan shape is what Q9 exists to test: the name-filtered part set
    and the supplier→nation map are SMALL and broadcast into the
    lineitem scan (the LIKE filter prunes ~1/8 of parts BEFORE any
    fact row moves), leaving exactly ONE big-big join — lineitem ⨝
    orders on the order key — as the only shuffle besides the final
    nation×year aggregate (25 nations × ~7 years: bounded output,
    map-side combinable). year() on the tz-naive order timestamp is
    tz-independent on both engines (the crecimiento_interanual
    precedent, hostile-tz validated)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    familia = part.where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    proveedor_nacion = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    ingreso = F.expr(
        "(cast(floor(l_extendedprice * 100) as bigint)"
        " * (1000 - cast(floor(l_discount * 1000) as bigint))) div 1000"
    )
    costo = F.expr(
        "(cast(floor(p_retailprice * 100) as bigint)"
        " * cast(floor(l_quantity) as bigint)) div 2"
    )
    return (
        li.join(F.broadcast(familia), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(proveedor_nacion),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nacion"),
            F.year("o_orderdate").cast("bigint").alias("anio"),
        )
        .agg(
            F.sum(ingreso - costo)
            .cast("bigint")
            .alias("beneficio_centavos")
        )
    )


# --------------------------------------------------------------------------
# Q11-shaped inventory concentration — group value vs a global-share bar
# --------------------------------------------------------------------------

_PARTICIPACION_ORACLE = """
WITH valores AS (
    SELECT l.l_partkey,
           CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS valor_centavos
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
), escala AS (
    SELECT sum(valor_centavos) AS total, count(*) AS grupos FROM valores
)
SELECT v.l_partkey AS parte, v.valor_centavos
FROM valores v, escala e
WHERE v.valor_centavos * e.grupos > 2 * e.total
"""


@register("participacion_inventario", oracle=_PARTICIPACION_ORACLE,
          ops=("A1", "A6", "J1"), driver=False)
def participacion_inventario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-SHAPED concentration screen: parts whose ASIA-supplied
    line value exceeds TWICE the average per-part share — Q11's
    `HAVING sum(..) > (SELECT sum(..) * fraction)` where the scalar
    threshold is an aggregate over the very relation being grouped.
    Q11's fixed fraction is scale-dependent (0.0001/SF in the spec);
    the share-of-average form keeps the screen meaningful at every SF
    without a tuning knob.

    The decorrelation: group ONCE (region-filtered fact → per-part
    value; the region filter rides a broadcast supplier snowflake so
    the fact shuffles only on the group key), then derive the global
    scalar by RE-AGGREGATING THE GROUPED RESULT — parts-sized, not
    fact-sized, so the 'subquery' costs one extra reduce over data
    already in hand — and broadcast the one-row threshold back as a
    cross join. The grouped frame is localCheckpoint-ed (the engine's
    corpus-stats idiom) so BOTH consumers — the scalar and the probe —
    read the materialized group-grain result instead of re-running the
    fact scan (static planning does not reuse the exchange across the
    two aggregates; the checkpoint makes single-scan a guarantee, not
    an AQE maybe). Integer cross-multiply (valor × grupos > 2 × total)
    replaces the fractional compare, so no float threshold ever
    exists on either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asiaticos = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    valores = (
        li.join(F.broadcast(asiaticos), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("valor_centavos")
        )
    ).localCheckpoint()
    escala = valores.agg(
        F.sum("valor_centavos").alias("_total"),
        F.count(F.lit(1)).alias("_grupos"),
    )
    return (
        valores.crossJoin(F.broadcast(escala))
        .where(
            F.col("valor_centavos") * F.col("_grupos")
            > F.lit(2) * F.col("_total")
        )
        .select(F.col("l_partkey").alias("parte"), "valor_centavos")
    )


# --------------------------------------------------------------------------
# Q6-shaped discount-revenue forecast — the pure pushdown scan
# --------------------------------------------------------------------------

_PRONOSTICO_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS lineas,
       CAST(sum((CAST(floor(l_extendedprice * 100) AS BIGINT)
                 * CAST(floor(l_discount * 1000) AS BIGINT)) // 1000)
            AS BIGINT) AS ingreso_extra_centavos
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND floor(l_discount * 1000) BETWEEN 50 AND 70
  AND l_quantity < 24
"""


@register("pronostico_descuento", oracle=_PRONOSTICO_ORACLE,
          ops=("P3", "A6", "P1"), driver=False)
def pronostico_descuento(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-SHAPED revenue-forecast scalar: how much revenue the
    mid-band discounts (5.0-7.0%) gave away on small 1996 shipments —
    Q6's join-free, group-free aggregate whose entire value is the SCAN
    SHAPE: every predicate (ship-date range, quantity cap) reaches the
    parquet reader as a pushed filter, the read schema is exactly the
    three touched columns, and the plan is one whole-stage-codegen map
    pass into a single-row partial-aggregable sum — the query every
    column store must execute at IO speed, here the pushdown floor the
    plan pin keeps honest at 100 TB. The discount band compares in
    exact milli-integers on both engines (floor(x*1000)), never a
    float epsilon."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_mili = F.floor(F.col("l_discount") * 1000).cast("bigint")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            # redundant FLOAT envelope of the exact milli band below:
            # a plain column range is the form the parquet reader can
            # take as a pushed filter + row-group stat prune; the
            # floor(x*1000) band itself is an expression no source can
            # push. Envelope ⊇ band, so semantics are the band's alone.
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & disc_mili.between(50, 70)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("lineas"),
            F.sum(
                F.expr(
                    "(cast(floor(l_extendedprice * 100) as bigint)"
                    " * cast(floor(l_discount * 1000) as bigint)) div 1000"
                )
            ).cast("bigint").alias("ingreso_extra_centavos"),
        )
    )
