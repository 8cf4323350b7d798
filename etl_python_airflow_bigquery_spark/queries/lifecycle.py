"""Event-lifecycle queries: JSON prop extraction and batch sessionization
(gaps-and-islands) — the batch twin of the streaming ``session_window``
rebuild in streaming/jobs.py (SURVEY.md §2.10: the reference's
``consumo_detalle`` rows ARE sessions; this operator reconstructs them
from raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    US_PER_MIN,
    event_day_num,
    event_ts_us,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

# --------------------------------------------------------------------------
# JSON property extraction (§2.8 JSON)
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS eventos,
       CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS k_total,
       CAST(max(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
"""


# driver=False: P2 stays driver-covered by scalar_census; this slot went
# to audiencia_dst (the DST-crossing query VERDICT r2 #8 asked for) to
# keep the driver surface at exactly 50. Still pytest-oracled.
@register("json_props", oracle=_JSON_ORACLE, ops=("P2",), driver=False)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` column via from_json with
    an explicit schema (never schema_of_json over the data — that's an
    extra scan at scale), then plain aggregation."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("eventos"),
        F.sum("p.k").cast("bigint").alias("k_total"),
        F.max("p.k").cast("bigint").alias("k_max"),
    )


# --------------------------------------------------------------------------
# Sessionization — gaps-and-islands (batch twin of session_window)
# --------------------------------------------------------------------------

_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH ev AS (
    SELECT user_id, epoch_us(ts) AS t_us
    FROM events
),
marcado AS (
    SELECT user_id, t_us,
           CASE WHEN t_us - lag(t_us, 1, t_us)
                         OVER (PARTITION BY user_id ORDER BY t_us)
                     > {_GAP_MIN * US_PER_MIN}
                THEN 1 ELSE 0 END AS nueva
    FROM ev
),
islas AS (
    SELECT user_id, t_us,
           sum(nueva) OVER (PARTITION BY user_id ORDER BY t_us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sesion
    FROM marcado
)
SELECT user_id, CAST(sesion AS BIGINT) AS sesion,
       CAST(min(t_us) AS BIGINT) AS inicio_us,
       CAST(max(t_us) AS BIGINT) AS fin_us,
       CAST(count(*) AS BIGINT) AS eventos
FROM islas
GROUP BY user_id, sesion
"""


@register("sessionization", oracle=_SESSION_ORACLE, ops=("W1", "A1"), bench=True,
          driver=False)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild playback sessions from raw events: a new session starts
    after a >30-min silence per user (gaps-and-islands: lag → flag →
    running sum). The per-user window partitions on user_id so the sort
    is local to each user's slice — one shuffle total. The streaming
    twin uses session_window with the same gap (streaming/jobs.py)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", event_ts_us(events).alias("t_us"))
    w = Window.partitionBy("user_id").orderBy("t_us")
    gap = _GAP_MIN * US_PER_MIN
    marcado = ev.withColumn(
        "nueva",
        F.when(
            F.col("t_us") - F.lag("t_us", 1, None).over(w) > gap, F.lit(1)
        )
        .when(F.lag("t_us", 1).over(w).isNull(), F.lit(0))
        .otherwise(F.lit(0)),
    )
    islas = marcado.withColumn(
        "sesion",
        F.sum("nueva").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islas.groupBy("user_id", F.col("sesion").cast("bigint").alias("sesion")).agg(
        F.min("t_us").cast("bigint").alias("inicio_us"),
        F.max("t_us").cast("bigint").alias("fin_us"),
        F.count(F.lit(1)).cast("bigint").alias("eventos"),
    )


# --------------------------------------------------------------------------
# SCD2 history build — attribute-change gaps-and-islands
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH obs AS (
    SELECT o_custkey AS custkey,
           o_orderpriority AS prioridad,
           CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dia,
           o_orderkey AS ok
    FROM orders
),
cambios AS (
    SELECT custkey, prioridad, dia, ok,
           lag(prioridad) OVER (PARTITION BY custkey ORDER BY dia, ok)
               AS prev
    FROM obs
),
versiones AS (
    SELECT custkey, prioridad, dia, ok
    FROM cambios WHERE prev IS NULL OR prioridad != prev
)
SELECT custkey, prioridad,
       CAST(dia AS BIGINT) AS valido_desde,
       CAST(lead(dia) OVER (PARTITION BY custkey ORDER BY dia, ok) AS BIGINT)
           AS valido_hasta
FROM versiones
"""


@register("scd2_historia", oracle=_SCD2_ORACLE, ops=("W1", "P9"), driver=True)
def scd2_historia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 HISTORY BUILD — the WRITE side of the validity-window
    pattern (`validity_window` is its read side; reference vigencia
    semantics, q_registrados_.py): each customer's order-priority
    observations collapse into versioned rows [valido_desde,
    valido_hasta) wherever the attribute CHANGED (gaps-and-islands on
    value changes, not time gaps — the complement of sessionization).
    valido_hasta is NULL on the current version. One window shuffle on
    the dimension key; days emitted as epoch-day integers so the result
    is immune to the date column's physical encoding and to session tz.
    Ties inside a day break deterministically on order key."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("prioridad"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("dia"),
        F.col("o_orderkey").alias("ok"),
    )
    w = Window.partitionBy("custkey").orderBy("dia", "ok")
    cambios = obs.withColumn("prev", F.lag("prioridad").over(w))
    versiones = cambios.where(
        F.col("prev").isNull() | (F.col("prioridad") != F.col("prev"))
    ).select("custkey", "prioridad", "dia", "ok")
    # same-day version pairs keep the order-key tiebreak, so the lead
    # window is total and both engines close ranges identically
    wv = Window.partitionBy("custkey").orderBy("dia", "ok")
    return versiones.select(
        "custkey",
        "prioridad",
        F.col("dia").cast("bigint").alias("valido_desde"),
        F.lead("dia").over(wv).cast("bigint").alias("valido_hasta"),
    )


# --------------------------------------------------------------------------
# Bot detection — inter-arrival regularity, integer-cleared CV test
# --------------------------------------------------------------------------

_BOTS_MIN_EVENTOS = 20

_BOTS_ORACLE = f"""
WITH ordenado AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap
    FROM events
),
resumen AS (
    SELECT user_id,
           count(gap) AS n,
           sum(gap) AS s,
           sum(CAST(gap AS HUGEINT) * gap) AS q
    FROM ordenado WHERE gap IS NOT NULL
    GROUP BY 1
)
SELECT user_id,
       CAST(n + 1 AS BIGINT) AS eventos,
       CAST(s // n AS BIGINT) AS gap_medio_us,
       CAST(s > 0 AND 100 * (n * q - CAST(s AS HUGEINT) * s)
                      < CAST(s AS HUGEINT) * s AS BOOLEAN) AS es_bot
FROM resumen
WHERE n + 1 >= {_BOTS_MIN_EVENTOS}
"""


@register("deteccion_bots", oracle=_BOTS_ORACLE, ops=("W1", "A3"),
          driver=False)
def deteccion_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT / AUTOMATION DETECTION by inter-arrival regularity: humans
    produce bursty gaps, scripts produce metronomic ones — flagged when
    the coefficient of variation of a user's event gaps is below 0.1,
    with the test ALGEBRAICALLY CLEARED of divisions and square roots:
    CV² = var/mean² < 1/100 becomes 100·(n·Σg² − S²) < S² over pure
    integer µs sums (the anomalias_trafico / prueba_ab discipline), so
    the flag is exact and engine-identical at boundary users.
    Quadratic gap sums ride HUGEINT/decimal(38) — a week-long gap
    squared already exceeds int64.

    Shape: one user-keyed window sort for the gaps (the sessionization
    cost class — at 100 TB the fact table is already time-partitioned
    per user), then a per-user aggregate; the statistic never leaves
    user grain."""
    from etl_python_airflow_bigquery_spark.functions import event_ts_us

    events = load_table(spark, sf_dir, "events")
    t = event_ts_us(events)
    w = Window.partitionBy("user_id").orderBy(t, "event_id")
    ordenado = events.select(
        "user_id", (t - F.lag(t).over(w)).alias("gap")
    )
    d38 = "decimal(38,0)"
    resumen = ordenado.where(F.col("gap").isNotNull()).groupBy("user_id").agg(
        F.count("gap").alias("n"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap").cast(d38) * F.col("gap")).alias("q"),
    )
    return resumen.where(F.col("n") + 1 >= _BOTS_MIN_EVENTOS).select(
        "user_id",
        (F.col("n") + 1).cast("bigint").alias("eventos"),
        F.expr("CAST(s div n AS BIGINT)").alias("gap_medio_us"),
        (
            (F.col("s") > 0)
            & (
                F.lit(100).cast(d38)
                * (F.col("n").cast(d38) * F.col("q") - F.col("s").cast(d38) * F.col("s"))
                < F.col("s").cast(d38) * F.col("s")
            )
        ).alias("es_bot"),
    )


# --------------------------------------------------------------------------
# Activity streaks — gaps-and-islands over day grain
# --------------------------------------------------------------------------

_RACHAS_ORACLE = """
WITH dias AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dia
    FROM events
),
islas AS (
    SELECT user_id, dia,
           dia - row_number() OVER (PARTITION BY user_id ORDER BY dia)
               AS isla
    FROM dias
),
rachas AS (
    SELECT user_id, isla, count(*) AS largo,
           min(dia) AS inicio, max(dia) AS fin
    FROM islas GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS rachas,
       CAST(max(largo) AS BIGINT) AS racha_maxima,
       CAST(max_by(inicio, largo + inicio / 100000.0) AS BIGINT)
           AS inicio_racha_maxima,
       CAST(sum(largo) AS BIGINT) AS dias_activos
FROM rachas
GROUP BY 1
"""


@register("rachas_actividad", oracle=_RACHAS_ORACLE, ops=("W1", "A1"),
          driver=False)
def rachas_actividad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVITY STREAKS per user — the gaps-and-islands pattern at day
    grain (the one classic windowing idiom the registry still lacked):
    consecutive active days share the constant ``dia − row_number()``
    island key, so streaks fall out of ONE window plus one aggregation
    — no self-join, no iteration, the textbook O(n log n) form.
    Emitted per user: streak count, the longest streak and its start
    (ties broken toward the LATER start via an exact fractional
    tiebreak — both engines' max_by sees the same composite key), and
    total active days. Retention/gamification's backbone metric.

    Shape: day-dedup map-side → one user-keyed window (the
    sessionization cost class) → two aggregations at streak grain."""
    events = load_table(spark, sf_dir, "events")
    dias = events.select(
        "user_id", event_day_num(events).alias("dia")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dia")
    islas = dias.select(
        "user_id", "dia", (F.col("dia") - F.row_number().over(w)).alias("isla")
    )
    rachas = islas.groupBy("user_id", "isla").agg(
        F.count(F.lit(1)).alias("largo"),
        F.min("dia").alias("inicio"),
        F.max("dia").alias("fin"),
    )
    return rachas.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rachas"),
        F.max("largo").cast("bigint").alias("racha_maxima"),
        F.expr("max_by(inicio, largo + inicio / 100000.0)")
        .cast("bigint")
        .alias("inicio_racha_maxima"),
        F.sum("largo").cast("bigint").alias("dias_activos"),
    )


# --------------------------------------------------------------------------
# State migration — month-over-month dominant-behavior transitions
# --------------------------------------------------------------------------

_MIGRACION_ORACLE = """
WITH mensual AS (
    SELECT user_id,
           epoch_us(ts) // 86400000000 // 30 AS mes,
           event_type,
           count(*) AS c
    FROM events GROUP BY 1, 2, 3
),
estado AS (
    SELECT user_id, mes, event_type AS estado
    FROM (SELECT user_id, mes, event_type,
                 row_number() OVER (PARTITION BY user_id, mes
                                    ORDER BY c DESC, event_type DESC) AS rn
          FROM mensual)
    WHERE rn = 1
),
transiciones AS (
    SELECT a.estado AS desde, b.estado AS hacia, count(*) AS usuarios
    FROM estado a
    JOIN estado b ON a.user_id = b.user_id AND b.mes = a.mes + 1
    GROUP BY 1, 2
)
SELECT desde, hacia, CAST(usuarios AS BIGINT) AS usuarios,
       CAST((1000 * usuarios) // sum(usuarios) OVER (PARTITION BY desde)
            AS BIGINT) AS proporcion_mili
FROM transiciones
"""


@register("migracion_estados", oracle=_MIGRACION_ORACLE, ops=("W1", "J12"),
          driver=False)
def migracion_estados(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL-STATE MIGRATION MATRIX: each user's month collapses to
    a dominant state (their most frequent event type — ties broken by
    descending type name via a row_number window; DuckDB 1.0's max_by
    rejects struct keys, so both engines use the window form), and consecutive months join into the month-over-month
    transition matrix with row-normalized floor-milli shares — the
    cohort-evolution view product teams read ('viewers become buyers at
    X‰/month'). Differs from cadena_markov (event-to-event transitions
    within the raw stream) by operating at the PERIOD × dominant-state
    grain, where the matrix is states² however long the history.

    Shape: (user, month, type) pre-aggregation map-side, dominant state
    via one aggregate (no window), a self-join keyed on (user, month+1)
    whose shuffle carries one row per user-month, and a states²-sized
    normalization."""
    events = load_table(spark, sf_dir, "events")
    # month index by integer epoch-day arithmetic: subtract the 30-day
    # remainder first so the division is exact (tz-proof, float-proof)
    dia = event_day_num(events)
    mes = ((dia - dia % 30) / 30).cast("bigint")
    mensual = events.groupBy(
        "user_id", mes.alias("mes"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id", "mes").orderBy(
        F.desc("c"), F.desc("event_type")
    )
    estado = (
        mensual.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "mes", F.col("event_type").alias("estado"))
    )
    a = estado.select("user_id", "mes", F.col("estado").alias("desde"))
    b = estado.select(
        "user_id", (F.col("mes") - 1).alias("mes"), F.col("estado").alias("hacia")
    )
    transiciones = (
        a.join(b, ["user_id", "mes"])
        .groupBy("desde", "hacia")
        .agg(F.count(F.lit(1)).alias("usuarios"))
    )
    return transiciones.select(
        "desde",
        "hacia",
        F.col("usuarios").cast("bigint").alias("usuarios"),
        F.expr(
            "CAST((1000 * usuarios) div sum(usuarios)"
            " OVER (PARTITION BY desde) AS BIGINT)"
        ).alias("proporcion_mili"),
    )


# --------------------------------------------------------------------------
# Inter-event gap distribution — the SESSION_GAP design table
# --------------------------------------------------------------------------


def _gaps_oracle() -> str:
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    return f"""
WITH e AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us FROM events
),
gaps AS (
    SELECT event_type,
           (t_us - lag(t_us) OVER (PARTITION BY user_id
                                   ORDER BY t_us, event_id))
               // 1000000 AS seg
    FROM e
)
SELECT event_type,
       CAST({_log2_ladder("(seg + 1)")} AS INT) AS banda_log2,
       CAST(count(*) AS BIGINT) AS brechas,
       CAST(min(seg) AS BIGINT) AS seg_min,
       CAST(max(seg) AS BIGINT) AS seg_max
FROM gaps WHERE seg IS NOT NULL
GROUP BY 1, 2"""


@register("tiempo_entre_eventos", ops=("W1", "A1"), driver=False)
def tiempo_entre_eventos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-EVENT GAP DISTRIBUTION, log2-banded in seconds and split by
    the LATER event's type — the empirical basis for the streaming
    SESSION_GAP constant and the sessionization threshold (a gap
    histogram with a clear valley says where sessions really break; a
    30-minute constant chosen blind is folklore). Gap = each event's
    distance to the user's previous event (any type — the user's
    timeline is one stream), seconds by integer floor-div, bands from
    the pure-comparison ladder on seg+1 so zero-second gaps land in
    band 0. Shape: ONE user-partitioned ordered window (the shuffle
    sessionization already pays) then a (types × bands)-sized roll-up.
    Oracle: same window + ladder."""
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(event_ts_us(events), "event_id")
    t_us = event_ts_us(events)
    gaps = events.select(
        "event_type",
        ((t_us - F.lag(t_us).over(w)) / 1_000_000)
        .cast("long")
        .alias("seg"),
    ).where(F.col("seg").isNotNull())
    return gaps.groupBy(
        "event_type",
        F.expr(_log2_ladder("(seg + 1)")).cast("int").alias("banda_log2"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("brechas"),
        F.min("seg").cast("bigint").alias("seg_min"),
        F.max("seg").cast("bigint").alias("seg_max"),
    )


from etl_python_airflow_bigquery_spark.queries import REGISTRY as _REGISTRY_G  # noqa: E402

_REGISTRY_G["tiempo_entre_eventos"].oracle = _gaps_oracle()


# --------------------------------------------------------------------------
# Conversion latency — first-view → first-purchase delay distribution
# --------------------------------------------------------------------------


def _latencia_oracle() -> str:
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    return f"""
WITH f AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view'
                    THEN epoch_us(ts) END) AS vista_us,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS compra_us
    FROM events GROUP BY 1
),
conv AS (
    SELECT (compra_us - vista_us) // 1000000 AS seg
    FROM f
    WHERE vista_us IS NOT NULL AND compra_us IS NOT NULL
      AND compra_us > vista_us
)
SELECT CAST({_log2_ladder("(seg + 1)")} AS INT) AS banda_log2,
       CAST(count(*) AS BIGINT) AS usuarios,
       CAST(min(seg) AS BIGINT) AS seg_min,
       CAST(max(seg) AS BIGINT) AS seg_max
FROM conv GROUP BY 1"""


@register("latencia_conversion", ops=("A8", "A1"), driver=False)
def latencia_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERSION LATENCY distribution: seconds from a user's FIRST view
    to their FIRST subsequent purchase, log2-banded — the funnel-timing
    readout the funnel queries (counts) and tiempo_entre_eventos (any-
    gap histogram) both stop short of: it answers 'how long does
    conversion take when it happens', which prices attribution windows
    and retargeting delays. Users whose first purchase precedes their
    first view (or who never did both) are not conversions and drop
    out. Shape: ONE conditional-min aggregation per user (no window, no
    self-join — the two firsts come from the same map-combinable agg),
    then a bands-sized roll-up; integer seconds by floor-div, the
    pure-comparison ladder (zero-second conversions land in band 0)."""
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    events = load_table(spark, sf_dir, "events")
    t_us = event_ts_us(events)
    f = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", t_us)).alias("vista_us"),
        F.min(F.when(F.col("event_type") == "purchase", t_us)).alias(
            "compra_us"
        ),
    )
    conv = f.where(
        F.col("vista_us").isNotNull()
        & F.col("compra_us").isNotNull()
        & (F.col("compra_us") > F.col("vista_us"))
    ).select(
        F.expr("(compra_us - vista_us) div 1000000").alias("seg")
    )
    return conv.groupBy(
        F.expr(_log2_ladder("(seg + 1)")).cast("int").alias("banda_log2")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("usuarios"),
        F.min("seg").cast("bigint").alias("seg_min"),
        F.max("seg").cast("bigint").alias("seg_max"),
    )


_REGISTRY_G["latencia_conversion"].oracle = _latencia_oracle()
