"""Program-pair audience superposition — the reference's
``Complex_user_superposition_by_program_etl.ipynb`` pipeline (cells 2-11)
re-expressed Spark-first.

Reference shape being matched:
* cell 3: ``programas`` CTE — GENERATE_DATE_ARRAY cross-joined with
  ``dicc_programas``, kept when ``EXTRACT(dayofweek FROM fecha)`` is a
  member of the program's ``dias`` ARRAY (SURVEY X8; rewritten here as
  ``array_contains(dias, dayofweek-1)``) and ``dicc.activo``; airing
  bounds are ``datetime(fecha, inicio_oficial/fin_oficial)``.
* cell 3 (outer select): sessions joined to airings on content match +
  interval overlap (``end >= hora_inicio AND start < hora_fin``),
  ``user_id IS NOT NULL``.
* cells 5-7: ``df_super`` self-merge on (soporte, content_id, user_id,
  dia) and ``df_super_count`` = distinct users per program pair.
* cells 9-11: ``df_comb`` — the per-day program-pair grid with
  ``hora``/``hora_referencia`` TIME-of-day columns (``.dt.time``; the
  mart-schema convention audio_digital.py:218-223 stores as "HH:MM:SS"
  strings).
* cell 19: final frame = grid ⨝ pair counts, plus ``total`` = the
  reference program's own audience (the diagonal pair), fillna(0).

Spark-first differences (the scale story):
* The pandas self-merge materializes every session pair; here membership
  is aggregated ONCE per (soporte, content_id, user_id, dia) into a
  program set (one shuffle whose key includes the user — hot keys spread
  by day), then pairs explode MAP-SIDE from that set (≤ programs-per-day²
  per user-day, a handful) straight into the pair aggregation.
* The airing grid (days × programs) is dim-sized at any data scale —
  it broadcasts; the overlap join against sessions is a broadcast range
  join, zero shuffle on the fact.
* ``total`` is not a second pipeline pass: the diagonal of the pair
  matrix equals the program's own distinct audience, computed directly
  from membership and broadcast back.

The oficial/ipsos timetable switch (programas_live.py:104-123 applied to
program windows): ``horario="ipsos"`` snaps each airing to surrounding
hour boundaries with the same floor/ceil integer arithmetic as the U3
normalizer (queries/extras.py:horario_ipsos) before the overlap join, and
the emitted ``periodo``/``hora`` labels are the snapped ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.dims import PROGRAMAS, day_grid, programas_dim
from etl_python_airflow_bigquery_spark.functions import (
    US_PER_HOUR,
    day_to_date,
)
from etl_python_airflow_bigquery_spark.operators.intervals import sessions_from_events
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

_US_PER_DAY = 86_400_000_000
_US_PER_MIN = 60_000_000

# The synthetic estate's programming season: 2024-01-01 .. 2024-02-29
# (the events table's span; sessions outside simply match no airing).
_DAY0, _DAY1 = 19723, 19782


def _hora_str(us: Column) -> Column:
    """Time-of-day 'HH:mm:ss' string from an epoch-µs instant — the mart
    TIME convention (audio_digital.py:218-223) without ever constructing
    a session-tz-dependent timestamp: pure integer arithmetic on the µs
    value (always midnight-relative because airings are built as
    day*86400e6 + minutes)."""
    h = F.floor((us % _US_PER_DAY) / F.lit(US_PER_HOUR)).cast("long")
    m = F.floor((us % US_PER_HOUR) / F.lit(_US_PER_MIN)).cast("long")
    return F.concat(
        F.lpad(h.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lit(":00"),
    )


def programas_airings(spark: SparkSession, horario: str = "oficial") -> DataFrame:
    """Per-day program airings: the notebook's ``programas`` CTE. Both
    inputs are literal LocalRelations, so the cross join + weekday-array
    membership filter is constant work at plan time — the result is
    days × programs rows (dim-sized at ANY fact scale: a year of a
    thousand programs is <400k rows), always broadcastable."""
    if horario not in ("oficial", "ipsos"):
        raise ValueError(f"unknown horario {horario!r}")
    dicc = programas_dim(spark).where(F.col("activo"))
    grid = day_grid(spark, _DAY0, _DAY1)
    # Spark dayofweek is 1=Sunday..7; dias stores 0=Sunday..6 (DuckDB
    # convention) — shift by one. This is the X8 membership rewrite.
    aired = grid.join(dicc, F.array_contains(dicc["dias"], grid["dow"] - 1))
    day = F.col("day_num").cast("long")
    p_s = day * F.lit(_US_PER_DAY) + F.col("inicio_min").cast("long") * F.lit(_US_PER_MIN)
    p_e = day * F.lit(_US_PER_DAY) + F.col("fin_min").cast("long") * F.lit(_US_PER_MIN)
    if horario == "ipsos":
        hour = F.lit(US_PER_HOUR)
        p_s = (F.floor(p_s / hour) * hour).cast("long")
        p_e = ((F.floor((p_e - 1) / hour) + 1) * hour).cast("long")
    return aired.select(
        "programa",
        "soporte",
        "content_id",
        "day_num",
        p_s.alias("p_s_us"),
        p_e.alias("p_e_us"),
    )


def _superposicion_programas(
    spark: SparkSession, sf_dir: str, horario: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sess = (
        sessions_from_events(events)
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id", F.col("event_type").alias("content_id"), "s_us", "e_us"
        )
    )
    airings = programas_airings(spark, horario)
    # Broadcast range join: content equi key + overlap predicate
    # (reference cell 3: end >= hora_inicio AND start < hora_fin).
    memb = sess.join(
        F.broadcast(airings),
        (sess["content_id"] == airings["content_id"])
        & (sess["e_us"] >= airings["p_s_us"])
        & (sess["s_us"] < airings["p_e_us"]),
    ).select(
        "user_id",
        airings["content_id"].alias("content_id"),
        "soporte",
        "day_num",
        "programa",
        F.col("p_s_us").alias("periodo"),
    )
    # One shuffle: program set per (soporte, content, user, day); pairs
    # explode map-side from the set (collect_set also dedups the
    # session-level multiplicity, like the notebook's nunique).
    per_ucd = memb.groupBy("soporte", "content_id", "user_id", "day_num").agg(
        F.collect_set(F.struct("programa", "periodo")).alias("progs")
    )
    pares = (
        per_ucd.select(
            "soporte",
            "content_id",
            "user_id",
            "day_num",
            F.explode("progs").alias("p"),
            "progs",
        )
        .select(
            "soporte",
            "content_id",
            "user_id",
            "day_num",
            F.col("p.programa").alias("programa"),
            F.col("p.periodo").alias("periodo"),
            F.explode("progs").alias("q"),
        )
        .select(
            "soporte",
            "content_id",
            "user_id",
            "day_num",
            "programa",
            "periodo",
            F.col("q.programa").alias("programa_referencia"),
            F.col("q.periodo").alias("periodo_referencia"),
        )
    )
    conteos = pares.groupBy(
        "soporte",
        "content_id",
        "day_num",
        "programa",
        "periodo",
        "programa_referencia",
        "periodo_referencia",
    ).agg(F.countDistinct("user_id").cast("bigint").alias("usuarios"))
    # total = the reference program's own audience (the notebook's
    # df_super_count left-joined back on the diagonal keys, cell 19).
    totales = memb.groupBy("content_id", "programa", "periodo").agg(
        F.countDistinct("user_id").cast("bigint").alias("total")
    )
    # df_comb: the per-day program-pair grid with TIME-string labels.
    a1 = programas_airings(spark, horario).alias("a1")
    a2 = programas_airings(spark, horario).alias("a2")
    comb = a1.join(
        a2,
        (F.col("a1.content_id") == F.col("a2.content_id"))
        & (F.col("a1.day_num") == F.col("a2.day_num")),
    ).select(
        F.col("a1.content_id").alias("content_id"),
        F.col("a1.soporte").alias("soporte"),
        F.col("a1.day_num").alias("day_num"),
        F.col("a1.programa").alias("programa"),
        F.col("a1.p_s_us").alias("periodo"),
        _hora_str(F.col("a1.p_s_us")).alias("hora"),
        F.col("a2.programa").alias("programa_referencia"),
        F.col("a2.p_s_us").alias("periodo_referencia"),
        _hora_str(F.col("a2.p_s_us")).alias("hora_referencia"),
    )
    out = conteos.join(
        F.broadcast(comb),
        [
            "content_id",
            "soporte",
            "day_num",
            "programa",
            "periodo",
            "programa_referencia",
            "periodo_referencia",
        ],
    ).join(
        F.broadcast(
            totales.select(
                "content_id",
                F.col("programa").alias("programa_referencia"),
                F.col("periodo").alias("periodo_referencia"),
                "total",
            )
        ),
        ["content_id", "programa_referencia", "periodo_referencia"],
        "left",
    )
    return out.select(
        F.date_format(day_to_date(F.col("day_num")), "yyyy-MM-dd").alias("dia"),
        "content_id",
        "soporte",
        "programa",
        "periodo",
        "hora",
        "programa_referencia",
        "periodo_referencia",
        "hora_referencia",
        "usuarios",
        F.coalesce(F.col("total"), F.lit(0)).cast("bigint").alias("total"),
    )


def _dicc_sql() -> str:
    rows = ", ".join(
        f"('{p}', '{s}', '{c}', {i}, {f}, [{', '.join(map(str, d))}], {str(a).lower()})"
        for p, s, c, i, f, d, a in PROGRAMAS
    )
    return (
        "dicc(programa, soporte, content_id, inicio_min, fin_min, dias, activo) AS "
        f"(VALUES {rows})"
    )


def _oracle(horario: str) -> str:
    if horario == "ipsos":
        p_s = "(raw_s // 3600000000) * 3600000000"
        p_e = "((raw_e - 1) // 3600000000 + 1) * 3600000000"
    else:
        p_s, p_e = "raw_s", "raw_e"
    hora = (
        "lpad(CAST(({col} % 86400000000) // 3600000000 AS VARCHAR), 2, '0') || ':' || "
        "lpad(CAST(({col} % 3600000000) // 60000000 AS VARCHAR), 2, '0') || ':00'"
    )
    return f"""
WITH {_dicc_sql()},
fechas AS (SELECT g.d AS day_num FROM generate_series({_DAY0}, {_DAY1}) g(d)),
airings AS (
    SELECT programa, soporte, content_id, day_num,
           {p_s} AS p_s_us, {p_e} AS p_e_us
    FROM (
        SELECT d.programa, d.soporte, d.content_id, f.day_num,
               f.day_num * 86400000000 + CAST(d.inicio_min AS BIGINT) * 60000000 AS raw_s,
               f.day_num * 86400000000 + CAST(d.fin_min AS BIGINT) * 60000000 AS raw_e
        FROM fechas f CROSS JOIN dicc d
        WHERE d.activo
          AND list_contains(d.dias,
                dayofweek(DATE '1970-01-01' + CAST(f.day_num AS INT)))
    )
),
sess AS (
    SELECT user_id, event_type AS content_id,
           epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e_us
    FROM events WHERE user_id IS NOT NULL
),
memb AS (
    SELECT DISTINCT a.soporte, a.content_id, s.user_id, a.day_num,
           a.programa, a.p_s_us AS periodo
    FROM sess s JOIN airings a
      ON s.content_id = a.content_id
     AND s.e_us >= a.p_s_us AND s.s_us < a.p_e_us
),
conteos AS (
    SELECT m1.soporte, m1.content_id, m1.day_num,
           m1.programa, m1.periodo,
           m2.programa AS programa_referencia, m2.periodo AS periodo_referencia,
           count(DISTINCT m1.user_id) AS usuarios
    FROM memb m1 JOIN memb m2
      ON m1.soporte = m2.soporte AND m1.content_id = m2.content_id
     AND m1.user_id = m2.user_id AND m1.day_num = m2.day_num
    GROUP BY ALL
),
totales AS (
    SELECT content_id, programa AS programa_referencia,
           periodo AS periodo_referencia,
           count(DISTINCT user_id) AS total
    FROM memb GROUP BY ALL
)
SELECT strftime(DATE '1970-01-01' + CAST(c.day_num AS INT), '%Y-%m-%d') AS dia,
       c.content_id, c.soporte, c.programa,
       c.periodo, {hora.format(col="c.periodo")} AS hora,
       c.programa_referencia, c.periodo_referencia,
       {hora.format(col="c.periodo_referencia")} AS hora_referencia,
       CAST(c.usuarios AS BIGINT) AS usuarios,
       CAST(coalesce(t.total, 0) AS BIGINT) AS total
FROM conteos c
LEFT JOIN totales t
  ON t.content_id = c.content_id
 AND t.programa_referencia = c.programa_referencia
 AND t.periodo_referencia = c.periodo_referencia
"""


@register(
    "superposicion_programas",
    oracle=_oracle("oficial"),
    ops=("W3", "J3", "J9", "A2", "P7", "J6"),
    bench=True,
)
def superposicion_programas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Program-pair audience-overlap matrix with oficial timetables —
    the full Complex_user_superposition_by_program_etl.ipynb pipeline
    (see module docstring for the cell-by-cell map and the scale
    rewrite)."""
    return _superposicion_programas(spark, sf_dir, "oficial")


@register(
    "superposicion_programas_ipsos",
    oracle=_oracle("ipsos"),
    ops=("W3", "J3", "U3", "A2", "P7"),
    driver=False,
)
def superposicion_programas_ipsos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same matrix under the ipsos timetable switch: airing windows
    snapped to hour boundaries by the U3 floor/ceil arithmetic before
    the overlap join (programas_live.py:104-123 fuente='ipsos'), labels
    and TIME strings snapped accordingly."""
    return _superposicion_programas(spark, sf_dir, "ipsos")
