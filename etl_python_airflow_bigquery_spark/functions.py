"""Scalar building blocks shared by the operators.

Design rule: everything here is a pure Column expression (JVM-side, inside
whole-stage codegen) — no Python UDFs. Where the reference computes in
BigQuery SQL or pandas, the same semantics are expressed with
``pyspark.sql.functions`` so Catalyst can fold/push/prune them.

Timestamp convention: all interval arithmetic runs in epoch **microseconds**
and all date derivation in epoch **days** via integer math. The testdata
parquet timestamps load as TIMESTAMP_NTZ (wall-clock, no zone) — the same
semantics as DuckDB's naive timestamps. The ``events.ts`` column's PHYSICAL
encoding is an environmental detail that has changed between data drops
(TIMESTAMP(NANOS) loaded as a raw BIGINT under ``nanosAsLong`` vs plain
``timestamp[us]`` loaded as TIMESTAMP_NTZ), so no operator may assume it:
every consumer goes through the schema-adaptive ``event_us_sql`` /
``event_ts_us`` accessors below, which inspect the bound DataFrame's actual
type and emit the right epoch-µs expression. Both paths are independent of
the session time zone and bit-exact against the DuckDB oracle
(``epoch_us``), while matching the reference's hand-declared load schemas
(consumo_detalle.py:270-306) in spirit: typing is deliberate, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, LongType, TimestampNTZType, TimestampType

US_PER_SEC = 1_000_000
US_PER_MIN = 60 * US_PER_SEC
US_PER_HOUR = 3600 * US_PER_SEC
US_PER_DAY = 86400 * US_PER_SEC
EPOCH_DATE = "1970-01-01"


def micros(ts_col_name: str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (wall-clock micros —
    tz-independent; identical to DuckDB ``epoch_us`` on naive timestamps).

    Takes the column NAME (the expression references it textually)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col_name})"
    ).cast("long")


def ntz_from_us(us: Column) -> Column:
    """Epoch-µs integer → TIMESTAMP_NTZ (UTC wall clock) via pure
    timestamp arithmetic — NEVER ``timestamp_micros`` + cast, whose NTZ
    rendering depends on the session time zone."""
    return F.timestamp_add(
        "MICROSECOND", us, F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    )


def to_santiago(us: Column) -> Column:
    """UTC instant (epoch µs) → America/Santiago wall clock, as
    TIMESTAMP_NTZ — the reference's ``DATETIME(ts, 'America/Santiago')``
    (indicadores_cia.py:123-124). ``convert_timezone`` on NTZ inputs is
    session-tz-independent and DST-correct via the IANA database (the
    DuckDB twin is ``timezone('America/Santiago', timezone('UTC', ts))``).
    """
    return F.convert_timezone(F.lit("UTC"), F.lit("America/Santiago"), ntz_from_us(us))


def ntz_lit(iso: str) -> Column:
    """TIMESTAMP_NTZ literal for filter predicates on parquet NTZ
    columns. Comparing the COLUMN directly against this literal yields a
    plain `col <= ts` DataFilter that reaches the parquet scan (row-group
    stats pruning); wrapping the column in ``micros()`` arithmetic does
    not push down. Wall-clock semantics — tz-proof like micros()."""
    return F.expr(f"TIMESTAMP_NTZ '{iso}'")


def nanos_to_micros(ns_col_name: str) -> Column:
    """Raw parquet-nanos BIGINT column → epoch microseconds via integer
    ``div`` (never float math: epoch-nanos exceed double's 53-bit mantissa).
    Takes the column NAME."""
    return F.expr(f"{ns_col_name} div 1000")


def event_us_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL fragment yielding the epoch-µs BIGINT of an event-time column,
    ADAPTIVE to the column's physical type on ``df``:

    * ``BIGINT``  → raw parquet epoch-nanos (``nanosAsLong`` drop): ``div 1000``;
    * ``TIMESTAMP_NTZ`` → wall-clock µs since the NTZ epoch (``micros()``
      semantics — identical to DuckDB ``epoch_us`` on naive timestamps);
    * ``TIMESTAMP`` (LTZ) → instant µs via ``unix_micros``.

    This is the ONLY sanctioned way to read ``events.ts``: the testdata's
    physical encoding has changed across drops and must never be assumed.
    Returns a parenthesized fragment safe to embed in larger ``F.expr``
    integer math (e.g. ``f"{event_us_sql(df)} div 86400000000"``)."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return f"({col} div 1000)"
    if isinstance(dt, TimestampNTZType):
        return (
            f"(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}))"
        )
    if isinstance(dt, TimestampType):
        return f"(unix_micros({col}))"
    if isinstance(dt, DateType):
        return (
            f"(CAST(datediff({col}, DATE '1970-01-01') AS BIGINT) * {US_PER_DAY})"
        )
    raise TypeError(
        f"event-time column {col!r} has unsupported type {dt.simpleString()}; "
        "expected BIGINT (raw nanos), TIMESTAMP_NTZ, TIMESTAMP, or DATE"
    )


def event_ts_us(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-µs BIGINT Column for an event-time column, schema-adaptive —
    see ``event_us_sql``."""
    return F.expr(event_us_sql(df, col)).cast("long")


def event_day_num(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-day BIGINT of an event-time column (integer ``div`` — matches
    the oracle's ``epoch_us(ts) // 86400000000``), schema-adaptive."""
    return F.expr(f"{event_us_sql(df, col)} div {US_PER_DAY}")


def event_hour(df: DataFrame, col: str = "ts") -> Column:
    """UTC hour-of-day (0-23) BIGINT of an event-time column,
    schema-adaptive (matches ``(epoch_us(ts) % 86400000000) // 3600000000``)."""
    us = event_us_sql(df, col)
    return F.expr(f"({us} % {US_PER_DAY}) div {US_PER_HOUR}")


def ts_lit_for(df: DataFrame, col: str, iso: str) -> Column:
    """A time literal typed to MATCH the column's physical encoding, so a
    direct ``col <op> ts_lit_for(...)`` comparison stays a plain pushable
    DataFilter whatever the testdata drop shipped: TIMESTAMP_NTZ literal
    for NTZ columns, instant for LTZ, DATE for date32, epoch-nanos BIGINT
    for raw-nanos longs. ``iso`` is 'YYYY-MM-DD HH:MM:SS' wall clock."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return ntz_lit(iso)
    if isinstance(dt, TimestampType):
        return F.to_timestamp(F.lit(iso))
    if isinstance(dt, DateType):
        return F.to_date(F.lit(iso.split(" ")[0]))
    if isinstance(dt, LongType):
        import datetime as _dt

        t = _dt.datetime.fromisoformat(iso).replace(tzinfo=_dt.timezone.utc)
        return F.lit(int(t.timestamp()) * 1_000_000_000)
    raise TypeError(f"unsupported time type {dt.simpleString()} for {col!r}")


def event_ts_filter(df: DataFrame, lo_us: int, hi_us: int, col: str = "ts") -> Column:
    """Half-open range predicate ``lo_us <= ts < hi_us`` on an event-time
    column, expressed so it PUSHES DOWN to the parquet scan: for timestamp
    encodings the column is compared directly against timestamp literals
    (a plain ``col >= lit`` DataFilter → row-group stats pruning); only the
    raw-nanos BIGINT encoding compares integers. Wrapping the column in
    arithmetic would defeat pushdown (see ``ntz_lit``)."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, LongType):
        return (c >= F.lit(lo_us * 1000)) & (c < F.lit(hi_us * 1000))
    if isinstance(dt, TimestampNTZType):
        return (c >= ntz_from_us(F.lit(lo_us))) & (c < ntz_from_us(F.lit(hi_us)))
    if isinstance(dt, TimestampType):
        return (c >= F.timestamp_micros(F.lit(lo_us))) & (
            c < F.timestamp_micros(F.lit(hi_us))
        )
    raise TypeError(f"unsupported event-time type {dt.simpleString()} for {col!r}")


def epoch_day(us: Column) -> Column:
    """Epoch-day number of an epoch-microsecond instant (UTC calendar)."""
    return F.floor(us / F.lit(US_PER_DAY)).cast("int")


def day_to_date(day: Column) -> Column:
    """Epoch-day number → DateType (tz-proof: no timestamp conversion)."""
    return F.date_add(F.to_date(F.lit(EPOCH_DATE)), day)


def us_to_date(us: Column) -> Column:
    """Epoch-microsecond instant → UTC calendar date."""
    return day_to_date(epoch_day(us))


def hour_of_day(us: Column) -> Column:
    """UTC hour-of-day (0-23) of an epoch-microsecond instant."""
    return F.floor((us % F.lit(US_PER_DAY)) / F.lit(US_PER_HOUR)).cast("int")


def clipped_micros(s_us: Column, e_us: Column, lo_us: Column, hi_us: Column) -> Column:
    """Overlap length (µs) of [s,e) against [lo,hi) — the reference's
    ``DATETIME_DIFF(LEAST(end,fin), GREATEST(start,inicio), SECOND)``
    interval-clipping idiom (indicadores_cia.py:152-156), in integer µs."""
    return F.greatest(
        F.least(e_us, hi_us) - F.greatest(s_us, lo_us), F.lit(0).cast("long")
    )


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-insensitive exact SUM of a double column.

    Doubles summed in different partition orders differ in the last bits;
    summing in decimal is associative/exact, so the result is identical
    across Spark shuffles AND matches DuckDB's decimal sum bit-for-bit.
    Cast back to double for a stable output schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def trunc1(col: Column) -> Column:
    """TRUNC(x, 1) with the reference's floor semantics
    (indicadores_cia.py:245-246): floor(x*10)/10, not round."""
    return F.floor(col * 10) / 10


def safe_div(num: Column, den: Column) -> Column:
    """Division with the reference's divide-by-zero CASE guard
    (indicadores_cia.py:155-159): 0 when the denominator is 0/null."""
    return F.when(den.isNull() | (den == 0), F.lit(0.0)).otherwise(num / den)


def in_literals(col: str, vals: list) -> Column:
    """``col IN (vals)`` built as ONE parsed SQL expression instead of
    ``Column.isin`` — semantically identical (Catalyst converts both to
    the same In/InSet), but ``isin`` constructs one py4j literal PER
    VALUE, a driver-side round-trip storm that costs ~1 s per thousand
    values (measured: the dedup-state probe's 20k-value residual filter
    spent ~15 s building literals; the parsed form is ~0.1 s). Only
    int/str value lists qualify — they have unambiguous SQL literal
    spellings; anything else falls back to ``isin`` (callers' big lists
    are always ids or hex digests)."""
    if vals and all(
        isinstance(x, int) and not isinstance(x, bool) for x in vals
    ):
        cuerpo = ",".join(str(x) for x in vals)
    elif vals and all(isinstance(x, str) for x in vals):
        cuerpo = ",".join(
            "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for x in vals
        )
    else:
        return F.col(col).isin(vals)
    return F.expr(f"`{col}` IN ({cuerpo})")


def local_df(spark, rows: list, schema: str) -> DataFrame:
    """Driver-built bounded frame in ONE pickled slice.
    ``createDataFrame(list)`` parallelizes over defaultParallelism
    slices, so every downstream pass over the frame pays one
    Python-worker partition evaluation PER CORE (measured at 32 cores:
    a 4.5k-row frame costs ~0.5 s per materialization at 32 slices,
    ~0.3 s at one; a cold write job reads 2.8 s vs 0.33 s) and a write
    produces one near-empty file per core. Callers pass driver-bounded
    row lists only (probe cells, collected anchors, UF labels — all
    behind collect caps), where one slice is the right layout."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def device_fingerprint(*cols: Column | str) -> Column:
    """MD5-hex device/identity fingerprint — the reference's
    ``TO_HEX(MD5(request_ip || user_agent))`` (consumo_registrados.py:113)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def surrogate_id(fuente: Column, marca: Column, fecha_us: Column, agg: Column, target: Column) -> Column:
    """Deterministic surrogate row id for MERGE dedup, shaped like the
    reference's ``fuente[0] + marca[:3] + %y%m%d%H + agg + target``
    (trafico_digital.py:437-441, audio_digital.py:248-255) — built from
    tz-proof integer date parts."""
    day = epoch_day(fecha_us)
    hour = hour_of_day(fecha_us)
    return F.concat_ws(
        "_",
        F.substring(F.lower(fuente), 1, 1),
        F.substring(F.lower(marca), 1, 3),
        F.concat(F.date_format(day_to_date(day), "yyMMdd"), F.lpad(hour.cast("string"), 2, "0")),
        F.lower(agg),
        F.lower(target),
    )


def _log2_ladder(expr: str, cap: int = 20) -> str:
    """floor(log2(x)) for x ≥ 1 as pure comparisons (the busqueda_bm25
    ladder) — no float log whose ulp at exact powers of two differs.
    Shared by grafo_grados and ley_zipf (lives here, not in a queries
    module, to stay import-cycle-free)."""
    branches = " ".join(
        f"WHEN {expr} >= {1 << k} THEN {k}" for k in range(cap, 0, -1)
    )
    return f"(CASE {branches} ELSE 0 END)"


def ranked_topk(
    df: DataFrame, k: int, order_by: list[Column], pos_col: str = "pos"
) -> DataFrame:
    """GLOBAL top-k WITH a contiguous 1-based position column, the
    scale-correct way (VERDICT r11: the unpartitioned-window top-k
    family). orderBy+limit compiles to TakeOrderedAndProject — a
    per-partition bounded heap + single-driver merge of k rows per
    partition — so the corpus-sized input is never sorted in one task;
    the row_number window then ranks only the ≤k survivors (a
    single-partition sort of k rows, which is the POINT). ``order_by``
    must be deterministic — include a unique tiebreak key — or the
    survivors themselves are unstable."""
    from pyspark.sql import Window

    return (
        df.orderBy(*order_by)
        .limit(k)
        .withColumn(pos_col, F.row_number().over(Window.orderBy(*order_by)))
    )
