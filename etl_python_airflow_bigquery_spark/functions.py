"""Scalar building blocks shared by the operators.

Design rule: everything here is a pure Column expression (JVM-side, inside
whole-stage codegen) — no Python UDFs. Where the reference computes in
BigQuery SQL or pandas, the same semantics are expressed with
``pyspark.sql.functions`` so Catalyst can fold/push/prune them.

Timestamp convention: all interval arithmetic runs in epoch **microseconds**
and all date derivation in epoch **days** via integer math. The testdata
parquet timestamps load as TIMESTAMP_NTZ (wall-clock, no zone) — the same
semantics as DuckDB's naive timestamps — and the nanosecond ``events.ts``
loads as a raw nanos BIGINT (``spark.sql.legacy.parquet.nanosAsLong``, set
by tables.load_table). Both make results independent of the session time
zone and bit-exact against the DuckDB oracle (``epoch_us``), while matching
the reference's DATETIME_DIFF-in-seconds semantics (indicadores_cia.py:152-156).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
