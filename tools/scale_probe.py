"""Scale probe: replicate the sf0.1 fact tables K× (shifted keys, so
cardinalities grow too) into a tmp dir and time the headline queries —
empirical evidence that the plans scale near-linearly rather than
quadratically (SCALING.md records the results).

Usage: PYTHONPATH=. python tools/scale_probe.py [K] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def replicate(
    spark,
    src_dir: str,
    out_dir: str,
    k: int,
    time_extended: bool = False,
    dedup_real: bool = False,
) -> None:
    """events: K copies with shifted event/user ids and a +k-days time
    shift (keeps per-day densities realistic). documents/embeddings: K
    copies with shifted ids (distinct texts stay distinct). Dim tables
    copy as-is.

    ``time_extended`` (VERDICT r11 #8): shift copy i by i × the SOURCE
    CALENDAR SPAN instead of +i days, so the calendar grows with the
    volume and per-day density stays ~constant — the linear regime the
    interval-join plans actually target. The default +i-days replica
    DENSIFIES the calendar (k× sessions over the same days), which
    drives interval-pair counts toward k² — the audited quadratic
    artifact of the r5 sf1 rows, useful as a stress mode but not as the
    scaling read.

    ``dedup_real`` (VERDICT r13 #3): the PRODUCTION-SHAPED dedup
    replica. The default documents replication appends " copia{i}" to
    the SAME base text, so every source doc becomes a K-member near-dup
    family — adversarial clone density (~100%), the dedup stress mode.
    With dedup_real, copy i>0 instead REHASHES each word with a
    copy-specific salt: word w → substr(md5(w || 'c{i}'), 1, 8). The
    map is per-copy injective over words, so word-3-gram shingle sets
    transform injectively too — every intra-copy Jaccard relationship
    (the source's NATURAL near-dup rate) is preserved exactly, while
    cross-copy overlap drops to ~zero. A deterministic ~3% of base docs
    (doc_id % 33 == 0) keep the " copia{i}" suffix form instead,
    seeding realistic K-member clone families — total near-dup density
    a few %, the regime a real corpus feeds a daily dedup fold."""
    from pyspark.sql.types import LongType

    from etl_python_airflow_bigquery_spark.functions import event_day_num
    from etl_python_airflow_bigquery_spark.tables import TABLES, load_table

    day_shift = 1
    if time_extended:
        ev = load_table(spark, src_dir, "events")
        d = event_day_num(ev).cast("bigint")
        lo, hi = ev.agg(F.min(d), F.max(d)).first()
        day_shift = int(hi - lo) + 1

    for t in TABLES:
        df = load_table(spark, src_dir, t)
        if t == "events":
            # shift copy i by +i*day_shift days, respecting the physical
            # encoding (raw-nanos BIGINT vs timestamp) — the engine-wide
            # rule that ts's type is never assumed applies here too
            if isinstance(df.schema["ts"].dataType, LongType):
                shifted = lambda i: F.col("ts") + F.lit(  # noqa: E731
                    i * day_shift * 86_400_000_000_000
                )
            else:
                shifted = lambda i: F.timestamp_add(  # noqa: E731
                    "DAY", F.lit(i * day_shift), F.col("ts")
                )
            parts = [
                df.select(
                    (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                    shifted(i).alias("ts"),
                    (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
                for i in range(k)
            ]
        elif t == "documents":
            def _texto(i: int):
                clonado = F.concat(F.col("text"), F.lit(f" copia{i}"))
                if not dedup_real or i == 0:
                    return clonado
                # per-copy word rehash: preserves intra-copy Jaccard
                # (injective word map ⇒ injective 3-gram shingle map),
                # kills cross-copy overlap; ~3% of base docs keep the
                # clone form — realistic near-dup density
                distinto = F.array_join(
                    F.expr(
                        f"transform(split(text, ' '),"
                        f" w -> substring(md5(concat(w, 'c{i}')), 1, 8))"
                    ),
                    " ",
                )
                return F.when(
                    F.col("doc_id") % 33 == 0, clonado
                ).otherwise(distinto)

            parts = [
                df.select(
                    (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                    _texto(i).alias("text"),
                    "lang",
                    "source",
                )
                .withColumn("n_chars", F.length("text"))
                for i in range(k)
            ]
        elif t == "embeddings":
            parts = [
                df.select(
                    (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                    "embedding",
                    "label",
                )
                for i in range(k)
            ]
        elif t in ("orders", "lineitem"):
            # shift the join keys CONSISTENTLY across both tables so the
            # order graph (lineitem⋈orders, customer/supplier nodes)
            # really grows K× — copies stay join-compatible within
            # themselves and disjoint from each other
            shifts = {
                "o_orderkey": 100_000_000,
                "l_orderkey": 100_000_000,
                "o_custkey": 1_000_000,
                "l_suppkey": 1_000_000,
            }
            parts = [
                df.select(
                    *[
                        (F.col(c) + F.lit(i * shifts[c])).alias(c)
                        if c in shifts
                        else F.col(c)
                        for c in df.columns
                    ]
                )
                for i in range(k)
            ]
        else:
            parts = [df]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_python_airflow_bigquery_spark.queries import REGISTRY
    from etl_python_airflow_bigquery_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or [
        "indicadores_total",
        "programas_live",
        "superposicion_hora",
        "sessionization",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "similarity_topk",
        "funnel_vip",
    ]
    spark = get_spark("scale-probe")
    src = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="spark_graft_scale_")
    try:
        print(f"replicating sf0.1 x{k} -> {tmp}", file=sys.stderr)
        replicate(spark, src, tmp, k)
        from etl_python_airflow_bigquery_spark.queries.dedup import (
            clear_session_caches,
        )

        # Materialize like bench.py: an all-column checksum, NOT count().
        # count() lets Catalyst eliminate a final left join whose right
        # side is unique-per-key (the corpus_sin_subcadenas shape) and
        # prune map-only projections — the probe would time a fraction of
        # the plan. Probe rows recorded before round 6 used count().
        def _mat(df):
            df.select(F.xxhash64(*df.columns).alias("h")).agg(
                F.expr("bit_xor(h)")
            ).collect()

        for name in names:
            _mat(REGISTRY[name].fn(spark, src))  # warm small
            # the warm run populates the session materialization caches;
            # clear before EACH timed measurement or a cache-backed query
            # compares a warm base against a cold replica (the bench.py
            # honesty rule applied here too)
            clear_session_caches()
            t0 = time.perf_counter()
            _mat(REGISTRY[name].fn(spark, src))
            base = time.perf_counter() - t0
            clear_session_caches()
            t0 = time.perf_counter()
            _mat(REGISTRY[name].fn(spark, tmp))
            big = time.perf_counter() - t0
            ratio = big / base if base > 0 else float("inf")
            print(
                f"{name}: sf0.1={base:.2f}s x{k}={big:.2f}s "
                f"ratio={ratio:.1f} (linear would be ~{k})"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
