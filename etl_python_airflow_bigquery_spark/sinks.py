"""Egress sinks (SURVEY.md §2.2 K7-K9) — driver-side by design: these
consume SMALL final aggregates (monitoring rows, segment lists), so a
``collect()`` here is correct, not a scale bug. The SMTP send itself is
injectable (no network in this environment).
"""

from __future__ import annotations

import html
import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_html_report(
    df: DataFrame, title: str, max_rows: int = 1000
) -> str:
    """K8: render a result frame into the reference's HTML-email table
    (email_nulos.py:49-325's row templating). Values are escaped; the
    row cap guards against accidentally emailing a fact table."""
    cols = df.columns
    rows = df.limit(max_rows).collect()
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape('' if r[c] is None else str(r[c]))}</td>" for c in cols)
        + "</tr>"
        for r in rows
    )
    return (
        f"<html><body><h3>{html.escape(title)}</h3>"
        f"<table border='1'><tr>{head}</tr>{body}</table>"
        f"<p>{len(rows)} filas</p></body></html>"
    )


def send_email_report(
    df: DataFrame,
    title: str,
    recipients: list[str],
    send_fn: Callable[[str, list[str], str], None],
    skip: bool = False,
) -> bool:
    """K8 + G5: holiday-gated email send (the reference skips on
    feriados, email_nulos.py:327-335). ``send_fn(subject, to, html)``
    is the SMTP boundary — injected, so tests (and this offline
    environment) never open sockets."""
    if skip:
        return False
    send_fn(title, recipients, render_html_report(df, title))
    return True


def segment_dictionary(df: DataFrame, tag_col: str, value_col: str) -> str:
    """K9: ``{tag: [values]}`` JSON segment dictionary (the mailing
    segmentation output, Mailing_campaign_segmenttion.ipynb). The
    grouping/collect_list runs distributed; only the final small dict
    lands on the driver."""
    rows = (
        df.groupBy(tag_col)
        .agg(F.sort_array(F.collect_list(value_col)).alias("vals"))
        .collect()
    )
    return json.dumps(
        {r[tag_col]: list(r["vals"]) for r in rows}, ensure_ascii=False, sort_keys=True
    )


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K7: CSV export. ``single_file`` coalesces to one part — only for
    small report frames (the reference's to_csv outputs)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def export_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    shard_col: str | None = None,
    compress: bool = True,
) -> None:
    """Training-corpus export: JSONL shards — the format data loaders
    stream. ``shard_col`` routes rows to shards by an existing column
    (e.g. barajado_global's deterministic ``shard``), so files REPRODUCE
    the engine's training permutation; otherwise ``shards`` controls the
    file count. Gzip by default (loaders decompress on the fly; ~4×
    smaller at rest). Distributed write — rows never visit the driver,
    unlike the report-frame CSV/Excel sinks above."""
    out = df
    if shard_col is not None:
        out = out.repartition(F.col(shard_col))
    elif shards is not None:
        out = out.repartition(shards)
    w = out.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def export_excel(dfs: dict[str, DataFrame], path: str, max_rows: int = 100_000) -> bool:
    """K7: multi-sheet Excel export (the reference's pd.ExcelWriter,
    Bigquery_to_csv.ipynb cells 2-4). Driver-side by design — report
    frames only (row cap enforced). Gated on openpyxl availability:
    returns False if the engine runs without it."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    import pandas as pd

    with pd.ExcelWriter(path, engine="openpyxl") as xl:
        for sheet, df in dfs.items():
            df.limit(max_rows).toPandas().to_excel(xl, sheet_name=sheet[:31], index=False)
    return True


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """K6: JDBC truncate+append (the reference's Postgres TRUNCATE +
    chunked to_sql, Encuestas_etl_Bigquery_SQL.ipynb). ``batchsize``
    plays the pg8000 multi-insert chunk; mode='overwrite' the TRUNCATE.
    Executor-parallel — each partition opens its own connection."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
