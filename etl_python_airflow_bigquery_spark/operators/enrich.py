"""Enrichment-UDF layer (SURVEY.md §2.9 U1/U2): the dedup-enrich-join
idiom, preserved deliberately from the reference (§4 X9).

The reference never runs its expensive per-value functions (user-agent
parsing, GeoIP lookups) over the fact table — it extracts DISTINCT keys,
enriches those, and left-joins back (consumo_detalle.py:157,204). That
idiom is the difference between O(distinct values) and O(rows) Python
calls, and at 100 TB it is the difference between a broadcast join and
an unusable pipeline. ``enrich_via_distinct`` encodes it once:

    fact ⟕ (fact.select(key).distinct() → mapInPandas(parse) )

The Python step is Arrow-batched (mapInPandas), never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_via_distinct(
    df: DataFrame,
    key_col: str,
    enrich_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
    broadcast: bool = True,
) -> DataFrame:
    """Apply ``enrich_fn`` (pandas in → pandas out, must preserve
    ``key_col``) over the DISTINCT values of ``key_col`` only, then
    left-join the enrichment back onto ``df``. The distinct side is
    usually small (UA strings, IPs) → broadcast join by default."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield enrich_fn(pdf)

    distinct = df.select(key_col).where(F.col(key_col).isNotNull()).distinct()
    enriched = distinct.mapInPandas(runner, schema=out_schema)
    if broadcast:
        enriched = F.broadcast(enriched)
    return df.join(enriched, key_col, "left")


# --------------------------------------------------------------------------
# U1 — user-agent parser (pandas rules over distinct agents)
# --------------------------------------------------------------------------

UA_SCHEMA = "user_agent STRING, device_type STRING, os_family STRING"


def parse_user_agents(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pandas UA classifier (device_type ∈ Desktop/Phone/
    Tablet/Other — the reference's user_agents.parse buckets,
    consumo_detalle.py:145-186). Pure string rules so the DuckDB oracle
    can mirror them exactly."""
    ua = pdf["user_agent"].fillna("")
    is_tablet = ua.str.contains("iPad|Tablet", regex=True)
    is_phone = ~is_tablet & ua.str.contains("iPhone|Android|Mobile", regex=True)
    is_desktop = ~is_tablet & ~is_phone & ua.str.contains(
        "Windows|Macintosh|X11", regex=True
    )
    device = pd.Series("Other", index=pdf.index)
    device[is_desktop] = "Desktop"
    device[is_phone] = "Phone"
    device[is_tablet] = "Tablet"
    os_family = pd.Series("Other", index=pdf.index)
    os_family[ua.str.contains("Windows")] = "Windows"
    os_family[ua.str.contains("Macintosh|iPhone|iPad", regex=True)] = "Apple"
    os_family[ua.str.contains("Android")] = "Android"
    os_family[ua.str.contains("X11|Linux", regex=True) & (os_family == "Other")] = "Linux"
    return pd.DataFrame(
        {"user_agent": pdf["user_agent"], "device_type": device, "os_family": os_family}
    )


# --------------------------------------------------------------------------
# U2 — GeoIP-style lookup (per-partition handle over distinct IPs)
# --------------------------------------------------------------------------

GEO_SCHEMA = "request_ip STRING, pais STRING, ciudad STRING"

# Deterministic stand-in for the MaxMind .mmdb database (reference
# consumo_detalle.py:199-211): second octet ranges → country. A real
# deployment swaps `_geo_db()` for maxminddb.open_database — the
# per-partition open + per-distinct-ip lookup shape is identical.
_GEO_RANGES = [
    (0, 63, "chile", "santiago"),
    (64, 127, "argentina", "buenos aires"),
    (128, 191, "peru", "lima"),
    (192, 255, "mexico", "cdmx"),
]


def _geo_db():
    """Stands in for the per-executor mmdb handle; opened once per
    partition inside lookup_geo (not per row, not on the driver)."""
    return {
        octet: (pais, ciudad)
        for lo, hi, pais, ciudad in _GEO_RANGES
        for octet in range(lo, hi + 1)
    }


def lookup_geo(pdf: pd.DataFrame) -> pd.DataFrame:
    db = _geo_db()  # per-batch handle (≈ per-partition with Arrow batching)
    octets = (
        pdf["request_ip"].str.split(".", expand=True)[1].astype("int64").clip(0, 255)
    )
    looked = octets.map(db)
    return pd.DataFrame(
        {
            "request_ip": pdf["request_ip"],
            "pais": looked.map(lambda t: t[0]),
            "ciudad": looked.map(lambda t: t[1]),
        }
    )
