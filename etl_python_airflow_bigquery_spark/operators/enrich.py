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
# U2 — GeoIP lookup (per-partition mmdb handle over distinct IPs)
# --------------------------------------------------------------------------

GEO_SCHEMA = "request_ip STRING, pais STRING, ciudad STRING"

GEO_FULL_SCHEMA = (
    "request_ip STRING, continent_code STRING, continent_name STRING,"
    " country_code STRING, country_name STRING, region_code STRING,"
    " region_name STRING, city_code BIGINT, city_name STRING,"
    " city_lat DOUBLE, city_lon DOUBLE, time_zone STRING, asn BIGINT,"
    " connection_type STRING, user_type STRING"
)

# Injected path for a real MaxMind database; None ⇒ the offline stand-in.
GEO_DB_PATH: str | None = None

# Deterministic stand-in records shaped EXACTLY like maxminddb's nested
# dicts (reference consumo_detalle.py:199-254), keyed by second octet
# range. The shapes intentionally vary to exercise the full fallback
# ladder: argentina has no 'es' continent name (en fallback), peru has
# no subdivisions and no ASN (absent keys ⇒ NULL columns).
_STANDIN_RECORDS = [
    (0, 63, {
        "continent": {"code": "SA", "names": {"es": "Sudamérica", "en": "South America"}},
        "country": {"iso_code": "CL", "names": {"es": "Chile", "en": "Chile"}},
        "subdivisions": [{"iso_code": "RM", "names": {"es": "Región Metropolitana", "en": "Santiago Metropolitan"}}],
        "city": {"geoname_id": 3871336, "names": {"es": "Santiago", "en": "Santiago"}},
        "location": {"latitude": -33.45, "longitude": -70.66, "time_zone": "America/Santiago"},
        "traits": {"autonomous_system_number": 27651, "connection_type": "Cable/DSL", "user_type": "residential"},
    }),
    (64, 127, {
        "continent": {"code": "SA", "names": {"en": "South America"}},
        "country": {"iso_code": "AR", "names": {"es": "Argentina", "en": "Argentina"}},
        "subdivisions": [{"iso_code": "C", "names": {"es": "Buenos Aires", "en": "Buenos Aires"}}],
        "city": {"geoname_id": 3435910, "names": {"es": "Buenos Aires", "en": "Buenos Aires"}},
        "location": {"latitude": -34.61, "longitude": -58.38, "time_zone": "America/Argentina/Buenos_Aires"},
        "traits": {"autonomous_system_number": 7303, "connection_type": "Cellular", "user_type": "residential"},
    }),
    (128, 191, {
        "continent": {"code": "SA", "names": {"es": "Sudamérica", "en": "South America"}},
        "country": {"iso_code": "PE", "names": {"es": "Perú", "en": "Peru"}},
        "city": {"geoname_id": 3936456, "names": {"en": "Lima"}},
        "location": {"latitude": -12.05, "longitude": -77.04, "time_zone": "America/Lima"},
        "traits": {"connection_type": "Corporate", "user_type": "business"},
    }),
    (192, 255, {
        "continent": {"code": "NA", "names": {"es": "Norteamérica", "en": "North America"}},
        "country": {"iso_code": "MX", "names": {"es": "México", "en": "Mexico"}},
        "subdivisions": [{"iso_code": "CMX", "names": {"es": "Ciudad de México", "en": "Mexico City"}}],
        "city": {"geoname_id": 3530597, "names": {"es": "Ciudad de México", "en": "Mexico City"}},
        "location": {"latitude": 19.43, "longitude": -99.13, "time_zone": "America/Mexico_City"},
        "traits": {"autonomous_system_number": 8151, "connection_type": "Cable/DSL", "user_type": "residential"},
    }),
]


class _StandinGeoDB:
    """Offline stand-in with the maxminddb Reader interface (``get(ip)``
    → nested record dict) so the extraction ladder runs unchanged."""

    def get(self, ip: str) -> dict | None:
        octet = int(ip.split(".")[1])
        for lo, hi, rec in _STANDIN_RECORDS:
            if lo <= octet <= hi:
                return rec
        return None


def open_geo_db(db_path: str | None = None):
    """Per-partition database handle: a REAL ``maxminddb.open_database``
    when the library and an injected path are available (reference
    consumo_detalle.py:200), the deterministic stand-in otherwise. Opened
    once per Arrow batch inside lookup_geo_full — never per row, never on
    the driver."""
    if db_path is not None:
        try:
            import maxminddb  # optional dep, absent in this sandbox
        except ImportError:
            return _StandinGeoDB()
        return maxminddb.open_database(db_path)
    return _StandinGeoDB()


def extract_geo_record(ip: str, rec: dict) -> dict | None:
    """The reference's 15-field extraction with the es→en name fallback
    per field (consumo_detalle.py:211-240), including its quirks: a
    missing region leaves the columns absent, a missing city geoname_id
    DROPS the IP, a missing ASN is null."""
    det: dict = {"request_ip": ip}
    det["continent_code"] = rec["continent"]["code"]
    names = rec["continent"]["names"]
    det["continent_name"] = names.get("es", names.get("en"))
    det["country_code"] = rec["country"]["iso_code"]
    names = rec["country"]["names"]
    det["country_name"] = names.get("es", names.get("en"))
    if "subdivisions" in rec:
        sub = rec["subdivisions"][0]
        det["region_code"] = sub.get("iso_code")
        names = sub.get("names", {})
        det["region_name"] = names.get("es", names.get("en"))
    if "geoname_id" not in rec.get("city", {}):
        return None
    det["city_code"] = rec["city"]["geoname_id"]
    names = rec["city"]["names"]
    det["city_name"] = names.get("es", names.get("en"))
    det["city_lat"] = rec["location"]["latitude"]
    det["city_lon"] = rec["location"]["longitude"]
    det["time_zone"] = rec["location"]["time_zone"]
    det["asn"] = rec["traits"].get("autonomous_system_number")
    det["connection_type"] = rec["traits"]["connection_type"]
    det["user_type"] = rec["traits"]["user_type"]
    return det


_GEO_FULL_COLS = [c.strip().split(" ")[0] for c in GEO_FULL_SCHEMA.split(",")]


def lookup_geo_full(pdf: pd.DataFrame) -> pd.DataFrame:
    """Full 15-column GeoIP enrichment over distinct IPs (Arrow batch in,
    Arrow batch out); per-batch handle ≈ per-partition with batching."""
    db = open_geo_db(GEO_DB_PATH)
    rows = []
    for ip in pdf["request_ip"]:
        rec = db.get(ip)
        if rec is None:
            continue
        det = extract_geo_record(ip, rec)
        if det is not None:
            rows.append(det)
    out = pd.DataFrame(rows, columns=_GEO_FULL_COLS)
    for int_col in ("city_code", "asn"):
        out[int_col] = out[int_col].astype("Int64")
    for dbl_col in ("city_lat", "city_lon"):
        out[dbl_col] = out[dbl_col].astype("float64")
    return out


def lookup_geo(pdf: pd.DataFrame) -> pd.DataFrame:
    """2-column convenience wrapper (pais/ciudad) over the full lookup —
    kept for pipelines that only need the country split."""
    full = lookup_geo_full(pdf)
    return pd.DataFrame(
        {
            "request_ip": full["request_ip"],
            "pais": full["country_name"].str.lower(),
            "ciudad": full["city_name"].str.lower(),
        }
    )
