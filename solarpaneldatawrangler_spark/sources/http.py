"""External HTTP sources (SURVEY.md §2.1 S3/S4/S7/S8): Nominatim city
boundaries, Overpass OSM solar nodes, Mapbox static imagery.

Architecture: fetching happens inside mapInPandas partitions with an
injected ``fetch_fn`` so the engine is testable offline (the driver
environment has no network). Each source is:

  request-keys DataFrame -> anti-join already-fetched keys (idempotent
  incremental, reference gather()'s skip-if-exists,
  /root/reference/gather_city_shapes.py:27-31) -> partition-level fetch
  with exponential backoff (reference imagery.py:141-177) -> typed rows.

Rate limiting at scale: repartition the request set to
``max_concurrency`` partitions — per-partition sequential fetching bounds
cluster-wide parallel requests, replacing the reference's single-thread
politeness with a tunable cap.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_RETRIES = 12  # reference ceiling, /root/reference/imagery.py:141

# Overpass QL template for solar generators within a polygon boundary —
# the reference's query shape (/root/reference/solardb.py:175-186):
# union of node/way/relation selects with a poly filter, 2500 s timeout.
OVERPASS_SOLAR_TEMPLATE = (
    '[out:json][timeout:2500];'
    '(node["generator:source"="solar"](poly:"{poly}");'
    'way["generator:source"="solar"](poly:"{poly}");'
    'relation["generator:source"="solar"](poly:"{poly}"););'
    "out center;"
)


def default_fetch(url: str) -> bytes:
    """Network fetch via requests, if available. Offline environments
    inject a mock instead."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "no requests library in this environment — inject fetch_fn"
        ) from exc
    resp = requests.get(url, timeout=60)
    resp.raise_for_status()
    return resp.content


def fetch_with_backoff(
    fetch_fn: Callable[[str], bytes],
    url: str,
    max_retries: int = MAX_RETRIES,
    base_sleep: float = 1.0,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> bytes:
    """Exponential backoff (2^attempt * base), reference semantics
    (/root/reference/imagery.py:159-177) without the ~34-minute stall:
    the cap is configurable per source."""
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fetch_fn(url)
        except Exception as exc:  # noqa: BLE001 — source errors are retryable
            last = exc
            sleep_fn(base_sleep * (2**attempt))
    raise RuntimeError(f"fetch failed after {max_retries} retries: {url}") from last


def http_source(
    requests_df: DataFrame,
    url_col: str,
    fetch_fn: Callable[[str], bytes] = default_fetch,
    already_fetched: DataFrame | None = None,
    key_cols: list[str] | None = None,
    max_concurrency: int = 8,
) -> DataFrame:
    """Generic partition-level HTTP source: returns the request rows plus
    a ``content`` binary column. Idempotent: rows whose key already
    appears in ``already_fetched`` are skipped (anti-join) — the
    restartable-download pattern."""
    if already_fetched is not None and key_cols:
        requests_df = requests_df.join(
            already_fetched.select(*key_cols), on=key_cols, how="left_anti"
        )
    requests_df = requests_df.repartition(max_concurrency)
    # fresh StructType: df.schema is cached on the DataFrame and .add()
    # mutates it in place, which would corrupt requests_df.columns
    from pyspark.sql import types as T

    schema = T.StructType(
        list(requests_df.schema.fields) + [T.StructField("content", T.BinaryType())]
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = [
                fetch_with_backoff(fetch_fn, u) for u in pdf[url_col]
            ]
            yield pdf

    return requests_df.mapInPandas(fetch_partition, schema)


def nominatim_city_requests(cities: DataFrame) -> DataFrame:
    """S3: (city, state) -> Nominatim polygon query URL (the reference's
    query params, /root/reference/gather_city_shapes.py:38-44)."""
    q = F.concat_ws(
        "",
        F.lit("https://nominatim.openstreetmap.org/search?city="),
        F.regexp_replace("city", " ", "+"),
        F.lit("&state="),
        F.regexp_replace("state", " ", "+"),
        F.lit("&country=USA&polygon_geojson=1&format=json"),
    )
    return cities.withColumn("url", q)


def mapbox_tile_url(
    column, row, zoom: int, grid_size: int = 20, token: str = "TOKEN"
) -> F.Column:
    """S8: super-grid-snapped Mapbox Static request key — one 1280x1280
    request covers grid_size^2 tiles (/root/reference/imagery.py:104-110,146-181)."""
    from solarpaneldatawrangler_spark.functions.tiles import (
        grid_snap,
        num2deg_lat,
        num2deg_lon,
    )

    base_c = grid_snap(column, grid_size) + F.lit(grid_size / 2.0)
    base_r = grid_snap(row, grid_size) + F.lit(grid_size / 2.0)
    lon = num2deg_lon(base_c, zoom, center=False)
    lat = num2deg_lat(base_r, zoom, center=False)
    return F.concat_ws(
        "",
        F.lit("https://api.mapbox.com/styles/v1/mapbox/satellite-v9/static/"),
        lon.cast("string"), F.lit(","), lat.cast("string"),
        F.lit(f",{zoom - 2},0,0/1280x1280?access_token={token}"),
    )
