"""Geo range filtering — the APRS-IS `r/lat/lon/dist` server filter at
engine scale.

The exact predicate is haversine(p, q) <= R (pure column expressions,
functions/exprs-style — no UDF). At 100 TB you never evaluate the trig
on every row: a bounding-box prefilter (a NECESSARY condition of the
haversine predicate) goes first. It's sargable — simple numeric
comparisons that push down to parquet row-group min/max stats and prune
IO — while the exact haversine runs only on the ~R²/area survivors.
Result set is provably identical to the unfiltered predicate.

For repeated/geo-partitioned workloads the same idea becomes a grid
cell key (floor(lat/cell), floor(lon/cell)) used as a partition column
or join key; `grid_cell` provides it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float = 1.0) -> Column:
    """Stable integer cell id for partitioning/joining on coarse location."""
    return F.struct(
        F.floor(lat / cell_deg).cast("int").alias("cy"),
        F.floor(lon / cell_deg).cast("int").alias("cx"),
    )


def within_radius(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    qlat: float,
    qlon: float,
    radius_km: float,
) -> DataFrame:
    """All rows within radius_km of (qlat, qlon): sargable bbox prefilter
    then exact haversine. 1 deg lat = ~111.19 km; lon shrinks by cos(lat).
    The bbox is padded (floor of cos towards the pole side) so it can
    only over-select, never under-select."""
    dlat = radius_km / 111.19
    # widest |lon| span inside the lat band
    worst_lat = min(89.9, abs(qlat) + dlat)
    dlon = radius_km / (111.19 * math.cos(math.radians(worst_lat)))
    lat, lon = F.col(lat_col), F.col(lon_col)
    boxed = df.where(
        lat.between(qlat - dlat, qlat + dlat) & lon.between(qlon - dlon, qlon + dlon)
    )
    return boxed.where(
        haversine_km(lat, lon, F.lit(qlat), F.lit(qlon)) <= radius_km
    )
