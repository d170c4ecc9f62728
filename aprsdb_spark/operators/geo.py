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
    only over-select, never under-select.

    Antimeridian-safe: the exact haversine is wrap-safe by construction
    (sin²(Δλ/2) has period 360° in Δλ), and when the padded box crosses
    ±180° the lon prefilter becomes the wrapped OR of two ranges — still
    sargable (each leg pushes to row-group stats), still a necessary
    condition, so the result set stays provably identical."""
    dlat = radius_km / 111.19
    # widest |lon| span inside the lat band
    worst_lat = min(89.9, abs(qlat) + dlat)
    dlon = radius_km / (111.19 * math.cos(math.radians(worst_lat)))
    lat, lon = F.col(lat_col), F.col(lon_col)
    lon_lo, lon_hi = qlon - dlon, qlon + dlon
    if dlon >= 180.0:
        lon_pred = F.lit(True)  # radius spans all longitudes at this lat
    elif lon_lo < -180.0:
        lon_pred = (lon >= lon_lo + 360.0) | (lon <= lon_hi)
    elif lon_hi > 180.0:
        lon_pred = (lon >= lon_lo) | (lon <= lon_hi - 360.0)
    else:
        lon_pred = lon.between(lon_lo, lon_hi)
    boxed = df.where(lat.between(qlat - dlat, qlat + dlat) & lon_pred)
    return boxed.where(
        haversine_km(lat, lon, F.lit(qlat), F.lit(qlon)) <= radius_km
    )


def geo_pairs_within(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 70.0,
) -> DataFrame:
    """All pairs of rows within radius_km of each other — WITHOUT the
    O(n²) cross join: assign each point a grid cell sized >= radius, so
    any qualifying pair sits in the same or an adjacent cell; explode
    one side to its 3x3 cell neighborhood and equi-join on the cell key.

    Shuffle cost is O(9n) rows hashed by cell instead of n² pair
    evaluations; the exact haversine runs only on co-celled candidates.
    Output: (id_a, id_b, dist_km) with id_a < id_b, exact.

    EXPLICIT DOMAIN RESTRICTION: requires |lat| <= max_abs_lat (cell
    widths degenerate at the poles) AND pairs must not straddle the
    ±180° antimeridian — integer cell ids floor(lon/cell) are not
    adjacent across the wrap, so a pair at lon 179.9 / -179.9 is
    missed. The fixture domain (and APRS-IS traffic generally) is far
    from both; a global deployment would explode wrap-adjacent cells
    into the neighbor array the same way the 3x3 neighborhood already
    does for interior cells.
    """
    lat_cell = radius_km / 111.0
    # widest lon span a radius can cover at the most extreme usable lat
    lon_cell = radius_km / (111.0 * math.cos(math.radians(min(89.0, max_abs_lat + lat_cell))))
    lat, lon = F.col(lat_col), F.col(lon_col)
    pts = df.select(
        F.col(id_col).alias("_id"),
        lat.alias("_lat"),
        lon.alias("_lon"),
        F.floor(lat / lat_cell).cast("int").alias("_cy"),
        F.floor(lon / lon_cell).cast("int").alias("_cx"),
    )
    neighbors = F.array(
        *[
            F.struct(
                (F.col("_cy") + dy).alias("cy"), (F.col("_cx") + dx).alias("cx")
            )
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        F.explode(neighbors).alias("_cell"),
    ).select("id_a", "lat_a", "lon_a", F.col("_cell.cy").alias("cy"), F.col("_cell.cx").alias("cx"))
    right = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("_cy").alias("cy"),
        F.col("_cx").alias("cx"),
    )
    d = haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    return (
        left.join(right, ["cy", "cx"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(d <= radius_km)
        .select("id_a", "id_b", d.alias("dist_km"))
    )
