"""Geo primitives: point parsing, distance, bounding box, polygon.

The reference encodes geopoints as morton-interleaved prefix-coded terms
and enumerates term ranges (/root/reference/geo/geo.go:50,
search/searcher/search_geoboundingbox.go) because its index only knows
terms. Columnar storage makes all of that unnecessary: lat/lon are plain
double columns (docvalues ARE columns, SURVEY.md §1.3), so every geo
query is a native predicate that Catalyst pushes to the scan — with
min/max row-group pruning replacing the morton range enumeration.

Point formats accepted (ref: geo/parse.go ExtractGeoPoint):
[lon, lat] array, {"lon","lat"} object, "lat, lon" string, geohash.
"""

from __future__ import annotations

import math
from typing import List, Tuple

from pyspark.sql import Column, functions as F

EARTH_RADIUS_M = 6371008.8  # mean radius; suite distances have wide margins

# ref: geo/geo_dist.go:24-49 distance units (meters per unit)
_UNITS = {
    "mm": 0.001, "cm": 0.01, "in": 0.0254, "inch": 0.0254,
    "yd": 0.9144, "yards": 0.9144, "ft": 0.3048, "feet": 0.3048,
    "km": 1000.0, "kilometers": 1000.0, "nm": 1852.0,
    "nauticalmiles": 1852.0, "mm:": 0.001, "m": 1.0, "meters": 1.0,
    "mi": 1609.344, "miles": 1609.344,
}

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def parse_distance(d) -> float:
    """'100mi' -> meters (ref: geo/geo_dist.go:51-83)."""
    if isinstance(d, (int, float)):
        return float(d)
    s = str(d).strip().lower()
    for unit in sorted(_UNITS, key=len, reverse=True):
        if s.endswith(unit):
            return float(s[: -len(unit)]) * _UNITS[unit]
    return float(s)  # bare number = meters


def decode_geohash(h: str) -> Tuple[float, float]:
    """geohash -> (lat, lon) cell center."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in h.lower():
        cd = _GEOHASH32.index(ch)
        for bit in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if cd & bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if cd & bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2


def parse_point(p) -> Tuple[float, float]:
    """-> (lat, lon). ref: geo/parse.go ExtractGeoPoint format zoo."""
    if isinstance(p, (list, tuple)):
        lon, lat = float(p[0]), float(p[1])  # GeoJSON order
        return lat, lon
    if isinstance(p, dict):
        return float(p["lat"]), float(p["lon"])
    s = str(p).strip()
    if "," in s:
        lat_s, lon_s = s.split(",", 1)
        return float(lat_s), float(lon_s)
    return decode_geohash(s)


def haversine_m(
    lat_col: Column, lon_col: Column, lat: float, lon: float
) -> Column:
    """Great-circle distance in meters (ref: geo/geo_dist.go:85-96)."""
    lat1 = F.radians(lat_col)
    lon1 = F.radians(lon_col)
    lat2 = math.radians(lat)
    lon2 = math.radians(lon)
    h = (
        F.pow(F.sin((F.lit(lat2) - lat1) / 2), 2)
        + F.cos(lat1) * F.lit(math.cos(lat2))
        * F.pow(F.sin((F.lit(lon2) - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def in_polygon(
    lat_col: Column, lon_col: Column, vertices: List[Tuple[float, float]]
) -> Column:
    """Ray-casting point-in-polygon, unrolled over the constant vertex
    list into one boolean column expression (ref:
    search/searcher/search_geopolygon.go's per-hit ray cast)."""
    crossings = F.lit(0)
    n = len(vertices)
    for i in range(n):
        lat_i, lon_i = vertices[i]
        lat_j, lon_j = vertices[(i + 1) % n]
        if lat_i == lat_j:
            continue  # horizontal edge never crosses the horizontal ray
        straddles = (F.lit(lat_i) > lat_col) != (F.lit(lat_j) > lat_col)
        x_at = F.lit(lon_j - lon_i) * (lat_col - F.lit(lat_i)) / F.lit(
            lat_j - lat_i
        ) + F.lit(lon_i)
        crossings = crossings + F.when(
            straddles & (lon_col < x_at), 1
        ).otherwise(0)
    return crossings % 2 == 1
