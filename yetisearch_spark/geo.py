"""Geo operators (C1-C6, J2, O6, A2) — Catalyst column expressions.

The reference uses an R-tree + SQL haversine on the bbox centroid
(reference: src/Storage/SqliteStorage.php:2224-2273,1988-2209,
src/Geo/GeoPoint.php:50-111, src/Geo/GeoBounds.php:86-130,
src/Search/SearchEngine.php:831-848). On Spark there is no R-tree and
none is needed: the bounding-box prefilter is a plain range predicate
(min/max-pruned at the parquet scan), and the exact haversine is a
whole-stage-codegen column expression.

Distances follow the reference's *SQL* variant (R = 6371.0 km,
``asin(least(1, sqrt(a)))`` clamp, meters out) — that is the number the
reference returns in result sets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0
EARTH_RADIUS_M = 6371000.0
METERS_PER_MILE = 1609.344


# ---------------------------------------------------------------------------
# C1: haversine distance (meters) as a column expression
# ---------------------------------------------------------------------------

def haversine_m(lat: float, lng: float,
                lat_col: str | Column = "lat",
                lng_col: str | Column = "lng") -> Column:
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lng_c = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    r1 = F.lit(math.radians(lat))
    t1 = F.lit(math.radians(lng))
    r2 = F.radians(lat_c)
    t2 = F.radians(lng_c)
    a = (F.pow(F.sin((r2 - r1) / 2.0), 2)
         + F.cos(r1) * F.cos(r2) * F.pow(F.sin((t2 - t1) / 2.0), 2))
    km = 2.0 * EARTH_RADIUS_KM * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    return km * 1000.0


def haversine_m_py(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Driver-side twin of haversine_m (same SQL-variant constants)."""
    r1, t1, r2, t2 = map(math.radians, (lat1, lng1, lat2, lng2))
    a = (math.sin((r2 - r1) / 2.0) ** 2
         + math.cos(r1) * math.cos(r2) * math.sin((t2 - t1) / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(a))) * 1000.0


# ---------------------------------------------------------------------------
# C3: bounding box from point + radius (pole handling)
# ---------------------------------------------------------------------------

def bounding_box(lat: float, lng: float, radius_m: float) -> dict:
    """{north, south, east, west} degrees (reference GeoPoint::getBoundingBox)."""
    ang = radius_m / EARTH_RADIUS_M
    lat_r, lng_r = math.radians(lat), math.radians(lng)
    min_lat, max_lat = lat_r - ang, lat_r + ang
    if min_lat > math.radians(-90) and max_lat < math.radians(90):
        delta = math.asin(min(1.0, math.sin(ang) / math.cos(lat_r)))
        min_lng, max_lng = lng_r - delta, lng_r + delta
    else:
        min_lat = max(min_lat, math.radians(-90))
        max_lat = min(max_lat, math.radians(90))
        min_lng, max_lng = math.radians(-180), math.radians(180)
    return {"north": math.degrees(max_lat), "south": math.degrees(min_lat),
            "east": math.degrees(max_lng), "west": math.degrees(min_lng)}


# ---------------------------------------------------------------------------
# C4: bbox predicate with antimeridian split
# ---------------------------------------------------------------------------

def bbox_predicate(bounds: dict, lat_col: str = "lat",
                   lng_col: str = "lng") -> Column:
    """Range predicate; if the box crosses ±180°, the longitude condition
    becomes a disjunction (reference: src/Storage/SqliteStorage.php:2159-2166)."""
    lat_c, lng_c = F.col(lat_col), F.col(lng_col)
    lat_ok = lat_c.between(bounds["south"], bounds["north"])
    west, east = bounds["west"], bounds["east"]
    if west > east:  # crosses the antimeridian
        lng_ok = (lng_c >= west) | (lng_c <= east)
    else:
        lng_ok = lng_c.between(west, east)
    return lat_ok & lng_ok


# ---------------------------------------------------------------------------
# Geo query operators over a DataFrame with lat/lng columns
# ---------------------------------------------------------------------------

def within_radius(df: DataFrame, lat: float, lng: float, radius_m: float,
                  lat_col: str = "lat", lng_col: str = "lng") -> DataFrame:
    """bbox prefilter (index-prunable) + exact haversine filter, distance
    column attached (the reference's near-filter shape)."""
    box = bounding_box(lat, lng, radius_m)
    return (df.where(bbox_predicate(box, lat_col, lng_col))
            .withColumn("distance", haversine_m(lat, lng, lat_col, lng_col))
            .where(F.col("distance") <= radius_m))


def knn(df: DataFrame, lat: float, lng: float, k: int,
        max_distance_m: float | None = None,
        lat_col: str = "lat", lng_col: str = "lng") -> DataFrame:
    """O6: ORDER BY distance LIMIT k (k clamped 1..1000 like the
    reference, src/Storage/SqliteStorage.php:916-989)."""
    k = max(1, min(int(k), 1000))
    out = df.withColumn("distance", haversine_m(lat, lng, lat_col, lng_col))
    if max_distance_m is not None:
        out = out.where(F.col("distance") <= max_distance_m)
    return out.orderBy(F.asc("distance")).limit(k)


def distance_facet(df: DataFrame, lat: float, lng: float,
                   thresholds_m: list[float],
                   lat_col: str = "lat", lng_col: str = "lng") -> DataFrame:
    """A2: bucket rows by distance thresholds (≤r1, ≤r2, …, overflow)
    (reference: src/Search/SearchEngine.php:1193-1257)."""
    d = haversine_m(lat, lng, lat_col, lng_col)
    expr = None
    for t in sorted(thresholds_m):
        label = f"<={int(t)}m"
        expr = F.when(d <= t, label) if expr is None else expr.when(d <= t, label)
    expr = expr.otherwise(f">{int(max(thresholds_m))}m")
    return (df.withColumn("bucket", expr).groupBy("bucket").count()
            .orderBy("bucket"))


def distance_sort(df: DataFrame, lat: float, lng: float,
                  lat_col: str = "lat", lng_col: str = "lng") -> DataFrame:
    return (df.withColumn("distance", haversine_m(lat, lng, lat_col, lng_col))
            .orderBy(F.asc("distance")))


# ---------------------------------------------------------------------------
# C5: bearing + cardinal; C6: unit conversions; R6: distance blending
# ---------------------------------------------------------------------------

_CARDINALS = ["N", "NNE", "NE", "ENE", "E", "ESE", "SE", "SSE",
              "S", "SSW", "SW", "WSW", "W", "WNW", "NW", "NNW"]


def bearing_deg(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lng2 - lng1)
    y = math.sin(dl) * math.cos(p2)
    x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
    return (math.degrees(math.atan2(y, x)) + 360.0) % 360.0


def bearing_to_cardinal(bearing: float) -> str:
    return _CARDINALS[int(round((bearing % 360) / 22.5)) % 16]


def to_meters(value: float, unit: str) -> float:
    unit = unit.lower()
    if unit in ("m", "meters"):
        return value
    if unit in ("km", "kilometers"):
        return value * 1000.0
    if unit in ("mi", "miles"):
        return value * METERS_PER_MILE
    raise ValueError(f"unknown unit {unit!r}")


def format_distance(meters: float, units: str = "m") -> str:
    """Presentation helper (reference: src/Geo/GeoUtils.php:163-181)."""
    if units == "mi":
        miles = meters / METERS_PER_MILE
        return f"{miles:.1f} mi" if miles >= 0.1 else f"{meters * 3.28084:.0f} ft"
    km = meters / 1000.0
    return f"{km:.1f} km" if km >= 1 else f"{meters:.0f} m"


def blend_distance_score(text_score: Column, distance_m: Column,
                         weight: float, k_per_km: float = 0.05) -> Column:
    """R6: final = (1−w)·text + w·100·exp(−k·km)
    (reference: src/Search/SearchEngine.php:760-769)."""
    km = distance_m / 1000.0
    return ((1.0 - weight) * text_score
            + weight * 100.0 * F.exp(-k_per_km * km))
