"""Geo operator tests (reference: tests/Integration/Geo/*, tests/Unit/Geo/*)."""

import math

import pytest

from yetisearch_spark import geo


@pytest.fixture(scope="module")
def places(spark):
    rows = [
        # id, name, lat, lng
        (1, "paris-center", 48.8566, 2.3522),
        (2, "paris-north", 48.90, 2.35),
        (3, "london", 51.5074, -0.1278),
        (4, "nyc", 40.7128, -74.0060),
        (5, "sydney", -33.8688, 151.2093),
        (6, "fiji-west", -17.7, 179.9),     # antimeridian neighbors
        (7, "fiji-east", -17.7, -179.9),
        (8, "north-pole-ish", 89.5, 10.0),
    ]
    return spark.createDataFrame(rows, "id int, name string, lat double, lng double")


def test_haversine_known_distance(places):
    # Paris → London ≈ 343.5 km (SQL-variant constants)
    d = geo.haversine_m_py(48.8566, 2.3522, 51.5074, -0.1278)
    assert abs(d / 1000 - 343.5) < 1.5
    rows = places.select("name", geo.haversine_m(48.8566, 2.3522).alias("d")).collect()
    by_name = {r["name"]: r["d"] for r in rows}
    assert abs(by_name["london"] - d) < 1e-6  # column expr == python twin
    assert by_name["paris-center"] < 1.0


def test_within_radius(places):
    hits = geo.within_radius(places, 48.8566, 2.3522, 10_000).collect()
    names = {r["name"] for r in hits}
    assert names == {"paris-center", "paris-north"}
    assert all(r["distance"] <= 10_000 for r in hits)


def test_knn(places):
    rows = geo.knn(places, 48.8566, 2.3522, 3).collect()
    assert [r["name"] for r in rows] == ["paris-center", "paris-north", "london"]
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)


def test_knn_max_distance(places):
    rows = geo.knn(places, 48.8566, 2.3522, 10, max_distance_m=400_000).collect()
    assert {r["name"] for r in rows} == {"paris-center", "paris-north", "london"}


def test_antimeridian_bbox(places):
    # 50 km box around (-17.7, 179.95) must catch both fiji points
    box = geo.bounding_box(-17.7, 179.95, 50_000)
    # force the wrap case: west > east after normalization
    if box["east"] > 180:
        box["east"] -= 360
    hits = places.where(geo.bbox_predicate(box)).collect()
    names = {r["name"] for r in hits}
    assert {"fiji-west", "fiji-east"} <= names


def test_pole_bbox_full_longitude():
    box = geo.bounding_box(89.9, 0.0, 100_000)
    assert box["west"] == -180.0 and box["east"] == 180.0
    assert box["north"] <= 90.0


def test_distance_facet(places):
    rows = geo.distance_facet(places, 48.8566, 2.3522,
                              [10_000, 500_000]).collect()
    counts = {r["bucket"]: r["count"] for r in rows}
    assert counts["<=10000m"] == 2       # the two paris points
    assert counts["<=500000m"] == 1      # london
    assert counts[">500000m"] == 5


def test_bearing_and_cardinal():
    assert geo.bearing_to_cardinal(geo.bearing_deg(0, 0, 10, 0)) == "N"
    assert geo.bearing_to_cardinal(geo.bearing_deg(0, 0, 0, 10)) == "E"
    assert geo.bearing_to_cardinal(geo.bearing_deg(0, 0, -10, 0)) == "S"
    assert geo.bearing_to_cardinal(geo.bearing_deg(0, 0, 0, -10)) == "W"
    assert geo.bearing_to_cardinal(22.5) == "NNE"


def test_units_and_format():
    assert geo.to_meters(1, "km") == 1000.0
    assert abs(geo.to_meters(1, "mi") - 1609.344) < 1e-9
    assert geo.format_distance(500) == "500 m"
    assert geo.format_distance(2500) == "2.5 km"
    assert geo.format_distance(3218.688, "mi") == "2.0 mi"


def test_blend_distance_score(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(80.0, 0.0), (80.0, 10_000.0)], "ts double, d double")
    rows = (df.select(geo.blend_distance_score(F.col("ts"), F.col("d"), 0.5)
                      .alias("s")).collect())
    assert rows[0]["s"] > rows[1]["s"]
    assert abs(rows[0]["s"] - (0.5 * 80 + 0.5 * 100)) < 1e-9
