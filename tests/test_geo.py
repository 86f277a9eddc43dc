"""Tile math: cross-check the Column implementations against the reference
formulas (geo/LongitudeToTile.go:15-17, geo/LatitudeToTile.go:15-18) and the
driver-side inverse transforms."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from railgun_spark.geo.tiles import (
    bbox_filter,
    flip_y,
    tile_bbox,
    tile_to_lat,
    tile_to_lon,
    tile_x,
    tile_y,
)


def _py_tile_x(lon: float, z: int) -> int:
    return int((180.0 + lon) * (2.0**z) / 360.0)


def _py_tile_y(lat: float, z: int) -> int:
    rad = math.radians(lat)
    return int((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * (2.0**z))


CASES = [(-77.032, 38.899), (0.0, 0.0), (-179.9, 84.9), (179.9, -84.9), (13.4, 52.5)]


def test_tile_xy_matches_reference_formula(spark):
    df = spark.createDataFrame([(lon, lat) for lon, lat in CASES], ["lon", "lat"])
    for z in (0, 4, 10, 18):
        rows = df.select(
            tile_x(F.col("lon"), z).alias("x"), tile_y(F.col("lat"), z).alias("y"), "lon", "lat"
        ).collect()
        for r in rows:
            assert r["x"] == _py_tile_x(r["lon"], z), (r, z)
            assert r["y"] == _py_tile_y(r["lat"], z), (r, z)


def test_tile_roundtrip():
    for z in (2, 8, 14):
        for x, y in [(0, 0), (2**z - 1, 2**z - 1), (2 ** (z - 1), 2 ** (z - 2))]:
            lon, lat = tile_to_lon(x + 0.0, z), tile_to_lat(y + 0.0, z)
            # the tile whose NW corner this is
            assert _py_tile_x(lon + 1e-9, z) == x
            assert _py_tile_y(lat - 1e-9, z) == y


def test_tile_bbox_ordering():
    w, s, e, n = tile_bbox(10, 292, 391)
    assert w < e and s < n


def test_flip_y():
    assert flip_y(0, 3) == 7
    assert flip_y(flip_y(5, 10), 10) == 5


def test_bbox_filter_null_safe(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 2.0), (1.0, None), (200.0, 2.0)], ["lon", "lat"]
    )
    got = df.filter(bbox_filter(F.col("lon"), F.col("lat"), (-10.0, -10.0, 10.0, 10.0))).count()
    assert got == 1


def test_morton_key_matches_reference(spark):
    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import morton_key, morton_key_py

    rows = [(x, y) for x in (0, 1, 5, 1023, 4095) for y in (0, 2, 7, 511, 4095)]
    df = spark.createDataFrame(rows, "tx: long, ty: long")
    got = {
        (r["tx"], r["ty"]): r["m"]
        for r in df.withColumn("m", morton_key(F.col("tx"), F.col("ty"), 12)).collect()
    }
    for (tx, ty), m in got.items():
        assert m == morton_key_py(tx, ty, 12), (tx, ty)
    # locality sanity: adjacent tiles differ less than far tiles
    assert abs(morton_key_py(100, 100, 12) - morton_key_py(101, 100, 12)) < abs(
        morton_key_py(100, 100, 12) - morton_key_py(2000, 3000, 12)
    )


def test_write_zordered_clusters_files(spark, tmp_path):
    """Morton-sorted output: per-file _morton ranges must be (near-)disjoint,
    which is exactly what gives parquet min/max stats their pruning power."""
    import math as _m

    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import write_zordered

    df = spark.range(2000).select(
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        ((F.col("id") * 7 % 170) - 85.0 + 0.5).alias("lat"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, F.col("lon"), F.col("lat"), zoom=10, num_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 2000
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("_morton").alias("lo"), F.max("_morton").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file Morton ranges overlap — clustering broken"


def test_read_zordered_bbox_prunes_and_matches(spark, tmp_path):
    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import read_zordered, write_zordered

    df = spark.range(3000).select(
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        ((F.col("id") * 7 % 170) - 85.0 + 0.5).alias("lat"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "zr")
    write_zordered(df, out, F.col("lon"), F.col("lat"), zoom=10, num_files=8)
    bbox = (-10.0, -10.0, 10.0, 10.0)
    got = read_zordered(spark, out, bbox, zoom=10)
    # tile-level superset: every exact in-bbox row is present
    exact = df.filter(
        F.col("lon").between(-10.0, 10.0) & F.col("lat").between(-10.0, 10.0)
    ).count()
    inside = got.filter(
        F.col("lon").between(-10.0, 10.0) & F.col("lat").between(-10.0, 10.0)
    ).count()
    assert exact > 0 and inside == exact
    # pruning: the tile-range predicate reaches the parquet scan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    assert "_tile_x" in buf.getvalue() and "PushedFilters" in buf.getvalue()


def test_geohash_known_vectors(spark):
    """Public geohash test vectors (geohash.org convention)."""
    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import geohash

    cases = [(-5.603, 42.605, "ezs42"), (-74.0060, 40.7128, "dr5re"),
             (139.6917, 35.6895, "xn774"), (0.0, 0.0, "s0000")]
    df = spark.createDataFrame([(lo, la) for lo, la, _ in cases], ["lon", "lat"])
    got = [r[0] for r in df.select(geohash(F.col("lon"), F.col("lat"))).collect()]
    assert got == [g for _, _, g in cases]


def test_geohash_prefix_hierarchy(spark):
    """Truncating a geohash yields the ancestor cell's hash: the MSB-first
    alternating bit plan nests across precisions (the property that makes
    zoom-out rollups a substring groupBy)."""
    import numpy as np

    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import geohash

    rng = np.random.default_rng(7)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 179.999, 200), rng.uniform(-85, 85, 200))]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    rows = df.select(
        geohash(F.col("lon"), F.col("lat"), 5).alias("g5"),
        geohash(F.col("lon"), F.col("lat"), 3).alias("g3"),
        geohash(F.col("lon"), F.col("lat"), 1).alias("g1"),
    ).collect()
    for r in rows:
        assert r["g5"][:3] == r["g3"] and r["g5"][:1] == r["g1"]


def test_geohash_pole_and_antimeridian_clamp(spark):
    """lat=90 / lon=180 quantize one past the last cell; the clamp must
    keep them in the adjacent (north/east) cell, not wrap to south/west."""
    from pyspark.sql import functions as F

    from railgun_spark.geo.tiles import geohash

    df = spark.createDataFrame(
        [(0.0, 90.0), (0.0, 89.9999999), (0.0, -90.0), (180.0, 0.0), (179.9999999, 0.0)],
        ["lon", "lat"],
    )
    g = [r[0] for r in df.select(geohash(F.col("lon"), F.col("lat"))).collect()]
    assert g[0] == g[1]  # north pole == just-south-of-pole cell
    assert g[0] != g[2]  # and NOT the south pole
    assert g[3] == g[4]  # +180 == just-west-of-antimeridian cell
