"""DFL parser + compiler golden tests, derived from the reference's
executable examples (SURVEY §5): bars.dfl, mexican.dfl, the README tsunami
pipeline, geonames.dfl stream-mode semantics, osm.sh histograms."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from railgun_spark.dfl import parse, process, run_pipeline
from railgun_spark.dfl.ast import (
    Attribute,
    Between,
    Binary,
    Call,
    DictNode,
    Literal,
    Pipeline,
    SetNode,
    Ternary,
)


# ---------------- parser ----------------

def test_parse_bare_words_are_strings():
    node = parse("@properties.amenity == bar")
    assert isinstance(node, Binary) and node.op == "=="
    assert node.right == Literal("bar")


def test_parse_null_safe_attribute_path():
    node = parse("@properties?.name")
    assert node == Attribute(("properties", "name"))


def test_parse_set_vs_dict():
    assert isinstance(parse("{sushi, japanese}"), SetNode)
    d = parse("{cuisines: {sushi, japanese}, limit: 10}")
    assert isinstance(d, DictNode)
    assert isinstance(d.pairs[0][1], SetNode)


def test_parse_between_and_ternary_and_elvis():
    b = parse("@x between 0 and 10")
    assert isinstance(b, Between)
    t = parse("(@x > 0) ? @x : 0")
    assert isinstance(t, Ternary)
    e = parse('@properties?.place ?: ""')
    assert isinstance(e, Binary) and e.op == "?:"


def test_parse_pipeline_and_index():
    p = parse("filter(@, '@a == 1') | limit(@, 5)")
    assert isinstance(p, Pipeline) and len(p.stages) == 2
    ix = parse("@geometry.coordinates[0]")
    assert ix.base == Attribute(("geometry", "coordinates"))


def test_parse_in_membership():
    node = parse("@properties.amenity in [clinic, doctors, hospital]")
    assert node.op == "in"


# ---------------- fixtures ----------------

@pytest.fixture(scope="module")
def osm(spark):
    rows = [
        Row(
            type="Feature",
            id=i,
            properties=Row(
                name=name, amenity=amenity, cuisine=cuisine, _tile_z=10, _tile_x=292, _tile_y=391
            ),
            geometry=Row(type="Point", coordinates=[lon, lat]),
        )
        for i, (name, amenity, cuisine, lon, lat) in enumerate(
            [
                ("Bar None", "bar", None, -77.03, 38.89),
                ("Taco Fiesta", "restaurant", "mexican", -77.01, 38.90),
                ("TACO town", "restaurant", "mexican", -77.02, 38.91),
                ("Sushi Go", "restaurant", "japanese", -77.04, 38.92),
                ("Quiet Bar", "bar", None, -77.05, 38.93),
                ("Clinic A", "clinic", None, -77.06, 38.94),
                (None, "bar", None, -77.07, 38.95),
            ]
        )
    ]
    return spark.createDataFrame(rows)


# ---------------- pipelines (batch mode) ----------------

def test_bars_pipeline(osm):
    # examples/bars.dfl:8-12
    out = run_pipeline(
        osm,
        "filter(@, '(@properties?.amenity != null) and (@properties?.amenity == bar)') "
        "| map(@, '@properties?.name') | array(set(@)) | sort(@) | limit(@, 10)",
    )
    names = [r["value"] for r in out.collect()]
    assert names == [None, "Bar None", "Quiet Bar"]


def test_mexican_ilike_pipeline(osm):
    # examples/mexican.dfl:8-12
    out = run_pipeline(
        osm,
        "filter(@, '(@properties?.name != null) and (@properties?.name ilike %taco%)') "
        "| map(@, '@properties?.name') | array(set(@)) | sort(@)",
    )
    assert [r["value"] for r in out.collect()] == ["TACO town", "Taco Fiesta"]


def test_membership_and_hist(osm):
    out = run_pipeline(
        osm,
        "filter(@, '@properties.amenity in [bar, clinic]') | hist(@, '@properties.amenity')",
    )
    got = {r["key"]: r["count"] for r in out.collect()}
    assert got == {"bar": 3, "clinic": 1}


def test_len_scalar(osm):
    assert run_pipeline(osm, "filter(@, '@properties.amenity == bar') | len(@)") == 3


def test_sort_desc_limit(spark):
    # README.md:82 tsunami pipeline shape
    df = spark.createDataFrame(
        [Row(id=i, properties=Row(mag=m, tsunami=t, place=p)) for i, (m, t, p) in enumerate(
            [(5.5, 1, "A"), (7.2, 1, None), (6.1, 0, "C"), (8.0, 1, "D")]
        )]
    )
    out = run_pipeline(
        df,
        "filter(@, '@properties?.tsunami == 1') "
        "| map(@, '{id: @id, mag: @properties?.mag, place: @properties?.place ?: \"\"}') "
        "| sort(@, '@mag', true) | limit(@, 2)",
    )
    rows = out.collect()
    assert [r["mag"] for r in rows] == [8.0, 7.2]
    assert rows[1]["place"] == ""


def test_variables_and_intersects(spark):
    df = spark.createDataFrame(
        [Row(id=1, cuisines=["sushi", "ramen"]), Row(id=2, cuisines=["pizza"])]
    )
    out = run_pipeline(
        df,
        "filter(@, 'intersects(@cuisines, $wanted)')",
        variables={"wanted": ["sushi", "japanese"]},
    )
    assert [r["id"] for r in out.collect()] == [1]


def test_bbox_scalar(osm):
    box = run_pipeline(
        osm, "map(@, '@geometry.coordinates') | bbox(@)"
    )
    assert box[0] == -77.07 and box[2] == -77.01
    assert box[1] == 38.89 and box[3] == 38.95


# ---------------- stream mode (process) ----------------

def test_process_null_drop_and_dict(spark):
    # geonames.dfl shape: guard ? null : {dict with casts + concat}
    df = spark.createDataFrame(
        [
            Row(geonameid="1", name="Alpha", latitude="38.9", longitude="-77.0", population=""),
            Row(geonameid="2", name="Beta", latitude="", longitude="-77.1", population="42"),
            Row(geonameid="3", name="Gamma", latitude="39.1", longitude="-76.9", population="7"),
        ]
    )
    out = process(
        df,
        "((@latitude == \"\") or (@longitude == \"\")) ? null : "
        "{id: int64(@geonameid), name: @name, lat: float64(@latitude), lon: float64(@longitude), "
        "pop: int64(@population) ?: 0, "
        "slug: slugify(@name)}",
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["lat"] == 38.9 and rows[1]["slug"] == "alpha"
    assert rows[1]["pop"] == 0 and rows[3]["pop"] == 7


def test_process_tile_tagging(spark):
    # athena.dfl:11-17 tile tagging via tileX/tileY
    df = spark.createDataFrame([Row(id=1, lon=-77.032, lat=38.899)])
    out = process(
        df,
        "{id: @id, tx: tileX(@lon, 10), ty: tileY(@lat, 10)}",
    )
    r = out.collect()[0]
    assert (r["tx"], r["ty"]) == (292, 391)


def test_dict_merge_and_remove(spark):
    # geonames.dfl:14-20: @properties + {...} then - {keys}
    df = spark.createDataFrame(
        [Row(id=7, properties=Row(name="X", longitude=-77.0, latitude=38.9))]
    )
    out = process(
        df,
        "{id: @id, properties: (@properties + {upper: upper(@properties.name)}) - {longitude, latitude}}",
    )
    r = out.collect()[0]
    assert r["properties"].asDict() == {"name": "X", "upper": "X"}


def test_split_set_hist_words(spark):
    # hostosm.sh:40-46 words pipeline over a single description
    df = spark.createDataFrame([Row(description="This project maps buildings and maps roads")])
    out = run_pipeline(
        df,
        "map(@, 'split(lower(@description), \" \")') ",
    )
    words = out.collect()[0]["value"]
    assert words.count("maps") == 2


# ---------------- DFL -> SQL rendering (eval --sql) ----------------

def _sql_roundtrip(spark, df, dfl, variables=None):
    """spark.sql(rendered) must equal run_pipeline(compiled Columns)."""
    from railgun_spark.dfl.sqlgen import pipeline_sql_for_df

    df.createOrReplaceTempView("t_sqlgen")
    sql = pipeline_sql_for_df(df, dfl, "t_sqlgen", variables)
    via_sql = [tuple(r) for r in spark.sql(sql).collect()]
    via_cols = run_pipeline(df, dfl, variables)
    if hasattr(via_cols, "collect"):
        assert [tuple(r) for r in via_cols.collect()] == via_sql
    else:
        # scalar pipelines (len/mean) return a python value; SQL yields 1 row
        assert via_sql == [(via_cols,)]
    return sql


def test_sqlgen_filter_map_sort_limit(spark):
    df = spark.createDataFrame(
        [Row(id=i, kind="a" if i % 2 else "b", v=float(i)) for i in range(10)]
    )
    sql = _sql_roundtrip(
        spark,
        df,
        "filter(@, '@v > 2 and @kind == a') | "
        "map(@, '{id: @id, dbl: @v * 2, slug: slugify(@kind + \"_x\")}') | "
        "sort(@, '@id', true) | limit(@, 4)",
    )
    assert "WHERE" in sql and "LIMIT 4" in sql


def test_sqlgen_hist_and_null_safety(spark):
    df = spark.createDataFrame(
        [Row(id=i, kind=["bar", "cafe", "clinic"][i % 3]) for i in range(9)]
    )
    _sql_roundtrip(spark, df, "hist(@, '@kind')")
    # missing attribute renders as NULL (schema-on-read), not an error
    _sql_roundtrip(spark, df, "filter(@, '@nope == null')")


def test_sqlgen_predicates_and_vars(spark):
    df = spark.createDataFrame(
        [Row(id=i, name=f"n{i}", v=i) for i in range(10)]
    )
    _sql_roundtrip(
        spark,
        df,
        "filter(@, '@name ilike \"%1%\" or (@v between $lo and $hi and @v in [2, 3, 5])')",
        variables={"lo": 2, "hi": 6},
    )
    _sql_roundtrip(spark, df, "len(@)")


def test_sqlgen_cli_prints_sql(capsys):
    from railgun_spark.cli import main

    rc = main(
        ["eval", "--sql", "--dfl", "filter(@, '@a > 1')", "--context", '{"a": 2}']
    )
    out = capsys.readouterr().out
    assert rc == 0 and out.strip().startswith("SELECT") and "WHERE" in out


def test_assign_constant_folding_scalar_arithmetic(spark):
    """Pure scalar assigns evaluate eagerly (Go-DFL semantics) so the value
    is a cacheable Python scalar, not a lazy Column — including rebinding
    an existing variable through arithmetic."""
    from railgun_spark.dfl import run_pipeline

    df = spark.range(3)
    _, fv = run_pipeline(
        df,
        "($n := $n + 1) | ($label := \"run-\" + \"x\") | ($big := $n * 10 >= 10)"
        " | filter(@, '@id >= 0')",
        {"n": 0},
        return_vars=True,
    )
    assert fv["n"] == 1 and fv["label"] == "run-x" and fv["big"] is True


def test_assign_column_expressions_still_lazy(spark):
    from pyspark.sql import Column

    from railgun_spark.dfl import run_pipeline

    df = spark.range(3)
    _, fv = run_pipeline(
        df, "($m := @id) | filter(@, '@id >= 0')", {}, return_vars=True
    )
    assert isinstance(fv["m"], Column)


def test_assign_folding_ternary_elvis_between(spark):
    from railgun_spark.dfl import run_pipeline

    df = spark.range(2)
    _, fv = run_pipeline(
        df,
        "($a := $x ?: 7) | ($b := $a > 5 ? \"hi\" : \"lo\")"
        " | ($c := $a between 1 and 10) | filter(@, '@id >= 0')",
        {"x": None},
        return_vars=True,
    )
    assert fv["a"] == 7 and fv["b"] == "hi" and fv["c"] is True


def test_sqlgen_folds_scalar_assigns(spark):
    from railgun_spark.dfl.sqlgen import pipeline_sql_for_df

    df = spark.range(4).withColumnRenamed("id", "v")
    df.createOrReplaceTempView("t_fold")
    sql = pipeline_sql_for_df(
        df, "($n := 1 + 1) | filter(@, '@v >= $n')", "t_fold"
    )
    assert len(spark.sql(sql).collect()) == 2


def test_scalar_pipeline_stages(spark):
    """A stage after a scalar-producing stage evaluates driver-side with @
    bound to the scalar (len(@) | @ * 2); row-needing stages raise."""
    from railgun_spark.dfl import run_pipeline
    from railgun_spark.dfl.compiler import DflCompileError

    df = spark.createDataFrame([{"a": 1}, {"a": 2}, {"a": 3}])
    assert run_pipeline(df, "len(@) | @ * 2") == 6
    assert run_pipeline(df, "len(@) | @ > 2 ? 100 : 0") == 100
    with pytest.raises(DflCompileError, match="scalar"):
        run_pipeline(df, "len(@) | filter(@, '@a == 1')")


def test_variable_bound_to_null_compiles(spark):
    """A variable legitimately bound to null is NOT an unbound variable."""
    from railgun_spark.dfl import run_pipeline

    df = spark.createDataFrame([{"a": 1}, {"a": None}])
    out = run_pipeline(df, "filter(@, '@a == $x')", variables={"x": None})
    assert out.count() == 0  # NULL == NULL is NULL, never true — but it compiles


def test_dfl_geohash_function(spark):
    """geohash() in a DFL projection (superset function, tileX/tileY kin):
    known public vector + literal-precision enforcement."""
    import pytest as _pytest

    from railgun_spark.dfl import run_pipeline
    from railgun_spark.dfl.compiler import DflCompileError

    df = spark.createDataFrame([(1, -5.603, 42.605)], ["id", "lon", "lat"])
    out = run_pipeline(df, "map(@, '{id: @id, gh: geohash(@lon, @lat), g3: geohash(@lon, @lat, 3)}')")
    row = out.first()
    assert row["gh"] == "ezs42" and row["g3"] == "ezs"
    with _pytest.raises(DflCompileError, match="literal"):
        run_pipeline(df, "map(@, '{g: geohash(@lon, @lat, @id)}')").collect()


def test_jaccard_function_and_sql_twin(spark):
    """jaccard(a, b) in DFL projections: exact set similarity over
    distinct array views, NULL on empty-vs-empty (ANSI-safe), and the
    SQL renderer agrees with the compiled Column."""
    from railgun_spark.dfl import run_pipeline
    from railgun_spark.dfl.sqlgen import pipeline_sql_for_df

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c"], ["b", "c", "d"]),
            (2, ["a", "a", "b"], ["a", "b"]),   # distinct views: J = 1.0
            (3, ["x"], ["y"]),
            (4, [], []),
        ],
        "id: long, u: array<string>, v: array<string>",
    )
    expr = "map(@, '{id: @id, j: jaccard(@u, @v)}')"
    got = {r["id"]: r["j"] for r in run_pipeline(df, expr).collect()}
    assert abs(got[1] - 0.5) < 1e-12 and got[2] == 1.0 and got[3] == 0.0
    assert got[4] is None
    sql = pipeline_sql_for_df(df, expr, "t", {})
    df.createOrReplaceTempView("t")
    via_sql = {r["id"]: r["j"] for r in spark.sql(sql).collect()}
    assert via_sql == got


def test_hamming_function_and_sql_twin(spark):
    """hamming(a, b) = bit_count(a XOR b): known distances, and the SQL
    rendering agrees with the compiled Column."""
    from railgun_spark.dfl import run_pipeline
    from railgun_spark.dfl.sqlgen import pipeline_sql_for_df

    df = spark.createDataFrame(
        [(1, 0b1010, 0b0101), (2, 255, 255), (3, 0, (1 << 31))],
        "id: long, a: long, b: long",
    )
    expr = "map(@, '{id: @id, d: hamming(@a, @b)}')"
    got = {r["id"]: r["d"] for r in run_pipeline(df, expr).collect()}
    assert got == {1: 4, 2: 0, 3: 1}
    sql = pipeline_sql_for_df(df, expr, "th", {})
    df.createOrReplaceTempView("th")
    assert {r["id"]: r["d"] for r in spark.sql(sql).collect()} == got
