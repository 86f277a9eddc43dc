"""IO matrix, process() pipeline, dynamic partitioned sink, catalog CRUD +
exec semantics, multimodal plumbing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from railgun_spark.catalog import Catalog, DataStore, Job, Layer, Process, Service, Workflow
from railgun_spark.catalog.registry import AlreadyExists, DependencyError
from railgun_spark.plans.process import analyze_output_uri, process_uri
from railgun_spark.sources import formats


# ---------------- format registry ----------------

def test_split_name_format_compression():
    s = formats.split_name_format_compression("/x/y/features.geojsonl.gz")
    assert (s.name, s.format, s.compression) == ("features", "jsonl", "gzip")
    s = formats.split_name_format_compression("data.toml")
    assert s.format == "toml" and s.compression is None
    s = formats.split_name_format_compression("cities.tsv.bz2")
    assert (s.format, s.compression) == ("tsv", "bzip2")


def test_read_jsonl_and_convert(spark, tmp_path):
    src = tmp_path / "rows.jsonl"
    src.write_text("\n".join(json.dumps({"a": i, "b": f"x{i}"}) for i in range(5)))
    df = formats.read(spark, str(src))
    assert df.count() == 5
    out = tmp_path / "rows.csv"
    formats.convert(spark, str(src), str(out))
    back = formats.read(spark, str(out), inferSchema="true")
    assert back.count() == 5


def test_read_tsv_with_header_override(spark, tmp_path):
    src = tmp_path / "cities.tsv"
    src.write_text("1\tParis\n2\tTokyo\n")
    df = formats.read(spark, str(src), header=["id", "city"])
    rows = {r["id"]: r["city"] for r in df.collect()}
    assert rows == {"1": "Paris", "2": "Tokyo"}


def test_read_toml_and_properties(spark, tmp_path):
    t = tmp_path / "conf.toml"
    t.write_text('name = "x"\ncount = 3\n')
    df = formats.read(spark, str(t))
    r = df.collect()[0]
    assert r["name"] == "x" and r["count"] == 3
    p = tmp_path / "app.properties"
    p.write_text("key=value\nother=2\n")
    df2 = formats.read(spark, str(p))
    assert df2.collect()[0]["key"] == "value"


def test_hcl_stub_raises(spark, tmp_path):
    f = tmp_path / "x.hcl"
    f.write_text("a = 1")
    with pytest.raises(NotImplementedError):
        formats.read(spark, str(f))


# ---------------- process() + dynamic sink ----------------

def test_process_uri_pipeline(spark, tmp_path):
    src = tmp_path / "events.jsonl"
    src.write_text(
        "\n".join(json.dumps({"id": i, "kind": "a" if i % 2 else "b", "v": i * 1.5}) for i in range(10))
    )
    out = process_uri(
        spark,
        str(src),
        "filter(@, '@v > 3') | map(@, '{id: @id, kind: @kind}')",
    )
    assert out.count() == 7


def test_dynamic_partitioned_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(id=i, _tile_z=10, _tile_x=290 + (i % 2), _tile_y=391) for i in range(8)]
    )
    sink = analyze_output_uri(
        '$dir + "/tiles/" + @_tile_z + "-" + @_tile_x + "-" + @_tile_y',
        {"dir": str(tmp_path)},
        df,
    )
    assert sink is not None
    assert sink.base.startswith(str(tmp_path))
    assert sink.partition_cols == ["_p__tile_z", "_p__tile_x", "_p__tile_y"]

    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps({"id": i, "tx": 290 + (i % 2)}) for i in range(8)))
    process_uri(
        spark,
        str(src),
        None,
        output_uri='$dir + "/out/" + @tx',
        variables={"dir": str(tmp_path)},
        output_format="jsonl",
    )
    parts = sorted(p for p in os.listdir(tmp_path / "out") if p.startswith("_p_"))
    assert parts == ["_p_tx=290", "_p_tx=291"]


# ---------------- catalog ----------------

@pytest.fixture()
def catalog(spark, tmp_path):
    data = tmp_path / "features.jsonl"
    data.write_text(
        "\n".join(
            json.dumps({"id": i, "amenity": a, "name": f"n{i}"})
            for i, a in enumerate(["bar", "cafe", "bar", "clinic", "bar"])
        )
    )
    cat = Catalog(spark)
    cat.add(DataStore(name="osm", uri=str(data), format="jsonl"))
    cat.add(Layer(name="bars", datastore="osm", expression="filter(@, '@amenity == bar')"))
    cat.add(Process(name="count_by_amenity", expression="hist(@, '@amenity')"))
    cat.add(Service(name="svc", datastore="osm", process="count_by_amenity"))
    cat.add(Job(name="job1", service="svc"))
    cat.add(Workflow(name="wf", jobs=["job1"]))
    return cat


def test_catalog_crud_conflicts_and_deps(catalog):
    with pytest.raises(AlreadyExists):
        catalog.add(DataStore(name="osm", uri="/x"))
    with pytest.raises(DependencyError):
        catalog.delete(DataStore, "osm")  # layer + service depend on it
    with pytest.raises(DependencyError):
        catalog.delete(Service, "svc")  # job depends on it
    catalog.delete(Workflow, "wf")
    catalog.delete(Job, "job1")
    catalog.delete(Service, "svc")


def test_layer_filter_and_service_exec(catalog):
    assert catalog.layer_frame("bars").count() == 3
    hist = catalog.exec_service("svc")
    got = {r["key"]: r["count"] for r in hist.collect()}
    assert got == {"bar": 3, "cafe": 1, "clinic": 1}


def test_workflow_exec(catalog):
    results = catalog.exec_workflow("wf")
    assert len(results) == 1 and results[0].count() == 3


def test_catalog_roundtrip(catalog, tmp_path, spark):
    path = str(tmp_path / "catalog.json")
    catalog.save(path)
    loaded = Catalog.load(spark, path)
    assert loaded.get(Service, "svc").process == "count_by_amenity"
    assert loaded.get(Layer, "bars").expression.startswith("filter")


def test_datastore_uri_dfl_expression(spark, tmp_path):
    d = tmp_path / "proj5400.jsonl"
    d.write_text(json.dumps({"projectId": 5400}))
    cat = Catalog(spark)
    cat.add(DataStore(name="hot", uri=f'"{tmp_path}/proj" + $project + ".jsonl"', format="jsonl"))
    df = cat.load_datastore("hot", {"project": "5400"})
    assert df.collect()[0]["projectId"] == 5400


# ---------------- multimodal ----------------

def test_multimodal_feature_extraction(spark):
    from railgun_spark.operators.multimodal import MEDIA_SCHEMA, extract_features, frame_sample

    rows = [
        (1, "image", b"abcdef" * 10, {"fmt": "png"}),
        (2, "video", b"xyz" * 50, {"fmt": "mp4", "frames": "25"}),
        (3, "image", b"", {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(df).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 60 and len(by_id[1]["feature"]) == 8
    assert by_id[3]["n_bytes"] == 0
    sampled = frame_sample(df, every_n=10).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 10, 20]
