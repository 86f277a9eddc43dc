"""Training-shard writer + sequence packing: invariants and determinism."""

from __future__ import annotations

import json

import pytest

from railgun_spark.operators.packing import pack_sequences
from railgun_spark.sources.sharding import (
    build_manifest,
    write_manifest,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ------------------------------- sharding ---------------------------------
def test_shards_bounded_and_manifest_complete(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    cap = 20
    write_training_shards(docs, out, sort_key="doc_id", records_per_shard=cap,
                          target_partitions=2)
    manifest = build_manifest(spark, out, sort_key="doc_id")
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    assert all(r["n_rows"] <= cap for r in rows)
    # unique sort key + range partitioning + within-shard sort => the
    # manifest key ranges are disjoint and ordered (seekable by a sampler)
    ordered = sorted(rows, key=lambda r: r["min_key"])
    for prev, cur in zip(ordered, ordered[1:]):
        assert prev["max_key"] < cur["min_key"]


def test_manifest_jsonl_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, sort_key="doc_id", records_per_shard=50)
    mpath = str(tmp_path / "manifest.jsonl")
    write_manifest(build_manifest(spark, out, sort_key="doc_id"), mpath)
    lines = [json.loads(line) for line in open(mpath)]
    assert sum(r["n_rows"] for r in lines) == docs.count()
    assert all(set(r) == {"shard", "n_rows", "min_key", "max_key"} for r in lines)


# ------------------------------- packing ----------------------------------
MAX_TOK = 512


def test_packing_invariants(spark, docs):
    packed = pack_sequences(docs, MAX_TOK, n_buckets=8).collect()
    # every eligible doc exactly once
    ids = [r["doc_id"] for r in packed]
    assert len(ids) == len(set(ids))
    eligible = docs.count()  # sf0.001 docs are all far below 512 bpe tokens
    assert len(ids) == eligible
    # bin budgets respected
    sums: dict[str, int] = {}
    for r in packed:
        sums[r["bin_id"]] = sums.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(s <= MAX_TOK for s in sums.values())
    # bins are non-trivially packed (median bin holds > 1 doc)
    from collections import Counter

    per_bin = Counter(r["bin_id"] for r in packed)
    assert sorted(per_bin.values())[len(per_bin) // 2] > 1


def test_packing_partitioning_invariant(spark, docs):
    """Same corpus => identical bins no matter how the input is partitioned
    (explicit hash buckets, not sampled range partitions)."""
    a = {
        (r["doc_id"], r["bin_id"])
        for r in pack_sequences(docs.repartition(7), MAX_TOK, n_buckets=8).collect()
    }
    b = {
        (r["doc_id"], r["bin_id"])
        for r in pack_sequences(docs.coalesce(1), MAX_TOK, n_buckets=8).collect()
    }
    assert a == b


def test_packing_drops_oversized(spark, docs):
    tiny = pack_sequences(docs, 10, n_buckets=4)
    assert tiny.filter(tiny.n_tokens > 10).count() == 0


# --------------------------- end-to-end pipeline ---------------------------
def test_prepare_training_shards_end_to_end(spark, tmp_path):
    from railgun_spark.operators.corpus import prepare_training_shards

    out = str(tmp_path / "prep")
    # max_tokens=40 forces the chunking path: most sf0.001 docs are larger
    summary = prepare_training_shards(
        spark, SF_DIR, out, max_tokens=40, records_per_shard=40, n_buckets=8
    )
    assert summary["n_clean_docs"] <= summary["n_input_docs"]
    assert summary["n_train_docs"] <= summary["n_clean_docs"]
    assert summary["n_chunked_docs"] > 0
    assert summary["n_units"] >= summary["n_train_docs"]
    # lossless: every train doc reaches the shards (whole or chunked)
    assert summary["n_covered_docs"] == summary["n_train_docs"]
    assert summary["n_dropped_units"] == 0
    assert 0 < summary["n_bins"] <= summary["n_packed_units"]
    # written shards agree with the manifest and carry the packing columns
    shards = spark.read.parquet(f"{out}/shards")
    assert shards.count() == summary["n_packed_units"]
    assert {"uid", "orig_doc_id", "text", "n_tokens", "bin_id"} <= set(shards.columns)
    lines = [json.loads(line) for line in open(f"{out}/manifest.jsonl")]
    assert len(lines) == summary["n_shards"]
    assert sum(r["n_rows"] for r in lines) == summary["n_packed_units"]


# ------------------------- property-based packing --------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", "::", "q"])
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=1, max_size=60))
def test_packing_properties_generated(spark, texts):
    """For ANY document set: every doc <= budget appears exactly once, every
    bin respects the budget, and the assignment is a pure function of the
    data (two runs agree)."""
    from pyspark.sql import Row

    budget = 30
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = pack_sequences(df, budget, n_buckets=4).collect()
    again = pack_sequences(df, budget, n_buckets=4).collect()
    assert sorted((r["doc_id"], r["bin_id"]) for r in out) == sorted(
        (r["doc_id"], r["bin_id"]) for r in again
    )
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    sums: dict[str, int] = {}
    for r in out:
        assert r["n_tokens"] <= budget
        sums[r["bin_id"]] = sums.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(s <= budget for s in sums.values())


# ------------------------------- chunking ----------------------------------
def test_chunking_partitions_tokens_exactly(spark, docs):
    from pyspark.sql import functions as F

    from railgun_spark.operators.packing import chunk_documents

    C = 10
    chunks = chunk_documents(docs, C)
    # per-doc chunk token counts sum to the doc's token count
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_chunk_tokens").alias("tok"),
            F.max("n_chunk_tokens").alias("mx"),
            F.count(F.lit(1)).alias("k"),
        )
        .collect()
    )
    orig = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("n"),
        ).collect()
    }
    for r in per_doc:
        assert r["tok"] == orig[r["doc_id"]]
        assert r["mx"] <= C
        # every chunk except possibly the last is full
        assert r["k"] == (orig[r["doc_id"]] + C - 1) // C


def test_prepare_with_redaction_same_membership(spark, tmp_path):
    """--redact-pii must not change WHICH docs ship (split/dedup membership
    is a function of original content), only the text they carry."""
    from railgun_spark.operators.corpus import prepare_training_shards

    plain = prepare_training_shards(
        spark, "/root/testdata/sf0.001", str(tmp_path / "a"), max_tokens=512
    )
    red = prepare_training_shards(
        spark, "/root/testdata/sf0.001", str(tmp_path / "b"), max_tokens=512,
        redact_pii=True,
    )
    assert red["n_train_docs"] == plain["n_train_docs"]
    assert red["n_covered_docs"] == plain["n_covered_docs"]
    a = spark.read.parquet(str(tmp_path / "a" / "shards"))
    b = spark.read.parquet(str(tmp_path / "b" / "shards"))
    assert sorted(r["orig_doc_id"] for r in a.select("orig_doc_id").distinct().collect()) == \
           sorted(r["orig_doc_id"] for r in b.select("orig_doc_id").distinct().collect())


def test_prepare_with_span_removal(spark, tmp_path):
    """--remove-dup-spans rewrites shipped train text (duplicated spans
    cut) without changing split membership, except docs rewritten to
    nothing, which must be dropped rather than shipped empty."""
    from railgun_spark.operators.corpus import prepare_training_shards

    plain = prepare_training_shards(
        spark, "/root/testdata/sf0.001", str(tmp_path / "a"), max_tokens=512
    )
    cut = prepare_training_shards(
        spark, "/root/testdata/sf0.001", str(tmp_path / "b"), max_tokens=512,
        remove_dup_spans=True,
    )
    assert plain["n_span_rewritten"] == 0
    assert cut["n_span_rewritten"] >= 0
    # membership only shrinks (empty rewrites dropped), never grows
    assert cut["n_covered_docs"] <= plain["n_covered_docs"]
    b = spark.read.parquet(str(tmp_path / "b" / "shards"))
    # nothing empty ships
    assert b.filter("length(trim(text)) = 0").count() == 0


def test_span_removal_evidence_is_cleaned_corpus(spark, tmp_path):
    """A doc whose exact duplicate was removed by the clean stage must NOT
    be gutted by span removal: evidence comes from the cleaned corpus, so
    'keep one copy' stays one copy (against the raw corpus the survivor's
    every window collided with its removed twin and the text vanished)."""
    from railgun_spark.operators.corpus import corpus_verdicts, prepare_training_shards

    body = " ".join(f"word{i}" for i in range(40))
    others = [
        (100 + i, " ".join(f"filler{i}x{j}" for j in range(30)), "en", "s", 0)
        for i in range(12)
    ]
    rows = [
        (1, body, "en", "s", len(body)),
        (2, body, "en", "s", len(body)),  # exact duplicate of 1
    ] + others
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    verdicts = {r["doc_id"]: r["reason"] for r in corpus_verdicts(spark, d).collect()}
    assert verdicts[2] == "exact_duplicate" and verdicts[1] == "clean"

    out = prepare_training_shards(
        spark, d, str(tmp_path / "o"), max_tokens=512, remove_dup_spans=True
    )
    shards = spark.read.parquet(str(tmp_path / "o" / "shards"))
    kept = {r["orig_doc_id"] for r in shards.select("orig_doc_id").distinct().collect()}
    # doc 1 survives WITH its text iff it landed in the train split; either
    # way it must not have been span-gutted: rewrite count stays 0 because
    # the cleaned corpus holds only one copy of the span
    assert out["n_span_rewritten"] == 0
    if 1 in kept:
        texts = [r["text"] for r in shards.filter("orig_doc_id = 1").collect()]
        assert any("word0" in t for t in texts)


def test_verify_shards_detects_tampering(spark, tmp_path):
    """verify-shards passes on a fresh prepare output, fails (exit 1,
    mismatch listed) after a shard file is deleted, and raises on a
    missing manifest."""
    import glob
    import json as _json
    import os

    import pytest as _pytest

    from railgun_spark.cli import main
    from railgun_spark.operators.corpus import prepare_training_shards
    from railgun_spark.sources.sharding import verify_shards

    out = str(tmp_path / "prep")
    prepare_training_shards(
        spark, "/root/testdata/sf0.001", out, max_tokens=40, records_per_shard=40
    )
    summary = verify_shards(spark, out)
    assert summary["ok"] and summary["n_shards_declared"] == summary["n_shards_actual"]
    assert main(["verify-shards", "--dir", out]) == 0

    victim = sorted(glob.glob(f"{out}/shards/*.parquet"))[0]
    os.remove(victim)
    assert main(["verify-shards", "--dir", out]) == 1

    with _pytest.raises(FileNotFoundError):
        verify_shards(spark, str(tmp_path / "nowhere"))


def test_verify_shards_missing_shard_tree(spark, tmp_path):
    """A surviving manifest with a lost shards/ tree — the primary
    partial-copy failure — reports every declared shard as missing (exit
    summary ok=false), never a Spark traceback."""
    import json as _json
    import shutil

    from railgun_spark.operators.corpus import prepare_training_shards
    from railgun_spark.sources.sharding import verify_shards

    out = str(tmp_path / "prep")
    prepare_training_shards(
        spark, "/root/testdata/sf0.001", out, max_tokens=512, records_per_shard=100
    )
    shutil.rmtree(f"{out}/shards")
    summary = verify_shards(spark, out)
    assert not summary["ok"] and summary["n_shards_actual"] == 0
    assert len(summary["mismatches"]) == summary["n_shards_declared"] > 0
