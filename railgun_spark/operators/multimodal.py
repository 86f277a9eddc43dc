"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

Beyond-reference component for training-data pipelines. The Spark-side
plumbing (schemas, batch iteration, partition behavior) is real and tested;
media decoding is pluggable behind `decoder=` hooks: `decode_media`
(dispatching to decode_image / decode_audio / decode_video) REALLY
decodes the library-free formats — images: PPM P6, uncompressed BMP,
full PNG, GIF, JPEG (baseline + progressive, operators/jpeg.py);
audio: PCM/float WAV, FLAC (operators/flac.py), AIFF, Sun AU (incl.
G.711 mu-law), MPEG-1 Layer III (operators/mp3.py, certified-table
streams — see that module's honest-scope notes); video: YUV4MPEG2 and
Motion-JPEG AVI — pure stdlib+numpy, golden- and property-tested,
truncation refused everywhere; remaining codec-bound formats
(AAC/H.264; ffmpeg absent from this container) default to a
deterministic fake for pipeline-shape tests or raise
NotImplementedError when `require_real=True` without a decoder.

Scale design: binary payloads ride in parquet binary columns (or are
referenced by uri and loaded inside the batch fn), metadata stays columnar
for pushdown. mapInPandas streams Arrow record batches — bounded memory per
task regardless of file count; `spark.sql.files.maxPartitionBytes` controls
scan granularity. The decode stage is the only Python hop, amortized per
batch, never per row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# Below this estimated input size a LIGHT decode stage (byte arithmetic,
# header sniffing) finishes faster on the scan partitions than the
# spread-shuffle costs; real codecs (heavy=True) always spread.
SPREAD_MIN_BYTES = 32 << 20


def spread_for_decode(
    df: DataFrame, heavy: bool = False, min_bytes: int = SPREAD_MIN_BYTES
) -> DataFrame:
    """Spread a Python-decode-bound frame across the session's cores.

    CPU-bound Arrow decode stages must not be bounded by input FILE
    SPLITS: a single small parquet file scans as ONE partition, so one
    core would do all the decoding. Narrow inputs are repartitioned up
    to ``defaultParallelism``. Three cases skip the shuffle:

    - the frame already carries >= defaultParallelism partitions (any
      real scan at 100 TB) — the exchange buys nothing;
    - the frame is streaming — micro-batch parallelism follows the
      ingest file splits (keep producer files sized to the cluster's
      cores); a per-batch shuffle needs the shuffle service for no
      stable benefit;
    - ``heavy`` is False and Catalyst's size estimate is under
      ``min_bytes`` — a light decode (byte arithmetic, header fields)
      over a few MB is faster on one core than the round-trip shuffle.

    ``heavy=True`` marks real-codec stages (JPEG/MP3/FLAC…): tens of
    ms/row CPU dominates any shuffle at any size, so narrow inputs
    always spread. Unknown stats (Catalyst's 8-EiB default) count as
    big — the safe direction.

    Delegates to ``session.spread_scan`` (r17): the same input-skew fix
    applies to corpus-wide hash/shingle passes, so the logic lives once.
    """
    from railgun_spark.session import spread_scan

    return spread_scan(df, heavy=heavy, min_bytes=min_bytes)


def fake_decode(content: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real media decoder: derives shape and an
    8-dim feature vector from the bytes themselves. Replaces PIL/ffmpeg in
    this container; swap via the `decoder` hook."""
    n = len(content or b"")
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feature = [float((content[i % n] if n else 0) + i) for i in range(8)]
    return {"width": width, "height": height, "feature": feature}


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
    require_real: bool = False,
) -> DataFrame:
    """Binary media -> feature rows via mapInPandas (Arrow batches).

    df must have MEDIA_SCHEMA columns. At 100 TB this is the canonical
    Python hop: one Arrow batch in, one out, no per-row serialization."""
    if require_real and decoder is None:
        raise NotImplementedError(
            "real media decoding needs a decoder: pass decoder=decode_media "
            "for the library-free formats (PPM/BMP/PNG/GIF/JPEG, "
            "WAV/FLAC/AIFF/AU, Y4M/MJPEG-AVI), "
            "or a torchaudio/ffmpeg-backed callable (not present in this "
            "container) for compressed audio/video codecs"
        )
    fn = decoder or fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fn(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index
    based on declared frame count metadata (`meta['frames']`). The
    explode is Spark-side; real frame extraction would decode inside a
    mapInPandas over the sampled (media_id, frame_idx) pairs."""
    frames = F.coalesce(F.element_at("meta", "frames").cast("int"), F.lit(0))
    # a video declaring zero frames yields NO rows — greatest(frames-1, 0)
    # would emit a phantom frame_idx 0 that a real decoder cannot decode
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("__frames", frames)
        .filter(F.col("__frames") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("__frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: passes content through and records the target
    size in metadata — the zero-decode twin of `resize_images` for
    pipelines that only need the bookkeeping (e.g. planning a resize
    stage before the bytes are fetched)."""
    return df.withColumn(
        "meta",
        F.map_concat(
            F.col("meta"),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)), F.lit("resize_h"), F.lit(str(height))
            ),
        ),
    )


def _resize_bilinear(arr, out_w: int, out_h: int):
    """Separable bilinear resample (pixel-center convention, edges
    clamped) of an (h, w, c) float64 raster — pure vectorized numpy; the
    standard thumbnail/normalize kernel a multimodal training pipeline
    applies before feature extraction."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    top = arr[y0][:, x0] * (1 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (1 - fx) + arr[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def _encode_png_rgb(arr) -> bytes:
    """8-bit RGB PNG (color type 2, filter-0 scanlines, stdlib zlib) of
    an (h, w, 3) float array — golden-paired with the module's own full
    PNG decoder, so resize output stays inside the library-free matrix."""
    import struct
    import zlib

    import numpy as np

    a = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    h, w = a.shape[0], a.shape[1]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize over MEDIA_SCHEMA rows: decode the full raster
    (any library-free image codec), separable-bilinear resample to
    (width, height), re-encode as 8-bit RGB PNG — one Arrow pass, rows
    keep MEDIA_SCHEMA with meta recording the source dimensions, so
    resize stages compose with extract_features/decode_media downstream.
    Non-image rows pass through untouched. Spread the input with
    spread_for_decode(heavy=True) if it comes from few file splits."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents, metas = [], []
            for kind, content, meta in zip(
                pdf["kind"], pdf["content"], pdf["meta"]
            ):
                if kind != "image":
                    contents.append(content)
                    metas.append(meta)
                    continue
                rgb = decode_image_raster(content)
                out = _resize_bilinear(rgb, width, height)
                contents.append(_encode_png_rgb(out))
                m = dict(meta or {})
                m.update({
                    "src_w": str(rgb.shape[1]), "src_h": str(rgb.shape[0]),
                    "resize_w": str(width), "resize_h": str(height),
                })
                metas.append(m)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "content": contents, "meta": metas,
            })

    return df.mapInPandas(batches, df.schema)


# --------------------------------------------------------------------------
# Suite queries. The testdata has no binary media table, so a deterministic
# media frame is derived from `documents` (content = UTF-8 bytes of text,
# kind cycled by doc_id). Because the corpus is ASCII and fake_decode is
# pure arithmetic over byte lengths/values, the whole mapInPandas path is
# oracle-expressible in SQL — the strongest possible check on the Arrow
# batch plumbing.
# --------------------------------------------------------------------------
from railgun_spark.suite import extra_query, query  # noqa: E402


def media_frame(spark, sf_dir: str) -> DataFrame:
    """documents -> MEDIA_SCHEMA frame (deterministic synthetic media)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(
            F.lit("frames"), F.floor(F.col("n_chars") / 5).cast("int").cast("string")
        ).alias("meta"),
    )


# mirrors fake_decode's wrap-around content[i % n] so texts shorter than 8
# bytes stay oracle-exact (unwrapped substr reads past the end -> ascii('')=0)
_FEAT_SUM_SQL = " + ".join(
    f"(CASE WHEN octet_length(encode(text)) = 0 THEN 0 "
    f"ELSE ascii(substr(text, ({i} % octet_length(encode(text))) + 1, 1)) END + {i})"
    for i in range(8)
)


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + (octet_length(encode(text)) % 64) AS INT) AS width,
           CAST(16 + ((octet_length(encode(text)) // 64) % 64) AS INT) AS height,
           CAST({_FEAT_SUM_SQL} AS DOUBLE) AS feat_sum
    FROM documents
    ORDER BY media_id
    """,
    doc="Arrow-batched mapInPandas feature extraction over binary media "
    "columns; decode is the deterministic fake (real decoder is a drop-in "
    "hook). Oracle recomputes the byte arithmetic in SQL.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark, sf_dir: str) -> DataFrame:
    media = spread_for_decode(media_frame(spark, sf_dir))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        F.expr(
            "CAST(aggregate(feature, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS DOUBLE)"
        ).alias("feat_sum"),
    ).orderBy("media_id")


@query(
    "multimodal_mp3_features",
    oracle="""
    SELECT doc_id AS media_id,
           44100 AS sample_rate,
           CAST(1152 * (1 + doc_id % 2) AS BIGINT) AS n_samples,
           CAST(2.0 AS DOUBLE) AS gain_ratio
    FROM documents
    WHERE doc_id % 19 = 0
    ORDER BY media_id
    """,
    doc="REAL MP3 decode through the Arrow pipeline: per document a "
    "tone stream is synthesized by the from-scratch spec encoder "
    "(operators/mp3_encode.py) with doc_id-derived band/bin/amplitude, "
    "decoded TWICE by the full Layer III decoder at global_gains 4 "
    "apart. n_samples gates frame/granule accounting; gain_ratio gates "
    "the requantization exponent through the whole linear chain — "
    "scaling by 2^((210-206)/4) = 2 is IEEE-exact end-to-end, so the "
    "ratio is exactly 2.0 iff the decode is right. Scale: one Arrow hop, "
    "one decode pair per row, no shuffle.",
    tags=("multimodal", "mp3", "pandas-udf"),
)
def multimodal_mp3_features(spark, sf_dir: str) -> DataFrame:
    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 19 == 0)
        .select("doc_id"),
        heavy=True,  # real Layer III decode pairs: CPU dominates any size
    )
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("gain_ratio", T.DoubleType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from railgun_spark.operators.mp3 import decode_mp3
        from railgun_spark.operators.mp3_encode import encode_mp3_tone

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sb, k, q = 1 + d % 20, d % 18, 3 + d % 12
                n_gr = 2 * (1 + d % 2)
                lo = decode_mp3(encode_mp3_tone(sb, k, q, n_gr, global_gain=206))
                hi = decode_mp3(encode_mp3_tone(sb, k, q, n_gr, global_gain=210))
                rows.append((d, hi["sample_rate"], hi["n_samples"],
                             hi["feature"][0] / lo["feature"][0]))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "gain_ratio"]
            )

    return docs.mapInPandas(batches, schema).orderBy("media_id")


# --------------------------------------------------------------------------
# MP3 corpus-refusal observability. The decoder fails closed by NAME
# (operators/mp3.py) — right per-file, useless per-corpus: a 100 TB audio
# sweep must answer "what fraction of each source decodes, and why not"
# as ONE aggregate, the way format coverage is a first-class catalog
# surface in the reference router
# (/root/reference/railgun/router/RailgunRouter.go:58). Coverage runs the
# decode in the Arrow hop, counts (source, reason) MAP-SIDE inside each
# partition (a Counter per partition, not a row per stream), and ships
# only the tiny partial-count frame to one shuffle.
# --------------------------------------------------------------------------
_COVERAGE_PARTIAL_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("n", T.LongType()),
])

COVERAGE_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("n_streams", T.LongType()),
    T.StructField("permille", T.LongType()),
])


def mp3_decode_coverage(
    df: DataFrame, content_col: str = "content", source_col: str = "source"
) -> DataFrame:
    """(source, mp3-bytes) frame -> per-(source, reason) decode coverage.

    reason is 'decoded' or a stable code from
    mp3.classify_mp3_refusal (MP3_REFUSAL_REASONS); permille =
    (1000 * n) div source_total as exact long/long integer division
    (matching SQL `//` — no double-rounding drift at any total). Decode
    is the heavy leg and stays in one Arrow pass; the aggregate rides a
    counts-only shuffle (map-side combined by the per-partition
    Counter). The permille window partitions by source — never a global
    single-partition window."""
    from pyspark.sql import Window

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        from railgun_spark.operators.mp3 import classify_mp3_refusal, decode_mp3

        counts: Counter = Counter()
        for pdf in it:
            for src, content in zip(pdf[source_col], pdf[content_col]):
                try:
                    decode_mp3(content)
                    reason = "decoded"
                except ValueError as e:
                    reason = classify_mp3_refusal(str(e))
                counts[(src, reason)] += 1
        yield pd.DataFrame(
            [(s, r, n) for (s, r), n in counts.items()],
            columns=["source", "reason", "n"],
        )

    partial = df.select(
        F.col(source_col).alias("source"), F.col(content_col).alias("content")
    ).mapInPandas(batches, _COVERAGE_PARTIAL_SCHEMA)
    agg = partial.groupBy("source", "reason").agg(F.sum("n").alias("n_streams"))
    # exact long/long `div` (not float /+floor): double rounding can cross
    # the floor boundary once per-source totals approach ~2^52/1000, and the
    # DuckDB oracle computes with exact integer division
    return (
        agg.withColumn(
            "per_source", F.sum("n_streams").over(Window.partitionBy("source"))
        )
        .withColumn(
            "permille", F.expr("(1000 * n_streams) div per_source").cast("long")
        )
        .drop("per_source")
        .orderBy("source", "reason")
    )


# doc_id-derived stream classes for the synthetic refusal corpus: class
# index -> the reason code the decode MUST produce. Patches reuse the
# byte/bit surgery pinned by tests/test_mp3.py::test_refusals /
# test_uncertified_table_refused_by_name on the mono no-CRC layout
# encode_mp3_tone emits.
MP3_CRAFT_REASONS = (
    "decoded",                    # 0: valid tone stream
    "unsupported_layer",          # 1: layer bits -> Layer II
    "free_format",                # 2: bitrate index 0
    "lsf_16khz",                  # 3: version -> MPEG-2, sr index -> 16 kHz
    "truncated",                  # 4: cut 100 bytes mid-frame
    "uncertified_huffman_table",  # 5: gr0 table_select[0] -> 16
    "bad_sync",                   # 6: two zero bytes before the sync word
    "reserved_header_bits",       # 7: reserved MPEG version bits (01)
)


def _patch_table16(blob: bytearray) -> None:
    """Point granule 0's table_select[0] of a mono no-CRC MPEG-1 frame at
    uncertified Huffman table 16 (side info starts at byte 4;
    table_select[0] sits 18+12+9+8+4+1 = 52 bits in)."""
    off_bits = 4 * 8 + 52
    for j, bit in enumerate(f"{16:05b}"):
        byte_i = (off_bits + j) // 8
        bit_i = 7 - ((off_bits + j) % 8)
        if bit == "1":
            blob[byte_i] |= 1 << bit_i
        else:
            blob[byte_i] &= ~(1 << bit_i)


def _craft_mp3_stream(doc_id: int) -> bytes:
    """Deterministic stream for doc_id: a real encoded tone, byte-patched
    into refusal class (doc_id // 13) % 8."""
    from railgun_spark.operators.mp3_encode import encode_mp3_tone

    d = int(doc_id)
    blob = bytearray(
        encode_mp3_tone(1 + d % 20, d % 18, 3 + d % 12, 2 * (1 + d % 2))
    )
    cls = (d // 13) % 8
    if cls == 1:
        blob[1] = (blob[1] & ~0x06) | 0x04
    elif cls == 2:
        blob[2] &= 0x0F
    elif cls == 3:
        blob[1] = (blob[1] & ~0x18) | 0x10
        blob[2] = (blob[2] & ~0x0C) | 0x08
    elif cls == 4:
        del blob[-100:]
    elif cls == 5:
        _patch_table16(blob)
    elif cls == 6:
        blob[:0] = b"\x00\x00"
    elif cls == 7:
        blob[1] = (blob[1] & ~0x18) | 0x08
    return bytes(blob)


_REFUSAL_CASE_SQL = "CASE CAST((doc_id // 13) % 8 AS INT) " + " ".join(
    f"WHEN {i} THEN '{r}'" for i, r in enumerate(MP3_CRAFT_REASONS)
) + " END"


@extra_query(
    "mp3_refusal_report",
    oracle=f"""
    WITH s AS (
      SELECT source, {_REFUSAL_CASE_SQL} AS reason
      FROM documents WHERE doc_id % 13 = 0
    ),
    g AS (
      SELECT source, reason, COUNT(*) AS n_streams
      FROM s GROUP BY source, reason
    )
    SELECT source, reason, n_streams,
           CAST((1000 * n_streams)
                // SUM(n_streams) OVER (PARTITION BY source)
                AS BIGINT) AS permille
    FROM g
    ORDER BY source, reason
    """,
    doc="Corpus decode-coverage report: per (source, refusal reason) "
    "stream counts + per-source permille over a synthetic corpus that "
    "embeds every major refusal class by doc_id arithmetic. The oracle "
    "recomputes the EXPECTED class per doc in SQL, so the gate certifies "
    "that real decodes of the crafted streams land in exactly the "
    "predicted classes — a wrong refusal message, a decode that stops "
    "failing closed, or a classifier drift all hash-mismatch.",
    tags=("multimodal", "mp3", "observability", "pandas-udf"),
)
def mp3_refusal_report(spark, sf_dir: str) -> DataFrame:
    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id", "source"),
        heavy=True,  # every row encodes (and usually decodes) a real stream
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "content": [_craft_mp3_stream(d) for d in pdf["doc_id"]],
                }
            )

    corpus = docs.mapInPandas(
        synth,
        T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    return mp3_decode_coverage(corpus)


# --------------------------------------------------------------------------
# Generalized decode coverage across the WHOLE codec matrix (image:
# PPM/BMP/PNG/GIF/TIFF/JPEG, audio: WAV/FLAC/AIFF/AU/MP3, video:
# Y4M/MJPEG-AVI). Every decoder in this module fails closed with a named
# ValueError; classify_media_refusal folds those names into a small
# stable taxonomy so a mixed-modality 100 TB corpus gets ONE coverage
# report: per (source, kind, reason) stream counts. MP3 messages keep
# their fine-grained codes (classify_mp3_refusal); everything else maps
# by message stem — the stems are this module's own raise-site
# vocabulary ('truncated …', '… not supported', 'corrupt …', 'bad …'),
# pinned by the crafted-class tests.
# --------------------------------------------------------------------------
MEDIA_REFUSAL_REASONS = (
    "truncated",           # payload shorter than its headers declare
    "unsupported_codec",   # container/magic outside the library-free set
    "unsupported_feature", # known container, refused variant (16-bit PGM,
                           # palette TIFF, arithmetic JPEG, ...)
    "corrupt",             # structural violation inside the payload
    "other",
)


def classify_media_refusal(kind: str, msg: str) -> str:
    """Map a decode_media ValueError message to a stable reason code:
    one of MP3_REFUSAL_REASONS (audio payloads whose message matches the
    MP3 taxonomy) or MEDIA_REFUSAL_REASONS. Never raises."""
    from railgun_spark.operators.mp3 import classify_mp3_refusal

    if kind == "audio":
        r = classify_mp3_refusal(msg)
        if r != "other":
            return r
    m = msg.lower()
    if ("needs a codec library" in m or "need a codec library" in m
            or "unknown media kind" in m or "codecs need" in m):
        return "unsupported_codec"
    if "truncated" in m:
        return "truncated"
    if ("not supported" in m or "unsupported" in m or "supported (" in m
            or m.startswith("only ")):
        return "unsupported_feature"
    if ("corrupt" in m or "bad " in m or "invalid" in m
            or "zero-dimension" in m or "missing" in m
            or "no color table" in m or "contains no image" in m
            or "no frames" in m):
        return "corrupt"
    return "other"


_MEDIA_COVERAGE_PARTIAL_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("n", T.LongType()),
])

MEDIA_COVERAGE_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("n_streams", T.LongType()),
    T.StructField("permille", T.LongType()),
])

MEDIA_STATUS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("reason", T.StringType()),
])


def media_decode_status(
    df: DataFrame,
    content_col: str = "content",
    kind_col: str = "kind",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-ROW decode status through the REAL decode_media dispatch —
    the stateless row form of media_decode_coverage (which pre-aggregates
    map-side). Because it is a pure mapInPandas it lifts unchanged onto a
    streaming DataFrame, so the streaming media path can exercise the
    full codec matrix per micro-batch (see
    streaming/media.stream_media_decode_status_availablenow)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            reasons = []
            for kind, content in zip(pdf[kind_col], pdf[content_col]):
                try:
                    decode_media(content, kind)
                    reasons.append("decoded")
                except ValueError as e:
                    reasons.append(classify_media_refusal(kind, str(e)))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "kind": pdf[kind_col],
                 "reason": reasons}
            )

    return df.select(
        F.col(id_col).alias(id_col),
        F.col(kind_col).alias(kind_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(batches, MEDIA_STATUS_SCHEMA)


def media_decode_coverage(
    df: DataFrame,
    content_col: str = "content",
    kind_col: str = "kind",
    source_col: str = "source",
) -> DataFrame:
    """(source, kind, media-bytes) frame -> per-(source, kind, reason)
    decode coverage through the REAL decode_media dispatch. Same scale
    shape as mp3_decode_coverage: decode in one Arrow pass, (source,
    kind, reason) counted map-side per partition, counts-only shuffle,
    permille window partitioned by source."""
    from pyspark.sql import Window

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in it:
            for src, kind, content in zip(
                pdf[source_col], pdf[kind_col], pdf[content_col]
            ):
                try:
                    decode_media(content, kind)
                    reason = "decoded"
                except ValueError as e:
                    reason = classify_media_refusal(kind, str(e))
                counts[(src, kind, reason)] += 1
        yield pd.DataFrame(
            [(s, k, r, n) for (s, k, r), n in counts.items()],
            columns=["source", "kind", "reason", "n"],
        )

    partial = df.select(
        F.col(source_col).alias("source"),
        F.col(kind_col).alias("kind"),
        F.col(content_col).alias("content"),
    ).mapInPandas(batches, _MEDIA_COVERAGE_PARTIAL_SCHEMA)
    agg = partial.groupBy("source", "kind", "reason").agg(
        F.sum("n").alias("n_streams")
    )
    # exact long/long `div` — see mp3_decode_coverage for why float
    # floor(1000*n/total) is not integer-exact at extreme totals
    return (
        agg.withColumn(
            "per_source", F.sum("n_streams").over(Window.partitionBy("source"))
        )
        .withColumn(
            "permille", F.expr("(1000 * n_streams) div per_source").cast("long")
        )
        .drop("per_source")
        .orderBy("source", "kind", "reason")
    )


# doc_id-derived (kind, codec/class) table for the synthetic mixed-media
# corpus: index -> (kind, expected reason). Decoded classes span all
# three modalities and six containers; refusal classes exercise each
# taxonomy bucket through a REAL decode failure.
MEDIA_CRAFT_CLASSES = (
    ("image", "decoded"),                    # 0: PPM P6
    ("image", "decoded"),                    # 1: PNG (gray, from-scratch)
    ("image", "decoded"),                    # 2: baseline JPEG (own encoder)
    ("audio", "decoded"),                    # 3: RIFF/WAVE 16-bit PCM
    ("audio", "decoded"),                    # 4: MP3 tone (own encoder)
    ("video", "decoded"),                    # 5: Y4M C420
    ("image", "unsupported_codec"),          # 6: WEBP magic
    ("image", "truncated"),                  # 7: PNG cut mid-chunk
    ("audio", "uncertified_huffman_table"),  # 8: MP3 table-16 patch
    ("video", "truncated"),                  # 9: Y4M cut mid-frame
    ("image", "decoded"),                    # 10: 8-bit palette BMP
    ("image", "decoded"),                    # 11: GIF87a (geo mask encoder)
    ("video", "decoded"),                    # 12: animated GIF89a (GCE,
                                             #     disposal 2, transparency)
    ("video", "corrupt"),                    # 13: GIF89a reserved disposal
    ("image", "decoded"),                    # 14: TIFF PackBits gray
    ("image", "corrupt"),                    # 15: TIFF PackBits overlong
    ("audio", "decoded"),                    # 16: AIFF int16 mono
    ("audio", "decoded"),                    # 17: AU int16 BE mono
    ("audio", "decoded"),                    # 18: FLAC verbatim mono
    ("audio", "truncated"),                  # 19: FLAC cut mid-frame
    ("video", "decoded"),                    # 20: MJPEG AVI (own JPEG enc)
    ("video", "unsupported_codec"),          # 21: AVI with a non-JPEG
                                             #     (raw DIB) video stream
)


def _flac_verbatim_mono(samples, rate: int = 8000) -> bytes:
    """Minimal spec-correct FLAC for the crafted corpus: STREAMINFO +
    one fixed-blocksize frame of a single 16-bit VERBATIM subframe —
    every field after the 144-bit STREAMINFO prefix is byte-aligned, so
    no bit writer is needed. CRCs reuse the decoder module's pinned
    polynomials (tests/test_flac.py pins them against standard check
    values, so encoder and decoder cannot drift together)."""
    import struct

    from railgun_spark.operators.flac import _crc8, _crc16

    n = len(samples)
    v = 0
    for val, bits in ((n, 16), (n, 16), (0, 24), (0, 24),
                      (rate, 20), (0, 3), (15, 5), (n, 36)):
        v = (v << bits) | val
    body = v.to_bytes(18, "big") + bytes(16)  # md5 zeros (unchecked)
    out = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    # sync(14) 0x3FFE + reserved + fixed-strategy = FF F8; blocksize
    # code 7 (16-bit follows) + rate-from-streaminfo = 70; mono +
    # 16-bit-sample code 4 + reserved = 08; frame number 0
    hdr = bytes([0xFF, 0xF8, 0x70, 0x08, 0x00]) + struct.pack(">H", n - 1)
    hdr += bytes([_crc8(hdr)])
    sub = bytes([0x02])  # VERBATIM subframe, no wasted bits
    sub += b"".join(struct.pack(">h", int(s)) for s in samples)
    frame = hdr + sub
    return out + frame + _crc16(frame).to_bytes(2, "big")


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _craft_media_stream(doc_id: int) -> "tuple[str, bytes]":
    """Deterministic (kind, bytes) for doc_id, class
    (doc_id // 7) % len(MEDIA_CRAFT_CLASSES) per that table."""
    import struct
    import zlib

    d = int(doc_id)
    cls = (d // 7) % len(MEDIA_CRAFT_CLASSES)
    if cls == 0:
        return "image", b"P6\n4 4\n255\n" + bytes((d + i) % 256 for i in range(48))
    if cls in (1, 7):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        raw = (b"\x00" + bytes([d % 256, (d + 1) % 256])
               + b"\x00" + bytes([(d + 2) % 256, (d + 3) % 256]))
        png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
        return "image", png if cls == 1 else png[:20]
    if cls == 2:
        import numpy as np

        from railgun_spark.operators.jpeg import encode_gray_jpeg

        return "image", encode_gray_jpeg(
            np.full((8, 8), 16 + d % 224, dtype=np.uint8)
        )
    if cls == 3:
        data = b"".join(
            struct.pack("<h", ((d * 37 + i * 97) % 65536) - 32768)
            for i in range(16)
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return "audio", b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    if cls in (4, 8):
        from railgun_spark.operators.mp3_encode import encode_mp3_tone

        blob = bytearray(encode_mp3_tone(1 + d % 20, d % 18, 3 + d % 12))
        if cls == 8:
            _patch_table16(blob)
        return "audio", bytes(blob)
    if cls in (5, 9):
        luma = bytes((d + i) % 256 for i in range(16))
        y4m = b"YUV4MPEG2 W4 H4 F25:1\n" + b"FRAME\n" + luma + bytes(8)
        return "video", y4m if cls == 5 else y4m[:-10]
    if cls == 10:
        # 8-bit palette BMP, bottom-up, 4 colors, 4x4
        pal = [((d + 17 * c) % 256, (d + 31 * c) % 256, (d + 47 * c) % 256)
               for c in range(4)]
        idx_rows = [bytes((d + y + x) % 4 for x in range(4)) for y in range(4)]
        data_off = 14 + 40 + 4 * 4
        raster = b"".join(row for row in reversed(idx_rows))  # w=4: no pad
        header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0,
                             data_off)
        header += struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0,
                              len(raster), 2835, 2835, 4, 0)
        header += b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal)
        return "image", header + raster
    if cls == 11:
        from railgun_spark.geo.serving import grid_to_gif

        grid = [[(d + y + x) % 2 for x in range(4)] for y in range(4)]
        return "image", grid_to_gif(grid, size=4)
    if cls in (12, 13):
        from railgun_spark.geo.serving import encode_gif_animation

        pal = [((d + 10 * c) % 256, (d + 20 * c) % 256, (d + 30 * c) % 256)
               for c in range(4)]
        f0 = [[(d + x + y) % 4 for x in range(4)] for y in range(4)]
        f1 = [[(d + 1 + x) % 4 for x in range(2)] for _y in range(2)]
        blob = bytearray(encode_gif_animation(
            [(0, 0, f0), (1, 1, f1)], pal,
            delays_cs=[4, 6], disposals=[0, 2], transparent=0,
            screen=(4, 4),
        ))
        if cls == 13:
            # patch frame 0's GCE disposal bits to the reserved value 5:
            # header 13 + 4-entry global table 12 -> GCE packed at +3
            gp_off = 13 + 12 + 3
            blob[gp_off] = (blob[gp_off] & ~0x1C) | (5 << 2)
        return "video", bytes(blob)
    if cls in (14, 15):
        # minimal little-endian strip TIFF, 4x4 gray, PackBits; cls 15's
        # strip inflates to 20 bytes against the declared 16 (overlong)
        data = bytes((d + 7 * i) % 256 for i in range(16))
        pb = (bytes([19]) + bytes(20)) if cls == 15 else (bytes([15]) + data)
        strip_off = 8
        ifd_off = strip_off + len(pb)

        def tiff_tag(t: int, ttype: int, val: int) -> bytes:
            return struct.pack("<HHII", t, ttype, 1, val)

        ifd = struct.pack("<H", 5) + b"".join((
            tiff_tag(256, 3, 4), tiff_tag(257, 3, 4),
            tiff_tag(259, 3, 32773),
            tiff_tag(273, 4, strip_off), tiff_tag(279, 4, len(pb)),
        )) + struct.pack("<I", 0)
        return "image", (b"II\x2a\x00" + struct.pack("<I", ifd_off)
                         + pb + ifd)
    if cls == 16:
        # AIFF: COMM (80-bit extended rate) + SSND, int16 BE mono
        rate, n = 8000, 16
        pcm = b"".join(struct.pack(">h", ((d * 41 + i * 89) % 65536) - 32768)
                       for i in range(n))
        exp, mant = 16383 + 63, rate
        while mant < (1 << 63):
            mant <<= 1
            exp -= 1
        f80 = struct.pack(">HII", exp, mant >> 32, mant & 0xFFFFFFFF)
        comm = struct.pack(">hIh", 1, n, 16) + f80
        ssnd = struct.pack(">II", 0, 0) + pcm
        return "audio", (b"FORM"
                         + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
                         + b"AIFF" + b"COMM" + struct.pack(">I", len(comm))
                         + comm + b"SSND" + struct.pack(">I", len(ssnd))
                         + ssnd)
    if cls == 17:
        # AU: .snd header, encoding 3 = int16 BE, mono
        pcm = b"".join(struct.pack(">h", ((d * 53 + i * 71) % 65536) - 32768)
                       for i in range(16))
        return "audio", (b".snd"
                         + struct.pack(">IIIII", 24, len(pcm), 3, 8000, 1)
                         + pcm)
    if cls in (18, 19):
        flac = _flac_verbatim_mono(
            [((d * 29 + i * 97) % 65536) - 32768 for i in range(16)]
        )
        return "audio", flac if cls == 18 else flac[:-12]  # cut mid-frame
    if cls in (20, 21):
        import numpy as np

        from railgun_spark.operators.jpeg import encode_gray_jpeg

        jpgs = [encode_gray_jpeg(
                    np.full((8, 8), (d + 60 * k) % 256, dtype=np.uint8))
                for k in range(2)]
        if cls == 21:  # a raw-DIB frame: known container, refused codec
            jpgs[1] = bytes([d % 256]) * 32

        def riff_chunk(cid: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) & 1 else b""
            return cid + struct.pack("<I", len(body)) + body + pad

        avih = struct.pack("<IIIIIIIIII", 40000, 0, 0, 0, 2, 0, 1, 0, 8, 8)
        hdrl = riff_chunk(b"LIST", b"hdrl" + riff_chunk(b"avih", avih))
        movi = riff_chunk(
            b"LIST", b"movi" + b"".join(riff_chunk(b"00dc", j) for j in jpgs)
        )
        body = b"AVI " + hdrl + movi
        return "video", b"RIFF" + struct.pack("<I", len(body)) + body
    return "image", b"RIFF\x10\x00\x00\x00WEBPVP8 "  # cls 6


_MEDIA_KIND_CASE = f"CASE CAST((doc_id // 7) % {len(MEDIA_CRAFT_CLASSES)} AS INT) " + " ".join(
    f"WHEN {i} THEN '{k}'" for i, (k, _) in enumerate(MEDIA_CRAFT_CLASSES)
) + " END"
_MEDIA_REASON_CASE = f"CASE CAST((doc_id // 7) % {len(MEDIA_CRAFT_CLASSES)} AS INT) " + " ".join(
    f"WHEN {i} THEN '{r}'" for i, (_, r) in enumerate(MEDIA_CRAFT_CLASSES)
) + " END"


@query(
    # r12 rotation: promoted into the driver gate — the full codec-matrix
    # decode-coverage report is the r11 headline capability.
    "media_refusal_report",
    oracle=f"""
    WITH s AS (
      SELECT source,
             {_MEDIA_KIND_CASE} AS kind,
             {_MEDIA_REASON_CASE} AS reason
      FROM documents WHERE doc_id % 7 = 0
    ),
    g AS (
      SELECT source, kind, reason, COUNT(*) AS n_streams
      FROM s GROUP BY source, kind, reason
    )
    SELECT source, kind, reason, n_streams,
           CAST((1000 * n_streams)
                // SUM(n_streams) OVER (PARTITION BY source)
                AS BIGINT) AS permille
    FROM g
    ORDER BY source, kind, reason
    """,
    doc="Whole-codec-matrix decode-coverage report: the mp3_refusal_report "
    "pattern generalized through the decode_media dispatch over a "
    "synthetic MIXED-MODALITY corpus (PPM/PNG/JPEG images, WAV/MP3 audio, "
    "Y4M video, plus crafted per-taxonomy refusals). The oracle "
    "recomputes each doc's expected (kind, reason) from doc_id "
    "arithmetic, so real decodes across six containers must land in "
    "exactly the predicted classes.",
    tags=("multimodal", "observability", "pandas-udf"),
)
def media_refusal_report(spark, sf_dir: str) -> DataFrame:
    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "source"),
        heavy=True,  # every row encodes + decodes a real stream
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds, blobs = [], []
            for d in pdf["doc_id"]:
                kind, blob = _craft_media_stream(d)
                kinds.append(kind)
                blobs.append(blob)
            yield pd.DataFrame(
                {"source": pdf["source"], "kind": kinds, "content": blobs}
            )

    corpus = docs.mapInPandas(
        synth,
        T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    return media_decode_coverage(corpus)


@query(
    # r18: restored to the driver gate (VERDICT r17 #1) — the r17
    # rotation shrank driver-verified coverage 50 -> 49 and the
    # dropped-query rule is absolute; promotions must not demote.
    "gif_animation_report",
    # Each crafted animation's frame count and solid-gray frame values
    # derive from doc_id arithmetic, so the oracle predicts the decoded
    # per-source totals without decoding anything: a REAL
    # encode->decode->composite round-trip on every row must land on
    # exactly these integers.
    oracle="""
    WITH s AS (
      SELECT source, doc_id AS d, 2 + CAST(doc_id % 3 AS INT) AS n_frames
      FROM documents WHERE doc_id % 5 = 0
    ), fr AS (
      SELECT source, d, n_frames,
             unnest(generate_series(0, n_frames - 1)) AS k
      FROM s
    ), lum AS (
      SELECT source, d, n_frames,
             SUM((d * 13 + 40 * ((d + k) % 4)) % 256) AS total_luma
      FROM fr GROUP BY source, d, n_frames
    )
    SELECT source, count(*) AS n_streams,
           SUM(n_frames)::BIGINT AS sum_frames,
           SUM(total_luma)::BIGINT AS sum_luma
    FROM lum GROUP BY source ORDER BY source
    """,
    doc="Animated-GIF decode certification: every row encodes a crafted "
    "GIF89a animation (2-4 solid-gray frames, doc_id-derived palette) "
    "with the library's own encoder, decodes it through "
    "decode_gif_frames' compositing walker, and reports per-source "
    "stream/frame/luma totals the oracle recomputes from doc_id "
    "arithmetic. Map-side Arrow pass; only (source, 2 ints) shuffle.",
    tags=("multimodal", "pandas-udf"),
)
def gif_animation_report(spark, sf_dir: str) -> DataFrame:
    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "source"),
        heavy=True,  # every row encodes + decodes a real animation
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from railgun_spark.geo.serving import encode_gif_animation

        for pdf in it:
            rows = []
            for d, src in zip(pdf["doc_id"], pdf["source"]):
                d = int(d)
                n = 2 + d % 3
                pal = [((d * 13 + 40 * c) % 256,) * 3 for c in range(4)]
                frames = [
                    (0, 0, [[(d + k) % 4] * 4 for _ in range(4)])
                    for k in range(n)
                ]
                blob = encode_gif_animation(
                    frames, pal, delays_cs=[5] * n, screen=(4, 4)
                )
                decoded, _delays = decode_gif_frames(blob)
                rows.append((
                    src,
                    len(decoded),
                    int(sum(int(round(f.mean())) for f in decoded)),
                ))
            yield pd.DataFrame(
                rows, columns=["source", "n_frames", "total_luma"]
            )

    per = docs.mapInPandas(
        batches, "source: string, n_frames: int, total_luma: long"
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_streams"),
            F.sum("n_frames").cast("long").alias("sum_frames"),
            F.sum("total_luma").alias("sum_luma"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_resize_report",
    # Solid-color sources make the resize pipeline integer-predictable:
    # bilinear resampling of a constant raster is the same constant, so
    # after decode -> resize -> PNG re-encode -> decode the channel means
    # are exactly the crafted colors — the oracle recomputes them from
    # doc_id arithmetic.
    oracle="""
    SELECT source, count(*) AS n_images,
           SUM((doc_id * 3) % 256)::BIGINT AS sum_r,
           SUM((doc_id * 5) % 256)::BIGINT AS sum_g,
           SUM((doc_id * 7) % 256)::BIGINT AS sum_b
    FROM documents WHERE doc_id % 9 = 0
    GROUP BY source ORDER BY source
    """,
    doc="REAL image-resize certification: per row, craft a solid PPM of "
    "doc_id-derived color/size, run resize_images (decode -> bilinear -> "
    "PNG re-encode), decode the OUTPUT PNG, and aggregate the channel "
    "means per source — every stage of the resize path executes on real "
    "bytes and must land on the oracle's integers.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_resize_report(spark, sf_dir: str) -> DataFrame:
    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 9 == 0)
        .select("doc_id", "source"),
        heavy=True,
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, src in zip(pdf["doc_id"], pdf["source"]):
                d = int(d)
                w, h = 3 + d % 5, 2 + d % 4
                color = bytes([(d * 3) % 256, (d * 5) % 256, (d * 7) % 256])
                ppm = (b"P6\n" + f"{w} {h}\n255\n".encode()
                       + color * (w * h))
                rows.append((d, "image", ppm, {"src": src}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    media = docs.mapInPandas(synth, MEDIA_SCHEMA)
    resized = resize_images(media, 4, 4)

    def measure(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                d = decode_image(bytes(content), "image")
                rows.append((
                    meta["src"],
                    int(round(d["feature"][0])),
                    int(round(d["feature"][1])),
                    int(round(d["feature"][2])),
                ))
            yield pd.DataFrame(rows, columns=["source", "r", "g", "b"])

    per = resized.mapInPandas(
        measure, "source: string, r: long, g: long, b: long"
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("r").alias("sum_r"),
            F.sum("g").alias("sum_g"),
            F.sum("b").alias("sum_b"),
        )
        .orderBy("source")
    )


@query(
    "audio_resample_report",
    # Constant-amplitude sources make the resample pipeline
    # integer-predictable: linear interpolation of a constant signal is
    # the same constant at any rate, and amplitudes k/128 sit exactly on
    # the 16-bit grid (k*256/32768), so decode -> resample -> WAV
    # re-encode -> decode recovers k exactly.
    oracle="""
    SELECT source, count(*) AS n_clips,
           SUM((doc_id % 201) - 100)::BIGINT AS sum_k,
           (count(*) * 32)::BIGINT AS sum_samples
    FROM documents WHERE doc_id % 11 = 0
    GROUP BY source ORDER BY source
    """,
    doc="REAL audio-resample certification: per row, craft a 16-sample "
    "8 kHz PCM WAV of doc_id-derived constant amplitude k/128, run "
    "resample_audio to 16 kHz (decode -> linear interp -> 16-bit "
    "re-encode), decode the OUTPUT WAV, and aggregate recovered k and "
    "sample counts per source against the oracle's arithmetic.",
    tags=("multimodal", "pandas-udf"),
)
def audio_resample_report(spark, sf_dir: str) -> DataFrame:
    import struct

    docs = spread_for_decode(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id", "source"),
        heavy=True,
    )

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, src in zip(pdf["doc_id"], pdf["source"]):
                k = int(d) % 201 - 100
                data = struct.pack("<h", k * 256) * 16
                fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt))
                        + fmt + b"data" + struct.pack("<I", len(data))
                        + data)
                wav = b"RIFF" + struct.pack("<I", len(body)) + body
                rows.append((int(d), "audio", wav, {"src": src}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    media = docs.mapInPandas(synth, MEDIA_SCHEMA)
    resampled = resample_audio(media, 16000)

    def measure(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                d = decode_wav(bytes(content))
                assert d["sample_rate"] == 16000
                rows.append((
                    meta["src"],
                    int(round(d["feature"][3] * 128)),  # mean -> k
                    int(d["n_samples"]),
                ))
            yield pd.DataFrame(rows, columns=["source", "k", "n_samples"])

    per = resampled.mapInPandas(
        measure, "source: string, k: long, n_samples: long"
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("k").alias("sum_k"),
            F.sum("n_samples").alias("sum_samples"),
        )
        .orderBy("source")
    )


@extra_query(
    "multimodal_frame_sample",
    oracle="""
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx
    FROM (
      SELECT doc_id AS media_id,
             unnest(generate_series(0, CAST(n_chars // 5 AS INT) - 1, 10))
               AS frame_idx
      FROM documents
      WHERE CAST(doc_id % 3 AS INT) = 2 AND CAST(n_chars // 5 AS INT) > 0
    )
    ORDER BY media_id, frame_idx
    """,
    doc="Video frame sampling: per-media frame indices exploded Spark-side "
    "from declared frame-count metadata (every 10th frame); real frame "
    "decode would run inside a mapInPandas over these (media_id, frame_idx) "
    "pairs.",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
    sampled = frame_sample(media_frame(spark, sf_dir), every_n=10)
    return sampled.select("media_id", F.col("frame_idx").cast("int").alias("frame_idx")).orderBy(
        "media_id", "frame_idx"
    )


@extra_query(
    "multimodal_kind_stats",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n_media,
           sum(octet_length(encode(text)))::BIGINT AS total_bytes,
           CAST(max(16 + (octet_length(encode(text)) % 64)) AS INT) AS max_width
    FROM documents
    GROUP BY 1 ORDER BY kind
    """,
    doc="Typed-metadata aggregation over extracted media features: the "
    "columnar summary stays JVM-side after the single Python decode hop.",
    tags=("multimodal", "agg"),
)
def multimodal_kind_stats(spark, sf_dir: str) -> DataFrame:
    feats = extract_features(media_frame(spark, sf_dir))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )


# --------------------------------------------------------------------------
# REAL image decoding for the library-free formats. PIL/ffmpeg are absent
# from this container, but binary PPM (P6), uncompressed 24/32-bit BMP,
# PNG — all color types/depths, sequential and Adam7 (stdlib zlib
# inflate + per-scanline unfilter) — and
# JPEG — baseline AND progressive (from-scratch T.81 huffman + IDCT in operators/jpeg.py)
# need nothing beyond stdlib + numpy — so for those formats
# `extract_features(df, decoder=decode_media, require_real=True)` is a
# genuinely working decode path, not a stub (decode_media dispatches by
# kind; decode_image alone requires a pre-filtered image-only frame).
# Anything else (video/audio compression codecs) still raises: wire a
# codec library through the same hook.
# --------------------------------------------------------------------------
def decode_image_raster(content: bytes):
    """Magic-dispatched full-raster decode to an (h, w, 3) float64 RGB
    array — the shared front half of decode_image, also consumed by the
    real resize operator. Raises ValueError on codecs outside the
    library-free set."""
    b = bytes(content or b"")
    if b[:2] == b"P6":
        return _decode_ppm_p6(b)
    if b[:2] in (b"P4", b"P5"):
        return _decode_pnm_gray(b)
    if b[:2] in (b"P1", b"P2", b"P3"):
        return _decode_pnm_ascii(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from railgun_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(b)
    if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        return _decode_tiff(b)
    raise ValueError(
        "unsupported image codec (library-free decode covers PPM P6, "
        "uncompressed BMP, PNG, GIF, TIFF (none/LZW/PackBits), and "
        "baseline+progressive JPEG; other formats need a codec "
        "library via decoder=)"
    )


def decode_image(content: bytes, kind: str) -> dict:
    """Decode PPM(P6)/BMP/PNG/JPEG bytes to (width, height,
    feature[8]): mean R, G, B, mean gray, and the four quadrant gray
    means — deterministic stdlib+numpy arithmetic, no codec libraries.
    Raises ValueError on non-image kinds and on formats that DO need a
    codec library."""
    if kind != "image":
        raise ValueError(f"decode_image got kind={kind!r}")
    rgb = decode_image_raster(content)
    h, w = rgb.shape[0], rgb.shape[1]
    gray = rgb.mean(axis=2)
    th, lw = (h + 1) // 2, (w + 1) // 2  # top/left halves (never empty)
    feature = [
        float(rgb[:, :, 0].mean()),
        float(rgb[:, :, 1].mean()),
        float(rgb[:, :, 2].mean()),
        float(gray.mean()),
        float(gray[:th, :lw].mean()),
        float(gray[:th, w // 2 :].mean()),
        float(gray[h // 2 :, :lw].mean()),
        float(gray[h // 2 :, w // 2 :].mean()),
    ]
    return {"width": int(w), "height": int(h), "feature": feature}


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW decode (spec Appendix F): variable-width codes
    LSB-first, CLEAR/EOI, one dictionary entry completed per data code
    (except the first after a clear), width widening when the decoder's
    own counter fills a power of two, KwKwK handling. Stops after
    `n_pixels` even if EOI is missing padding-wise, but refuses running
    out of bits early."""
    import numpy as np

    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    total_bits = len(data) * 8

    def fresh():
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, width = fresh()
    out: list[int] = []
    prev = None
    while len(out) < n_pixels:
        if pos + width > total_bits:
            raise ValueError("truncated GIF image data")
        code = 0
        for i in range(width):
            byte, bit = divmod(pos + i, 8)
            code |= ((data[byte] >> bit) & 1) << i
        pos += width
        if code == clear:
            table, nxt, width = fresh()
            prev = None
            continue
        if code == eoi:
            raise ValueError(
                f"GIF image data ended after {len(out)} of {n_pixels} pixels"
            )
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:  # KwKwK
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + (entry[0],)
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.array(out[:n_pixels], dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_read_image(b: bytes, i: int, gct):
    """Parse one image block (descriptor at b[i] == 0x2C): local color
    table, LZW data sub-blocks, interlace de-shuffle. Returns
    (left, top, w, h, idx(h, w) uint8, table(n, 3) uint8, next_i).
    Shared by the first-frame image decode and the animation walker so
    raster parsing cannot drift between them."""
    import struct

    import numpy as np

    if i + 10 > len(b):
        raise ValueError("truncated GIF image descriptor")
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, i + 1)
    i += 10
    table = gct
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 0x07)
        table = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8)
        if len(table) < 3 * n:
            raise ValueError("truncated GIF local color table")
        table = table.reshape(n, 3)
        i += 3 * n
    if table is None:
        raise ValueError("GIF image has no color table")
    if not w or not h:
        raise ValueError("zero-dimension GIF image")
    if i >= len(b):
        raise ValueError("truncated GIF image data")
    min_code = b[i]
    i += 1
    if not (2 <= min_code <= 11):
        raise ValueError(f"bad GIF LZW minimum code size {min_code}")
    lzw = bytearray()
    while i < len(b) and b[i]:
        n = b[i]
        chunk = b[i + 1 : i + 1 + n]
        if len(chunk) < n:
            raise ValueError("truncated GIF data sub-block")
        lzw += chunk
        i += 1 + n
    if i >= len(b):
        raise ValueError("truncated GIF: missing block terminator")
    i += 1  # consume the 0x00 block terminator
    idx = _lzw_decode_gif(bytes(lzw), min_code, w * h)
    if int(idx.max()) >= len(table):
        raise ValueError(
            f"corrupt GIF: pixel index {int(idx.max())} outside the "
            f"{len(table)}-entry color table"
        )
    if ipacked & 0x40:  # interlaced: 4-pass row shuffle
        rows = idx.reshape(h, w)
        out = np.empty((h, w), dtype=np.uint8)
        r = 0
        for y0, dy in _GIF_INTERLACE_PASSES:
            for y in range(y0, h, dy):
                out[y] = rows[r]
                r += 1
        idx = out.reshape(-1)
    return left, top, w, h, idx.reshape(h, w), table, i


def _decode_gif(b: bytes):
    """GIF87a/89a first image: global/local color table, optional
    interlacing, 89a extension blocks skipped (animation beyond the
    first frame, transparency, and disposal are presentation concerns —
    feature extraction wants the first raster). Truncation refused."""
    import struct

    import numpy as np

    if len(b) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if not sw or not sh:
        raise ValueError("zero-dimension GIF logical screen")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        i += 3 * n
    while i < len(b):
        marker = b[i]
        if marker == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif marker == 0x2C:  # image descriptor
            left, top, w, h, idx, table, i = _gif_read_image(b, i, gct)
            frame = table[idx].astype("float64")
            if (left, top, w, h) == (0, 0, sw, sh):
                return frame
            # a first frame smaller than the logical screen is positioned
            # at (left, top) on the sw x sh canvas; features are over the
            # positioned canvas, not the bare sub-image. Background color
            # per the header's index (black when it points outside the
            # global table or no global table exists — 89a leaves the
            # background undefined then).
            if left + w > sw or top + h > sh:
                raise ValueError(
                    f"GIF image {w}x{h}@({left},{top}) exceeds the "
                    f"{sw}x{sh} logical screen"
                )
            if gct is not None and bg < len(gct):
                canvas = np.tile(
                    gct[bg].astype("float64"), (sh, sw, 1)
                )
            else:
                canvas = np.zeros((sh, sw, 3), dtype="float64")
            canvas[top : top + h, left : left + w] = frame
            return canvas
        elif marker == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"bad GIF block marker 0x{marker:02x}")
    raise ValueError("GIF contains no image")


def decode_gif_frames(b: bytes):
    """GIF89a animation decode: every frame composited onto the logical
    screen per the spec's graphic-control semantics (89a Appendix,
    public spec) — disposal 0/1 leave the canvas, 2 restores the frame
    rect to the background color, 3 restores the pre-frame canvas;
    transparent pixels (GCE transparency flag + index) never overwrite.
    Returns (frames, delays_cs): a list of (sh, sw, 3) float64 canvases
    (one snapshot per image block) and the per-frame GCE delays in
    centiseconds (0 where no GCE preceded the image). Shares
    _gif_read_image with the single-frame decoder so raster parsing
    cannot drift. Truncation and structural violations refuse."""
    import struct

    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if not sw or not sh:
        raise ValueError("zero-dimension GIF logical screen")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        i += 3 * n

    if gct is not None and bg < len(gct):
        background = gct[bg].astype("float64")
    else:  # 89a leaves the background undefined without a global table
        background = np.zeros(3, dtype="float64")
    canvas = np.tile(background, (sh, sw, 1))

    frames: list = []
    delays: list[int] = []
    # GCE state applies to the NEXT image block only
    disposal, transparent_idx, delay_cs = 0, None, 0
    while i < len(b):
        marker = b[i]
        if marker == 0x21:  # extension
            if i + 2 > len(b):
                raise ValueError("truncated GIF extension")
            label = b[i + 1]
            i += 2
            if label == 0xF9:  # graphic control: one 4-byte sub-block
                if i >= len(b) or b[i] != 4 or i + 5 > len(b):
                    raise ValueError("corrupt GIF graphic-control block")
                gpacked = b[i + 1]
                delay_cs = struct.unpack_from("<H", b, i + 2)[0]
                disposal = (gpacked >> 2) & 0x07
                if disposal > 3:
                    raise ValueError(
                        f"corrupt GIF: reserved disposal method {disposal}"
                    )
                transparent_idx = b[i + 4] if gpacked & 0x01 else None
                i += 5
            while i < len(b) and b[i]:  # skip remaining sub-blocks
                i += 1 + b[i]
            if i >= len(b):
                raise ValueError("truncated GIF: missing block terminator")
            i += 1
        elif marker == 0x2C:  # image block -> one animation frame
            left, top, w, h, idx, table, i = _gif_read_image(b, i, gct)
            if left + w > sw or top + h > sh:
                raise ValueError(
                    f"GIF image {w}x{h}@({left},{top}) exceeds the "
                    f"{sw}x{sh} logical screen"
                )
            prev = canvas.copy() if disposal == 3 else None
            rect = canvas[top : top + h, left : left + w]
            frame_rgb = table[idx].astype("float64")
            if transparent_idx is not None:
                opaque = idx != transparent_idx
                rect[opaque] = frame_rgb[opaque]
            else:
                rect[:] = frame_rgb
            frames.append(canvas.copy())
            delays.append(delay_cs)
            if disposal == 2:  # restore rect to background
                canvas[top : top + h, left : left + w] = background
            elif disposal == 3:  # restore to pre-frame canvas
                canvas = prev
            disposal, transparent_idx, delay_cs = 0, None, 0
        elif marker == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block marker 0x{marker:02x}")
    if not frames:
        raise ValueError("GIF animation contains no frames")
    return frames, delays


def decode_gif_animation(content: bytes) -> dict:
    """Animated GIF -> the VIDEO_FEATURE_SCHEMA result shape
    (width/height/n_frames/fps/feature), so decode_video can dispatch
    GIF89a animations next to Y4M and MJPEG-AVI. fps derives from the
    mean GCE delay (0.0 when every delay is 0 — an untimed animation);
    the feature is the per-frame gray mean curve's (mean, std, first,
    last) plus the first frame's quadrant means, matching the video
    feature discipline."""
    import numpy as np

    frames, delays = decode_gif_frames(bytes(content or b""))
    grays = [f.mean(axis=2) for f in frames]
    means = np.array([g.mean() for g in grays], dtype="float64")
    total_cs = sum(delays)
    fps = (len(frames) * 100.0 / total_cs) if total_cs > 0 else 0.0
    g0 = grays[0]
    h, w = g0.shape
    th, lw = (h + 1) // 2, (w + 1) // 2
    feature = [
        float(means.mean()),
        float(means.std()),
        float(means[0]),
        float(means[-1]),
        float(g0[:th, :lw].mean()),
        float(g0[:th, w // 2 :].mean()),
        float(g0[h // 2 :, :lw].mean()),
        float(g0[h // 2 :, w // 2 :].mean()),
    ]
    return {
        "width": int(w), "height": int(h), "n_frames": len(frames),
        "fps": round(float(fps), 6), "feature": feature,
    }


def _pnm_header(b: bytes, n_fields: int):
    """Shared netpbm header tokenizer ('#' comments allowed): returns
    (fields, raster_offset) — the PPM P6 parser's discipline."""
    tokens, i, n = [], 2, len(b)
    while len(tokens) < n_fields:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < n and not b[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PNM header")
        tokens.append(int(b[start:i]))
    return tokens, i + 1  # one whitespace byte separates header and raster


def _decode_pnm_gray(b: bytes):
    """Binary PGM (P5: 8-bit gray) and PBM (P4: packed 1-bit bitmap,
    1 = black per spec) -> RGB raster; completes the netpbm family
    next to PPM P6."""
    import numpy as np

    if b[:2] == b"P5":
        (w, h, maxval), off = _pnm_header(b, 3)
        if not 0 < maxval < 65536:
            raise ValueError(f"bad PGM maxval {maxval}")
        if maxval > 255:  # 2-byte big-endian samples, scaled into 0..255
            need = w * h * 2
            raster = b[off : off + need]
            if len(raster) < need:
                raise ValueError(f"truncated PGM raster: {len(raster)} < {need}")
            g16 = np.frombuffer(raster, dtype=">u2").reshape(h, w)
            g = g16 * (255.0 / maxval)
            return np.repeat(g[:, :, None], 3, axis=2).astype("float64")
        need = w * h
        raster = b[off : off + need]
        if len(raster) < need:
            raise ValueError(f"truncated PGM raster: {len(raster)} < {need}")
        g = np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
    else:  # P4
        (w, h), off = _pnm_header(b, 2)
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        raster = b[off : off + need]
        if len(raster) < need:
            raise ValueError(f"truncated PBM raster: {len(raster)} < {need}")
        bits = np.unpackbits(
            np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes), axis=1
        )[:, :w]
        g = ((1 - bits) * 255).astype(np.uint8)  # 1 = black
    return np.repeat(g[:, :, None], 3, axis=2).astype("float64")


def _decode_pnm_ascii(b: bytes):
    """ASCII netpbm: P1 bitmap (1 = black; digits may abut per spec),
    P2 gray and P3 RGB (maxval-scaled into 0..255); '#' comments allowed
    anywhere in the token stream. Completes the netpbm family next to
    the binary P4/P5/P6 decoders."""
    import numpy as np

    kind = b[:2]
    # strip comments, then the rest is a whitespace-separated token stream
    body = bytearray()
    i, n = 2, len(b)
    while i < n:
        if b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
        else:
            body += b[i : i + 1]
            i += 1
    toks = bytes(body).split()
    if kind == b"P1":
        if len(toks) < 2:
            raise ValueError("truncated P1 header")
        w, h = int(toks[0]), int(toks[1])
        digits = b"".join(toks[2:])
        if len(digits) < w * h:
            raise ValueError(f"truncated P1 raster: {len(digits)} < {w * h}")
        bits = np.frombuffer(digits[: w * h], dtype=np.uint8) - ord("0")
        if bits.min(initial=0) < 0 or bits.max(initial=0) > 1:
            raise ValueError("corrupt P1 raster: non-binary digit")
        g = ((1 - bits) * 255).astype(np.uint8).reshape(h, w)  # 1 = black
        return np.repeat(g[:, :, None], 3, axis=2).astype("float64")
    ch = 1 if kind == b"P2" else 3
    if len(toks) < 3:
        raise ValueError(f"truncated {kind.decode()} header")
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    if not 0 < maxval < 65536:
        raise ValueError(f"bad {kind.decode()} maxval {maxval}")
    need = w * h * ch
    vals = toks[3 : 3 + need]
    if len(vals) < need:
        raise ValueError(
            f"truncated {kind.decode()} raster: {len(vals)} < {need}"
        )
    px = np.array([int(v) for v in vals], dtype="float64")
    if px.min(initial=0) < 0 or px.max(initial=0) > maxval:
        raise ValueError(f"corrupt {kind.decode()} raster: sample > maxval")
    px = (px * (255.0 / maxval)).reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first code packing (GIF packs LSB-first —
    the two dialects share the algorithm, not the bitstream), 9..12-bit
    codes with EarlyChange (the code width bumps when the string table
    reaches 2^w - 1 entries, one entry EARLIER than GIF), Clear = 256,
    EndOfInformation = 257. Refuses truncation and out-of-range codes."""
    CLEAR, EOI = 256, 257

    def fresh_table() -> list:
        return [bytes([x]) for x in range(256)] + [b"", b""]

    out = bytearray()
    table = fresh_table()
    nbits = 9
    prev = b""
    have_prev = False
    acc = acc_bits = 0
    i, n = 0, len(data)
    while True:
        while acc_bits < nbits:
            if i >= n:  # ran out of bits without EOI
                raise ValueError(
                    f"truncated TIFF LZW strip: {len(out)} of {expected} bytes"
                )
            acc = (acc << 8) | data[i]
            i += 1
            acc_bits += 8
        code = (acc >> (acc_bits - nbits)) & ((1 << nbits) - 1)
        acc_bits -= nbits
        acc &= (1 << acc_bits) - 1
        if code == EOI:
            break
        if code == CLEAR:
            table = fresh_table()
            nbits = 9
            have_prev = False
            continue
        if not have_prev:
            if code > 255:
                raise ValueError(
                    f"corrupt TIFF LZW stream (code {code} right after clear)"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt TIFF LZW stream (code {code})")
        out += entry
        prev = entry
        have_prev = True
        # EarlyChange width bump, minus one more for the decoder's
        # one-append lag: the encoder assigns entry N as it EMITS code k,
        # but this side only appends N when it reads code k+1 — so when
        # our table holds 2^w - 2 entries the encoder (one ahead) has
        # already crossed 2^w - 1 and switched widths for the next code
        if len(table) >= (1 << nbits) - 2 and nbits < 12:
            nbits += 1
        if len(out) >= expected:
            # fail closed on inflation, mirroring _packbits_decode: an
            # entry that crosses the declared strip size, or trailing data
            # codes where EOI belongs, mean the strip encodes MORE than it
            # declares — refuse rather than silently truncate
            if len(out) > expected:
                raise ValueError(
                    f"corrupt TIFF LZW strip: overlong "
                    f"({len(out)} > {expected} bytes)"
                )
            # spec-legal tails: any number of Clear codes may precede EOI
            # (each resets the code width to 9), and EOI itself may be
            # omitted when fewer than tail_bits padding bits remain —
            # only a DATA code past the declared size means overlong
            tail_bits = nbits
            while acc_bits + 8 * (n - i) >= tail_bits:
                while acc_bits < tail_bits:
                    acc = (acc << 8) | data[i]
                    i += 1
                    acc_bits += 8
                tail = (acc >> (acc_bits - tail_bits)) & ((1 << tail_bits) - 1)
                acc_bits -= tail_bits
                acc &= (1 << acc_bits) - 1
                if tail == EOI:
                    break
                if tail == CLEAR:
                    tail_bits = 9
                    continue
                raise ValueError(
                    "corrupt TIFF LZW strip: overlong (data after "
                    "declared strip size, missing EOI)"
                )
            break
    if len(out) < expected:
        raise ValueError(
            f"truncated TIFF LZW strip: {len(out)} of {expected} bytes"
        )
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits RLE (spec section 9): n in 0..127 -> copy n+1
    literal bytes; n in -127..-1 -> repeat next byte 1-n times; -128 is
    a no-op. Refuses output over- or under-run."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run
            chunk = data[i : i + n + 1]
            if len(chunk) < n + 1:
                raise ValueError("truncated TIFF PackBits literal run")
            out += chunk
            i += n + 1
        elif n > 128:  # replicate next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated TIFF PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError(
            f"truncated TIFF PackBits strip: {len(out)} of {expected} bytes"
        )
    if len(out) > expected:
        raise ValueError(
            f"corrupt TIFF PackBits strip: overlong "
            f"({len(out)} > {expected} bytes)"
        )
    return bytes(out)


def _decode_tiff(b: bytes):
    """Baseline TIFF (both byte orders): first IFD, 8-bit grayscale or
    RGB(A), strip layout, compression none (1), LZW (5, §13 MSB-first
    with EarlyChange), or PackBits (32773), horizontal-differencing
    predictor (§14). Tiled, JPEG-compressed, palette, and sub-8-bit
    TIFFs raise — the usual fail-closed discipline."""
    import struct

    import numpy as np

    if b[:4] == b"II\x2a\x00":
        e = "<"
    elif b[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(e + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack_from(e + "H", b, ifd_off)
    type_size = {1: 1, 3: 2, 4: 4}

    def tag_values(pos):
        tag, ttype, count = struct.unpack_from(e + "HHI", b, pos)
        if ttype not in type_size:
            return tag, None  # rational/ascii tags are irrelevant here
        total = type_size[ttype] * count
        off = pos + 8 if total <= 4 else struct.unpack_from(e + "I", b, pos + 8)[0]
        if off + total > len(b):
            raise ValueError(f"truncated TIFF tag {tag}")
        fmt = {1: "B", 3: "H", 4: "I"}[ttype]
        return tag, list(struct.unpack_from(e + fmt * count, b, off))

    tags = {}
    for t in range(n_tags):
        pos = ifd_off + 2 + 12 * t
        if pos + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag, vals = tag_values(pos)
        if vals is not None:
            tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if not w or not h:
        raise ValueError("zero-dimension TIFF")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(x != 8 for x in bits):
        raise ValueError(f"only 8-bit TIFF samples supported ({bits})")
    if spp not in (1, 3, 4):
        raise ValueError(f"unsupported TIFF samples/pixel {spp}")
    comp = one(259, 1)
    if comp not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (none, LZW, and PackBits "
            "decode library-free; JPEG-in-TIFF needs a codec library)"
        )
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(
            f"unsupported TIFF predictor {predictor} (none and horizontal "
            "differencing decode library-free)"
        )
    photometric = one(262, 1)
    if photometric == 3:
        raise ValueError("palette TIFF not supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strip layout only)")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)
    row_bytes = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError(f"truncated TIFF strip {si}")
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = n_rows * row_bytes
        chunk = b[off : off + cnt]
        if comp == 32773:
            raw += _packbits_decode(chunk, expected)
        elif comp == 5:
            raw += _lzw_decode_tiff(chunk, expected)
        else:
            raw += chunk
    if len(raw) < h * row_bytes:
        raise ValueError(f"truncated TIFF raster: {len(raw)} < {h * row_bytes}")
    px = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing (§14): each sample stores the delta to
        # the previous pixel's same channel; undo per row with a wrapping
        # cumulative sum
        px = np.cumsum(px.astype(np.uint64), axis=1).astype(np.uint8)
    if spp == 1:
        g = 255 - px if photometric == 0 else px  # WhiteIsZero inverts
        rgb = np.repeat(g, 3, axis=2)
    else:
        rgb = px[:, :, :3]  # drop alpha
    return rgb.astype("float64")


def _decode_ppm_p6(b: bytes):
    """Binary PPM: 'P6' <ws> width <ws> height <ws> maxval <one ws> raw
    RGB triplets; '#' comments allowed in the header."""
    import numpy as np

    tokens, i, n = [], 2, len(b)
    while len(tokens) < 3:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < n and not b[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(b[start:i]))
    i += 1  # exactly one whitespace byte separates header from raster
    w, h, maxval = tokens
    if not 0 < maxval < 65536:
        raise ValueError(f"bad PPM maxval {maxval}")
    if maxval > 255:  # 2-byte big-endian samples, scaled into 0..255
        need = w * h * 6
        raster = b[i : i + need]
        if len(raster) < need:
            raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
        px = np.frombuffer(raster, dtype=">u2").reshape(h, w, 3)
        return px * (255.0 / maxval)
    need = w * h * 3
    raster = b[i : i + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype("float64")


def _bmp_rle8(b: bytes, data_off: int, w: int, h: int):
    """BI_RLE8 (bottom-up by spec): (n, v) runs; escapes 0,0 end-of-line /
    0,1 end-of-bitmap / 0,2,dx,dy delta / 0,n>=3 literal run padded to a
    word boundary. Returns the (h, w) palette-index raster in image
    (top-down) row order; overruns and truncation refuse."""
    import numpy as np

    idx = np.zeros((h, w), dtype=np.uint8)
    i, x, y = data_off, 0, 0
    n_b = len(b)
    while True:
        if i + 2 > n_b:
            raise ValueError("truncated BMP RLE8 stream")
        n, v = b[i], b[i + 1]
        i += 2
        if n > 0:  # encoded run
            if y >= h or x + n > w:
                raise ValueError("corrupt BMP RLE8: run past row/raster end")
            idx[y, x : x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if i + 2 > n_b:
                raise ValueError("truncated BMP RLE8 delta")
            x += b[i]
            y += b[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("corrupt BMP RLE8: delta past raster end")
        else:  # literal run of v bytes, word-aligned
            if i + v > n_b:
                raise ValueError("truncated BMP RLE8 literal run")
            if y >= h or x + v > w:
                raise ValueError("corrupt BMP RLE8: literal past row/raster end")
            idx[y, x : x + v] = np.frombuffer(b, np.uint8, count=v, offset=i)
            x += v
            i += v + (v & 1)
    return idx[::-1]  # RLE8 rasters are always bottom-up


def _decode_bmp(b: bytes):
    """BMP via BITMAPINFOHEADER: uncompressed (BI_RGB) 24/32-bit BGR(A),
    8-bit palette, and RLE8-compressed 8-bit palette; rows padded to 4
    bytes, bottom-up unless height is negative. Uncompressed paths are
    one vectorized frombuffer/reshape — no per-row Python loop; RLE8
    decodes runs then resolves the palette in one take()."""
    import struct

    import numpy as np

    if len(b) < 54:
        raise ValueError(f"truncated BMP header ({len(b)} bytes)")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    clr_used = struct.unpack_from("<I", b, 46)[0] if hdr_size >= 40 else 0
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"corrupt BMP: non-positive dimensions {w}x{h}")

    if bpp == 8 and compression in (0, 1):
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(b):
            raise ValueError("truncated BMP color table")
        pal = np.frombuffer(
            b, np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRx -> RGB
        if compression == 1:  # BI_RLE8
            if top_down:
                raise ValueError("corrupt BMP: RLE8 cannot be top-down")
            idx = _bmp_rle8(b, data_off, w, h)
        else:
            stride = (w + 3) & ~3
            if data_off + h * stride > len(b):
                raise ValueError("truncated BMP raster")
            idx = np.frombuffer(
                b, np.uint8, count=h * stride, offset=data_off
            ).reshape(h, stride)[:, :w]
            if not top_down:
                idx = idx[::-1]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("corrupt BMP: palette index out of range")
        return pal[idx].astype("float64")

    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit, 8-bit palette, and RLE8 BMP "
            f"(bpp={bpp}, comp={compression})"
        )
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    if data_off + h * stride > len(b):
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=data_off)
    img = raster.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)[:, :, 2::-1]
    if not top_down:
        img = img[::-1]
    return img.astype("float64")


def _png_unfilter(raw: bytes, stride: int, h: int, bpp: int):
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)
    into an (h, stride) uint8 raster; `stride` is the scanline byte width
    and `bpp` the filter's left-neighbour distance in bytes (rounds up to
    1 for sub-8-bit depths). Up is whole-row vectorized; Sub is a
    per-byte-lane cumsum (recon[i] = raw[i] + recon[i-bpp] telescopes to a
    running sum within each lane i mod bpp); Average/Paeth carry a true
    left-recurrence, so those rows pay a per-pixel loop — inflate still
    dominates decode time."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for y in range(h):
        ftype, row = int(arr[y, 0]), arr[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            rec = row
        elif ftype == 1:  # Sub
            rec = row.reshape(stride // bpp, bpp).cumsum(axis=0).reshape(stride)
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential left-dependency
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0  # left
                bb = prev[i]  # up
                if ftype == 3:
                    rec[i] = row[i] + ((a + bb) >> 1)
                else:
                    c = prev[i - bpp] if i >= bpp else 0  # upper-left
                    pa, pb, pc = abs(bb - c), abs(a - c), abs(a + bb - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                    rec[i] = row[i] + pred
                rec[i] &= 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on scanline {y}")
        out[y] = rec & 0xFF
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel

# Adam7 interlacing (PNG spec §8.2): per-pass (x0, y0, dx, dy). Each pass
# is an independently-filtered sub-image; decoded pixels scatter back on
# the (y0::dy, x0::dx) grid.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_subimage(raw: bytes, off: int, w: int, h: int, ch: int, depth: int):
    """Decode one (sub-)image's filtered scanlines starting at `off`:
    returns ((h, w, ch) uint8/uint16 array or None for an empty pass,
    bytes consumed). Shared by the sequential and Adam7 paths so
    unfiltering/unpacking cannot drift between them."""
    import numpy as np

    if w == 0 or h == 0:
        return None, 0
    row_bytes = (w * ch * depth + 7) // 8
    need = h * (row_bytes + 1)
    chunk = raw[off : off + need]
    if len(chunk) < need:
        raise ValueError(f"truncated PNG raster: {len(chunk)} < {need} bytes")
    fbpp = max(1, ch * depth // 8)
    rows = _png_unfilter(chunk, row_bytes, h, fbpp)
    if depth < 8:
        bits = np.unpackbits(rows, axis=1)[:, : w * depth]  # MSB-first
        pow2 = 1 << np.arange(depth - 1, -1, -1)
        px = (bits.reshape(h, w, depth) * pow2).sum(axis=2).astype(np.uint8)
        px = px.reshape(h, w, 1)
    elif depth == 8:
        px = rows.reshape(h, w, ch)
    else:  # 16-bit: big-endian sample pairs
        pairs = rows.reshape(h, w, ch, 2).astype(np.uint16)
        px = (pairs[..., 0] << 8) | pairs[..., 1]
    return px, need


def _decode_png(b: bytes):
    """PNG (gray/RGB/palette/gray+alpha/RGBA; 8- and 16-bit samples plus
    1/2/4-bit gray and palette; sequential or Adam7-interlaced) via
    stdlib zlib + numpy unfiltering; alpha is dropped, gray replicates
    to RGB, palette indexes resolve through PLTE, 16-bit samples scale
    into the 0..255 float range. Truncated or malformed streams are
    refused, never padded — the shared decoder discipline."""
    import struct
    import zlib

    import numpy as np

    i, n = 8, len(b)
    ihdr = None
    idat = []
    plte = None
    seen_iend = False
    while i + 8 <= n:
        clen, ctype = struct.unpack_from(">I4s", b, i)
        if i + 12 + clen > n:
            raise ValueError(f"truncated PNG {ctype.decode('latin1')!r} chunk")
        body = b[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if clen % 3 or not clen:
                raise ValueError(f"bad PLTE length {clen}")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        i += 12 + clen  # length + type + body + CRC
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not seen_iend or not idat:
        raise ValueError("truncated PNG: missing IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ok_depth = depth == 8 or (depth in (1, 2, 4) and color in (0, 3)) or (
        depth == 16 and color in (0, 2, 4, 6)
    )
    if not ok_depth:
        raise ValueError(
            f"unsupported PNG bit depth {depth} for color type {color}"
        )
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method ({comp}/{filt})")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if not w or not h:
        raise ValueError("zero-dimension PNG")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if interlace == 0:
        px, used = _png_subimage(raw, 0, w, h, ch, depth)
    else:  # Adam7: seven independently-filtered passes, scattered back
        px = np.zeros((h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8)
        used = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx if w > x0 else 0
            hp = (h - y0 + dy - 1) // dy if h > y0 else 0
            sub, n_used = _png_subimage(raw, used, wp, hp, ch, depth)
            used += n_used
            if sub is not None:
                px[y0::dy, x0::dx] = sub
    if used != len(raw):
        raise ValueError(
            f"PNG raster size mismatch: {len(raw)} bytes, expected {used}"
        )
    if color == 3:  # palette lookup
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError(
                f"palette index {int(idx.max())} out of range ({len(plte)} entries)"
            )
        rgb = plte[idx].astype("float64")
    elif color == 0:  # gray: scale every depth to the 0..255 range
        g = px.astype("float64") * (255.0 / ((1 << depth) - 1)) if depth != 8 else px.astype("float64")
        rgb = np.repeat(g.reshape(h, w, 1), 3, axis=2)
    elif color == 4:  # gray + alpha
        g = px[:, :, :1].astype("float64")
        rgb = np.repeat(g / 257.0 if depth == 16 else g, 3, axis=2)
    else:  # RGB / RGBA: drop alpha
        rgb = px[:, :, :3].astype("float64")
        if depth == 16:
            rgb = rgb / 257.0
    return rgb


# --------------------------------------------------------------------------
# REAL audio decoding for the library-free format: RIFF/WAVE PCM needs
# only struct + numpy. 16-bit PCM (format 1) and 32-bit IEEE float
# (format 3) are covered; MP3 decodes from scratch in operators/mp3.py;
# remaining compressed codecs (AAC/Opus) still need a library through
# the same hook.
# --------------------------------------------------------------------------
AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _wav_pcm(content: bytes):
    """RIFF/WAVE front half shared by decode_wav and the resampler:
    validates the container and returns (x, sample_rate, n_channels)
    with x an (n_frames, n_channels) float64 array in [-1, 1] —
    channels NOT yet averaged, so channel-preserving transforms can
    consume it."""
    import struct

    import numpy as np

    b = bytes(content or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(
            "not a RIFF/WAVE payload (decode_audio dispatches "
            "WAV/FLAC/AIFF/AU/MP3; AAC needs a codec library)"
        )
    i, n = 12, len(b)
    fmt = None
    data = None
    while i + 8 <= n:
        cid, csize = b[i : i + 4], struct.unpack_from("<I", b, i + 4)[0]
        if i + 8 + csize > n:
            # refuse truncation instead of silently decoding fewer
            # samples than the header declares (PPM/Y4M discipline)
            raise ValueError(
                f"truncated WAVE {cid!r} chunk: {n - i - 8} of {csize} bytes"
            )
        body = b[i + 8 : i + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            # WAVE_FORMAT_EXTENSIBLE: the effective tag is the first two
            # bytes of the SubFormat GUID at offset 24 (after cbSize)
            if fmt[0] == 0xFFFE:
                if csize < 26:
                    raise ValueError("truncated WAVE extensible fmt chunk")
                fmt = (struct.unpack_from("<H", body, 24)[0],) + fmt[1:]
        elif cid == b"data":
            data = body
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if (audio_format, bits) not in (
        (1, 8), (1, 16), (1, 24), (1, 32), (3, 32), (6, 8), (7, 8)
    ):
        raise ValueError(
            f"unsupported WAVE coding (format={audio_format}, bits={bits}; "
            f"PCM 8/16/24/32, float32, A-law, mu-law decode library-free)"
        )
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(f"bad WAVE fmt: channels={n_channels}, rate={sample_rate}")
    frame_bytes = (bits // 8) * n_channels
    if len(data) % frame_bytes:
        # same refusal discipline as the other decoders: a data chunk that
        # is not a whole number of frames would otherwise surface numpy's
        # raw buffer error (16-bit) or silently drop samples (multichannel)
        raise ValueError(
            f"truncated WAVE data chunk: {len(data)} bytes is not a "
            f"multiple of the {frame_bytes}-byte frame size"
        )
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
    elif audio_format == 1 and bits == 8:
        # 8-bit WAVE PCM is UNSIGNED with a 128 midpoint
        x = (np.frombuffer(data, dtype=np.uint8).astype("float64") - 128.0) / 128.0
    elif audio_format == 1 and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32)
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        v -= (v & 0x800000) << 1  # sign-extend
        x = v.astype("float64") / 8388608.0
    elif audio_format == 1:  # 32-bit integer PCM
        x = np.frombuffer(data, dtype="<i4").astype("float64") / 2147483648.0
    elif audio_format == 6:  # G.711 A-law
        x = _alaw_expand(np.frombuffer(data, dtype=np.uint8)).astype("float64") / 32768.0
    elif audio_format == 7:  # G.711 mu-law
        x = _mulaw_expand(np.frombuffer(data, dtype=np.uint8)).astype("float64") / 32768.0
    else:
        x = np.frombuffer(data, dtype="<f4").astype("float64")
    if len(x) == 0:
        raise ValueError("empty WAVE data chunk")
    return x.reshape(-1, n_channels), int(sample_rate), int(n_channels)


def decode_wav(content: bytes) -> dict:
    """RIFF/WAVE PCM -> sample_rate, n_channels, n_samples, duration, and
    an 8-dim feature: [rms, peak, zero-crossing rate, mean, rms of four
    equal time segments] over the channel-averaged signal in [-1, 1]."""
    import numpy as np

    frames, sample_rate, n_channels = _wav_pcm(content)
    x = frames.mean(axis=1) if n_channels > 1 else frames.reshape(-1)
    n_samples = len(x)
    rms = float(np.sqrt((x**2).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n_samples > 1 else 0.0
    # array_split never drops samples; sub-4-sample clips get 0.0 for the
    # empty segments instead of NaN poisoning the float32 feature column
    seg_rms = [
        float(np.sqrt((s**2).mean())) if len(s) else 0.0
        for s in np.array_split(x, 4)
    ]
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(n_samples),
        "duration_s": n_samples / sample_rate,
        "feature": [rms, float(np.abs(x).max()), zcr, float(x.mean())] + seg_rms,
    }


def _encode_wav_pcm16(frames, sample_rate: int) -> bytes:
    """16-bit PCM RIFF/WAVE of an (n, ch) float array in [-1, 1] —
    quantized as round(x * 32768) clipped to int16, the inverse of the
    decoder's v / 32768 mapping, so values on the 1/32768 grid (every
    decoded 16-bit sample) round-trip bit-exactly."""
    import struct

    import numpy as np

    a = np.asarray(frames, dtype="float64")
    n, ch = a.shape
    pcm = np.clip(np.rint(a * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
    )
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _resample_linear(frames, src_rate: int, dst_rate: int):
    """Channel-preserving linear-interpolation resample of an (n, ch)
    float signal (sample-index convention: output sample j sits at
    source position j * src/dst, edges clamped). The standard cheap
    rate-normalization a training pipeline applies before feature
    extraction; band-limited (sinc) resampling slots behind the same
    signature when a DSP library is available."""
    import numpy as np

    n = frames.shape[0]
    n_out = max(1, int(round(n * dst_rate / src_rate)))
    pos = np.arange(n_out, dtype="float64") * (src_rate / dst_rate)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = np.clip(pos - i0, 0.0, 1.0)[:, None]
    return frames[i0] * (1 - frac) + frames[i1] * frac


def _audio_pcm_frames(b: bytes):
    """Container dispatch by magic -> ((n, ch) float64 frames in [-1, 1],
    sample_rate) for every format the module decodes losslessly to PCM
    (WAV incl. G.711/float32, FLAC, AIFF, AU). Codec-bound payloads
    (MP3, non-PCM AVI tracks, unknown magics) raise — callers decide
    whether that is a per-row refusal or a hard error."""
    if b[:4] == b"fLaC":
        from railgun_spark.operators.flac import decode_flac_pcm

        return decode_flac_pcm(b)
    if b[:4] == b"FORM" and b[8:12] == b"AIFF":
        return _aiff_pcm(b)
    if b[:4] == b".snd":
        return _au_pcm(b)
    frames, rate, _ch = _wav_pcm(b)  # refuses non-RIFF with the dispatch list
    return frames, rate


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """REAL audio resample over MEDIA_SCHEMA rows: any PCM-decodable
    container (WAV/FLAC/AIFF/AU) decodes to its full (n, ch) signal,
    linear-interpolates to `target_rate`, and re-encodes as 16-bit PCM
    WAV in one Arrow pass — rows keep MEDIA_SCHEMA with meta recording
    the source rate, so resample stages compose with
    extract_audio_features downstream. Non-audio rows pass through;
    codec-bound payloads (MP3, corrupt streams) record a per-row
    refusal (meta['resample_refused'], content passed through) per the
    decode-coverage discipline, so one bad clip in a mixed corpus
    cannot kill the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents, metas = [], []
            for kind, content, meta in zip(
                pdf["kind"], pdf["content"], pdf["meta"]
            ):
                if kind != "audio":
                    contents.append(content)
                    metas.append(meta)
                    continue
                b = bytes(content or b"")
                try:
                    frames, rate = _audio_pcm_frames(b)
                except ValueError as exc:
                    m = dict(meta or {})
                    m["resample_refused"] = str(exc)
                    contents.append(content)
                    metas.append(m)
                    continue
                out = _resample_linear(frames, rate, target_rate)
                contents.append(_encode_wav_pcm16(out, target_rate))
                m = dict(meta or {})
                m.update({"src_rate": str(rate),
                          "resample_rate": str(target_rate)})
                metas.append(m)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "content": contents, "meta": metas,
            })

    return df.mapInPandas(batches, df.schema)


def extract_audio_features(
    df: DataFrame, decoder: Callable[[bytes], dict] | None = None
) -> DataFrame:
    """Audio rows (MEDIA_SCHEMA, kind='audio') -> AUDIO_FEATURE_SCHEMA via
    mapInPandas; the default decoder dispatches WAV/PCM or FLAC by magic."""
    fn = decoder or decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                # an all-filtered batch would emit float64-typed empty
                # columns that Arrow cannot cast to list<float>
                continue
            decoded = [fn(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "n_channels": [d["n_channels"] for d in decoded],
                    "n_samples": [d["n_samples"] for d in decoded],
                    "duration_s": [d["duration_s"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return df.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# REAL video decoding for the library-free format: YUV4MPEG2 (.y4m) is
# raw YUV planes behind ASCII headers — struct-free parsing + numpy.
# Completes the modality matrix: every modality has one honestly-decoded
# library-free formats per modality (image: PPM/BMP/PNG/GIF/JPEG,
# audio: WAV/FLAC/AIFF/AU, video: Y4M/MJPEG-AVI); anything else still
# needs a codec library through the decoder hooks.
# --------------------------------------------------------------------------
VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# colorspaces by EXACT token (a prefix slice would misclassify variants
# like 444alpha, whose frames carry an extra plane): chroma bytes per
# luma byte as a rational
_Y4M_CHROMA = {
    b"420": (1, 2),
    b"420jpeg": (1, 2),
    b"420mpeg2": (1, 2),
    b"420paldv": (1, 2),
    b"422": (1, 1),
    b"444": (2, 1),
}


def _parse_y4m_header(b: bytes) -> tuple[int, int, float, int, int, int]:
    """Validate and parse the YUV4MPEG2 stream header. Returns
    (width, height, fps, luma_size, chroma_size, first_frame_offset).
    Shared by decode_y4m and sample_frames_y4m so validation cannot
    drift between them."""
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError(
        "not a YUV4MPEG2 payload (decode_video dispatches Y4M and MJPEG-AVI; "
        "other codecs need a codec library)"
    )
    nl = b.index(b"\n")
    w = h = None
    fps = 0.0
    csp = b"420"
    for tok in b[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) / int(den)
        elif tok[:1] == b"C":
            csp = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if csp not in _Y4M_CHROMA:
        raise ValueError(f"unsupported Y4M colorspace C{csp.decode()}")
    # subsampled chroma planes are ceil(w/2) x ceil(h/2) (420) or
    # ceil(w/2) x h (422); the w*h*ratio arithmetic below is only exact
    # for even dimensions — odd dims would mis-size every frame and
    # decode from misaligned offsets before failing confusingly
    if csp.startswith(b"420") and (w % 2 or h % 2):
        raise ValueError(f"odd dimensions unsupported for C{csp.decode()}: {w}x{h}")
    if csp == b"422" and w % 2:
        raise ValueError(f"odd width unsupported for C422: {w}x{h}")
    num, den = _Y4M_CHROMA[csp]
    luma_size = w * h
    return w, h, fps, luma_size, luma_size * num // den, nl + 1


def _y4m_frames(b: bytes, luma_size: int, chroma_size: int, start: int):
    """Yield (frame_idx, luma_offset) for every frame, validating the
    FRAME marker and refusing truncation even mid-chroma."""
    i, k = start, 0
    while i < len(b):
        if not b.startswith(b"FRAME", i):
            raise ValueError(f"bad FRAME marker at byte {i}")
        i = b.index(b"\n", i) + 1  # frame headers may carry params
        if i + luma_size + chroma_size > len(b):
            raise ValueError("truncated Y4M frame")
        yield k, i
        i += luma_size + chroma_size
        k += 1


def decode_y4m(content: bytes) -> dict:
    """YUV4MPEG2 (4:2:0/4:2:2/4:4:4) -> dims, frame count, fps, and an
    8-dim feature: mean luma of the first four frames, overall luma
    mean/std, and mean inter-frame absolute luma delta (a motion proxy),
    zero-pad."""
    import numpy as np

    b = bytes(content or b"")
    w, h, fps, luma_size, chroma_size, start = _parse_y4m_header(b)
    lumas = [
        np.frombuffer(b, dtype=np.uint8, count=luma_size, offset=off).astype("float64")
        for _, off in _y4m_frames(b, luma_size, chroma_size, start)
    ]
    if not lumas:
        raise ValueError("Y4M with zero frames")
    means = [float(x.mean()) for x in lumas]
    deltas = [
        float(np.abs(lumas[k + 1] - lumas[k]).mean()) for k in range(len(lumas) - 1)
    ]
    feature = (means[:4] + [0.0] * (4 - len(means[:4]))) + [
        float(np.mean(means)),
        float(np.std(means)),
        float(np.mean(deltas)) if deltas else 0.0,
        0.0,
    ]
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": len(lumas),
        "fps": fps,
        "feature": feature,
    }


def _avi_jpeg_frames(b: bytes):
    """RIFF walk shared by the full decode and the frame sampler:
    returns (avih tuple, list of per-frame chunk bytes) WITHOUT decoding
    any JPEG — samplers decode only the frames they keep. Truncation and
    structural violations refuse."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    avih = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int):
        nonlocal avih
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            csize = struct.unpack_from("<I", b, i + 4)[0]
            if i + 8 + csize > hi:
                raise ValueError(f"truncated AVI {cid!r} chunk")
            if cid == b"LIST":
                walk(i + 12, i + 8 + csize)  # skip the 4-byte list type
            elif cid == b"avih":
                avih = struct.unpack_from("<IIIIIIIIII", b, i + 8)
            elif cid[2:4] in (b"dc", b"db") and csize:
                frames.append(b[i + 8 : i + 8 + csize])
            i += 8 + csize + (csize & 1)

    riff_size = struct.unpack_from("<I", b, 4)[0]
    if 8 + riff_size > len(b):
        raise ValueError("truncated AVI RIFF payload")
    walk(12, 8 + riff_size)
    if avih is None:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI with zero video frames")
    return avih, frames


def decode_avi_mjpeg(content: bytes) -> dict:
    """Motion-JPEG AVI -> the decode_y4m result shape: RIFF 'AVI ' with
    an avih header (frame period/dims) and a movi LIST whose '..dc'/
    '..db' chunks each hold one JPEG frame, decoded through the
    library's own T.81 decoder (operators/jpeg.py) — a COMPRESSED
    library-free video path next to raw Y4M. The same 8-dim luma
    feature (first-four frame means, mean/std, motion proxy) so video
    features are comparable across containers. Truncation and
    non-MJPEG streams are refused."""
    import struct

    import numpy as np

    from railgun_spark.operators.jpeg import decode_jpeg

    b = bytes(content or b"")
    avih, frames = _avi_jpeg_frames(b)
    us_per_frame, _, _, _, n_frames_hdr, _, _, _, width, height = avih
    fps = 1e6 / us_per_frame if us_per_frame else 0.0

    lumas = []
    for k, fr in enumerate(frames):
        if fr[:2] != b"\xff\xd8":
            raise ValueError(
                f"only MJPEG AVIs decode library-free (frame {k} is "
                "not JPEG; other codecs need a decoder)"
            )
        rgb = decode_jpeg(fr)
        lumas.append(
            (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
            .reshape(-1)
        )
        if (width and rgb.shape[1] != width) or (height and rgb.shape[0] != height):
            raise ValueError(
                f"AVI frame {k} is {rgb.shape[1]}x{rgb.shape[0]}, header "
                f"says {width}x{height}"
            )
    means = [float(x.mean()) for x in lumas]
    deltas = [
        float(np.abs(lumas[k + 1] - lumas[k]).mean()) for k in range(len(lumas) - 1)
    ]
    feature = (means[:4] + [0.0] * (4 - len(means[:4]))) + [
        float(np.mean(means)),
        float(np.std(means)),
        float(np.mean(deltas)) if deltas else 0.0,
        0.0,
    ]
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": len(lumas),
        "fps": fps,
        "feature": feature,
    }


def extract_avi_audio(content: bytes) -> dict:
    """Audio track of an AVI container: the stream headers (strl LISTs,
    in order) identify the 'auds' stream and its WAVEFORMATEX; that
    stream's '{NN}wb' movi chunks concatenate into the audio payload —
    PCM (tag 0x0001, 16-bit) decodes directly, MP3 (tag 0x0055) routes
    through the from-scratch Layer III decoder. Everything else refuses
    by format tag. Returns the shared audio result shape, so an AVI row
    tagged kind='audio' yields the same features as a bare WAV/MP3 of
    the same track."""
    import struct

    import numpy as np

    b = bytes(content or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    stream_types: list[bytes] = []  # fccType per strl, in stream order
    stream_fmt: dict[int, tuple] = {}  # stream idx -> WAVEFORMATEX head
    chunks: dict[int, list[bytes]] = {}

    def walk(lo: int, hi: int, in_strl: bool = False):
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            csize = struct.unpack_from("<I", b, i + 4)[0]
            if i + 8 + csize > hi:
                raise ValueError(f"truncated AVI {cid!r} chunk")
            if cid == b"LIST":
                ltype = b[i + 8 : i + 12]
                walk(i + 12, i + 8 + csize, in_strl=ltype == b"strl")
            elif cid == b"strh" and in_strl:
                stream_types.append(b[i + 8 : i + 12])
            elif cid == b"strf" and in_strl and stream_types \
                    and stream_types[-1] == b"auds":
                if csize < 16:
                    raise ValueError("truncated AVI WAVEFORMATEX")
                stream_fmt[len(stream_types) - 1] = struct.unpack_from(
                    "<HHIIHH", b, i + 8
                )
            elif cid[2:4] == b"wb" and cid[:2].isdigit() and csize:
                chunks.setdefault(int(cid[:2]), []).append(
                    b[i + 8 : i + 8 + csize]
                )
            i += 8 + csize + (csize & 1)

    riff_size = struct.unpack_from("<I", b, 4)[0]
    if 8 + riff_size > len(b):
        raise ValueError("truncated AVI RIFF payload")
    walk(12, 8 + riff_size)

    auds = [k for k, t in enumerate(stream_types) if t == b"auds"]
    if not auds:
        raise ValueError("AVI has no audio stream")
    idx = auds[0]
    if idx not in stream_fmt:
        raise ValueError("AVI audio stream missing its strf WAVEFORMATEX")
    if not chunks.get(idx):
        raise ValueError("AVI audio stream has no data chunks")
    tag, n_channels, rate, _avg, _align, bits = stream_fmt[idx]
    payload = b"".join(chunks[idx])
    if tag == 0x0055:  # MPEG Layer III
        from railgun_spark.operators.mp3 import decode_mp3

        return decode_mp3(payload)
    if tag == 0x0001:  # integer PCM
        if bits != 16:
            raise ValueError(
                f"only 16-bit PCM AVI audio supported (bits={bits})"
            )
        if n_channels < 1 or rate < 1:
            raise ValueError(
                f"bad AVI audio format: channels={n_channels}, rate={rate}"
            )
        if len(payload) % (2 * n_channels):
            raise ValueError("AVI PCM audio not a whole number of frames")
        x = np.frombuffer(payload, dtype="<i2").astype("float64") / 32768.0
        if n_channels > 1:
            x = x.reshape(-1, n_channels).mean(axis=1)
        return _audio_result(x, rate, n_channels)
    raise ValueError(
        f"unsupported AVI audio format tag {tag:#06x} "
        "(0x0001 PCM and 0x0055 MP3 decode library-free)"
    )


def decode_video(content: bytes) -> dict:
    """Video container dispatch by magic: YUV4MPEG2 raw planes,
    Motion-JPEG AVI, or GIF89a animation — same result shape."""
    b = bytes(content or b"")
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return decode_avi_mjpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_animation(b)
    return decode_y4m(b)


def extract_video_features(
    df: DataFrame, decoder: Callable[[bytes], dict] | None = None
) -> DataFrame:
    """Video rows (MEDIA_SCHEMA, kind='video') -> VIDEO_FEATURE_SCHEMA via
    mapInPandas; default decoder is the real Y4M decode_y4m."""
    fn = decoder or decode_video

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue  # empty float64 columns cannot cast to list<float>
            decoded = [fn(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "fps": [d["fps"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return df.mapInPandas(batches, VIDEO_FEATURE_SCHEMA)


def sample_frames_y4m(df: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL frame sampling for Y4M video rows: decodes every `every_n`-th
    frame's luma plane inside mapInPandas and emits
    (media_id, frame_idx, luma_mean) — the working counterpart of the
    metadata-driven frame_sample stub. Only sampled planes are touched
    per batch (GIF animations composite every frame — disposal needs the
    running canvas — but only sampled frames pay the stats; MJPEG-AVI
    walks the RIFF index and JPEG-decodes ONLY the sampled frames);
    codecs beyond Y4M/MJPEG-AVI/GIF need a codec library."""
    import numpy as np

    schema = "media_id: long, frame_idx: int, luma_mean: double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from railgun_spark.operators.jpeg import decode_jpeg

        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            mids, idxs, means = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content or b"")
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    frames, _delays = decode_gif_frames(b)
                    for k in range(0, len(frames), every_n):
                        mids.append(mid)
                        idxs.append(k)
                        means.append(float(frames[k].mean()))
                    continue
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    _avih, chunks = _avi_jpeg_frames(b)
                    for k in range(0, len(chunks), every_n):
                        if chunks[k][:2] != b"\xff\xd8":
                            raise ValueError(
                                f"only MJPEG AVIs decode library-free "
                                f"(frame {k} is not JPEG; other codecs "
                                "need a decoder)"
                            )
                        rgb = decode_jpeg(chunks[k])
                        luma = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                                + 0.114 * rgb[:, :, 2])
                        mids.append(mid)
                        idxs.append(k)
                        means.append(float(luma.mean()))
                    continue
                _, _, _, luma, chroma, start = _parse_y4m_header(b)
                for k, off in _y4m_frames(b, luma, chroma, start):
                    if k % every_n == 0:
                        plane = np.frombuffer(b, dtype=np.uint8, count=luma, offset=off)
                        mids.append(mid)
                        idxs.append(k)
                        means.append(float(plane.mean()))
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "luma_mean": means}
            )

    return df.mapInPandas(batches, schema)


def _audio_result(x, sample_rate: int, n_channels: int) -> dict:
    """Shared audio feature tail over the channel-averaged signal in
    [-1, 1] — one implementation so WAV/FLAC/AIFF/AU features cannot
    drift."""
    import numpy as np

    n_samples = len(x)
    if n_samples == 0:
        raise ValueError("empty audio stream")
    rms = float(np.sqrt((x**2).mean()))
    zcr = (
        float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
        if n_samples > 1
        else 0.0
    )
    seg_rms = [
        float(np.sqrt((s**2).mean())) if len(s) else 0.0
        for s in np.array_split(x, 4)
    ]
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(n_samples),
        "duration_s": n_samples / sample_rate,
        "feature": [rms, float(np.abs(x).max()), zcr, float(x.mean())] + seg_rms,
    }


def _read_f80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (AIFF's sample-rate field)."""
    import struct

    exp, hi, lo = struct.unpack(">HII", b[:10])
    sign = -1.0 if exp & 0x8000 else 1.0
    exp &= 0x7FFF
    mant = (hi << 32) | lo
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _aiff_pcm(content: bytes):
    """AIFF front half shared by decode_aiff and resample_audio:
    validates the container and returns ((n, ch) float64 frames in
    [-1, 1], sample_rate) — channels NOT yet averaged."""
    import struct

    import numpy as np

    b = bytes(content or b"")
    if b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    i, n = 12, len(b)
    comm = data = None
    while i + 8 <= n:
        cid, csize = b[i : i + 4], struct.unpack_from(">I", b, i + 4)[0]
        if i + 8 + csize > n:
            raise ValueError(f"truncated AIFF {cid!r} chunk")
        body = b[i + 8 : i + 8 + csize]
        if cid == b"COMM":
            if csize < 18:
                raise ValueError("truncated AIFF COMM chunk")
            comm = struct.unpack_from(">hIh", body, 0) + (_read_f80(body[8:18]),)
        elif cid == b"SSND":
            offset = struct.unpack_from(">I", body, 0)[0]
            data = body[8 + offset :]
        i += 8 + csize + (csize & 1)
    if comm is None or data is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    n_channels, n_frames, bits, rate = comm
    if n_channels < 1 or rate <= 0:
        raise ValueError(f"bad AIFF COMM: channels={n_channels}, rate={rate}")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"only 8/16/24/32-bit AIFF supported (bits={bits})")
    frame_bytes = (bits // 8) * n_channels
    need = n_frames * frame_bytes
    if len(data) < need:
        raise ValueError(f"truncated AIFF SSND: {len(data)} < {need} bytes")
    if bits == 16:
        x = np.frombuffer(data[:need], dtype=">i2").astype("float64") / 32768.0
    elif bits == 8:
        x = np.frombuffer(data[:need], dtype="i1").astype("float64") / 128.0
    elif bits == 32:
        x = np.frombuffer(data[:need], dtype=">i4").astype("float64") / 2147483648.0
    else:  # 24-bit big-endian
        raw = np.frombuffer(data[:need], dtype=np.uint8).reshape(-1, 3)
        v = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8)
             | raw[:, 2].astype(np.int32))
        v -= (v & 0x800000) << 1
        x = v.astype("float64") / 8388608.0
    return x.reshape(-1, n_channels), int(round(rate))


def decode_aiff(content: bytes) -> dict:
    """AIFF (FORM/AIFF): COMM (channels, frames, bits, 80-bit-float
    rate) + SSND big-endian PCM; 8/16/24/32-bit integer samples."""
    frames, rate = _aiff_pcm(content)
    n_channels = frames.shape[1]
    return _audio_result(frames.mean(axis=1), rate, n_channels)


def _alaw_expand(a):
    """G.711 A-law byte -> linear PCM in [-32256, 32256] (sign bit SET
    means positive, per the toggled-even-bits convention)."""
    import numpy as np

    a = a.astype(np.uint8) ^ 0x55
    seg = ((a & 0x70) >> 4).astype(np.int32)
    base = (a & 0x0F).astype(np.int32) << 4
    t = np.where(seg == 0, base + 8,
                 (base + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t)


def _mulaw_expand(u):
    """G.711 mu-law byte -> linear PCM in [-32124, 32124]."""
    import numpy as np

    u = ~u.astype(np.uint8)
    sign = u & 0x80
    e = (u >> 4) & 0x07
    m = u & 0x0F
    x = (((m.astype(np.int32) << 3) + 0x84) << e) - 0x84
    return np.where(sign, -x, x)


def _au_pcm(content: bytes):
    """AU front half shared by decode_au and resample_audio: validates
    the header/encoding and returns ((n, ch) float64 frames in [-1, 1],
    sample_rate) — channels NOT yet averaged."""
    import struct

    import numpy as np

    b = bytes(content or b"")
    if b[:4] != b".snd":
        raise ValueError("not an AU payload")
    if len(b) < 24:
        raise ValueError("truncated AU header")
    offset, size, enc, rate, n_channels = struct.unpack_from(">IIIII", b, 4)
    if offset < 24 or n_channels < 1 or rate < 1:
        raise ValueError(f"bad AU header: offset={offset}, rate={rate}, channels={n_channels}")
    data = b[offset:]
    if size != 0xFFFFFFFF:
        if len(data) < size:
            raise ValueError(f"truncated AU data: {len(data)} < {size} bytes")
        data = data[:size]
    if enc == 1:  # mu-law
        x = _mulaw_expand(np.frombuffer(data, dtype=np.uint8)).astype("float64") / 32768.0
    elif enc == 2:
        x = np.frombuffer(data, dtype="i1").astype("float64") / 128.0
    elif enc == 3:
        if len(data) % 2:
            raise ValueError("truncated AU 16-bit sample")
        x = np.frombuffer(data, dtype=">i2").astype("float64") / 32768.0
    elif enc == 4:  # 24-bit big-endian
        if len(data) % 3:
            raise ValueError("truncated AU 24-bit sample")
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8)
             | raw[:, 2].astype(np.int32))
        v -= (v & 0x800000) << 1
        x = v.astype("float64") / 8388608.0
    elif enc == 5:  # 32-bit big-endian
        if len(data) % 4:
            raise ValueError("truncated AU 32-bit sample")
        x = np.frombuffer(data, dtype=">i4").astype("float64") / 2147483648.0
    elif enc == 6:
        if len(data) % 4:
            raise ValueError("truncated AU float sample")
        x = np.frombuffer(data, dtype=">f4").astype("float64")
    elif enc == 27:  # G.711 A-law
        x = _alaw_expand(np.frombuffer(data, dtype=np.uint8)).astype("float64") / 32768.0
    else:
        raise ValueError(
            f"unsupported AU encoding {enc} (1/2/3/4/5/6/27 supported)"
        )
    if n_channels > 1 and len(x) % n_channels:
        raise ValueError("AU data not a whole number of frames")
    return x.reshape(-1, n_channels), int(rate)


def decode_au(content: bytes) -> dict:
    """Sun/NeXT AU (.snd): big-endian header, encodings 1 (G.711
    mu-law), 2/3/4/5 (int8/16/24/32 BE), 6 (float32 BE), 27 (A-law)."""
    frames, rate = _au_pcm(content)
    n_channels = frames.shape[1]
    return _audio_result(frames.mean(axis=1), rate, n_channels)


def decode_audio(content: bytes) -> dict:
    """Audio container dispatch by magic: RIFF/WAVE PCM, FLAC
    (operators/flac.py, from-scratch), AIFF, Sun AU, or MPEG-1 Layer III
    (operators/mp3.py, from-scratch — certified-table streams; see that
    module's scope notes) — all return the same result shape."""
    b = bytes(content or b"")
    if b[:4] == b"fLaC":
        from railgun_spark.operators.flac import decode_flac

        return decode_flac(b)
    if b[:4] == b"FORM" and b[8:12] == b"AIFF":
        return decode_aiff(b)
    if b[:4] == b".snd":
        return decode_au(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # a container routed as AUDIO extracts its audio track (PCM/MP3)
        return extract_avi_audio(b)
    if b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE6) == 0xE2
    ):
        # MP3 frame sync (11 bits) with layer bits 01 (Layer III), any
        # MPEG version — version gating happens inside decode_mp3 so
        # MPEG-2 payloads refuse with the precise reason
        from railgun_spark.operators.mp3 import decode_mp3

        return decode_mp3(b)
    return decode_wav(b)


def decode_media(content: bytes, kind: str) -> dict:
    """Kind-dispatching REAL decoder for the library-free formats of all
    three modalities (image: PPM/BMP/PNG/GIF/JPEG, audio:
    WAV/FLAC/AIFF/AU/MP3, video: Y4M/MJPEG-AVI), shaped for
    extract_features' image-centric FEATURE_SCHEMA:
    audio rows report width/height 0 and carry the 8-dim signal feature;
    video rows carry the luma feature with real dims. Mixed-kind media
    frames run end-to-end with require_real=True; codec-bound payloads
    raise."""
    if kind == "image":
        return decode_image(content, kind)
    if kind == "audio":
        d = decode_audio(content)
        return {"width": 0, "height": 0, "feature": d["feature"]}
    if kind == "video":
        d = decode_video(content)
        return {"width": d["width"], "height": d["height"], "feature": d["feature"]}
    raise ValueError(f"unknown media kind {kind!r}")
