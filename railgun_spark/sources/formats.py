"""Multi-format IO registry — the gss (go-simple-serializer) twin.

Reference surface (SURVEY §1.3):
- formats: bson csv tsv hcl hcl2 json jsonl properties toml yaml
  (reference README.md:16, flag railgun/cli/process.go:965)
- extension/compression inference incl. .geojson->json, .geojsonl->jsonl
  (railgun/util/SplitNameFormatCompression.go:75-102)
- compression: none bzip2 gzip snappy (+ zip on read)
  (railgun/cli/process.go:53)

Spark-first mapping: json/jsonl/csv/tsv/parquet go through native readers
(predicate pushdown, schema inference, codec handling all built in —
gzip/bzip2 transparent). yaml/toml/properties/bson are *document* formats:
single-document payloads are decoded driver-side to rows;
multi-document line formats go through mapPartitions-free spark.read.text +
a vectorized decode only when needed. hcl/hcl2 decode through the
from-scratch subset parser in sources/hcl.py.

parquet is the engine's native storage format (not in the reference's
list — its closest is the whole-file cache); at 100 TB everything lands in
parquet with partition columns.
"""

from __future__ import annotations

import configparser
import io
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

FORMATS = (
    "bson",
    "csv",
    "tsv",
    "hcl",
    "hcl2",
    "json",
    "jsonl",
    "properties",
    "toml",
    "yaml",
    "parquet",
)

_EXT_FORMAT = {
    "json": "json",
    "geojson": "json",
    "jsonl": "jsonl",
    "geojsonl": "jsonl",
    "ndjson": "jsonl",
    "csv": "csv",
    "tsv": "tsv",
    "yaml": "yaml",
    "yml": "yaml",
    "toml": "toml",
    "properties": "properties",
    "bson": "bson",
    "hcl": "hcl",
    "parquet": "parquet",
}

_EXT_COMPRESSION = {"gz": "gzip", "gzip": "gzip", "bz2": "bzip2", "sz": "snappy", "zip": "zip", "enc": "enc"}


@dataclass(frozen=True)
class UriSpec:
    name: str
    format: str | None
    compression: str | None


def split_name_format_compression(path: str) -> UriSpec:
    """Infer (basename, format, compression) from a path.
    Twin of railgun/util/SplitNameFormatCompression.go:14-106."""
    base = os.path.basename(path)
    compression = None
    stem = base
    for ext, comp in _EXT_COMPRESSION.items():
        if stem.lower().endswith("." + ext):
            compression = comp
            stem = stem[: -(len(ext) + 1)]
            break
    fmt = None
    root, dot, ext = stem.rpartition(".")
    if dot:
        fmt = _EXT_FORMAT.get(ext.lower())
        name = root if fmt else stem
    else:
        name = stem
    return UriSpec(name=name, format=fmt, compression=compression)


def _localize_uri(path: str) -> str:
    """Resolve non-Spark-native input schemes to a local temp file.

    - http/https: driver-side fetch (grw.ReadFromResource parity,
      railgun/cli/process.go:616-626). Config-sized payloads only — bulk
      data belongs on s3a://hdfs:// which Spark's Hadoop layer reads
      natively with distributed splits, and those pass through untouched.
    - `-` / `stdin://`: read stdin once to a temp file (the reference's
      default input, railgun/cli/process.go stdin device).
    """
    import sys
    import tempfile
    import urllib.request

    if path in ("-", "stdin", "stdin://"):
        data = sys.stdin.buffer.read()
        f = tempfile.NamedTemporaryFile(delete=False, prefix="railgun_stdin_")
        f.write(data)
        f.close()
        return f.name
    if path.startswith(("http://", "https://")):
        suffix = "_" + os.path.basename(path).split("?")[0]
        with urllib.request.urlopen(path) as resp:  # noqa: S310 — user-supplied source uri
            data = resp.read()
        f = tempfile.NamedTemporaryFile(delete=False, prefix="railgun_http_", suffix=suffix)
        f.write(data)
        f.close()
        return f.name
    return path


def _extract_zip(path: str) -> list[str]:
    """Unpack a .zip archive to a temp dir, return member paths
    (zip read path, railgun/util/SplitNameFormatCompression.go:52-67)."""
    import tempfile
    import zipfile

    out = tempfile.mkdtemp(prefix="railgun_zip_")
    with zipfile.ZipFile(path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        zf.extractall(out, members=names)
    return [os.path.join(out, n) for n in sorted(names)]


def read(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    header: list[str] | None = None,
    skip_lines: int = 0,
    limit: int | None = None,
    passphrase: str | None = None,
    salt: str | None = None,
    **options,
) -> DataFrame:
    """Read `path` into a DataFrame. Options mirror the reference's input
    flags (header/comment/lazy-quotes/skip/limit/passphrase/salt,
    railgun/config/Input.go:17-29)."""
    path = _localize_uri(path)
    spec = split_name_format_compression(path)
    fmt = fmt or spec.format
    if spec.compression == "enc":
        # ciphertext must never reach a plain reader (silent garbage rows)
        if not passphrase:
            raise ValueError(
                f"{path} is encrypted (.enc); pass passphrase= (and salt=) "
                "to decrypt — refusing to parse ciphertext"
            )
        from railgun_spark.sources import crypto

        df = crypto.read_encrypted(spark, path, passphrase, salt or "", fmt=fmt or "jsonl")
        if skip_lines:
            df = df.offset(skip_lines)
        return df.limit(limit) if limit is not None else df
    if spec.compression == "zip":
        members = _extract_zip(path)
        if not members:
            raise ValueError(f"zip archive {path} contains no file members")
        frames = [
            read(spark, m, fmt=fmt, header=header, passphrase=passphrase, salt=salt, **options)
            for m in members
        ]
        df = frames[0]
        for other in frames[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        if skip_lines:
            df = df.offset(skip_lines)
        return df.limit(limit) if limit is not None else df
    if fmt is None:
        raise ValueError(f"cannot infer format for {path}")
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        # Spark's json reader handles both single-doc-per-line (jsonl) and
        # multiLine documents; a top-level FeatureCollection opens to rows
        # via multiLine + explode at the caller.
        df = spark.read.json(path, multiLine=(fmt == "json"), **options)
    elif fmt in ("csv", "tsv"):
        opts = {
            "header": "false" if header else options.pop("header", "true"),
            "sep": "\t" if fmt == "tsv" else ",",
            "inferSchema": options.pop("inferSchema", "false"),
            **options,
        }
        df = spark.read.options(**opts).csv(path)
        if header:
            df = df.toDF(*header)
    elif fmt in ("yaml", "toml", "properties", "bson", "hcl", "hcl2"):
        df = _read_document_format(spark, path, fmt)
    else:
        raise ValueError(f"unknown format {fmt}")
    if skip_lines:
        # driver-enumerated skip; only meaningful for small headered files
        df = df.offset(skip_lines)
    if limit is not None:
        df = df.limit(limit)
    return df


def _decode_document(data: bytes, fmt: str) -> list[dict]:
    """bytes -> list of row dicts for the document formats."""
    if fmt == "yaml":
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("pyyaml not available in this container") from e
        doc = yaml.safe_load(data.decode())
    elif fmt == "toml":
        import tomllib

        doc = tomllib.loads(data.decode())
    elif fmt == "properties":
        cp = configparser.ConfigParser()
        cp.read_string("[d]\n" + data.decode())
        doc = dict(cp["d"])
    elif fmt == "bson":
        import base64

        from railgun_spark.sources import bson_codec

        def _json_safe(v):
            # the document formats feed a JSON bridge for schema inference;
            # map the two non-JSON BSON types to stable encodings
            if isinstance(v, bytes):
                return base64.b64encode(v).decode()
            if hasattr(v, "isoformat"):
                return v.isoformat()
            if isinstance(v, list):
                return [_json_safe(x) for x in v]
            if isinstance(v, dict):
                return {k: _json_safe(x) for k, x in v.items()}
            return v

        doc = [_json_safe(d) for d in bson_codec.loads_many(data)]
    elif fmt in ("hcl", "hcl2"):
        from railgun_spark.sources.hcl import loads as _hcl_loads

        doc = _hcl_loads(data.decode())
    else:  # pragma: no cover
        raise ValueError(fmt)
    if isinstance(doc, list):
        return [d if isinstance(d, dict) else {"value": d} for d in doc]
    if isinstance(doc, dict):
        return [doc]
    return [{"value": doc}]


def _read_document_format(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Document formats (one logical document per file): decode driver-side
    via the JSON bridge so Spark infers a proper schema. These formats are
    catalog/config payloads in the reference (catalog load
    railgun/catalog/RailgunCatalog.go:531-729), never the 100 TB data path."""
    import glob as _glob

    rows: list[dict] = []
    paths = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    for p in paths:
        with open(p, "rb") as f:
            rows.extend(_decode_document(f.read(), fmt))
    jsonl = [json.dumps(r) for r in rows]
    return spark.read.json(spark.sparkContext.parallelize(jsonl))


def _toml_scalar(v) -> str:
    """TOML value text for scalars/lists (strings via JSON quoting — TOML
    basic strings accept the same escape set)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_scalar(x) for x in v) + "]"
    return json.dumps(str(v))


def _encode_toml(doc: dict, section: str = "") -> str:
    """Minimal TOML emitter (tomllib is read-only): scalars/lists first,
    then nested dicts as [dotted.section] tables. None keys are dropped
    (TOML has no null)."""
    scalars = {k: v for k, v in doc.items() if not isinstance(v, dict) and v is not None}
    tables = {k: v for k, v in doc.items() if isinstance(v, dict)}
    out = []
    if section and scalars:
        out.append(f"[{section}]")
    out.extend(f"{k} = {_toml_scalar(v)}" for k, v in scalars.items())
    for k, sub in tables.items():
        path = f"{section}.{k}" if section else k
        out.append(_encode_toml(sub, path))
    return "\n".join(out) + ("\n" if not section else "")


def _encode_document(rows: list[dict], fmt: str) -> bytes:
    """rows -> document bytes; write-side twin of `_decode_document`
    (reference serializes every format out, railgun/cli/process.go:927-941).
    yaml holds multi-row payloads natively; toml/properties/hcl/bson are
    single-document formats — multi-row input is a hard error, not a guess."""
    if fmt == "yaml":
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("pyyaml not available in this container") from e
        doc = rows if len(rows) != 1 else rows[0]
        return yaml.safe_dump(doc, sort_keys=False).encode()
    if len(rows) != 1 and fmt != "bson":
        raise ValueError(
            f"{fmt} is a single-document format: got {len(rows)} rows "
            "(write one row, or use yaml/jsonl for multi-row payloads)"
        )
    if fmt == "toml":
        return _encode_toml(rows[0]).encode()
    if fmt == "properties":
        bad = [k for k, v in rows[0].items() if isinstance(v, (dict, list))]
        if bad:
            raise ValueError(f"properties values must be flat scalars; nested keys: {bad}")
        return "".join(f"{k}={'' if v is None else v}\n" for k, v in rows[0].items()).encode()
    if fmt in ("hcl", "hcl2"):
        from railgun_spark.sources.hcl import dumps as _hcl_dumps

        return _hcl_dumps(rows[0]).encode()
    if fmt == "bson":
        from railgun_spark.sources import bson_codec

        # multi-row payloads are concatenated documents (mongodump layout)
        return b"".join(bson_codec.dumps(r) for r in rows)
    raise ValueError(fmt)  # pragma: no cover


def _write_document_format(df: DataFrame, path: str, fmt: str) -> None:
    """Driver-side single-file write, mirroring the driver-side read: these
    formats carry catalog/config payloads in the reference, never bulk data."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    with open(path, "wb") as f:
        f.write(_encode_document(rows, fmt))


def write(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: list[str] | None = None,
    limit: int | None = None,
    passphrase: str | None = None,
    salt: str | None = None,
) -> None:
    """Write a DataFrame. Static sink twin (railgun/cli/process.go:59-112);
    output limit (cli/process.go:984); append flag -> mode; '.enc' output
    encrypts the whole payload (block cipher => single file, process.go:663)."""
    spec = split_name_format_compression(path)
    fmt = fmt or spec.format or "parquet"
    compression = compression or spec.compression
    if limit is not None:
        df = df.limit(limit)
    if compression == "enc":
        if not passphrase:
            raise ValueError(f"{path} is an encrypted (.enc) sink; pass passphrase= (and salt=)")
        from railgun_spark.sources import crypto

        crypto.write_encrypted(df, path, passphrase, salt or "", fmt=fmt or "jsonl")
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path, compression=compression or "snappy")
    elif fmt in ("json", "jsonl"):
        w.json(path, compression=compression)
    elif fmt in ("csv", "tsv"):
        # Spark's csv writer trims cell whitespace by default — disable for
        # byte-fidelity round-trips (gss quotes and preserves whitespace)
        w.option("header", "true").option("ignoreLeadingWhiteSpace", "false").option(
            "ignoreTrailingWhiteSpace", "false"
        ).csv(path, sep="\t" if fmt == "tsv" else ",", compression=compression)
    elif fmt in ("yaml", "toml", "properties", "bson", "hcl", "hcl2"):
        _write_document_format(df, path, fmt)
    else:
        raise NotImplementedError(f"write format {fmt}")


def convert(spark: SparkSession, in_path: str, out_path: str, **read_opts) -> None:
    """Format conversion with no expression — `railgun convert`
    (railgun/cli/convert.go:23-50)."""
    write(read(spark, in_path, **read_opts), out_path)
