"""Function catalog — the go-adaptive-functions twin.

The reference serves its full function list at /dfl/functions.{ext}
(railgun/router/RailgunRouter.go:60-65); this registry is the equivalent
discoverable catalog for our DFL compiler surface, kept in sync with
railgun_spark.dfl.compiler._compile_call.
"""

from __future__ import annotations

CATALOG: dict[str, dict] = {
    # conversion (SURVEY §2.8)
    "int64": {"args": ["x"], "doc": "lenient cast to 64-bit int (null on malformed)"},
    "int32": {"args": ["x"], "doc": "lenient cast to 32-bit int"},
    "int16": {"args": ["x"], "doc": "lenient cast to 16-bit int"},
    "int8": {"args": ["x"], "doc": "lenient cast to 8-bit int"},
    "float64": {"args": ["x"], "doc": "lenient cast to double"},
    "float32": {"args": ["x"], "doc": "lenient cast to float"},
    "string": {"args": ["x"], "doc": "cast to string"},
    # string
    "lower": {"args": ["s"], "doc": "lowercase"},
    "upper": {"args": ["s"], "doc": "uppercase"},
    "trim": {"args": ["s"], "doc": "strip whitespace"},
    "split": {"args": ["s", "sep"], "doc": "split on literal separator"},
    "concat": {"args": ["a", "b", "..."], "doc": "string concatenation"},
    "slugify": {"args": ["s"], "doc": "lowercase, non-alnum runs -> '-' (railgun/Slugify.go:14-20)"},
    "len": {"args": ["x"], "doc": "string length or collection size"},
    # math
    "mul": {"args": ["a", "b"], "doc": "a * b"},
    "sub": {"args": ["a", "b"], "doc": "a - b"},
    "add": {"args": ["a", "b"], "doc": "a + b"},
    "div": {"args": ["a", "b"], "doc": "a / b"},
    "pow": {"args": ["a", "b"], "doc": "a ^ b"},
    "abs": {"args": ["x"], "doc": "absolute value"},
    "round": {"args": ["x", "n?"], "doc": "round to n decimals"},
    "floor": {"args": ["x"], "doc": "floor"},
    "ceil": {"args": ["x"], "doc": "ceiling"},
    "sqrt": {"args": ["x"], "doc": "square root"},
    # collection / aggregate
    "coalesce": {"args": ["a", "b", "..."], "doc": "first non-null"},
    "mean": {"args": ["xs"], "doc": "arithmetic mean of an array"},
    "avg": {"args": ["xs"], "doc": "alias of mean"},
    "sum": {"args": ["xs"], "doc": "sum of an array"},
    "max": {"args": ["xs"], "doc": "array maximum"},
    "min": {"args": ["xs"], "doc": "array minimum"},
    "first": {"args": ["xs"], "doc": "first element"},
    "last": {"args": ["xs"], "doc": "last element"},
    "set": {"args": ["xs"], "doc": "distinct elements (set semantics)"},
    "unique": {"args": ["xs"], "doc": "alias of set"},
    "array": {"args": ["xs"], "doc": "materialize as array"},
    "sort": {"args": ["xs", "key?", "desc?"], "doc": "sort collection"},
    "limit": {"args": ["xs", "n"], "doc": "first n elements; at pipeline level n<0 = all (expression level requires n >= 0)"},
    "filter": {"args": ["xs", "pred"], "doc": "keep elements where pred(@) holds"},
    "map": {"args": ["xs", "expr"], "doc": "project elements through expr(@)"},
    "hist": {"args": ["xs", "k1?", "k2?"], "doc": "value counts, optionally nested"},
    "group": {"args": ["xs", "key"], "doc": "group elements by key expression"},
    "lookup": {"args": ["m", "k"], "doc": "dynamic key access, null if absent"},
    "intersects": {"args": ["a", "b"], "doc": "set/array overlap test"},
    "jaccard": {
        "args": ["a", "b"],
        "doc": "exact Jaccard set similarity |A∩B|/|A∪B| over distinct "
        "array views (NULL when both empty)",
    },
    "hamming": {
        "args": ["a", "b"],
        "doc": "bit distance between integer fingerprints "
        "(bit_count(a XOR b) — the simhash verify expression)",
    },
    # geospatial (SURVEY §2.9)
    "bbox": {"args": ["coords"], "doc": "[minX, minY, maxX, maxY] aggregate"},
    "tileX": {"args": ["lon", "z"], "doc": "web-mercator tile x (geo/LongitudeToTile.go)"},
    "tileY": {"args": ["lat", "z"], "doc": "web-mercator tile y (geo/LatitudeToTile.go)"},
    "geohash": {
        "args": ["lon", "lat", "precision?"],
        "doc": "base32 geohash cell key (superset; precision literal, default 5)",
    },
}


def functions() -> list[dict]:
    """Discoverable list, /dfl/functions parity."""
    return [{"name": k, **v} for k, v in sorted(CATALOG.items())]
