"""Generic JDBC datastore passthrough — closes the `athena://` gap honestly.

The reference's Athena source (railgun/cli/process.go:423-517,
railgun/athenaiterator/AthenaIterator.go:22-78) resolves a named query,
starts an execution, polls <=36x5s and pages results through NextToken.
On Spark the catalog-native twin is `stored_query://` (the saved SQL runs
on the session catalog as a distributed DataFrame,
catalog/registry.py). For reaching an ACTUAL external warehouse, the
Spark-idiomatic bulk path is the vendor's JDBC driver through
``spark.read.format("jdbc")``: predicate pushdown travels to the remote
engine and `partitionColumn/numPartitions` gives parallel range reads —
strictly stronger than the reference's single-threaded result paging.

URI convention (kept inside the JDBC URL's query string so DataStore URIs
stay single strings):

    jdbc:awsathena://athena.us-east-1.amazonaws.com:443;S3OutputLocation=...
        ?railgun_table=events
    jdbc:postgresql://host:5432/db?railgun_query=SELECT ...&railgun_fetchsize=10000

``railgun_*`` params are extracted and mapped to Spark JDBC options
(`table` -> dbtable, `query` -> query, anything else passes through, e.g.
`railgun_partitioncolumn`); the remaining URL is handed to the driver
verbatim. The vendor jar must be on spark.jars — not bundled here (this
container has none), so tests assert the wiring, not a live connection.
"""

from __future__ import annotations

from urllib.parse import parse_qsl

PREFIX = "railgun_"

# canonical Spark option names for case-insensitive railgun_* params
_CANONICAL = {
    "table": "dbtable",
    "dbtable": "dbtable",
    "query": "query",
    "fetchsize": "fetchsize",
    "numpartitions": "numPartitions",
    "partitioncolumn": "partitionColumn",
    "lowerbound": "lowerBound",
    "upperbound": "upperBound",
    "driver": "driver",
    "user": "user",
    "password": "password",
}


def split_jdbc_uri(uri: str) -> tuple[str, dict[str, str]]:
    """Split a jdbc: uri into (vendor url, spark jdbc options).

    Only ``railgun_*`` query params are consumed; all other query-string
    content stays in the url untouched (vendor drivers parse their own
    params, and `;`-style Athena/SQLServer properties never enter the
    query string)."""
    if not uri.startswith("jdbc:"):
        raise ValueError(f"not a jdbc uri: {uri}")
    if "?" not in uri:
        return uri, {}
    base, _, qs = uri.partition("?")
    opts: dict[str, str] = {}
    kept: list[str] = []
    for k, v in parse_qsl(qs, keep_blank_values=True):
        if k.lower().startswith(PREFIX):
            raw = k[len(PREFIX) :].lower()
            opts[_CANONICAL.get(raw, raw)] = v
        else:
            kept.append(f"{k}={v}")
    url = base + ("?" + "&".join(kept) if kept else "")
    return url, opts


def jdbc_reader(spark, uri: str, **extra_options):
    """Configured DataFrameReader for a jdbc: uri (call .load() to run).
    Exactly one of railgun_table / railgun_query must be present (Spark's
    jdbc source requires dbtable xor query)."""
    url, opts = split_jdbc_uri(uri)
    opts.update(extra_options)
    if ("dbtable" in opts) == ("query" in opts):
        raise ValueError(
            "jdbc uri needs exactly one of railgun_table= or railgun_query= "
            f"(got options {sorted(opts)})"
        )
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader


def read_jdbc(spark, uri: str, **extra_options):
    """Load a jdbc: uri into a DataFrame (requires the vendor jar on the
    session classpath)."""
    return jdbc_reader(spark, uri, **extra_options).load()
