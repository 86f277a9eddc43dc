"""Property-based round-trip: for randomly generated DFL predicates, the
Column compiler and the SQL renderer must produce identical row sets.

Mirrors the reference's table-driven exhaustive-operator testing strategy
(SURVEY §5) with generated rather than enumerated cases. One shared
DataFrame; hypothesis generates predicate ASTs as strings, and we assert
run_pipeline(filter) == spark.sql(rendered filter).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from railgun_spark.dfl import run_pipeline
from railgun_spark.dfl.sqlgen import pipeline_sql_for_df

ROWS = [
    Row(id=i, v=float(i) * 1.5 - 3, name=f"n{i % 4}", kind=["bar", "cafe", None][i % 3])
    for i in range(24)
]

_num_attr = st.sampled_from(["@id", "@v"])
_str_attr = st.sampled_from(["@name", "@kind"])
_num_lit = st.sampled_from(["0", "2", "7", "-1", "3.5"])
_str_lit = st.sampled_from(['"n1"', '"bar"', '"zz"'])
_cmp = st.sampled_from(["==", "!=", "<", "<=", ">", ">="])


@st.composite
def _atom(draw):
    form = draw(st.integers(0, 5))
    if form == 0:
        return f"{draw(_num_attr)} {draw(_cmp)} {draw(_num_lit)}"
    if form == 1:
        return f"{draw(_str_attr)} {draw(_cmp)} {draw(_str_lit)}"
    if form == 2:
        return f"{draw(_str_attr)} == null"
    if form == 3:
        return f"{draw(_num_attr)} between {draw(_num_lit)} and {draw(_num_lit)}"
    if form == 4:
        return f"{draw(_str_attr)} in [{draw(_str_lit)}, {draw(_str_lit)}]"
    return f"{draw(_str_attr)} ilike \"%{draw(st.sampled_from(['1', 'a', 'n']))}%\""


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    parts = [draw(_atom()) for _ in range(n)]
    out = parts[0]
    for p in parts[1:]:
        op = draw(st.sampled_from(["and", "or"]))
        neg = draw(st.booleans())
        out = f"({out}) {op} ({'not (' + p + ')' if neg else p})"
    return out


@pytest.fixture(scope="module")
def pred_df(spark):
    df = spark.createDataFrame(ROWS)
    df.createOrReplaceTempView("t_prop")
    return df


@given(pred=predicates())
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_filter_roundtrip(spark, pred_df, pred):
    dfl = f"filter(@, '{pred}')"
    via_cols = sorted(tuple(r) for r in run_pipeline(pred_df, dfl).collect())
    sql = pipeline_sql_for_df(pred_df, dfl, "t_prop")
    via_sql = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert via_cols == via_sql


def test_map_projection_preserves_string_typing(spark, pred_df):
    """After map(), projected string columns must stay string-typed so later
    stages render string semantics (len -> length, + -> concat)."""
    dfl = (
        "map(@, {\"label\": @name + \"_x\", \"id\": @id})"
        " | filter(@, 'len(@label) == 4')"
    )
    via_cols = sorted(tuple(r) for r in run_pipeline(pred_df, dfl).collect())
    sql = pipeline_sql_for_df(pred_df, dfl, "t_prop")
    assert "length(" in sql  # string len, not array size
    via_sql = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert via_cols == via_sql and len(via_cols) == 24


def test_map_scalar_projection_string_typing(spark, pred_df):
    dfl = "map(@, 'lower(@name)') | filter(@, 'len(@value) == 2')"
    sql = pipeline_sql_for_df(pred_df, dfl, "t_prop")
    assert "length(" in sql
    assert len(spark.sql(sql).collect()) == 24
