"""Unit tests for every DuckDB→Spark dialect rewrite (SURVEY.md §4.3)."""

import pytest

from filefilter_spark.dialect import DialectError, translate


def test_exclude_rewrite():
    assert translate("SELECT * EXCLUDE(a, b) FROM df") == "SELECT * EXCEPT(a, b) FROM df"
    assert "EXCEPT (x)" in translate("SELECT t.* EXCLUDE (x) FROM t")


def test_exclude_executes(spark):
    spark.createDataFrame([(1, 2, 3)], "a int, b int, c int").createOrReplaceTempView("df")
    out = spark.sql(translate("SELECT * EXCLUDE(b) FROM df"))
    assert out.columns == ["a", "c"]


def test_qualify_alias_pred(spark):
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3)], "k int, v string, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "SELECT k, v, x, row_number() OVER(PARTITION BY k ORDER BY x DESC) AS rn "
        "FROM df QUALIFY rn = 1"
    )
    rows = {(r["k"], r["v"]) for r in spark.sql(sql).collect()}
    assert rows == {(1, "b"), (2, "c")}


def test_qualify_window_pred_with_tail(spark):
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3)], "k int, v string, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "SELECT k, v FROM df "
        "QUALIFY row_number() OVER(PARTITION BY k ORDER BY x DESC) = 1 "
        "ORDER BY k LIMIT 5"
    )
    rows = [(r["k"], r["v"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "b"), (2, "c")]
    assert "__qualify__" not in spark.sql(sql).columns


def test_qualify_order_by_inside_over_not_tail():
    """ORDER BY inside OVER() must not be mistaken for the statement
    tail (the round-1 regression this rewrite fixes)."""
    sql = translate(
        "SELECT k, rank() OVER(ORDER BY x) AS r FROM df QUALIFY r <= 2"
    )
    assert sql.startswith("SELECT * EXCEPT(__qualify__) FROM (")
    assert sql.rstrip().endswith("WHERE __qualify__")
    assert "(r <= 2) AS __qualify__" in sql


def test_strftime_both_arg_orders():
    out = translate("SELECT strftime(ts, '%Y-%m-%d') FROM df")
    assert "date_format(ts, 'yyyy-MM-dd')" in out
    out2 = translate("SELECT strftime('%H:%M', ts) FROM df")
    assert "date_format(ts, 'HH:mm')" in out2


def test_fn_renames():
    out = translate("SELECT list_distinct(a), list_contains(a, 1), strlen(s) FROM df")
    assert "array_distinct(a)" in out
    assert "array_contains(a, 1)" in out
    assert "length(s)" in out


def test_asof_join_raises():
    with pytest.raises(DialectError):
        translate("SELECT * FROM a ASOF JOIN b ON a.t >= b.t")


def test_read_csv_raises():
    with pytest.raises(DialectError):
        translate("SELECT * FROM read_csv_auto('x.csv')")


def test_triple_dash_comment(spark):
    """The reference's examples use `---` comment lines
    (fullExample.yml:101); Spark treats them as `--` comments too."""
    spark.range(1).createOrReplaceTempView("df")
    sql = translate("--- a comment\nSELECT id FROM df")
    assert spark.sql(sql).count() == 1


def test_qualify_multiple_windows_and_tail(spark):
    """Two window functions in one QUALIFY predicate plus an ORDER BY /
    LIMIT tail — the predicate must move into the select list whole and
    the tail must stay outside the wrap."""
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3), (2, "d", 7)],
        "k int, v string, x int",
    ).createOrReplaceTempView("df")
    sql = translate(
        "SELECT k, v, x FROM df "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY x DESC) = 1 "
        "AND rank() OVER (ORDER BY x DESC) <= 3 "
        "ORDER BY k LIMIT 5"
    )
    rows = [(r["k"], r["v"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "b"), (2, "d")]


def test_qualify_alias_defined_in_cte(spark):
    """QUALIFY referencing a window alias computed inside a CTE — the
    alias-only path must wrap the whole WITH statement."""
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3)], "k int, v string, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "WITH ranked AS ("
        "  SELECT k, v, x, row_number() OVER (PARTITION BY k ORDER BY x DESC) AS rn"
        "  FROM df"
        ") SELECT k, v FROM ranked QUALIFY rn = 1 ORDER BY k"
    )
    rows = [(r["k"], r["v"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "b"), (2, "c")]


def test_qualify_window_pred_after_cte(spark):
    """Window-function QUALIFY on a statement that starts with WITH:
    the top-level FROM scanner must skip the CTE body."""
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3)], "k int, v string, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "WITH base AS (SELECT k, v, x FROM df WHERE x > 0) "
        "SELECT k, v FROM base "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY x DESC) = 1"
    )
    rows = {(r["k"], r["v"]) for r in spark.sql(sql).collect()}
    assert rows == {(1, "b"), (2, "c")}


def test_qualify_inside_cte_body(spark):
    """QUALIFY nested INSIDE a CTE body (paren depth > 0) — the
    recursive rewriter must find and rewrite the inner statement."""
    spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "c", 3)], "k int, v string, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "WITH best AS ("
        "  SELECT k, v, x, row_number() OVER (PARTITION BY k ORDER BY x DESC) AS rn "
        "  FROM df QUALIFY rn = 1"
        ") SELECT k, v FROM best ORDER BY k"
    )
    rows = [(r["k"], r["v"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "b"), (2, "c")]


def test_qualify_inside_derived_table(spark):
    spark.createDataFrame(
        [(1, 5), (1, 9), (2, 3)], "k int, x int"
    ).createOrReplaceTempView("df")
    sql = translate(
        "SELECT sum(x) AS s FROM ("
        "SELECT k, x FROM df "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY x DESC) = 1)"
    )
    assert spark.sql(sql).collect()[0]["s"] == 12


def test_nested_exclude(spark):
    spark.createDataFrame(
        [(1, 2, 3, 4)], "a int, b int, c int, d int"
    ).createOrReplaceTempView("df")
    sql = translate("SELECT * EXCLUDE(a) FROM (SELECT * EXCLUDE (d) FROM df)")
    assert spark.sql(sql).columns == ["b", "c"]


def test_strftime_nested_expr_and_fmt_first(spark):
    spark.createDataFrame([("2024-03-05 10:00:00",)], "s string").createOrReplaceTempView("df")
    sql = translate(
        "SELECT strftime(date_trunc('day', CAST(s AS TIMESTAMP)), '%Y/%m/%d') AS a, "
        "strftime('%d.%m.%Y', CAST(s AS TIMESTAMP)) AS b FROM df"
    )
    row = spark.sql(sql).collect()[0]
    assert row["a"] == "2024/03/05"
    assert row["b"] == "05.03.2024"


def test_regexp_matches_rename(spark):
    spark.createDataFrame(
        [("555-0100",), ("no phone",)], "s string"
    ).createOrReplaceTempView("df")
    sql = translate(r"SELECT s FROM df WHERE regexp_matches(s, '\\d{3}-\\d{4}')")
    assert "rlike(" in sql and "regexp_matches" not in sql
    assert [r.s for r in spark.sql(sql).collect()] == ["555-0100"]


def test_list_unique_returns_count(spark):
    # DuckDB list_unique is the COUNT of distinct elements (BIGINT);
    # the rewrite must wrap, not just rename, or the type changes.
    sql = translate("SELECT list_unique(array(1, 2, 2, 3)) AS n")
    assert "size(array_distinct(array(1, 2, 2, 3)))" in sql
    assert spark.sql(sql).collect()[0].n == 3
    # nested args with commas and parens survive the depth scan
    sql2 = translate("SELECT list_unique(list_concat(array(1), array(1, 2))) AS n")
    assert spark.sql(sql2).collect()[0].n == 2


def test_len_passthrough(spark):
    # string len is evaluated natively by Spark — no rename needed; the
    # old blanket len->length rename claimed (wrongly) to cover lists.
    sql = translate("SELECT len('abcd') AS n")
    assert "len('abcd')" in sql
    assert spark.sql(sql).collect()[0].n == 4


def test_extended_list_and_string_renames(spark):
    sql = translate(
        "SELECT list_has(array(1, 2), 2) AS a, list_min(array(3, 1)) AS b, "
        "list_max(array(3, 1)) AS c, array_to_string(array('x', 'y'), '-') AS d, "
        "list_append(array(1), 2) AS e, strpos('hello', 'll') AS f"
    )
    row = spark.sql(sql).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.f) == (True, 1, 3, "x-y", [1, 2], 3)


def test_list_reverse_sort_wrap(spark):
    sql = translate("SELECT list_reverse_sort(array(1, 3, 2)) AS a")
    assert "sort_array(array(1, 3, 2), false)" in sql
    assert spark.sql(sql).collect()[0].a == [3, 2, 1]


def test_epoch_keeps_fraction(spark):
    # DuckDB epoch() returns DOUBLE seconds including the fraction; a
    # plain unix_timestamp rename would silently truncate 60.5 -> 60
    sql = translate("SELECT epoch(TIMESTAMP '1970-01-01 00:01:00.500') AS s")
    assert "unix_micros(" in sql
    assert spark.sql(sql).collect()[0].s == 60.5


def test_exclude_bare_single_column(spark):
    spark.createDataFrame([(1, 2, 3)], "a int, b int, c int").createOrReplaceTempView("df")
    sql = translate("SELECT * EXCLUDE b FROM df")
    assert "EXCEPT(b)" in sql
    assert spark.sql(sql).columns == ["a", "c"]


def test_list_slice_inclusive_to_length(spark):
    sql = translate("SELECT list_slice(array(10, 20, 30, 40), 2, 3) AS a")
    assert spark.sql(sql).collect()[0].a == [20, 30]


def test_list_slice_negative_literals_resolve_from_end(spark):
    # DuckDB from-the-end indices: -1 is the last element. Verified
    # against duckdb in the same test so the oracle contract stays
    # honest if either engine changes.
    import duckdb

    cases = [
        "list_slice(array(10, 20, 30, 40), 2, -1)",   # slice to end
        "list_slice(array(10, 20, 30, 40), -3, -1)",  # last three
        "list_slice(array(10, 20, 30, 40), -1, -3)",  # empty (e < b)
        "list_slice(array(10, 20, 30, 40), 1, -2)",   # drop last
    ]
    for expr in cases:
        got = spark.sql(translate(f"SELECT {expr} AS a")).collect()[0].a
        want = duckdb.sql(f"SELECT {expr.replace('array', 'list_value')} AS a").fetchone()[0]
        assert got == want, expr


def test_nested_wrapped_calls_rewrite_inner_too(spark):
    # the arg-wrapping scanner must recurse: a nested same-name call sits
    # inside the span the outer match consumes
    sql = translate("SELECT list_unique(list_reverse_sort(list_reverse_sort(list_value(2, 1)))) AS n")
    assert "list_reverse_sort" not in sql
    assert spark.sql(sql).collect()[0].n == 2


def test_string_split_literal_separator_escaped():
    from filefilter_spark.dialect import translate

    assert translate("SELECT string_split(c, '.') FROM df") == \
        "SELECT split(c, '\\\\.') FROM df"
    assert "\\\\|" in translate("SELECT str_split(c, '|') FROM df")
    # regex splitter keeps regex semantics
    assert translate("SELECT regexp_split_to_array(c, '\\s+') FROM df") == \
        "SELECT split(c, '\\s+') FROM df"


def test_strftime_percent_escape_and_literal_letters():
    from filefilter_spark.dialect import translate

    # '%%Y' is a literal '%Y', not a year
    assert translate("SELECT strftime(ts, '%%Y') FROM x") == \
        "SELECT date_format(ts, '\\'%Y\\'') FROM x"
    # unquoted literal letters would be pattern letters to the JDK
    assert translate("SELECT strftime(ts, '%Y-%m-%dT%H') FROM x") == \
        "SELECT date_format(ts, 'yyyy-MM-dd\\'T\\'HH') FROM x"
