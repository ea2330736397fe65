"""REPL DML/DDL parity: the reference executes INSERT/UPDATE/DELETE/
CREATE/DROP through its SQLite passthrough (reference src/main.rs:220);
our REPL re-expresses them as temp-view re-registration (dml.py)."""

from __future__ import annotations

import pytest

from excel_to_db_spark.dml import try_dml
from excel_to_db_spark.repl import run_line


@pytest.fixture()
def excel_rows(spark):
    spark.createDataFrame(
        [("svc_a", 10.0, 100, 20.0, 5.0), ("svc_b", 11.0, 200, 22.0, 6.0)],
        "service_name string, average_response_time_95_ms double, "
        "count bigint, max_response_time_95_ms double, "
        "min_response_time_95_ms double",
    ).createOrReplaceTempView("excel_rows")
    yield "excel_rows"
    spark.catalog.dropTempView("excel_rows")


def test_insert_values_then_select(spark, excel_rows, capsys):
    run_line(spark, "INSERT INTO excel_rows VALUES "
                    "('svc_new', 1.5, 7, 2.5, 0.5)")
    out = capsys.readouterr().out
    assert "1 row(s) inserted" in out
    run_line(spark, "SELECT service_name, count FROM excel_rows "
                    "WHERE service_name = 'svc_new'")
    assert "svc_new" in capsys.readouterr().out
    assert spark.table("excel_rows").count() == 3


def test_insert_column_list_fills_null(spark, excel_rows):
    msg = try_dml(spark, "INSERT INTO excel_rows (service_name, count) "
                         "VALUES ('svc_partial', 9)")
    assert "1 row(s) inserted" in msg
    row = (spark.table("excel_rows")
           .where("service_name = 'svc_partial'").collect()[0])
    assert row["count"] == 9
    assert row["average_response_time_95_ms"] is None


def test_insert_select(spark, excel_rows):
    msg = try_dml(spark, "INSERT INTO excel_rows "
                         "SELECT concat(service_name, '_copy'), "
                         "average_response_time_95_ms, count, "
                         "max_response_time_95_ms, min_response_time_95_ms "
                         "FROM excel_rows")
    assert "2 row(s) inserted" in msg
    assert spark.table("excel_rows").count() == 4


def test_update_with_where(spark, excel_rows):
    msg = try_dml(spark, "UPDATE excel_rows SET count = count + 1 "
                         "WHERE service_name = 'svc_a'")
    assert "1 row(s) updated" in msg
    got = {r.service_name: r["count"]
           for r in spark.table("excel_rows").collect()}
    assert got == {"svc_a": 101, "svc_b": 200}


def test_update_all_rows_multiple_assignments(spark, excel_rows):
    msg = try_dml(spark, "UPDATE excel_rows SET count = 0, "
                         "min_response_time_95_ms = least(1.0, 2.0)")
    assert "2 row(s) updated" in msg
    for r in spark.table("excel_rows").collect():
        assert r["count"] == 0 and r["min_response_time_95_ms"] == 1.0


def test_delete_where_and_all(spark, excel_rows):
    msg = try_dml(spark, "DELETE FROM excel_rows "
                         "WHERE service_name = 'svc_b'")
    assert "1 row(s) deleted" in msg
    assert [r.service_name for r in spark.table("excel_rows").collect()] \
        == ["svc_a"]
    msg = try_dml(spark, "DELETE FROM excel_rows")
    assert "1 row(s) deleted" in msg
    assert spark.table("excel_rows").count() == 0


def test_create_table_as_and_drop(spark, excel_rows):
    msg = try_dml(spark, "CREATE TABLE fast_svcs AS "
                         "SELECT service_name FROM excel_rows "
                         "WHERE average_response_time_95_ms < 10.5")
    assert "created" in msg
    assert spark.table("fast_svcs").count() == 1
    msg = try_dml(spark, "CREATE TABLE IF NOT EXISTS fast_svcs AS SELECT 1 AS x")
    assert "already exists" in msg
    assert try_dml(spark, "DROP TABLE fast_svcs") == "-- table fast_svcs dropped"
    assert "fast_svcs" not in [t.name for t in spark.catalog.listTables()]
    assert "skipped" in try_dml(spark, "DROP TABLE IF EXISTS fast_svcs")
    with pytest.raises(ValueError):
        try_dml(spark, "DROP TABLE fast_svcs")


def test_create_table_columns_sqlite_types(spark):
    # the reference's own DDL shape (src/main.rs:182-188)
    msg = try_dml(spark, "CREATE TABLE t_ddl ("
                         "service_name TEXT NOT NULL, "
                         "avg_ms REAL NOT NULL, "
                         "count INTEGER NOT NULL, "
                         "PRIMARY KEY (service_name))")
    assert "3 columns" in msg
    assert dict(spark.table("t_ddl").dtypes) == {
        "service_name": "string", "avg_ms": "double", "count": "bigint"}
    try_dml(spark, "INSERT INTO t_ddl VALUES ('a', 1.0, 2)")
    assert spark.table("t_ddl").count() == 1
    try_dml(spark, "DROP TABLE t_ddl")


def test_update_literal_containing_where(spark, excel_rows):
    # 'where' inside a string literal must not split the SET clause
    msg = try_dml(spark, "UPDATE excel_rows "
                         "SET service_name = 'a where b' "
                         "WHERE count = 100")
    assert "1 row(s) updated" in msg
    vals = {r[0] for r in
            spark.table("excel_rows").select("service_name").collect()}
    assert vals == {"a where b", "svc_b"}


def test_update_literal_where_no_real_where(spark, excel_rows):
    msg = try_dml(spark,
                  "UPDATE excel_rows SET service_name = 'x where y'")
    assert "2 row(s) updated" in msg
    vals = {r[0] for r in
            spark.table("excel_rows").select("service_name").collect()}
    assert vals == {"x where y"}


def test_delete_literal_containing_where(spark, excel_rows):
    msg = try_dml(spark, "DELETE FROM excel_rows "
                         "WHERE service_name = 'no where match'")
    assert "0 row(s) deleted" in msg
    assert spark.table("excel_rows").count() == 2


def test_insert_unknown_column_errors(spark, excel_rows):
    # SQLite errors on unknown INSERT columns; so do we (no silent NULLs)
    with pytest.raises(ValueError, match="no column"):
        try_dml(spark, "INSERT INTO excel_rows (nosuchcol) VALUES (1)")
    assert spark.table("excel_rows").count() == 2


def test_non_dml_falls_through(spark):
    assert try_dml(spark, "SELECT 1 AS x") is None
    assert try_dml(spark, "WITH c AS (SELECT 1) SELECT * FROM c") is None
    # Spark-native temp-view DDL is NOT intercepted (spark.sql handles it)
    assert try_dml(
        spark, "CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 1 AS x") is None


def test_update_where_inside_double_quoted_token(spark):
    """SQLite's double-quote string fallback: a WHERE inside "..." must
    not split the UPDATE (mirrors the single-quote guarantee)."""
    import sqlite3

    from excel_to_db_spark.dml import _find_top_level_kw, _split_top_level

    stmt = 'note = "a where b", k = 2'
    assert _split_top_level(stmt) == ['note = "a where b"', "k = 2"]
    s = 'SET note = "x where y" WHERE k = 1'
    idx = _find_top_level_kw(s, "where")
    assert s[idx:idx + 5].lower() == "where" and idx > s.index('"x')
    # pin against real sqlite3: the statement is legal and targeted
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (k INTEGER, note TEXT)")
    con.execute("INSERT INTO t VALUES (1, 'old'), (2, 'old')")
    con.execute('UPDATE t SET note = "x where y" WHERE k = 1')
    assert sorted(con.execute("SELECT k, note FROM t").fetchall()) == [
        (1, "x where y"), (2, "old")]
