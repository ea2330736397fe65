"""SQLite-compat function translations, checked against REAL SQLite.

The reference's dialect is bundled SQLite reached through its
passthrough (reference src/main.rs:220). Python's stdlib `sqlite3` is
the same engine, so every translation here is verified semantically:
run the original SQL on sqlite3, run `rewrite(sql)` on Spark, compare
values — not just string-shapes."""

from __future__ import annotations

import sqlite3

import pytest

from excel_to_db_spark.compat.sqlite_dialect import rewrite


def _sqlite_scalar(sql: str, setup: list[str] = ()):
    con = sqlite3.connect(":memory:")
    for s in setup:
        con.execute(s)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _spark_rows(spark, sql: str):
    return [tuple(r) for r in spark.sql(rewrite(sql)).collect()]


# ---------------------------------------------------------------------------
# scalar translations


def test_ifnull_maps_to_nvl(spark):
    sql = "SELECT ifnull(NULL, 'fallback') AS a, ifnull('x', 'y') AS b"
    assert "nvl(" in rewrite(sql) and "ifnull" not in rewrite(sql)
    assert _spark_rows(spark, sql) == _sqlite_scalar(sql)


def test_ifnull_inside_literal_untouched():
    out = rewrite("SELECT 'call ifnull(a,b) later' AS note")
    assert "ifnull(a,b)" in out


def test_group_concat_default_and_custom_sep(spark):
    setup = ["CREATE TABLE t(g INT, v TEXT)",
             "INSERT INTO t VALUES (1,'a'),(1,'b'),(1,NULL),(2,'c')"]
    spark.createDataFrame([(1, "a"), (1, "b"), (1, None), (2, "c")],
                          "g int, v string").createOrReplaceTempView("t")
    for sql in ("SELECT g, group_concat(v) AS s FROM t GROUP BY g ORDER BY g",
                "SELECT g, group_concat(v, '|') AS s FROM t GROUP BY g ORDER BY g"):
        # NULLs skipped on both sides; single-group order is insertion
        # order in SQLite and partition order in Spark — compare as sets
        # of characters per group to stay order-insensitive.
        lite = {(g, frozenset(s.replace("|", ",").split(",")))
                for g, s in _sqlite_scalar(sql, setup)}
        got = {(g, frozenset(s.replace("|", ",").split(",")))
               for g, s in _spark_rows(spark, sql)}
        assert got == lite
    spark.catalog.dropTempView("t")


def test_total_zero_on_empty_and_sums(spark):
    setup = ["CREATE TABLE t(v INT)", "INSERT INTO t VALUES (1),(2),(NULL)"]
    spark.createDataFrame([(1,), (2,), (None,)], "v int") \
         .createOrReplaceTempView("t")
    sql = "SELECT total(v) AS s FROM t"
    assert _spark_rows(spark, sql) == _sqlite_scalar(sql, setup) == [(3.0,)]
    # all-NULL -> 0.0, the delta vs sum() that motivates total()
    spark.createDataFrame([(None,)], "v int").createOrReplaceTempView("t")
    assert _spark_rows(spark, sql) == [(0.0,)]
    spark.catalog.dropTempView("t")


def test_julianday_and_unixepoch(spark):
    sql = ("SELECT julianday('2024-01-15 12:00:00') AS jd, "
           "unixepoch('2024-01-15 12:00:00') AS ue")
    [(jd_l, ue_l)] = _sqlite_scalar(sql)
    [(jd_s, ue_s)] = _spark_rows(spark, sql)
    assert jd_s == pytest.approx(jd_l, abs=1e-9)
    assert ue_s == ue_l


def test_unixepoch_noarg_rewrite():
    assert "unix_timestamp()" in rewrite("SELECT unixepoch() AS now_s")


# ---------------------------------------------------------------------------
# date modifiers


@pytest.mark.parametrize("expr", [
    "date('2024-01-15', '+1 day')",
    "date('2024-01-15', '-3 days')",
    "date('2024-01-15', '+2 months')",
    "date('2024-03-31', '+1 year')",
    "date('2024-01-15', 'start of month')",
    "date('2024-07-04', 'start of year')",
    "datetime('2024-01-15 10:20:30', '+90 minutes')",
    "datetime('2024-01-15 10:20:30', '-45 seconds')",
    "datetime('2024-01-15 10:20:30', '+6 hours', 'start of day')",
    "time('2024-01-15 10:20:30', '+1 hour')",
    "strftime('%Y-%m-%d', '2024-01-15', '+10 days')",
    "strftime('%Y-%m', '2024-01-15', 'start of month', '-1 month')",
])
def test_date_modifiers_match_sqlite(spark, expr):
    sql = f"SELECT {expr} AS v"
    assert _spark_rows(spark, sql) == _sqlite_scalar(sql)


def test_month_end_overflow_documented_divergence(spark):
    """SQLite normalizes Feb 31 forward to Mar 2; Spark INTERVAL clamps
    to Feb 29. Pinned so the divergence is intentional, not accidental."""
    sql = "SELECT date('2024-01-31', '+1 month') AS d"
    assert _sqlite_scalar(sql) == [("2024-03-02",)]
    assert _spark_rows(spark, sql) == [("2024-02-29",)]


def test_localtime_raises_targeted_error():
    # 'localtime' depends on the host tz, which the UTC-pinned session
    # deliberately has no access to — a loud, specific error beats both
    # a silent no-op and Spark's generic undefined-function failure.
    from excel_to_db_spark.compat.sqlite_dialect import SqliteCompatError

    for sql in ("SELECT datetime(ts, 'localtime') FROM t",
                "SELECT unixepoch(ts, 'utc') FROM t"):
        with pytest.raises(SqliteCompatError, match="UTC"):
            rewrite(sql)


@pytest.mark.parametrize("expr", [
    "date('2024-01-15', 'weekday 0')",   # Mon 15th -> next Sunday
    "date('2024-01-15', 'weekday 1')",   # already Monday -> no change
    "date('2024-01-15', 'weekday 6')",
    "datetime('2024-01-15 10:20:30', 'weekday 3')",  # time preserved
    "date('2024-01-15', '+1 day', 'weekday 2')",     # composes with steps
])
def test_weekday_modifier_matches_sqlite(spark, expr):
    sql = f"SELECT {expr} AS v"
    assert _spark_rows(spark, sql) == _sqlite_scalar(sql)


def test_unknown_modifier_left_untouched():
    sql = "SELECT date(d, 'subsec') FROM t"
    assert rewrite(sql) == sql


def test_strftime_epoch_of_date_only_string(spark):
    # %s with no modifiers used to skip the TIMESTAMP cast: date-only
    # strings came back NULL in Spark while SQLite returned the epoch.
    sql = "SELECT strftime('%s', '2024-01-15') AS e"
    assert _spark_rows(spark, sql) == [
        tuple(int(v) for v in r) for r in _sqlite_scalar(sql)]


def test_now_and_bare_identifier_forms():
    out = rewrite("SELECT date('now') AS today")
    assert "current_timestamp()" in out
    # bare column with no modifiers: passthrough arg (no spurious cast)
    out2 = rewrite("SELECT strftime('%Y-%m', d) AS ym FROM t")
    assert "date_format(d, 'yyyy-MM')" in out2


def test_nested_calls_translate(spark):
    sql = "SELECT date(datetime('2024-01-31 23:00:00', '+2 hours')) AS d"
    assert _spark_rows(spark, sql) == _sqlite_scalar(sql)


# ---------------------------------------------------------------------------
# GLOB character classes


def test_glob_char_class_rewrites_to_rlike(spark):
    sql = "SELECT name FROM t_glob2 WHERE name GLOB 'svc_[0-9]*'"
    out = rewrite(sql)
    assert "RLIKE" in out and "GLOB" not in out
    spark.createDataFrame(
        [("svc_1a",), ("svc_22",), ("svc_x",), ("SVC_1",), ("xsvc_1",)],
        ["name"]).createOrReplaceTempView("t_glob2")
    got = {r.name for r in spark.sql(out).collect()}
    # real SQLite agreement
    lite = {r[0] for r in _sqlite_scalar(
        sql.replace("t_glob2", "t"),
        ["CREATE TABLE t(name TEXT)",
         "INSERT INTO t VALUES ('svc_1a'),('svc_22'),('svc_x'),('SVC_1'),('xsvc_1')"])}
    assert got == lite == {"svc_1a", "svc_22"}
    spark.catalog.dropTempView("t_glob2")


def test_glob_negated_class(spark):
    sql = "SELECT name FROM tg WHERE name GLOB 'a[^xy]c'"
    spark.createDataFrame([("abc",), ("axc",), ("ayc",), ("azc",)], ["name"]) \
         .createOrReplaceTempView("tg")
    got = {r.name for r in spark.sql(rewrite(sql)).collect()}
    lite = {r[0] for r in _sqlite_scalar(
        sql.replace("tg", "t"),
        ["CREATE TABLE t(name TEXT)",
         "INSERT INTO t VALUES ('abc'),('axc'),('ayc'),('azc')"])}
    assert got == lite == {"abc", "azc"}
    spark.catalog.dropTempView("tg")


def test_glob_class_with_regex_metachars(spark):
    # dots outside the class must be literal, not regex any-char
    sql = "SELECT v FROM tm WHERE v GLOB 'f.[0-9]'"
    spark.createDataFrame([("f.1",), ("fx1",), ("f.x",)], ["v"]) \
         .createOrReplaceTempView("tm")
    got = {r.v for r in spark.sql(rewrite(sql)).collect()}
    assert got == {"f.1"}
    spark.catalog.dropTempView("tm")


def test_glob_without_class_keeps_like_path():
    out = rewrite("SELECT * FROM t WHERE name GLOB 'ent_*'")
    assert "LIKE" in out and "RLIKE" not in out
    assert r"'ent\_%' ESCAPE '\\'" in out
