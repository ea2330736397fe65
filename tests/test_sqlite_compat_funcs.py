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


@pytest.mark.parametrize("expr", [
    # winter (EST, UTC-5) and summer (EDT, UTC-4) wall times
    "datetime('2024-01-15 12:00:00', 'localtime')",
    "datetime('2024-07-15 12:00:00', 'localtime')",
    "datetime('2024-01-15 03:30:00', 'utc')",
    "datetime('2024-07-15 03:30:00', 'utc')",
    # either side of the 2024-03-10 spring-forward boundary (07:00 UTC)
    "datetime('2024-03-10 06:59:59', 'localtime')",
    "datetime('2024-03-10 07:00:00', 'localtime')",
    # composes with other modifiers, and through epoch extraction
    "datetime('2024-01-15 12:00:00', '+1 day', 'localtime')",
    "unixepoch('2024-01-15 12:00:00', 'utc')",
    "date('2024-01-15 23:30:00', 'localtime')",
])
def test_localtime_utc_match_sqlite(spark, expr):
    """'localtime'/'utc' verified against REAL SQLite with the host tz
    pinned: the in-process sqlite3 reads $TZ through localtime_r, the
    rewrite reads the same $TZ through host_local_zone(), so both
    engines answer for America/New_York (incl. the DST split)."""
    import os
    import time

    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        sql = f"SELECT {expr} AS v"
        assert _spark_rows(spark, sql) == _sqlite_scalar(sql)
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_localtime_env_override_beats_tz(monkeypatch):
    from excel_to_db_spark.compat import sqlite_dialect as d

    monkeypatch.setenv("TZ", "Asia/Tokyo")
    monkeypatch.setenv("EXCEL_TO_DB_LOCAL_TZ", "Europe/Paris")
    assert d.host_local_zone() == "Europe/Paris"
    out = rewrite("SELECT datetime(ts, 'localtime') FROM t")
    assert "from_utc_timestamp" in out and "Europe/Paris" in out


def test_posix_tz_string_raises_instead_of_fallthrough(monkeypatch):
    # TZ=EST5EDT is honored by libc localtime_r but unparseable as an
    # IANA name; consulting /etc/timezone instead could name a
    # DIFFERENT zone. The resolver must refuse loudly, not fall through.
    from excel_to_db_spark.compat import sqlite_dialect as d

    monkeypatch.delenv("EXCEL_TO_DB_LOCAL_TZ", raising=False)
    monkeypatch.setenv("TZ", "EST5EDT")
    with pytest.raises(d.SqliteCompatError, match="IANA"):
        d.host_local_zone()
    # ... and the explicit override path rejects a bad value the same way
    monkeypatch.setenv("EXCEL_TO_DB_LOCAL_TZ", "EST5EDT")
    with pytest.raises(d.SqliteCompatError, match="IANA"):
        d.host_local_zone()


def test_localtime_raises_when_zone_indeterminate(monkeypatch):
    # With no resolvable IANA zone the rewrite still refuses loudly —
    # a silent no-op would diverge from a reference run on a non-UTC
    # host. POSIX TZ strings (EST5EDT) are deliberately rejected: Spark
    # and C localtime() disagree on them.
    from excel_to_db_spark.compat import sqlite_dialect as d

    monkeypatch.setattr(d, "host_local_zone", lambda: None)
    for sql in ("SELECT datetime(ts, 'localtime') FROM t",
                "SELECT unixepoch(ts, 'utc') FROM t"):
        with pytest.raises(d.SqliteCompatError, match="IANA"):
            d.rewrite(sql)


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


# ---------------------------------------------------------------------------
# GROUPS-frame emulation vs SQLite's NATIVE GROUPS frames


def test_groups_frame_emulation_matches_native_sqlite(spark):
    """The dense_rank + RANGE emulation used by `window_groups_frame`
    (queries/relational3.py) vs SQLite's native `GROUPS BETWEEN 1
    PRECEDING AND 1 FOLLOWING` (sqlite >= 3.28 — the one engine at hand
    with real GROUPS frames; DuckDB 1.0 lacks them). Data includes peer
    ties, a single-group partition, and uneven group sizes, so the
    peer-group semantics (not row or value distance) are what's
    checked."""
    rows = [  # (part, ord_key, val) — ord_key has ties => peer groups
        ("a", 1, 10), ("a", 1, 20), ("a", 3, 30), ("a", 7, 40),
        ("a", 7, 50), ("a", 9, 60),
        ("b", 5, 70),                       # single peer group
        ("c", 2, 80), ("c", 2, 90), ("c", 2, 100), ("c", 4, 110),
    ]
    native = _sqlite_scalar(
        """SELECT p, k, v,
                  sum(v) OVER (PARTITION BY p ORDER BY k
                               GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                    AS s
           FROM t ORDER BY p, k, v""",
        ["CREATE TABLE t(p TEXT, k INT, v INT)",
         "INSERT INTO t VALUES " + ",".join(f"('{p}',{k},{v})"
                                            for p, k, v in rows)])
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["p", "k", "v"])
    dr = F.dense_rank().over(Window.partitionBy("p").orderBy("k"))
    emu = (df.withColumn("dr", dr)
             .withColumn("s", F.sum("v").over(
                 Window.partitionBy("p").orderBy("dr").rangeBetween(-1, 1)))
             .select("p", "k", "v", "s")
             .orderBy("p", "k", "v"))
    assert [tuple(r) for r in emu.collect()] == native
