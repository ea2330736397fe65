"""Thin SQLite-compat dialect layer (optional "bug-compat" mode).

The reference's de-facto dialect is bundled SQLite ~3.44 reached through
the passthrough at reference src/main.rs:220. Measured deltas vs Spark 4
ANSI (SURVEY.md §4.3):

- SQLite LIKE is ASCII-case-insensitive; Spark's is case-sensitive.
- SQLite CAST is permissive ('12abc' -> 12); Spark ANSI errors.
- SQLite int/int is integer division (1/2 -> 0); Spark -> 0.5.
- SQLite x/0 -> NULL; Spark ANSI throws.

This is a pure query-rewrite/function-choice layer — no Catalyst rule.
`apply_session_mode` flips ANSI off for the closest whole-session match;
`rewrite` handles the operator-level substitutions for SQL text.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


def apply_session_mode(spark: SparkSession, sqlite_compat: bool) -> None:
    # ANSI off: permissive casts, NULL on div-by-zero — SQLite-ish.
    spark.conf.set("spark.sql.ansi.enabled", "false" if sqlite_compat else "true")


_LIKE_RE = re.compile(r"(?i)(?<![a-z0-9_])like(?![a-z0-9_])")
_CAST_RE = re.compile(r"(?i)(?<![a-z0-9_])cast\s*\(")
_INT_DIV_HINT = re.compile(r"(?i)(?<![a-z0-9_])div(?![a-z0-9_])")


def rewrite(sql: str, *, sqlite_compat: bool = True) -> str:
    """Best-effort textual rewrite of a SQLite-dialect query into Spark
    SQL with matching semantics. Intentionally conservative: only the
    unambiguous keyword-level substitutions; everything else is already
    shared syntax and goes straight to `spark.sql` (Catalyst is the
    SQLite VDBE of this engine)."""
    if not sqlite_compat:
        return sql
    out = _LIKE_RE.sub("ILIKE", sql)
    out = _CAST_RE.sub("TRY_CAST(", out)
    return out
