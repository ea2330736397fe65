"""Thin SQLite-compat dialect layer (optional "bug-compat" mode).

The reference's de-facto dialect is bundled SQLite ~3.44 reached through
the passthrough at reference src/main.rs:220. Measured deltas vs Spark 4
ANSI (SURVEY.md §4.3):

- SQLite LIKE is ASCII-case-insensitive; Spark's is case-sensitive.
- SQLite CAST is permissive ('12abc' -> 12); Spark ANSI errors.
- SQLite int/int is integer division (1/2 -> 0); Spark -> 0.5.
- SQLite x/0 -> NULL; Spark ANSI throws.

This is a pure query-rewrite/function-choice layer — no Catalyst rule.
`apply_session_mode` flips ANSI off for the closest whole-session match
(permissive casts, NULL on div-by-zero); `rewrite` handles the
keyword-level substitutions for SQL text, skipping string literals so
data inside quotes is never touched.

The int-division delta (SQLite 1/2 -> 0) is NOT rewritten: `/` between
integer columns cannot be retargeted to `div` textually without a real
parser knowing operand types, and a wrong rewrite silently corrupts
results. Callers who need SQLite integer division write `a div b`
explicitly (documented divergence).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


def apply_session_mode(spark: SparkSession, sqlite_compat: bool) -> None:
    # ANSI off: permissive casts, NULL on div-by-zero — SQLite-ish.
    spark.conf.set("spark.sql.ansi.enabled", "false" if sqlite_compat else "true")


_LIKE_RE = re.compile(r"(?i)(?<![a-z0-9_])like(?![a-z0-9_])")
_CAST_RE = re.compile(r"(?i)(?<![a-z0-9_])cast\s*\(")

# Split into alternating [code, literal, code, literal, ...] segments.
# A SQLite string literal is '...' with '' as the escaped quote.
_LITERAL_RE = re.compile(r"('(?:[^']|'')*')")


def rewrite(sql: str, *, sqlite_compat: bool = True) -> str:
    """Best-effort textual rewrite of a SQLite-dialect query into Spark
    SQL with matching semantics. Intentionally conservative: only the
    unambiguous keyword-level substitutions (LIKE -> ILIKE, CAST ->
    TRY_CAST), applied outside string literals; everything else is
    already shared syntax and goes straight to `spark.sql` (Catalyst is
    the SQLite VDBE of this engine)."""
    if not sqlite_compat:
        return sql
    parts = _LITERAL_RE.split(sql)
    for i in range(0, len(parts), 2):  # even indices = non-literal code
        parts[i] = _CAST_RE.sub("TRY_CAST(", _LIKE_RE.sub("ILIKE", parts[i]))
    return "".join(parts)
