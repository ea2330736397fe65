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
_GLOB_RE = re.compile(r"(?i)(?<![a-z0-9_])glob(?![a-z0-9_])\s*$")
_IIF_RE = re.compile(r"(?i)(?<![a-z0-9_])iif\s*\(")

# Split into alternating [code, literal, code, literal, ...] segments.
# A SQLite string literal is '...' with '' as the escaped quote.
_LITERAL_RE = re.compile(r"('(?:[^']|'')*')")

# SQLite strftime('%Y-%m', expr) -> Spark date_format(expr, 'yyyy-MM').
# Only simple column/identifier args are rewritten (no nested calls —
# a textual rewrite must not guess paren nesting), and only when every
# %-directive in the format translates; otherwise the call is left
# untouched and Spark reports the unknown function, loudly not wrongly.
_STRFTIME_RE = re.compile(
    r"(?i)(?<![a-z0-9_])strftime\s*\(\s*'([^']*)'\s*,\s*([A-Za-z_][A-Za-z0-9_.]*)\s*\)")
_STRFTIME_MAP = (("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
                 ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"))


def _xlat_strftime(m: re.Match) -> str:
    fmt, arg = m.group(1), m.group(2)
    if fmt == "%s":                      # epoch seconds directive
        return f"unix_timestamp({arg})"
    out = fmt
    for k, v in _STRFTIME_MAP:
        out = out.replace(k, v)
    if "%" in out:                       # untranslatable directive
        return m.group(0)
    return f"date_format({arg}, '{out}')"


def _glob_pattern_to_like(lit: str) -> str:
    """SQLite GLOB pattern literal -> LIKE pattern literal: * -> %,
    ? -> _, with pre-existing %/_ escaped (LIKE ... ESCAPE '\\' added by
    the caller). Character classes [...] are not translatable to LIKE
    and pass through unchanged (documented corner)."""
    body = lit[1:-1]
    body = body.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
    body = body.replace("*", "%").replace("?", "_")
    return f"'{body}'"


def rewrite(sql: str, *, sqlite_compat: bool = True) -> str:
    """Best-effort textual rewrite of a SQLite-dialect query into Spark
    SQL with matching semantics. Intentionally conservative: only the
    unambiguous keyword-level substitutions (LIKE -> ILIKE, CAST ->
    TRY_CAST), applied outside string literals; everything else is
    already shared syntax and goes straight to `spark.sql` (Catalyst is
    the SQLite VDBE of this engine)."""
    if not sqlite_compat:
        return sql
    # strftime spans code AND its format literal, so it runs on the whole
    # text first — but only at match positions OUTSIDE string literals
    # (the format literal belongs to the call; a literal CONTAINING the
    # word strftime must stay untouched).
    lit_spans = [m.span() for m in _LITERAL_RE.finditer(sql)]

    def _outside_literals(m: re.Match) -> str:
        # the call site is inside a literal iff its '(' (not the format
        # argument) starts within a span that began before the match
        return m.group(0) if any(a < m.start() < b for a, b in lit_spans) \
            else _xlat_strftime(m)

    sql = _STRFTIME_RE.sub(_outside_literals, sql)
    parts = _LITERAL_RE.split(sql)
    for i in range(0, len(parts), 2):  # even indices = non-literal code
        parts[i] = _CAST_RE.sub("TRY_CAST(", _LIKE_RE.sub("ILIKE", parts[i]))
        parts[i] = _IIF_RE.sub("IF(", parts[i])  # SQLite iif == Spark if
        # GLOB: case-SENSITIVE wildcard match. `x GLOB 'a*'` becomes
        # `x LIKE 'a%' ESCAPE '\'` — keyword rewritten here, the pattern
        # literal (the next odd segment) translated alongside.
        if _GLOB_RE.search(parts[i]) and i + 1 < len(parts):
            parts[i] = _GLOB_RE.sub("LIKE", parts[i])
            parts[i + 1] = _glob_pattern_to_like(parts[i + 1]) + " ESCAPE '\\\\'"
    return "".join(parts)
