"""Property-based tests (SURVEY.md §5.2 item 5): random workbooks through
the full parse+coerce pipeline."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from excel_to_db_spark.ingest import IngestOptions, coerce_row
from excel_to_db_spark.sources.xlsx import read_xlsx_rows
from excel_to_db_spark.sources.xlsx_writer import write_xlsx

cell = st.one_of(
    st.none(),
    # printable ascii: the fixture writer strips XML-invalid control
    # chars (documented), so exclude them from the value-survival claim
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            max_size=12),
    st.integers(min_value=-2**40, max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
    st.booleans(),
)
row = st.lists(cell, min_size=0, max_size=7)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_roundtrip_row_count_and_no_raise(rows, tmp_path_factory):
    """Writer->parser roundtrip preserves row count; permissive coercion
    never raises and always yields a 5-tuple or None."""
    p = str(tmp_path_factory.mktemp("hyp") / "t.xlsx")
    write_xlsx(p, rows)
    parsed = read_xlsx_rows(p)
    assert len(parsed) == len(rows)
    opts = IngestOptions()
    for r in parsed:
        out = coerce_row(list(r), opts)
        assert out is None or (len(out) == 5 and isinstance(out[0], str))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_roundtrip_values_survive(rows, tmp_path_factory):
    """Non-null scalar cells come back with equal value (strings exact,
    numbers numerically equal, bools as bools)."""
    p = str(tmp_path_factory.mktemp("hyp") / "t.xlsx")
    write_xlsx(p, rows)
    parsed = read_xlsx_rows(p)
    for orig, got in zip(rows, parsed):
        for j, v in enumerate(orig):
            if v is None:
                continue
            g = got[j] if j < len(got) else None
            if isinstance(v, bool):
                assert g == v
            elif isinstance(v, str):
                assert g == v or (v == "" and g is None)
            else:
                assert g is not None and float(g) == float(v)


typed_row = st.tuples(
    st.integers(min_value=-2**40, max_value=2**40),
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            max_size=12),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
    st.booleans(),
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(typed_row, min_size=1, max_size=10))
def test_generic_schema_coercion_roundtrip(rows, tmp_path_factory):
    """The user-schema positional coercion path (datasource._field_coercer)
    recovers exactly the typed values the xlsx writer emitted — the pure
    core of the distributed write->read round trip."""
    from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                                   StringType)

    from excel_to_db_spark.sources.datasource import _field_coercer

    p = str(tmp_path_factory.mktemp("hyp_typed") / "t.xlsx")
    write_xlsx(p, [["k", "s", "v", "b"]] + [list(r) for r in rows])
    back = read_xlsx_rows(p)[1:]
    coercers = [_field_coercer(t()) for t in
                (LongType, StringType, DoubleType, BooleanType)]
    got = [tuple(co(cells[i]) if i < len(cells) else None
                 for i, co in enumerate(coercers)) for cells in back]
    assert got == [tuple(r) for r in rows]
