from .xlsx import read_xlsx_rows, sheet_names  # noqa: F401
