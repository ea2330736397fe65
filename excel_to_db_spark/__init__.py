"""excel_to_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `preedep/excel_to_db`
(a Rust Excel -> in-memory SQLite -> SQL REPL CLI), rebuilt Spark-first.

Architecture (see SURVEY.md §7):

- Spark SQL *is* the database. The reference's entire query surface is a
  SQL-string passthrough into SQLite (reference src/main.rs:220); here the
  passthrough is ``spark.sql`` and Catalyst/Tungsten replace SQLite's
  planner/VDBE.
- Our own code is only: sources (Excel), sinks (display/CSV/JDBC), a thin
  SQLite-compat dialect layer, the REPL shell, and the Tier-C extension
  operator library (dedup / similarity / text / multimodal / streaming)
  designed for 100 TB scale.

Public entry points:

- :func:`excel_to_db_spark.session.get_spark` — tuned SparkSession factory.
- :mod:`excel_to_db_spark.sources.xlsx` — pure-Python xlsx reader.
- :func:`excel_to_db_spark.ingest.load_excel_table` — Excel -> temp view
  pipeline with the reference's coercion semantics.
- :mod:`excel_to_db_spark.queries` — the full operator/query registry used
  by ``__spark_entry__.py`` (driver contract).
- :mod:`excel_to_db_spark.repl` — the interactive ``[SQL] >>`` shell.
"""

__version__ = "0.1.0"
