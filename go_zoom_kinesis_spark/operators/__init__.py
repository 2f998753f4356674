"""Batch operator library — the driver-checkable query surface.

Each submodule exposes two dicts:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLE:  dict[str, str]   # DuckDB-runnable ANSI SQL, same column names

``registry.all_queries()`` / ``all_oracle_sql()`` merge them for
``__spark_entry__``.
"""
