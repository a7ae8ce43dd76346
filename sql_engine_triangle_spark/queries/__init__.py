"""Query registry package: every engine operator is exposed as a
named (spark, sf_dir) -> DataFrame builder plus, where SQL-expressible,
a DuckDB oracle SQL twin (driver contract in __spark_entry__.py)."""
