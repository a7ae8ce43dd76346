"""DDL / catalog-maintenance surface (SURVEY.md §2.11) + federated
scan and engine-to-engine copy (§2.1 S3, S7, S8).

The reference's CREATE TABLE / DROP / ANALYZE / FDW / cross-engine
copy, as thin Spark-catalog wrappers:

- external tables (S7): `CREATE TABLE ... USING parquet LOCATION` —
  the Spark analog of the pg_clickhouse FOREIGN TABLE registration
  (init.sql:27-70): the data stays where it is, the catalog gets a
  typed relation.
- typed copy (S8): read → cast projection → write to a new table —
  the CH→CSV→Cedar / FDW→heap pipelines (README.md:250-333).
- staging fetch (S3): redirect-following fetch of a remote CSV to a
  local staging path (url() table function, README.md:176-178) —
  Spark's file readers are DFS-based, so remote HTTP sources stage
  first. Gated: no network in CI, tested via file:// URLs.
- ANALYZE (stats → CBO; README.md:353,367).
- dynamic partition DDL templating (F15; preparedataset.sql:98-105).
"""

from __future__ import annotations

import urllib.request

from pyspark.sql import DataFrame, SparkSession


def create_external_table(
    spark: SparkSession, name: str, location: str, partitioned: bool = False
) -> None:
    """S7: register an external parquet table at `location`. Schema
    AND partition columns are inferred from the Hive-style layout
    (Spark forbids PARTITIONED BY without an explicit column list);
    partitioned tables get an MSCK REPAIR to load the partitions
    into the catalog."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{location}'")
    if partitioned:
        spark.sql(f"MSCK REPAIR TABLE {name}")


def drop_table_if_exists(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def analyze_table(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """ANALYZE → table/column stats for the CBO (§2.11; with
    spark.sql.cbo.enabled these feed join reordering and the
    broadcast threshold decision)."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")


def table_row_count_stat(spark: SparkSession, name: str) -> int | None:
    """Row count as recorded in catalog stats (None if not analyzed)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row.col_name == "Statistics":
            for tok in row.data_type.split(","):
                tok = tok.strip()
                if tok.endswith("rows"):
                    return int(tok.split()[0])
    return None


def copy_table_typed(
    spark: SparkSession,
    source: DataFrame,
    target_name: str,
    target_path: str,
    casts: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S8: engine-to-engine copy with a typed projection (the lab's
    CH→Cedar CSV pipe and FDW→heap INSERT...SELECT with casts,
    README.md:250-333) — here: select-with-casts → external parquet
    table registration."""
    df = source
    if casts:
        df = df.selectExpr(
            *[
                f"CAST({c} AS {t}) AS {c}" if c in casts else c
                for c, t in ((c, casts.get(c)) for c in df.columns)
            ]
        )
    df.write.mode(mode).option("path", target_path).saveAsTable(target_name)


def fetch_to_staging(url: str, staging_path: str, max_redirects: int = 10) -> str:
    """S3: redirect-following fetch of a remote source file to a
    local staging path (max_http_get_redirects=10, README.md:197).
    Supports http(s):// and file:// URLs; Spark then reads the staged
    file with the normal CSV/parquet readers."""
    redirect = urllib.request.HTTPRedirectHandler()
    redirect.max_redirections = max_redirects
    opener = urllib.request.build_opener(redirect)
    with opener.open(url) as resp, open(staging_path, "wb") as out:
        while chunk := resp.read(1 << 20):
            out.write(chunk)
    return staging_path


def monthly_partition_ddl(
    table: str, start_yyyymm: int, end_yyyymm: int
) -> list[str]:
    """F15: dynamic DDL templating — generate ADD PARTITION
    statements for a month range (the pg_partman loop,
    preparedataset.sql:98-105)."""
    out = []
    y, m = divmod(start_yyyymm, 100)
    while y * 100 + m <= end_yyyymm:
        out.append(f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION (month={y:04d}{m:02d})")
        m += 1
        if m > 12:
            y, m = y + 1, 1
    return out
