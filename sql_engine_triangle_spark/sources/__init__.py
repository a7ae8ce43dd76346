"""Sources & sinks (SURVEY.md §2.1): typed CSV ingestion with
error tolerance, partitioned parquet writes, literal VALUES frames,
and catalog/size introspection."""
