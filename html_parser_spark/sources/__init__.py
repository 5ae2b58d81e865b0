"""External source/sink connectors beyond parquet/Iceberg (WARC, …)."""
