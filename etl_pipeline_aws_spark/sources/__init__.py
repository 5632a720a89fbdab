"""Sources & sinks: NDJSON / Parquet / CSV readers, Parquet & NDJSON sinks."""
