"""Sources/sinks: parquet tables (Iceberg when its runtime jar is present —
same layout, format is a config switch; see io.py)."""
