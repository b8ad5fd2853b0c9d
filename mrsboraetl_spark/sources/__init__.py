"""Sources & sinks: parquet/JDBC readers with explicit schemas, watermark
store."""
