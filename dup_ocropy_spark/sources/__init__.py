"""Sources & sinks: deterministic transcript synthesis, parquet/Iceberg IO."""
