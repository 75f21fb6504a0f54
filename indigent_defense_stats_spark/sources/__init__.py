"""Table sources/sinks: snapshot-versioned parquet catalog, registry readers."""
