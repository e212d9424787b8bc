"""Input sources: parquet/Iceberg table scans, synthetic generator,
transcript derivations from raw event tables."""
