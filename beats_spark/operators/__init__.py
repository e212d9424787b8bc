"""Pipeline operators: field actions, processor-chain compiler,
enrichment joins, output selector/router, metrics, manifest,
dedup/similarity operators."""
