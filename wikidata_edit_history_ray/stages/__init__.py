"""Ray Data batch transforms: extraction, enrichment, dedup, text analysis,
similarity search."""
