"""End-to-end pipelines: KG change-history extraction, analysis aggregates."""
