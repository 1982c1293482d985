"""End-to-end pipelines (flagship spatial join + the query registry)."""
