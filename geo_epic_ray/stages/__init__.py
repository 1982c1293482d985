"""Batch transforms (stateless fns) and actor-pool stages (stateful classes)
for ``Dataset.map_batches`` — all Arrow in / Arrow out."""
