"""Deterministic synthetic fixtures (FIXTURES.md): pure functions of
(seed, n) — hash-based, order-independent, so they can be generated
batch-parallel inside Ray Data without any shared RNG state."""
