"""Vectorized splitmix64 — stateless per-element randomness.

Each value is a pure function of (seed, stream, index); no RNG object
state, so parallel batch generation is deterministic regardless of batch
boundaries or execution order.
"""

from __future__ import annotations

import numpy as np

_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + _GAMMA) * np.uint64(1)
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def hash_u64(index: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """64-bit hash of (seed, stream, index)."""
    mask = (1 << 64) - 1
    base = np.uint64((seed * 0x2545F4914F6CDD1D + stream * 0x9E3779B97F4A7C15) & mask)
    return splitmix64(index.astype(np.uint64) * np.uint64(0xD6E8FEB86659FD93) + base)


def uniform(index: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """U[0, 1) float64 per element."""
    return (hash_u64(index, seed, stream) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def randint(index: np.ndarray, seed: int, stream: int, lo: int, hi: int) -> np.ndarray:
    """Integer in [lo, hi) per element."""
    return lo + (hash_u64(index, seed, stream) % np.uint64(hi - lo)).astype(np.int64)
