"""Sink preflight checks.

Restates the reference's disk-space preflight (geoEpic/utils/misc.py:137-162
``check_disk_space``: shutil.disk_usage vs an estimate plus a safety
margin, raise before any file is written) for the engine's partitioned
writers. The engine version works in bytes (the reference rounds to whole
GiB, which under-detects on small volumes) and derives the estimate from
the INPUT shards: committed shards are excluded, so a resumed run only
requires space for the work it will actually redo.
"""

from __future__ import annotations

import os
import shutil


class InsufficientDiskSpace(RuntimeError):
    pass


def check_disk_space(
    output_dir: str, est_bytes: int, safety_margin: float = 0.1
) -> None:
    """Raise :class:`InsufficientDiskSpace` unless ``output_dir``'s volume
    has ``est_bytes * (1 + safety_margin)`` free."""
    _, _, free = shutil.disk_usage(output_dir)
    required = int(est_bytes * (1 + safety_margin))
    if free < required:
        raise InsufficientDiskSpace(
            f"Insufficient disk space in '{output_dir}'. Estimated required:"
            f" {required} bytes (incl. {safety_margin:.0%} margin),"
            f" available: {free} bytes. Consider logging only required data."
        )


def estimate_write_bytes(
    input_files: list[str], expansion: float = 3.0
) -> int:
    """Pending-output estimate for a shard-per-input writer: sum of the
    input parquet sizes times an ``expansion`` factor (the enrichment adds
    lat/lon/cell/mukey/grid/tile columns; 3x is conservative for the
    flagship schema — parquet re-encodes the text payload at ~1x and the
    added numeric columns compress well)."""
    return int(sum(os.path.getsize(f) for f in input_files) * expansion)
