"""Driver contract for the Ray-Data-native spatial-join + tiling engine.

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``      — flagship pipeline (point derivation -> PIP soil join ->
                     kNN weather snap -> tile assignment) over
                     /root/testdata/sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline from
                     SURVEY.md §2 (geo joins, select DSL, broadcast joins,
                     grouped aggregates, dedup, text analysis, ...).
- ``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: enrich the sf0.001 documents with mukey/grid_id/tile_id."""
    from geo_epic_ray.pipelines.queries import geo_enrich_full

    return geo_enrich_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geo_epic_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geo_epic_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
