"""Spatial stages: point derivation, cell encoding, PIP + kNN + tile joins.

The engine's restatement of the reference's three core geospatial joins
(SURVEY.md §2.4 J1-J3):

- J1 site→soil:   PIP against polygon shards   (ref geoEpic/soil/utils.py:5-12)
- J2 site→weather: haversine kNN snap          (ref geoEpic/weather/main.py:18-26)
- J3 site→tile:    inverse-affine tile assign  (ref geoEpic/utils/raster_utils.py:111-144)

Stateless maps are plain functions; the joins are callable CLASSES for
``map_batches(Cls, concurrency=N)`` actor pools — index built once per
actor in ``__init__`` from a broadcast side table, probed per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.documents import doc_num_of, doc_point_skewed
from ..geo import extent
from ..geo.cells import cell_of, parent_cell
from ..geo.knn import KnnIndex
from ..geo.pip import PolygonIndex
from ..geo.wkb import decode_polygon
from ..state.broadcast import get


def doc_nums(batch: pa.Table) -> np.ndarray:
    """int64 doc index from either an int64 doc_id or a 'doc-%010d' string.

    String parse is arrow-native (utf8 slice + cast) — ~20x faster than
    numpy.char on large batches.
    """
    col = batch["doc_id"]
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    import pyarrow.compute as pc

    digits = pc.utf8_slice_codeunits(col, 4, 32)  # strip the "doc-" prefix
    return pc.cast(digits, pa.int64()).to_numpy(zero_copy_only=False)


def derive_points(batch: pa.Table, *, skew: bool = False, seed: int = 42) -> pa.Table:
    """Deterministic (lat, lon) per doc (geo.extent.doc_point); ``skew``
    applies the hot-cell remap for salting tests/benches."""
    ids = doc_nums(batch)
    if skew:
        lat, lon = doc_point_skewed(ids, seed)
    else:
        lat, lon = extent.doc_point(ids)
    return batch.append_column("lat", pa.array(lat)).append_column("lon", pa.array(lon))


def encode_cells(batch: pa.Table, *, res: int = 10, prefix_res: int = 3) -> pa.Table:
    """Morton cell at ``res`` + its ancestor at ``prefix_res`` (the
    partitioning key — H3/S2-parent-style prefix)."""
    lat = batch["lat"].to_numpy()
    lon = batch["lon"].to_numpy()
    c = cell_of(lat, lon, res)
    return batch.append_column("cell", pa.array(c)).append_column(
        "cell_prefix", pa.array(parent_cell(c, res, prefix_res))
    )


def assign_tiles(batch: pa.Table) -> pa.Table:
    """tile_id per doc (inverse affine + floor, clip-to-bounds)."""
    t = extent.tile_of(batch["lat"].to_numpy(), batch["lon"].to_numpy())
    return batch.append_column("tile_id", pa.array(t))


class PipJoin:
    """Actor-pool stage: point-in-polygon against the broadcast soil table.

    ``soil_ref`` is a ray.ObjectRef of the polygon Arrow table (or the table
    itself in unit tests). Index built once per actor.
    """

    def __init__(self, soil_ref, res: int = 8):
        soil = get(soil_ref)
        self.index = PolygonIndex(
            soil["mukey"].to_numpy(),
            [decode_polygon(g) for g in soil["geometry"].to_pylist()],
            res=res,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        mukey = self.index.lookup(batch["lat"].to_numpy(), batch["lon"].to_numpy())
        return batch.append_column("mukey", pa.array(mukey))


class KnnJoin:
    """Actor-pool stage: nearest weather grid point (haversine, k=1,
    lowest-id ties)."""

    def __init__(self, grid_ref, res: int = 8):
        from ..geo.knn import build_knn_index

        g = get(grid_ref)
        # factory: analytic LatticeKnn for dense regular grids (no
        # per-worker candidate-cache warmup), generic KnnIndex otherwise
        self.index = build_knn_index(
            g["grid_id"].to_numpy(), g["lat"].to_numpy(), g["lon"].to_numpy(), res=res
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        gid, dist = self.index.query(batch["lat"].to_numpy(), batch["lon"].to_numpy())
        return batch.append_column("grid_id", pa.array(gid)).append_column(
            "grid_dist_km", pa.array(dist)
        )


class SpatialEnrich:
    """Fused actor stage: PIP + kNN + tile in one pass over each batch —
    one actor pool instead of three, one Arrow copy instead of three."""

    def __init__(self, soil_ref, grid_ref, pip_res: int = 8, knn_res: int = 8):
        self.pip = PipJoin(soil_ref, pip_res)
        self.knn = KnnJoin(grid_ref, knn_res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        mukey = self.pip.index.lookup(lat, lon)
        gid, dist = self.knn.index.query(lat, lon)
        tile = extent.tile_of(lat, lon)
        return (
            batch.append_column("mukey", pa.array(mukey))
            .append_column("grid_id", pa.array(gid))
            .append_column("grid_dist_km", pa.array(dist))
            .append_column("tile_id", pa.array(tile))
        )


def spatial_enrich_fn(
    batch: pa.Table, *, soil_ref, grid_ref, pip_res: int = 8, knn_res: int = 8
) -> pa.Table:
    """Stateless-task variant of :class:`SpatialEnrich` for
    ``map_batches(spatial_enrich_fn, fn_kwargs=...)``: the indexes are
    built once per worker PROCESS (state.worker_cache) instead of once per
    actor, so repeated executions reuse Ray's pre-started task workers —
    no per-execution actor-pool spin-up, and the scheduler can use every
    free CPU (see worker_cache module docstring for the trade-off)."""
    from ..state.worker_cache import get_or_build

    def _ref_key(r):
        return r.hex() if hasattr(r, "hex") else str(id(r))

    key = f"enrich:{_ref_key(soil_ref)}:{_ref_key(grid_ref)}:{pip_res}:{knn_res}"
    se = get_or_build(key, lambda: SpatialEnrich(soil_ref, grid_ref, pip_res, knn_res))
    return se(batch)
