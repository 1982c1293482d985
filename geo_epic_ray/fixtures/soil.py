"""Synthetic SSURGO-like soil polygons with nested layer properties.

FIXTURES.md §2: rectangular map-unit polygons over the fixture extent
(the SQL-checkable configuration — mukey = row-major grid cell; the PIP
engine treats them as arbitrary WKB polygons), with 1-10 layers each whose
columns and physical ranges follow the reference SOL schema and validator
(geoEpic/io/inputs.py:77-82 column order, :104-153 ranges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.extent import LAT0, LON0, SOIL_CELL_DEG, SOIL_NCOLS, SOIL_NROWS
from ..geo.wkb import encode_polygon
from .rng import randint, uniform

LAYER_COLUMNS = [
    "Layer_depth", "Bulk_Density", "Wilting_capacity", "Field_Capacity",
    "Sand_content", "Silt_content", "N_concen", "pH", "Sum_Bases",
    "Organic_Carbon", "Calcium_Carbonate", "Cation_exchange",
    "Course_Fragment", "cnds", "pkrz", "rsd", "Bulk_density_dry", "psp",
    "Saturated_conductivity",
]

LAYERS_TYPE = pa.list_(pa.struct([(c, pa.float64()) for c in LAYER_COLUMNS]))

SOIL_SCHEMA = pa.schema(
    [
        ("mukey", pa.int64()),
        ("geometry", pa.binary()),
        ("albedo", pa.float64()),
        ("hydgrp", pa.string()),
        ("layers", LAYERS_TYPE),
    ]
)

# (lo, hi) physical range per layer column (reference validator ranges,
# geoEpic/io/inputs.py:104-153).
_RANGES = {
    "Bulk_Density": (0.5, 2.5), "Wilting_capacity": (0.01, 0.5),
    "Field_Capacity": (0.1, 0.9), "Sand_content": (1.0, 99.0),
    "Silt_content": (1.0, 99.0), "N_concen": (100.0, 5000.0),
    "pH": (3.0, 9.0), "Sum_Bases": (0.0, 150.0), "Organic_Carbon": (0.1, 10.0),
    "Calcium_Carbonate": (0.0, 99.0), "Cation_exchange": (0.0, 150.0),
    "Course_Fragment": (0.0, 99.0), "cnds": (0.0, 100.0), "pkrz": (0.0, 100.0),
    "rsd": (0.0, 100.0), "Bulk_density_dry": (0.0, 2.0), "psp": (0.0, 0.9),
    "Saturated_conductivity": (1e-5, 100.0),
}


def soil_polygons_table(seed: int = 42) -> pa.Table:
    """The full soil side table: SOIL_NROWS x SOIL_NCOLS rectangles."""
    mukeys = np.arange(SOIL_NROWS * SOIL_NCOLS, dtype=np.int64)
    rows, cols = mukeys // SOIL_NCOLS, mukeys % SOIL_NCOLS
    geoms = []
    for r, c in zip(rows, cols):
        x0 = LON0 + c * SOIL_CELL_DEG
        y0 = LAT0 + r * SOIL_CELL_DEG
        x1, y1 = x0 + SOIL_CELL_DEG, y0 + SOIL_CELL_DEG
        geoms.append(
            encode_polygon([np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])
        )
    albedo = uniform(mukeys, seed, 20)
    hydgrp = np.array(["A", "B", "C", "D"])[randint(mukeys, seed, 21, 0, 4)]

    n_layers = randint(mukeys, seed, 22, 1, 11)
    total = int(n_layers.sum())
    parent = np.repeat(mukeys, n_layers)
    ord_in = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(n_layers)[:-1]]), n_layers
    )
    lkey = parent * 37 + ord_in
    cols_data = {}
    # Layer_depth: increasing per mukey in [0.01, 10].
    step = uniform(lkey, seed, 23) * 0.9 + 0.1
    depth = np.empty(total)
    start = 0
    for i, nl in enumerate(n_layers):
        depth[start : start + nl] = 0.01 + np.cumsum(step[start : start + nl])
        start += nl
    cols_data["Layer_depth"] = np.round(depth, 3)
    for j, c in enumerate(LAYER_COLUMNS[1:]):
        lo, hi = _RANGES[c]
        cols_data[c] = lo + uniform(lkey, seed, 30 + j) * (hi - lo)

    layers = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(n_layers)]).astype(np.int32)),
        pa.StructArray.from_arrays(
            [pa.array(cols_data[c], pa.float64()) for c in LAYER_COLUMNS],
            names=LAYER_COLUMNS,
        ),
    )
    return pa.Table.from_arrays(
        [
            pa.array(mukeys),
            pa.array(geoms, pa.binary()),
            pa.array(albedo),
            pa.array(hydgrp, pa.string()),
            layers.cast(LAYERS_TYPE),
        ],
        schema=SOIL_SCHEMA,
    )
