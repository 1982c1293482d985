"""Synthetic OPC-like operation schedules (FIXTURES.md §5).

Exploded long form of the reference OPC schema (geoEpic/io/opc.py:32-36):
one row per operation, keyed by ``opc_id``. Operation codes per the
reference class attributes (geoEpic/io/opc.py:11-15): plantation {2,3,4},
harvest 650, fertilizer 71. Generated rotations are valid (year-continuous,
monotonic dates, plant+harvest per crop year); ``invalid_frac`` emits
targeted broken variants for validator tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rng import randint, uniform

PLANT_CODES = (2, 3, 4)
HARVEST_CODE = 650
FERT_CODE = 71

SCHEDULES_SCHEMA = pa.schema(
    [
        ("opc_id", pa.string()),
        ("start_year", pa.int32()),
        ("Yid", pa.int32()),
        ("Mn", pa.int32()),
        ("Dy", pa.int32()),
        ("CODE", pa.int32()),
        ("TRAC", pa.int32()),
        ("CRP", pa.int32()),
        ("XMTU", pa.int32()),
    ]
    + [(f"OPV{i}", pa.float64()) for i in range(1, 9)]
)


def schedules_table(n_rotations: int = 50, seed: int = 42, invalid_frac: float = 0.0) -> pa.Table:
    rows: list[tuple] = []
    ridx = np.arange(n_rotations, dtype=np.int64)
    n_years = randint(ridx, seed, 60, 1, 4)
    for r in range(n_rotations):
        opc_id = f"rot-{r:05d}"
        start_year = 2018
        broken = invalid_frac > 0 and uniform(np.array([r]), seed, 61)[0] < invalid_frac
        for y in range(1, int(n_years[r]) + 1):
            k = np.array([r * 101 + y], dtype=np.int64)
            crop = int(randint(k, seed, 62, 1, 5)[0])
            plant_doy_m = int(randint(k, seed, 63, 4, 6)[0])  # Apr/May
            plant_day = int(randint(k, seed, 64, 1, 28)[0])
            fert_m = plant_doy_m + 1
            harv_m = int(randint(k, seed, 65, 9, 11)[0])  # Sep/Oct
            harv_day = int(randint(k, seed, 66, 1, 28)[0])
            rate = float(np.round(uniform(k, seed, 67)[0] * 150.0, 2))
            plant_code = PLANT_CODES[int(randint(k, seed, 68, 0, 3)[0])]
            ops = [
                (y, plant_doy_m, plant_day, plant_code, 1, crop, 0, rate),
                (y, fert_m, 10, FERT_CODE, 2, crop, 0, rate * 0.5),
                (y, harv_m, harv_day, HARVEST_CODE, 3, crop, 0, 0.0),
            ]
            if broken and y == 1:
                ops = ops[:-1]  # drop harvest -> pairing validator must flag
            for (yid, mn, dy, code, trac, crp, xmtu, opv1) in ops:
                rows.append(
                    (opc_id, start_year, yid, mn, dy, code, trac, crp, xmtu,
                     opv1, *[0.0] * 7)
                )
    cols = list(zip(*rows))
    arrays = [
        pa.array(list(cols[0]), pa.string()),
        *[pa.array(np.array(cols[i], dtype=np.int32)) for i in range(1, 9)],
        *[pa.array(np.array(cols[i], dtype=np.float64)) for i in range(9, 17)],
    ]
    return pa.Table.from_arrays(arrays, schema=SCHEDULES_SCHEMA)
