"""Calibration loop — the reference's PyGMO parameter-fitting flow
(geoEpic/core/calibration.py:28-59; SURVEY.md §2.10 @objective) without
PyGMO: each fitness evaluation is one fleet run over the Dataset
pipeline; the optimizer itself (Nelder-Mead, stages/profile_ops.py) stays
in the driver exactly as the reference's does.

The calibrated parameter here scales the simulation's heat response
(stand-in for the reference's CROPCOM/ieParm vectors, io/parmio.py);
the structure — parameters -> broadcast -> fleet -> objective scalar ->
optimizer step — is the real engineering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..stages.profile_ops import nelder_mead
from .simulate import SimStage, heat_units_table, soil_quality_table


def calibrate_heat_scale(
    enriched: rd.Dataset,
    target_mean_yield: float,
    *,
    x0: float = 1.0,
    max_iter: int = 25,
) -> dict:
    """Fit a scalar multiplier on seasonal heat units so the fleet's mean
    yield matches ``target_mean_yield``. Returns the fitted parameter, the
    achieved objective, and the number of fleet evaluations."""
    soil = soil_quality_table()
    base_heat = heat_units_table()
    # materialize the (small) enriched keys once; each evaluation re-runs
    # only the simulation stage, exactly like the reference re-runs the
    # fleet per fitness call (calibration.py:59)
    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    evals = {"n": 0}

    def objective(params: np.ndarray) -> float:
        scale = float(params[0])
        heat = base_heat.copy()
        heat["heat_units"] = heat.heat_units * max(scale, 0.0)
        soil_ref = ray.put(soil)
        heat_ref = ray.put(heat)
        sim = keys.map_batches(
            SimStage, batch_format="pyarrow", batch_size=8192, concurrency=2,
            fn_constructor_args=(soil_ref, heat_ref),
        )
        df = sim.to_pandas()
        evals["n"] += 1
        mean_yield = df.loc[df.sim_error == "", "yield"].mean()
        return float((mean_yield - target_mean_yield) ** 2)

    best = nelder_mead(objective, np.array([x0]), steps=np.array([0.3]),
                       max_iter=max_iter, tol=1e-10)
    return {
        "heat_scale": float(best[0]),
        "objective": objective(best),
        "fleet_evaluations": evals["n"],
    }
