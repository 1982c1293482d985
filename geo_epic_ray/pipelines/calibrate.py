"""Calibration loops — the reference's PyGMO parameter-fitting flow
(geoEpic/core/calibration.py:28-62 PygmoProblem.fitness; SURVEY.md §2.10
@objective) without PyGMO.

Two optimizers over the same fleet-objective shape:

- ``calibrate_heat_scale`` — local Nelder-Mead (stages/profile_ops.py),
  one fleet run per fitness call, exactly the reference's
  evaluate-then-step driver loop.
- ``calibrate_heat_scale_de`` — population-based differential evolution
  (DE/rand/1/bin, Storn & Price '97 — the same generational family the
  reference hands to PyGMO). The Ray-first restatement: a PyGMO
  generation costs N independent model runs; here the WHOLE population
  is evaluated in ONE fleet pass (`evaluate_scale_population`) — each
  batch computes the yield surface for every candidate vectorized and
  emits per-candidate partial sums, so generation cost is one Dataset
  execution regardless of population size. All randomness is stateless
  splitmix64 (fixtures/rng), so runs are bit-reproducible.

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

from ..fixtures.rng import uniform as _sm_uniform
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


@ray.remote
def _pop_eval_block(tbl, soil: pd.DataFrame, clim: pd.DataFrame,
                    scales: np.ndarray) -> tuple[np.ndarray, int]:
    """One block's per-candidate partial yield sums: the pseudo-yield is
    computed for EVERY candidate heat scale at once (outer product over
    the population — the per-row soil/heat lookups amortize across the
    pop). Partial sums are INTEGER ten-thousandths: yields are exact
    4-decimal values, so integer addition makes the population means
    independent of block boundaries / merge order — a DE selection
    (t_obj < obj) can never flip between runs."""
    mukey = tbl.column("mukey").to_numpy(zero_copy_only=False)
    gid = tbl.column("grid_id").to_numpy(zero_copy_only=False)
    order = np.argsort(soil["mukey"].to_numpy())
    sq = SimStage._lookup(
        soil["mukey"].to_numpy()[order], soil["soil_quality"].to_numpy()[order],
        mukey,
    )
    order = np.argsort(clim["grid_id"].to_numpy())
    hu = SimStage._lookup(
        clim["grid_id"].to_numpy()[order], clim["heat_units"].to_numpy()[order],
        gid,
    )
    ok = ~(np.isnan(sq) | np.isnan(hu))
    base = 2.0 + 6.0 * sq[ok]
    jitter = ((mukey[ok] * 31 + gid[ok] * 17) % 97) / 970.0
    heat = 1.0 - np.exp(
        -np.outer(np.maximum(np.asarray(scales, np.float64), 0.0), hu[ok])
        / 2000.0
    )
    y = np.round(base[None, :] * heat + jitter[None, :], 4)
    return np.rint(y * 10000.0).sum(axis=1).astype(np.int64), int(ok.sum())


def evaluate_scale_population(
    keys: rd.Dataset, soil_ref, climate_ref, scales: np.ndarray,
    *, refs: list | None = None,
) -> np.ndarray:
    """Mean fleet yield per candidate scale, as ONE wave of plain Ray
    tasks over the pinned key blocks (the same raw-task escape hatch as
    the Lloyd iterations in stages/cluster: a Dataset execution + actor
    pool per generation pays multi-second fixed overhead every pass,
    while a task wave costs milliseconds). Driver merge is bounded:
    npop ints per block. Pass ``refs`` (``keys.to_arrow_refs()``) when
    looping to skip the per-call ref fetch."""
    if refs is None:
        refs = keys.to_arrow_refs()
    parts = ray.get(
        [_pop_eval_block.remote(r, soil_ref, climate_ref, scales) for r in refs]
    )
    s = np.sum([p[0] for p in parts], axis=0)
    n = max(1, sum(p[1] for p in parts))
    return (s / 10000.0) / n


def calibrate_heat_scale_de(
    enriched: rd.Dataset,
    target_mean_yield: float,
    *,
    bounds: tuple[float, float] = (0.1, 2.0),
    npop: int = 8,
    generations: int = 10,
    f_weight: float = 0.6,
    seed: int = 7,
) -> dict:
    """DE/rand/1 over the heat-scale parameter (1-D, so binomial
    crossover's forced j_rand always takes the mutant). Deterministic:
    every draw is splitmix64 of (seed, stream, index). Returns the best
    member, its objective, and the fleet-pass count (= generations + 1,
    the population-batched win over npop x generations single runs)."""
    lo, hi = bounds
    soil_ref = ray.put(soil_quality_table())
    climate_ref = ray.put(heat_units_table())
    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    refs = keys.to_arrow_refs()  # pinned once; every generation is a wave

    idx = np.arange(npop, dtype=np.int64)
    pop = lo + _sm_uniform(idx, seed, 100) * (hi - lo)
    means = evaluate_scale_population(
        keys, soil_ref, climate_ref, pop, refs=refs
    )
    obj = (means - target_mean_yield) ** 2
    passes = 1

    for g in range(generations):
        # three distinct partners per member: rank others by a per-(gen,
        # member) splitmix key, take the first three
        u = _sm_uniform(
            (g * npop + idx)[:, None] * npop + idx[None, :], seed, 200
        )
        u[idx, idx] = 2.0  # self always sorts last
        partners = np.argsort(u, axis=1)[:, :3]
        r1, r2, r3 = partners[:, 0], partners[:, 1], partners[:, 2]
        trial = np.clip(pop[r1] + f_weight * (pop[r2] - pop[r3]), lo, hi)
        t_means = evaluate_scale_population(
            keys, soil_ref, climate_ref, trial, refs=refs
        )
        t_obj = (t_means - target_mean_yield) ** 2
        passes += 1
        better = t_obj < obj
        pop = np.where(better, trial, pop)
        obj = np.where(better, t_obj, obj)

    b = int(np.argmin(obj))
    return {
        "heat_scale": float(pop[b]),
        "objective": float(obj[b]),
        "fleet_passes": passes,
        "candidates_evaluated": passes * npop,
        "population": pop.tolist(),
    }
