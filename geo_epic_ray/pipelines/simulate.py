"""The simulation fleet pipeline — Ray-Data restatement of
``geo_epic workspace run`` (SURVEY.md §3.1; reference
geoEpic/core/workspace.py:225-259 + core/model.py:144-236).

reference:  per-site process fan-out; each process copies the EPIC model
            dir, writes DLY/INP/DAT files, runs the Fortran binary under
            a 10s SIGALRM, harvests output files, then thread-pools the
            registered @logger routines.
engine:     enriched docs Dataset -> SimStage (actor-pool / cached-task
            stage holding the broadcast soil + monthly-climate side
            tables) -> per-doc outputs + routine hooks -> results
            Dataset. The EPIC Fortran binary does not exist here, so the
            per-doc compute is a deterministic stand-in (pseudo-yield
            from soil + climate + schedule features); everything around
            it — the expensive-init/per-batch-invoke pattern, per-row
            timeout semantics, error quarantine, canary-first execution —
            is the real engineering the reference's fleet needed.

Per-row timeout: the reference kills runaway simulations with SIGALRM
(utils/parallel.py:6-34). Inside long-lived workers SIGALRM is unsafe, so
the stage uses a cooperative deadline: the stand-in checks elapsed time
and rows that exceed ``timeout_s`` are quarantined, not retried —
matching the reference's skip-and-report behavior
(utils/parallel.py:76-89).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.broadcast import get


def pseudo_yield(
    mukey: np.ndarray,
    grid_id: np.ndarray,
    soil_quality: np.ndarray,
    seasonal_heat: np.ndarray,
) -> np.ndarray:
    """Deterministic stand-in for the EPIC crop model: yield rises with
    soil quality and saturates with accumulated heat units."""
    base = 2.0 + 6.0 * soil_quality
    heat = 1.0 - np.exp(-seasonal_heat / 2000.0)
    jitter = ((mukey * 31 + grid_id * 17) % 97) / 970.0
    return np.round(base * heat + jitter, 4)


class SimStage:
    """Actor/cached-task stage: broadcast side tables pinned in __init__,
    vectorized per-batch 'simulation'."""

    def __init__(self, soil_ref, climate_ref, timeout_s: float = 10.0):
        soil = get(soil_ref)  # pandas: mukey -> soil_quality
        order = np.argsort(soil["mukey"].to_numpy())
        self._soil_keys = soil["mukey"].to_numpy()[order]
        self._soil_vals = soil["soil_quality"].to_numpy()[order]
        clim = get(climate_ref)  # pandas: grid_id -> seasonal heat units
        order = np.argsort(clim["grid_id"].to_numpy())
        self._heat_keys = clim["grid_id"].to_numpy()[order]
        self._heat_vals = clim["heat_units"].to_numpy()[order]
        self.timeout_s = timeout_s

    @staticmethod
    def _lookup(keys: np.ndarray, vals: np.ndarray, q: np.ndarray) -> np.ndarray:
        pos = np.clip(np.searchsorted(keys, q), 0, keys.size - 1)
        out = vals[pos].astype(np.float64)
        out[keys[pos] != q] = np.nan
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        start = time.monotonic()
        mukey = batch["mukey"].to_numpy()
        gid = batch["grid_id"].to_numpy()
        sq = self._lookup(self._soil_keys, self._soil_vals, mukey)
        hu = self._lookup(self._heat_keys, self._heat_vals, gid)
        y = pseudo_yield(mukey, gid, sq, hu)
        # skip-and-report: rows with missing side data are quarantined via
        # an error column (never dropped silently); a cooperative deadline
        # quarantines the remainder of a runaway batch
        err = np.where(np.isnan(sq), "missing soil", np.where(np.isnan(hu), "missing climate", ""))
        if time.monotonic() - start > self.timeout_s:
            err = np.where(err == "", "timeout", err)
        y = np.where(err == "", y, np.nan)
        return batch.append_column("yield", pa.array(y)).append_column(
            "sim_error", pa.array(err.astype(str))
        )


def soil_quality_table() -> pd.DataFrame:
    """Per-mukey quality score from the fixture soil layers (mean organic
    carbon, normalized)."""
    from ..fixtures.soil import soil_polygons_table

    t = soil_polygons_table().to_pandas()
    oc = t["layers"].map(lambda ls: float(np.mean([l["Organic_Carbon"] for l in ls])))
    return pd.DataFrame({"mukey": t["mukey"], "soil_quality": (oc / 10.0).round(6)})


def heat_units_table(tbs: float = 5.0) -> pd.DataFrame:
    """Per-grid-cell seasonal heat units from the fixture daily weather
    (A6 semantics over Apr-Oct)."""
    from ..fixtures.weather import weather_daily_table

    # decimated: every 8th grid cell has weather; others fall back to the
    # nearest materialized cell id (cheap deterministic rule)
    from ..geo.extent import WEATHER_NCOLS, WEATHER_NROWS

    gids = np.arange(0, WEATHER_NROWS * WEATHER_NCOLS, dtype=np.int64)
    sample = gids[::8]
    w = weather_daily_table(sample, years=(2019,)).to_pandas()
    w = w[(w.month >= 4) & (w.month <= 10)]
    # accumulate in float64 (the fixture stores float32): per-day terms are
    # then bit-identical to a SQL replay's, and the seasonal sums agree to
    # ~1e-12 regardless of summation order — which round(yield, 4)
    # downstream absorbs with 8 orders of magnitude to spare
    hu = (
        ((w.tmax.astype(np.float64) + w.tmin.astype(np.float64)) / 2 - tbs)
        .clip(lower=0).groupby(w.grid_id).sum()
    )
    snapped = sample[np.clip(np.searchsorted(sample, gids), 0, sample.size - 1)]
    return pd.DataFrame(
        {"grid_id": gids, "heat_units": hu.reindex(snapped).to_numpy()}
    )


def run_simulation_fleet(
    enriched: rd.Dataset,
    *,
    concurrency: int | None = None,
    batch_size: int = 8192,
    canary: bool = True,
    routines=None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Full fleet: canary-first smoke (reference runs site 0 serially
    before the pool, workspace.py:246-247), then the actor-pool sim stage;
    returns (results, quarantined) — the reference's failed_indices
    pattern as a first-class output Dataset."""
    soil_ref = ray.put(soil_quality_table())
    climate_ref = ray.put(heat_units_table())

    if canary:
        smoke = enriched.limit(1).map_batches(
            SimStage, batch_format="pyarrow", batch_size=2, concurrency=1,
            fn_constructor_args=(soil_ref, climate_ref),
        )
        assert smoke.count() == 1  # canary: fail fast before the fleet

    kwargs = dict(
        batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(soil_ref, climate_ref),
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    else:
        from .flagship import default_concurrency

        kwargs["concurrency"] = default_concurrency()
    sim = enriched.map_batches(SimStage, **kwargs)
    if routines is not None:
        sim = routines.apply(sim)
        return sim, sim.limit(0)
    # Both outputs derive from `sim`; materialize it so consuming ok AND
    # bad executes the enrich+sim pipeline once, not once per consumer
    # (the split filters then read the shared materialized blocks).
    sim = sim.materialize()
    ok = sim.map_batches(
        lambda t: t.filter(pa.compute.equal(t["sim_error"], "")), batch_format="pyarrow"
    )
    bad = sim.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["sim_error"], "")), batch_format="pyarrow"
    )
    return ok, bad
