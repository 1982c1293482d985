"""Workspace-prepare pipeline (§3.2) and the calibration loop (§2.10)."""

import numpy as np
import pandas as pd
import pytest


def test_prepare_sites_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from geo_epic_ray.geo import extent
    from geo_epic_ray.pipelines.prepare import prepare_sites, write_sit_files
    from geo_epic_ray.sources.fixed_width import parse_sit

    ids = np.arange(500, dtype=np.int64)
    lat, lon = extent.doc_point(ids)
    sites = rd.from_pandas(
        pd.DataFrame({"site_id": ids, "doc_id": ids, "lat": lat, "lon": lon})
    )
    # note: prepare derives its own lat/lon from doc_id via the enrich fn
    out = prepare_sites(sites).to_pandas()
    assert set(["mukey", "grid_id", "tile_id", "elevation", "slope_steep"]) <= set(out.columns)
    np.testing.assert_array_equal(
        out.sort_values("site_id").mukey.to_numpy(), extent.soil_mukey_of(lat, lon)
    )
    assert out.elevation.between(200, 700).all()
    assert out.slope_steep.between(0, 1).all()

    report = write_sit_files(
        rd.from_pandas(out.head(20)), str(tmp_path / "sites")
    ).to_pandas()
    assert len(report) == 20
    back = parse_sit(open(report.sit_path.iloc[0]).read())
    assert float(back["ID"]) == report.site_id.iloc[0]
    # M3 idempotent skip: second write leaves files in place
    report2 = write_sit_files(
        rd.from_pandas(out.head(20)), str(tmp_path / "sites")
    ).to_pandas()
    assert len(report2) == 20


def test_calibration_converges(ray_session):
    from geo_epic_ray.pipelines.calibrate import calibrate_heat_scale
    from geo_epic_ray.pipelines.flagship import flagship_enrich, synthetic_documents

    enriched = flagship_enrich(synthetic_documents(2000), concurrency=2)
    # target: the yield the fleet produces at heat_scale ~0.5 — the
    # optimizer must rediscover a scale achieving it
    from geo_epic_ray.pipelines.calibrate import (SimStage, heat_units_table,
                                                  soil_quality_table)
    import ray

    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    heat = heat_units_table()
    heat["heat_units"] = heat.heat_units * 0.5
    sim = keys.map_batches(
        SimStage, batch_format="pyarrow", batch_size=8192, concurrency=2,
        fn_constructor_args=(ray.put(soil_quality_table()), ray.put(heat)),
    ).to_pandas()
    target = sim.loc[sim.sim_error == "", "yield"].mean()

    result = calibrate_heat_scale(enriched, target, x0=1.0, max_iter=20)
    assert result["objective"] < 1e-4
    assert result["fleet_evaluations"] >= 5
    assert 0.2 < result["heat_scale"] < 1.2


def test_calibration_de_converges_and_is_deterministic(ray_session):
    import ray

    from geo_epic_ray.pipelines.calibrate import (
        calibrate_heat_scale_de, evaluate_scale_population, heat_units_table,
        soil_quality_table)
    from geo_epic_ray.pipelines.flagship import (flagship_enrich,
                                                 synthetic_documents)

    enriched = flagship_enrich(synthetic_documents(2000), concurrency=2)
    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    soil_ref = ray.put(soil_quality_table())
    climate_ref = ray.put(heat_units_table())
    # target: the fleet's mean yield at heat scale 0.5; DE must rediscover
    # a scale achieving it from a splitmix-seeded population
    target = float(
        evaluate_scale_population(keys, soil_ref, climate_ref,
                                  np.array([0.5]))[0]
    )
    res = calibrate_heat_scale_de(keys, target, npop=6, generations=8, seed=7)
    assert res["objective"] < 1e-4
    assert 0.1 <= res["heat_scale"] <= 2.0
    # one fleet pass per generation + the init pass — the population win
    assert res["fleet_passes"] == 9
    assert res["candidates_evaluated"] == 54
    # integer partial sums make the whole trajectory batch-independent:
    # a second run must be bit-identical
    res2 = calibrate_heat_scale_de(keys, target, npop=6, generations=8, seed=7)
    assert res2["heat_scale"] == res["heat_scale"]
    assert res2["population"] == res["population"]


def test_population_eval_matches_single_runs(ray_session):
    import ray

    from geo_epic_ray.pipelines.calibrate import (evaluate_scale_population,
                                                  heat_units_table,
                                                  soil_quality_table)
    from geo_epic_ray.pipelines.flagship import (flagship_enrich,
                                                 synthetic_documents)
    from geo_epic_ray.pipelines.simulate import SimStage

    enriched = flagship_enrich(synthetic_documents(1500), concurrency=2)
    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    soil_ref = ray.put(soil_quality_table())
    climate_ref = ray.put(heat_units_table())
    scales = np.array([0.4, 1.0, 1.7])
    batched = evaluate_scale_population(keys, soil_ref, climate_ref, scales)
    # reference shape: one fleet per candidate (scaled heat table)
    for s, got in zip(scales, batched):
        heat = heat_units_table()
        heat["heat_units"] = heat.heat_units * s
        sim = keys.map_batches(
            SimStage, batch_format="pyarrow", batch_size=8192, concurrency=2,
            fn_constructor_args=(soil_ref, ray.put(heat)),
        ).to_pandas()
        single = sim.loc[sim.sim_error == "", "yield"].mean()
        assert abs(single - got) < 1e-9, (s, single, got)
