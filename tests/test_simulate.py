"""Simulation fleet pipeline + quarantine semantics (SURVEY §3.1, §4)."""

import numpy as np
import pandas as pd
import pytest


def test_simulation_fleet_end_to_end(ray_session):
    from geo_epic_ray.pipelines.flagship import flagship_enrich, synthetic_documents
    from geo_epic_ray.pipelines.simulate import run_simulation_fleet

    docs = synthetic_documents(3000)
    enriched = flagship_enrich(docs, concurrency=2)
    ok, bad = run_simulation_fleet(enriched, concurrency=2, canary=True)
    okdf = ok.to_pandas()
    assert len(okdf) + bad.count() == 3000
    assert (okdf["yield"] > 0).all()
    assert okdf["yield"].nunique() > 100  # varies with soil/climate
    # deterministic: same inputs -> same yields
    ok2, _ = run_simulation_fleet(
        flagship_enrich(synthetic_documents(3000), concurrency=2),
        concurrency=2, canary=False,
    )
    a = okdf.sort_values("doc_id")["yield"].to_numpy()
    b = ok2.to_pandas().sort_values("doc_id")["yield"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_simulation_with_routines(ray_session):
    from geo_epic_ray.pipelines.flagship import flagship_enrich, synthetic_documents
    from geo_epic_ray.pipelines.registry import RoutineRegistry
    from geo_epic_ray.pipelines.simulate import run_simulation_fleet

    reg = RoutineRegistry()

    @reg.routine
    def yield_band(rec):
        return {"band": "high" if (rec["yield"] or 0) > 4 else "low"}

    enriched = flagship_enrich(synthetic_documents(500), concurrency=2)
    out, _ = run_simulation_fleet(
        enriched, concurrency=2, canary=False, routines=reg
    )
    df = out.to_pandas()
    assert set(df.routine) == {"yield_band"}
    assert set(df.band) <= {"high", "low"}


def test_quarantine_isolates_bad_rows(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.quarantine import split_quarantine, with_quarantine

    def brittle(b: pd.DataFrame) -> pd.DataFrame:
        if (b.v < 0).any():
            raise ValueError("negative value")
        return b.assign(out=np.sqrt(b.v))

    df = pd.DataFrame({"v": [1.0, 4.0, -9.0, 16.0, -25.0, 36.0]})
    ds = rd.from_pandas(df).map_batches(
        with_quarantine(brittle), batch_format="pandas"
    )
    ok, bad = split_quarantine(ds)
    okdf, baddf = ok.to_pandas(), bad.to_pandas()
    assert len(okdf) == 4 and len(baddf) == 2
    assert set(okdf.out) == {1.0, 2.0, 4.0, 6.0}
    assert baddf.error.str.contains("negative value").all()
