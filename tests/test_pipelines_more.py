"""Weather materialization pipeline, bucket join, similarity oracles,
select DSL units, unit conversions."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.stages.climate import ssurgo_unit_convert


def test_weather_pipeline_end_to_end(ray_session, tmp_path):
    from geo_epic_ray.fixtures.weather import weather_daily_table
    from geo_epic_ray.pipelines.weather import (monthly_inp, synthesize_daily,
                                                write_dly_files)
    from geo_epic_ray.sources.fixed_width import parse_dly
    from geo_epic_ray.stages.climate import monthly_climate_stats

    gids = np.array([0, 3, 7, 11])
    daily = synthesize_daily(gids, years=(2019, 2020))
    assert daily.count() == 4 * 731

    inp = monthly_inp(daily).to_pandas()
    assert len(inp) == 4 * 12
    # matches the pandas oracle for one cell
    oracle = monthly_climate_stats(
        weather_daily_table(np.array([3]), years=(2019, 2020)).to_pandas()
    )
    got = inp[inp.grid_id == 3].sort_values("month").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.drop(columns=["grid_id"]), oracle, check_dtype=False
    )

    report = write_dly_files(daily, str(tmp_path)).to_pandas()
    assert len(report) == 4 and report.rows.sum() == 4 * 731
    back = parse_dly((tmp_path / "3.DLY").read_text())
    assert len(back) == 731


def test_bucket_join_matches_pandas(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.joins import bucket_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500), "a": np.arange(500)})
    right = pd.DataFrame({"k": rng.integers(0, 50, 300), "b": np.arange(300) * 2})
    got = (
        bucket_join(rd.from_pandas(left), rd.from_pandas(right), "k", n_buckets=8)
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    exp = left.merge(right, on="k").sort_values(["k", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "a", "b"]], exp, check_dtype=False)


def test_ann_topk_matches_numpy_bruteforce(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.similarity import ann_topk

    rng = np.random.default_rng(9)
    n, d = 400, 32
    mat = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    q = mat[:2].astype(np.float64)
    out = (
        ann_topk(rd.from_pandas(df), q, k=5, exclude_ids=np.array([0, 1]))
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(2):
        s = sims[:, qi].copy()
        s[qi] = -np.inf  # excluded
        exp = np.lexsort((np.arange(n), -s))[:5]
        got = out[out.query_id == qi].vec_id.to_numpy()
        np.testing.assert_array_equal(got, exp)


def test_ivf_recall_reasonable(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.similarity import ann_topk, ivf_topk, train_ivf_centroids

    rng = np.random.default_rng(2)
    n, d = 600, 16
    mat = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    q = mat[:3]
    cents = train_ivf_centroids(mat, n_centroids=8)
    ds = rd.from_pandas(df)
    exact = ann_topk(ds, q, k=10).to_pandas()
    approx = ivf_topk(ds, q, cents, k=10, nprobe=4).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / 10)
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 buckets


def test_ivf_partitioned_matches_probed_bruteforce(ray_session):
    """The centroid-partitioned IVF must return EXACTLY the brute-force
    top-k restricted to vectors whose nearest centroid is probed (the
    only approximation is the cell pruning), and full recall on planted
    twins that share the query's cell."""
    import ray.data as rd

    from geo_epic_ray.stages.similarity import (
        _normalize,
        ann_topk,
        ivf_topk_partitioned,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(4)
    n, d, k, nprobe = 500, 16, 10, 3
    mat = rng.normal(size=(n, d))
    # plant 6 twins of vector 0 (same cell, cosine ~0.999)
    twins = mat[0][None, :] + 0.02 * rng.normal(size=(6, d))
    allm = np.vstack([mat, twins])
    ids = np.arange(len(allm))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(allm)})
    ds = rd.from_pandas(df).repartition(4)
    cents = train_ivf_centroids(allm, n_centroids=8)
    q = allm[:2]
    got = ivf_topk_partitioned(ds, q, cents, k=k, nprobe=nprobe)

    cn = _normalize(cents)
    mn = _normalize(allm)
    qn = _normalize(q)
    assign = np.argmax(mn @ cn.T, axis=1)
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    for qi in range(2):
        in_cells = np.isin(assign, probe[qi])
        s = (mn @ qn[qi])
        s[~in_cells] = -np.inf
        exp = np.lexsort((ids, -s))[:k]
        sub = got[got.query_id == qi].sort_values("rank")
        np.testing.assert_array_equal(sub.vec_id.to_numpy(), exp)
    # the planted twins dominate query 0's exact top-k and share its cell
    exact = ann_topk(ds, q[:1], k=k).to_pandas()
    e0 = set(exact[exact.query_id == 0].vec_id)
    g0 = set(got[got.query_id == 0].vec_id)
    assert len(e0 & g0) / k >= 0.9


def test_select_dsl_units(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.select_dsl import sample_mask, select

    df = pd.DataFrame({"id": np.arange(100), "v": np.arange(100) % 10})
    ds = rd.from_pandas(df)
    # Range slice is positional on id order
    out = select(ds, "Range(0.1, 0.3)", "id").to_pandas()
    assert list(out.id) == list(range(10, 30))
    # AND chain
    out = select(ds, "Range(0.0, 0.5); v > 7", "id").to_pandas()
    assert all(out.v > 7) and all(out.id < 50)
    # deterministic Random
    out = select(ds, "Random(0.2)", "id").to_pandas()
    assert set(out.id) == set(np.arange(100)[sample_mask(np.arange(100), 0.2)])
    # union keeps each id once
    out = select(ds, "v > 8 + v < 1", "id").to_pandas()
    assert len(out) == len(set(out.id)) == 20


def test_ssurgo_unit_convert():
    df = pd.DataFrame(
        {
            "hzdepb_r": [150.0], "wfifteenbar_r": [15.0], "om_r": [2.0],
            "ksat_r": [10.0], "albedodry_r": [0.32], "sieveno10_r": [85.0],
            "hydgrp": [None],
        }
    )
    out = ssurgo_unit_convert(df)
    assert out.hzdepb_r.iloc[0] == pytest.approx(1.5)
    assert out.om_r.iloc[0] == pytest.approx(1.16)
    assert out.ksat_r.iloc[0] == pytest.approx(36.0)
    assert out.albedodry_r.iloc[0] == pytest.approx(0.2)
    assert out.course_fragment.iloc[0] == pytest.approx(15.0)
    assert out.hydgrp.iloc[0] == 3  # 'C' default


def test_merge_windspeed_fill(ray_session):
    import ray.data as rd

    from geo_epic_ray.fixtures.weather import weather_daily_table
    from geo_epic_ray.pipelines.weather import merge_windspeed

    daily = weather_daily_table(np.array([0]), years=(2019,)).to_pandas()
    ws = pd.DataFrame({
        "date": pd.to_datetime(daily["date"].iloc[:100]),
        "ws": np.linspace(1, 5, 100),
    })
    out = merge_windspeed(rd.from_pandas(daily), ws).to_pandas().sort_values("date")
    np.testing.assert_allclose(out.ws.iloc[:100], np.linspace(1, 5, 100))
    assert (out.ws.iloc[100:] == 3.5).all()  # unmatched dates -> 3.5 fill


def test_run_info_reader_required_columns(ray_session, tmp_path):
    import pytest as _pytest

    from geo_epic_ray.sources.run_info import filter_opc_present, read_run_info

    good = tmp_path / "info.csv"
    good.write_text(
        "SiteID,soil,opc,dly,lat,lon,extra\n"
        "1,382056,rot-a,234132,38.45,-97.27,x\n"
        "2,382057,rot-b,234133,38.50,-97.30,y\n"
        "3,382058,rot-missing,234134,38.55,-97.33,z\n"
    )
    ds = read_run_info(str(good))
    assert ds.count() == 3
    kept = filter_opc_present(ds, {"rot-a", "rot-b"}).to_pandas()
    assert sorted(kept.SiteID) == [1, 2]  # M2 drops the missing-OPC site

    bad = tmp_path / "bad.csv"
    bad.write_text("SiteID,lat,lon\n1,38.0,-97.0\n")
    with _pytest.raises(ValueError, match="missing required columns"):
        read_run_info(str(bad))


def test_select_dsl_union_fused_equals_fallback(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.select_dsl import select

    df = pd.DataFrame({"id": np.arange(200), "v": np.arange(200) % 17})
    ds = rd.from_pandas(df).repartition(4)
    # maskable branches -> fused single-scan path
    fused = select(ds, "Random(0.25); v > 3 + v < 2", "id").to_pandas()
    # Range forces the union+dedup fallback; same final membership
    fb = select(ds, "Range(0.0, 1.0); Random(0.25); v > 3 + v < 2", "id").to_pandas()
    assert set(fused.id) == set(fb.id)
    assert len(fused) == len(set(fused.id))
    # Range inside a '+' still routes through the fallback correctly
    out = select(ds, "Range(0.0, 0.1) + v > 15", "id").to_pandas()
    expect = set(range(20)) | set(np.arange(200)[(np.arange(200) % 17) > 15])
    assert set(out.id) == expect
