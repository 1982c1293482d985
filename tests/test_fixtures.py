"""Fixture generators: determinism, schema, batch-order independence."""

import numpy as np
import pyarrow as pa

from geo_epic_ray.fixtures.documents import (DOCS_SCHEMA, doc_num_of,
                                             doc_point_skewed, documents_batch)
from geo_epic_ray.fixtures.schedules import (HARVEST_CODE, PLANT_CODES,
                                             schedules_table)
from geo_epic_ray.fixtures.soil import SOIL_SCHEMA, soil_polygons_table
from geo_epic_ray.fixtures.weather import (WEATHER_DAILY_SCHEMA,
                                           weather_daily_table,
                                           weather_grid_table)


def test_documents_deterministic_and_batch_independent():
    whole = documents_batch(np.arange(100, dtype=np.int64))
    parts = pa.concat_tables(
        [documents_batch(np.arange(0, 37)), documents_batch(np.arange(37, 100))]
    )
    assert whole.schema.equals(DOCS_SCHEMA)
    assert whole.equals(parts.combine_chunks())


def test_documents_span_invariants():
    t = documents_batch(np.arange(200, dtype=np.int64))
    for spans in t["spans"].to_pylist():
        assert 1 <= len(spans) <= 8
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] and not s["media_ref"]
            else:
                assert s["media_ref"].startswith("media://") and not s["text"]


def test_doc_point_skew_fraction():
    ids = np.arange(20000, dtype=np.int64)
    lat, lon = doc_point_skewed(ids, hot_frac=0.3)
    in_hot = ((np.abs(lat - 38.45) <= 0.05) & (np.abs(lon + 97.25) <= 0.05)) | (
        (np.abs(lat - 36.25) <= 0.05) & (np.abs(lon + 98.05) <= 0.05)
    )
    assert 0.25 < in_hot.mean() < 0.35


def test_soil_layers_ranges_and_monotone_depth():
    t = soil_polygons_table()
    assert t.schema.equals(SOIL_SCHEMA)
    for layers in t["layers"].to_pylist()[:50]:
        depths = [l["Layer_depth"] for l in layers]
        assert all(b > a for a, b in zip(depths, depths[1:]))
        for l in layers:
            assert 0.5 <= l["Bulk_Density"] <= 2.5
            assert 3.0 <= l["pH"] <= 9.0


def test_weather_daily_continuity_and_ranges():
    t = weather_daily_table(np.array([0, 5]), years=(2019, 2020))
    assert t.schema.equals(WEATHER_DAILY_SCHEMA)
    df = t.to_pandas()
    assert len(df) == 2 * (365 + 366)  # 2020 is a leap year
    per = df[df.grid_id == 0].sort_values("date")
    deltas = per["date"].diff().dropna().dt.days.unique()
    assert list(deltas) == [1]
    assert (per.tmax > per.tmin).all()
    assert ((per.prcp == 0).mean() > 0.6) and (per.prcp >= 0).all()


def test_schedules_valid_rotations():
    t = schedules_table(20).to_pandas()
    for _, rot in t.groupby("opc_id"):
        years = sorted(rot.Yid.unique())
        assert years == list(range(1, len(years) + 1))  # year-continuous
        for _, yr in rot.groupby("Yid"):
            codes = set(yr.CODE)
            assert codes & set(PLANT_CODES) and HARVEST_CODE in codes
            dates = (yr.Mn * 100 + yr.Dy).tolist()
            assert dates == sorted(dates)  # monotonic within year


def test_schedules_invalid_variants_flaggable():
    t = schedules_table(40, invalid_frac=0.5).to_pandas()
    missing_harvest = 0
    for _, rot in t.groupby("opc_id"):
        yr1 = rot[rot.Yid == 1]
        if HARVEST_CODE not in set(yr1.CODE):
            missing_harvest += 1
    assert missing_harvest > 0
