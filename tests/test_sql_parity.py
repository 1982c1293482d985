"""Property tests: the numpy point derivation and the DuckDB oracle
expressions evaluate bit-identically (the foundation of the geo gate)."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_epic_ray.geo import extent
from geo_epic_ray.geo.extent import doc_point, doc_point_sql


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=200))
def test_doc_point_bit_parity_numpy_vs_duckdb(ids):
    ids = np.array(ids, dtype=np.int64)
    lat_np, lon_np = doc_point(ids)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    lat_sql, lon_sql = doc_point_sql("doc_id")
    out = con.execute(f"SELECT {lat_sql} AS lat, {lon_sql} AS lon FROM t").df()
    # bit-exact equality, not approximate
    assert (out.lat.to_numpy() == lat_np).all()
    assert (out.lon.to_numpy() == lon_np).all()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=100))
def test_mukey_tile_bit_parity(ids):
    from geo_epic_ray.pipelines.queries import _MUKEY_SQL, _TILE_SQL

    ids = np.array(ids, dtype=np.int64)
    lat, lon = doc_point(ids)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids}))
    out = con.execute(
        f"SELECT {_MUKEY_SQL} AS mukey, {_TILE_SQL} AS tile_id FROM documents"
    ).df()
    np.testing.assert_array_equal(out.mukey.to_numpy(), extent.soil_mukey_of(lat, lon))
    np.testing.assert_array_equal(out.tile_id.to_numpy(), extent.tile_of(lat, lon))
