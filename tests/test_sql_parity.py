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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 2**62), min_size=1, max_size=100),
    st.integers(0, 1000),
    st.integers(0, 100),
)
def test_hash_u64_cols_bit_parity(ids, seed, stream):
    """oracle_sql.hash_u64_cols == fixtures.rng.hash_u64 bit-for-bit."""
    from geo_epic_ray.fixtures.rng import hash_u64, randint, uniform
    from geo_epic_ray.pipelines import oracle_sql

    ids = np.array(ids, dtype=np.int64)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": ids}))
    frag, hcol = oracle_sql.hash_u64_cols("id", seed, stream, "p")
    out = con.execute(
        f"SELECT {frag}, {oracle_sql.uniform_expr(hcol)} AS u, "
        f"{oracle_sql.randint_expr(hcol, 3, 17)} AS r FROM t"
    ).df()
    assert (out[hcol].to_numpy().astype(np.uint64) == hash_u64(ids, seed, stream)).all()
    assert (out.u.to_numpy() == uniform(ids, seed, stream)).all()
    assert (out.r.to_numpy() == randint(ids, seed, stream, 3, 17)).all()


def test_winnow_sql_bit_parity():
    """oracle_sql.winnow_pairs_sql fingerprint selection == the numpy
    winnowing kernel, including the short-text (< k chars) branch."""
    from geo_epic_ray.pipelines import oracle_sql
    from geo_epic_ray.stages.text import winnow_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs of the lazy dog",
        "hi",            # < k: single unmixed shingle
        "",              # empty: hash 0
        "abcd efgh abcd efgh abcd efgh",
        "the quick brown fox jumps over the lazy dog indeed",
    ]
    hs, offs = winnow_batch(texts, 5, 8)
    exp = {
        (i, int(h))
        for i in range(len(texts))
        for h in hs[offs[i]:offs[i + 1]].view(np.int64)
    }
    con = duckdb.connect()
    con.register("d0", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = con.execute(
        f"WITH {oracle_sql.winnow_pairs_sql('d0')[1:]}"  # strip leading newline
        "SELECT doc_id, CAST(f AS BIGINT) AS f FROM fp"
    ).df()
    assert {(int(r.doc_id), int(r.f)) for r in got.itertuples()} == exp
