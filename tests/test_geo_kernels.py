"""Geometry kernels vs independent oracles (SURVEY.md §5 plan item d)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_epic_ray.geo import cells, extent
from geo_epic_ray.geo.affine import GridTransform
from geo_epic_ray.geo.haversine import brute_force_knn, haversine_km
from geo_epic_ray.geo.knn import KnnIndex
from geo_epic_ray.geo.pip import PolygonIndex, point_in_polygon
from geo_epic_ray.geo.wkb import decode_polygon, encode_polygon


def _pip_oracle(px, py, rings):
    """Independent winding-free reference: pure-python even-odd test."""
    out = []
    for x, y in zip(px, py):
        inside = False
        for ring in rings:
            for (xa, ya), (xb, yb) in zip(ring[:-1], ring[1:]):
                if (ya > y) != (yb > y):
                    xint = xa + (y - ya) * (xb - xa) / (yb - ya)
                    if x < xint:
                        inside = not inside
        out.append(inside)
    return np.array(out)


def test_wkb_roundtrip():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])
    hole = np.array([[0.5, 0.5], [1.0, 0.5], [1.0, 1.0], [0.5, 0.5]])
    back = decode_polygon(encode_polygon([ring, hole]))
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], ring)
    # hole was auto-closed
    np.testing.assert_array_equal(back[1][:-1], hole[:-1])
    np.testing.assert_array_equal(back[1][-1], hole[0])


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31))
def test_pip_matches_pure_python_oracle(seed):
    rng = np.random.default_rng(seed)
    # irregular star-convex polygon around a center
    ang = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(3, 12)))
    rad = rng.uniform(0.2, 1.0, ang.shape[0])
    cx, cy = rng.uniform(-97.8, -97.2), rng.uniform(36.0, 37.0)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    px = rng.uniform(cx - 1.2, cx + 1.2, 200)
    py = rng.uniform(cy - 1.2, cy + 1.2, 200)
    got = point_in_polygon(px, py, [ring])
    np.testing.assert_array_equal(got, _pip_oracle(px, py, [ring]))


def test_polygon_index_grid_matches_floor_oracle():
    from geo_epic_ray.fixtures.soil import soil_polygons_table

    soil = soil_polygons_table()
    polys = [decode_polygon(g) for g in soil["geometry"].to_pylist()]
    idx = PolygonIndex(soil["mukey"].to_numpy(), polys, res=8)
    lat, lon = extent.doc_point(np.arange(3000, dtype=np.int64))
    np.testing.assert_array_equal(idx.lookup(lat, lon), extent.soil_mukey_of(lat, lon))


def test_knn_index_exact_vs_brute_force():
    rng = np.random.default_rng(7)
    n = 800
    glat = rng.uniform(extent.LAT0, extent.LAT1, n)
    glon = rng.uniform(extent.LON0, extent.LON1, n)
    gid = rng.permutation(n).astype(np.int64)
    idx = KnnIndex(gid, glat, glon, res=5)
    qlat, qlon = extent.doc_point(np.arange(1500, dtype=np.int64))
    got_id, got_d = idx.query(qlat, qlon)
    exp_id, exp_d = brute_force_knn(qlat, qlon, glat, glon, gid, k=1)
    np.testing.assert_array_equal(got_id, exp_id[:, 0])
    # arccos-of-dot vs arcsin-haversine agree to well under a millimeter
    np.testing.assert_allclose(got_d, exp_d[:, 0], atol=1e-6)


def test_knn_lattice_exact_and_round_rule_agreement():
    from geo_epic_ray.fixtures.weather import weather_grid_table

    wg = weather_grid_table()
    gid = wg["grid_id"].to_numpy()
    glat, glon = wg["lat"].to_numpy(), wg["lon"].to_numpy()
    idx = KnnIndex(gid, glat, glon)
    lat, lon = extent.doc_point(np.arange(2000, dtype=np.int64))
    got, _ = idx.query(lat, lon)
    exp, _ = brute_force_knn(lat, lon, glat, glon, gid, k=1)
    np.testing.assert_array_equal(got, exp[:, 0])
    # the per-axis round shortcut agrees except for rare latitude-midpoint
    # points where haversine's cos(lat) weighting flips the row choice
    agree = (got == extent.weather_grid_of(lat, lon)).mean()
    assert agree > 0.999


def test_cells_parent_prefix_and_bounds():
    lat, lon = extent.doc_point(np.arange(500, dtype=np.int64))
    c10 = cells.cell_of(lat, lon, 10)
    c6 = cells.cell_of(lat, lon, 6)
    np.testing.assert_array_equal(cells.parent_cell(c10, 10, 6), c6)
    # every point is inside its own cell bounds
    for i in range(0, 500, 97):
        la0, la1, lo0, lo1 = cells.cell_bounds(int(c10[i]), 10)
        assert la0 <= lat[i] <= la1 and lo0 <= lon[i] <= lo1


def test_affine_tile_matches_extent_oracle():
    t = GridTransform(
        extent.LON0, extent.LAT0, extent.PIXEL_DEG,
        extent.N_TILE_COLS * extent.TILE_PX, extent.N_TILE_ROWS * extent.TILE_PX,
    )
    lat, lon = extent.doc_point(np.arange(4000, dtype=np.int64))
    np.testing.assert_array_equal(
        t.tile_of(lat, lon, extent.TILE_PX, extent.N_TILE_COLS),
        extent.tile_of(lat, lon),
    )
    # pixel-center half-shift (reference raster_utils.py:243-245)
    la, lo = t.center_of(np.array([0]), np.array([0]))
    assert lo[0] == extent.LON0 + 0.5 * extent.PIXEL_DEG
    assert la[0] == extent.LAT0 + 0.5 * extent.PIXEL_DEG


def test_haversine_known_value():
    # ~111.19 km per degree of latitude at constant longitude
    d = haversine_km(np.array([35.0]), np.array([-97.0]), np.array([36.0]), np.array([-97.0]))
    assert abs(d[0] - 111.1949) < 0.01


def test_polygon_index_with_holes():
    def sq(x0, y0, s):
        return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])

    donut = [sq(-98.0, 36.0, 1.0), sq(-97.7, 36.3, 0.4)]  # exterior + hole
    solid = [sq(-96.8, 36.0, 0.5)]
    idx = PolygonIndex(np.array([10, 20]), [donut, solid], res=8)
    got = idx.lookup(
        np.array([36.5, 36.45, 36.2, 36.1]),
        np.array([-97.5, -97.95, -96.6, -99.5]),
    )
    # in-hole -> -1, in-ring -> 10, in-solid -> 20, outside -> -1
    np.testing.assert_array_equal(got, [-1, 10, 20, -1])


def test_knn_query_k_exact():
    from geo_epic_ray.fixtures.weather import weather_grid_table

    wg = weather_grid_table()
    gid = wg["grid_id"].to_numpy()
    glat, glon = wg["lat"].to_numpy(), wg["lon"].to_numpy()
    idx = KnnIndex(gid, glat, glon)
    lat, lon = extent.doc_point(np.arange(1200, dtype=np.int64))
    got_id, got_d = idx.query_k(lat, lon, 4)
    exp_id, exp_d = brute_force_knn(lat, lon, glat, glon, gid, k=4)
    np.testing.assert_array_equal(got_id, exp_id)
    np.testing.assert_allclose(got_d, exp_d, atol=1e-6)


def test_lattice_knn_matches_generic_and_bruteforce():
    from geo_epic_ray.fixtures.weather import weather_grid_table
    from geo_epic_ray.geo import extent
    from geo_epic_ray.geo.haversine import haversine_km
    from geo_epic_ray.geo.knn import KnnIndex, build_knn_index, detect_lattice

    g = weather_grid_table()
    gid = g["grid_id"].to_numpy()
    glat = g["lat"].to_numpy()
    glon = g["lon"].to_numpy()
    lat_idx = build_knn_index(gid, glat, glon)
    assert type(lat_idx).__name__ == "LatticeKnn"  # fixture IS a lattice
    gen = KnnIndex(gid, glat, glon, res=6)

    rng = np.random.default_rng(5)
    n = 4000
    qlat = rng.uniform(extent.LAT0 - 0.2, extent.LAT1 + 0.2, n)  # incl. out-of-extent
    qlon = rng.uniform(extent.LON0 - 0.2, extent.LON1 + 0.2, n)
    # exact grid points and row/col midpoints (tie cases)
    qlat[:50], qlon[:50] = glat[:50], glon[:50]
    qlat[50:100] = (glat[:50] + glat[100:150]) / 2
    a_id, a_d = lat_idx.query(qlat, qlon)
    b_id, b_d = gen.query(qlat, qlon)
    np.testing.assert_array_equal(a_id, b_id)
    np.testing.assert_allclose(a_d, b_d, rtol=0, atol=1e-9)
    # spot brute force
    for i in range(0, n, 251):
        d_all = haversine_km(np.full(gid.size, qlat[i]), np.full(gid.size, qlon[i]), glat, glon)
        want = gid[np.lexsort((gid, d_all))[0]]
        assert a_id[i] == want, i

    # non-lattice sets are rejected by detection
    assert detect_lattice(gid[::2], glat[::2], glon[::2]) is None
    jitter = glon.copy(); jitter[7] += 1e-9
    assert detect_lattice(gid, glat, jitter) is None
    # factory falls back to the generic index and stays exact
    fb = build_knn_index(gid[:100], glat[:100], glon[:100])
    assert type(fb).__name__ == "KnnIndex"


def test_query_k3_ties_at_cell_boundaries():
    # k=3 with crafted knife-edge queries: grid points, row/col midpoints,
    # and cell centers (near-4-way-equidistant corners). The brute force
    # uses the ENGINE's own metric (arccos of the xyz dot) — grid coords
    # LON0 + i*step make "equidistant" neighbors differ at the 1e-17
    # level, so cross-formula orderings are inherently formula-dependent;
    # the invariant is candidate-machinery == full scan under one metric,
    # ties to the lowest grid_id.
    from geo_epic_ray.fixtures.weather import weather_grid_table
    from geo_epic_ray.geo.knn import _unit_xyz, build_knn_index

    g = weather_grid_table()
    gid = g["grid_id"].to_numpy()
    glat = g["lat"].to_numpy()
    glon = g["lon"].to_numpy()
    idx = build_knn_index(gid, glat, glon)
    step_lat = glat[np.flatnonzero(glat != glat[0])[0]] - glat[0]
    step_lon = glon[1] - glon[0]

    qlat = np.concatenate([
        glat[:80],                      # exact grid points
        glat[:80] + step_lat / 2,       # row midpoints
        glat[:80],                      # col midpoints (lat on row)
        glat[:80] + step_lat / 2,       # cell centers
    ])
    qlon = np.concatenate([
        glon[:80],
        glon[:80],
        glon[:80] + step_lon / 2,
        glon[:80] + step_lon / 2,
    ])
    got_id, got_d = idx.query_k(qlat, qlon, 3)
    gxyz = _unit_xyz(glat, glon)
    qxyz = _unit_xyz(qlat, qlon)
    # 1 mm: arccos amplifies 1e-16 dot noise to ~1e-9 km at km-scale
    # distances; 1e-6 km is safely above noise, far below ~5 km spacing
    tol = 1e-6
    for i in range(qlat.size):
        d_all = 6371.0088 * np.arccos(np.clip(gxyz @ qxyz[i], -1.0, 1.0))
        third = np.partition(d_all, 2)[2]
        # every returned id is a genuine top-3 point (within float noise)
        by_id = {int(g): d for g, d in zip(gid, d_all)}
        assert all(by_id[int(g)] <= third + tol for g in got_id[i]), i
        assert got_id[i].size == np.unique(got_id[i]).size  # no duplicates
        # engine distances are sorted; exact engine ties break to low gid
        assert (np.diff(got_d[i]) >= 0).all(), i
        for a in range(2):
            if got_d[i][a] == got_d[i][a + 1]:
                assert got_id[i][a] < got_id[i][a + 1], i
    # determinism: a second call returns the identical ranking
    again_id, again_d = idx.query_k(qlat, qlon, 3)
    np.testing.assert_array_equal(got_id, again_id)


def test_lattice_knn_southern_hemisphere_exact():
    # Regression (ADVICE r4): the cos(lat) margin row must be on the
    # POLEWARD side of the searchsorted bracket, which for a
    # southern-hemisphere lattice (negative, increasing lats) is the
    # LOW-index side. Brute-force equality over a dense query set.
    from geo_epic_ray.geo.haversine import haversine_km
    from geo_epic_ray.geo.knn import build_knn_index

    nrows, ncols = 40, 30
    row_lats = -39.0 + 0.1 * np.arange(nrows)   # -39 .. -35.1 (increasing)
    col_lons = 140.0 + 0.125 * np.arange(ncols)
    glat = np.repeat(row_lats, ncols)
    glon = np.tile(col_lons, nrows)
    gid = np.arange(nrows * ncols, dtype=np.int64)
    idx = build_knn_index(gid, glat, glon)
    assert type(idx).__name__ == "LatticeKnn"

    rng = np.random.default_rng(17)
    n = 5000
    qlat = rng.uniform(row_lats[0] - 0.2, row_lats[-1] + 0.2, n)
    qlon = rng.uniform(col_lons[0] - 0.2, col_lons[-1] + 0.2, n)
    # row midpoints: exactly where the one-sided margin failed
    qlat[:200] = np.repeat((row_lats[:-1] + row_lats[1:]) / 2, 6)[:200]
    # far off the lon extent: the poleward shift spans many rows and the
    # guard must route these through the exact all-rows scan
    qlon[200:400] = col_lons[0] - rng.uniform(1.0, 20.0, 200)
    qlon[400:600] = col_lons[-1] + rng.uniform(1.0, 20.0, 200)
    got_id, got_d = idx.query(qlat, qlon)
    for i in range(n):
        d_all = haversine_km(
            np.full(gid.size, qlat[i]), np.full(gid.size, qlon[i]), glat, glon
        )
        want = gid[np.lexsort((gid, d_all))[0]]
        assert got_id[i] == want, i
