"""End-to-end flagship pipeline: enrichment correctness, span integrity,
salting, and resume-from-manifest (SURVEY.md §5 plan items b, c)."""

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from geo_epic_ray.fixtures.documents import doc_num_of, documents_batch
from geo_epic_ray.geo import extent
from geo_epic_ray.state.manifest import Manifest, span_hash_of


@pytest.fixture(scope="module")
def enriched(ray_session, tmp_path_factory):
    from geo_epic_ray.pipelines.flagship import run_flagship, synthetic_documents

    out = str(tmp_path_factory.mktemp("flagship"))
    docs = synthetic_documents(5000)
    report = run_flagship(
        docs, out, input_fingerprint="t-5000", skew=True, target_rows=400
    )
    return out, report


def test_flagship_writes_all_docs_once(enriched):
    out, report = enriched
    assert report.rows.sum() == 5000
    files = glob.glob(f"{out}/part=*/data.parquet")
    assert len(files) == len(report)
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 5000


def test_flagship_matches_oracles(enriched):
    out, _ = enriched
    import pyarrow.dataset as pads

    t = pads.dataset(glob.glob(f"{out}/part=*/data.parquet")).to_table()
    ids = doc_num_of(t["doc_id"].to_numpy(zero_copy_only=False))
    from geo_epic_ray.fixtures.documents import doc_point_skewed

    lat, lon = doc_point_skewed(ids)
    np.testing.assert_allclose(t["lat"].to_numpy(), lat)
    np.testing.assert_array_equal(t["mukey"].to_numpy(), extent.soil_mukey_of(lat, lon))
    np.testing.assert_array_equal(
        t["grid_id"].to_numpy(), extent.weather_grid_of(lat, lon)
    )
    np.testing.assert_array_equal(t["tile_id"].to_numpy(), extent.tile_of(lat, lon))


def test_flagship_preserves_span_sequences(enriched):
    out, _ = enriched
    import pyarrow.dataset as pads

    t = (
        pads.dataset(glob.glob(f"{out}/part=*/data.parquet"))
        .to_table(columns=["doc_id", "spans"])
        .sort_by("doc_id")
    )
    ids = doc_num_of(t["doc_id"].to_numpy(zero_copy_only=False))
    expected = documents_batch(ids)
    got = [
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row]
        for row in t["spans"].to_pylist()
    ]
    exp = [
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row]
        for row in expected["spans"].to_pylist()
    ]
    assert got == exp


def test_flagship_salts_hot_cells(enriched):
    out, report = enriched
    salted = report[report.part_key.str.contains("-s")]
    assert len(salted) > 0, "hot cells should have been salted"
    # every salted shard respects the target bound within salt granularity
    assert salted.rows.max() <= 400 * 1.5


def test_flagship_groupby_write_mode_matches_exchange(enriched, ray_session, tmp_path):
    # the retained pre-r4 Dataset-groupby write form (kept for the
    # measured A/B, scripts/measure_ckpt_write.py) must produce the same
    # partitions, rows and resume behavior as the exchange form
    from geo_epic_ray.pipelines.flagship import run_flagship, synthetic_documents

    out_x, report_x = enriched
    out = str(tmp_path / "gbw")
    docs = synthetic_documents(5000)
    report = run_flagship(
        docs, out, input_fingerprint="t-5000", skew=True, target_rows=400,
        write_mode="groupby",
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        report[["part_key", "rows"]],
        report_x[["part_key", "rows"]],
    )
    r2 = run_flagship(
        docs, out, input_fingerprint="t-5000", skew=True, target_rows=400,
        write_mode="groupby",
    )
    assert r2.skipped.all()


def test_manifest_resume_skips_completed(ray_session, tmp_path):
    from geo_epic_ray.pipelines.flagship import run_flagship, synthetic_documents

    out = str(tmp_path / "resume")
    docs = synthetic_documents(2000)
    r1 = run_flagship(docs, out, input_fingerprint="fp-a", target_rows=10**9)
    assert not r1.skipped.any()
    # simulate a partial failure: delete one partition's manifest row
    victim = r1.part_key.iloc[0]
    os.remove(f"{out}/_manifest/part-{victim}.json")
    r2 = run_flagship(docs, out, input_fingerprint="fp-a", target_rows=10**9)
    assert set(r2[r2.skipped].part_key) == set(r1.part_key) - {victim}
    assert set(r2[~r2.skipped].part_key) == {victim}
    assert r2.rows.sum() == 2000
    # changed input fingerprint -> everything recomputes
    r3 = run_flagship(docs, out, input_fingerprint="fp-b", target_rows=10**9)
    assert not r3.skipped.any()


def test_manifest_span_hash_row_order_insensitive():
    t = documents_batch(np.arange(50, dtype=np.int64))
    h1 = span_hash_of(t)
    perm = t.take(list(reversed(range(50))))
    assert span_hash_of(perm) == h1
    # changing one span changes the hash
    t2 = documents_batch(np.arange(50, dtype=np.int64), seed=43)
    assert span_hash_of(t2) != h1


def test_manifest_partition_atomicity(tmp_path):
    m = Manifest(str(tmp_path))
    t = documents_batch(np.arange(10, dtype=np.int64))
    rec = m.write_partition("k1", t, "fp")
    assert rec.row_count == 10
    saved = json.load(open(f"{tmp_path}/_manifest/part-k1.json"))
    assert saved["span_hash"] == span_hash_of(t)
    assert m.pending_keys(["k1", "k2"], "fp") == ["k2"]
    assert m.pending_keys(["k1"], "other-fp") == ["k1"]


def test_fragment_mode_resume_and_crash_sweep(ray_session, tmp_path):
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.pipelines.flagship import run_flagship_fragments

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):  # 4 input shards
        pq.write_table(
            documents_batch(np.arange(i * 2000, (i + 1) * 2000, dtype=np.int64)),
            str(src / f"shard{i}.parquet"),
        )
    out = str(tmp_path / "out")

    r1 = run_flagship_fragments(str(src), out, input_fingerprint="f1",
                                skew=True, wave_size=2)
    w = r1[~r1.skipped]
    assert w.rows.sum() == 8000 and w.shard.nunique() == 4

    # full resume: nothing recomputed
    r2 = run_flagship_fragments(str(src), out, input_fingerprint="f1",
                                skew=True, wave_size=2)
    assert r2[~r2.skipped].empty and r2[r2.skipped].shard.nunique() == 4

    # crash simulation: drop one shard's manifest row -> its orphan
    # fragments are swept and the shard alone is recomputed
    victim = w.shard.iloc[0]
    os.remove(f"{out}/_manifest/part-{victim}.json")
    n_frags_before = len(glob.glob(f"{out}/part=*/frag-*.parquet"))
    r3 = run_flagship_fragments(str(src), out, input_fingerprint="f1",
                                skew=True, wave_size=2)
    assert set(r3[~r3.skipped].shard) == {victim}
    t = pads.dataset(glob.glob(f"{out}/part=*/frag-*.parquet")).to_table()
    assert t.num_rows == 8000  # no duplicates from the rewrite
    # oracle spot check survives the fragment layout
    ids = doc_num_of(t["doc_id"].to_numpy(zero_copy_only=False))
    from geo_epic_ray.fixtures.documents import doc_point_skewed

    lat, lon = doc_point_skewed(ids)
    np.testing.assert_array_equal(t["mukey"].to_numpy(), extent.soil_mukey_of(lat, lon))


def test_read_output_and_compaction(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.pipelines.flagship import (compact_partitions,
                                                 read_flagship_output,
                                                 run_flagship_fragments)

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pq.write_table(
            documents_batch(np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64)),
            str(src / f"s{i}.parquet"),
        )
    out = str(tmp_path / "out")
    run_flagship_fragments(str(src), out, input_fingerprint="c1", wave_size=2)

    ds = read_flagship_output(out, columns=["doc_id", "mukey"])
    assert ds.count() == 3000

    # orphan fragment from a hypothetical in-flight shard is excluded
    part = glob.glob(f"{out}/part=*")[0]
    orphan = f"{part}/frag-notcommitted.parquet-deadbeef.parquet"
    pq.write_table(documents_batch(np.arange(5, dtype=np.int64)), orphan)
    assert read_flagship_output(out).count() == 3000

    os.remove(orphan)
    rep = compact_partitions(out)
    assert rep.rows.sum() == 3000
    assert not glob.glob(f"{out}/part=*/frag-*.parquet")
    assert read_flagship_output(out).count() == 3000


def test_write_modes_produce_identical_rows(ray_session, tmp_path):
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.pipelines.flagship import (run_flagship,
                                                 run_flagship_fragments,
                                                 synthetic_documents)

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        pq.write_table(
            documents_batch(np.arange(i * 2500, (i + 1) * 2500, dtype=np.int64)),
            str(src / f"s{i}.parquet"),
        )
    shuffle_out = str(tmp_path / "shuffle")
    frag_out = str(tmp_path / "frag")
    run_flagship(
        synthetic_documents(5000), shuffle_out, input_fingerprint="eq",
        skew=True, target_rows=10**9,
    )
    run_flagship_fragments(str(src), frag_out, input_fingerprint="eq", skew=True)

    cols = ["doc_id", "mukey", "grid_id", "tile_id"]
    a = (
        pads.dataset(glob.glob(f"{shuffle_out}/part=*/data.parquet"))
        .to_table(columns=cols).sort_by("doc_id")
    )
    b = (
        pads.dataset(glob.glob(f"{frag_out}/part=*/frag-*.parquet"))
        .to_table(columns=cols).sort_by("doc_id")
    )
    assert a.equals(b)


def test_engine_matches_committed_golden_output(ray_session):
    """FIXTURES.md §6: the committed golden file was produced by the
    ORACLE path (floor-grid mukey, brute-force haversine kNN, affine
    tiles) at seed 42 — the engine pipeline must reproduce it row-exactly."""
    import pandas as pd

    from geo_epic_ray.pipelines.flagship import flagship_enrich, synthetic_documents

    golden = pd.read_parquet("tests/golden/enriched_smoke_1000.parquet")
    got = (
        flagship_enrich(synthetic_documents(1000), skew=True, concurrency=2)
        .select_columns(["doc_id", "lat", "lon", "mukey", "grid_id", "tile_id"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden.sort_values("doc_id").reset_index(drop=True))


def test_salt_plan_sampling_path(ray_session):
    from geo_epic_ray.pipelines.flagship import synthetic_documents
    from geo_epic_ray.stages.partition import plan_salts
    from geo_epic_ray.stages.spatial import derive_points, encode_cells

    docs = synthetic_documents(20000)
    cells = docs.map_batches(
        derive_points, batch_format="pyarrow", fn_kwargs={"skew": True}
    ).map_batches(encode_cells, batch_format="pyarrow")
    full = plan_salts(cells, target_rows=1500)
    sampled = plan_salts(cells, target_rows=1500, sample_fraction=0.3)
    # sampling finds the same hot prefixes (scaled estimates may differ by
    # a salt step on borderline cells)
    assert set(full) and set(full) <= set(sampled) | set(full)
    hot = max(full, key=full.get)
    assert hot in sampled and sampled[hot] >= 2


def test_fragment_mode_fingerprint_change_recomputes_without_duplicates(
    ray_session, tmp_path
):
    """Reusing an out_dir with a NEW input fingerprint must recompute the
    affected shards (stale manifest rows cleared first, old fragments
    swept) and never leave duplicate rows or orphan data behind."""
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from geo_epic_ray.pipelines.flagship import run_flagship_fragments
    from geo_epic_ray.fixtures.documents import documents_batch
    from geo_epic_ray.state.manifest import Manifest

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        pq.write_table(
            documents_batch(np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64)),
            str(src / f"shard{i}.parquet"),
        )
    out = str(tmp_path / "out")

    r1 = run_flagship_fragments(str(src), out, input_fingerprint="fpA", wave_size=2)
    assert r1[~r1.skipped].rows.sum() == 2000

    r2 = run_flagship_fragments(str(src), out, input_fingerprint="fpB", wave_size=2)
    assert r2[~r2.skipped].rows.sum() == 2000  # all recomputed, none skipped
    assert r2[r2.skipped].empty

    t = pads.dataset(glob.glob(f"{out}/part=*/frag-*.parquet")).to_table()
    assert t.num_rows == 2000  # old fpA fragments are gone, no duplicates
    done = Manifest(out).completed()
    assert all(rec.input_fingerprint == "fpB" for rec in done.values())


def test_disk_preflight_raises_on_impossible_estimate(tmp_path):
    import shutil as _sh

    from geo_epic_ray.state.preflight import (InsufficientDiskSpace,
                                              check_disk_space)

    free = _sh.disk_usage(str(tmp_path)).free
    check_disk_space(str(tmp_path), free // 4)  # plenty of room: no raise
    try:
        check_disk_space(str(tmp_path), free * 2)
    except InsufficientDiskSpace as e:
        assert "Insufficient disk space" in str(e)
    else:
        raise AssertionError("impossible estimate did not raise")


def test_fragment_writer_preflights_before_writing(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq

    from geo_epic_ray.pipelines.flagship import run_flagship_fragments
    from geo_epic_ray.state import preflight

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(documents_batch(np.arange(50, dtype=np.int64)),
                   str(src / "a.parquet"))
    out = tmp_path / "out"
    out.mkdir()
    monkeypatch.setattr(preflight, "estimate_write_bytes",
                        lambda files, expansion=3.0: 1 << 62)
    try:
        run_flagship_fragments(str(src), str(out), input_fingerprint="pf")
    except preflight.InsufficientDiskSpace:
        pass
    else:
        raise AssertionError("preflight did not gate the write")
    # nothing was written before the preflight fired
    assert not list(out.glob("part=*"))
