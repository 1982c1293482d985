"""Geometry normalizers, parameter tables, climate scalars/daymet,
extension surface, outer-merge, multimodal plumbing, CLI."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.geo.geometry import (km_to_deg, largest_polygon, point_wkt,
                                       polygon_area, polygon_centroid)
from geo_epic_ray.sources.parmio import (combine_cropcom, format_ieparm,
                                         parse_cropcom, parse_ieparm)
from geo_epic_ray.stages.climate import daymet_normalize, rh_dewpt, rh_vappr, windspd
from geo_epic_ray.stages.joins import outer_merge_mean


def _sq(x0, y0, s):
    return [np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])]


def test_largest_polygon_and_area():
    small, big = _sq(0, 0, 1), _sq(5, 5, 3)
    assert polygon_area(big) == pytest.approx(9)
    assert largest_polygon([small, big]) is big


def test_centroid_and_wkt():
    cx, cy = polygon_centroid(_sq(2, 4, 2))
    assert (cx, cy) == (pytest.approx(3), pytest.approx(5))
    assert point_wkt(-97.5, 38.2) == "point(-97.5 38.2)"
    assert km_to_deg(111.0) == pytest.approx(1.0)


def test_climate_scalar_formulas_reference_constants():
    # rh at dewpoint == T must be exactly 1
    assert rh_dewpt(np.array([20.0]), np.array([25.0]), np.array([15.0]))[0] == pytest.approx(1.0)
    # es(20C) = 611*exp(17.502*20/260.97) ~ 2339 Pa -> rh = vp/es
    rh = rh_vappr(np.array([1169.5]), np.array([25.0]), np.array([15.0]))
    assert 0.45 < rh[0] < 0.55
    assert windspd(np.array([3.0]), np.array([4.0]))[0] == 5.0


def test_daymet_normalizer_leap_day():
    # 2020 is a leap year: 365-day daymet calendar -> day 60 inserted
    rows = []
    for yday in range(1, 366):
        rows.append({"year": 2020, "yday": yday, "dayl": 43200.0, "prcp": 1.0,
                     "srad": 300.0, "swe": 0.0, "tmax": 20.0, "tmin": 10.0, "vp": 800.0})
    df = pd.DataFrame(rows)
    out = daymet_normalize(df, 2020, 2020)
    assert len(out) == 366
    feb29 = out[(out.month == 2) & (out.day == 29)]
    assert len(feb29) == 1
    # srad converted W/m2 -> MJ/m2/day
    assert out.srad.iloc[0] == pytest.approx(300.0 * 43200.0 / 1e6)
    assert 0 < out.rh.iloc[0] < 1


def test_cropcom_split_and_combine_roundtrip():
    cols = ["#", "NAME"] + [f"C{i}" for i in range(56)] + ["DLAP1", "DLAP2"]
    header = "".join(f"{c:>5}" if i < 2 else f"{c:>8}" for i, c in enumerate(cols))
    vals = [1, 99] + [1.5] * 56 + [5.25, 10.75]
    row = f"{vals[0]:>5}{vals[1]:>5}" + "".join(f"{v:8.2f}" for v in vals[2:])
    text = "title\n" + header + "desc" + "\n" + row + "\n"
    df = parse_cropcom(text)
    assert "DLAP1_v1" in df.columns and df["DLAP1_v1"].iloc[0] == 5.0
    assert df["DLAP1_v2"].iloc[0] == pytest.approx(25.0)
    back = combine_cropcom(df)
    assert back["DLAP1"].iloc[0] == pytest.approx(5.25)


def test_ieparm_roundtrip():
    df = pd.DataFrame(
        [[float(i % 50) for i in range(180)]],
        columns=[f"SCRP1_{i}" for i in range(1, 31)]
        + [f"SCRP2_{i}" for i in range(1, 31)]
        + [f"PARM{i}" for i in range(1, 121)],
    )
    back = parse_ieparm(format_ieparm(df))
    np.testing.assert_allclose(back.values, df.values)


def test_outer_merge_mean():
    a = pd.DataFrame({"Date": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"Date": [2, 3, 4], "v": [4.0, 6.0, 8.0]})
    out = outer_merge_mean(a, b, on="Date")
    assert list(out.Date) == [1, 2, 3, 4]
    assert list(out.v) == [1.0, 3.0, 4.5, 8.0]  # lone values pass through


def test_routine_registry(ray_session):
    import ray.data as rd

    from geo_epic_ray.pipelines.registry import RoutineRegistry, eval_derived_columns

    reg = RoutineRegistry()

    @reg.routine
    def double_chars(rec):
        return {"twice": rec["n_chars"] * 2}

    @reg.objective
    def total(df):
        return df["twice"].sum()

    ds = rd.from_items([{"doc_id": i, "n_chars": 10 * i} for i in range(5)])
    out = reg.apply(ds).to_pandas()
    assert len(out) == 5 and set(out.routine) == {"double_chars"}
    assert reg.reduce("total", out) == sum(10 * i * 2 for i in range(5))

    derived = eval_derived_columns(ds, {"half": "n_chars / 2", "root": "sqrt(n_chars)"})
    # block order is not guaranteed by the streaming executor — sort
    d = derived.to_pandas().sort_values("doc_id")
    assert list(d.half) == [5.0 * i for i in range(5)]


def test_batch_routine_vectorized_matches_per_record(ray_session):
    import ray.data as rd

    from geo_epic_ray.pipelines.registry import RoutineRegistry

    reg = RoutineRegistry()

    @reg.routine
    def per_rec(rec):
        return {"twice": rec["n_chars"] * 2}

    @reg.batch_routine
    def vec(batch: pd.DataFrame) -> pd.DataFrame:
        # whole-batch, no row loop
        return pd.DataFrame({"twice": batch["n_chars"].to_numpy() * 2})

    ds = rd.from_items([{"doc_id": i, "n_chars": 10 * i} for i in range(6)])
    out = reg.apply(ds).to_pandas()
    a = out[out.routine == "per_rec"].sort_values("doc_id")
    b = out[out.routine == "vec"].sort_values("doc_id")
    np.testing.assert_array_equal(a.twice.to_numpy(), b.twice.to_numpy())
    np.testing.assert_array_equal(a.doc_id.to_numpy(), b.doc_id.to_numpy())


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.multimodal import (FrameSample, decode_pipeline,
                                                synth_media_table)

    media = synth_media_table([f"media://{i}" for i in range(20)], ["image"] * 20)
    ds = rd.from_arrow(media)
    out = decode_pipeline(ds, fake=True, concurrency=1).to_pandas()
    assert set(["height", "width", "pixels"]).issubset(out.columns)
    assert (out.height == 4).all() and (out.width == 4).all()
    assert out.pixels.map(len).eq(4 * 4 * 3).all()

    sampled = ds.map_batches(
        FrameSample, batch_format="pyarrow", batch_size=8, concurrency=1,
        fn_constructor_kwargs={"fake": True},
    ).to_pandas()
    assert (sampled.n_frames_sampled >= 1).all()

    # the real decode path on NON-image payloads raises cleanly
    from geo_epic_ray.stages.multimodal import ImageDecode

    with pytest.raises(NotImplementedError):
        ImageDecode()(media)  # synth_media_table payloads are random bytes


def test_image_codecs_pixel_exact():
    """PNG and BMP round-trip pixel-exactly, and the PNG unfilter handles
    all five row filters (checked against an independent scalar
    implementation)."""
    import struct
    import zlib

    from geo_epic_ray.stages import codecs

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 7), (8, 8)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)
        np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(img)), img)
        np.testing.assert_array_equal(codecs.decode_image(codecs.encode_bmp(img)), img)
    rgba = rng.integers(0, 256, (4, 6, 4)).astype(np.uint8)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(rgba)), rgba)

    # hand-built IDAT exercising filters 0..4
    h, w, c = 6, 4, 3
    stride = w * c
    raw = rng.integers(0, 256, (h, 1 + stride)).astype(np.uint8)
    raw[:, 0] = [0, 1, 2, 3, 4, 1]

    def ref_unfilter(raw):
        out = np.zeros((h, stride), dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            f, r = raw[y, 0], raw[y, 1:].astype(np.int64)
            for x in range(stride):
                a = out[y, x - c] if x >= c else 0
                b, cc = prev[x], (prev[x - c] if x >= c else 0)
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
                out[y, x] = (r[x] + pred) % 256
            prev = out[y]
        return out.astype(np.uint8)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + codecs._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        codecs.decode_png(buf), ref_unfilter(raw).reshape(h, w, c)
    )


def test_real_decode_pipeline_mixed_formats(ray_session):
    """decode_pipeline with fake=False over byte-valid PNG+BMP payloads:
    decoded dims match the encoders' and the resize output is exact."""
    import ray.data as rd

    from geo_epic_ray.stages import codecs
    from geo_epic_ray.stages.multimodal import decode_pipeline, synth_image_table

    refs = [f"img://{i}" for i in range(16)]
    media = synth_image_table(refs, fmt="mixed")
    out = (
        decode_pipeline(rd.from_arrow(media), fake=False, target=4, concurrency=1)
        .to_pandas()
        .set_index("media_ref")
    )
    assert len(out) == 16
    payloads = {r: p for r, p in zip(refs, media["payload"].to_pylist())}
    for r in refs:
        img = codecs.decode_image(payloads[r])
        h, w, _ = img.shape
        yi = (np.arange(4) * h // 4)[:, None]
        xi = (np.arange(4) * w // 4)[None, :]
        assert out.loc[r, "pixels"] == img[yi, xi].tobytes()  # pixel-exact


def test_cli_list_queries(capsys):
    from geo_epic_ray.__main__ import main

    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "geo_enrich_full" in out and "sql-oracle" in out


def test_gee_composite_extract_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from geo_epic_ray.pipelines.gee import composite_extract, load_config

    dates = pd.to_datetime(["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"])
    veg = rd.from_pandas(pd.DataFrame(
        {"Date": dates, "nir": [10.0, 2.0, 8.0, 6.0], "red": [2.0, 1.0, 4.0, 2.0]}
    ))
    met = rd.from_pandas(pd.DataFrame(
        {"Date": dates[:3], "tmax": [20.0, 30.0, 25.0]}
    ))
    cfg = {
        "global_scope": {
            "time_range": ["2024-03-01", "2024-03-03"],
            "variables": ["ndvi", "moist", "heat"],
        },
        "collections": {
            "veg": {
                "select": "nir > 5",
                "variables": {"ndvi": "(nir - red) / (nir + red)",
                              "moist": "nir * 0.5"},
            },
            "met": {"variables": {"moist": "tmax * 0.1", "heat": "tmax - 10"}},
        },
        "derived_variables": {},
    }
    out = composite_extract(cfg, {"veg": veg, "met": met}).to_pandas()
    out = out.sort_values("Date").reset_index(drop=True)
    # 03-02 masked out (nir=2), 03-04 outside time range -> 2 rows
    assert list(out.Date.dt.day) == [1, 3]
    # shared band `moist` is the pair mean: (nir*0.5 + tmax*0.1)/2
    np.testing.assert_allclose(out.moist.to_numpy(), [(5.0 + 2.0) / 2, (4.0 + 2.5) / 2])
    np.testing.assert_allclose(out.ndvi.to_numpy(), [round(8 / 12, 3), round(4 / 12, 3)])
    np.testing.assert_allclose(out.heat.to_numpy(), [10.0, 15.0])
    # YAML text round-trips through load_config
    cfg2 = load_config("global_scope:\n  time_range: [a, b]\n  variables: [x]\ncollections:\n  c:\n    variables: {x: 'x'}\n")
    assert cfg2["collections"]["c"]["variables"] == {"x": "x"}


def test_ingest_side_tables(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from geo_epic_ray.sources.ingest import (ingest_raster_table,
                                             ingest_soil_table,
                                             ingest_weather_grid)

    soil_in = tmp_path / "soil.parquet"
    pd.DataFrame(
        {"mukey": [1, 2], "geometry": [b"\x01", b"\x02"], "albedo": [0.1, 0.2]}
    ).to_parquet(soil_in)
    n = ingest_soil_table(str(soil_in), str(tmp_path / "soil_out"))
    assert n == 2
    back = pq.read_table(str(tmp_path / "soil_out"))
    assert set(back.column_names) >= {"mukey", "geometry", "albedo", "hydgrp"}

    grid_in = tmp_path / "grid.parquet"
    pd.DataFrame({"grid_id": [0], "lat": [40.0], "lon": [-100.0]}).to_parquet(grid_in)
    assert ingest_weather_grid(str(grid_in), str(tmp_path / "grid_out")) == 1

    bad = tmp_path / "bad.parquet"
    pd.DataFrame({"grid_id": [0], "lat": [95.0], "lon": [0.0]}).to_parquet(bad)
    with pytest.raises(Exception, match="out-of-range"):
        ingest_weather_grid(str(bad), str(tmp_path / "bad_out"))

    rast = tmp_path / "rast.parquet"
    pd.DataFrame({"px": [0, 5], "py": [0, 7], "value": [1.0, 2.0]}).to_parquet(rast)
    assert ingest_raster_table(str(rast), str(tmp_path / "rast_out"), 10, 10) == 2

    missing = tmp_path / "missing.parquet"
    pd.DataFrame({"mukey": [1]}).to_parquet(missing)
    with pytest.raises(ValueError, match="missing required columns"):
        ingest_soil_table(str(missing), str(tmp_path / "m_out"))


def test_multimodal_feature_pipeline_feeds_ann(ray_session):
    import numpy as np
    import ray.data as rd

    from geo_epic_ray.stages.multimodal import (FeatureExtract,
                                                feature_pipeline,
                                                synth_media_table)
    from geo_epic_ray.stages.similarity import ann_topk

    refs = [f"m/{i}" for i in range(40)]
    media = synth_media_table(refs, ["image"] * 40)
    feats = feature_pipeline(rd.from_arrow(media), fake=True, dim=16)
    df = feats.to_pandas()
    assert len(df) == 40
    mat = np.stack(df.features.to_numpy())
    assert mat.shape == (40, 16)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, rtol=1e-9)
    # deterministic: same pipeline, same features
    df2 = feature_pipeline(rd.from_arrow(media), fake=True, dim=16).to_pandas()
    np.testing.assert_allclose(
        np.stack(df2.sort_values("media_ref").features.to_numpy()),
        np.stack(df.sort_values("media_ref").features.to_numpy()),
    )
    # features flow straight into ANN: top-1 neighbor of item 0's vector
    ds = rd.from_pandas(
        df.assign(vec_id=np.arange(40))[["vec_id", "features"]].rename(
            columns={"features": "embedding"}
        )
    )
    out = ann_topk(ds, mat[:1], k=3, exclude_ids=np.array([0])).to_pandas()
    assert len(out) == 3 and 0 not in set(out.vec_id)


def test_event_gap_stats_single_event_user_emits_null(ray_session, tmp_path):
    """LAG semantics: a user with one event has no gaps -> mean/max must be
    Arrow NULL (not NaN), matching SQL avg-of-empty; multi-event users get
    exact grouped diffs under the (ts, event_id) tie order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geo_epic_ray.pipelines.queries import QUERIES

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 00:01:10",
         "2024-01-02 09:00:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "user_id": np.array([7, 7, 7, 9], dtype=np.int64),
            "ts": ts,
            "event_type": ["a"] * 4,
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")
    out = QUERIES["event_gap_stats"](str(tmp_path))
    tbl = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    got = {r["user_id"]: r for r in tbl.to_pylist()}
    assert got[7]["n_events"] == 3 and got[9]["n_events"] == 1
    assert got[7]["mean_gap_us"] == 35_000_000 and got[7]["max_gap_us"] == 60_000_000
    assert got[9]["mean_gap_us"] is None and got[9]["max_gap_us"] is None
    # the null must be a true Arrow null, not NaN or a sentinel
    mg = tbl.column("mean_gap_us")
    assert mg.null_count == 1


def test_wav_codec_roundtrip():
    from geo_epic_ray.stages.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 1234, dtype=np.int16)
    x, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and x.shape == (1234, 1)
    np.testing.assert_array_equal(x[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    y, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100
    np.testing.assert_array_equal(y, stereo)
    import pytest

    with pytest.raises(NotImplementedError):
        decode_wav(b"not a wav at all....")

    # malformed fmt chunks fail the codec's loud contract, not reshape
    import struct

    good = bytes(encode_wav(mono, 8000))
    zero_ch = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", zero_ch, fmt_at + 2, 0)  # channels = 0
    with pytest.raises(NotImplementedError, match="channels"):
        decode_wav(bytes(zero_ch))
    odd_frames = bytearray(encode_wav(stereo, 44100))
    data_at = bytes(odd_frames).index(b"data")
    struct.pack_into("<I", odd_frames, data_at + 4, 500 * 4 - 2)  # ragged frame
    with pytest.raises(NotImplementedError, match="frame size"):
        decode_wav(bytes(odd_frames))


def test_audio_decode_stage(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.codecs import decode_wav
    from geo_epic_ray.stages.multimodal import AudioDecode, synth_audio_table

    refs = [f"a-{i}" for i in range(40)]
    tbl = synth_audio_table(refs)
    out = (
        rd.from_arrow(tbl).repartition(4)
        .map_batches(AudioDecode, batch_format="pyarrow", batch_size=16,
                     concurrency=2)
        .to_pandas().sort_values("media_ref").reset_index(drop=True)
    )
    assert len(out) == 40
    assert (out.sample_rate == 8000).all() and (out.channels == 1).all()
    # spot-check one clip against a direct decode
    row = out[out.media_ref == "a-7"].iloc[0]
    payload = tbl.filter(
        __import__("pyarrow").compute.equal(tbl["media_ref"], "a-7")
    )["payload"][0].as_py()
    x, rate = decode_wav(payload)
    assert row.n_samples == x.shape[0]
    want = round(float(np.sqrt((x[:, 0].astype(np.float64) ** 2).mean())), 6)
    assert row.rms == want
    assert row.duration_s == round(x.shape[0] / rate, 6)


def test_codec_roundtrips_property():
    """Property tests: any int16 PCM signal and any 8-bit RGB/RGBA image
    survive the pure-stdlib codecs bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    from geo_epic_ray.stages.codecs import (decode_bmp, decode_png,
                                            decode_wav, encode_bmp,
                                            encode_png, encode_wav)

    @settings(max_examples=25, deadline=None)
    @given(
        x=hnp.arrays(np.int16, st.integers(1, 400)),
        ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def wav_rt(x, ch, rate):
        sig = np.stack([x] * ch, axis=1) if ch > 1 else x
        y, r = decode_wav(encode_wav(sig, rate))
        assert r == rate
        np.testing.assert_array_equal(y, sig.reshape(len(x), ch))

    @settings(max_examples=15, deadline=None)
    @given(
        img=hnp.arrays(np.uint8, st.tuples(st.integers(1, 12),
                                           st.integers(1, 12),
                                           st.sampled_from([3]))),
    )
    def bmp_rt(img):
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    @settings(max_examples=15, deadline=None)
    @given(
        img=hnp.arrays(np.uint8, st.tuples(st.integers(1, 12),
                                           st.integers(1, 12),
                                           st.sampled_from([3, 4]))),
    )
    def png_rt(img):
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    wav_rt()
    bmp_rt()
    png_rt()


def test_avi_codec_roundtrip():
    from geo_epic_ray.stages.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(11)
    for n, h, w, fps in [(1, 4, 4, 10), (6, 5, 7, 24), (3, 2, 9, 1)]:
        f = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
        g, r = decode_avi(encode_avi(f, fps=fps))
        assert r == fps and g.shape == f.shape
        np.testing.assert_array_equal(g, f)

    import pytest

    with pytest.raises(NotImplementedError):
        decode_avi(b"not an avi")
    with pytest.raises(NotImplementedError):
        decode_avi(b"RIFF\x10\x00\x00\x00WAVEfmt ")  # RIFF but not AVI
    # corrupt strf (compressed stream) raises the documented contract
    good = bytearray(encode_avi(rng.integers(0, 256, (2, 4, 4, 3)).astype(np.uint8)))
    pos = bytes(good).find(b"strf")
    assert pos > 0
    comp = bytearray(good)
    comp[pos + 8 + 16 : pos + 8 + 20] = (1).to_bytes(4, "little")  # biCompression=1
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(comp))


def test_frame_sample_real_decode(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.codecs import decode_avi
    from geo_epic_ray.stages.multimodal import FrameSample, synth_video_table

    refs = [f"v{i}" for i in range(8)]
    tbl = synth_video_table(refs)
    out = (
        rd.from_arrow(tbl)
        .map_batches(FrameSample, batch_format="pyarrow", batch_size=4,
                     concurrency=1, fn_constructor_kwargs={"every_n": 2, "fake": False})
        .to_pandas()
    )
    for _, row in out.iterrows():
        vid, fps = decode_avi(tbl["payload"][list(out.media_ref).index(row.media_ref)].as_py())
        want = vid[::2]
        assert row.n_frames == vid.shape[0]
        assert row.n_frames_sampled == want.shape[0]
        assert bytes(row.sampled_frames) == want.tobytes()


def test_textio_special_chars(ray_session, tmp_path):
    """JSONL and CSV round trips preserve text with embedded newlines,
    quotes, commas and the \x1f separator — byte-for-byte."""
    import ray.data as rd

    from geo_epic_ray.sources.textio import (read_csv_docs, read_jsonl_docs,
                                             write_csv_docs, write_jsonl_docs)

    texts = ['line one\nline two', 'quote " and, comma', 'sep\x1fhere',
             'plain', '']
    df = pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64), "text": texts,
         "lang": ["en"] * 5, "source": ["t"] * 5,
         "n_chars": [len(t) for t in texts]}
    )
    ds = rd.from_pandas(df).repartition(2)
    jd = str(tmp_path / "j"); cd = str(tmp_path / "c")
    write_jsonl_docs(ds, jd)
    write_csv_docs(ds, cd)
    for reader, path in [(read_jsonl_docs, jd), (read_csv_docs, cd)]:
        back = reader(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert back.text.tolist() == texts, path
        assert back.doc_id.tolist() == list(range(5))


def test_round_decimal_correctly_rounded():
    """stages/rounding.round_decimal must be bit-exact vs BOTH correctly-
    rounded references: CPython round() and DuckDB CAST(printf AS DOUBLE)
    — including exact decimal ties and their nextafter neighbors, where
    np.round and DuckDB round_even both misround (the sf0.1
    climate_scalars/profile_lai mismatch class)."""
    import duckdb
    import pyarrow as pa

    from geo_epic_ray.stages.rounding import round_decimal

    rng = np.random.default_rng(3)
    for n in (1, 2, 4, 6):
        ties = (np.floor(rng.uniform(0, 100, 4000) * 10**n * 2 + 1)) / (
            2 * 10.0**n
        )
        base = np.concatenate(
            [
                rng.uniform(0, 100, 6000),
                rng.uniform(0, 10000, 3000),
                ties,
                -ties,
                np.nextafter(ties, np.inf),
                np.nextafter(ties, -np.inf),
            ]
        )
        mine = round_decimal(base, n)
        py = np.array([round(float(v), n) for v in base])
        assert (mine == py).all(), f"n={n}: diverges from CPython round"
        con = duckdb.connect()
        try:
            con.register("t", pa.table({"x": base}))
            dk = con.execute(
                f"SELECT CAST(printf('%.{n}f', x) AS DOUBLE) AS r FROM t"
            ).fetchnumpy()["r"]
        finally:
            con.close()
        assert (mine == dk).all(), f"n={n}: diverges from DuckDB printf"
    # the observed sf0.1 edge: np.round gives 28.2 (wrong)
    assert round_decimal(np.array([28.205000000000002]), 2)[0] == 28.21
