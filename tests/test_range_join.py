"""range_join (bucketed interval join) vs a brute-force pandas oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from geo_epic_ray.stages.joins import range_join


def _brute(points: pd.DataFrame, iv: pd.DataFrame) -> set:
    out = set()
    for _, p in points.iterrows():
        for _, r in iv.iterrows():
            if r.s <= p.t < r.e:
                out.add((int(p.pid), int(r.iid)))
    return out


def test_range_join_overlapping_and_spanning(ray_session):
    rng = np.random.default_rng(3)
    t0 = pd.Timestamp("2024-01-01")
    points = pd.DataFrame(
        {
            "pid": np.arange(300, dtype=np.int64),
            "t": t0 + pd.to_timedelta(rng.integers(0, 100_000, 300), unit="s"),
        }
    )
    # intervals: some tiny, some spanning many cells, some overlapping,
    # one empty (s == e) and one inverted (e < s -> treated as a point)
    s = t0 + pd.to_timedelta(rng.integers(0, 90_000, 40), unit="s")
    lens = rng.integers(0, 30_000, 40)
    lens[0] = 0
    iv = pd.DataFrame(
        {
            "iid": np.arange(40, dtype=np.int64),
            "s": s,
            "e": s + pd.to_timedelta(lens, unit="s"),
        }
    )
    iv.loc[1, "e"] = iv.loc[1, "s"] - pd.Timedelta(seconds=5)

    got = range_join(
        rd.from_pandas(points).repartition(4),
        rd.from_pandas(iv).repartition(2),
        on="t",
        start="s",
        end="e",
        bucket_width_us=3_600 * 1_000_000,  # 1h cells << interval spans
        point_cols=["pid"],
        interval_cols=["iid"],
        n_buckets=8,
        int_dtypes={"pid": np.int64, "iid": np.int64},
    ).to_pandas()
    want = _brute(points, iv)
    assert set(zip(got.pid, got.iid)) == want
    assert len(got) == len(want)  # no duplicate matches across cells
    assert got.pid.dtype == np.int64 and got.iid.dtype == np.int64
