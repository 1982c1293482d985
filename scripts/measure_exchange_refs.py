"""Measure the exchange's DRIVER-side footprint vs input block count —
the evidence protocol for exchange.py's documented O(n_blocks x
n_buckets) driver-ref bound (VERDICT r4 item 5).

For each block count N: build a synthetic N-block dataset of tiny rows,
scatter into 32 buckets, then reduce (count per bucket). Records:
- driver RSS delta at the scatter sync point (the refs + counts are the
  only driver state)
- scatter wall (submission + counts sync) and reduce wall
- refs held = N x (n_buckets + 1)

Usage: python scripts/measure_exchange_refs.py [--wave W] [N ...]
  (default 2500 10000 20000 40000; --wave W measures the two-level
  scatter path instead — the 100-TB mitigation)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from geo_epic_ray.stages import exchange

    n_buckets = 32
    argv = sys.argv[1:]
    wave = None
    if "--wave" in argv:
        i = argv.index("--wave")
        wave = int(argv[i + 1])
        del argv[i : i + 2]
    sizes = [int(x) for x in argv] or [2500, 10000, 20000, 40000]
    out = []
    for n_blocks in sizes:
        # tiny blocks: 8 rows each — the point is ref count, not data
        df = pd.DataFrame({"k": np.arange(8 * n_blocks, dtype=np.int64) % 997,
                           "v": np.ones(8 * n_blocks, dtype=np.int64)})
        ds = rd.from_pandas(df).repartition(n_blocks).materialize()
        gc.collect()
        r0 = rss_mb()
        t0 = time.perf_counter()
        parts = exchange.scatter(
            ds, n_buckets, exchange.key_cols_bucket_fn(["k"], n_buckets),
            wave_combine=wave,
        )
        t_scatter = time.perf_counter() - t0
        gc.collect()
        r1 = rss_mb()

        def agg(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("k", as_index=False)["v"].sum()

        empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                              "v": pd.Series([], dtype=np.int64)})
        t1 = time.perf_counter()
        n = exchange.group_map(parts, agg, empty).count()
        t_reduce = time.perf_counter() - t1
        del parts, ds
        gc.collect()
        n_waves = 1 if wave is None else -(-n_blocks // wave)
        out.append(
            {
                "n_blocks": n_blocks,
                "wave": wave,
                "refs_held": (
                    n_blocks * (n_buckets + 1)
                    if wave is None
                    else n_buckets * n_waves + wave * (n_buckets + 1)
                ),
                "driver_rss_delta_mb": round(r1 - r0, 1),
                "scatter_sec": round(t_scatter, 2),
                "reduce_sec": round(t_reduce, 2),
                "groups": n,
            }
        )
        print(json.dumps(out[-1]), flush=True)
    ray.shutdown()
    print(json.dumps({"n_buckets": n_buckets, "rows": out}))


if __name__ == "__main__":
    main()
