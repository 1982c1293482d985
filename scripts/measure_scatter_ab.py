"""A/B evidence for the streaming scatter (VERDICT r2 item 1).

Round 2's `scatter` began with `ds.to_arrow_refs()` — a hard barrier that
executed and pinned the ENTIRE upstream dataset before the first reduce.
Round 3's scatter consumes `iter_internal_ref_bundles()` as the executor
streams blocks. This script measures both shapes on the same synthetic
single-consumer input, in THIS process:

  A (streaming, current):  scatter(ds, ...)
  B (barrier, emulated):   scatter(ds.materialize(), ...)  # old shape

Run each mode in a separate process — /dev/shm high-water is monotone
within a Ray session (plasma keeps freed pages mapped).

Usage: python scripts/measure_scatter_ab.py [stream|barrier] [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.peak = 0

    def run(self):
        while not self.stop.is_set():
            self.peak = max(self.peak, shm_used())
            time.sleep(0.02)


def make_rows(batch: pd.DataFrame) -> pd.DataFrame:
    # ~64 bytes of payload per row: a shuffle input that is big relative
    # to the reduce output (the common exchange shape)
    i = batch["id"].to_numpy()
    rng = np.random.default_rng(int(i[0]) + 1)
    return pd.DataFrame(
        {
            "k": i % 997,
            "payload": rng.integers(0, 1 << 60, (len(i), 8)).astype(np.int64).tolist(),
        }
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from geo_epic_ray.stages import exchange

    ds = rd.range(n, override_num_blocks=128).map_batches(
        make_rows, batch_format="pandas"
    )

    base = shm_used()
    s = Sampler()
    s.start()
    t0 = time.perf_counter()
    if mode == "barrier":
        ds = ds.materialize()  # the round-2 to_arrow_refs shape
    parts = exchange.scatter(ds, 32, exchange.hash_bucket_fn("k", 32))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).size().rename(columns={"size": "n"})

    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "n": pd.Series([], dtype=np.int64)})
    total = exchange.group_map(parts, count_bucket, empty).sum("n")
    dt = time.perf_counter() - t0
    time.sleep(0.2)
    s.stop.set()
    s.join()
    assert total == n, (total, n)
    ray.shutdown()
    print(json.dumps({
        "mode": mode, "n_rows": n, "sec": round(dt, 3),
        "peak_shm_over_base_mb": round((s.peak - base) / 2**20, 1),
    }))


if __name__ == "__main__":
    main()
