"""Measure peak Ray object-store residency while an exchange-backed query
runs — the evidence protocol for the streaming-scatter change (VERDICT r2
item 1: `scatter`'s to_arrow_refs() pinned the whole upstream dataset
before the first reduce; a streaming scatter should show that barrier
gone as a lower plasma peak for the same query).

Samples the plasma store two ways at ~20 Hz in a daemon thread:
- /dev/shm used bytes (Ray's object store is tmpfs-backed on Linux)
- ray._private.internal_api.memory_summary plasma line (cross-check,
  sampled at ~2 Hz because it is an RPC)

Usage: python scripts/measure_exchange_peak.py [query ...]
  (default queries: dedup_components minhash_lsh_pairs salted_join_hot_keys)
  GRAFT_SF_DIR to switch scale factor (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


def plasma_used() -> int:
    from ray._private.internal_api import memory_summary

    txt = memory_summary(stats_only=True)
    m = re.search(r"Plasma memory usage (\d+) MiB", txt)
    return int(m.group(1)) * (1 << 20) if m else -1


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.peak_shm = 0
        self.peak_plasma = 0

    def run(self):
        i = 0
        while not self.stop.is_set():
            self.peak_shm = max(self.peak_shm, shm_used())
            if i % 10 == 0:
                try:
                    self.peak_plasma = max(self.peak_plasma, plasma_used())
                except Exception:
                    pass
            i += 1
            time.sleep(0.05)


def main():
    import ray

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from geo_epic_ray.pipelines.queries import QUERIES

    names = sys.argv[1:] or [
        "dedup_components", "minhash_lsh_pairs", "salted_join_hot_keys",
    ]
    base = shm_used()
    out = {}
    for name in names:
        QUERIES[name](SF_DIR)  # warmup (worker spawn, page cache)
        s = Sampler()
        s.start()
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        dt = time.perf_counter() - t0
        time.sleep(0.2)
        s.stop.set()
        s.join()
        out[name] = {
            "sec": round(dt, 3),
            "peak_shm_over_base_mb": round((s.peak_shm - base) / 2**20, 1),
            "peak_plasma_mb": round(s.peak_plasma / 2**20, 1),
        }
    ray.shutdown()
    print(json.dumps({"sf": SF_DIR, "base_shm_mb": round(base / 2**20, 1), **out}))


if __name__ == "__main__":
    main()
