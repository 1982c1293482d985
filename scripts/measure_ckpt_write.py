"""Clean-window A/B for the checkpointed (one-file-per-partition) flagship
write: task-exchange form vs the pre-r4 Dataset groupby(part_key) form
(VERDICT r4 item 3 — the r4 swap shipped with only a heavy-load
suggestive number), plus the resume-pass timings that evidence the
vectorized pending filter (item 2: the old per-row Python mask).

Protocol (matches the r3/r4 resumable-write tables): 16M skewed docs in
64 parquet shards under /tmp, 32 cpus. Per mode:
  - cold write to a fresh out_dir (wall, docs/sec)
  - full-resume pass against the completed manifest (wall; every
    partition skipped — this leg is the salt-plan pass + the pending
    filter + manifest read, so it bounds the resume overhead at scale)
Also reports load1 before each leg so a contended window is visible.

Usage: python scripts/measure_ckpt_write.py [exchange|groupby|fragments ...]
  GRAFT_WRITE_DOCS (default 16000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("GRAFT_WRITE_DOCS", "16000000"))
CORPUS = f"/tmp/graft_bench/docs_{N_DOCS}_w64"


def ensure_corpus():
    import ray.data as rd

    from geo_epic_ray.pipelines.flagship import synthetic_documents

    marker = os.path.join(CORPUS, "_done")
    if os.path.exists(marker):
        return
    os.makedirs(CORPUS, exist_ok=True)
    synthetic_documents(N_DOCS, override_num_blocks=64).write_parquet(
        CORPUS, min_rows_per_file=N_DOCS // 64, row_group_size=16384
    )
    with open(marker, "w") as f:
        f.write("ok")


def main():
    import ray
    import ray.data as rd

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ensure_corpus()
    from geo_epic_ray.pipelines.flagship import (
        run_flagship,
        run_flagship_fragments,
    )

    modes = sys.argv[1:] or ["exchange", "groupby", "fragments"]
    fp = f"docs-{N_DOCS}-w64"
    out = {}
    for mode in modes:
        out_dir = f"/tmp/graft_ckpt_ab/{mode}"
        shutil.rmtree(out_dir, ignore_errors=True)

        def run():
            if mode == "fragments":
                return run_flagship_fragments(
                    CORPUS, out_dir, input_fingerprint=fp, skew=True
                )
            docs = rd.read_parquet(CORPUS)
            return run_flagship(
                docs, out_dir, input_fingerprint=fp, skew=True,
                write_mode=mode,
            )

        load0 = round(os.getloadavg()[0], 1)
        t0 = time.perf_counter()
        rep = run()
        cold = time.perf_counter() - t0
        n_parts = int((~rep.skipped).sum())
        load1 = round(os.getloadavg()[0], 1)
        t0 = time.perf_counter()
        rep2 = run()
        resume = time.perf_counter() - t0
        assert rep2.skipped.all(), f"{mode}: resume recomputed work"
        out[mode] = {
            "cold_sec": round(cold, 1),
            "docs_per_sec": int(N_DOCS / cold),
            "partitions": n_parts,
            "resume_sec": round(resume, 2),
            "load1_at_cold": load0,
            "load1_at_resume": load1,
        }
        print(json.dumps({mode: out[mode]}), flush=True)
        shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps({"n_docs": N_DOCS, "results": out}))


if __name__ == "__main__":
    main()
