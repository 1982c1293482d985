"""Chunked oracle sweep with per-chunk timeouts — for large scale factors
where a handful of oracles are infeasible (all-pairs SQL) and any one
query must not wedge the whole sweep.

Runs scripts/check_oracles.py in subprocess chunks (fresh Ray session per
chunk — never two concurrent sessions), records ok/FAIL/TIMEOUT per
query, prints a summary with the slowest chunks.

Usage: GRAFT_SF_DIR=/tmp/graft_sf1 python scripts/sweep_chunked.py
  GRAFT_SWEEP_SKIP: comma-separated names to skip (defaults to the
  all-pairs-oracle set, infeasible at 10x gate scale)
  GRAFT_SWEEP_CHUNK (default 6), GRAFT_SWEEP_TIMEOUT sec/chunk (default 900)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# all-pairs or quadratic-in-corpus DuckDB oracles: bit-exact gates exist
# at sf0.01/sf0.1; at 10x-gate corpora the ORACLE (not the engine) is the
# bottleneck by design.
DEFAULT_SKIP = {
    "minhash_lsh_pairs",      # exact all-pairs Jaccard oracle
    "ngram_jaccard_pairs",    # same
    "simhash_dup_pairs",      # all-pairs Hamming oracle
    "embedding_dup_pairs",    # all-pairs cosine oracle
    "winnow_overlap_pairs",   # all-pairs fingerprint-overlap oracle
    "substring_dedup",        # gram-string self-join oracle
    "semdedup_keep",          # recursive-CTE greedy, quadratic per cluster
    "dedup_components",       # recursive-CTE CC over pair edges
    "pagerank_canonical",     # same edge CTEs
    "dedup_keep_canonical",   # same
    "dedup_clusters_blocked", # same
    "calibration_de",         # iterative optimizer, rows-only gate
}


def main() -> None:
    import __ray_entry__ as e

    names = list(e.queries().keys())
    skip = set(
        filter(None, os.environ.get("GRAFT_SWEEP_SKIP", "").split(","))
    ) or DEFAULT_SKIP
    todo = [n for n in names if n not in skip]
    chunk_n = int(os.environ.get("GRAFT_SWEEP_CHUNK", "6"))
    tmo = int(os.environ.get("GRAFT_SWEEP_TIMEOUT", "900"))
    here = os.path.dirname(os.path.abspath(__file__))

    results: dict[str, str] = {n: "SKIP" for n in skip if n in names}
    timings: list[tuple[float, list[str]]] = []
    for i in range(0, len(todo), chunk_n):
        chunk = todo[i : i + chunk_n]
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "check_oracles.py"), *chunk],
                capture_output=True, text=True, timeout=tmo,
            )
            out = p.stdout + p.stderr
        except subprocess.TimeoutExpired as ex:
            out = (ex.stdout or "") + (ex.stderr or "")
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
        dt = time.time() - t0
        timings.append((dt, chunk))
        for n in chunk:
            if f"ok   {n}" in out:
                results[n] = "ok"
            elif f"FAIL {n}" in out:
                results[n] = "FAIL"
            else:
                results[n] = "TIMEOUT"
        line = " ".join(f"{n}={results[n]}" for n in chunk)
        print(f"[{dt:6.1f}s] {line}", flush=True)

    fails = [n for n, r in results.items() if r == "FAIL"]
    tmos = [n for n, r in results.items() if r == "TIMEOUT"]
    oks = [n for n, r in results.items() if r == "ok"]
    print(f"\n{len(oks)} ok, {len(fails)} FAIL, {len(tmos)} TIMEOUT, "
          f"{len(results) - len(oks) - len(fails) - len(tmos)} skipped")
    if fails:
        print("FAILED:", fails)
    if tmos:
        print("TIMED OUT:", tmos)
    print("slowest chunks:")
    for dt, chunk in sorted(timings, reverse=True)[:3]:
        print(f"  {dt:.1f}s  {chunk}")


if __name__ == "__main__":
    main()
