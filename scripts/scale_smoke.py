"""Scale-smoke the dedup/text heavies at 10x-100x gate size with peak-RSS
tracking (VERDICT r4 item 4): the bucket-size guardrail and the
posting-list/pair-bucket designs have oracle gates at 5k docs; this runs
them at 100k-1M synthetic docs and records wall time plus peak resident
memory (driver and all ray:: workers) so sub-linear memory is evidenced,
not asserted.

Corpus: word-salad docs (40 words from a 4k vocab) with planted structure
the heavies actually exercise — every 10th doc near-duplicates its
predecessor (one word changed: minhash/ngram/jaccard candidates), every
23rd is an exact dup (components/exact paths), and 5% of docs share one
hot 12-word boilerplate chunk (boilerplate removal + skew). Embeddings:
64-dim clustered Gaussians (16 clusters) for semdedup.

Usage: python scripts/scale_smoke.py [query ...]
  GRAFT_SMOKE_DOCS (default 500000), GRAFT_SMOKE_DIR (default
  /tmp/graft_smoke_<n>).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("GRAFT_SMOKE_DOCS", "500000"))
# Main corpus is "mixed" (web shape: hot shared vocab + mostly doc-unique
# words) so exact-join candidate volume tracks true pairs. Two extra
# ngram legs run on pathological shapes: DENSE_LEG (digit vocab ->
# dense-bitmap plan, bounded n) and GUARDRAIL_LEG (uniform letter vocab
# -> PPJoin with intrinsically quadratic candidates; must fail SIZED).
VOCAB_N = int(os.environ.get("GRAFT_SMOKE_VOCAB", "4000"))
SMOKE_DIR = os.environ.get(
    "GRAFT_SMOKE_DIR", f"/tmp/graft_smoke_{N_DOCS}_mixedv3_{VOCAB_N}"
)
DENSE_LEG = ("ngram_jaccard_pairs", 100_000, 4000)  # n_docs, digit vocab
GUARDRAIL_LEG = (500_000, 20_000)  # n_docs, uniform letter vocab

HEAVIES = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "substring_dedup",
    "boilerplate_chunk_removal",
    "dedup_components",
    "semdedup_keep",
]


def _proc_rss_kb(pid: str) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _is_ray_worker(pid: str) -> bool:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read()
        return b"ray::" in cmd or b"raylet" in cmd or b"plasma" in cmd
    except OSError:
        return False


class RssSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop_ev = threading.Event()
        self.peak_total_kb = 0
        self.peak_driver_kb = 0
        self.me = str(os.getpid())

    def run(self):
        while not self.stop_ev.is_set():
            drv = _proc_rss_kb(self.me)
            total = drv
            for pid in os.listdir("/proc"):
                if pid.isdigit() and pid != self.me and _is_ray_worker(pid):
                    total += _proc_rss_kb(pid)
            self.peak_driver_kb = max(self.peak_driver_kb, drv)
            self.peak_total_kb = max(self.peak_total_kb, total)
            time.sleep(0.2)


def build_corpus(
    out_dir: str, n_docs: int, vocab_n: int, word_style: str = "letters"
) -> None:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    marker = os.path.join(out_dir, "_OK")
    if os.path.exists(marker):
        return
    os.makedirs(f"{out_dir}/documents.parquet", exist_ok=True)
    os.makedirs(f"{out_dir}/embeddings.parquet", exist_ok=True)
    from geo_epic_ray.fixtures.rng import randint

    def words_from_ids(idx: np.ndarray) -> np.ndarray:
        # 6-letter words straight from a 32-bit mix of the word id
        hv = (
            idx.astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(1 << 32)
        flat = np.zeros((idx.size, 6), dtype=np.uint8)
        for j in range(6):
            flat[:, j] = 97 + (
                (hv >> np.uint64(5 * j)) % np.uint64(26)
            ).astype(np.uint8)
        return flat.view("S6").reshape(idx.size).astype("U6")

    B62 = np.frombuffer(
        b"0123456789abcdefghijklmnopqrstuvwxyz"
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZ", dtype=np.uint8,
    )

    def cold_words_from_ids(idx: np.ndarray) -> np.ndarray:
        # 10-char base-62 words from a 64-bit mix: the char-5-GRAM space
        # is 62^5 ~ 9.2e8, so doc-unique words yield df~1 shingles at
        # 500k docs. The first cut used 6-letter lowercase words whose
        # grams live in a 26^5 = 11.8e6 space — 1.4e8 gram occurrences
        # saturate it (measured median df 10+ at 500k), every prefix
        # goes hot, and exact-join candidates hit 41e6 for 72e3 true
        # pairs: a low-entropy-ALPHABET pathology (the guardrail leg's
        # territory), not the web shape this leg is meant to model.
        hv = idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        hv ^= hv >> np.uint64(31)
        hv *= np.uint64(0xBF58476D1CE4E5B9)
        flat = np.zeros((idx.size, 10), dtype=np.uint8)
        for j in range(10):
            flat[:, j] = B62[
                ((hv >> np.uint64(6 * j)) % np.uint64(62)).astype(np.int64)
            ]
        return flat.view("S10").reshape(idx.size).astype("U10")

    if word_style == "letters":
        # uniform small letter vocab: diverse char-5-grams (census exceeds
        # dense_max -> PPJoin) but EVERY prefix shingle is hot — the
        # templated-corpus pathology whose exact candidate volume is
        # intrinsically quadratic (the pair-budget guardrail's target)
        vocab = words_from_ids(np.arange(vocab_n, dtype=np.int64))
    elif word_style == "digits":
        # digit words: 5-grams collapse to digit patterns, census stays
        # under dense_max -> the dense-bitmap (all-pairs) plan
        width = len(str(vocab_n - 1))
        vocab = np.array([f"w{i:0{width}d}" for i in range(vocab_n)])
    else:
        vocab = None  # "mixed": word ids drawn per-slot in gen()
    boiler = " ".join(f"b{i}" for i in range(12))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        # base doc of id i derives from i, near-dups (i%10==9) from i-1
        # with the LAST word replaced, exact dups (i%23==22) from i-1
        base = ids.copy()
        near = ids % 10 == 9
        exact = ids % 23 == 22
        base[near | exact] = ids[near | exact] - 1
        seeds = (
            base[:, None] * np.int64(40) + np.arange(40)[None, :]
        ).reshape(-1)
        if word_style == "mixed":
            # web-corpus shape: every 4th slot from a hot shared vocab
            # (vocab_n 6-letter words), the rest 10-char base-62 words
            # from a 2^30 id space — non-dup docs share only hot words,
            # whose grams never reach the rarest-first prefixes, so
            # exact-join candidate volume tracks TRUE pairs, not n^2
            draw = randint(seeds, 7, 1, 0, 1 << 30)
            hot_slot = np.tile(np.arange(40) % 4 == 0, ids.size)
            words = np.where(
                hot_slot,
                words_from_ids(draw % vocab_n).astype("U10"),
                cold_words_from_ids(vocab_n + draw),
            ).reshape(ids.size, 40)
        else:
            words = vocab[
                randint(seeds, 7, 1, 0, len(vocab))
            ].reshape(ids.size, 40)
        words = words.astype("U10")
        if word_style == "mixed":
            # variable doc length (20-40 words), derived from the BASE id
            # so dup pairs share their length; fixed-length corpora make
            # (n_chars, lang) equality blocks degenerate (4 blocks of
            # n/4 docs -> all-pairs, the budget guardrail's territory,
            # covered by the letters leg)
            wcnt = 20 + randint(base, 7, 5, 0, 21)
        else:
            wcnt = np.full(ids.size, 40, dtype=np.int64)
        rows = np.flatnonzero(near)
        words[rows, wcnt[rows] - 1] = "changed"
        texts = np.array(
            [" ".join(row[:w]) for row, w in zip(words, wcnt)], dtype=object
        )
        hot = randint(ids, 7, 2, 0, 20) == 0  # 5% carry the hot chunk
        texts[hot & ~exact] = texts[hot & ~exact] + " " + boiler
        return pa.table(
            {
                "doc_id": ids,
                "text": pa.array(texts.tolist(), pa.string()),
                "lang": pa.array(
                    np.array(["en", "de", "fr", "es"])[
                        randint(ids, 7, 3, 0, 4)
                    ].tolist()
                ),
                "source": pa.array(
                    np.array(["web", "books", "code"])[
                        randint(ids, 7, 4, 0, 3)
                    ].tolist()
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        )

    rd.range(n_docs, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow", batch_size=32768
    ).write_parquet(f"{out_dir}/documents.parquet")

    n_vec = max(1000, n_docs // 5)
    dim, k = 64, 16

    def gen_emb(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        lab = (ids % k).astype(np.int32)
        rng_mat = (
            randint(
                (ids[:, None] * np.int64(dim) + np.arange(dim)[None, :]).reshape(-1),
                9, 1, 0, 2001,
            ).reshape(ids.size, dim)
            / 1000.0
            - 1.0
        )
        centroid = np.cos(
            (lab[:, None] + 1) * (np.arange(dim)[None, :] + 1) * 0.37
        ) * 4.0
        emb = (centroid + rng_mat).astype(np.float32)
        return pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(lab),
            }
        )

    rd.range(n_vec, override_num_blocks=16).map_batches(
        gen_emb, batch_format="pyarrow", batch_size=16384
    ).write_parquet(f"{out_dir}/embeddings.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def main():
    import ray

    ray.init(
        address="local", num_cpus=32, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    build_corpus(SMOKE_DIR, N_DOCS, VOCAB_N, word_style="mixed")
    from geo_epic_ray.pipelines.queries import QUERIES

    def timed(name: str, sf_dir: str, label: str, out: dict, fn=None) -> None:
        s = RssSampler()
        s.start()
        t0 = time.perf_counter()
        res = (fn or QUERIES[name])(sf_dir)
        n = res.count() if hasattr(res, "count") else len(res)
        dt = time.perf_counter() - t0
        s.stop_ev.set()
        s.join()
        out[label] = {
            "sec": round(dt, 2),
            "rows": int(n),
            "peak_total_rss_mb": round(s.peak_total_kb / 1024, 1),
            "peak_driver_rss_mb": round(s.peak_driver_kb / 1024, 1),
        }
        print(json.dumps({label: out[label]}), flush=True)

    import ray.data as rd

    from geo_epic_ray.stages.dedup import ngram_jaccard_pairs

    def ngram_t08(sf_dir: str):
        # production near-dup threshold (the registry query pins t=0.5
        # for its small oracle gate)
        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ngram_jaccard_pairs(ds, threshold=0.8)

    def semdedup_stage(sf_dir: str):
        # the registry query plants twins and asserts gate-corpus
        # invariants ("originals survive") that do not hold on dense
        # clustered Gaussians (whole clusters sit above cosine 0.9, so
        # greedy keeps ~1 per cluster) — smoke the STAGE, not the fixture
        from geo_epic_ray.stages.cluster import semdedup

        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return semdedup(ds, k=16, n_iter=4, threshold=0.9)

    CUSTOM = {
        "ngram_jaccard_pairs": ngram_t08,
        "semdedup_keep": semdedup_stage,
    }

    # "guardrails" sentinel: run only the pathological legs below
    names = sys.argv[1:] or HEAVIES
    out = {}
    for name in names:
        if name in ("guardrails", "dense"):
            continue
        try:
            timed(name, SMOKE_DIR, name, out, fn=CUSTOM.get(name))
        except Exception as ex:  # noqa: BLE001 — RayTaskError(ValueError)
            msg = str(ex)
            if "pair budget exceeded" in msg:
                # a budget refusal on the MAIN corpus is data, not a
                # crash: record it sized and keep smoking the other
                # heavies (at 1M docs the (n_chars, lang) blocks grow
                # past the default 2e7-pairs/bucket budget — blocking is
                # all-pairs within a block, so candidate volume grows
                # ~n^2/#blocks)
                out[name] = {
                    "guardrail": "sized refusal",
                    "msg": msg.rsplit("ValueError: ", 1)[-1][:300],
                }
            elif "disk is full" in msg or "OutOfDisk" in msg:
                # single-box limit, not an engine bug: the posting
                # exchange's all-to-all volume spills through the object
                # store, and at 5M docs ngram/substring exceed this
                # host's free disk (a cluster partitions that volume
                # across nodes) — record and continue
                out[name] = {"outcome": "object-store spill exceeded "
                                        "local free disk (single-box "
                                        "limit)"}
            else:
                raise
            print(json.dumps({name: out[name]}), flush=True)
    # raised-budget escape hatch: when dedup_components refuses on the
    # main corpus, prove the documented remediation ("raise the budget to
    # accept the memory cost explicitly") completes with bounded memory —
    # same pipeline, max_pairs_per_bucket lifted, 2x reduce buckets
    if out.get("dedup_components", {}).get("guardrail") == "sized refusal":
        from geo_epic_ray.stages.components import connected_components
        from geo_epic_ray.stages.dedup import blocked_pair_edges
        import pandas as pd

        def components_raised(sf_dir: str):
            docs = rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang", "n_chars"],
            ).materialize()
            edges = blocked_pair_edges(
                docs, ["n_chars", "lang"], "doc_id", "text",
                threshold=0.2, n_buckets=64, max_pairs_per_bucket=120_000_000,
            )
            nodes = docs.select_columns(["doc_id"]).map_batches(
                lambda b: pd.DataFrame({"id_a": b.doc_id}),
                batch_format="pandas",
            )
            return connected_components(
                edges.select_columns(["id_a", "id_b"]), nodes,
                node_col="doc_id", label_col="component",
            )

        try:
            timed("dedup_components", SMOKE_DIR,
                  "dedup_components@budget1.2e8", out, fn=components_raised)
        except Exception as ex:  # noqa: BLE001
            if "pair budget exceeded" not in str(ex):
                raise
            out["dedup_components@budget1.2e8"] = {
                "guardrail": "sized refusal",
                "msg": str(ex).rsplit("ValueError: ", 1)[-1][:300],
            }
            print(json.dumps({"dedup_components@budget1.2e8":
                              out["dedup_components@budget1.2e8"]}),
                  flush=True)
    # guardrail leg: on a uniform-letter-vocab (templated) corpus every
    # prefix shingle is hot — measured 5.7e9 exact candidates at 500k,
    # intrinsically too much for ANY exact plan. The engine must fail
    # SIZED (candidate-pair budget), not OOM-kill workers (pre-r5).
    # (explicit "guardrails" sentinel only since the 500k record landed —
    # the letters-corpus legs are fixed-size and already in BASELINE.md)
    if "guardrails" in names:
        gn, gv = GUARDRAIL_LEG
        gdir = f"/tmp/graft_smoke_{gn}_v{gv}"
        build_corpus(gdir, gn, gv, word_style="letters")
        t0 = time.perf_counter()
        try:
            ds = rd.read_parquet(
                f"{gdir}/documents.parquet", columns=["doc_id", "text"]
            )
            ngram_jaccard_pairs(ds, threshold=0.5).count()
            out["ngram_guardrail@t0.5"] = {"guardrail": "DID NOT FIRE"}
        except Exception as ex:  # noqa: BLE001 — RayTaskError(ValueError)
            msg = str(ex)
            # either budget is a correct sized refusal: generation
            # ("candidate-pair budget exceeded") for raw explode volume,
            # verify ("verify-stage pair budget exceeded") for distinct
            # pairs surviving the pre-join dedup
            key = "pair budget exceeded"
            out["ngram_guardrail@t0.5"] = {
                "sec": round(time.perf_counter() - t0, 2),
                "guardrail": "fired" if key in msg else f"other: {msg[:160]}",
            }
        print(json.dumps({"ngram_guardrail@t0.5":
                          out["ngram_guardrail@t0.5"]}), flush=True)
    # equality-block guardrail: the letters corpus is FIXED length, so
    # (n_chars, lang) blocking degenerates to 4 blocks of n/4 docs —
    # all-pairs within a block is inherent to blocking, and the posting
    # explode must refuse sized (pre-r5 it OOM-killed 33 GB reduce tasks)
    if "guardrails" in names:
        gn, gv = GUARDRAIL_LEG
        gdir = f"/tmp/graft_smoke_{gn}_v{gv}"
        build_corpus(gdir, gn, gv, word_style="letters")
        t0 = time.perf_counter()
        try:
            QUERIES["dedup_components"](gdir).count()
            out["components_guardrail"] = {"guardrail": "DID NOT FIRE"}
        except Exception as ex:  # noqa: BLE001 — RayTaskError(ValueError)
            msg = str(ex)
            out["components_guardrail"] = {
                "sec": round(time.perf_counter() - t0, 2),
                "guardrail": (
                    "fired" if "pair budget exceeded" in msg
                    else f"other: {msg[:160]}"
                ),
            }
        print(json.dumps({"components_guardrail":
                          out["components_guardrail"]}), flush=True)
    # dense-bitmap stress: bounded leg (the dense exact-Jaccard plan is
    # O(n^2) by design and gated by dense_docs_max past 150k docs).
    # Explicit sentinel only: at 100k docs x W=1024 bitmap words this is
    # a deliberate ~27-CPU-hour quadratic job (the cost dense_docs_max
    # exists to refuse), not something a heavies re-run should drag in.
    dq, dn, dv = DENSE_LEG
    if "dense" in names or "guardrails" in names:
        dense_dir = f"/tmp/graft_smoke_{dn}_v{dv}_dense"
        build_corpus(dense_dir, dn, dv, word_style="digits")
        timed(dq, dense_dir, f"{dq}@dense{dn // 1000}k", out)
    ray.shutdown()
    print(json.dumps(
        {"n_docs": N_DOCS, "vocab": VOCAB_N, "dir": SMOKE_DIR, "results": out}
    ))


if __name__ == "__main__":
    main()
