"""Query registry, part 4 (round 2 additions): interval (range) join,
canonical-doc dedup output, JSON property extraction, benchmark
decontamination, and TF-IDF term scoring.

Registered into the same QUERIES/ORACLES dicts as pipelines.queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .queries import register

# --- interval (range) join: events x overlapping campaign windows -----------

# Windows: one per distinct event DAY, each 36 hours long — adjacent
# windows overlap by 12 hours, so most events match TWO windows (the
# many-to-many case a range join must handle). Neither side broadcast.
_RANGE_SQL = """
WITH w AS (SELECT DISTINCT date_trunc('day', ts) AS ws FROM events),
j AS (
  SELECT w.ws, e.value FROM w JOIN events e
    ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 36 HOUR
)
SELECT ws, count(*) AS n_events, round_even(sum(value), 4) AS sum_value
FROM j GROUP BY ws
"""


@register("campaign_window_stats", _RANGE_SQL)
def campaign_window_stats(sf_dir: str):
    """Per-window event count + value sum over OVERLAPPING 36-hour
    windows anchored at each event day — the interval-join operator Ray
    Data lacks, as one bucketed shuffle (stages/joins.py range_join:
    intervals explode to covered time cells, points map to their cell,
    exact predicate inside the bucket). The window side is derived from
    the events table itself (distinct days via a partial-combine grouped
    pass), and the post-join aggregate pre-combines per batch before a
    ~30-group merge."""
    from ..stages.aggregates import partials_to_driver
    from ..stages.joins import range_join

    # ev feeds both the distinct-days pass and the join's point side —
    # pin the blocks once (dual-consumer rule)
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).materialize()

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.ts.dt.floor("D").drop_duplicates()
        return pd.DataFrame({"ws": d})

    # distinct days: bounded by the calendar (#days), never by #events —
    # the returned frame is driver-side and tiny, re-wrapped as a Dataset
    days = partials_to_driver(
        ev.map_batches(day_partial, batch_format="pandas"),
        lambda p: p.drop_duplicates("ws").sort_values("ws").reset_index(drop=True),
    )
    s = days.ws.astype("datetime64[us]")
    intervals = rd.from_pandas(
        pd.DataFrame({"ws": s, "we": s + pd.Timedelta(hours=36)})
    )
    joined = range_join(
        ev,
        intervals,
        on="ts",
        start="ws",
        end="we",
        bucket_width_us=36 * 3600 * 1_000_000,
        point_cols=["value"],
        interval_cols=["ws"],
        empty_template=pd.DataFrame(
            {"value": pd.Series([], dtype=float),
             "ws": pd.Series([], dtype="datetime64[us]")}
        ),
    )

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("ws", as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return g

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("ws", as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        g["ws"] = pd.to_datetime(g.ws)
        g["n_events"] = g.n_events.astype("int64")
        g["sum_value"] = g.sum_value.round(4)
        return g.sort_values("ws").reset_index(drop=True)

    # driver merge bounded: #days x #blocks partial rows
    return partials_to_driver(
        joined.map_batches(agg_partial, batch_format="pandas"), final
    )


# --- canonical docs after near-dup clustering --------------------------------

_CANONICAL_SQL = """
WITH RECURSIVE pairs AS (
  SELECT d1.doc_id AS id_a, d2.doc_id AS id_b, d1.text AS ta, d2.text AS tb
  FROM documents d1 JOIN documents d2
    ON d1.n_chars = d2.n_chars AND d1.lang = d2.lang AND d2.doc_id > d1.doc_id
),
sa AS (
  SELECT DISTINCT id_a, id_b, substr(ta, CAST(i AS INT), 5) AS sh
  FROM (SELECT id_a, id_b, ta, unnest(generate_series(1, greatest(1, length(ta) - 4))) AS i FROM pairs)
),
sb AS (
  SELECT DISTINCT id_a, id_b, substr(tb, CAST(i AS INT), 5) AS sh
  FROM (SELECT id_a, id_b, tb, unnest(generate_series(1, greatest(1, length(tb) - 4))) AS i FROM pairs)
),
inter AS (
  SELECT sa.id_a, sa.id_b, count(*) AS n FROM sa
  JOIN sb ON sa.id_a = sb.id_a AND sa.id_b = sb.id_b AND sa.sh = sb.sh
  GROUP BY 1, 2
),
na AS (SELECT id_a, id_b, count(*) AS n FROM sa GROUP BY 1, 2),
nb AS (SELECT id_a, id_b, count(*) AS n FROM sb GROUP BY 1, 2),
edges AS (
  SELECT na.id_a, na.id_b
  FROM na JOIN nb ON na.id_a = nb.id_a AND na.id_b = nb.id_b
  LEFT JOIN inter ON na.id_a = inter.id_a AND na.id_b = inter.id_b
  WHERE COALESCE(inter.n, 0) * 1.0
        / (na.n + nb.n - COALESCE(inter.n, 0)) >= 0.2
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION ALL SELECT id_b, id_a FROM edges
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON s.a = r.dst
)
SELECT src AS doc_id FROM reach GROUP BY src HAVING min(dst) = src
"""


@register("dedup_keep_canonical", _CANONICAL_SQL)
def dedup_keep_canonical(sf_dir: str):
    """The dedup END PRODUCT: one canonical doc id per near-dup cluster
    (the cluster's min doc_id keeps itself). Clustering via the
    block-local fast path (stages/components.py blocked_components), then
    a vectorized ``component == doc_id`` filter — what a training-data
    pipeline feeds to the tokenizer after near-dup removal."""
    from ..stages.components import blocked_components

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    labeled = blocked_components(
        docs, ["n_chars", "lang"], "doc_id", "text", threshold=0.2
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b.component == b.doc_id][["doc_id"]]

    return labeled.map_batches(keep, batch_format="pandas")


# --- JSON property extraction -------------------------------------------------


@register(
    "json_props_stats",
    """
    SELECT event_type,
           count(*) AS n,
           round_even(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_stats(sf_dir: str):
    """Semi-structured payload extraction: parse the JSON ``props`` column
    (vectorized pandas str.extract — the schema is a flat object, so a
    compiled regex beats per-row json.loads by ~30x) and aggregate the
    numeric property per event type. Partial combine per batch, 5-group
    driver merge. avg is computed as sum/count in BOTH implementations
    (single double division, bit-stable)."""
    from ..stages.aggregates import partials_to_driver

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b.props.str.extract(r'"k":\s*(-?\d+)', expand=False).astype("int64")
        return (
            pd.DataFrame({"event_type": b.event_type, "k": k})
            .groupby("event_type", as_index=False)
            .agg(n=("k", "size"), s=("k", "sum"), max_k=("k", "max"))
        )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), max_k=("max_k", "max")
        )
        g["avg_k"] = (g.s / g.n).round(4)
        return g[["event_type", "n", "avg_k", "max_k"]].sort_values(
            "event_type"
        ).reset_index(drop=True)

    # driver merge bounded: 5 event types x #blocks
    return partials_to_driver(ds.map_batches(partial, batch_format="pandas"), final)


# --- benchmark decontamination -------------------------------------------------

# Contamination = a candidate doc shares at least one stride-13 substring
# chunk with any benchmark doc (sources src0/src1). Stride chunks (not
# sliding windows) keep BOTH implementations exactly enumerable; matching
# is on the actual 13-char strings, so there is no hash-collision caveat.
_DECON_SQL = """
WITH bench AS (
  SELECT DISTINCT substr(text, 1 + 13 * CAST(i AS INT), 13) AS chunk
  FROM (SELECT text, unnest(generate_series(0, CAST(floor((length(text) - 1) / 13) AS BIGINT))) AS i
        FROM documents WHERE source IN ('src0', 'src1'))
  WHERE length(substr(text, 1 + 13 * CAST(i AS INT), 13)) = 13
),
cand AS (
  SELECT doc_id, substr(text, 1 + 13 * CAST(i AS INT), 13) AS chunk
  FROM (SELECT doc_id, text, unnest(generate_series(0, CAST(floor((length(text) - 1) / 13) AS BIGINT))) AS i
        FROM documents WHERE source NOT IN ('src0', 'src1'))
  WHERE length(substr(text, 1 + 13 * CAST(i AS INT), 13)) = 13
)
SELECT DISTINCT c.doc_id FROM cand c JOIN bench b ON c.chunk = b.chunk
"""


@register("decontamination_overlap", _DECON_SQL)
def decontamination_overlap(sf_dir: str):
    """Benchmark decontamination: flag training candidates sharing any
    13-char stride chunk with the benchmark subset (src0/src1) — the
    overlap check run before training-set release. Fully distributed:
    both sides explode to (chunk, ...) rows, hash-bucket BY THE CHUNK
    STRING (exact match, no hash-collision caveat), and a per-bucket
    semi-join marks contaminated ids; a grouped pass dedups doc ids.
    Neither the benchmark chunk set nor the candidate set is broadcast or
    driver-merged."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        """ONE corpus scan emits both sides: chunk every doc (vectorized
        per CHUNK INDEX — one pandas str.slice over all rows per stride
        position, never per row), then side = benchmark membership."""
        empty = pd.DataFrame(
            {"chunk": pd.Series([], dtype=str),
             "doc_id": pd.Series([], dtype=np.int64),
             "__side": pd.Series([], dtype=np.int64),
             "__bucket": pd.Series([], dtype=np.int64)}
        )
        if not len(b):
            return empty
        side = b.source.isin(["src0", "src1"]).to_numpy().astype(np.int64)
        max_k = int((b.text.str.len().max() - 1) // 13)
        frames = []
        for k in range(max_k + 1):
            c = b.text.str.slice(13 * k, 13 * k + 13)
            m = (c.str.len() == 13).to_numpy()
            if m.any():
                frames.append(
                    pd.DataFrame(
                        {"chunk": c[m], "doc_id": b.doc_id[m],
                         "__side": side[m]}
                    )
                )
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        out["__bucket"] = (
            pd.util.hash_array(out.chunk.to_numpy()) % np.uint64(32)
        ).astype("int64")
        return out

    u = docs.map_batches(tag, batch_format="pandas")

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        bench_chunks = g.loc[g.__side == 1, "chunk"]
        cand = g[g.__side == 0]
        hit = cand[cand.chunk.isin(set(bench_chunks))]
        return pd.DataFrame(
            {"doc_id": hit.doc_id.astype("int64").drop_duplicates()}
        )

    from ..stages import exchange

    # the chunk semi-join runs on the task exchange (pattern-consistent
    # with the other bucketed stages; measured ~equal to the groupby form
    # here — the cost is the chunk-string shuffle itself, not the sort)
    hits = exchange.group_map(
        exchange.scatter(u, 32, exchange.column_values_bucket_fn("__bucket")),
        semi, pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)}),
    )
    # a doc can hit chunks in many buckets: one grouped dedup pass
    from ..stages.aggregates import bucketed_group_agg

    import pyarrow as pa

    from .queries import schema_stable

    # a clean corpus (no benchmark contamination) is the HAPPY outcome —
    # the empty result must still carry its schema
    return schema_stable(
        bucketed_group_agg(
            hits, ["doc_id"],
            lambda df: df.drop_duplicates("doc_id")[["doc_id"]],
            n_buckets=16,
        ),
        pa.schema([("doc_id", pa.int64())]),
    )


# --- per-doc top terms by a log-free tf-idf-style weight ----------------------


@register(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.term,
             round_even(tf.tf * (n.n - df.df + 0.5) / (df.df + 0.5), 6) AS score
      FROM tf JOIN df USING (term), n
    ),
    r AS (SELECT doc_id, term, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term) AS rk
          FROM sc)
    SELECT doc_id, term, score, rk AS rank FROM r WHERE rk <= 3
    """,
)
def tfidf_top_terms(sf_dir: str):
    """Top-3 characteristic terms per document by the log-free BM25-style
    weight tf*(N-df+0.5)/(df+0.5) (stages/text.py tfidf_top_terms: term
    postings bucket-shuffled once for exact in-bucket df + scoring, then
    re-bucketed by doc for the top-k). Rational arithmetic keeps the
    score bit-identical to the SQL oracle — numpy and DuckDB ln()
    disagree by ~2 ulp, so the classic log idf cannot pass a hash gate."""
    from ..stages.text import tfidf_top_terms as _tfidf

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()
    return _tfidf(docs, "text", "doc_id", n_docs=n_docs, k=3)
