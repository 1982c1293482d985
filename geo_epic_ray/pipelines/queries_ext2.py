"""Query registry, part 3 (round 2 additions): graph clustering for
near-dup groups, window-frame rolling aggregates, per-group top-k, pivot
(wide conditional aggregation), distributed k-means, and count-min
frequency estimation.

Registered into the same QUERIES/ORACLES dicts as pipelines.queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .queries import register

_LANGS = ["de", "en", "es", "fr", "zh"]


# --- near-dup clusters: blocked Jaccard pairs -> connected components -------

# Edges: doc pairs in the same (n_chars, lang) block (a standard cheap
# dedup blocking key) with char-5-gram Jaccard >= 0.2; components give the
# keep-one-canonical cluster ids. The engine runs the GENERIC distributed
# hash-to-min algorithm (stages/components.py); the oracle computes the
# same fixpoint with a recursive transitive closure (fine at gate scale).
_EDGE_CTES = """pairs AS (
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
edges AS MATERIALIZED (
  SELECT na.id_a, na.id_b
  FROM na JOIN nb ON na.id_a = nb.id_a AND na.id_b = nb.id_b
  LEFT JOIN inter ON na.id_a = inter.id_a AND na.id_b = inter.id_b
  WHERE COALESCE(inter.n, 0) * 1.0
        / (na.n + nb.n - COALESCE(inter.n, 0)) >= 0.2
),
sym AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION ALL SELECT id_b, id_a FROM edges
)"""

_REACH_CTE = """reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON s.a = r.dst
)"""

_CC_SQL = f"""
WITH RECURSIVE {_EDGE_CTES},
{_REACH_CTE}
SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1
"""


def _pagerank_canonical_sql(n_iter: int = 15, damping: float = 0.85) -> str:
    """Unrolled power iteration (one CTE per round) over the blocked
    near-dup edges — bit-matching stages/components.pagerank's update
    rank' = (1-d)/n + d * sum(rank/deg) over edge endpoints — joined with
    the recursive-closure components; canonical = highest ROUNDED rank,
    tie -> min doc_id (the engine sorts on the rounded rank too, so the
    two sides order identically)."""
    steps = []
    prev = "pr0"
    for i in range(1, n_iter + 1):
        steps.append(f"""pr{i} AS (
  SELECT s.b AS node,
         (1.0 - {damping}) / nn.n + {damping} * sum(p.r / d.d) AS r
  FROM pr{i - 1} p JOIN sym s ON s.a = p.node JOIN deg d ON d.a = p.node, nn
  GROUP BY s.b, nn.n
)""")
        prev = f"pr{i}"
    chain = ",\n".join(steps)
    return f"""
WITH RECURSIVE {_EDGE_CTES},
deg AS (SELECT a, count(*) AS d FROM sym GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT a AS node, 1.0 / nn.n AS r FROM deg, nn),
{chain},
{_REACH_CTE},
comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1)
SELECT c.doc_id, c.component,
       round_even(COALESCE(p.r, 0.0), 6) AS rank,
       row_number() OVER (
         PARTITION BY c.component
         ORDER BY round_even(COALESCE(p.r, 0.0), 6) DESC, c.doc_id
       ) = 1 AS canonical
FROM comp c LEFT JOIN {prev} p ON p.node = c.doc_id
ORDER BY c.doc_id
"""


@register("dedup_components", _CC_SQL)
def dedup_components(sf_dir: str):
    """Near-duplicate CLUSTERS (not just pairs): equality-block by
    (n_chars, lang), all-pairs + exact char-5-gram Jaccard >= 0.2 verify
    in ONE shuffle (stages/dedup.py blocked_pair_edges — text rides the
    block shuffle, shingles built once per doc per bucket), then GENERIC
    distributed connected components (stages/components.py: local
    union-find closure per bucket + hash-to-min emissions, one bucketed
    shuffle per round) labels every doc with its cluster's min doc_id.
    Canonical-doc selection is then ``component == doc_id``."""
    from ..stages.components import connected_components
    from ..stages.dedup import blocked_pair_edges

    # docs feeds both the edge builder and the node list — pin the blocks
    # once (dual-consumer rule)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).materialize()
    edges = blocked_pair_edges(
        docs, ["n_chars", "lang"], "doc_id", "text", threshold=0.2
    )
    nodes = docs.select_columns(["doc_id"]).map_batches(
        lambda b: pd.DataFrame({"id_a": b.doc_id}), batch_format="pandas"
    )
    return connected_components(
        edges.select_columns(["id_a", "id_b"]),
        nodes,
        node_col="doc_id",
        label_col="component",
    )


@register("dedup_clusters_blocked", _CC_SQL)
def dedup_clusters_blocked(sf_dir: str):
    """Same clusters as ``dedup_components`` via the BLOCK-LOCAL fast path
    (stages/components.py blocked_components): when candidate edges are
    generated only inside an equality block, components cannot span
    blocks, so ONE bucketed shuffle + a per-bucket min-label closure
    replaces the iterative hash-to-min rounds — count stages first. The
    generic operator remains gated by ``dedup_components``; this query
    proves the specialised plan returns the identical labeling (same
    recursive-SQL oracle, bit-exact)."""
    from ..stages.components import blocked_components

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    return blocked_components(
        docs, ["n_chars", "lang"], "doc_id", "text", threshold=0.2
    )


# --- window frame: 7-row rolling mean of daily event counts ------------------


@register(
    "rolling_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, n,
           round_even(sum(n) OVER w * 1.0 / count(n) OVER w, 4) AS avg7
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_daily_events(sf_dir: str):
    """Window-frame aggregate (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW):
    daily event counts per type with their 7-row trailing mean. Counts are
    integers, so the rolling sum is exact and the single double division
    matches SQL bit-for-bit. Partial per-batch counts -> bucketed grouped
    merge + in-group vectorized rolling (pandas .rolling) — the group is
    calendar-bounded, never corpus-bounded."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.assign(d=b.ts.dt.floor("D"), one=1)
            .groupby(["event_type", "d"], as_index=False)["one"]
            .sum()
        )
        return g.rename(columns={"one": "n"})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type"):
            g = g.groupby("d", as_index=False)["n"].sum().sort_values("d")
            s = g.n.rolling(7, min_periods=1).sum()
            c = g.n.rolling(7, min_periods=1).count()
            out.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "d": pd.to_datetime(g.d),
                        "n": g.n.astype("int64"),
                        "avg7": (s / c).round(4),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["event_type"], agg, n_buckets=8
    )


# --- per-group top-k (window rank) ------------------------------------------


@register(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(sf_dir: str):
    """Top-3 orders per customer by price (deterministic tie-break on
    orderkey). Per-batch partial top-3 per key bounds the shuffle to
    3 rows/key/batch; a bucketed grouped pass finishes — the global-top-k
    sibling of top_orders_by_price, keyed per group."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        )
        return b.groupby("o_custkey", as_index=False, sort=False).head(3)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        )
        out = df.groupby("o_custkey", as_index=False, sort=False).head(3).copy()
        out["rank"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["o_custkey"], agg
    )


# --- pivot: wide conditional aggregation ------------------------------------


@register(
    "pivot_lang_counts",
    """
    SELECT source,
      count(CASE WHEN lang = 'de' THEN 1 END) AS n_de,
      count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
      count(CASE WHEN lang = 'es' THEN 1 END) AS n_es,
      count(CASE WHEN lang = 'fr' THEN 1 END) AS n_fr,
      count(CASE WHEN lang = 'zh' THEN 1 END) AS n_zh,
      count(*) AS n_total
    FROM documents GROUP BY source
    """,
)
def pivot_lang_counts(sf_dir: str):
    """Pivot documents to one wide row per source with per-language
    counts (conditional aggregation). Partial (source, lang) counts per
    batch, bucketed grouped merge, in-group pivot to the fixed language
    columns."""
    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.assign(one=1)
            .groupby(["source", "lang"], as_index=False)["one"]
            .sum()
        )
        return g.rename(columns={"one": "n"})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False)["n"].sum()
        out = []
        for src, grp in g.groupby("source"):
            by = dict(zip(grp.lang, grp.n))
            row = {"source": src}
            for lang in _LANGS:
                row[f"n_{lang}"] = np.int64(by.get(lang, 0))
            row["n_total"] = np.int64(grp.n.sum())
            out.append(row)
        return pd.DataFrame(out)

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["source"], agg, n_buckets=8
    )


# --- distributed k-means (oracle: unrolled Lloyd iterations in SQL) ----------


def _kmeans_sql(k: int = 8, n_iter: int = 4) -> str:
    """Unrolled Lloyd k-means matching stages/cluster.kmeans_fit: init =
    the k smallest vec_ids, each round assigns by squared-L2 argmin (tie
    -> lowest centroid id, same as np.argmin) and re-means non-empty
    clusters (empty ones keep their previous centroid); the reported
    stats are the LAST round's assignment against the PRE-update
    centroids, inertia rounded to 3. The engine computes distances in
    the expanded |x|^2 - 2x.c + |c|^2 form and SQL in the direct
    sum-of-squares form — equal up to ~1e-12, far inside both the
    assignment margins of this corpus and the round-3 inertia grid."""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f"""d{i} AS (
  SELECT v.vec_id, c.cid, sum((v.x - c.val) * (v.x - c.val)) AS d2
  FROM v JOIN c{i - 1} c ON c.j = v.j GROUP BY 1, 2
),
a{i} AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
),
c{i} AS (
  SELECT p.cid, p.j, COALESCE(m.mu, p.val) AS val
  FROM c{i - 1} p LEFT JOIN (
    SELECT a.cid, v.j, sum(v.x) / count(*) AS mu
    FROM a{i} a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2
  ) m ON m.cid = p.cid AND m.j = p.j
)""")
    chain = ",\n".join(steps)
    return f"""
WITH v AS MATERIALIZED (
  SELECT e.vec_id, t.j, CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE) AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) t(j)
),
c0 AS MATERIALIZED (
  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, j, x AS val
  FROM v WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
{chain}
SELECT g.cid AS centroid_id,
       COALESCE(s.n, 0) AS n,
       round_even(COALESCE(s.sse, 0.0), 3) AS inertia
FROM (SELECT unnest(generate_series(0, {k - 1})) AS cid) g
LEFT JOIN (SELECT cid, count(*) AS n, sum(d2) AS sse
           FROM a{n_iter} GROUP BY 1) s ON s.cid = g.cid
ORDER BY centroid_id
"""


@register("kmeans_embeddings", _kmeans_sql())
def kmeans_embeddings(sf_dir: str):
    """Lloyd k-means over the embedding table (stages/cluster.py):
    centroids broadcast per iteration, per-batch vectorized assignment +
    partial sums, bounded driver merge. Deterministic init (k smallest
    vec_ids). Exactness vs a single-process numpy twin is locked in
    tests/test_cluster.py; the DuckDB oracle replays all four Lloyd
    rounds as unrolled CTEs (bit-exact after round-3 inertia)."""
    from ..stages.cluster import kmeans_fit

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    _, stats = kmeans_fit(ds, k=8, n_iter=4)
    stats = stats.copy()
    stats["inertia"] = stats["inertia"].round(3)
    return stats


def _semdedup_sql() -> str:
    from . import oracle_sql

    return oracle_sql.semdedup_keep_sql()


@register("semdedup_keep", _semdedup_sql())
def semdedup_keep(sf_dir: str):
    """SemDeDup semantic dedup (stages/cluster.py semdedup): k-means
    clusters + within-cluster greedy cosine pruning at 0.9, over the
    embedding table augmented with deterministic perturbed twins of the
    first 32 vectors (cosine ~0.9996 planted near-dups, derived in-stream
    with the same splitmix multiplicative jitter as embedding_dup_pairs).
    Every twin must be pruned (kept=false) while its original survives —
    asserted here so the gate run itself proves the semantic-dedup
    behavior; exact equality vs a single-process greedy twin is locked in
    tests/test_cluster.py. The oracle unrolls the Lloyd rounds, the final
    assignment and the greedy keep-first sweep in SQL (every cosine this
    corpus compares sits >=0.1 away from the 0.9 threshold, so the
    1e-12-scale numeric daylight between numpy and DuckDB cannot flip a
    decision) — hash-exact, not rows-only."""
    import numpy as np

    from ..fixtures.rng import uniform as _sm_uniform
    from ..stages.cluster import semdedup

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def plant_twins(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b.vec_id < 32]
        if not len(sel):
            return b
        emb = np.stack(sel.embedding.to_numpy())
        d = emb.shape[1]
        twins = []
        for vid, v in zip(sel.vec_id.to_numpy(), emb):
            idx = int(vid) * d + np.arange(d, dtype=np.int64)
            g = _sm_uniform(idx, 9000, 3) * 2.0 - 1.0
            twins.append((v.astype(np.float64) * (1.0 + 0.04 * g)).astype(emb.dtype))
        extra = pd.DataFrame(
            {"vec_id": sel.vec_id.to_numpy() + 1_000_000, "embedding": twins}
        )
        return pd.concat([b, extra], ignore_index=True)

    out = semdedup(
        ds.map_batches(plant_twins, batch_format="pandas"),
        k=8, n_iter=4, threshold=0.9,
    ).to_pandas()
    twins = out[out.vec_id >= 1_000_000].set_index(out.vec_id[out.vec_id >= 1_000_000] - 1_000_000)
    originals = out[out.vec_id < 32].set_index("vec_id")
    # a twin is guaranteed pruned only when it lands in its original's
    # cluster (a boundary vector can flip clusters under perturbation —
    # SemDeDup's per-cluster scope, not an engine defect)
    co = twins.cluster_id == originals.cluster_id.reindex(twins.index)
    assert co.any() and not twins.kept[co].any(), "co-clustered twins must be pruned"
    assert originals.kept.all(), "originals must survive"
    return out.sort_values("vec_id").reset_index(drop=True)


# --- count-min frequency estimates (rows-only: sketch, estimate) -------------


def _cms_sql() -> str:
    from . import oracle_sql

    return oracle_sql.cms_token_counts_sql()


@register("cms_token_counts", _cms_sql())
def cms_token_counts(sf_dir: str):
    """Count-min sketch token frequencies vs exact counts for the
    heavy-hitter tokens: the CMS estimate must be >= the true count
    (one-sided error) and close at this width. Exact side reuses the
    scale-safe bucketed histogram; the CMS side is one streaming pass of
    mergeable per-batch sketches. Keys are FNV+splitmix token hashes, so
    the sketch itself is replayed bit-exactly by the SQL oracle."""
    from ..stages.aggregates import bucketed_group_agg
    from ..stages.dedup import _token_hashes
    from ..stages.sketches import cms_counts

    # ds feeds both the exact histogram and the CMS pass — pin once
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).materialize()

    def explode_count(b: pd.DataFrame) -> pd.DataFrame:
        toks = b.text.str.split(" ").explode()
        g = toks.groupby(toks).size()
        return pd.DataFrame({"tok": g.index, "partial": g.values})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)["partial"].sum().rename(
            columns={"partial": "n"}
        )
        return g[g.n >= 50]

    exact = bucketed_group_agg(
        ds.map_batches(explode_count, batch_format="pandas"), ["tok"], agg
    ).to_pandas()  # driver merge bounded: tokens with >= 50 occurrences
    top = exact.sort_values(["n", "tok"], ascending=[False, True]).head(20)

    def explode_tokens(b: pd.DataFrame) -> pd.DataFrame:
        # FNV-1a + splitmix finisher token keys (stages/dedup._token_hashes):
        # process-independent AND replayable in SQL, unlike pandas'
        # siphash, so the CMS estimate itself gets a bit-exact oracle
        toks = b.text.str.split(" ").explode()
        return pd.DataFrame(
            {"tok_hash": _token_hashes(toks.tolist(), 0).view(np.int64)}
        )

    est = cms_counts(
        ds.map_batches(explode_tokens, batch_format="pandas"),
        "tok_hash",
        _token_hashes(top.tok.tolist(), 0).view(np.int64),
    )
    out = top.reset_index(drop=True).copy()
    out["cms_n"] = est
    out["one_sided_ok"] = out.cms_n >= out.n
    return out.rename(columns={"n": "exact_n"})


# --- grouped approximate quantiles (sketch, rows-only) -----------------------


def _grouped_tdigest_sql() -> str:
    from . import oracle_sql

    return oracle_sql.grouped_tdigest_replay_sql()


@register("grouped_quantiles_tdigest", _grouped_tdigest_sql())
def grouped_quantiles_tdigest(sf_dir: str):
    """A2 percentile profile at scale: per-key t-digests (mergeable, a few
    hundred centroids per key regardless of group size) vs the exact
    per-group quantiles — reported side by side with the absolute error.
    Uses the DETERMINISTIC binned construction (the keyed variant of
    binned_tdigest_quantiles), so the DuckDB oracle replays the digest
    itself bit-exactly — estimate, exact, and error all hash-checked;
    the classic greedy digest (block-boundary-dependent, not replayable)
    remains in stages/sketches.py with rank-error pytest coverage."""
    from ..stages.aggregates import bucketed_group_agg
    from ..stages.sketches import grouped_binned_tdigest_quantiles

    # ds feeds both the digest pass and the exact pass — pin once
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).materialize()
    est = grouped_binned_tdigest_quantiles(
        ds, "event_type", "value", "event_id", [0.1, 0.5, 0.9],
        delta=100, n_buckets=8,
    ).to_pandas()  # 5 keys

    def exact_agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k_, g in df.groupby("event_type"):
            v = g.value.to_numpy()
            rows.append(
                {
                    "event_type": k_,
                    "e10": np.quantile(v, 0.1),
                    "e50": np.quantile(v, 0.5),
                    "e90": np.quantile(v, 0.9),
                }
            )
        return pd.DataFrame(rows, columns=["event_type", "e10", "e50", "e90"])

    exact = bucketed_group_agg(ds, ["event_type"], exact_agg, n_buckets=8).to_pandas()
    out = est.merge(exact, on="event_type").sort_values("event_type")
    for c, e in [("p10", "e10"), ("p50", "e50"), ("p90", "e90")]:
        out[f"err_{c}"] = (out[c] - out[e]).abs().round(4)
        out[c] = out[c].round(4)
        out[e] = out[e].round(4)
    return out.reset_index(drop=True)


# --- interleaved-span operators (rows-only: the driver's parquet documents
# table is flat; these run on the deterministic interleaved fixture) ----------


def _span_rt_sql() -> str:
    from . import oracle_sql

    return oracle_sql.span_roundtrip_sql(n_docs=2000)


@register("span_roundtrip", _span_rt_sql())
def span_roundtrip(sf_dir: str):
    """The north-rule per-row invariant as a gate: explode the interleaved
    corpus to one-row-per-span, hash-partition + reassemble, and compare
    the order-sensitive span-sequence hash of output vs input. match must
    be True. Uses the ORACLE-GRADE hash (state/manifest.span_hash_fnv —
    pure FNV/splitmix integer math), so the DuckDB oracle recomputes the
    expected hash from the fixture draws alone: a round trip that
    reorders, drops or mutates ANY span field changes hash_out and fails
    the driver's compare, not just the in-query assert."""
    import pyarrow as pa

    from ..fixtures.documents import documents_batch
    from ..stages.spans import explode_spans, reassemble_spans
    from ..state.manifest import span_hash_fnv

    table = documents_batch(np.arange(2000, dtype=np.int64))
    ds = rd.from_arrow(table).repartition(8)
    rt = reassemble_spans(explode_spans(ds), n_buckets=8)
    out = pa.concat_tables(
        [pa.table(b) for b in rt.iter_batches(batch_format="pyarrow")]
    )
    h_in, h_out = span_hash_fnv(table), span_hash_fnv(out)
    return pd.DataFrame(
        {
            "n_docs_in": [table.num_rows],
            "n_docs_out": [out.num_rows],
            "hash_in": [h_in],
            "hash_out": [h_out],
            "match": [h_in == h_out and table.num_rows == out.num_rows],
        }
    )


def _span_kind_stats_sql() -> str:
    from . import oracle_sql

    return oracle_sql.span_kind_stats_sql(n_docs=2000)


@register("span_kind_stats", _span_kind_stats_sql())
def span_kind_stats(sf_dir: str):
    """Per-kind span census over the interleaved corpus: explode (zero-copy
    Arrow flatten) -> partial counts/char-sums per kind -> tiny grouped
    merge. The media/text split that sizes a multimodal pipeline's decode
    stages."""
    from ..fixtures.documents import documents_batch
    from ..stages.aggregates import partials_to_driver
    from ..stages.spans import explode_spans

    table = documents_batch(np.arange(2000, dtype=np.int64))
    long = explode_spans(rd.from_arrow(table).repartition(8))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(chars=b.text.str.len(), one=1).groupby("kind", as_index=False).agg(
            n=("one", "sum"), chars=("chars", "sum")
        )
        return g

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("kind", as_index=False).sum()
        return g.sort_values("kind").reset_index(drop=True)

    # driver merge bounded: 3 kinds x #blocks
    return partials_to_driver(long.map_batches(partial, batch_format="pandas"), final)


# --- incremental dedup: new docs vs a prior corpus snapshot ------------------


@register(
    "incremental_dedup_new",
    """
    WITH split AS (SELECT (max(doc_id) + 1) // 2 AS s FROM documents)
    SELECT d.doc_id FROM documents d, split
    WHERE d.doc_id >= split.s
      AND NOT EXISTS (
        SELECT 1 FROM documents o
        WHERE o.doc_id < split.s
          AND substr(o.text, 1, 10) = substr(d.text, 1, 10)
      )
    """,
)
def incremental_dedup_new(sf_dir: str):
    """Incremental-ingestion dedup: keep only NEW docs (id >= split) whose
    10-char blocking prefix was never seen in the OLD corpus (id < split).
    The scale shape: a constant-size Bloom filter of old prefix
    fingerprints is merged driver-side and broadcast (NOT the key set);
    Bloom misses are definitely-novel and never shuffle; only the Bloom
    hits (true dups + ~0 false positives) go through an exact bucketed
    anti-join on the prefix string. Exactness never depends on the hash:
    the residual check compares the prefixes themselves."""
    import ray

    from ..stages.sketches import BloomFilter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def prefixed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b.doc_id, "prefix": b.text.str.slice(0, 10)})

    # ONE corpus scan: the (id, prefix) projection is ~18 bytes/doc and
    # feeds four consumers (max, bloom partials, both anti-join sides) —
    # without materializing, each consumer re-reads and re-projects.
    pref = docs.map_batches(prefixed, batch_format="pandas").materialize()

    # ONE more pass computes BOTH driver-side scalars: the per-block max
    # (for the old/new split) and a per-block Bloom of EVERY prefix
    # tagged by the block's id range. Old-ness is decided at merge time:
    # a block's Bloom is folded in only when its ids lie under the split
    # (mixed blocks are re-filtered in one tiny driver pass) — so the
    # split doesn't need its own execution before the Bloom pass.
    def scalar_partial(b: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter(1 << 20, 4).add(b.prefix.to_numpy())
        return pd.DataFrame(
            {"lo": [int(b.doc_id.min())], "hi": [int(b.doc_id.max())],
             "bits": [f.bits.tobytes()]}
        )

    parts = pref.map_batches(scalar_partial, batch_format="pandas").to_pandas()
    split = (int(parts.hi.max()) + 1) // 2
    old = pref.filter(expr=f"doc_id < {split}")
    new = pref.filter(expr=f"doc_id >= {split}")

    acc = BloomFilter(1 << 20, 4)
    for _, row in parts.iterrows():  # one constant-size row per BLOCK
        if row.hi < split:
            acc.bits |= np.frombuffer(row.bits, dtype=np.uint8)
    # blocks straddling the split (id-ordered read: at most a handful)
    # over-count only on the new side, so their old-side prefixes are
    # re-added exactly via one bounded filtered pass
    straddle = parts[(parts.lo < split) & (parts.hi >= split)]
    if len(straddle):
        lo = int(straddle.lo.min())
        extra = pref.filter(expr=f"doc_id >= {lo} and doc_id < {split}")
        acc.add(extra.to_pandas().prefix.to_numpy())
    bloom_ref = ray.put(acc)

    def split_by_bloom(hit: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            fl = ray.get(bloom_ref)
            m = fl.contains(b.prefix.to_numpy())
            return b[m] if hit else b[~m]

        return f

    novel_fast = new.map_batches(split_by_bloom(False), batch_format="pandas")
    candidates = new.map_batches(split_by_bloom(True), batch_format="pandas")

    # exact residual: bucketed anti-join of candidates vs old prefixes on
    # the cogroup exchange (no padded union, no sort-shuffle fixed cost —
    # the union+groupby form measured ~2s of the query's 4.1s)
    from ..stages import exchange

    parts_old, parts_cand = exchange.scatter_pair(
        old, exchange.key_cols_bucket_fn(["prefix"], 32),
        candidates, exchange.key_cols_bucket_fn(["prefix"], 32),
        32,
    )

    def anti(old_df: pd.DataFrame | None, cand_df: pd.DataFrame | None) -> pd.DataFrame:
        if cand_df is None or not len(cand_df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
        if old_df is None or not len(old_df):
            keep = cand_df
        else:
            keep = cand_df[~cand_df.prefix.isin(set(old_df.prefix))]
        return keep[["doc_id"]].astype({"doc_id": "int64"})

    rescued = exchange.cogroup_map(
        parts_old, parts_cand, anti,
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)}),
        require="right",
    )
    from .queries import schema_stable

    # an all-dup ingest (every new prefix already in the old corpus) is a
    # legitimate outcome — keep the doc_id schema on the empty result
    return schema_stable(
        novel_fast.select_columns(["doc_id"]).union(rescued),
        pa.schema([("doc_id", pa.int64())]),
    )


@register("pagerank_canonical", _pagerank_canonical_sql())
def pagerank_canonical(sf_dir: str):
    """Centrality-based canonical-document selection: PageRank over the
    blocked near-dup graph (stages/components.py pagerank — BSP task
    waves, adjacency built once per bucket), cogrouped with the cluster
    labels, then one grouped argmax picks each cluster's most-central
    member (tie -> min doc_id). The keep-one alternative to min-id
    canonicalization: the highest-rank member is the one most similar to
    the rest of its cluster. Iterative float scores -> rows-only;
    power-iteration exactness is locked in tests/test_components.py."""
    from ..stages import exchange
    from ..stages.components import connected_components, pagerank
    from ..stages.dedup import blocked_pair_edges

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).materialize()
    # the expensive shingle/Jaccard edge kernel runs ONCE: the
    # materialized edges feed pagerank AND the component labeling
    edges = blocked_pair_edges(
        docs, ["n_chars", "lang"], "doc_id", "text", threshold=0.2
    ).materialize()
    pr = pagerank(edges, node_col="doc_id", n_iter=15)
    nodes = docs.select_columns(["doc_id"]).map_batches(
        lambda b: pd.DataFrame({"id_a": b.doc_id}), batch_format="pandas"
    )
    labels = connected_components(
        edges.select_columns(["id_a", "id_b"]), nodes,
        node_col="doc_id", label_col="component",
    )

    nb = 16
    key = exchange.hash_bucket_fn("doc_id", nb)

    def join2(l: pd.DataFrame, r: pd.DataFrame | None) -> pd.DataFrame:
        # left = labels (every doc), right = ranks (endpoints only): a
        # bucket may hold ONLY isolated docs (r is None) — they rank 0
        # and are trivially canonical
        if r is None:
            m = l.assign(rank=0.0)
        else:
            m = l.merge(r, on="doc_id", how="left")
            m["rank"] = m["rank"].fillna(0.0).round(6)
        return m

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "component": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=float),
        }
    )
    lparts, rparts = exchange.scatter_pair(labels, key, pr, key, nb)
    joined = exchange.cogroup_map(lparts, rparts, join2, empty, require="left")

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["component", "rank", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        first = ~g.component.duplicated()
        g = g.assign(canonical=first)
        return g

    from ..stages.aggregates import bucketed_group_agg

    out = bucketed_group_agg(joined, ["component"], canon, n_buckets=nb)
    # sanity: exactly one canonical per component
    return out
