"""Query registry: one entry per implemented operator (SURVEY.md §2),
each with a Ray Data implementation and (where SQL-expressible) a DuckDB
oracle the driver runs side-by-side at sf=0.01.

Design rules for oracle parity:
- Geo queries derive (lat, lon) per doc with exact int64 modular arithmetic
  + IEEE-double ops that evaluate bit-identically in numpy and DuckDB
  (geo.extent.doc_point / doc_point_sql), so PIP / kNN / tiling results are
  integer-exact against floor/round SQL.
- Float aggregate outputs are rounded to a fixed number of decimals in BOTH
  implementations.
- Computed columns carry the same name in both (the driver sorts columns by
  name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..geo import extent
from ..geo.extent import doc_point_sql

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def schema_stable(ds: rd.Dataset, schema: pa.Schema):
    """Gate-contract shim for queries whose result can be LEGITIMATELY
    empty at some corpus shape (anti-joins, dedup survivors, pair
    finders): ``Dataset.to_pandas`` builds from ``iter_batches``, which
    yields ZERO batches for a 0-row dataset, so the driver's compare
    sees a 0-column frame and fails the schema check even when the
    oracle is also empty (caught by the 100x sweep: an all-clone corpus
    drives incremental_dedup_new / boilerplate_chunk_removal to empty).
    ``Dataset.schema()`` is correct — only the pandas conversion drops
    the columns — so materialize once (the driver consumes the result
    again immediately; the dual-consumer rule wants this anyway) and
    hand back a typed empty Arrow table when there are no rows.
    Production pipelines write Parquet (the writer preserves schema);
    this wrapper exists solely for the in-memory gate contract."""
    mat = ds.materialize()
    if mat.count() == 0:
        return schema.empty_table()
    return mat


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


# SQL fragments reused by the geo oracles.
_LAT, _LON = doc_point_sql("doc_id")


def _mukey_sql(lat: str, lon: str) -> str:
    return (
        f"(CAST(floor(({lat} - {extent.LAT0}) / {extent.SOIL_CELL_DEG}) AS BIGINT)"
        f" * {extent.SOIL_NCOLS}"
        f" + CAST(floor(({lon} - {extent.LON0}) / {extent.SOIL_CELL_DEG}) AS BIGINT))"
    )


def _tile_sql(lat: str, lon: str) -> str:
    return (
        f"((CAST(floor(({lat} - {extent.LAT0}) / {extent.PIXEL_DEG}) AS BIGINT)"
        f" // {extent.TILE_PX}) * {extent.N_TILE_COLS}"
        f" + (CAST(floor(({lon} - {extent.LON0}) / {extent.PIXEL_DEG}) AS BIGINT)"
        f" // {extent.TILE_PX}))"
    )


_MUKEY_SQL = _mukey_sql(_LAT, _LON)
def _grid_knn_cte() -> str:
    """Exact kNN oracle as SQL: the true haversine argmin over the 4
    surrounding lattice points (provably sufficient on a regular lattice —
    the cos(lat) weighting can shift the choice between adjacent rows but
    never by more than one row), ties to the lowest grid_id. A plain
    per-axis round() differs from true haversine for ~1/65k points near
    latitude midpoints, which the engine (correctly) resolves by distance.
    Distances are compared via the monotonic squared-chord term, matching
    the engine's argmin ordering."""
    s = extent.WEATHER_STEP_DEG
    nrows, ncols = extent.WEATHER_NROWS, extent.WEATHER_NCOLS
    return f"""
pts AS (SELECT doc_id, {_LAT} AS qlat, {_LON} AS qlon FROM documents),
knn_cand AS (
  SELECT doc_id, qlat, qlon,
         least(greatest(CAST(floor((qlat - {extent.LAT0}) / {s}) AS BIGINT) + dr.d, 0), {nrows - 1}) AS r,
         least(greatest(CAST(floor((qlon - {extent.LON0}) / {s}) AS BIGINT) + dc.d, 0), {ncols - 1}) AS c
  FROM pts, (SELECT unnest([0, 1]) AS d) dr, (SELECT unnest([0, 1]) AS d) dc
),
knn_pick AS (
  SELECT doc_id, r * {ncols} + c AS grid_id,
         pow(sin(radians(qlat - ({extent.LAT0} + r * {s})) / 2), 2)
         + cos(radians(qlat)) * cos(radians({extent.LAT0} + r * {s}))
           * pow(sin(radians(qlon - ({extent.LON0} + c * {s})) / 2), 2) AS chord
  FROM knn_cand
),
knn AS (
  SELECT doc_id, grid_id FROM knn_pick
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY chord, grid_id) = 1
)"""
_TILE_SQL = _tile_sql(_LAT, _LON)


def _enriched(sf_dir: str) -> rd.Dataset:
    """documents + derived point + PIP + kNN + tile (the real actor-pool
    code path, not the floor shortcut the oracles use)."""
    from .flagship import flagship_enrich

    return flagship_enrich(_docs(sf_dir), skew=False, concurrency=2, batch_size=4096)


# --- J1: site -> soil polygon (PIP) ----------------------------------------


@register(
    "geo_pip_soil",
    f"SELECT doc_id, {_MUKEY_SQL} AS mukey FROM documents",
)
def geo_pip_soil(sf_dir: str):
    return _enriched(sf_dir).select_columns(["doc_id", "mukey"])


# --- J2: site -> nearest weather grid cell (kNN) ----------------------------


@register(
    "geo_knn_weather",
    f"WITH {_grid_knn_cte()} SELECT doc_id, grid_id FROM knn",
)
def geo_knn_weather(sf_dir: str):
    return _enriched(sf_dir).select_columns(["doc_id", "grid_id"])


# --- J3: site -> tile (inverse affine) --------------------------------------


@register(
    "geo_tile_assign",
    f"SELECT doc_id, {_TILE_SQL} AS tile_id FROM documents",
)
def geo_tile_assign(sf_dir: str):
    return _enriched(sf_dir).select_columns(["doc_id", "tile_id"])


# --- flagship: all three joins at once --------------------------------------


_LAT_D, _LON_D = doc_point_sql("d.doc_id")


@register(
    "geo_enrich_full",
    f"WITH {_grid_knn_cte()} "
    f"SELECT d.doc_id, {_mukey_sql(_LAT_D, _LON_D)} AS mukey, knn.grid_id,"
    f" {_tile_sql(_LAT_D, _LON_D)} AS tile_id"
    f" FROM documents d JOIN knn ON d.doc_id = knn.doc_id",
)
def geo_enrich_full(sf_dir: str):
    return _enriched(sf_dir).select_columns(["doc_id", "mukey", "grid_id", "tile_id"])


# --- J4/A5 analog: zonal (per-tile) statistics ------------------------------


@register(
    "geo_tile_zonal",
    f"SELECT {_TILE_SQL} AS tile_id, count(*) AS n_docs,"
    f" CAST(sum(n_chars) AS BIGINT) AS sum_chars, round_even(avg(n_chars), 6) AS avg_chars"
    f" FROM documents GROUP BY 1",
)
def geo_tile_zonal(sf_dir: str):
    ds = _enriched(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("tile_id").agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )
        return g.reset_index()

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("tile_id")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["avg_chars"] = (batch.sum_chars / batch.n_docs).round(6)
        return batch

    return agg.map_batches(finish, batch_format="pandas")


# --- cell-prefix counting (the partitioner's measuring pass) ----------------


@register(
    "geo_cell_count",
    f"SELECT (CAST(floor(({_LAT} - {extent.LAT0}) / ({extent.LAT1} - {extent.LAT0}) * 64) AS BIGINT) * 64"
    f" + CAST(floor(({_LON} - {extent.LON0}) / ({extent.LON1} - {extent.LON0}) * 64) AS BIGINT)) AS rc_cell,"
    f" count(*) AS n FROM documents GROUP BY 1",
)
def geo_cell_count(sf_dir: str):
    """Row-major cell occupancy at res 6 (the salt-planning count)."""

    def cellify(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        lat, lon = extent.doc_point(ids)
        n = 64
        col = np.clip(((lon - extent.LON0) / (extent.LON1 - extent.LON0) * n).astype(np.int64), 0, n - 1)
        row = np.clip(((lat - extent.LAT0) / (extent.LAT1 - extent.LAT0) * n).astype(np.int64), 0, n - 1)
        return pa.table({"rc_cell": row * n + col})

    from ray.data.aggregate import Count

    return (
        _docs(sf_dir)
        .map_batches(cellify, batch_format="pyarrow")
        .groupby("rc_cell")
        .aggregate(Count(alias_name="n"))
    )


# --- TPC-H-style grouped aggregate with partial pre-aggregation -------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round_even(sum(l_quantity), 4) AS sum_qty,
           round_even(sum(l_extendedprice), 4) AS sum_base,
           round_even(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
           count(*) AS n_rows
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch.l_shipdate < pd.Timestamp("1997-01-01")]
        batch = batch.assign(disc=batch.l_extendedprice * (1 - batch.l_discount), one=1)
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), sum_base=("l_extendedprice", "sum"),
            sum_disc=("disc", "sum"), n_rows=("one", "sum"),
        )
        return g

    from ..stages.aggregates import partials_to_driver

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        for c in ("sum_qty", "sum_base", "sum_disc"):
            g[c] = g[c].round(4)
        return g

    # driver merge bounded: (returnflag x linestatus) ~ 6 keys x #blocks
    return partials_to_driver(ds.map_batches(partial, batch_format="pandas"), final)


# --- M1: select DSL ---------------------------------------------------------


@register(
    "select_dsl_filter",
    "SELECT event_id, user_id, value FROM events"
    " WHERE value > 100 AND event_type = 'click'",
)
def select_dsl_filter(sf_dir: str):
    from ..stages.select_dsl import select

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "value"]
    )
    out = select(ds, "value > 100 and event_type == 'click'", "event_id")
    return out.select_columns(["event_id", "user_id", "value"])


@register(
    "select_dsl_range",
    """
    WITH r AS (SELECT o_orderkey, o_custkey, o_totalprice,
                      row_number() OVER (ORDER BY o_orderkey) AS rn,
                      count(*) OVER () AS n
               FROM orders)
    SELECT o_orderkey, o_custkey, o_totalprice FROM r
    WHERE rn > floor(0.2 * n) AND rn <= floor(0.5 * n)
    """,
)
def select_dsl_range(sf_dir: str):
    from ..stages.select_dsl import select

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return select(ds, "Range(0.2, 0.5)", "o_orderkey")


@register(
    "select_dsl_union",
    "SELECT event_id, user_id, value FROM events"
    " WHERE value > 450 OR ((CAST(event_id AS HUGEINT) * 2654435761 + 40503)"
    " % 4294967296) < " + str(int(0.3 * 4294967296)),
)
def select_dsl_union(sf_dir: str):
    """'Random(0.3) + value > 450' — union of two selections, dedup on the
    id keeping the later branch (reference '+' semantics, misc.py:85-89)."""
    from ..stages.select_dsl import select

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return select(ds, "Random(0.3) + value > 450", "event_id").select_columns(
        ["event_id", "user_id", "value"]
    )


# --- M2/J10: broadcast semi / anti joins ------------------------------------


@register(
    "semi_join_orders",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           round_even(sum(o_totalprice), 4) AS sum_total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def semi_join_orders(sf_dir: str):
    from ..stages.joins import semi_join

    import pyarrow.dataset as pads

    # pushdown row filter: only the BUILDING keys reach the driver (the
    # broadcast key set), never the customer table
    keys = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    ).to_pandas()["c_custkey"]
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority", "o_totalprice"]
    )
    kept = semi_join(orders, keys, "o_custkey")
    from ..stages.aggregates import partials_to_driver

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(one=1).groupby("o_orderpriority", as_index=False).agg(
            n_orders=("one", "sum"), sum_total=("o_totalprice", "sum")
        )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("o_orderpriority", as_index=False).sum()
        g["sum_total"] = g.sum_total.round(4)
        return g

    # driver merge bounded: 5 order priorities x #blocks
    return partials_to_driver(
        kept.map_batches(partial, batch_format="pandas"), final
    )


@register(
    "anti_join_customers",
    "SELECT c_custkey, c_name FROM customer"
    " WHERE c_custkey NOT IN"
    " (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')",
)
def anti_join_customers(sf_dir: str):
    """Customers with no urgent order — the reference's missing-entity
    audit shape (M3/J10, geoEpic/workspace/validate.py:6-21)."""
    from ..stages.joins import anti_join

    import pyarrow.dataset as pads

    # pushdown row filter on the FACT table: only urgent-order custkeys
    # (the broadcast key set) reach the driver
    keys = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).to_pandas()["o_custkey"]
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return anti_join(cust, keys, "c_custkey")


# --- A3: grouped argmax (dominant component) --------------------------------


@register(
    "dominant_customer",
    """
    SELECT c_nationkey, c_custkey, c_acctbal FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) = 1
    """,
)
def dominant_customer(sf_dir: str):
    from ..stages.joins import group_argmax

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_custkey", "c_acctbal"]
    )
    return group_argmax(cust, "c_nationkey", "c_acctbal", "c_custkey")


# --- A4: layer consolidation (bin + grouped median) -------------------------


@register(
    "layer_consolidation",
    """
    SELECT l_partkey, CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bin,
           round_even(median(l_extendedprice), 4) AS med_price, count(*) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def layer_consolidation(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    from ..stages.aggregates import bucketed_group_agg

    def binify(b: pd.DataFrame) -> pd.DataFrame:
        b["qty_bin"] = np.floor(b.l_quantity / 10).astype(np.int64)
        return b[["l_partkey", "qty_bin", "l_extendedprice"]]

    def med(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_partkey", "qty_bin"], as_index=False).agg(
            med_price=("l_extendedprice", "median"), n=("l_extendedprice", "size")
        )
        g["med_price"] = g.med_price.round(4)
        return g

    # ~10k groups: bucketed aggregation (see stages/aggregates.py)
    return bucketed_group_agg(
        ds.map_batches(binify, batch_format="pandas"), ["l_partkey", "qty_bin"], med
    )


# --- A2: percentile profile -------------------------------------------------


@register(
    "percentile_profile",
    """
    SELECT event_type,
           round_even(quantile_cont(value, 0.1), 6) AS p10,
           round_even(quantile_cont(value, 0.9), 6) AS p90,
           round_even(avg(value), 6) AS mean_val
    FROM events GROUP BY event_type
    """,
)
def percentile_profile(sf_dir: str):
    """Exact grouped quantiles via map_groups — correct for the 5 event
    types here; groups too large to hold switch to the mergeable t-digest
    (stages/sketches.py:TDigest, gate query tdigest_value_quantiles)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prof(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g.event_type.iloc[0]],
                "p10": [round(g.value.quantile(0.1), 6)],
                "p90": [round(g.value.quantile(0.9), 6)],
                "mean_val": [round(g.value.mean(), 6)],
            }
        )

    return ds.groupby("event_type").map_groups(prof, batch_format="pandas")


# --- A6: PHU heat-unit accumulation -----------------------------------------


@register(
    "phu_heat_units",
    """
    SELECT user_id, round_even(sum(greatest(value * 0.2 - 15.0, 0.0)), 4) AS phu
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
    GROUP BY user_id
    """,
)
def phu_heat_units(sf_dir: str):
    """Sum of clipped heat units between two dates per entity — the exact
    shape of the reference's update_phu (geoEpic/io/opc.py:244-250)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def hu(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b.ts >= pd.Timestamp("2024-01-05")) & (b.ts < pd.Timestamp("2024-01-25"))]
        part = pd.DataFrame(
            {"user_id": b.user_id, "hu": np.maximum(b.value * 0.2 - 15.0, 0.0)}
        )
        # combine per batch before the shuffle
        return part.groupby("user_id", as_index=False)["hu"].sum()

    from ..stages.aggregates import bucketed_group_agg

    # user_id is UNBOUNDED at corpus scale -> bucketed grouped sum, not a
    # driver-side partial merge
    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["hu"].sum()
        g["phu"] = g.hu.round(4)
        return g.drop(columns=["hu"])

    return bucketed_group_agg(ds.map_batches(hu, batch_format="pandas"), ["user_id"], agg)


# --- §2.7: exact dedup (hash-partition + per-group first) -------------------


@register(
    "exact_dedup_first",
    "SELECT lang, source, min(doc_id) AS doc_id FROM documents GROUP BY lang, source",
)
def exact_dedup_first(sf_dir: str):
    """Keep-first dedup by key: min(doc_id) is associative, so each batch
    pre-combines to one row per key BEFORE any shuffle — only keys x
    blocks rows move (the combiner rule from stages/aggregates.py)."""
    from ..stages.aggregates import partials_to_driver

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "source"], as_index=False)["doc_id"].min()

    def final(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(["lang", "source"], as_index=False)["doc_id"].min()

    # driver merge bounded: (lang x source) ~ 100 keys x #blocks
    return partials_to_driver(ds.map_batches(partial, batch_format="pandas"), final)


# --- text analysis: token counting ------------------------------------------


@register(
    "token_count",
    "SELECT doc_id, CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens"
    " FROM documents",
)
def token_count(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b.doc_id, "n_tokens": b.text.str.split(" ").str.len().astype("int64")}
        )

    return ds.map_batches(count, batch_format="pandas")


@register(
    "text_quality",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len_chars,
           round_even(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / CAST(length(string_split(text, ' ')) AS BIGINT), 6) AS avg_tok_len
    FROM documents
    """,
)
def text_quality(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def q(b: pd.DataFrame) -> pd.DataFrame:
        n_tok = b.text.str.split(" ").str.len()
        nonspace = b.text.str.replace(" ", "", regex=False).str.len()
        return pd.DataFrame(
            {
                "doc_id": b.doc_id,
                "len_chars": b.text.str.len().astype("int64"),
                "avg_tok_len": (nonspace / n_tok).round(6),
            }
        )

    return ds.map_batches(q, batch_format="pandas")


# load part 2 of the registry (registers into the same dicts)
from . import queries_ext as _queries_ext  # noqa: E402,F401

# load part 3 of the registry (round-2 additions)
from . import queries_ext2 as _queries_ext2  # noqa: E402,F401
from . import queries_ext3 as _queries_ext3  # noqa: E402,F401
from . import queries_ext4 as _queries_ext4  # noqa: E402,F401


# --- driver correctness-window ordering -------------------------------------
# The driver's CORRECTNESS gate samples the FIRST 50 registration positions.
# Registration order is historical (rounds 1-4 appended), which left the
# engine's riskiest post-r2 components (substring dedup, SemDeDup, PQ, CC,
# windowed/exchange-based queries, multimodal codecs) past position 50 where
# only the local oracle mirror sees them. Reorder so the window = the geo
# core (unchanged, positions 1-6) + the hardest components; every query keeps
# its implementation and oracle, ALL still run under scripts/check_oracles.py.
_WINDOW_PRIORITY = [
    # geo core — keep the long-lived window positions 1-6; geo_knn_k3 is
    # the round-5 k>1 kNN gate (exact-haversine oracle)
    "geo_pip_soil", "geo_knn_weather", "geo_tile_assign", "geo_enrich_full",
    "geo_tile_zonal", "geo_cell_count", "geo_knn_k3",
    # flagship write/resume + hardest dedup/text components (post-r2)
    "flagship_write_resume", "substring_dedup", "semdedup_keep",
    "curation_end_to_end", "pq_topk_cosine", "dedup_components",
    "pagerank_canonical", "incremental_dedup_new", "ngram_jaccard_pairs",
    "salted_join_hot_keys", "boilerplate_chunk_removal",
    "decontamination_overlap", "tfidf_top_terms", "token_df_score",
    "bigram_perplexity", "ntile_length_quartiles", "left_join_order_history",
    "event_gap_stats", "session_windows", "asof_last_purchase",
    "dedup_keep_canonical", "dedup_clusters_blocked", "kmeans_embeddings",
    # multimodal codecs + span invariants (incl. the round-5 JPEG gate)
    "multimodal_jpeg_decode", "multimodal_audio_stats",
    "multimodal_video_framesample", "multimodal_decode_resize",
    "multimodal_feature_ann", "profile_lai",
    "span_roundtrip", "span_kind_stats",
    # curation/window/sketch stages added after the r2 window froze
    "sequence_pack_bins", "source_mix_weighted", "shuffle_train_order",
    "regex_redact", "word_repetition_score", "length_band_filter",
    "hll_distinct_per_type", "grouped_quantiles_tdigest", "cms_token_counts",
    "pivot_lang_counts", "rolling_daily_events", "top_orders_per_customer",
]


def _reorder_registry() -> None:
    assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"window names not registered: {missing}"
    rest = [n for n in QUERIES if n not in _WINDOW_PRIORITY]
    order = _WINDOW_PRIORITY + rest
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_registry()
