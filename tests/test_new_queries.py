"""Crafted-corpus edge cases for the continuation queries — paths the
uniform gate tables never exercise (left-join NULLs, skew fan-out,
cross-batch dedup)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from geo_epic_ray.pipelines.queries import QUERIES


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), tmp_path / f"{name}.parquet"
    )


def test_left_join_emits_arrow_null_for_orderless_customers(ray_session, tmp_path):
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2, 3], dtype=np.int64),
                "c_nationkey": np.array([10, 11, 12], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([100, 101], dtype=np.int64),
                "o_custkey": np.array([1, 1], dtype=np.int64),
                "o_orderdate": pd.to_datetime(["2024-03-01", "2024-05-02"]),
            }
        ),
    )
    out = QUERIES["left_join_order_history"](str(tmp_path))
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    got = {r["c_custkey"]: r for r in tbl.to_pylist()}
    assert got[1]["n_orders"] == 2 and str(got[1]["last_order"]).startswith("2024-05-02")
    for ck in (2, 3):  # customers with no orders: count 0, true Arrow NULL
        assert got[ck]["n_orders"] == 0 and got[ck]["last_order"] is None
    assert tbl.column("last_order").null_count == 2


def test_salted_join_fans_out_hot_key_and_stays_exact(ray_session, tmp_path):
    n = 9000  # one key holds ~89% of rows -> multiple salts at target 2000
    et = np.where(np.arange(n) % 9 == 0, "rare", "hot")
    _write(
        tmp_path,
        "events",
        pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "event_type": et}),
    )
    out = (
        QUERIES["salted_join_hot_keys"](str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    want = pd.Series(et).value_counts()
    assert (out.type_count.to_numpy() == want[out.event_type].to_numpy()).all()


def test_curation_dedup_spans_batches(ray_session, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to find a quiet place for the night "
        "while the old owl watches from a tall tree and the wind moves "
        "softly through the leaves of the silent wood for hours on end"
    )
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        # duplicates (up to whitespace/case noise) scattered across the id
        # range -> they land in different read batches
        texts.append(base.upper() if i % 13 == 5 else (base + f" tail {i % 7}"))
    df = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})
    _write(tmp_path, "documents", df)
    out = (
        QUERIES["curation_end_to_end"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # normalized dedup: each distinct (lowered, ws-collapsed) text keeps
    # only its smallest doc_id
    norm = df.text.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    keep_first = df.doc_id[~norm.duplicated()].to_numpy()
    assert set(out.doc_id) <= set(keep_first)
    # bins are a non-decreasing prefix-sum partition in doc_id order
    assert (np.diff(out.bin.to_numpy()) >= 0).all()


def test_funnel_null_stages_and_strict_ordering(ray_session, tmp_path):
    """Funnel edge cases the dense gate tables never hit: a user who
    clicks BEFORE their first view (click must not count), a user who
    never purchases, and a user with no view at all."""
    rows = [
        # user 1: click@t0 (before view) must be ignored; click@t2 counts
        (1, "click", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-01 00:01:00"),
        (1, "click", "2024-01-01 00:02:00"),
        (1, "purchase", "2024-01-01 00:03:00"),
        # user 2: view then click, never purchases
        (2, "view", "2024-01-01 01:00:00"),
        (2, "click", "2024-01-01 01:05:00"),
        # user 3: purchases without ever viewing -> all stages NULL but t_view
        (3, "purchase", "2024-01-01 02:00:00"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df.ts)
    df["user_id"] = df.user_id.astype(np.int64)
    _write(tmp_path, "events", df)
    out = QUERIES["funnel_stage_times"](str(tmp_path))
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    got = {r["user_id"]: r for r in tbl.to_pylist()}
    assert str(got[1]["t_view"]).startswith("2024-01-01 00:01")
    assert str(got[1]["t_click"]).startswith("2024-01-01 00:02")  # not 00:00
    assert str(got[1]["t_purchase"]).startswith("2024-01-01 00:03")
    assert got[2]["t_purchase"] is None and got[2]["t_click"] is not None
    assert got[3]["t_view"] is None and got[3]["t_click"] is None


def test_pagerank_canonical_all_isolated_docs(ray_session, tmp_path):
    """A corpus with no near-duplicates: every rank bucket is empty
    (r=None in the cogroup), every doc is its own canonical cluster."""
    rng = np.random.default_rng(31)
    # genuinely dissimilar texts: independent random letter soup per doc
    # (no shared template, so char-5-gram Jaccard ~ 0), one shared block key
    texts = [
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), 60)) for _ in range(30)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * 30,
            "n_chars": np.full(30, 60, dtype=np.int64),
        }
    )
    _write(tmp_path, "documents", df)
    out = QUERIES["pagerank_canonical"](str(tmp_path)).to_pandas()
    assert len(out) == 30
    assert out.canonical.all()  # every doc canonical in its own cluster
    assert (out.component.to_numpy() == out.doc_id.to_numpy()).all()
