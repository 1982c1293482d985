"""Query registry, part 5 (round 2, late): the remaining training-data
curation operators — corpus-wide boilerplate-chunk removal (ccnet-style
paragraph dedup), compiled-regex redaction, weighted source mixing, and
sequence packing via a distributed prefix sum.

Registered into the same QUERIES/ORACLES dicts as pipelines.queries.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .queries import register

# --- corpus-wide boilerplate-chunk removal (ccnet-style) ---------------------

# Every doc is segmented into consecutive 5-word chunks (tail chunk may be
# shorter); a chunk appearing more than twice ACROSS THE CORPUS is dropped
# everywhere, and each doc is reassembled from its surviving chunks in
# order. Docs losing every chunk disappear (inner reassembly).
_BOILER_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (SELECT doc_id,
             unnest(range(0, CAST(ceil(len(words)/5.0) AS BIGINT))) AS k,
             words
      FROM t),
c2 AS (SELECT doc_id, k,
              array_to_string(words[5*k+1 : 5*k+5], ' ') AS chunk
       FROM c),
g AS (SELECT chunk, count(*) AS cnt FROM c2 GROUP BY chunk),
kept AS (SELECT c2.doc_id, c2.k, c2.chunk
         FROM c2 JOIN g USING(chunk) WHERE g.cnt <= 2)
SELECT doc_id, string_agg(chunk, ' ' ORDER BY k) AS clean_text,
       count(*) AS n_kept
FROM kept GROUP BY doc_id
"""


@register("boilerplate_chunk_removal", _BOILER_SQL)
def boilerplate_chunk_removal(sf_dir: str):
    """Corpus-wide repeated-chunk removal (the ccnet / RefinedWeb
    "remove boilerplate lines seen many times" pass) in exactly two
    shuffles: (1) chunks bucketed by hash(chunk) — every copy of a chunk
    lands together, so the global count AND the survivor filter happen in
    one grouped pass, no separate count⋈postings join; (2) survivors
    bucketed by doc_id for ordered reassembly. Chunking is vectorized per
    CHUNK INDEX (polars list.slice/list.join over all rows per k, never
    per row); reassembly is a polars group-join (Rust loop, not Python).
    """
    from ..stages.aggregates import bucketed_group_agg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def chunked(b: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(b).with_columns(
            pl.col("text").str.split(" ").alias("w")
        ).drop("text")
        d = d.with_columns(pl.col("w").list.len().cast(pl.Int64).alias("nw"))
        max_k = int((d["nw"].max() + 4) // 5) if len(d) else 0
        frames = []
        for k in range(max_k):
            part = d.filter(pl.col("nw") > 5 * k).select(
                "doc_id",
                pl.lit(k, dtype=pl.Int64).alias("k"),
                pl.col("w").list.slice(5 * k, 5).list.join(" ").alias("chunk"),
            )
            if len(part):
                frames.append(part)
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "k": pd.Series([], dtype=np.int64),
                 "chunk": pd.Series([], dtype=str)}
            )
        return pl.concat(frames).to_pandas()

    chunks = docs.map_batches(chunked, batch_format="pandas")

    def drop_boiler(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("chunk")["chunk"].transform("size")
        return g[cnt <= 2]

    # n_buckets is the reducer-count scale knob — 16 fits the gate corpus
    # (64 paid ~1.4s of extra per-task fixed cost for the same answer)
    kept = bucketed_group_agg(chunks, ["chunk"], drop_boiler, n_buckets=16)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(g).sort(["doc_id", "k"])
        out = d.group_by("doc_id", maintain_order=True).agg(
            pl.col("chunk").str.join(" ").alias("clean_text"),
            pl.len().cast(pl.Int64).alias("n_kept"),
        )
        return out.to_pandas()

    from .queries import schema_stable

    # a corpus where EVERY chunk is boilerplate (e.g. wholesale-cloned
    # docs) legitimately empties the result — keep the output schema
    return schema_stable(
        bucketed_group_agg(kept, ["doc_id"], reassemble, n_buckets=16),
        pa.schema(
            [("doc_id", pa.int64()), ("clean_text", pa.string()),
             ("n_kept", pa.int64())]
        ),
    )


# --- compiled-regex redaction (PII-scrub shape) ------------------------------

# The PII-redaction operator shape: a compiled pattern applied globally
# with a per-doc match count. The synthetic corpus has no emails/phones,
# so the pattern targets vocabulary terms; with real data the pattern
# list changes, the pipeline does not. Python re and DuckDB RE2 agree on
# this ASCII-only alternation + \b.
_REDACT_PAT = r"\b(customer|key|value)\b"
_REDACT_RE = re.compile(_REDACT_PAT)

_REDACT_SQL = rf"""
SELECT doc_id,
       regexp_replace(text, '{_REDACT_PAT}', '<X>', 'g') AS red_text,
       len(regexp_extract_all(text, '{_REDACT_PAT}')) AS n_redacted
FROM documents
"""


@register("regex_redact", _REDACT_SQL)
def regex_redact(sf_dir: str):
    """Global regex scrub + match count per doc — pattern compiled ONCE
    at module import (shipped compiled to every worker), applied with
    vectorized pandas str kernels; embarrassingly parallel, no shuffle."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b.doc_id,
             "red_text": b.text.str.replace(_REDACT_RE, "<X>", regex=True),
             "n_redacted": b.text.str.count(_REDACT_RE).astype(np.int64)}
        )

    return docs.map_batches(scrub, batch_format="pandas")


# --- weighted source mixing --------------------------------------------------

# Deterministic domain-mixture sampling: each source keeps a configured
# fraction of its docs, decided by a multiplicative hash of doc_id (no
# RNG — reproducible across runs, engines, and cluster sizes; the same
# doc is kept or dropped regardless of partitioning).
_MIX_RATES = {"src0": 10000, "src1": 5000, "src2": 2500, "src3": 1250}
_MIX_DEFAULT = 625  # 6.25% for the long tail of sources

_MIX_SQL = """
SELECT doc_id, lang, source FROM documents
WHERE (CAST(doc_id AS HUGEINT) * 2654435761 + 11) % 10000 <
  CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
              WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1250 ELSE 625 END
"""


@register("source_mix_weighted", _MIX_SQL)
def source_mix_weighted(sf_dir: str):
    """Weighted per-source sampling (the pretraining domain-mixing op):
    keep-threshold looked up per row (vectorized map), hash compared in
    uint64. No wrap vs the SQL HUGEINT path while doc_id < 2^33 — the
    multiplier is ~2^31.3, so the product stays under 2^64 (same bound
    stratified_sample relies on)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def mix(b: pd.DataFrame) -> pd.DataFrame:
        h = (
            b.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(11)
        ) % np.uint64(10000)
        thr = b.source.map(_MIX_RATES).fillna(_MIX_DEFAULT).to_numpy(np.uint64)
        return b[h < thr]

    return docs.map_batches(mix, batch_format="pandas")


# --- sequence packing via distributed prefix sum -----------------------------

_PACK_BUDGET = 4096
_PACK_W = 4096  # doc_ids per range bucket; scale W with the corpus so
#                 #buckets (= max_doc_id / W) stays driver-sized —
#                 W ~ 1e6 keeps 10^12 docs at ~10^6 buckets.

_PACK_SQL = f"""
SELECT doc_id,
  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       // {_PACK_BUDGET} AS BIGINT) AS bin
FROM documents
"""


@register("sequence_pack_bins", _PACK_SQL)
def sequence_pack_bins(sf_dir: str):
    """Sequence packing: assign each doc (ordered by doc_id) to a
    fixed-budget training bin by the EXCLUSIVE running sum of its size —
    a global prefix sum, the classic two-phase scan: (1) one streamed
    pass emits per-range-bucket partial sums (bucket = doc_id // W);
    the driver folds them into exclusive bucket offsets (#buckets rows —
    bounded by max_doc_id/W, see _PACK_W); (2) a bucketed grouped pass
    re-sorts each range bucket by doc_id and adds its offset to the
    in-bucket exclusive cumsum. No global sort, one small shuffle."""
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).materialize()  # two-phase scan: counts pass + rank pass


    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bk = b.doc_id.to_numpy() // _PACK_W
        return (
            pd.DataFrame({"bk": bk, "s": b.n_chars.to_numpy()})
            .groupby("bk", as_index=False)["s"].sum()
        )

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        tot = p.groupby("bk", as_index=False)["s"].sum().sort_values("bk")
        tot["off"] = tot.s.cumsum() - tot.s  # exclusive
        return tot[["bk", "off"]].reset_index(drop=True)

    offs = partials_to_driver(
        docs.map_batches(partial, batch_format="pandas"), fold
    )
    # tiny (#buckets rows) — shipped to workers via closure capture,
    # serialized once per task like any broadcast side table
    bk_ids = offs.bk.to_numpy()
    bk_off = offs.off.to_numpy()

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        bk = g.doc_id.to_numpy() // _PACK_W
        excl = g.n_chars.groupby(bk).cumsum().to_numpy() - g.n_chars.to_numpy()
        base = bk_off[np.searchsorted(bk_ids, bk)]
        return pd.DataFrame(
            {"doc_id": g.doc_id.to_numpy(),
             "bin": ((base + excl) // _PACK_BUDGET).astype(np.int64)}
        )

    def bucket_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bk"] = (b.doc_id.to_numpy() // _PACK_W).astype(np.int64)
        return b

    keyed = docs.map_batches(bucket_key, batch_format="pandas")
    return bucketed_group_agg(
        keyed,
        ["__bk"],
        lambda g: assign(g.drop(columns="__bk")),
        n_buckets=64,
    )


# --- per-language quantile length filter -------------------------------------

_QBAND_SQL = """
WITH q AS (
  SELECT lang,
         quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN q USING(lang)
WHERE d.n_chars BETWEEN q.lo AND q.hi
"""


@register("length_band_filter", _QBAND_SQL)
def length_band_filter(sf_dir: str):
    """Per-language outlier-length filter (keep docs between the p5 and
    p95 of n_chars within their language) — EXACT discrete quantiles at
    any scale via value histograms: one streamed pass emits per-batch
    (lang, n_chars, cnt) partials (driver-side cardinality bounded by
    #langs x #distinct lengths, both small by construction), the driver
    reads each language's quantile off the merged cumulative histogram
    with DuckDB's quantile_disc rank rule (value at 1-based rank
    ceil(q*n)), and a second pass filters against the broadcast
    thresholds. No shuffle, no sort."""
    from ..stages.aggregates import partials_to_driver

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).materialize()  # histogram pass + filter pass

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["lang", "n_chars"], as_index=False)
            .size().rename(columns={"size": "cnt"})
        )

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        h = (
            p.groupby(["lang", "n_chars"], as_index=False)["cnt"].sum()
            .sort_values(["lang", "n_chars"])
        )
        rows = []
        for lang, g in h.groupby("lang"):
            cum = g.cnt.cumsum().to_numpy()
            n = cum[-1]
            v = g.n_chars.to_numpy()
            lo = v[np.searchsorted(cum, int(np.ceil(0.05 * n)))]
            hi = v[np.searchsorted(cum, int(np.ceil(0.95 * n)))]
            rows.append({"lang": lang, "lo": lo, "hi": hi})
        return pd.DataFrame(rows)

    bands = partials_to_driver(
        docs.map_batches(partial, batch_format="pandas"), fold
    )
    lo = dict(zip(bands.lang, bands.lo))
    hi = dict(zip(bands.lang, bands.hi))

    def band_filter(b: pd.DataFrame) -> pd.DataFrame:
        lov = b.lang.map(lo).to_numpy()
        hiv = b.lang.map(hi).to_numpy()
        n = b.n_chars.to_numpy()
        return b[(n >= lov) & (n <= hiv)]

    return docs.map_batches(band_filter, batch_format="pandas")


# --- deterministic epoch-shuffle order (global rank, no global sort) ---------

_SHUF_SQL = """
WITH h AS (SELECT doc_id,
                  (CAST(doc_id AS HUGEINT) * 2654435761 + 17) % 4294967296
                    AS hv
           FROM documents)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""


@register("shuffle_train_order", _SHUF_SQL)
def shuffle_train_order(sf_dir: str):
    """Deterministic training-order shuffle: every doc gets its global
    0-based position in multiplicative-hash order — the epoch-shuffle op
    a pretraining pipeline needs, reproducible across runs, engines, and
    cluster sizes (no RNG, no seed state). No global sort: the hash
    domain is RANGE-bucketed (hv >> 26 -> 64 buckets), one streamed pass
    counts per bucket, the driver folds exclusive offsets (#buckets
    rows), and one bucketed pass ranks in-bucket by (hv, doc_id) and adds
    the offset. Ties are impossible below 2^32 docs (hv is a bijection
    mod 2^32) but doc_id breaks them identically to the SQL anyway."""
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        hv = (
            b.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(17)
        ) % np.uint64(4294967296)
        return pd.DataFrame(
            {"doc_id": b.doc_id.to_numpy(),
             "hv": hv.astype(np.int64),
             "__rb": (hv >> np.uint64(26)).astype(np.int64)}
        )

    hd = docs.map_batches(hashed, batch_format="pandas").materialize()  # counts pass + rank pass

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("__rb", as_index=False).size()

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        t = p.groupby("__rb", as_index=False)["size"].sum().sort_values("__rb")
        t["off"] = t["size"].cumsum() - t["size"]
        return t[["__rb", "off"]].reset_index(drop=True)

    offs = partials_to_driver(
        hd.map_batches(partial, batch_format="pandas"), fold
    )
    rb_ids = offs["__rb"].to_numpy()
    rb_off = offs["off"].to_numpy()

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for rb, sub in g.groupby("__rb", sort=False):
            order = np.lexsort((sub.doc_id.to_numpy(), sub.hv.to_numpy()))
            base = rb_off[np.searchsorted(rb_ids, rb)]
            pos = np.empty(len(sub), dtype=np.int64)
            pos[order] = base + np.arange(len(sub), dtype=np.int64)
            frames.append(pd.DataFrame({"doc_id": sub.doc_id.to_numpy(), "pos": pos}))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "pos": pd.Series([], dtype=np.int64)}
        )

    return bucketed_group_agg(hd, ["__rb"], rank, n_buckets=64)


# --- corpus-statistics LM score (mean token document frequency) --------------

_DF_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
j AS (SELECT w.doc_id, df.df FROM w JOIN df USING(word))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round_even(sum(df) * 1.0 / count(*), 6) AS mean_df
FROM j GROUP BY doc_id
"""


@register("token_df_score", _DF_SQL)
def token_df_score(sf_dir: str):
    """Corpus-statistics quality score (the KenLM-shape op: score every
    doc against a statistic of the WHOLE corpus): per-doc mean document
    frequency of its token occurrences, in exactly two shuffles — (1)
    occurrences bucketed by word, where each bucket holds every copy of
    its words, so the distinct-doc df AND the per-occurrence annotation
    happen in one grouped pass (no separate stats⋈occurrences join);
    (2) annotated occurrences bucketed by doc for the mean. Integer sums
    are exact; the final division is IEEE-identical to DuckDB's and
    rounded half-to-even on both sides."""
    from ..stages.aggregates import bucketed_group_agg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tokens(b: pd.DataFrame) -> pd.DataFrame:
        # pre-combine to DISTINCT (doc, word) rows with occurrence counts
        # before anything shuffles: object-dtype string copies are the
        # expensive part of a shuffle on this kernel, and a doc never
        # spans batches, so the per-batch combine is globally exact
        ex = b.text.str.split(" ").explode()
        f = pd.DataFrame(
            {"doc_id": b.loc[ex.index, "doc_id"].to_numpy(),
             "word": ex.to_numpy()}
        )
        return f.groupby(["doc_id", "word"], as_index=False).size().rename(
            columns={"size": "occ"}
        )

    occ = docs.map_batches(tokens, batch_format="pandas")

    def annotate(g: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (doc, word), so df(word) == rows per word
        df = g.groupby("word")["word"].transform("size").to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": g.doc_id.to_numpy(), "df": df,
             "occ": g.occ.to_numpy(np.int64)}
        )

    ann = bucketed_group_agg(occ, ["word"], annotate, n_buckets=64)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(s=g.df.to_numpy() * g.occ.to_numpy())
        gg = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("occ", "sum"), s=("s", "sum")
        )
        gg["mean_df"] = np.round(gg.s.to_numpy() * 1.0 / gg.n_tokens.to_numpy(), 6)
        gg["n_tokens"] = gg.n_tokens.astype(np.int64)
        return gg[["doc_id", "n_tokens", "mean_df"]]

    return bucketed_group_agg(ann, ["doc_id"], per_doc, n_buckets=64)


# --- within-doc word repetition (Gopher-style quality signal) ----------------

_REP_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_words,
             CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
               AS dup_words
      FROM c GROUP BY doc_id)
SELECT doc_id, total_words, dup_words,
       round_even(dup_words * 1.0 / total_words, 6) AS dup_frac
FROM s
"""


@register("word_repetition_score", _REP_SQL)
def word_repetition_score(sf_dir: str):
    """Within-doc repetition (fraction of word occurrences whose word
    repeats inside the doc — the Gopher repetition-filter signal).
    Purely per-doc, so it never shuffles: explode + grouped transform are
    C-speed pandas kernels per batch. dup/total division is IEEE-exact on
    both engines; rounding is half-to-even on both (round_even rule)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        ex = b.text.str.split(" ").explode()
        f = pd.DataFrame({"i": ex.index, "w": ex.to_numpy()})
        occ = f.groupby(["i", "w"])["w"].transform("size").to_numpy()
        f["dup"] = occ > 1
        g = f.groupby("i", sort=False)
        total = g.size()
        dup = g["dup"].sum() * 1  # bool -> int64
        # occ>1 marks each OCCURRENCE of a repeated word, so the grouped
        # sum equals SQL's sum(cnt) over cnt>1 groups (occurrences, not
        # distinct words)
        out = pd.DataFrame(
            {"doc_id": b.loc[total.index, "doc_id"].to_numpy(),
             "total_words": total.to_numpy().astype(np.int64),
             "dup_words": dup.to_numpy().astype(np.int64)}
        )
        out["dup_frac"] = np.round(
            out.dup_words.to_numpy() * 1.0 / out.total_words.to_numpy(), 6
        )
        return out

    return docs.map_batches(score, batch_format="pandas")


# --- lead/lag window: per-user inter-event gap statistics --------------------

# Gap statistics are INTEGER MICROSECONDS end to end: a float-seconds gap
# rounded to 4 decimals lands on exact .00005 boundaries (ts has
# microsecond precision), where numpy and DuckDB round_even disagree at
# the last ulp of the double representation — integer semantics have no
# rounding step at all. The mean is an exact integer floor division.
_EVENT_GAP_SQL = """
WITH lagd AS (
  SELECT user_id,
    epoch_us(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events)
SELECT user_id, count(*) AS n_events,
  sum(gap) // count(gap) AS mean_gap_us,
  max(gap) AS max_gap_us
FROM lagd GROUP BY user_id
"""


@register("event_gap_stats", _EVENT_GAP_SQL)
def event_gap_stats(sf_dir: str):
    """LAG window function over a high-cardinality partition key: per
    user, the gap to the previous event ((ts, event_id) order — the
    deterministic tie rule), aggregated to mean/max microseconds (exact
    integers; see _EVENT_GAP_SQL note). One hash-bucketed shuffle; the
    per-bucket kernel is a vectorized grouped diff (no per-user Python).
    A single-event user has no gaps: its mean/max are emitted as Arrow
    NULL (validity mask), matching SQL agg-of-empty — NaN or a sentinel
    would hash differently at the driver. Runs on the task exchange
    (stages/exchange.py) — the Dataset groupby form paid the sort-
    shuffle's multi-second fixed cost (the r3 bench regression flagged in
    VERDICT.md item 4: 3.56s; the exchange form measures ~1.3s at sf0.1,
    same kernel)."""
    import pyarrow as pa

    from ..stages import exchange

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    n_buckets = 32

    def gaps(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gap = g.groupby("user_id", sort=False)["ts"].diff()
        gap_us = gap.to_numpy().astype("timedelta64[us]").astype(np.int64)
        valid = ~gap.isna().to_numpy()
        g = g.assign(gap_us=np.where(valid, gap_us, 0), has_gap=valid.astype(np.int64))
        agg = g.groupby("user_id", as_index=False).agg(
            n_events=("event_id", "size"),
            sum_gap=("gap_us", "sum"),
            n_gaps=("has_gap", "sum"),
            max_gap=("gap_us", "max"),
        )
        n_gaps = agg.n_gaps.to_numpy()
        none = n_gaps == 0
        mean_v = agg.sum_gap.to_numpy() // np.maximum(n_gaps, 1)
        max_v = agg.max_gap.to_numpy()
        return pa.table(
            {
                "user_id": pa.array(agg.user_id.to_numpy()),
                "n_events": pa.array(agg.n_events.to_numpy()),
                "mean_gap_us": pa.array(mean_v, mask=none),
                "max_gap_us": pa.array(max_v, mask=none),
            }
        )

    parts = exchange.scatter(
        ds, n_buckets, exchange.hash_bucket_fn("user_id", n_buckets)
    )
    empty = pd.DataFrame(
        {"user_id": pd.Series([], dtype=np.int64),
         "n_events": pd.Series([], dtype=np.int64),
         "mean_gap_us": pd.Series([], dtype=np.int64),
         "max_gap_us": pd.Series([], dtype=np.int64)}
    )
    return exchange.group_map(parts, gaps, empty)


# --- distributed NTILE: per-language length quartiles ------------------------

_NTILE_SQL = """
SELECT doc_id, lang, n_chars,
       ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
FROM documents
"""


@register("ntile_length_quartiles", _NTILE_SQL)
def ntile_length_quartiles(sf_dir: str):
    """NTILE window function over a global per-partition order WITHOUT a
    global sort (the curation shape: bucket every doc into its
    within-language length quartile). Same two-phase distributed rank as
    shuffle_train_order: the order key is RANGE-bucketed (n_chars >> 5),
    one streamed pass counts per (lang, range-bucket), the driver folds
    exclusive offsets plus per-language totals (#langs x #buckets rows),
    and one bucketed pass ranks in-bucket by (n_chars, doc_id), adds the
    offset, and applies SQL's exact NTILE remainder rule (first n%4
    tiles are one larger). Integer in, integer out — bit-exact."""
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__rb"] = (b.n_chars.to_numpy(np.int64) >> 5).astype(np.int64)
        return b

    kd = docs.map_batches(keyed, batch_format="pandas").materialize()  # counts pass + rank pass

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "__rb"], as_index=False).size()

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        t = (
            p.groupby(["lang", "__rb"], as_index=False)["size"]
            .sum()
            .sort_values(["lang", "__rb"])
        )
        t["off"] = t.groupby("lang")["size"].cumsum() - t["size"]
        t["n_lang"] = t.groupby("lang")["size"].transform("sum")
        return t[["lang", "__rb", "off", "n_lang"]].reset_index(drop=True)

    offs = partials_to_driver(
        kd.map_batches(partial, batch_format="pandas"), fold
    )
    off_of = {(l, r): (o, n) for l, r, o, n in offs.itertuples(index=False)}

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for (lang, rb), sub in g.groupby(["lang", "__rb"], sort=False):
            order = np.lexsort((sub.doc_id.to_numpy(), sub.n_chars.to_numpy()))
            base, n = off_of[(lang, rb)]
            r = np.empty(len(sub), dtype=np.int64)
            r[order] = base + np.arange(len(sub), dtype=np.int64)
            q, rem = divmod(n, 4)
            big = rem * (q + 1)
            tile = np.where(
                r < big, r // (q + 1), rem + (r - big) // max(q, 1)
            ) + 1
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": sub.doc_id.to_numpy(),
                        "lang": lang,
                        "n_chars": sub.n_chars.to_numpy(),
                        "quartile": tile.astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "lang": pd.Series([], dtype=str),
                "n_chars": pd.Series([], dtype=np.int64),
                "quartile": pd.Series([], dtype=np.int64),
            }
        )

    return bucketed_group_agg(kd, ["lang", "__rb"], rank, n_buckets=32)


# --- end-to-end curation: lang filter -> quality filter -> exact dedup
# -> sequence packing, one hash-exact oracle --------------------------------

# ONE source of truth for the stopword SQL tables: the lang_id_scores
# oracle's definitions (themselves mirroring stages/text._LANG_STOPWORDS)
from .queries_ext import _LANG_SW_SQL as _CUR_LANG_SQL  # noqa: E402

_CUR_SWS = _CUR_LANG_SQL["en"]
_CUR_SCORES = ",".join(
    f"len(list_filter(ltoks, x -> x IN ({sw}))) * 1.0 / greatest(1, len(ltoks)) AS s_{l}"
    for l, sw in _CUR_LANG_SQL.items()
)

_CURATION_SQL = f"""
WITH t AS (SELECT doc_id, coalesce(text,'') AS txt FROM documents),
lid AS (
  SELECT doc_id, txt, length(txt) AS n_chars,
    regexp_extract_all(lower(substr(txt,1,2000)), '[a-z]+') AS ltoks,
    length(regexp_replace(substr(txt,1,400), '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS n_cjk
  FROM t),
sc AS (
  SELECT doc_id, txt, n_chars, len(ltoks) AS n_ltoks,
    n_cjk*1.0/greatest(1,least(n_chars,400)) AS cjk_ratio, {_CUR_SCORES}
  FROM lid),
pred AS (
  SELECT doc_id, txt,
    CASE WHEN cjk_ratio > 0.2 THEN 'zh'
         WHEN n_chars = 0 OR n_ltoks = 0 THEN 'und'
         WHEN greatest(s_en,s_de,s_es,s_fr) = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred,
    CASE WHEN trim(txt)='' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(txt), '\\s+') END AS wtoks
  FROM sc),
qual AS (
  SELECT doc_id, len(wtoks) AS n_tokens,
    len(list_filter(wtoks, x -> lower(x) IN ({_CUR_SWS}))) AS stop_hits,
    trim(regexp_replace(lower(txt), '\\s+', ' ', 'g')) AS norm
  FROM pred WHERE lang_pred = 'en'),
filt AS (SELECT * FROM qual WHERE n_tokens BETWEEN 30 AND 500 AND stop_hits >= 2),
ded AS (SELECT doc_id, n_tokens FROM (
  SELECT doc_id, n_tokens, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
  FROM filt) WHERE rn = 1)
SELECT doc_id, n_tokens,
  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
FROM ded
"""


@register("curation_end_to_end", _CURATION_SQL)
def curation_end_to_end(sf_dir: str):
    """The complete curation pipeline a pretraining corpus goes through,
    as ONE composed distributed flow with a single hash-exact oracle:
    language-ID gate (en) -> quality gate (token-count band + integer
    stopword-hit floor — integer predicates, no float-boundary risk) ->
    exact normalized-text dedup (keep-first by doc_id, norm-hash
    exchange) -> token-budget sequence packing (two-phase distributed
    prefix sum, 512-token bins). One fused scan computes every signal;
    the only all-to-alls are the dedup exchange and the bounded
    prefix-sum offset fold."""
    from ..stages import exchange
    from ..stages.aggregates import bucketed_group_agg, partials_to_driver
    from ..stages.text import _LANG_STOPWORDS, lang_id_batch

    sw = _LANG_STOPWORDS["en"]
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fused(b: pd.DataFrame) -> pd.DataFrame:
        t = b.text.fillna("").reset_index(drop=True)
        lang = lang_id_batch(t).lang_pred.to_numpy()
        tokens = t.str.split()
        n_tokens = tokens.str.len().fillna(0).astype(int).to_numpy()
        toks = tokens.explode().dropna().str.lower()
        hits = np.bincount(
            toks.index.to_numpy(np.int64),
            weights=toks.isin(sw).to_numpy(),
            minlength=len(t),
        ).astype(np.int64)
        norm = (
            t.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        ).to_numpy()
        keep = (lang == "en") & (n_tokens >= 30) & (n_tokens <= 500) & (hits >= 2)
        return pd.DataFrame(
            {
                "doc_id": b.doc_id.to_numpy()[keep],
                "n_tokens": n_tokens[keep],
                "norm": norm[keep],
            }
        )

    filt = docs.map_batches(fused, batch_format="pandas")

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        g = g[~g.norm.duplicated()]
        return g[["doc_id", "n_tokens"]]

    def norm_bucket(df: pd.DataFrame) -> np.ndarray:
        return (
            pd.util.hash_array(df.norm.to_numpy()).astype(np.uint64)
            % np.uint64(32)
        ).astype(np.int64)

    empty = pd.DataFrame(
        {"doc_id": np.empty(0, np.int64), "n_tokens": np.empty(0, np.int64)}
    )
    ded = exchange.group_map(
        exchange.scatter(filt, 32, norm_bucket), dedup_bucket, empty
    )

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__rb"] = (b.doc_id.to_numpy(np.int64) >> 7).astype(np.int64)
        return b

    kd = ded.map_batches(keyed, batch_format="pandas").materialize()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("__rb", as_index=False)["n_tokens"].sum()

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):  # every doc filtered out: empty (schemaless) partials
            return pd.DataFrame(
                {"__rb": pd.Series([], dtype=np.int64),
                 "off": pd.Series([], dtype=np.int64)}
            )
        t = p.groupby("__rb", as_index=False)["n_tokens"].sum().sort_values("__rb")
        t["off"] = t["n_tokens"].cumsum() - t["n_tokens"]
        return t[["__rb", "off"]].reset_index(drop=True)

    offs = partials_to_driver(kd.map_batches(partial, batch_format="pandas"), fold)
    off_of = dict(zip(offs["__rb"], offs["off"]))

    def binify(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for rb, sub in g.groupby("__rb", sort=False):
            sub = sub.sort_values("doc_id", kind="stable")
            nt = sub.n_tokens.to_numpy(np.int64)
            excl = off_of[rb] + np.cumsum(nt) - nt
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": sub.doc_id.to_numpy(),
                        "n_tokens": nt,
                        "bin": (excl // 512).astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "bin": pd.Series([], dtype=np.int64),
            }
        )

    return bucketed_group_agg(
        kd, ["__rb"], binify, n_buckets=32,
        empty=pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "n_tokens": pd.Series([], dtype=np.int64),
             "bin": pd.Series([], dtype=np.int64)}
        ),
    )


# --- plain LEFT OUTER join (the remaining join shape): customers with a
# possibly-empty order history ------------------------------------------------

_LEFT_JOIN_SQL = """
SELECT c.c_custkey, c.c_nationkey,
       count(o.o_orderkey) AS n_orders,
       max(o.o_orderdate) AS last_order
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_nationkey
"""


@register("left_join_order_history", _LEFT_JOIN_SQL)
def left_join_order_history(sf_dir: str):
    """LEFT OUTER join via the cogroup exchange (require="left": a bucket
    with no right rows still runs): per customer, order count (0 when
    none — SQL count(col) semantics) and last order date (Arrow NULL when
    none, not NaT-as-value). Orders pre-aggregate per batch BEFORE the
    exchange, so the shuffle carries one row per (custkey, batch), never
    the raw order rows."""
    import pyarrow as pa

    from ..stages import exchange

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def pre_agg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).agg(
            n=("o_orderkey", "size"), last=("o_orderdate", "max")
        )
        return g

    nb = 16
    lkey = exchange.hash_bucket_fn("c_custkey", nb)
    rkey = exchange.hash_bucket_fn("o_custkey", nb)

    def join2(l: pd.DataFrame, r: pd.DataFrame) -> pa.Table:
        if r is None or not len(r):
            merged = l.assign(
                n_orders=np.int64(0),
                last=pd.Series([pd.NaT] * len(l), dtype="datetime64[us]"),
            )
        else:
            rr = r.groupby("o_custkey", as_index=False).agg(
                n_orders=("n", "sum"), last=("last", "max")
            )
            merged = l.merge(
                rr, left_on="c_custkey", right_on="o_custkey", how="left"
            )
            merged["n_orders"] = merged.n_orders.fillna(0).astype(np.int64)
        last = merged["last"].to_numpy().astype("datetime64[us]")
        mask = pd.isna(merged["last"]).to_numpy()
        return pa.table(
            {
                "c_custkey": pa.array(merged.c_custkey.to_numpy()),
                "c_nationkey": pa.array(merged.c_nationkey.to_numpy()),
                "n_orders": pa.array(merged.n_orders.to_numpy()),
                "last_order": pa.array(last, mask=mask),
            }
        )

    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_nationkey": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "last_order": pd.Series([], dtype="datetime64[us]"),
        }
    )
    cparts, oparts = exchange.scatter_pair(
        cust,
        lkey,
        orders.map_batches(pre_agg, batch_format="pandas"),
        rkey,
        nb,
    )
    return exchange.cogroup_map(cparts, oparts, join2, empty, require="left")


# --- salted hot-key shuffle join --------------------------------------------

_SALTED_JOIN_SQL = """
SELECT e.event_id, e.event_type, d.cnt AS type_count
FROM events e JOIN (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
) d USING (event_type)
"""


@register("salted_join_hot_keys", _SALTED_JOIN_SQL)
def salted_join_hot_keys(sf_dir: str):
    """Hot-key shuffle join with MEASURED salting (the skew pattern
    stages/partition.py applies to spatial cells, demonstrated on a plain
    equi-join): every join key here is hot (5 event types over the whole
    table), so an unsalted hash join serializes into 5 reducers. One
    cheap counting pass sizes ceil(count/target) salts per key; the big
    side salts by event_id % n_salts, the (replicable) dim side
    replicates once per salt, and the cogroup join runs on (key, salt) —
    reducer fan-out follows the data, not the key cardinality. Output is
    integer-only (type counts), hash-exact vs the SQL join."""
    import pyarrow as pa

    from ..stages import exchange
    from ..stages.aggregates import partials_to_driver

    target_rows = 2000
    nb = 32
    # events feeds the counting pass and the join's big side — pin once
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    ).materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_type", as_index=False).size()

    counts = partials_to_driver(
        ev.map_batches(count_partial, batch_format="pandas"),
        lambda p: p.groupby("event_type", as_index=False)["size"].sum(),
    )
    n_salts = {
        t: max(1, int(np.ceil(c / target_rows)))
        for t, c in zip(counts.event_type, counts["size"])
    }

    def salt_big(b: pd.DataFrame) -> pd.DataFrame:
        ns = b.event_type.map(n_salts).to_numpy(np.int64)
        b = b.copy()
        b["__salt"] = (b.event_id.to_numpy(np.int64) % ns).astype(np.int64)
        return b

    big = ev.map_batches(salt_big, batch_format="pandas")

    dim_rows = []
    for t, c in zip(counts.event_type, counts["size"]):
        for s in range(n_salts[t]):
            dim_rows.append((t, int(s), int(c)))
    dim = rd.from_arrow(
        pa.table(
            {
                "event_type": [r[0] for r in dim_rows],
                "__salt": np.array([r[1] for r in dim_rows], dtype=np.int64),
                "cnt": np.array([r[2] for r in dim_rows], dtype=np.int64),
            }
        )
    )

    def key_of(df: pd.DataFrame) -> np.ndarray:
        h = pd.util.hash_array(df.event_type.to_numpy()).astype(np.uint64)
        h = h * np.uint64(0x9E3779B97F4A7C15) + df["__salt"].to_numpy(
            np.int64
        ).view(np.uint64)
        h ^= h >> np.uint64(29)
        return (h % np.uint64(nb)).astype(np.int64)

    def join2(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(r, on=["event_type", "__salt"], how="inner")
        return pd.DataFrame(
            {
                "event_id": m.event_id.to_numpy(np.int64),
                "event_type": m.event_type,
                "type_count": m.cnt.to_numpy(np.int64),
            }
        )

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=str),
            "type_count": pd.Series([], dtype=np.int64),
        }
    )
    bparts, dparts = exchange.scatter_pair(big, key_of, dim, key_of, nb)
    return exchange.cogroup_map(bparts, dparts, join2, empty, require="both")


# --- staged funnel analysis (view -> click -> purchase) ----------------------

_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id
)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""


@register("funnel_stage_times", _FUNNEL_SQL)
def funnel_stage_times(sf_dir: str):
    """Staged funnel (view -> click -> purchase) per user: the earliest
    view, the first click strictly after it, the first purchase strictly
    after that — the sessionized conversion-analysis shape. One
    hash-bucketed shuffle by user; inside a bucket each stage is a
    vectorized conditional grouped min (no per-user Python). Unreached
    stages emit Arrow NULL, matching the SQL LEFT JOIN chain."""
    import pyarrow as pa

    from ..stages.aggregates import bucketed_group_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def funnel(g: pd.DataFrame) -> pa.Table:
        users = np.sort(g.user_id.unique())
        idx = pd.Series(np.arange(users.size), index=users)

        def stage_min(mask: np.ndarray, after: np.ndarray | None) -> np.ndarray:
            sub = g[mask]
            if after is not None:
                lim = after[idx[sub.user_id].to_numpy()]
                ok = ~np.isnat(lim) & (sub.ts.to_numpy() > lim)
                sub = sub[ok]
            m = sub.groupby("user_id").ts.min()
            out = np.full(users.size, np.datetime64("NaT", "us"))
            out[idx[m.index].to_numpy()] = m.to_numpy().astype("datetime64[us]")
            return out

        t1 = stage_min((g.event_type == "view").to_numpy(), None)
        t2 = stage_min((g.event_type == "click").to_numpy(), t1)
        t3 = stage_min((g.event_type == "purchase").to_numpy(), t2)
        return pa.table(
            {
                "user_id": pa.array(users),
                "t_view": pa.array(t1, mask=np.isnat(t1)),
                "t_click": pa.array(t2, mask=np.isnat(t2)),
                "t_purchase": pa.array(t3, mask=np.isnat(t3)),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], funnel, n_buckets=32)


# --- population-based calibration (the reference's PyGMO generational
# loop, DE restatement; pipelines/calibrate.py) --------------------------------


@register("calibration_de")
def calibration_de(sf_dir: str):
    """Differential-evolution calibration of the fleet's heat-scale
    parameter against a self-derived target (the mean yield at scale
    0.5): generations evaluate the WHOLE population in one fleet pass
    (per-candidate integer partial sums -> batch-order-independent
    means), so the run is bit-deterministic end to end. The optimizer
    trajectory is driver-side numpy over those exact means — engine-only,
    so rows-only at the gate; convergence and determinism are asserted
    in-query and locked in tests/test_prepare_calibrate.py.

    reference: geoEpic/core/calibration.py:28-62 (PygmoProblem.fitness,
    one model run per candidate) — here a generation costs one Dataset
    execution regardless of population size."""
    import ray as _ray

    from .calibrate import (calibrate_heat_scale_de,
                            evaluate_scale_population, heat_units_table,
                            soil_quality_table)
    from .flagship import flagship_enrich
    from .queries import _docs

    enriched = flagship_enrich(
        _docs(sf_dir), skew=False, concurrency=2, batch_size=4096
    )
    keys = enriched.select_columns(["mukey", "grid_id"]).materialize()
    soil_ref = _ray.put(soil_quality_table())
    climate_ref = _ray.put(heat_units_table())
    target = float(
        evaluate_scale_population(
            keys, soil_ref, climate_ref, np.array([0.5])
        )[0]
    )
    res = calibrate_heat_scale_de(
        keys, target, npop=6, generations=8, seed=7
    )
    assert res["objective"] < 1e-4, "DE must recover the planted scale"
    return pd.DataFrame(
        {
            "heat_scale": [round(res["heat_scale"], 6)],
            "objective": [round(res["objective"], 10)],
            "fleet_passes": [res["fleet_passes"]],
            "candidates_evaluated": [res["candidates_evaluated"]],
        }
    )


# --- exact n-gram Jaccard threshold self-join (registered at the END so
# the driver's fixed correctness window keeps its r02 positions) --------------


def _ngram_pairs_sql() -> str:
    from .queries_ext import _MINHASH_PAIRS_SQL

    return _MINHASH_PAIRS_SQL


@register("ngram_jaccard_pairs", _ngram_pairs_sql())
def ngram_jaccard_pairs_q(sf_dir: str):
    """EXACT n-gram Jaccard threshold self-join (stages/dedup.py
    ngram_jaccard_pairs): measured plan selection between df-ordered
    PPJoin prefix filtering and the dense-corpus bitmap all-pairs path —
    deterministic recall, so the all-pairs DuckDB oracle holds by
    construction, not by a banding-probability argument; returns the same
    pairs as minhash_lsh_pairs and shares its oracle SQL (LSH-vs-exact
    agreement is itself part of the gate)."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    # threshold-join output is small by construction at t=0.5; a driver
    # sort replaces Dataset.sort's multi-second fixed shuffle cost (at
    # production scale return the unsorted Dataset and let the sink order)
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --- REAL audio decode with a bit-exact oracle --------------------------------


def _audio_sql() -> str:
    from . import oracle_sql

    return oracle_sql.audio_stats_sql(n_refs=200)


@register("multimodal_audio_stats", _audio_sql())
def multimodal_audio_stats(sf_dir: str):
    """Audio leg of the multimodal family, REAL end to end: deterministic
    RIFF/PCM WAV payloads (stages/codecs.encode_wav) -> actor-pool
    AudioDecode (pure-stdlib parser) -> per-clip duration + RMS. Unlike
    the image/frame queries, this one carries a bit-exact DuckDB oracle:
    the PCM streams are splitmix draws the SQL regenerates, and the
    squared-sample sums are < 2^53 so the stats are exact — the oracle
    therefore verifies the codec round trip itself, not just row
    counts."""
    from ..stages.multimodal import AudioDecode, synth_audio_table

    refs = [f"aud-{i:05d}" for i in range(200)]
    ds = rd.from_arrow(synth_audio_table(refs)).repartition(4)
    out = ds.map_batches(
        AudioDecode, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return out.select_columns(
        ["media_ref", "n_samples", "sample_rate", "channels",
         "duration_s", "rms"]
    )


# --- LAI profile end to end (reference utils/profile.py:306-393) -------------


def _profile_lai_sql() -> str:
    from . import oracle_sql

    return oracle_sql.profile_lai_sql()


@register("profile_lai", _profile_lai_sql())
def profile_lai(sf_dir: str):
    """The reference's LAI-profile orchestration composed from the
    profile_ops kernels (geoEpic/utils/profile.py:306-393
    profile_lai_from_csv minus the matplotlib figure): per-field daily
    series -> crop gate (the cdl_code equality filter, replayed as
    user_id % 3 = 1 on this fixture) -> outlier clean + interpolate
    (profile.py:12-76) -> >0 filter -> per-Month_Day p10/p90/mean
    distribution (process_ndvi_data, which uses percentile 10/90 despite
    its 5th/95th labels — bug parity kept). Per-field work runs as
    map_groups (each field's series is small by construction); the final
    366-group distribution is a bucketed aggregation."""
    from ..stages.aggregates import bucketed_group_agg
    from ..stages.profile_ops import remove_outliers_and_interpolate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def crop_gate(b: pd.DataFrame) -> pd.DataFrame:
        return b[b.user_id % 3 == 1]

    def field_series(g: pd.DataFrame) -> pd.DataFrame:
        daily = (
            g.assign(Date=g.ts.dt.floor("D"))
            .groupby("Date", as_index=False)["value"].mean()
            .rename(columns={"value": "lai"})
        )
        clean = remove_outliers_and_interpolate(daily, "lai", method="median")
        clean = clean[clean.lai > 0]
        return pd.DataFrame(
            {"month_day": clean.Date.dt.strftime("%m-%d"), "lai": clean.lai}
        )

    per_field = (
        ds.map_batches(crop_gate, batch_format="pandas")
        .groupby("user_id")
        .map_groups(field_series, batch_format="pandas")
    )

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for md, s in df.groupby("month_day")["lai"]:
            rows.append(
                (md, round(float(np.percentile(s, 10)), 6),
                 round(float(np.percentile(s, 90)), 6),
                 round(float(s.mean()), 6))
            )
        return pd.DataFrame(
            rows, columns=["month_day", "min_lai", "max_lai", "mean_lai"]
        )

    empty = pd.DataFrame(
        {"month_day": pd.Series([], dtype=str),
         "min_lai": pd.Series([], dtype=np.float64),
         "max_lai": pd.Series([], dtype=np.float64),
         "mean_lai": pd.Series([], dtype=np.float64)}
    )
    return bucketed_group_agg(per_field, ["month_day"], dist, n_buckets=8, empty=empty)


# --- REAL video frame-sampling with a bit-exact oracle ------------------------


def _video_framesample_sql(
    n_refs: int = 150, seed: int = 42, every_n: int = 2, fps: int = 10
) -> str:
    """Pixel replay of synth_video_table -> decode_avi -> every-Nth frame:
    the draws are splitmix integers (dims from streams 101-103, pixel at
    frame-major flat index q is hash_u64(q + i*100003, seed, 104) % 256),
    and frame sampling is pure index math — so the SQL verifies the AVI
    codec round trip with a position-weighted checksum over the SAMPLED
    bytes, the video analogue of the image/audio codec oracles."""
    from . import oracle_sql as osql

    h_n, c_n = osql.hash_u64_cols("i", seed, 101, "vn")
    h_h, c_h = osql.hash_u64_cols("i", seed, 102, "vh")
    h_w, c_w = osql.hash_u64_cols("i", seed, 103, "vw")
    h_v, c_v = osql.hash_u64_cols("(q + i * 100003)", seed, 104, "vv")
    return f"""
WITH refs AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_refs})),
dims AS (SELECT i, {h_n}, {h_h}, {h_w},
                4 + CAST({c_n} % 6 AS BIGINT) AS nf,
                4 + CAST({c_h} % 4 AS BIGINT) AS h,
                4 + CAST({c_w} % 4 AS BIGINT) AS w
         FROM refs),
sf AS (SELECT i, nf, h, w,
              CAST(unnest(range(0, nf, {every_n})) AS BIGINT) AS f,
              CAST((nf + {every_n} - 1) // {every_n} AS BIGINT) AS ns
       FROM dims),
byt AS (SELECT i, nf, h, w, ns, f,
               (f // {every_n}) * (h * w * 3)
                 + CAST(unnest(range(h * w * 3)) AS BIGINT) AS r,
               f * (h * w * 3) + CAST(unnest(range(h * w * 3)) AS BIGINT) AS q
        FROM sf),
val AS (SELECT i, nf, h, w, ns, r, {h_v},
               CAST({c_v} % 256 AS BIGINT) AS v
        FROM byt),
agg AS (SELECT i, any_value(nf) AS nf, any_value(h) AS h, any_value(w) AS w,
               any_value(ns) AS ns, sum((r + 1) * v) AS cks
        FROM val GROUP BY i)
SELECT 'vid-' || lpad(CAST(i AS VARCHAR), 5, '0') AS media_ref,
       nf AS n_frames, ns AS n_frames_sampled, h AS height, w AS width,
       {fps} AS fps, CAST(cks AS BIGINT) AS checksum
FROM agg
"""


@register("multimodal_video_framesample", _video_framesample_sql())
def multimodal_video_framesample(sf_dir: str):
    """Video frame-sampling, REAL end to end: deterministic uncompressed
    AVI payloads (stages/codecs.encode_avi, raw-DIB frames) -> actor-pool
    FrameSample (pure-stdlib RIFF walker + DIB decode) -> every-2nd-frame
    RGB bytes. The DuckDB oracle regenerates the sampled pixel stream
    analytically, so the hash compare verifies the codec round trip and
    the sampling index math — FrameSample's fake contract is retired."""
    from ..stages.multimodal import FrameSample, synth_video_table

    refs = [f"vid-{i:05d}" for i in range(150)]
    ds = rd.from_arrow(synth_video_table(refs)).repartition(4)
    out = ds.map_batches(
        FrameSample, batch_format="pyarrow", batch_size=32, concurrency=2,
        fn_constructor_kwargs={"every_n": 2, "fake": False},
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        cks = [
            int(np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                @ np.arange(1, len(p) + 1, dtype=np.int64))
            for p in b.sampled_frames
        ]
        return pd.DataFrame(
            {
                "media_ref": b.media_ref,
                "n_frames": b.n_frames.astype(np.int64),
                "n_frames_sampled": b.n_frames_sampled.astype(np.int64),
                "height": b.height.astype(np.int64),
                "width": b.width.astype(np.int64),
                "fps": b.fps.astype(np.int64),
                "checksum": cks,
            }
        )

    return out.map_batches(project, batch_format="pandas")


# --- exact duplicated-substring removal (Lee et al. 2022 shape) ---------------

_SUBSTR_K = 30

_SUBSTR_DEDUP_SQL = f"""
WITH grams AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p, substr(text, p, {_SUBSTR_K}) AS g
  FROM documents, unnest(range(1, length(text) - {_SUBSTR_K} + 2)) t(p)
),
df AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
dup AS (SELECT doc_id, p FROM grams JOIN df USING (g) WHERE df.c >= 2),
isl AS (
  SELECT doc_id, p,
         CASE WHEN max(p + {_SUBSTR_K}) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL THEN 1
              WHEN p > max(p + {_SUBSTR_K}) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1
              ELSE 0 END AS new_isl
  FROM dup
),
isl2 AS (SELECT doc_id, p, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p
                 ROWS UNBOUNDED PRECEDING) AS iid FROM isl),
spans AS (SELECT doc_id, iid, min(p) AS s, max(p) + {_SUBSTR_K} AS e
          FROM isl2 GROUP BY doc_id, iid),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(e - s) AS BIGINT) AS n_removed
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(a.n_removed, 0) AS n_removed,
       CASE WHEN a.doc_id IS NULL THEN d.text ELSE COALESCE((
         SELECT string_agg(substr(d.text, kst, ken - kst), '' ORDER BY kst)
         FROM (
           SELECT lag(e, 1, 1) OVER (ORDER BY s) AS kst, s AS ken
           FROM spans WHERE spans.doc_id = d.doc_id
           UNION ALL
           SELECT max(e), length(d.text) + 1 FROM spans WHERE spans.doc_id = d.doc_id
         ) seg(kst, ken)
         WHERE ken > kst
       ), '') END AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register("substring_dedup", _SUBSTR_DEDUP_SQL)
def substring_dedup(sf_dir: str):
    """EXACT duplicated-substring removal (stages/dedup.py
    exact_substring_dedup — the Lee et al. 2022 operator shape): every
    char covered by a {k}-char substring occurring >= 2 times anywhere in
    the corpus is dropped, docs reassembled from the survivors. Two task
    exchanges (gram-string bucketing for exact corpus counts, doc-bucket
    cogroup for interval union + slicing); the DuckDB oracle recomputes
    spans and the reassembled text verbatim, so clean_text itself is
    hash-checked."""
    from ..stages.dedup import exact_substring_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_substring_dedup(ds, k=_SUBSTR_K)


# --- bigram-LM perplexity (KenLM-shape corpus scoring) ------------------------

_BIGRAM_PPL_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
bg AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY w1, w2),
sc AS (
  SELECT bg.doc_id, ln(CAST(n12 AS DOUBLE) / n1) AS lp
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round_even(exp(-sum(lp) / count(*)), 6) AS ppl
FROM sc GROUP BY doc_id
"""


@register("bigram_perplexity", _BIGRAM_PPL_SQL)
def bigram_perplexity(sf_dir: str):
    """Corpus-LM perplexity scoring (the KenLM quality-filter shape with
    the LM ESTIMATED FROM THE CORPUS ITSELF): MLE bigram model
    p(w2|w1) = c(w1,w2)/c(w1), per-doc ppl = exp(-mean ln p) over the
    doc's bigrams. Two shuffles, token_df_score's pattern: (1) distinct
    (doc, w1, w2) occurrence counts bucket by w1 — each bucket owns every
    (w1, *) row, so both model counts AND the per-occurrence log-prob
    annotation happen in one grouped pass, no model broadcast; (2)
    annotated partials bucket by doc. ln/exp ulp noise (numpy vs DuckDB)
    sits ~8 orders under the round-even-6 tolerance."""
    from ..stages.aggregates import bucketed_group_agg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    US = "\x1f"

    def bigrams(b: pd.DataFrame) -> pd.DataFrame:
        ex = b.text.str.split(" ").explode()
        doc = b.loc[ex.index, "doc_id"].to_numpy()
        w = ex.to_numpy()
        if w.size < 2:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "w1": pd.Series([], dtype=str), "bg": pd.Series([], dtype=str),
                 "occ": pd.Series([], dtype=np.int64)}
            )
        same = doc[1:] == doc[:-1]  # explode preserves in-doc token order
        # ONE fused bigram string ("w1\x1fw2") instead of two object
        # columns — object strings are the expensive part of the shuffle;
        # w1 rides along only as the bucket/model key
        w1 = w[:-1][same]
        bg = np.char.add(np.char.add(w1.astype(str), US), w[1:][same].astype(str))
        f = pd.DataFrame({"doc_id": doc[:-1][same], "w1": w1, "bg": bg})
        # pre-combine to distinct rows before the string shuffle
        return f.groupby(["doc_id", "w1", "bg"], as_index=False).size().rename(
            columns={"size": "occ"}
        )

    occ = docs.map_batches(bigrams, batch_format="pandas")

    def annotate(g: pd.DataFrame) -> pd.DataFrame:
        occv = g.occ.to_numpy(np.int64)
        n1 = g.groupby("w1")["occ"].transform("sum").to_numpy(np.int64)
        # group on (w1, bg): a token containing the \x1f separator could
        # otherwise alias two different (w1, w2) pairs to one fused string
        n12 = g.groupby(["w1", "bg"])["occ"].transform("sum").to_numpy(np.int64)
        lp = np.log(n12 / n1)
        part = pd.DataFrame({"doc_id": g.doc_id.to_numpy(),
                             "s": lp * occv, "n": occv})
        return part.groupby("doc_id", as_index=False).sum()

    ann = bucketed_group_agg(occ, ["w1"], annotate, n_buckets=16)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("doc_id", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        return pd.DataFrame(
            {"doc_id": gg.doc_id.to_numpy(),
             "n_bigrams": gg.n.to_numpy(np.int64),
             "ppl": np.round(np.exp(-gg.s.to_numpy() / gg.n.to_numpy()), 6)}
        )

    return bucketed_group_agg(ann, ["doc_id"], per_doc, n_buckets=16)


# --- JSONL / CSV corpus round trips -------------------------------------------

_TEXTIO_SQL = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, source
"""


def _textio_roundtrip(sf_dir: str, fmt: str):
    from ..sources.textio import ensure_converted, read_csv_docs, read_jsonl_docs
    from ..stages.aggregates import partials_to_driver

    path = ensure_converted(sf_dir, fmt)
    ds = read_jsonl_docs(path) if fmt == "jsonl" else read_csv_docs(path)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(one=1, text_len=b.text.str.len().astype(np.int64))
        return b.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("one", "sum"), sum_doc=("doc_id", "sum"),
            sum_text_len=("text_len", "sum"), sum_chars=("n_chars", "sum"),
        )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["lang", "source"], as_index=False).sum()
        for c in ["n_docs", "sum_doc", "sum_text_len", "sum_chars"]:
            g[c] = g[c].astype(np.int64)
        return g

    return partials_to_driver(
        ds.map_batches(partial, batch_format="pandas"), final
    )


@register("jsonl_roundtrip", _TEXTIO_SQL)
def jsonl_roundtrip(sf_dir: str):
    """JSONL corpus source fidelity: the documents table is converted to
    line-delimited JSON shards once (marker-gated under /tmp), read back
    through sources/textio.read_jsonl_docs (schema-normalized — JSON
    numbers arrive as the reader's widest inference), and aggregated per
    (lang, source) including sum(length(text)) — the oracle computes the
    same over the PARQUET source, so any escaping/encoding corruption in
    the round trip breaks the hash."""
    return _textio_roundtrip(sf_dir, "jsonl")


@register("csv_roundtrip", _TEXTIO_SQL)
def csv_roundtrip(sf_dir: str):
    """CSV corpus source fidelity — same contract as jsonl_roundtrip
    through the quoted-CSV writer/reader (Arrow dialect,
    newlines_in_values on). The gate corpus text contains no embedded
    delimiters; test_textio_special_chars exercises quoting/newlines
    explicitly."""
    return _textio_roundtrip(sf_dir, "csv")


# --- k-NN with k>1: exact 3-nearest weather grid points ----------------------

def _knn_k3_sql() -> str:
    """Exact 3-NN oracle: true-haversine (squared-chord) ranking over a
    5x5 index window around the query's floor cell. Sufficiency: the
    3rd-nearest lattice point lies within one cell diagonal of the query
    (the 4 cell corners are candidates), and diagonal < 2*min(dlat,
    dlon*cos(lat)) holds for this grid's aspect ratio, so every point
    outside the +/-2 window is strictly farther. Ties break to the lowest
    grid_id, matching geo.knn.KnnIndex.query_k (reference find_nearest(k),
    geoEpic/utils/raster_utils.py:16-30)."""
    from ..geo import extent
    from ..geo.extent import doc_point_sql

    lat, lon = doc_point_sql("doc_id")
    s = extent.WEATHER_STEP_DEG
    nrows, ncols = extent.WEATHER_NROWS, extent.WEATHER_NCOLS
    return f"""
WITH pts AS (SELECT doc_id, {lat} AS qlat, {lon} AS qlon FROM documents),
cand AS (
  SELECT DISTINCT doc_id, qlat, qlon,
         least(greatest(CAST(floor((qlat - {extent.LAT0}) / {s}) AS BIGINT) + dr.d, 0), {nrows - 1}) AS r,
         least(greatest(CAST(floor((qlon - {extent.LON0}) / {s}) AS BIGINT) + dc.d, 0), {ncols - 1}) AS c
  FROM pts,
       (SELECT unnest([-2, -1, 0, 1, 2]) AS d) dr,
       (SELECT unnest([-2, -1, 0, 1, 2]) AS d) dc
),
scored AS (
  SELECT doc_id, r * {ncols} + c AS grid_id,
         pow(sin(radians(qlat - ({extent.LAT0} + r * {s})) / 2), 2)
         + cos(radians(qlat)) * cos(radians({extent.LAT0} + r * {s}))
           * pow(sin(radians(qlon - ({extent.LON0} + c * {s})) / 2), 2) AS chord
  FROM cand
),
ranked AS (
  SELECT doc_id, grid_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY chord, grid_id) AS k_rank
  FROM scored
)
SELECT doc_id, k_rank, grid_id FROM ranked WHERE k_rank <= 3
"""


@register("geo_knn_k3", _knn_k3_sql())
def geo_knn_k3(sf_dir: str):
    """3-nearest weather grid points per doc (k>1 path: the ring-guarantee
    KnnIndex.query_k, which LatticeKnn delegates to), exploded to one row
    per (doc, rank). Worker-cached index build — the grid fixture is
    deterministic, so no broadcast is needed."""
    import pyarrow as pa

    from .queries import _docs

    ds = _docs(sf_dir).select_columns(["doc_id"])

    def q(batch: pa.Table) -> pa.Table:
        from ..fixtures.weather import weather_grid_table
        from ..geo import extent
        from ..geo.knn import build_knn_index
        from ..state.worker_cache import get_or_build

        def build():
            g = weather_grid_table()
            return build_knn_index(
                g["grid_id"].to_numpy(), g["lat"].to_numpy(), g["lon"].to_numpy()
            )

        idx = get_or_build("knn_k3_weather_grid", build)
        did = batch["doc_id"].to_numpy()
        lat, lon = extent.doc_point(did)
        gid, _ = idx.query_k(lat, lon, 3)
        return pa.table(
            {
                "doc_id": np.repeat(did, 3),
                "k_rank": np.tile(np.arange(1, 4, dtype=np.int64), did.size),
                "grid_id": gid.reshape(-1),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


# --- multimodal: baseline JPEG decode ----------------------------------------

def _mm_jpeg_sql(n_refs: int = 150, seed: int = 42) -> str:
    """Oracle for the JPEG decode gate. JPEG is LOSSY, so the pixel-exact
    replay the PNG/BMP gates use is impossible by construction; this
    oracle hash-verifies what IS analytically replayable — the decoded
    dimensions (the synth dims draws) — plus the within-tolerance flag
    the engine computes by comparing decoded pixels against the
    regenerated source (deterministic, so the flag is stable). Decode
    ACCURACY itself is proven by tests/test_jpeg.py's round-trip error
    bounds; this gate proves the Ray plumbing end to end."""
    from . import oracle_sql as osql

    h_h, c_h = osql.hash_u64_cols("i", seed, 95, "mh")
    h_w, c_w = osql.hash_u64_cols("i", seed, 96, "mw")
    return f"""
WITH refs AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_refs})),
dims AS (SELECT i, {h_h}, {h_w},
                6 + CAST({c_h} % 6 AS BIGINT) AS height,
                6 + CAST({c_w} % 6 AS BIGINT) AS width
         FROM refs)
SELECT 'jpg-' || lpad(CAST(i AS VARCHAR), 5, '0') AS media_ref,
       height, width, TRUE AS within_tol
FROM dims
"""


@register("multimodal_jpeg_decode", _mm_jpeg_sql())
def multimodal_jpeg_decode(sf_dir: str):
    """Baseline-JPEG decode end to end with the REAL codec
    (stages/jpeg.py): payloads are byte-valid sequential-DCT JPEGs
    (quality 95, 4:4:4, optimized Huffman tables) of the deterministic
    synth pixels; ImageDecode sniffs and decodes them in the actor pool,
    and each image's decoded pixels are compared against the regenerated
    source — within_tol asserts max |err| <= 48, far below the 255 range
    but above the q95 quantization noise (measured max 17 on noise
    images; tests/test_jpeg.py pins tighter bounds)."""
    from ..stages.multimodal import ImageDecode, hash_u64, synth_image_table

    refs = [f"jpg-{i:05d}" for i in range(150)]
    media = synth_image_table(refs, fmt="jpeg")
    decoded = rd.from_arrow(media).repartition(4).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=64, concurrency=2,
        fn_constructor_kwargs={"fake": False},
    )

    def check(b: pa.Table) -> pa.Table:
        hs = b["height"].to_numpy(zero_copy_only=False)
        ws = b["width"].to_numpy(zero_copy_only=False)
        refs_ = b["media_ref"].to_pylist()
        pix = b["pixels"].combine_chunks()
        ok = np.empty(len(refs_), dtype=bool)
        for j, r in enumerate(refs_):
            i = int(r.split("-")[1])
            h, w = int(hs[j]), int(ws[j])
            src = (
                (hash_u64(np.arange(h * w * 3) + i * 100003, 42, 97) % 256)
                .astype(np.int64)
            )
            dec = np.frombuffer(pix[j].as_buffer(), dtype=np.uint8).astype(np.int64)
            ok[j] = dec.size == src.size and np.abs(dec - src).max() <= 48
        return pa.table(
            {
                "media_ref": pa.array(refs_, pa.string()),
                "height": pa.array(hs),
                "width": pa.array(ws),
                "within_tol": pa.array(ok),
            }
        )

    return decoded.map_batches(check, batch_format="pyarrow")
