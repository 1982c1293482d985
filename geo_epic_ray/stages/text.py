"""Text-analysis stages: language ID, quality scoring, token counting,
document fingerprinting.

Large-scale training-data extensions (no analogue in the reference beyond
its fixed-width string formatting, SURVEY.md §2.8). All stages are
vectorized ``map_batches`` transforms; the language-ID stopword tables are
compiled once per worker (module constants — no per-batch setup).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

# Tiny per-language function-word lists for the n-gram/stopword heuristic.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "zh": set(),  # zh detection falls to the CJK-codepoint ratio below
}

_WORD_RE = re.compile(r"[a-zA-Z]+")


def lang_id_batch(texts: pd.Series) -> pd.DataFrame:
    """Heuristic language ID: CJK codepoint ratio -> zh; otherwise the
    language whose stopword list covers the most tokens; 'und' when no
    evidence. Returns (lang_pred, lang_score).

    Vectorized: one concatenated utf-32 codepoint pass for the CJK
    counts, one exploded-token isin pass per language for the stopword
    coverage — no per-row (or per-character) Python in the hot path."""
    s = texts.fillna("").astype(str).reset_index(drop=True)
    n = len(s)
    if n == 0:
        return pd.DataFrame({"lang_pred": [], "lang_score": []})
    lengths = s.str.len().to_numpy()

    # CJK ratio over the first 400 chars (U+4E00..U+9FFF)
    t400 = s.str.slice(0, 400)
    codes = np.frombuffer("".join(t400.tolist()).encode("utf-32-le"), dtype=np.uint32)
    l400 = t400.str.len().to_numpy()
    bounds = np.concatenate([[0], np.cumsum(l400)])
    ccum = np.concatenate(
        [[0], np.cumsum((codes >= 0x4E00) & (codes <= 0x9FFF))]
    )
    n_cjk = ccum[bounds[1:]] - ccum[bounds[:-1]]
    cjk_ratio = n_cjk / np.maximum(1, np.minimum(lengths, 400))

    # stopword coverage over the first 2000 chars
    toks = s.str.slice(0, 2000).str.findall(_WORD_RE).explode().dropna().str.lower()
    idx = toks.index.to_numpy(dtype=np.int64)
    n_toks = np.bincount(idx, minlength=n)
    lang_names = [l for l, sw in _LANG_STOPWORDS.items() if sw]
    score_mat = np.zeros((n, len(lang_names)))
    for j, lang in enumerate(lang_names):
        hits = np.bincount(
            idx, weights=toks.isin(_LANG_STOPWORDS[lang]).to_numpy(), minlength=n
        )
        score_mat[:, j] = hits / np.maximum(1, n_toks)
    best_j = np.argmax(score_mat, axis=1)  # first-wins ties = dict order
    best_score = score_mat[np.arange(n), best_j]

    pred = np.where(
        best_score > 0, np.asarray(lang_names, dtype=object)[best_j], "und"
    )
    score = np.round(best_score, 6)
    # precedence: empty -> und; zh override; no tokens -> und
    is_zh = cjk_ratio > 0.2
    pred = np.where(is_zh, "zh", pred)
    score = np.where(is_zh, np.round(cjk_ratio, 6), score)
    void = (lengths == 0) | (~is_zh & (n_toks == 0))
    pred = np.where(void, "und", pred)
    score = np.where(void, 0.0, score)
    return pd.DataFrame({"lang_pred": pred, "lang_score": score})


def lang_id(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = lang_id_batch(batch[text_col])
        return pd.concat([batch.reset_index(drop=True), out], axis=1)

    return ds.map_batches(f, batch_format="pandas")


def quality_scores(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Length / punctuation / stopword / word-length quality signals —
    the standard pre-training quality filters, vectorized."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("").reset_index(drop=True)
        n_chars = t.str.len()
        tokens = t.str.split()
        n_tokens = tokens.str.len().fillna(0).astype(int)
        mean_word_len = (t.str.replace(" ", "", regex=False).str.len() / n_tokens.clip(lower=1)).round(6)
        punct_ratio = (t.str.count(r"[^\w\s]") / n_chars.clip(lower=1)).round(6)
        # stopword ratio via exploded-token isin — no per-row lambda
        toks = tokens.explode().dropna().str.lower()
        hits = np.bincount(
            toks.index.to_numpy(dtype=np.int64),
            weights=toks.isin(_LANG_STOPWORDS["en"]).to_numpy(),
            minlength=len(t),
        )
        stop_ratio = np.round(hits / np.maximum(1, n_tokens.to_numpy()), 6)
        out = batch.reset_index(drop=True).copy()
        out["n_chars_q"] = n_chars.values
        out["n_tokens"] = n_tokens.values
        out["mean_word_len"] = mean_word_len.values
        out["punct_ratio"] = punct_ratio.values
        out["stopword_ratio"] = stop_ratio
        return out

    return ds.map_batches(f, batch_format="pandas")


def fingerprints(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """64-bit polynomial content fingerprint per doc — the exact-dedup key.
    Deterministic across workers (no builtin hash()); vectorized as a
    dot product of byte codes with precomputed base powers (mod 2^64)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").tolist()
        maxlen = max((len(t.encode("utf-8")) for t in texts), default=1)
        base = np.uint64(0x100000001B3)
        powers = np.empty(maxlen + 1, dtype=np.uint64)
        powers[0] = 1
        if maxlen:
            np.multiply.accumulate(np.full(maxlen, base, dtype=np.uint64), out=powers[1:])
        fps = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            codes = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            h = (codes * powers[codes.size - 1 :: -1][: codes.size]).sum(
                dtype=np.uint64
            ) + np.uint64(codes.size)
            fps[i] = (h ^ (h >> np.uint64(29))) * np.uint64(0xFF51AFD7ED558CCD)
        return pd.DataFrame(
            {id_col: batch[id_col], "fingerprint": fps.astype(np.int64)}
        )

    return ds.map_batches(f, batch_format="pandas")


def normalize_text(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Text normalization (training-data preprocessing): lowercase,
    collapse whitespace runs, strip — vectorized pandas string kernels."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = (
            batch[text_col]
            .fillna("")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        out = batch.copy()
        out["text_norm"] = t
        return out

    return ds.map_batches(f, batch_format="pandas")


def winnow_batch(
    texts: list[str], k: int = 5, window: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): per doc, the min rolling k-gram hash of every w-length
    window — guarantees any shared substring of length >= k + w - 1
    yields a shared fingerprint, at ~1/w density. Vectorized: one shingle
    pass (reuses the dedup char-shingle kernel without dedup/sort), then
    a sliding-window-minimum per doc. Returns (hashes, offsets):
    hashes[offsets[i]:offsets[i+1]] = doc i's sorted-unique selected
    fingerprints."""
    from .dedup import char_rolling_hashes

    out = []
    offsets = [0]
    for t in texts:
        h = char_rolling_hashes(t, k)
        if h.size > window:
            mins = np.min(
                np.lib.stride_tricks.sliding_window_view(h, window), axis=1
            )
        else:
            mins = np.array([h.min()], dtype=np.uint64)
        out.append(np.unique(mins))
        offsets.append(offsets[-1] + out[-1].size)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.uint64),
        np.asarray(offsets, dtype=np.int64),
    )


def winnow_fingerprints(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 8,
) -> rd.Dataset:
    """One (doc_id, fingerprint) row per selected winnowing hash — the
    exploded form feeds a groupby(fingerprint) for substring-overlap
    candidate detection, same shuffle shape as the LSH band explode."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hs, offs = winnow_batch(batch[text_col].fillna("").tolist(), k, window)
        counts = np.diff(offs)
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), counts),
                "fingerprint": hs.view(np.int64),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def winnow_overlap_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 8,
    min_shared: int = 3,
    max_df: int = 10,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Substring-overlap candidate pairs: docs sharing >= ``min_shared``
    winnowing fingerprints (MOSS-style plagiarism/near-dup detection).
    Fingerprints held by more than ``max_df`` docs are dropped first —
    ubiquitous substrings are not discriminative and would blow the
    per-bucket pair count up quadratically (the stop-fingerprint rule).
    Fully distributed: fingerprint explode -> bucketed per-print pair
    emit (NOT deduped — multiplicity is the signal) -> pair-bucket count.
    Returns (id_a, id_b, n_shared)."""

    from . import exchange

    kb = winnow_fingerprints(ds, text_col, id_col, k, window)

    def bucket_of(b: pd.DataFrame) -> np.ndarray:
        return (
            b["fingerprint"].to_numpy().view(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("fingerprint"):
            ids = np.sort(grp[id_col].unique())
            if ids.size < 2 or ids.size > max_df:
                continue
            ia, ib = np.triu_indices(ids.size, k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    empty_pairs = pd.DataFrame(
        {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
    )
    cand = exchange.group_map(
        exchange.scatter(kb, n_buckets, bucket_of), pairs_in_bucket, empty_pairs
    )

    def pair_bucket_of(b: pd.DataFrame) -> np.ndarray:
        from .dedup import pair_bucket_keys

        return pair_bucket_keys(
            b["id_a"].to_numpy(), b["id_b"].to_numpy(), n_buckets
        )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["id_a", "id_b"], as_index=False).size().rename(
            columns={"size": "n_shared"}
        )
        return c[c.n_shared >= min_shared]

    empty_out = pd.DataFrame(
        {
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "n_shared": np.empty(0, np.int64),
        }
    )
    return exchange.group_map(
        exchange.scatter(cand, n_buckets, pair_bucket_of), count_bucket, empty_out
    )


def tfidf_top_terms(
    ds: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_docs: int,
    k: int = 3,
    n_buckets: int = 32,
) -> "rd.Dataset":
    """Top-k characteristic terms per doc by a log-free BM25-style weight
    tf * (N - df + 0.5) / (df + 0.5) — rational arithmetic only, so the
    score is bit-identical across engines (numpy and DuckDB ln() differ
    by ~2 ulp, which a bit-exact gate cannot tolerate; the weight is
    monotone in the classic idf, so top-k sets match tf-idf's).

    Two bucketed shuffles, both keyed by hash:
      1. (doc, term, tf) rows — tf is complete per batch since a doc
         never spans batches — bucket BY TERM: every term's postings land
         in one bucket, so df is exact in-bucket and scores attach in the
         same pass (no separate df join);
      2. scored rows re-bucket BY DOC: per-doc sort + head(k) + rank.
    Ties rank by term ascending on the ROUNDED score (both sides round
    round-half-even to 6 before ranking, keeping tie order engine-stable).
    """

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.split(" ")
        counts = toks.str.len().to_numpy()
        ids = np.repeat(b[id_col].to_numpy(), counts)
        terms = np.concatenate(toks.to_numpy()) if len(b) else np.array([], str)
        g = (
            pd.DataFrame({id_col: ids, "term": terms})
            .groupby([id_col, "term"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        g["__bucket"] = (
            pd.util.hash_array(g.term.to_numpy()) % np.uint64(n_buckets)
        ).astype("int64")
        return g

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        df = g.groupby("term")[id_col].nunique()
        dfv = df.reindex(g.term).to_numpy(dtype=np.float64)
        tf = g.tf.to_numpy(dtype=np.float64)
        score = tf * (n_docs - dfv + 0.5) / (dfv + 0.5)
        out = g[[id_col, "term"]].copy()
        out["score"] = np.round(score, 6)  # round-half-even, pre-rank
        out["__bucket"] = (
            out[id_col].to_numpy().view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15) % np.uint64(n_buckets)
        ).astype("int64")
        return out

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [id_col, "score", "term"], ascending=[True, False, True],
            kind="stable",
        )
        out = g.groupby(id_col, sort=False).head(k).copy()
        out["rank"] = out.groupby(id_col, sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(tf_rows, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(score_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(topk_bucket, batch_format="pandas")
    )
