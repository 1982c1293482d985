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
    evidence. Returns (lang_pred, lang_score)."""
    langs = []
    scores = []
    for t in texts:
        if not t:
            langs.append("und")
            scores.append(0.0)
            continue
        n_cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        if n_cjk / max(1, min(len(t), 400)) > 0.2:
            langs.append("zh")
            scores.append(round(n_cjk / max(1, min(len(t), 400)), 6))
            continue
        toks = [w.lower() for w in _WORD_RE.findall(t[:2000])]
        if not toks:
            langs.append("und")
            scores.append(0.0)
            continue
        best, best_score = "und", 0.0
        for lang, sw in _LANG_STOPWORDS.items():
            if not sw:
                continue
            score = sum(1 for w in toks if w in sw) / len(toks)
            if score > best_score:
                best, best_score = lang, score
        langs.append(best if best_score > 0 else "und")
        scores.append(round(best_score, 6))
    return pd.DataFrame({"lang_pred": langs, "lang_score": scores})


def lang_id(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = lang_id_batch(batch[text_col])
        return pd.concat([batch.reset_index(drop=True), out], axis=1)

    return ds.map_batches(f, batch_format="pandas")


def quality_scores(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Length / punctuation / stopword / word-length quality signals —
    the standard pre-training quality filters, vectorized."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        n_chars = t.str.len()
        tokens = t.str.split()
        n_tokens = tokens.str.len().fillna(0).astype(int)
        mean_word_len = (t.str.replace(" ", "", regex=False).str.len() / n_tokens.clip(lower=1)).round(6)
        punct_ratio = (t.str.count(r"[^\w\s]") / n_chars.clip(lower=1)).round(6)
        stop_ratio = tokens.map(
            lambda ws: round(
                sum(1 for w in ws if w.lower() in _LANG_STOPWORDS["en"]) / max(1, len(ws)), 6
            )
            if isinstance(ws, list)
            else 0.0
        )
        out = batch.reset_index(drop=True).copy()
        out["n_chars_q"] = n_chars.values
        out["n_tokens"] = n_tokens.values
        out["mean_word_len"] = mean_word_len.values
        out["punct_ratio"] = punct_ratio.values
        out["stopword_ratio"] = np.asarray(stop_ratio.values, dtype=float)
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
