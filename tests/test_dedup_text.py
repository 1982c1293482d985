"""Dedup family + text analysis + similarity search (training-data ops)."""

import numpy as np
import pandas as pd
import pytest

from geo_epic_ray.stages.dedup import (band_hashes, jaccard,
                                       minhash_signatures, simhash64)
from geo_epic_ray.stages.profile_ops import (calc_num_seasons,
                                             find_peaks_simple,
                                             gaussian_filter1d,
                                             remove_outliers_and_interpolate,
                                             savgol, smooth_series)
from geo_epic_ray.stages.text import lang_id_batch


def test_minhash_similar_docs_share_more_signature():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river bend"
    c = "completely different content about soil moisture and corn yields"
    sig = minhash_signatures([a, b, c], num_perm=128)
    sim_ab = (sig[0] == sig[1]).mean()
    sim_ac = (sig[0] == sig[2]).mean()
    assert sim_ab > 0.5 > sim_ac
    # minhash agreement approximates true jaccard
    assert abs(sim_ab - jaccard(a, b)) < 0.2


def test_minhash_deterministic_and_batch_independent():
    texts = [f"document number {i} with shared words" for i in range(20)]
    s1 = minhash_signatures(texts)
    s2 = np.vstack([minhash_signatures(texts[:7]), minhash_signatures(texts[7:])])
    np.testing.assert_array_equal(s1, s2)


def test_band_hashes_equal_for_equal_docs():
    sig = minhash_signatures(["same text here", "same text here", "other"], num_perm=64)
    bh = band_hashes(sig, bands=16)
    np.testing.assert_array_equal(bh[0], bh[1])
    assert (bh[0] != bh[2]).any()


def test_simhash_near_duplicates_close_in_hamming():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tonight"
    c = "numpy arrow parquet shuffle partition actor cluster"
    h = simhash64([a, b, c])
    ham = lambda x, y: bin(int(x) ^ int(y)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    # deterministic across calls
    np.testing.assert_array_equal(h, simhash64([a, b, c]))


def test_lang_id_heuristic():
    out = lang_id_batch(pd.Series([
        "the cat and the dog sat in a corner of the room",
        "der Hund und die Katze ist nicht in das Haus",
        "el perro y la gata es un animal en la casa",
        "le chien est un animal et le chat est une bête pour la maison",
        "",
    ]))
    assert list(out.lang_pred[:4]) == ["en", "de", "es", "fr"]
    assert out.lang_pred[4] == "und"


def test_savgol_matches_polynomial_invariance():
    # a quadratic is reproduced exactly by savgol with polyorder 2
    x = np.arange(20, dtype=float)
    y = 3 + 2 * x + 0.5 * x * x
    np.testing.assert_allclose(savgol(y, 7, 2), y, rtol=1e-10)


def test_gaussian_filter_preserves_constant_and_mass():
    y = np.full(50, 7.0)
    np.testing.assert_allclose(gaussian_filter1d(y, 2.0), y)


def test_outlier_removal_median():
    days = pd.date_range("2020-01-01", periods=60)
    v = np.sin(np.arange(60) / 9.0) + 1.0
    v[30] = 50.0  # outlier
    df = pd.DataFrame({"Date": days, "NDVI": v})
    out = remove_outliers_and_interpolate(df, "NDVI", method="median")
    assert out["NDVI"].max() < 5.0
    assert not out["NDVI"].isna().any()


def test_find_peaks_height_and_distance():
    y = np.zeros(100)
    y[10] = 5.0
    y[14] = 4.0  # within distance of the higher peak -> dropped
    y[60] = 6.0
    peaks = find_peaks_simple(y, height=3.0, distance=10)
    assert list(peaks) == [10, 60]


def test_calc_num_seasons_two_humps():
    days = pd.date_range("2020-01-01", periods=120)
    x = np.arange(120)
    y = np.exp(-((x - 30) ** 2) / 50) + np.exp(-((x - 90) ** 2) / 50)
    df = pd.DataFrame({"date": days, "ndvi": y})
    assert calc_num_seasons(df, "ndvi") == 2


def test_smooth_series_savgol_column():
    days = pd.date_range("2020-01-01", periods=30)
    df = pd.DataFrame({"date": days, "ndvi": np.random.default_rng(0).normal(1, 0.1, 30)})
    out = smooth_series(df, "ndvi", method="savitsky", window_length=5, polyorder=2)
    assert "ndvi_smoothed" in out.columns
    assert out["ndvi_smoothed"].std() <= df["ndvi"].std()


def test_char_shingle_jaccard_matches_string_sets():
    from geo_epic_ray.stages.dedup import char_shingle_hashes, jaccard_sorted

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",
        "完全不同的中文文本内容测试",
        "完全不同的中文文本内容测验",
        "ab",
        "",
        "short",
    ]
    hs, offs = char_shingle_hashes(texts, 5)
    sl = [hs[offs[i] : offs[i + 1]] for i in range(len(texts))]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            assert abs(jaccard_sorted(sl[i], sl[j]) - jaccard(texts[i], texts[j])) < 1e-12


def test_minhash_dedup_pairs_distributed(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import minhash_dedup_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    texts = [base, base.replace("today", "tonite")] + [
        f"unrelated document number {i} about {i * 37} topics" for i in range(30)
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ).repartition(4)
    out = minhash_dedup_pairs(ds, threshold=0.5, num_perm=64, bands=16).to_pandas()
    # the planted near-dup pair survives; its jaccard matches the exact kernel
    assert len(out) >= 1
    row = out[(out.id_a == 0) & (out.id_b == 1)]
    assert len(row) == 1
    assert abs(row.jaccard.iloc[0] - jaccard(texts[0], texts[1])) < 1e-12
    assert out.id_a.dtype == np.int64 and out.id_b.dtype == np.int64
    # no duplicate pairs despite multi-band collisions
    assert not out.duplicated(["id_a", "id_b"]).any()


def test_embedding_lsh_matches_bruteforce(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import (embedding_dup_pairs,
                                           embedding_dup_pairs_bruteforce)

    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 32))
    twins = base[:10] + 0.02 * rng.standard_normal((10, 32))
    mat = np.vstack([base, twins])
    ids = np.arange(len(mat))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(3)

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bf = embedding_dup_pairs_bruteforce(
        ds, threshold=0.95, ref_matrix=norm, ref_ids=ids
    ).to_pandas()
    lsh = embedding_dup_pairs(
        ds, threshold=0.95, n_tables=8, n_planes=12, dim=32
    ).to_pandas()
    key = lambda d: set(zip(d.id_a.astype(int), d.id_b.astype(int)))
    assert len(bf) == 10  # the planted twins, nothing else
    assert key(lsh) == key(bf)  # exact-twin: LSH finds exactly the bf pairs
    m = lsh.sort_values(["id_a", "id_b"]).cosine.to_numpy()
    b = bf.sort_values(["id_a", "id_b"]).cosine.to_numpy()
    np.testing.assert_allclose(m, b, atol=1e-12)


def test_simhash_dup_pairs_exact_vs_bruteforce(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import simhash64, simhash_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = (
        [base, base, base + "extra", base + "extra words here"]
        + [f"totally different text about topic {i} " * 3 for i in range(20)]
    )
    ids = np.arange(len(texts))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(3)
    out = (
        simhash_dup_pairs(ds, max_hamming=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    # brute force: all pairs with popcount(xor) <= 3
    sh = simhash64(texts)
    expect = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(int(sh[i]) ^ int(sh[j])).count("1")
            if h <= 3:
                expect.append((i, j, h))
    got = list(zip(out.id_a.astype(int), out.id_b.astype(int), out.hamming.astype(int)))
    assert sorted(got) == sorted(expect)  # pigeonhole bucketing is EXACT
    assert (0, 1, 0) in got  # the verbatim twin


def test_winnowing_guarantee_and_density():
    from geo_epic_ray.stages.text import winnow_batch

    k, w = 5, 8
    shared = "a very distinctive shared passage of text"  # len >= k + w - 1
    a = "prefix one " + shared + " and a suffix"
    b = "totally different opening " + shared + " closing words"
    c = "no overlap with the others at all, none whatsoever"
    hs, offs = winnow_batch([a, b, c], k, w)
    sets = [set(hs[offs[i] : offs[i + 1]].tolist()) for i in range(3)]
    # SWA guarantee: a shared substring of length >= k+w-1 shares >= 1 print
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])
    # density ~1/w: far fewer prints than shingles
    assert len(sets[0]) < len(a)
    # deterministic + batch-independent
    hs2, offs2 = winnow_batch([a], k, w)
    assert set(hs2.tolist()) == sets[0]


def test_winnow_overlap_pairs_counts_shared_prints(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.text import winnow_batch, winnow_overlap_pairs

    shared = "this exact long passage appears verbatim in two documents only"
    texts = [
        "intro words " + shared + " outro one",
        "other beginning " + shared + " different ending",
    ] + [f"unique filler document number {i} with its own words {i * 13}" for i in range(12)]
    ids = np.arange(len(texts))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(3)
    out = winnow_overlap_pairs(
        ds, min_shared=3, max_df=14
    ).to_pandas()
    got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
    assert (0, 1) in got
    # n_shared for (0, 1) equals the direct winnow-set intersection
    hs, offs = winnow_batch(texts, 5, 8)
    s0 = set(hs[offs[0] : offs[1]].tolist())
    s1 = set(hs[offs[1] : offs[2]].tolist())
    row = out[(out.id_a == 0) & (out.id_b == 1)]
    assert int(row.n_shared.iloc[0]) == len(s0 & s1)


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """Prefix filtering must have deterministic 100% recall — including
    pairs sitting exactly at / barely above the threshold, where LSH
    banding would miss a third of them."""
    import ray.data as rd

    from geo_epic_ray.stages.dedup import (
        char_shingle_hashes,
        jaccard_sorted,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(5)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = []
    for i in range(30):
        words = base.split()
        # graded edits: from near-identical to ~half-overlap pairs
        n_edit = i % 7
        for j in range(n_edit):
            words[(i * 3 + j) % len(words)] = f"tok{i}_{j}"
        texts.append(" ".join(words))
    texts += [f"totally unrelated document {i} {rng.integers(1e9)}" for i in range(10)]
    ids = np.arange(len(texts))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(4)

    thr = 0.5
    hs, offs = char_shingle_hashes(texts, 5)
    sets = [hs[offs[i] : offs[i + 1]] for i in range(len(texts))]
    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if jaccard_sorted(sets[a], sets[b]) >= thr:
                want.add((a, b))
    assert len(want) > 20  # the corpus genuinely exercises the join

    # BOTH physical plans must produce the brute-force set: dense_max=0
    # forces the sparse PPJoin path, the default takes the bitmap path
    # (this corpus' vocabulary is far under the census cutoff)
    for dense_max in (1 << 16, 0):
        got = ngram_jaccard_pairs(
            ds, threshold=thr, dense_max=dense_max
        ).to_pandas()
        got_pairs = set(zip(got.id_a.astype(int), got.id_b.astype(int)))
        assert got_pairs == want, f"dense_max={dense_max}"


def test_ngram_jaccard_dense_docs_gate(ray_session):
    """A small-vocab corpus past dense_docs_max must be refused loudly:
    the dense plan is O(n_docs^2) compute regardless of true-pair count
    (the r5 scale smoke measured a silent multi-hour cliff at 500k docs),
    and PPJoin is provably worse on that shape — the error names both
    escape hatches."""
    import ray.data as rd

    from geo_epic_ray.stages.dedup import ngram_jaccard_pairs

    texts = [f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}" for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(40), "text": texts}))
    with pytest.raises(ValueError, match="dense_docs_max|minhash_lsh_pairs"):
        ngram_jaccard_pairs(ds, threshold=0.9, dense_docs_max=10)
    # at/under the bound the dense plan still runs
    out = ngram_jaccard_pairs(ds, threshold=0.9, dense_docs_max=40).to_pandas()
    assert len(out) > 0  # the cyclic construction has exact dups


def test_bucketed_pairs_budget_raises_sized_error(ray_session):
    """max_pairs_per_bucket must refuse BEFORE the quadratic allocation,
    with the exact count and hottest run sizes in the message (the r5
    scale smoke OOM-killed a reduce worker on an unbudgeted explosion)."""
    import ray.data as rd

    from geo_epic_ray.stages.dedup import bucketed_pairs

    df = pd.DataFrame(
        {"k": np.zeros(200, np.int64), "doc_id": np.arange(200, dtype=np.int64)}
    )
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="candidate-pair budget exceeded"):
        bucketed_pairs(
            ds, "k", "doc_id", n_buckets=2, max_pairs_per_bucket=1000
        ).to_pandas()
    ok = bucketed_pairs(
        ds, "k", "doc_id", n_buckets=2, max_pairs_per_bucket=30000
    ).to_pandas()
    assert len(ok) == 200 * 199 // 2


def test_pair_payload_verify_dedups_before_join_and_budgets(ray_session):
    """Duplicate candidate pairs (same pair from many bands/prefix keys)
    must collapse on the pair-hash exchange BEFORE the payload join — the
    verify fn sees each pair once — and the distinct-pair budget raises a
    sized error (the flat generation budget misfired on the r5 smoke's
    benign 50x-duplicated candidates)."""
    import ray.data as rd

    from geo_epic_ray.stages.dedup import pair_payload_verify

    # 60 distinct pairs, each duplicated 40x (2400 candidate rows)
    a = np.repeat(np.arange(60, dtype=np.int64), 40)
    b = a + 100
    cand = rd.from_pandas(pd.DataFrame({"id_a": a, "id_b": b}))
    payload = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(200, dtype=np.int64),
             "val": np.arange(200, dtype=np.int64) * 10}
        )
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
             "n_seen": np.empty(0, np.int64)}
        )
        if not len(g):
            return empty
        counts = g.groupby(["id_a", "id_b"]).size().reset_index(name="n_seen")
        return counts

    out = pair_payload_verify(
        cand, payload, "doc_id", verify, n_buckets=4, payload_cols=["val"]
    ).to_pandas()
    assert len(out) == 60
    # each pair contributes exactly its 2 member rows — duplicates died
    # at the dedup stage, not in the verify fn
    assert set(out.n_seen) == {2}

    with pytest.raises(Exception, match="verify-stage pair budget exceeded"):
        pair_payload_verify(
            cand, payload, "doc_id", verify, n_buckets=1,
            payload_cols=["val"], max_pairs_per_bucket=10,
        ).to_pandas()


def test_ngram_jaccard_pairs_short_docs(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import ngram_jaccard_pairs

    texts = ["abc", "abc", "ab", "xyz longer doc here", "xyz longer doc here"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(5), "text": texts}))
    out = ngram_jaccard_pairs(ds, threshold=0.99).to_pandas()
    got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
    assert got == {(0, 1), (3, 4)}


def test_exact_substring_dedup_planted(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import exact_substring_dedup

    boiler = "0123456789abcdefghij"  # k=20 planted duplicate
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "AAAA" + boiler + "BBBB",
                "CC" + boiler + "DD" + boiler,  # two spans, merged? (gap 2 < k ok)
                "unique text with no repeats at all....",
                boiler,                          # fully removed
                "tiny",                          # shorter than k: untouched
            ],
        }
    )
    out = (
        exact_substring_dedup(rd.from_pandas(docs).repartition(3), k=20, n_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.loc[0, "clean_text"] == "AAAABBBB" and out.loc[0, "n_removed"] == 20
    # doc 1: spans [3,23) and [25,45) -> kept "CC" + "DD"
    assert out.loc[1, "clean_text"] == "CCDD" and out.loc[1, "n_dup_spans"] == 2
    assert out.loc[2, "clean_text"] == docs.text[2] and out.loc[2, "n_removed"] == 0
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_removed"] == 20
    assert out.loc[4, "clean_text"] == "tiny"


def test_exact_substring_dedup_random_vs_bruteforce(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import exact_substring_dedup

    rng = np.random.default_rng(17)
    k = 6
    # small alphabet so k-gram collisions actually occur
    docs = [
        "".join(rng.choice(list("abc"), rng.integers(0, 30)))
        for _ in range(40)
    ]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})

    # brute force: global k-gram counts, then per-doc interval union
    from collections import Counter
    cnt = Counter(t[p:p + k] for t in docs for p in range(len(t) - k + 1))
    want = {}
    for did, t in enumerate(docs):
        covered = np.zeros(len(t), dtype=bool)
        for p in range(len(t) - k + 1):
            if cnt[t[p:p + k]] >= 2:
                covered[p:p + k] = True
        clean = "".join(ch for ch, c in zip(t, covered) if not c)
        # spans = runs of covered
        d = np.diff(covered.astype(int))
        n_spans = int((d == 1).sum() + (1 if covered[:1].any() else 0))
        want[did] = (n_spans, int(covered.sum()), clean)

    out = (
        exact_substring_dedup(rd.from_pandas(df).repartition(5), k=k, n_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for _, r in out.iterrows():
        ns, nr, clean = want[int(r.doc_id)]
        assert r.n_removed == nr, (r.doc_id, r.n_removed, nr)
        assert r.clean_text == clean, (r.doc_id, r.clean_text, clean)
        assert r.n_dup_spans == ns, (r.doc_id, r.n_dup_spans, ns)


def test_exact_substring_dedup_string_ids(ray_session):
    import ray.data as rd

    from geo_epic_ray.stages.dedup import exact_substring_dedup

    boiler = "0123456789abcdefghij"
    df = pd.DataFrame(
        {"doc_id": [f"doc-{i:010d}" for i in range(3)],
         "text": ["A" * 4 + boiler, boiler + "B" * 4, "no repeats here ok?.."]}
    )
    out = (
        exact_substring_dedup(rd.from_pandas(df).repartition(2), k=20, n_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.clean_text.tolist() == ["AAAA", "BBBB", "no repeats here ok?.."]
    assert out.n_removed.tolist() == [20, 20, 0]
