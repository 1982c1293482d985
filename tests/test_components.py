"""Distributed connected components vs a union-find oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from geo_epic_ray.stages.components import connected_components, union_find_components


def _run(edges, nodes):
    e = rd.from_pandas(
        pd.DataFrame(
            {
                "id_a": np.array([a for a, _ in edges] or [0], dtype=np.int64)[: len(edges)],
                "id_b": np.array([b for _, b in edges] or [0], dtype=np.int64)[: len(edges)],
            }
        )
    )
    n = rd.from_pandas(pd.DataFrame({"id_a": np.array(nodes, dtype=np.int64)}))
    out = connected_components(e, n, n_buckets=4).to_pandas()
    return dict(zip(out.node, out.component))


def test_cc_path_star_clique_isolated(ray_session):
    edges = (
        [(i, i + 1) for i in range(10, 18)]  # path 10..18
        + [(20, j) for j in range(21, 26)]  # star at 20
        + [(a, b) for a in range(30, 34) for b in range(a + 1, 34)]  # clique 30..33
    )
    nodes = list(range(10, 19)) + list(range(20, 26)) + list(range(30, 34)) + [40, 41]
    got = _run(edges, nodes)
    want = union_find_components(edges, nodes)
    assert got == want
    assert got[40] == 40 and got[41] == 41  # isolated
    assert all(got[i] == 10 for i in range(10, 19))
    assert all(got[i] == 20 for i in range(20, 26))
    assert all(got[i] == 30 for i in range(30, 34))


def test_cc_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 200
        m = [40, 150, 400][trial]
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        edges = list(zip(a.tolist(), b.tolist()))
        nodes = list(range(n))
        got = _run(edges, nodes)
        want = union_find_components(edges, nodes)
        assert got == want


def test_cc_empty_edges(ray_session):
    got = _run([], [1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}


def test_blocked_components_matches_generic(ray_session):
    """The block-local fast path must produce the identical labeling the
    generic operator derives from the same blocking: blocked_pair_edges
    -> connected_components vs blocked_components, one shuffle."""
    from geo_epic_ray.stages.components import blocked_components
    from geo_epic_ray.stages.dedup import blocked_pair_edges

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    texts, langs = [], []
    for i in range(120):
        base = [words[w] for w in rng.integers(0, len(words), 6)]
        texts.append(" ".join(base))
        langs.append(["en", "de"][int(rng.integers(0, 2))])
    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    fast = blocked_components(
        ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.3, n_buckets=8
    ).to_pandas()
    edges = blocked_pair_edges(
        ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.3
    ).to_pandas()
    want = union_find_components(
        list(zip(edges.id_a.tolist(), edges.id_b.tolist())),
        df.doc_id.tolist(),
    )
    assert dict(zip(fast.doc_id, fast.component)) == want


def test_blocked_pair_edges_matches_bruteforce(ray_session):
    import itertools

    from geo_epic_ray.stages.dedup import (
        blocked_pair_edges,
        char_shingle_hashes,
        jaccard_sorted,
    )

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    texts, langs = [], []
    for i in range(80):
        base = [words[w] for w in rng.integers(0, len(words), 8)]
        texts.append(" ".join(base))
        langs.append(["en", "de"][int(rng.integers(0, 2))])
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    got = (
        blocked_pair_edges(ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute force oracle
    hs, offs = char_shingle_hashes(texts, 5)
    sets = [np.unique(hs[offs[i] : offs[i + 1]]) for i in range(len(texts))]
    want = []
    for i, j in itertools.combinations(range(80), 2):
        if (df.n_chars[i], df.lang[i]) != (df.n_chars[j], df.lang[j]):
            continue
        jac = jaccard_sorted(sets[i], sets[j])
        if jac >= 0.3:
            want.append((i, j, jac))
    assert len(got) == len(want)
    for (a, b, j), (_, row) in zip(want, got.iterrows()):
        assert (row.id_a, row.id_b) == (a, b)
        assert row.jaccard == j


def test_blocked_kernels_refuse_sized_on_hot_block(ray_session):
    """A block key that does not discriminate (fixed-length corpus ->
    one giant (n_chars, lang) block) must raise the sized candidate-pair
    budget error in BOTH block-local kernels, not allocate the quadratic
    posting explode (the r5 smoke OOM-killed 33 GB reduce tasks here)."""
    import pytest

    from geo_epic_ray.stages.components import blocked_components
    from geo_epic_ray.stages.dedup import blocked_pair_edges

    n = 300
    # every doc same length + lang -> one block, ~C(300,2) shared-shingle
    # pairs (shared word 'aaaa bbbb')
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"aaaa bbbb {i:06d}" for i in range(n)],
            "lang": ["en"] * n,
            "n_chars": np.full(n, 16, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    with pytest.raises(Exception, match="candidate-pair budget exceeded"):
        blocked_pair_edges(
            ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.1,
            max_pairs_per_bucket=1000,
        ).to_pandas()
    with pytest.raises(Exception, match="candidate-pair budget exceeded"):
        blocked_components(
            ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.1,
            max_pairs_per_bucket=1000,
        ).to_pandas()
    # within budget the same inputs still produce the full labeling
    out = blocked_components(
        ds, ["n_chars", "lang"], "doc_id", "text", threshold=0.1,
        max_pairs_per_bucket=10_000_000,
    ).to_pandas()
    assert len(out) == n


def test_pagerank_matches_numpy_power_iteration(ray_session):
    from geo_epic_ray.stages.components import pagerank

    rng = np.random.default_rng(23)
    n = 120
    a = rng.integers(0, n, 400)
    b = rng.integers(0, n, 400)
    keep = a != b
    a, b = a[keep], b[keep]
    e = rd.from_pandas(
        pd.DataFrame({"id_a": a.astype(np.int64), "id_b": b.astype(np.int64)})
    ).repartition(4)
    got = pagerank(e, n_iter=15, n_buckets=4).to_pandas()
    got = dict(zip(got.node, got["rank"]))

    # numpy twin: undirected, deduped adjacency; same damped update
    pairs = set()
    for x, y in zip(a.tolist(), b.tolist()):
        pairs.add((x, y))
        pairs.add((y, x))
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    deg = np.zeros(m)
    for x, _ in pairs:
        deg[idx[x]] += 1
    r = np.full(m, 1.0 / m)
    for _ in range(15):
        nxt = np.full(m, 0.15 / m)
        for x, y in pairs:
            nxt[idx[y]] += 0.85 * r[idx[x]] / deg[idx[x]]
        r = nxt
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v


def test_pagerank_empty_edges(ray_session):
    from geo_epic_ray.stages.components import pagerank

    e = rd.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                      "id_b": pd.Series([], dtype=np.int64)})
    )
    out = pagerank(e, n_buckets=4).to_pandas()
    assert len(out) == 0


def test_posting_pair_counts_chunked_matches_single_pass():
    """The bounded-memory chunked accumulation must be bit-identical to
    the one-shot run_pairs + np.unique it replaces, including pairs whose
    shared-shingle count accumulates across runs that land in different
    chunks."""
    from geo_epic_ray.stages.dedup import posting_pair_counts, run_pairs

    rng = np.random.default_rng(41)
    n_docs = 60
    # posting array: ~400 runs of skewed sizes over 60 docs, sorted doc
    # positions within each run (the kernel's invariant)
    runs = rng.integers(1, 12, size=400)
    de_parts, starts, pos = [], [], 0
    for r in runs:
        members = np.sort(rng.choice(n_docs, size=min(r, n_docs), replace=False))
        de_parts.append(members)
        starts.append(pos)
        pos += members.size
    de = np.concatenate(de_parts).astype(np.int64)
    starts = np.array(starts, dtype=np.int64)
    n = int(de.size)

    a, b = run_pairs(starts, n)
    key = de[a].astype(np.int64) * n_docs + de[b]
    want_k, want_c = np.unique(key, return_counts=True)

    # force many chunks AND many compactions
    got_k, got_c = posting_pair_counts(
        starts, n, de, n_docs, None, "", chunk_pairs=50
    )
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_array_equal(got_c, want_c)
    # single-pass path (chunk larger than total) agrees too
    got_k2, got_c2 = posting_pair_counts(
        starts, n, de, n_docs, 10**9, "", chunk_pairs=10**9
    )
    np.testing.assert_array_equal(got_k2, want_k)
    np.testing.assert_array_equal(got_c2, want_c)


def test_posting_pair_counts_budget_refusals():
    """Both refusal modes: a hottest-run lower bound before any
    allocation on the chunked path, and the distinct-pair check on the
    accumulator / single pass."""
    import pytest

    from geo_epic_ray.stages.dedup import posting_pair_counts

    # one run of 100 docs -> 4950 distinct pairs
    de = np.arange(100, dtype=np.int64)
    starts = np.array([0], dtype=np.int64)
    with pytest.raises(ValueError, match="hottest run"):
        posting_pair_counts(starts, 100, de, 100, 1000, "finer key",
                            chunk_pairs=10)
    with pytest.raises(ValueError, match="distinct candidate pairs"):
        posting_pair_counts(starts, 100, de, 100, 1000, "finer key")
    # within budget: completes on both paths
    k1, c1 = posting_pair_counts(starts, 100, de, 100, 5000, "")
    k2, c2 = posting_pair_counts(starts, 100, de, 100, 5000, "",
                                 chunk_pairs=100)
    assert k1.size == 4950 and (c1 == 1).all()
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(c1, c2)


def test_pair_reduce_cpus_policy():
    """Raising the distinct-pair budget must raise the reduce task's CPU
    claim (bounding per-node reduce concurrency); the default budget and
    an explicit override keep the caller's choice."""
    from geo_epic_ray.stages.dedup import pair_reduce_cpus

    assert pair_reduce_cpus(20_000_000, None) is None
    assert pair_reduce_cpus(None, None) is None
    assert pair_reduce_cpus(120_000_000, None) == 3.0
    assert pair_reduce_cpus(1_000_000_000, None) == 8.0  # capped
    assert pair_reduce_cpus(120_000_000, 1.0) == 1.0  # explicit wins
