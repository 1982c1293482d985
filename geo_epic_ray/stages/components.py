"""Distributed connected components over a pair/edge Dataset.

The LLM-pipeline use case: near-duplicate PAIRS (MinHash / SimHash /
blocked-Jaccard output) must become near-duplicate CLUSTERS before a
keep-one-canonical-doc pass — pairs alone over-delete (a~b, b~c: naive
pairwise dedup can drop both b and c). The reference has no graph
operator (its dedup is drop_duplicates, geoEpic/utils/misc.py:89); this
is one of the from-scratch scale components.

Algorithm: hash-to-min label propagation (Rastogi et al., ICDE'13) —
maintain a (node, cand) message multiset; each round, every node v with
candidate set C (incl. itself) and m = min(C) sends m to every member of
C and every member of C to m. One bucketed shuffle per round (hash(node)
% n_buckets, C-speed pandas groupby inside the bucket — Ray's native
per-group reduce overhead avoided, see stages/aggregates.py). Converges
in O(log d) rounds for diameter-d components; per-round message volume
stays O(|V| + |E|) after in-bucket dedup. The fixed point is detected by
an order-insensitive multiset signature (count + XOR of row hashes) of
the materialized round output — two cheap streaming passes, no driver
collection of rows.

At 100-TB scale every round is a single all-to-all keyed by node id;
nothing is ever materialized to the driver (labels stay a Dataset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _row_hash(node: np.ndarray, cand: np.ndarray) -> np.ndarray:
    a = node.astype(np.int64).view(np.uint64) * _H1
    b = cand.astype(np.int64).view(np.uint64) * _H2
    h = a ^ b
    # one xorshift mix so (node, cand) and (cand, node) collide only by chance
    return h ^ (h >> np.uint64(33))


def _signature(rows: rd.Dataset) -> tuple[int, int]:
    """Order-insensitive multiset signature of (node, cand) rows: row count
    plus XOR of per-row 64-bit hashes (XOR because the round output is
    deduplicated per bucket, so the multiset is a set)."""

    def h(b: pd.DataFrame) -> pd.DataFrame:
        hv = _row_hash(b["node"].to_numpy(), b["cand"].to_numpy())
        x = np.bitwise_xor.reduce(hv) if len(hv) else np.uint64(0)
        return pd.DataFrame({"n": [len(b)], "x": [np.int64(x.astype(np.int64))]})

    parts = rows.map_batches(h, batch_format="pandas").to_pandas()
    if not len(parts):
        return 0, 0
    return int(parts.n.sum()), int(np.bitwise_xor.reduce(parts.x.to_numpy()))


def connected_components(
    edges: rd.Dataset,
    nodes: rd.Dataset | None = None,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    label_col: str = "component",
    n_buckets: int = 32,
    max_rounds: int = 25,
) -> rd.Dataset:
    """Labels every node with the smallest node id reachable from it.

    ``edges``: Dataset with integer columns ``id_a``/``id_b`` (undirected;
    duplicates and self-loops tolerated). ``nodes``: optional Dataset whose
    ``id_a`` column lists ALL node ids (isolated nodes then label
    themselves); without it only endpoint nodes are labeled.

    Returns a Dataset of (node_col, label_col), one row per node.
    """

    def to_msgs(b: pd.DataFrame) -> pd.DataFrame:
        a = b[id_a].to_numpy(dtype=np.int64)
        c = b[id_b].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": np.concatenate([a, c]),
                "cand": np.concatenate([c, a]),
            }
        )

    # Only EDGE ENDPOINTS propagate through the rounds — isolated nodes
    # (the vast majority in a near-dup graph) would otherwise ride every
    # all-to-all as inert (n, n) rows. They join once, in the final
    # labeling pass, where min(cand ∪ {node}) labels them with themselves.
    msgs = edges.map_batches(to_msgs, batch_format="pandas")

    def bucketize(b: pd.DataFrame, salt: int = 0) -> pd.DataFrame:
        b = b.copy()
        h = (b["node"].to_numpy(np.int64).view(np.uint64) + np.uint64(salt)) * _H1
        h ^= h >> np.uint64(29)
        b["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
        return b

    def step(g: pd.DataFrame) -> pd.DataFrame:
        """One round: LOCAL closure of the bucket's induced subgraph
        (vectorized min-label iteration to a local fixpoint — the
        local-contraction refinement of hash-to-min), then emit
        (x, rep) and (rep, x) per member. Cuts global rounds to
        O(log #buckets-spanned) and shrinks the message set to
        O(#distinct ids) per bucket."""
        g = g.drop(columns="__bucket").drop_duplicates(["node", "cand"])
        node = g["node"].to_numpy(dtype=np.int64)
        cand = g["cand"].to_numpy(dtype=np.int64)
        ids, inv = np.unique(np.concatenate([node, cand]), return_inverse=True)
        src = np.concatenate([inv[: len(node)], inv[len(node):]])
        dst = np.concatenate([inv[len(node):], inv[: len(node)]])
        lab = np.arange(ids.size, dtype=np.int64)
        while True:
            before = lab.copy()
            np.minimum.at(lab, src, lab[dst])
            lab = lab[lab]  # pointer jump
            if np.array_equal(lab, before):
                break
        rep = ids[lab]  # ids sorted asc -> min position == min id
        out = pd.DataFrame(
            {
                "node": np.concatenate([ids, rep]),
                "cand": np.concatenate([rep, ids]),
            }
        )
        return out.drop_duplicates(["node", "cand"])

    rows = msgs  # round 1 shuffles it directly; no point materializing
    prev_sig = None
    for _ in range(max_rounds):
        # the salt must stay FIXED across rounds: a row can be emitted by
        # several buckets (e.g. (rep, rep) from every member's bucket),
        # and its multiplicity depends on the bucketing — under a rotating
        # salt the signature never stabilizes even at the label fixpoint.
        rows = (
            rows.map_batches(bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(step, batch_format="pandas")
        ).materialize()
        sig = _signature(rows)
        if sig == prev_sig:
            break
        prev_sig = sig

    if nodes is not None:

        def selfloop(b: pd.DataFrame) -> pd.DataFrame:
            n = b[id_a].to_numpy(dtype=np.int64)
            return pd.DataFrame({"node": n, "cand": n})

        rows = rows.union(nodes.map_batches(selfloop, batch_format="pandas"))

    def labels(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        lab = (
            pd.DataFrame(
                {"node": g["node"].to_numpy(), "cand": np.minimum(g["cand"].to_numpy(), g["node"].to_numpy())}
            )
            .groupby("node", as_index=False)["cand"]
            .min()
        )
        return lab.rename(columns={"node": node_col, "cand": label_col})

    return (
        rows.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(labels, batch_format="pandas")
    )


def blocked_components(
    ds: "rd.Dataset",
    key_cols: list[str],
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.2,
    n_buckets: int = 32,
    label_col: str = "component",
) -> rd.Dataset:
    """Near-dup clusters when edges provably live WITHIN equality blocks
    (the common dedup case: candidates are only generated inside a
    blocking key such as (n_chars, lang)). Then components never span
    blocks, and a block never spans buckets — so ONE bucketed shuffle
    computes exact labels: per bucket, build the block-local Jaccard
    edges (the same posting-list kernel as stages/dedup.blocked_pair_edges)
    and run a local min-label closure. No rounds, no signature passes —
    use the generic ``connected_components`` only when edges can cross
    partitioning keys (e.g. MinHash band candidates). Requires
    threshold > 0 (posting lists only see pairs sharing a shingle)."""
    from .dedup import char_shingle_hashes, run_pairs

    if threshold <= 0:
        raise ValueError("blocked_components requires threshold > 0")

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(b), dtype=np.uint64)
        for k in key_cols:
            h = h * np.uint64(1099511628211) + pd.util.hash_array(
                b[k].to_numpy()
            ).astype(np.uint64)
        out = b[[id_col, text_col, *key_cols]].copy()
        out["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
        return out

    def label_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        gid = g.groupby(key_cols, sort=False).ngroup().to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, gid))
        gid, ids = gid[order], ids[order]
        texts = g[text_col].to_numpy()[order].tolist()
        hs, offs = char_shingle_hashes(texts, shingle_k)
        sizes = np.diff(offs)
        doc_of = np.repeat(np.arange(len(ids)), sizes)
        ge = gid[doc_of]
        e_order = np.lexsort((doc_of, hs, ge))
        he, ge2, de = hs[e_order], ge[e_order], doc_of[e_order]
        lab = np.arange(ids.size, dtype=np.int64)
        if he.size:
            new_run = np.concatenate(
                [[True], (he[1:] != he[:-1]) | (ge2[1:] != ge2[:-1])]
            )
            a, b = run_pairs(np.flatnonzero(new_run), he.size)
            if a.size:
                n = len(ids)
                key = de[a].astype(np.int64) * n + de[b]
                uk, cnt = np.unique(key, return_counts=True)
                pa_, pb_ = uk // n, uk % n
                jac = cnt / (sizes[pa_] + sizes[pb_] - cnt)
                keep = jac >= threshold
                src, dst = pa_[keep], pb_[keep]
                while True:  # local min-label closure over the edges
                    before = lab.copy()
                    np.minimum.at(lab, dst, lab[src])
                    np.minimum.at(lab, src, lab[dst])
                    lab = lab[lab]
                    if np.array_equal(lab, before):
                        break
        return pd.DataFrame({id_col: ids, label_col: ids[lab]})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(label_bucket, batch_format="pandas")
    )


def union_find_components(edges: list[tuple[int, int]], nodes: list[int]) -> dict[int, int]:
    """Single-process union-find oracle for tests: node -> min id in its
    component."""
    parent: dict[int, int] = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}
