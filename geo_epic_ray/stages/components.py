"""Distributed connected components over a pair/edge Dataset.

The LLM-pipeline use case: near-duplicate PAIRS (MinHash / SimHash /
blocked-Jaccard output) must become near-duplicate CLUSTERS before a
keep-one-canonical-doc pass — pairs alone over-delete (a~b, b~c: naive
pairwise dedup can drop both b and c). The reference has no graph
operator (its dedup is drop_duplicates, geoEpic/utils/misc.py:89); this
is one of the from-scratch scale components.

Algorithm: hash-to-min label propagation (Rastogi et al., ICDE'13) with
per-bucket local contraction — each round, every node v's candidate set
C (incl. itself) with m = min(C) sends m to every member of C and every
member of C to m; buckets first close their induced subgraph locally
(vectorized min-label iteration), so global rounds are
O(log #buckets-spanned) and per-round volume stays O(|V| + |E|) after
in-bucket dedup.

Execution: raw Ray tasks (BSP), NOT a Dataset groupby per round — the
one place in this engine where the Dataset API is the wrong tool. An
iterative fixpoint needs (a) cheap rounds (a Dataset groupby round pays
multi-second fixed sort/shuffle overhead on every iteration) and (b) a
convergence probe without an extra pass. Here each round is n_buckets
tasks; messages move bucket-to-bucket as int64 arrays through the object
store (the same all-to-all a shuffle would do, without per-round plan
overhead), and every task returns its OWNED-LABEL signature (count + XOR
over (node, rep) hashes for nodes hashing to its bucket) as a by-product
of the closure it already computed. The loop stops one round after the
labeling stabilizes — strictly earlier than waiting for the full message
SET to stop changing (stale transitional rows keep shrinking for 1-2
rounds after labels are final). At 100-TB scale: n_buckets ~ #workers,
driver holds only O(n_buckets^2) object refs per round, per-bucket
arrays spill via the object store; the known hash-to-min caveat stands —
a giant component's min node receives O(|component|) messages.

The final labeling joins isolated nodes (the vast majority in a near-dup
graph) exactly once: node arrays route to the same buckets, a per-bucket
merge emits min-reachable labels for endpoints and self-labels for the
rest, and the per-bucket Arrow tables become the output Dataset with no
further shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from . import exchange

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _row_hash(node: np.ndarray, cand: np.ndarray) -> np.ndarray:
    a = node.astype(np.int64).view(np.uint64) * _H1
    b = cand.astype(np.int64).view(np.uint64) * _H2
    h = a ^ b
    # one xorshift mix so (node, cand) and (cand, node) collide only by chance
    return h ^ (h >> np.uint64(33))


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    h = ids.astype(np.int64).view(np.uint64) * _H1
    h ^= h >> np.uint64(29)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _route(node: np.ndarray, cand: np.ndarray, n_buckets: int) -> list[np.ndarray]:
    """Split (node, cand) pairs into per-bucket (2, k) arrays by hash(node)."""
    bk = _bucket_of(node, n_buckets)
    order = np.argsort(bk, kind="stable")
    node, cand, bk = node[order], cand[order], bk[order]
    bounds = np.searchsorted(bk, np.arange(n_buckets + 1))
    return [
        np.stack([node[s:e], cand[s:e]])
        for s, e in zip(bounds[:-1], bounds[1:])
    ]


@ray.remote
def _cc_scatter(blk, col_a: str, col_b: str, n_buckets: int):
    """Edge block -> per-bucket (node, cand) message arrays (both
    directions, routed by hash(node))."""
    tbl = exchange.ensure_arrow(blk)
    if tbl.num_rows == 0 or col_a not in tbl.column_names:
        # upstream map_groups can emit empty blocks with an empty schema
        empty = np.empty((2, 0), dtype=np.int64)
        return tuple(empty for _ in range(n_buckets))
    a = tbl[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
    return tuple(_route(np.concatenate([a, b]), np.concatenate([b, a]), n_buckets))


@ray.remote
def _cc_scatter_nodes(blk, col: str, n_buckets: int):
    tbl = exchange.ensure_arrow(blk)
    if tbl.num_rows == 0 or col not in tbl.column_names:
        empty = np.empty(0, dtype=np.int64)
        return tuple(empty for _ in range(n_buckets))
    ids = np.unique(tbl[col].to_numpy(zero_copy_only=False).astype(np.int64))
    bk = _bucket_of(ids, n_buckets)
    order = np.argsort(bk, kind="stable")
    ids, bk = ids[order], bk[order]
    bounds = np.searchsorted(bk, np.arange(n_buckets + 1))
    return tuple(ids[s:e] for s, e in zip(bounds[:-1], bounds[1:]))


def _closure(node: np.ndarray, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Local min-label closure of the induced subgraph: ids (sorted asc)
    and each id's representative (min reachable id within these rows)."""
    ids, inv = np.unique(np.concatenate([node, cand]), return_inverse=True)
    src = np.concatenate([inv[: node.size], inv[node.size:]])
    dst = np.concatenate([inv[node.size:], inv[: node.size]])
    lab = np.arange(ids.size, dtype=np.int64)
    while True:
        before = lab.copy()
        np.minimum.at(lab, src, lab[dst])
        lab = lab[lab]  # pointer jump
        if np.array_equal(lab, before):
            break
    return ids, ids[lab]  # ids sorted asc -> min position == min id


@ray.remote
def _cc_round(bucket_id: int, n_buckets: int, *parts: np.ndarray):
    """One BSP round for one bucket: dedup incoming (node, cand) rows,
    close the induced subgraph locally, then emit (x, rep) and (rep, x)
    per member routed by hash(node). Returns (owned-label signature,
    (2, k) owned-label array, out_0 .. out_{n_buckets-1})."""
    live = [p for p in parts if p.size]
    if live:
        arr = np.concatenate(live, axis=1)
        node, cand = arr[0], arr[1]
        order = np.lexsort((cand, node))
        node, cand = node[order], cand[order]
        keep = np.concatenate(
            [[True], (node[1:] != node[:-1]) | (cand[1:] != cand[:-1])]
        )
        node, cand = node[keep], cand[keep]
    else:
        node = cand = np.empty(0, dtype=np.int64)
    ids, rep = _closure(node, cand)
    owned = _bucket_of(ids, n_buckets) == bucket_id
    ox, orep = ids[owned], rep[owned]
    hv = _row_hash(ox, orep)
    sig = (int(ox.size), int(np.bitwise_xor.reduce(hv)) if ox.size else 0)
    # star edges both directions; drop rep==id on the reverse side so the
    # (m, m) self row is emitted once
    nontriv = rep != ids
    onode = np.concatenate([ids, rep[nontriv]])
    ocand = np.concatenate([rep, ids[nontriv]])
    return (sig, np.stack([ox, orep]), *_route(onode, ocand, n_buckets))


@ray.remote
def _cc_finalize(
    labels: np.ndarray,
    node_col: str,
    label_col: str,
    *node_parts: np.ndarray,
):
    """Merge one bucket's endpoint labels with its (optional) full node
    list: endpoints keep their min-reachable label, the rest self-label."""
    ox, orep = labels[0], labels[1]
    if node_parts:
        allnodes = np.unique(np.concatenate(node_parts))
        iso = allnodes[~np.isin(allnodes, ox)]
        out_n = np.concatenate([ox, iso])
        out_l = np.concatenate([orep, iso])
    else:
        out_n, out_l = ox, orep
    return pa.table({node_col: out_n, label_col: out_l})


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

    Returns a Dataset of (node_col, label_col), one row per node. Output
    labels are exact minima, so the result is deterministic regardless of
    bucketing or block layout.
    """
    nb = n_buckets
    # Only EDGE ENDPOINTS propagate through the rounds — isolated nodes
    # would otherwise ride every all-to-all as inert (n, n) rows.
    # Streaming scatter: edge blocks are consumed as the upstream plan
    # produces them and freed once routed (no full-dataset pin).
    scattered = [
        _cc_scatter.options(num_returns=nb).remote(ref, id_a, id_b, nb)
        for ref in exchange.iter_block_refs(edges.select_columns([id_a, id_b]))
    ]
    parts: list[list] = [
        [s[b] for s in scattered] for b in range(nb)
    ] if scattered else [[] for _ in range(nb)]

    label_refs = None
    prev_sigs = None
    stable = 0
    for _ in range(max_rounds):
        outs = [
            _cc_round.options(num_returns=nb + 2).remote(b, nb, *parts[b])
            for b in range(nb)
        ]
        sigs = ray.get([o[0] for o in outs])
        label_refs = [o[1] for o in outs]
        parts = [[outs[src][2 + dst] for src in range(nb)] for dst in range(nb)]
        # require the owned-label signature stable for TWO consecutive
        # rounds: the signature doesn't capture in-flight transitional
        # messages, so a single-round plateau before convergence would
        # otherwise terminate on an unproven fixpoint (one extra
        # millisecond-scale wave buys termination-implies-fixpoint)
        if sigs == prev_sigs:
            stable += 1
            if stable >= 2:
                break
        else:
            stable = 0
        prev_sigs = sigs

    if nodes is not None:
        nscattered = [
            _cc_scatter_nodes.options(num_returns=nb).remote(ref, id_a, nb)
            for ref in exchange.iter_block_refs(nodes.select_columns([id_a]))
        ]
        nparts = [[s[b] for s in nscattered] for b in range(nb)] if nscattered else [
            [] for _ in range(nb)
        ]
    else:
        nparts = [[] for _ in range(nb)]

    tables = [
        _cc_finalize.remote(label_refs[b], node_col, label_col, *nparts[b])
        for b in range(nb)
    ]
    return rd.from_arrow_refs(tables)


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
    max_pairs_per_bucket: int | None = 20_000_000,
    reduce_num_cpus: float | None = None,
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
    threshold > 0 (posting lists only see pairs sharing a shingle).
    ``max_pairs_per_bucket`` bounds the DISTINCT candidate pairs resident
    per bucket (the posting-pair transient is chunked — see
    dedup.posting_pair_counts); refuses sized when the block key does not
    discriminate (see dedup.blocked_pair_edges)."""
    from . import exchange
    from .dedup import char_shingle_hashes, posting_pair_counts

    if threshold <= 0:
        raise ValueError("blocked_components requires threshold > 0")

    bucket_of = exchange.key_cols_bucket_fn(key_cols, n_buckets)

    def label_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {id_col: np.empty(0, np.int64), label_col: np.empty(0, np.int64)}
            )
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
            starts = np.flatnonzero(new_run)
            n = len(ids)
            uk, cnt = posting_pair_counts(
                starts, he.size, de, n, max_pairs_per_bucket,
                "The equality block key does not discriminate on this "
                "corpus. Use a finer block key, raise the budget to accept "
                "the memory cost explicitly, or switch to a prefix-filtered "
                "/ LSH candidate stage feeding connected_components.",
            )
            if uk.size:
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

    parts = exchange.scatter(
        ds.map_batches(
            lambda b: b[[id_col, text_col, *key_cols]], batch_format="pandas"
        ),
        n_buckets,
        bucket_of,
    )
    empty = pd.DataFrame(
        {id_col: np.empty(0, np.int64), label_col: np.empty(0, np.int64)}
    )
    from .dedup import pair_reduce_cpus

    return exchange.group_map(
        parts, label_bucket, empty,
        reduce_num_cpus=pair_reduce_cpus(max_pairs_per_bucket, reduce_num_cpus),
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


@ray.remote
def _pr_scatter(blk, col_a: str, col_b: str, n_buckets: int):
    """Edge block -> per-bucket (src, dst) arrays, BOTH directions
    (undirected graph), routed by hash(src)."""
    tbl = exchange.ensure_arrow(blk)
    if tbl.num_rows == 0 or col_a not in tbl.column_names:
        empty = np.empty((2, 0), dtype=np.int64)
        return tuple(empty for _ in range(n_buckets))
    a = tbl[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
    return tuple(_route(np.concatenate([a, b]), np.concatenate([b, a]), n_buckets))


@ray.remote
def _pr_prep(bucket_id: int, n_buckets: int, *parts: np.ndarray):
    """Dedup this bucket's adjacency (src owned here) and return
    (owned node ids sorted, their out-degrees, csr dst array, csr offsets)."""
    live = [p for p in parts if p.size]
    if live:
        arr = np.concatenate(live, axis=1)
        src, dst = arr[0], arr[1]
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        keep = np.concatenate([[True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])])
        src, dst = src[keep], dst[keep]
    else:
        src = dst = np.empty(0, dtype=np.int64)
    ids, counts = np.unique(src, return_counts=True)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return ids, counts.astype(np.int64), dst, offsets.astype(np.int64)


@ray.remote
def _pr_round(prep, rank: np.ndarray, n_buckets: int):
    """One power-iteration wave for one bucket: each owned node sends
    rank/degree along its edges; contributions route by hash(dst)."""
    ids, deg, dst, offsets = prep
    if not ids.size:
        return tuple(
            (np.empty(0, np.int64), np.empty(0, np.float64))
            for _ in range(n_buckets)
        )
    contrib = np.repeat(rank / deg, np.diff(offsets))
    bk = _bucket_of(dst, n_buckets)
    order = np.argsort(bk, kind="stable")
    d, c, bk = dst[order], contrib[order], bk[order]
    bounds = np.searchsorted(bk, np.arange(n_buckets + 1))
    # ids stay int64 (packing them into the float contribution array
    # would corrupt node ids above 2^53 — e.g. hashed doc ids)
    return tuple(
        (d[s:e], c[s:e]) for s, e in zip(bounds[:-1], bounds[1:])
    )


@ray.remote
def _pr_gather(prep, damping: float, n_nodes: int, *parts: np.ndarray):
    """Sum incoming contributions for this bucket's owned nodes and apply
    the damped update. Returns the new rank vector aligned to prep's ids."""
    ids = prep[0]
    acc = np.zeros(ids.size, dtype=np.float64)
    for dst, contrib in parts:
        if dst.size:
            idx = np.searchsorted(ids, dst)
            np.add.at(acc, idx, contrib)
    return (1.0 - damping) / n_nodes + damping * acc


def pagerank(
    edges: rd.Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    rank_col: str = "rank",
    damping: float = 0.85,
    n_iter: int = 20,
    n_buckets: int = 32,
) -> rd.Dataset:
    """PageRank over an undirected edge Dataset as BSP task waves on the
    connected-components scaffolding — the second iterative graph
    operator this engine runs outside the Dataset API (per-iteration
    Dataset executions pay plan overhead the loop multiplies; a wave of
    n_buckets tasks costs milliseconds).

    Near-dup use case: canonical-document selection by CENTRALITY — in a
    near-dup cluster the highest-rank member is the one most similar to
    the rest (hub), often a better keep than min-id. Isolated nodes are
    excluded (rank is defined over edge endpoints); dangling mass is not
    an issue for undirected graphs (every endpoint has degree >= 1).

    Adjacency is built ONCE (csr per bucket, pinned in the object store);
    each iteration moves only (dst, contribution) float pairs. Returns a
    Dataset of (node_col, rank_col); ranks sum to ~1 over endpoints.
    """
    nb = n_buckets
    scattered = [
        _pr_scatter.options(num_returns=nb).remote(r, id_a, id_b, nb)
        for r in exchange.iter_block_refs(edges.select_columns([id_a, id_b]))
    ]
    parts = [[s[b] for s in scattered] for b in range(nb)] if scattered else [
        [] for _ in range(nb)
    ]
    preps = [_pr_prep.remote(b, nb, *parts[b]) for b in range(nb)]
    sizes = ray.get([_pr_size.remote(p) for p in preps])
    n_nodes = int(sum(sizes))
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({node_col: np.empty(0, np.int64), rank_col: np.empty(0, float)})
        )
    ranks = [
        ray.put(np.full(s, 1.0 / n_nodes, dtype=np.float64)) for s in sizes
    ]
    for _ in range(n_iter):
        outs = [
            _pr_round.options(num_returns=nb).remote(preps[b], ranks[b], nb)
            for b in range(nb)
        ]
        ranks = [
            _pr_gather.remote(
                preps[b], damping, n_nodes, *[outs[src][b] for src in range(nb)]
            )
            for b in range(nb)
        ]
    tables = [
        _pr_emit.remote(preps[b], ranks[b], node_col, rank_col) for b in range(nb)
    ]
    return rd.from_arrow_refs(tables)


@ray.remote
def _pr_size(prep) -> int:
    return int(prep[0].size)


@ray.remote
def _pr_emit(prep, rank: np.ndarray, node_col: str, rank_col: str) -> pa.Table:
    return pa.table({node_col: prep[0], rank_col: np.asarray(rank, dtype=np.float64)})
