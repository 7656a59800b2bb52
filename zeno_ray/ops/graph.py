"""Iterative graph analytics over the crawl's edge table.

PageRank as repeated keyed-shuffle joins — the one operator class the
engine lacked: an ITERATIVE all-to-all computation where each round's
output feeds the next round's shuffle.

Ray Data has no join, so each round uses the module-standard
repartition-join: tag both sides, ``union``, one coarse
``groupby("part")`` shuffle, vectorized pandas ``merge`` inside the
part (same discipline as ops/dedup.py — partitions are a pure function
of the key, a few per core, never raw-key groupbys). Per iteration:

1. contribs: edges ⋈ ranks on src (parts keyed by hash(src)) → emit
   per-part PARTIAL in-sums keyed by hash(dst) (the combiner);
2. apply: one groupby(hash(node) part) both reduces the partial
   in-sums AND joins them onto the node state, with the dangling-mass
   scalar folded in: ``rank' = (1-d)/N + d*(insum + dangling/N)`` —
   two shuffles per iteration total, the minimum for an edge-keyed
   then node-keyed round trip.

Driver traffic per iteration is ONE scalar (the dangling mass); rank
state lives in the cluster as a materialized slim Dataset. At 10^8
nodes / 10^10 edges every stage is a bounded-width keyed shuffle.

Determinism: partition assignment is a pure function of the key
(``pd.util.hash_array``, fixed key) and every per-part kernel sorts
before reducing, so reruns produce identical floats; the sequential
python oracle (scripts/check_oracles.py) compares to 1e-6 relative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _part(keys, n_parts: int) -> np.ndarray:
    """Deterministic coarse partition of a string/int key array."""
    arr = np.asarray(keys, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(n_parts)).astype("int64")


def pagerank(edges_ds, n_iter: int = 10, d: float = 0.85,
             n_parts: int | None = None,
             max_broadcast_nodes: int = 2_000_000):
    """PageRank over a directed edge Dataset with columns (src, dst).

    Duplicate edges are collapsed (each distinct (src, dst) counts
    once); nodes are the union of both endpoints; dangling nodes
    redistribute uniformly. Returns a Dataset (node, rank).

    Two execution paths, picked by node count (same discipline as the
    ANN ops' broadcast-vs-shuffle split):

    - ``n_nodes <= max_broadcast_nodes`` (the usual host-graph regime:
      node count ≪ edge count): factorize nodes to int ids once, hold
      the rank vector on the driver (N×8 bytes), ``ray.put`` the
      per-iteration contribution vector, and run ONE shuffle-free
      ``map_batches`` over the loop-invariant int-edge table per
      iteration, reducing sparse ``bincount`` partials on the driver.
      The edge table never moves after the initial dedupe shuffle —
      the Dataset union+groupby form would re-shuffle all edges twice
      per iteration (measured 205 s → ~30 s on a 3.1M-edge host graph).
    - bigger graphs: keyed-shuffle iterations (repartition-join of
      state onto edges), fully distributed state, one scalar of driver
      traffic per iteration.
    """
    from ray.data.aggregate import Sum

    if n_parts is None:
        from zeno_ray.ops.dedup import _coarse_n_parts

        n_parts = _coarse_n_parts()

    def edge_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "dst"]].drop_duplicates()
        return out.assign(part=_part(out["src"], n_parts))

    edges = (
        edges_ds.map_batches(edge_part, batch_format="pandas", batch_size=16384)
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates(["src", "dst"]),
                    batch_format="pandas")
        .repartition(n_parts)  # bound block count: groupby preserves input
        .materialize()         # blocks and union ADDS them — unbounded
    )                          # lineages grow quadratic shuffles

    # partition-count sizing is data-adaptive: every one of the ~2·n_iter
    # shuffles pays a fixed per-part/per-block scheduling cost, so a tiny
    # graph on coarse CPU-scaled parts spends 10× longer scheduling than
    # computing (measured 131s → 17s at 6k edges). Downshift AFTER the
    # dedupe when the graph is small — big graphs take the one count()
    # and skip the relabel.
    n_edges = edges.count()
    ideal = int(np.clip(n_edges // 20000 + 4, 4, n_parts))
    if ideal < n_parts:
        n_parts = ideal
        edges = (
            edges.map_batches(
                lambda df: df.assign(part=_part(df["src"], n_parts)),
                batch_format="pandas")
            .repartition(n_parts)
            .materialize()
        )

    # out-degree per src (combiner per batch, then one slim part shuffle)
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("src", as_index=False).agg(deg=("dst", "size"))
        return vc.assign(part=_part(vc["src"], n_parts))

    deg = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda g: g.groupby(["part", "src"], as_index=False)
            .agg(deg=("deg", "sum")),
            batch_format="pandas")
    )

    # node universe: endpoints of either side, keyed by hash(node)
    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(
            np.concatenate([df["src"].to_numpy(object),
                            df["dst"].to_numpy(object)]))
        return pd.DataFrame({"node": nodes,
                             "part": _part(nodes, n_parts)})

    nodes = (
        edges.map_batches(node_partial, batch_format="pandas")
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates("node"),
                    batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda df: pd.DataFrame({
                "node": pd.Series([], dtype=object),
                "rank": pd.Series([], dtype="float64")}),
            batch_format="pandas")

    if n_nodes <= max_broadcast_nodes:
        return _pagerank_broadcast(edges, nodes, n_nodes, n_iter, d)

    # state0 = nodes ⋈ deg (same part keying on both sides), rank = 1/N
    # repartition-join discipline: both sides carry the full column set
    # (typed sentinels, never all-null object columns — Arrow would
    # infer a null type and refuse the union) plus an int tag.
    def seed_state(g: pd.DataFrame) -> pd.DataFrame:
        degs = g[g["tag"] == 1].rename(columns={"src": "dnode"})
        base = g[g["tag"] == 0][["node", "part"]]
        m = base.merge(degs[["dnode", "deg"]], left_on="node",
                       right_on="dnode", how="left")
        m["deg"] = m["deg"].fillna(0).astype("int64")
        m["rank"] = 1.0 / n_nodes
        return m.sort_values("node", kind="stable")[
            ["node", "deg", "rank", "part"]]

    deg_tagged = deg.map_batches(
        lambda df: pd.DataFrame({
            "node": np.full(len(df), "", dtype=object),
            "part": df["part"], "src": df["src"],
            "deg": df["deg"].astype("float64"),
            "tag": np.ones(len(df), dtype=np.int8)}),
        batch_format="pandas")
    nodes_tagged = nodes.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"], "part": df["part"],
            "src": np.full(len(df), "", dtype=object),
            "deg": np.zeros(len(df), dtype="float64"),
            "tag": np.zeros(len(df), dtype=np.int8)}),
        batch_format="pandas")
    state = (
        nodes_tagged.union(deg_tagged)
        .groupby("part")
        .map_groups(seed_state, batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )

    edges_tagged = edges.map_batches(
        lambda df: pd.DataFrame({
            "part": df["part"], "key": df["src"], "dst": df["dst"],
            "w": np.zeros(len(df), dtype="float64"),
            "tag": np.zeros(len(df), dtype=np.int8)}),
        batch_format="pandas").repartition(n_parts).materialize()

    def contribs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        # partial in-sums per part, re-keyed by hash(dst) so they land in
        # the SAME shuffle as the state rows (schema-aligned, tag=1) —
        # the in-sum reduce and the rank apply share one groupby
        rates = g[g["tag"] == 1][["key", "w"]]
        ee = g[g["tag"] == 0][["key", "dst"]]
        m = ee.merge(rates, on="key", how="inner")
        m = m.sort_values("dst", kind="stable")
        out = m.groupby("dst", as_index=False).agg(w=("w", "sum"))
        out = out.rename(columns={"dst": "node"})
        return pd.DataFrame({
            "node": out["node"], "part": _part(out["node"], n_parts),
            "deg": np.zeros(len(out), dtype="float64"),
            "w": out["w"].astype("float64"),
            "tag": np.ones(len(out), dtype=np.int8)})

    for _ in range(n_iter):
        dangling = state.map_batches(
            lambda df: pd.DataFrame({
                "x": [df.loc[df["deg"] == 0, "rank"].sum()]}),
            batch_format="pandas").sum("x") or 0.0

        rank_tagged = state.map_batches(
            lambda df: pd.DataFrame({
                "part": df["part"], "key": df["node"],
                "dst": np.full(len(df), "", dtype=object),
                "w": np.where(df["deg"].to_numpy() > 0,
                              df["rank"].to_numpy()
                              / np.maximum(df["deg"].to_numpy(), 1), 0.0),
                "tag": np.ones(len(df), dtype=np.int8)}),
            batch_format="pandas")

        insums = (
            edges_tagged.union(rank_tagged)
            .groupby("part")
            .map_groups(contribs_in_part, batch_format="pandas")
        )

        base_share = (1.0 - d) / n_nodes + d * dangling / n_nodes

        def apply_ranks(g: pd.DataFrame,
                        base_share: float = base_share) -> pd.DataFrame:
            ins = g[g["tag"] == 1].sort_values("node", kind="stable")
            sums = ins.groupby("node", as_index=False).agg(w=("w", "sum"))
            st = g[g["tag"] == 0][["node", "deg", "part"]]
            m = st.merge(sums, on="node", how="left")
            m["w"] = m["w"].fillna(0.0)
            m["rank"] = base_share + d * m["w"].to_numpy()
            m["deg"] = m["deg"].astype("int64")
            return m.sort_values("node", kind="stable")[
                ["node", "deg", "rank", "part"]]

        state_tagged = state.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"], "part": df["part"],
                "deg": df["deg"].astype("float64"),
                "w": np.zeros(len(df), dtype="float64"),
                "tag": np.zeros(len(df), dtype=np.int8)}),
            batch_format="pandas")

        state = (
            state_tagged.union(insums)
            .groupby("part")
            .map_groups(apply_ranks, batch_format="pandas")
            .repartition(n_parts)  # keep state's block count constant
            .materialize()         # across iterations (see edges note)
        )

    return state.map_batches(
        lambda df: df[["node", "rank"]], batch_format="pandas")


def _pagerank_broadcast(edges, nodes, n: int, n_iter: int, d: float):
    """Small-node-count PageRank path: driver-held rank vector,
    shuffle-free iterations over a loop-invariant factorized edge table.

    ``edges``/``nodes`` are the materialized, globally-deduped Datasets
    built by :func:`pagerank`. Driver memory is O(n) (the node→id map
    and two float vectors) — bounded by ``max_broadcast_nodes``. Per
    iteration: ``ray.put`` the contribution vector (n×8 bytes, read
    zero-copy from the object store by every map task), one
    ``map_batches`` over the int-edge table emitting SPARSE per-block
    bincount partials (≤ min(n, block_rows) entries), driver-side
    ``acc[ids] += w`` reduce. No edge bytes move after the initial
    dedupe shuffle.
    """
    import ray as _ray

    node_pdf = nodes.to_pandas()  # O(n) by contract (small-N path)
    node_arr = node_pdf["node"].to_numpy(object)
    idx = pd.Series(np.arange(n, dtype=np.int64), index=node_arr)
    idx_ref = _ray.put(idx)

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        ii = _ray.get(idx_ref)
        return pd.DataFrame({
            "s": ii.reindex(df["src"].to_numpy(object)).to_numpy(np.int64),
            "t": ii.reindex(df["dst"].to_numpy(object)).to_numpy(np.int64),
        })

    ie = edges.map_batches(to_ids, batch_format="pandas",
                           batch_size=1 << 20).materialize()

    def _sparse(vec: np.ndarray) -> pd.DataFrame:
        nz = np.nonzero(vec)[0]
        return pd.DataFrame({"ids": [nz.astype(np.int64).tobytes()],
                             "w": [vec[nz].astype(np.float64).tobytes()]})

    def _reduce(parts: pd.DataFrame) -> np.ndarray:
        acc = np.zeros(n)
        for row in parts.itertuples(index=False):
            acc[np.frombuffer(row.ids, np.int64)] += np.frombuffer(row.w)
        return acc

    deg = _reduce(ie.map_batches(
        lambda df: _sparse(np.bincount(df["s"].to_numpy(), minlength=n)
                           .astype(np.float64)),
        batch_format="pandas", batch_size=1 << 20).to_pandas())

    rank = np.full(n, 1.0 / n)
    safe_deg = np.maximum(deg, 1.0)
    for _ in range(n_iter):
        dangling = rank[deg == 0].sum()
        contrib_ref = _ray.put(np.where(deg > 0, rank / safe_deg, 0.0))

        def part_fn(df: pd.DataFrame,
                    contrib_ref=contrib_ref) -> pd.DataFrame:
            c = _ray.get(contrib_ref)
            return _sparse(np.bincount(
                df["t"].to_numpy(), weights=c[df["s"].to_numpy()],
                minlength=n))

        acc = _reduce(ie.map_batches(
            part_fn, batch_format="pandas",
            batch_size=1 << 20).to_pandas())
        rank = (1.0 - d) / n + d * dangling / n + d * acc

    rank_ref = _ray.put(rank)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ii = _ray.get(idx_ref)
        rr = _ray.get(rank_ref)
        ids = ii.reindex(df["node"].to_numpy(object)).to_numpy(np.int64)
        return pd.DataFrame({"node": df["node"], "rank": rr[ids]})

    return nodes.map_batches(attach, batch_format="pandas")


def connected_components(edges_ds, n_parts: int | None = None,
                         max_broadcast_nodes: int = 2_000_000,
                         max_iter: int = 100):
    """Undirected connected components over an edge Dataset (src, dst).

    Returns a Dataset (node, component) where ``component`` is the
    lexicographically smallest node name in the component — a
    deterministic representative independent of partitioning/execution
    path. Same two-path structure as :func:`pagerank`:

    - broadcast path (node count ≤ ``max_broadcast_nodes``): node ids
      assigned in SORTED name order (so min id ≡ lexicographic min),
      labels held on the driver, min-label propagation with one
      shuffle-free ``map_batches`` over the loop-invariant int-edge
      table per round plus driver-side pointer jumping — converges in
      O(log diameter) rounds, stops when no label changes;
    - keyed-shuffle path: min-label propagation where labels ARE node
      names (string min ≡ lexicographic min), two coarse shuffles per
      round, convergence detected by a changed-count aggregate.
    """
    if n_parts is None:
        from zeno_ray.ops.dedup import _coarse_n_parts

        n_parts = _coarse_n_parts()

    def edge_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "dst"]].drop_duplicates()
        return out.assign(part=_part(out["src"], n_parts))

    edges = (
        edges_ds.map_batches(edge_part, batch_format="pandas",
                             batch_size=16384)
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates(["src", "dst"]),
                    batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )
    n_edges = edges.count()
    ideal = int(np.clip(n_edges // 20000 + 4, 4, n_parts))
    if ideal < n_parts:
        n_parts = ideal
        edges = (
            edges.map_batches(
                lambda df: df.assign(part=_part(df["src"], n_parts)),
                batch_format="pandas")
            .repartition(n_parts).materialize())

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq = pd.unique(np.concatenate([df["src"].to_numpy(object),
                                         df["dst"].to_numpy(object)]))
        return pd.DataFrame({"node": uniq, "part": _part(uniq, n_parts)})

    nodes = (
        edges.map_batches(node_partial, batch_format="pandas")
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates("node"),
                    batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda df: pd.DataFrame({
                "node": pd.Series([], dtype=object),
                "component": pd.Series([], dtype=object)}),
            batch_format="pandas")

    if n_nodes <= max_broadcast_nodes:
        return _components_broadcast(edges, nodes, n_nodes, max_iter)
    return _components_shuffle(edges, nodes, n_parts, max_iter)


def _components_broadcast(edges, nodes, n: int, max_iter: int):
    """Driver-held label vector; per round one shuffle-free pass over
    the factorized edge table emitting sparse per-block min partials,
    then pointer jumping on the driver. Ids are assigned in sorted name
    order so the min id is the lexicographic-min representative."""
    import ray as _ray

    node_pdf = nodes.to_pandas().sort_values("node", kind="stable")
    node_arr = node_pdf["node"].to_numpy(object)
    idx = pd.Series(np.arange(n, dtype=np.int64), index=node_arr)
    idx_ref = _ray.put(idx)

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        ii = _ray.get(idx_ref)
        return pd.DataFrame({
            "s": ii.reindex(df["src"].to_numpy(object)).to_numpy(np.int64),
            "t": ii.reindex(df["dst"].to_numpy(object)).to_numpy(np.int64),
        })

    ie = edges.map_batches(to_ids, batch_format="pandas",
                           batch_size=1 << 20).materialize()

    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        lab_ref = _ray.put(labels)

        def min_partial(df: pd.DataFrame, lab_ref=lab_ref) -> pd.DataFrame:
            lab = _ray.get(lab_ref)
            s = df["s"].to_numpy()
            t = df["t"].to_numpy()
            cand = np.full(len(lab), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(cand, t, lab[s])  # undirected: both directions
            np.minimum.at(cand, s, lab[t])
            nz = np.nonzero(cand < lab)[0]
            return pd.DataFrame({"ids": [nz.tobytes()],
                                 "w": [cand[nz].tobytes()]})

        new = labels.copy()
        for row in ie.map_batches(
                min_partial, batch_format="pandas",
                batch_size=1 << 20).to_pandas().itertuples(index=False):
            ids = np.frombuffer(row.ids, np.int64)
            np.minimum.at(new, ids, np.frombuffer(row.w, np.int64))
        # pointer jumping: labels point at ever-smaller ids, so chase
        # until fixpoint (cheap O(n alpha) driver work)
        while True:
            jumped = new[new]
            if (jumped == new).all():
                break
            new = jumped
        if (new == labels).all():
            break
        labels = new

    comp_ref = _ray.put(node_arr[labels])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ii = _ray.get(idx_ref)
        comp = _ray.get(comp_ref)
        ids = ii.reindex(df["node"].to_numpy(object)).to_numpy(np.int64)
        return pd.DataFrame({"node": df["node"], "component": comp[ids]})

    return nodes.map_batches(attach, batch_format="pandas")


def _components_shuffle(edges, nodes, n_parts: int, max_iter: int):
    """Scale path: labels ARE node-name strings (string min ≡
    lexicographic min); two coarse keyed shuffles per round, matching
    the pagerank shuffle discipline; convergence via a changed-count
    aggregate (one scalar of driver traffic per round)."""

    # undirected: materialize both directions once, keyed by hash(key)
    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        key = np.concatenate([df["src"].to_numpy(object),
                              df["dst"].to_numpy(object)])
        oth = np.concatenate([df["dst"].to_numpy(object),
                              df["src"].to_numpy(object)])
        return pd.DataFrame({
            "part": _part(key, n_parts), "key": key, "oth": oth,
            "lab": np.full(len(key), "", dtype=object),
            "tag": np.zeros(len(key), dtype=np.int8)})

    ed = edges.map_batches(both_dirs, batch_format="pandas") \
        .repartition(n_parts).materialize()

    state = nodes.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"], "part": df["part"],
            "lab": df["node"].to_numpy(object),
            "chg": np.zeros(len(df), dtype=np.int8)}),
        batch_format="pandas").repartition(n_parts).materialize()

    def cand_in_part(g: pd.DataFrame) -> pd.DataFrame:
        labs = g[g["tag"] == 1][["key", "lab"]] \
            .rename(columns={"key": "node", "lab": "l"})
        ee = g[g["tag"] == 0][["key", "oth"]]
        m = ee.merge(labs, left_on="key", right_on="node", how="inner")
        m = m.sort_values("oth", kind="stable")
        out = m.groupby("oth", as_index=False).agg(lab=("l", "min"))
        out = out.rename(columns={"oth": "node"})
        return pd.DataFrame({
            "node": out["node"], "part": _part(out["node"], n_parts),
            "lab": out["lab"], "chg": np.ones(len(out), dtype=np.int8)})

    def apply_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "lab"], kind="stable")
        best = g.groupby("node", as_index=False).agg(lab=("lab", "min"))
        st = g[g["chg"] == 0][["node", "part", "lab"]] \
            .rename(columns={"lab": "old"})
        m = st.merge(best, on="node", how="left")
        m["lab"] = np.minimum(m["lab"].fillna(m["old"]), m["old"])
        m["chg"] = (m["lab"] != m["old"]).astype(np.int8)
        return m[["node", "part", "lab", "chg"]]

    for _ in range(max_iter):
        lab_tagged = state.map_batches(
            lambda df: pd.DataFrame({
                "part": df["part"], "key": df["node"],
                "oth": np.full(len(df), "", dtype=object),
                "lab": df["lab"], "tag": np.ones(len(df), dtype=np.int8)}),
            batch_format="pandas")
        cands = (
            ed.union(lab_tagged)
            .groupby("part")
            .map_groups(cand_in_part, batch_format="pandas")
        )
        state_tagged = state.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"], "part": df["part"], "lab": df["lab"],
                "chg": np.zeros(len(df), dtype=np.int8)}),
            batch_format="pandas")
        state = (
            state_tagged.union(cands)
            .groupby("part")
            .map_groups(apply_min, batch_format="pandas")
            .repartition(n_parts)
            .materialize()
        )
        if (state.sum("chg") or 0) == 0:
            break

    return state.map_batches(
        lambda df: pd.DataFrame({"node": df["node"],
                                 "component": df["lab"]}),
        batch_format="pandas")


def components_sequential(edge_pairs) -> dict:
    """Driver-side union-find reference (the python oracle): component
    representative is the lexicographically smallest member."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def pagerank_sequential(edge_pairs, n_iter: int = 10,
                        d: float = 0.85) -> dict:
    """Driver-side reference implementation (the python oracle): plain
    numpy power iteration over a deduped edge list. Same semantics as
    :func:`pagerank` — used only for verification at small scale."""
    pairs = sorted(set(map(tuple, edge_pairs)))
    nodes = sorted({s for s, _ in pairs} | {t for _, t in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    src = np.array([idx[s] for s, _ in pairs], dtype=np.int64)
    dst = np.array([idx[t] for _, t in pairs], dtype=np.int64)
    deg = np.bincount(src, minlength=n)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = rank[deg == 0].sum()
        contrib = rank[src] / np.maximum(deg[src], 1)
        insum = np.bincount(dst, weights=contrib, minlength=n)
        rank = (1.0 - d) / n + d * (dangling / n) + d * insum
    return dict(zip(nodes, rank))


# ----------------------------------------------------------------- HITS


def hits(edges_ds, n_iter: int = 20, n_parts: int | None = None,
         max_broadcast_nodes: int = 2_000_000):
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    Dataset (src, dst) — the link-analysis complement to PageRank: a
    good *hub* links to good authorities, a good *authority* is linked
    from good hubs. Duplicate edges collapse; L2 normalization per
    half-step; returns a **pandas DataFrame** (node, hub, authority),
    rounded to 8 decimals.

    Two execution paths, picked by node count (the :func:`pagerank`
    split):

    - ``n_nodes <= max_broadcast_nodes`` (the usual host-graph regime:
      node count ≪ edge count): dedupe-shuffle the edges once,
      factorize to a loop-invariant int-edge table, then per iteration
      run TWO shuffle-free ``map_batches`` passes (authority pull then
      hub pull) with the current vector ``ray.put`` and sparse bincount
      partials reduced on the driver. Edge bytes never move after the
      initial dedupe.
    - bigger graphs: keyed-shuffle iterations composing pagerank's
      large-graph repartition-join (``_hits_shuffle``) — fully
      distributed raw hub/auth state, two repartition-joins per
      half-step, ONE scalar (the L2 norm) of driver traffic per
      half-step, result collected only at the end.

    Both paths reduce float partials in partition/block order, so they
    match :func:`hits_sequential` to summation-order error (~1e-15
    relative; the tests assert ``atol=1e-8`` on the rounded values, not
    bit equality)."""
    if n_parts is None:
        from zeno_ray.ops.dedup import _coarse_n_parts

        n_parts = _coarse_n_parts()

    def edge_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["src", "dst"]].drop_duplicates()
        return out.assign(part=_part(out["src"], n_parts))

    edges = (
        edges_ds.map_batches(edge_part, batch_format="pandas",
                             batch_size=16384)
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates(["src", "dst"]),
                    batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )
    n_edges = edges.count()
    ideal = int(np.clip(n_edges // 20000 + 4, 4, n_parts))
    if ideal < n_parts:
        n_parts = ideal
        edges = (
            edges.map_batches(
                lambda df: df.assign(part=_part(df["src"], n_parts)),
                batch_format="pandas")
            .repartition(n_parts).materialize())

    # node universe, distributed (hash(node)-keyed) — counted BEFORE
    # any driver-side collect so the >bound branch never materializes
    # node names on the driver
    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq = pd.unique(np.concatenate([df["src"].to_numpy(object),
                                         df["dst"].to_numpy(object)]))
        return pd.DataFrame({"node": uniq, "part": _part(uniq, n_parts)})

    nodes = (
        edges.map_batches(node_partial, batch_format="pandas")
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates("node"),
                    batch_format="pandas")
        .repartition(n_parts)
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "hub": pd.Series([], dtype="float64"),
                             "authority": pd.Series([], dtype="float64")})
    if n > max_broadcast_nodes:
        return _hits_shuffle(edges, nodes, n, n_parts, n_iter)
    return _hits_broadcast(edges, nodes, n, n_iter)


def _hits_broadcast(edges, nodes, n: int, n_iter: int) -> pd.DataFrame:
    """Small-node-count HITS path: driver-held hub/auth vectors,
    shuffle-free bincount pulls over a loop-invariant int-edge table
    (see :func:`hits`)."""
    import ray as _ray

    node_pdf = (nodes.to_pandas()[["node"]]
                .sort_values("node", kind="stable").reset_index(drop=True))
    idx = pd.Series(np.arange(n, dtype=np.int64),
                    index=node_pdf["node"].to_numpy(object))
    idx_ref = _ray.put(idx)

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        ii = _ray.get(idx_ref)
        return pd.DataFrame({
            "s": ii.reindex(df["src"].to_numpy(object)).to_numpy(np.int64),
            "t": ii.reindex(df["dst"].to_numpy(object)).to_numpy(np.int64),
        })

    ie = edges.map_batches(to_ids, batch_format="pandas",
                           batch_size=1 << 20).materialize()

    def _sparse(vec: np.ndarray) -> pd.DataFrame:
        nz = np.nonzero(vec)[0]
        return pd.DataFrame({"ids": [nz.astype(np.int64).tobytes()],
                             "w": [vec[nz].astype(np.float64).tobytes()]})

    def _reduce(parts: pd.DataFrame) -> np.ndarray:
        acc = np.zeros(n)
        for row in parts.itertuples(index=False):
            acc[np.frombuffer(row.ids, np.int64)] += np.frombuffer(row.w)
        return acc

    def _pull(vec: np.ndarray, src_col: str, dst_col: str) -> np.ndarray:
        vec_ref = _ray.put(vec)

        def part_fn(df: pd.DataFrame, vec_ref=vec_ref) -> pd.DataFrame:
            v = _ray.get(vec_ref)
            return _sparse(np.bincount(
                df[dst_col].to_numpy(),
                weights=v[df[src_col].to_numpy()], minlength=n))

        out = _reduce(ie.map_batches(
            part_fn, batch_format="pandas",
            batch_size=1 << 20).to_pandas())
        norm = np.linalg.norm(out)
        return out / norm if norm > 0 else out

    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.zeros(n)
    for _ in range(n_iter):
        auth = _pull(hub, "s", "t")   # authority ← sum of in-hub
        hub = _pull(auth, "t", "s")   # hub ← sum of out-authority

    return pd.DataFrame({
        "node": node_pdf["node"],
        "hub": np.round(hub, 8),
        "authority": np.round(auth, 8),
    })


def _hits_shuffle(edges, nodes, n: int, n_parts: int,
                  n_iter: int) -> pd.DataFrame:
    """Large-graph HITS: composes pagerank's keyed-shuffle
    repartition-join iteration. State (node, part, hub, auth) stays
    fully distributed across iterations; per half-step:

    1. contribs: loop-invariant tagged edge table (keyed by hash of the
       pull's join side) ⋈ the scaled state vector in ONE
       groupby("part"), emitting per-part partial sums re-keyed by
       hash(target node);
    2. apply: a second groupby("part") reduces the partials AND joins
       them onto state, replacing the pulled column with its raw sum;
    3. ONE scalar (the L2 norm) returns to the driver; normalization is
       folded into the NEXT emit and the final output — exactly the
       scalar-per-iteration discipline of pagerank's dangling mass.

    The authority pull joins on src (edge table keyed by hash(src));
    the hub pull joins on dst (a second loop-invariant table keyed by
    hash(dst)). Two edge tables materialized once, two coarse shuffles
    per half-step, no whole-graph driver state until the final collect
    (which callers at 10^8-node scale should replace by consuming the
    slim (node, hub, auth) state as a Dataset)."""

    def tag_edges(key_col: str, oth_col: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            key = df[key_col].to_numpy(object)
            return pd.DataFrame({
                "part": _part(key, n_parts), "key": key,
                "oth": df[oth_col].to_numpy(object),
                "w": np.zeros(len(df), dtype="float64"),
                "tag": np.zeros(len(df), dtype=np.int8)})
        return f

    e_src = edges.map_batches(tag_edges("src", "dst"),
                              batch_format="pandas") \
        .repartition(n_parts).materialize()
    e_dst = edges.map_batches(tag_edges("dst", "src"),
                              batch_format="pandas") \
        .repartition(n_parts).materialize()

    state = nodes.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"], "part": df["part"],
            "hub": np.full(len(df), 1.0 / np.sqrt(n)),
            "auth": np.zeros(len(df))}),
        batch_format="pandas").repartition(n_parts).materialize()

    def contribs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        rates = g[g["tag"] == 1][["key", "w"]]
        ee = g[g["tag"] == 0][["key", "oth"]]
        m = ee.merge(rates, on="key", how="inner")
        m = m.sort_values("oth", kind="stable")
        out = m.groupby("oth", as_index=False).agg(w=("w", "sum"))
        k = len(out)
        return pd.DataFrame({
            "node": out["oth"], "part": _part(out["oth"], n_parts),
            "hub": np.zeros(k), "auth": np.zeros(k),
            "w": out["w"].astype("float64"),
            "tag": np.ones(k, dtype=np.int8)})

    def apply_pull(col: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            ins = g[g["tag"] == 1].sort_values("node", kind="stable")
            sums = ins.groupby("node", as_index=False).agg(w=("w", "sum"))
            st = g[g["tag"] == 0][["node", "part", "hub", "auth"]]
            m = st.merge(sums, on="node", how="left")
            m[col] = m["w"].fillna(0.0)
            return m.sort_values("node", kind="stable")[
                ["node", "part", "hub", "auth"]]
        return f

    def half(state, e_tab, from_col: str, to_col: str, from_norm: float):
        emit = state.map_batches(
            lambda df, c=from_col, nn=from_norm: pd.DataFrame({
                "part": df["part"], "key": df["node"],
                "oth": np.full(len(df), "", dtype=object),
                "w": df[c].to_numpy() / nn,
                "tag": np.ones(len(df), dtype=np.int8)}),
            batch_format="pandas")
        partials = (
            e_tab.union(emit)
            .groupby("part")
            .map_groups(contribs_in_part, batch_format="pandas"))
        state_tagged = state.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"], "part": df["part"],
                "hub": df["hub"], "auth": df["auth"],
                "w": np.zeros(len(df), dtype="float64"),
                "tag": np.zeros(len(df), dtype=np.int8)}),
            batch_format="pandas")
        new_state = (
            state_tagged.union(partials)
            .groupby("part")
            .map_groups(apply_pull(to_col), batch_format="pandas")
            .repartition(n_parts)  # bound block count per iteration
            .materialize())        # (see the pagerank lineage note)
        ss = new_state.map_batches(
            lambda df, c=to_col: pd.DataFrame(
                {"x": [float((df[c].to_numpy() ** 2).sum())]}),
            batch_format="pandas").sum("x") or 0.0
        norm = float(np.sqrt(ss))
        # norm == 0 ⇒ leave the raw (all-zero) vector, like sequential
        return new_state, (norm if norm > 0 else 1.0)

    hub_norm = 1.0  # hub starts already normalized (1/sqrt(n))
    auth_norm = 1.0
    for _ in range(n_iter):
        state, auth_norm = half(state, e_src, "hub", "auth", hub_norm)
        state, hub_norm = half(state, e_dst, "auth", "hub", auth_norm)

    out = state.map_batches(
        lambda df, hn=hub_norm, an=auth_norm: pd.DataFrame({
            "node": df["node"],
            "hub": np.round(df["hub"].to_numpy() / hn, 8),
            "authority": np.round(df["auth"].to_numpy() / an, 8)}),
        batch_format="pandas")
    return (out.to_pandas().sort_values("node", kind="stable")
            .reset_index(drop=True))


def hits_sequential(edge_pairs, n_iter: int = 20) -> pd.DataFrame:
    """Driver-side numpy reference (the python oracle): same dedupe,
    node order, normalization — must match :func:`hits` exactly."""
    df = pd.DataFrame(edge_pairs, columns=["src", "dst"]).drop_duplicates()
    nodes = sorted(set(df["src"]) | set(df["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = df["src"].map(idx).to_numpy()
    t = df["dst"].map(idx).to_numpy()
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.zeros(n)
    for _ in range(n_iter):
        auth = np.bincount(t, weights=hub[s], minlength=n)
        na = np.linalg.norm(auth)
        auth = auth / na if na > 0 else auth
        hub = np.bincount(s, weights=auth[t], minlength=n)
        nh = np.linalg.norm(hub)
        hub = hub / nh if nh > 0 else hub
    return pd.DataFrame({"node": nodes, "hub": np.round(hub, 8),
                         "authority": np.round(auth, 8)})
