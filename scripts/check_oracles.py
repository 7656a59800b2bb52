"""Local mimic of the driver's correctness gate: run every queries() entry at
a given sf, run the matching oracle_sql() in DuckDB over the same tables,
compare row count, column names and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


# --------------------------------------------------------- python oracles
# Driver-independent checks for the queries DuckDB cannot express: each
# runs SEQUENTIALLY on the driver (no Ray) and validates the distributed
# result — catching batching/shuffle/ordering bugs, which is exactly what
# a SQL oracle would catch. Semantic checks (true Jaccard, true cosine)
# are computed from the raw tables, independent of the hash/LSH code.


def _shingle_set(text: str, k: int = 5) -> set:
    t = " ".join(text.lower().split())
    return {t[i:i + k] for i in range(max(1, len(t) - k + 1))}


def check_doc_langid(got: pd.DataFrame, sf_dir: str) -> None:
    from zeno_ray.ops.text import LangIdStage

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    seq = LangIdStage()(docs.sort_values("doc_id").reset_index(drop=True))
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["pred_lang"].to_numpy() == seq["pred_lang"].to_numpy()).all(), \
        "distributed langid != sequential re-execution"


def check_doc_fingerprint(got: pd.DataFrame, sf_dir: str) -> None:
    from zeno_ray.ops.text import fingerprint

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    seq = fingerprint(docs.sort_values("doc_id").reset_index(drop=True))
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["fingerprint"].to_numpy(object)
            == seq["fingerprint"].to_numpy(object)).all(), \
        "distributed fingerprint != sequential re-execution"
    # property: exact-duplicate texts share a fingerprint
    full = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]).merge(got, on="doc_id")
    nuniq = full.groupby("text")["fingerprint"].nunique()
    assert (nuniq == 1).all(), "exact-dup texts got different fingerprints"


def check_dedup_minhash(got: pd.DataFrame, sf_dir: str) -> None:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cl = dict(zip(got["doc_id"], got["cluster"]))
    # exact-duplicate texts must co-cluster (recall floor)
    for _, g in docs.groupby("text"):
        ids = g["doc_id"].tolist()
        assert len({cl[i] for i in ids}) == 1, \
            f"exact dups split across clusters: {ids}"
    # clustered pairs must be genuinely similar: every multi-doc cluster
    # must contain at least one pair with TRUE shingle Jaccard >= 0.5
    texts = dict(zip(docs["doc_id"], docs["text"]))
    by_cluster: dict = {}
    for d, c in cl.items():
        by_cluster.setdefault(c, []).append(d)
    for c, ids in by_cluster.items():
        if len(ids) < 2:
            continue
        sets = [_shingle_set(texts[i]) for i in ids[:10]]
        best = max(
            len(a & b) / max(1, len(a | b))
            for i, a in enumerate(sets) for b in sets[i + 1:]
        )
        assert best >= 0.5, f"cluster {c} has no truly-similar pair ({best:.2f})"


def check_dedup_ngram(got: pd.DataFrame, sf_dir: str) -> None:
    """EXACT oracle: n-gram Jaccard is deterministic, so the distributed
    prefix-filtered pipeline must match a brute-force all-pairs
    union-find on the nose (same partition, min-id labels)."""
    import numpy as np

    from zeno_ray.ops.dedup import _edges_to_roots, _shingles

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy()
    sets = [np.unique(_shingles(t, 5)) for t in docs["text"]]
    sizes = np.array([len(s) for s in sets])
    ea, eb = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            lo, hi = sorted((sizes[i], sizes[j]))
            if lo < 0.8 * hi:
                continue  # length filter: Jaccard < threshold guaranteed
            inter = len(np.intersect1d(sets[i], sets[j],
                                       assume_unique=True))
            if inter / max(1, sizes[i] + sizes[j] - inter) >= 0.8:
                a, b = sorted((int(ids[i]), int(ids[j])))
                ea.append(a)
                eb.append(b)
    roots = _edges_to_roots(pd.DataFrame({"a": ea, "b": eb}))
    want = {int(d): roots.get(int(d), int(d)) for d in ids}
    got_cl = dict(zip(got["doc_id"].astype(int), got["cluster"].astype(int)))
    assert got_cl == want, \
        "distributed ngram-Jaccard clusters != brute-force ground truth"


def check_dedup_simhash(got: pd.DataFrame, sf_dir: str) -> None:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cl = dict(zip(got["doc_id"], got["cluster"]))
    for _, g in docs.groupby("text"):
        ids = g["doc_id"].tolist()
        assert len({cl[i] for i in ids}) == 1, \
            f"exact dups split across simhash clusters: {ids}"
    # cluster label is the min member id (the declared contract)
    by_cluster: dict = {}
    for d, c in cl.items():
        by_cluster.setdefault(c, []).append(d)
    for c, ids in by_cluster.items():
        assert c == min(ids), f"cluster label {c} != min member {min(ids)}"


def check_embedding_near_dup(got: pd.DataFrame, sf_dir: str) -> None:
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    ids = emb["vec_id"].to_numpy()
    idx = {int(v): i for i, v in enumerate(ids)}
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    true_nn = {int(ids[i]): int(ids[j]) for i, j in enumerate(sims.argmax(1))}
    # every reported sim must equal the true cosine of the reported pair
    for v, d, s in zip(got["vec_id"], got["dup_of"], got["sim"]):
        true = sims[idx[int(v)], idx[int(d)]]
        assert abs(float(s) - true) < 1e-4, f"sim mismatch for ({v},{d})"
    # LSH neighbor agrees with the TRUE nearest neighbor >= 85% of rows
    agree = np.mean([true_nn[int(v)] == int(d)
                     for v, d in zip(got["vec_id"], got["dup_of"])])
    assert agree >= 0.85, f"LSH NN agreement {agree:.2f} < 0.85"


def _media_table(sf_dir: str) -> pd.DataFrame:
    from zeno_ray.ops.multimodal import docs_to_media

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs_to_media(docs.sort_values("doc_id").reset_index(drop=True))


def check_mm_decode(got: pd.DataFrame, sf_dir: str) -> None:
    from zeno_ray.ops.multimodal import DecodeImageStage

    media = _media_table(sf_dir)
    seq = DecodeImageStage(fake=False)(media[media["kind"] == "image"])
    got = got.sort_values("media_id").reset_index(drop=True)
    seq = seq.sort_values("media_id").reset_index(drop=True)
    assert len(got) == len(seq), f"rows {len(got)} != sequential {len(seq)}"
    for col in ("width", "height", "mean_luma", "resized_mean_luma",
                "n_bytes", "kind"):
        assert (got[col].to_numpy() == seq[col].to_numpy()).all(), \
            f"distributed mm_decode {col} != sequential re-execution"


def check_mm_audio(got: pd.DataFrame, sf_dir: str) -> None:
    from zeno_ray.ops.multimodal import DecodeAudioStage

    media = _media_table(sf_dir)
    seq = DecodeAudioStage()(media[media["kind"] == "audio"])
    got = got.sort_values("media_id").reset_index(drop=True)
    seq = seq.sort_values("media_id").reset_index(drop=True)
    assert len(got) == len(seq), f"rows {len(got)} != sequential {len(seq)}"
    for col in ("sample_rate", "n_samples", "duration_sec", "rms"):
        assert (got[col].to_numpy() == seq[col].to_numpy()).all(), \
            f"distributed mm_audio {col} != sequential re-execution"


def check_mm_frames(got: pd.DataFrame, sf_dir: str) -> None:
    from zeno_ray.ops.multimodal import FrameSampleStage

    media = _media_table(sf_dir)
    seq = FrameSampleStage(every_n=4)(media[media["kind"] == "video"])
    got = got.sort_values(["media_id", "frame"]).reset_index(drop=True)
    seq = seq.sort_values(["media_id", "frame"]).reset_index(drop=True)
    assert len(got) == len(seq), f"rows {len(got)} != sequential {len(seq)}"
    for col in ("frame", "mean_luma", "feature_hash"):
        a, b = got[col].to_numpy(), seq[col].to_numpy()
        if col == "feature_hash":  # normalize() int64-casts; compare as u64
            a, b = a.astype(np.uint64), b.astype(np.uint64)
        assert (a == b).all(), \
            f"distributed mm_frames {col} != sequential re-execution"


def check_enrich_pages(got: pd.DataFrame, sf_dir: str) -> None:
    """Sequential re-execution of the enrichment stage over the same
    corpus pages (one pandas pass, no Ray)."""
    import glob

    import pyarrow as pa

    from zeno_ray.corpus import corpus_dir_for_sf, sf_of_dir
    from zeno_ray.pipelines import EnrichStage

    cdir = corpus_dir_for_sf(sf_of_dir(sf_dir), "/tmp/rayzeno_corpus")
    frames = [pd.read_parquet(p, columns=["url", "html", "status",
                                          "content_type"])
              for p in sorted(glob.glob(os.path.join(cdir, "pages/*.parquet")))]
    pages = pd.concat(frames, ignore_index=True)
    seq = EnrichStage()(pa.Table.from_pandas(pages)).to_pandas()
    seq = seq.sort_values("url").reset_index(drop=True)
    got = got.sort_values("url").reset_index(drop=True)
    assert len(seq) == len(got), f"rows {len(got)} != sequential {len(seq)}"
    for col in ("pred_lang", "n_tokens_ws", "fingerprint"):
        assert (got[col].to_numpy() == seq[col].to_numpy()).all(), \
            f"distributed enrich {col} != sequential re-execution"
    assert np.allclose(got["quality"].to_numpy(), seq["quality"].to_numpy())


def check_ann_topk_ivf(got: pd.DataFrame, sf_dir: str) -> None:
    """Ground truth: exact cosine top-10 per query from numpy; the IVF
    result must have recall ≥ 0.9 and every reported sim must equal the
    true cosine of its (q, vec_id) pair."""
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    ids = emb["vec_id"].to_numpy()
    idx = {int(v): i for i, v in enumerate(ids)}
    q = mat[[idx[0], idx[1], idx[2]]]
    sims = mat @ q.T
    hits = total = 0
    for qi in range(3):
        order = np.argsort(-sims[:, qi], kind="stable")[:10]
        true_top = {int(ids[i]) for i in order}
        got_top = set(got[got["q"] == qi]["vec_id"].astype(int))
        hits += len(true_top & got_top)
        total += 10
    assert hits / total >= 0.9, f"IVF recall {hits}/{total} < 0.9"
    for qi, vid, s in zip(got["q"], got["vec_id"], got["sim"]):
        true = sims[idx[int(vid)], int(qi)]
        assert abs(float(s) - true) < 1e-4, f"sim mismatch ({qi},{vid})"


def check_ann_topk_lsh(got: pd.DataFrame, sf_dir: str) -> None:
    """Ground truth: exact cosine top-10 per query from numpy; the LSH
    result (n_planes=6, query-directed probes=36) must have recall ≥ 0.8
    on these worst-case uniform embeddings and every reported sim must
    equal the true cosine of its (q, vec_id) pair."""
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    ids = emb["vec_id"].to_numpy()
    idx = {int(v): i for i, v in enumerate(ids)}
    q = mat[[idx[0], idx[1], idx[2]]]
    sims = mat @ q.T
    hits = total = 0
    for qi in range(3):
        order = np.argsort(-sims[:, qi], kind="stable")[:10]
        true_top = {int(ids[i]) for i in order}
        got_top = set(got[got["q"] == qi]["vec_id"].astype(int))
        hits += len(true_top & got_top)
        total += 10
    assert hits / total >= 0.8, f"LSH recall {hits}/{total} < 0.8"
    for qi, vid, s in zip(got["q"], got["vec_id"], got["sim"]):
        true = sims[idx[int(vid)], int(qi)]
        assert abs(float(s) - true) < 1e-4, f"sim mismatch ({qi},{vid})"


def check_crawl_budget_order(got: pd.DataFrame, sf_dir: str) -> None:
    """Sequential epoch-BSP replay of the budget-mode contract
    (``simulate_crawl_budget``: rank/budget/carryover, redirect
    seenchecks, strict within-epoch dedupe, host registry order) — the
    distributed crawl's (url, hop) seed set must match it exactly."""
    from zeno_ray.config import CrawlConfig
    from zeno_ray.corpus import CorpusSpec, sf_of_dir
    from zeno_ray.simulator import simulate_crawl_budget

    spec = CorpusSpec.for_sf(sf_of_dir(sf_dir))
    cfg = CrawlConfig(max_hops=3, max_epochs=10, host_budget=8,
                      seen_shards=8, fetch_concurrency=4)
    sim = simulate_crawl_budget(spec, cfg)
    got_map = dict(zip(got["url"], got["hop"].astype(int)))
    want = {u: int(h) for u, h in sim.crawled_pages.items()}
    assert got_map == want, (
        f"budget crawl (url, hop) set != sequential epoch replay: "
        f"{len(got_map)} vs {len(want)} rows; "
        f"only-got={list(set(got_map) - set(want))[:3]} "
        f"only-sim={list(set(want) - set(got_map))[:3]}")


def check_host_pagerank(got: pd.DataFrame, sf_dir: str) -> None:
    """Sequential numpy power iteration over the corpus's ground-truth
    edge table (the query's extractor side is separately oracle-checked
    via extract_edges) — node set must match exactly, ranks to 1e-9."""
    import glob

    import numpy as np

    from zeno_ray.corpus import corpus_dir_for_sf, sf_of_dir
    from zeno_ray.ops.graph import pagerank_sequential

    cdir = corpus_dir_for_sf(sf_of_dir(sf_dir), "/tmp/rayzeno_corpus")
    e = pd.concat([pd.read_parquet(f, columns=["src", "dst", "kind"])
                   for f in sorted(glob.glob(f"{cdir}/edges/*.parquet"))])
    e = e[e["kind"] == "outlink"]
    hs = e["src"].str.extract(r"^https://([^/]+)", expand=False)
    hd = e["dst"].str.extract(r"^https://([^/]+)", expand=False)
    hp = pd.DataFrame({"s": hs, "d": hd}).dropna()
    hp = hp[hp["s"] != hp["d"]].drop_duplicates()
    want = pagerank_sequential(list(zip(hp["s"], hp["d"])), n_iter=5)
    gm = dict(zip(got["host"], got["rank"]))
    assert set(gm) == set(want), (
        f"host set mismatch: {len(gm)} vs {len(want)}; "
        f"only-got={list(set(gm) - set(want))[:3]} "
        f"only-want={list(set(want) - set(gm))[:3]}")
    keys = sorted(want)
    g = np.array([gm[k] for k in keys])
    w = np.array([want[k] for k in keys])
    # the raw ranks agree to ~1e-15; `got` arrives through normalize(),
    # which rounds floats to 6 decimals for hashing → tolerance 5e-7
    assert np.allclose(g, w, rtol=0.0, atol=5.01e-7), (
        f"rank mismatch, max abs err {np.abs(g - w).max()}")


def check_host_components(got: pd.DataFrame, sf_dir: str) -> None:
    """Sequential union-find over the corpus's ground-truth edge table;
    component representatives are lexicographic minima, so the match is
    EXACT (string equality, no tolerance)."""
    import glob

    from zeno_ray.corpus import corpus_dir_for_sf, sf_of_dir
    from zeno_ray.ops.graph import components_sequential

    cdir = corpus_dir_for_sf(sf_of_dir(sf_dir), "/tmp/rayzeno_corpus")
    e = pd.concat([pd.read_parquet(f, columns=["src", "dst", "kind"])
                   for f in sorted(glob.glob(f"{cdir}/edges/*.parquet"))])
    e = e[e["kind"] == "outlink"]
    hs = e["src"].str.extract(r"^https://([^/]+)", expand=False)
    hd = e["dst"].str.extract(r"^https://([^/]+)", expand=False)
    hp = pd.DataFrame({"s": hs, "d": hd}).dropna()
    hp = hp[hp["s"] != hp["d"]].drop_duplicates()
    want = components_sequential(list(zip(hp["s"], hp["d"])))
    gm = dict(zip(got["host"], got["component"]))
    assert gm == want, (
        f"component mismatch: {len(gm)} vs {len(want)} hosts; sample diff "
        f"{[(k, gm.get(k), want.get(k)) for k in list(want)[:3]]}")


def check_events_distinct_users(got: pd.DataFrame, sf_dir: str) -> None:
    """(1) sequential re-execution must reproduce the HLL estimates
    EXACTLY (register merge is order-independent, hash is fixed-key);
    (2) semantic bound: each estimate within 5% of the true distinct
    count (theory: ~1.6% at p=12)."""
    import os

    import numpy as np

    from zeno_ray.ops.sketch import hll_distinct_sequential

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    groups = {g: gg["user_id"].to_numpy()
              for g, gg in ev.groupby("event_type")}
    want = hll_distinct_sequential(groups, p=12)
    gm = dict(zip(got["event_type"], got["distinct_est"]))
    assert set(gm) == set(want)
    for g in want:
        # normalize() rounds floats to 6dp before we see got
        assert abs(gm[g] - want[g]) <= 5e-7 * max(1.0, abs(want[g])) + 1e-6, (
            g, gm[g], want[g])
        true = len(np.unique(groups[g]))
        assert abs(gm[g] - true) / true < 0.05, (g, gm[g], true)


def check_embedding_kmeans(got: pd.DataFrame, sf_dir: str) -> None:
    """Sequential re-execution (same seed, same file-order sample) must
    reproduce every cluster assignment exactly; semantic check: each
    assignment is the argmax-cosine centroid."""
    import os

    import numpy as np

    from zeno_ray.ops.ann import _normalize, kmeans_fit

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = kmeans_fit(np.stack(emb["embedding"].to_numpy()[:2048]),
                       16, seed=13)
    mat = _normalize(np.stack(emb["embedding"].to_numpy()).astype(np.float64))
    want = (mat @ cents.T).argmax(axis=1)
    got = got.sort_values("vec_id").reset_index(drop=True)
    assert (got["vec_id"].to_numpy() == emb["vec_id"].to_numpy()).all()
    assert (got["cluster"].to_numpy() == want).all(), \
        "distributed kmeans assignment != sequential re-execution"


def check_ann_topk_approx(got: pd.DataFrame, sf_dir: str) -> None:
    """The merged approximate-ANN query: delegate each method's rows to
    its per-method recall/sim check."""
    check_ann_topk_ivf(got[got["method"] == "ivf"].drop(columns="method"),
                       sf_dir)
    check_ann_topk_lsh(got[got["method"] == "lsh"].drop(columns="method"),
                       sf_dir)


def check_mm_features(got: pd.DataFrame, sf_dir: str) -> None:
    """The merged multimodal query: delegate each modality's rows to its
    per-stage sequential re-execution check (padding columns from the
    superset schema are ignored by each check's column list)."""
    check_mm_decode(got[got["modality"] == "image"], sf_dir)
    check_mm_audio(got[got["modality"] == "audio"], sf_dir)
    check_mm_frames(got[got["modality"] == "video"], sf_dir)


PY_ORACLES = {
    "ann_topk_approx": check_ann_topk_approx,
    "embedding_kmeans": check_embedding_kmeans,
    "events_distinct_users": check_events_distinct_users,
    "host_pagerank": check_host_pagerank,
    "host_components": check_host_components,
    "crawl_budget_order": check_crawl_budget_order,
    "doc_langid": check_doc_langid,
    "doc_fingerprint": check_doc_fingerprint,
    "dedup_minhash": check_dedup_minhash,
    "dedup_ngram": check_dedup_ngram,
    "dedup_simhash": check_dedup_simhash,
    "embedding_near_dup": check_embedding_near_dup,
    "mm_features": check_mm_features,
    "enrich_pages": check_enrich_pages,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        import zeno_ray

        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", runtime_env=zeno_ray.runtime_env())
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if only and not (only & set(qs)):
        print(f"no such query: {sorted(only)} (known: {sorted(qs)})")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"query raised {type(e).__name__}: {e}"))
            print(f"ERROR  {name}: query raised {e}")
            continue
        if name not in oracles:
            if name in PY_ORACLES:
                try:
                    PY_ORACLES[name](got, sf_dir)
                    print(f"OK-py  {name}: {len(got)} rows "
                          "(python oracle: sequential/semantic check)")
                except AssertionError as e:
                    failures.append((name, f"python oracle: {e}"))
                    print(f"FAIL   {name}: python oracle: {e}")
            else:
                print(f"rows   {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"oracle raised {type(e).__name__}: {e}"))
            print(f"ERROR  {name}: oracle raised {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"FAIL   {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"FAIL   {name}: rows {len(got)} vs {len(want)}")
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            ndiff = int(diff.to_numpy().sum())
            failures.append((name, f"{ndiff} differing cells"))
            print(f"FAIL   {name}: {ndiff} differing cells of {got.size}")
            bad = diff.any(axis=1)
            print(pd.concat([got[bad].head(3).add_suffix("_got"),
                             want[bad].head(3).add_suffix("_want")], axis=1))
        else:
            print(f"OK     {name}: {len(got)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
