"""Training-data ops: dedup (exact/minhash/simhash/ngram/embedding), ANN
(brute vs LSH recall), text analysis, multimodal plumbing stubs."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

import ray.data as rd

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def docs_ds():
    rows = []
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about ray data pipelines",
        "numbers and punctuation, tokens; quality!! metrics? here.",
    ]
    for i in range(60):
        text = base[i % 3] + f" variant {i // 3}"
        rows.append({"doc_id": i, "text": text})
    # exact duplicates: 100/101 duplicate doc 0 and 1
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[1]["text"]})
    # near-duplicate of doc 0 (one word changed)
    rows.append({"doc_id": 102, "text": rows[0]["text"].replace("again and again", "again and again!")})
    return rd.from_items(rows)


def test_exact_dedup_keeps_lowest_id(docs_ds):
    from zeno_ray.ops.dedup import exact_dedup

    kept = set(exact_dedup(docs_ds).to_pandas()["doc_id"])
    assert 0 in kept and 1 in kept
    assert 100 not in kept and 101 not in kept
    assert 102 in kept  # near-dup is NOT an exact dup

    # prehashed=True over an already-hashed slim projection must pick
    # the identical winner set (webtext_refine's fused gate+hash path)
    from zeno_ray.ops.dedup import add_text_hash

    slim = docs_ds.map_batches(
        lambda df: add_text_hash(df)[["doc_id", "text_hash"]],
        batch_format="pandas")
    kept_pre = set(exact_dedup(slim, prehashed=True).to_pandas()["doc_id"])
    assert kept_pre == kept


def test_minhash_clusters_exact_and_near_dups(docs_ds):
    from zeno_ray.ops.dedup import minhash_dedup

    out = minhash_dedup(docs_ds, jaccard_threshold=0.7).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster"]))
    assert cl[100] == cl[0]  # exact dup clustered
    assert cl[102] == cl[0]  # near dup clustered
    assert cl[1] != cl[0]


def test_minhash_planted_precision_recall():
    """Planted near-dups: 30 bases each with a 1-word-edited twin, plus 15
    unrelated docs. Distributed verify must cluster ≥90% of planted pairs
    (recall) and never merge docs from different bases (precision)."""
    from zeno_ray.ops.dedup import minhash_dedup

    rng = np.random.RandomState(42)
    vocab = [f"word{i}" for i in range(500)]
    rows, base_of = [], {}
    did = 0
    for b in range(30):
        words = [vocab[i] for i in rng.randint(0, 500, 40)]
        twin = list(words)
        twin[rng.randint(0, 40)] = "EDITED"
        for text in (" ".join(words), " ".join(twin)):
            rows.append({"doc_id": did, "text": text})
            base_of[did] = b
            did += 1
    for b in range(30, 45):
        words = [vocab[i] for i in rng.randint(0, 500, 40)]
        rows.append({"doc_id": did, "text": " ".join(words)})
        base_of[did] = b
        did += 1
    out = minhash_dedup(rd.from_items(rows), jaccard_threshold=0.7).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster"]))
    recalled = sum(cl[2 * b] == cl[2 * b + 1] for b in range(30))
    assert recalled >= 27  # recall ≥ 0.9
    # precision: a cluster never spans two bases
    by_cluster = {}
    for d, c in cl.items():
        by_cluster.setdefault(c, set()).add(base_of[d])
    assert all(len(bases) == 1 for bases in by_cluster.values())


def test_minhash_shuffle_fallback_matches_broadcast(docs_ds, monkeypatch):
    """Forcing the past-broadcast-bound repartition-join verify path must
    produce byte-identical clusters to the broadcast verify path."""
    import zeno_ray.ops.dedup as dd

    want = dd.minhash_dedup(docs_ds, jaccard_threshold=0.7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(dd, "MINHASH_BROADCAST_SIG_BYTES", 0)
    got = dd.minhash_dedup(docs_ds, jaccard_threshold=0.7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_minhash_deterministic(docs_ds):
    from zeno_ray.ops.dedup import minhash_dedup

    a = minhash_dedup(docs_ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = minhash_dedup(docs_ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_simhash_buckets_exact_dups(docs_ds):
    from zeno_ray.ops.dedup import simhash_groups

    out = simhash_groups(docs_ds).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster"]))
    assert cl[100] == cl[0]


def test_simhash_clusters_within_hamming_radius():
    """Near-dups whose simhashes differ by 1-3 bits must cluster (the
    banded hamming≤3 radius); unrelated docs must not."""
    from zeno_ray.ops.dedup import SimHashStage, _popcount64, simhash_groups

    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    did = 0
    planted = []
    for b in range(20):
        words = [vocab[i] for i in rng.randint(0, 400, 150)]
        twin = list(words)
        twin[0] = "ALTERED"  # small edit → few simhash bits flip
        rows.append({"doc_id": did, "text": " ".join(words)})
        rows.append({"doc_id": did + 1, "text": " ".join(twin)})
        planted.append((did, did + 1))
        did += 2
    out = simhash_groups(rd.from_items(rows)).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster"]))
    sh = dict(zip(out["doc_id"], out["simhash"]))
    hits = expected = 0
    for a, b in planted:
        d = int(_popcount64(np.array([np.uint64(sh[a]) ^ np.uint64(sh[b])]))[0])
        if 1 <= d <= 3:  # within the operator's declared radius
            expected += 1
            hits += cl[a] == cl[b]
    assert expected >= 5  # the fixture actually exercises 1-3-bit dups
    assert hits == expected  # every in-radius pair is clustered
    # docs from different bases never merge
    base = {d: d // 2 for d in cl}
    by_cluster = {}
    for d, c in cl.items():
        by_cluster.setdefault(c, set()).add(base[d])
    for c, bases in by_cluster.items():
        if len(bases) > 1:
            # only legal if those cross-base simhashes are within radius
            ids = [d for d in cl if cl[d] == c]
            assert any(
                int(_popcount64(np.array([np.uint64(sh[x]) ^ np.uint64(sh[y])]))[0]) <= 3
                for x in ids for y in ids if x < y and base[x] != base[y])


def test_ngram_jaccard():
    from zeno_ray.ops.dedup import ngram_jaccard

    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "uvwxyz") == 0.0
    assert 0.0 < ngram_jaccard("abcdefgh", "abcdefxx") < 1.0


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.RandomState(3)
    mat = rng.normal(size=(200, 16)).astype(np.float32)
    mat[50] = mat[10] * 1.001  # near-duplicate pair
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    return rd.from_items(rows), mat


def test_brute_force_topk_exact(emb_ds):
    from zeno_ray.ops.ann import brute_force_topk

    ds, mat = emb_ds
    q = mat[:2].astype(np.float64)
    out = brute_force_topk(ds, q, k=5)
    # query 0's best match is itself
    assert out[out["q"] == 0].iloc[0]["vec_id"] == 0
    assert len(out) == 10
    # verify against numpy
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = n @ (q[0] / np.linalg.norm(q[0]))
    want = set(np.argsort(-sims)[:5].tolist())
    assert set(out[out["q"] == 0]["vec_id"]) == want


def test_lsh_topk_recall(emb_ds):
    from zeno_ray.ops.ann import brute_force_topk, lsh_topk

    ds, mat = emb_ds
    q = mat[:3].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    approx = lsh_topk(ds, q, k=5, n_planes=6, max_hamming=1)
    # recall@5 across the 3 queries should be decent (bucketed subset)
    hits = 0
    for qi in range(3):
        e = set(exact[exact["q"] == qi]["vec_id"])
        a = set(approx[approx["q"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits >= 8  # ≥ ~53% recall on this tiny fixture
    # more probes ⇒ high recall: hamming≤2 on 3 planes probes 7/8 buckets
    wide = lsh_topk(ds, q, k=5, n_planes=3, max_hamming=2)
    hits = sum(
        len(set(exact[exact["q"] == qi]["vec_id"])
            & set(wide[wide["q"] == qi]["vec_id"]))
        for qi in range(3)
    )
    assert hits >= 14  # recall@5 ≥ 0.93 vs brute force


def test_lsh_topk_directed_clustered(ray_session):
    """Query-directed multi-probe on CLUSTERED embeddings (the regime LSH
    is for): recall ≥ 0.9 while scanning ≤ 12% of the rows — the scale
    story the uniform driver corpus can't show (tuning measured offline:
    planes=10 probes=24 → recall 0.94 at 10.5% rows on this fixture)."""
    import ray.data as rd

    from zeno_ray.ops.ann import brute_force_topk, lsh_topk

    rng = np.random.RandomState(5)
    cents = rng.normal(size=(20, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    lab = rng.randint(0, 20, size=4000)
    mat = cents[lab] + 0.04 * rng.normal(size=(4000, 64))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(4000)])
    q = mat[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, k=10)
    approx, stats = lsh_topk(ds, q, k=10, n_planes=10, probes=24,
                             return_stats=True)
    hits = sum(
        len(set(exact[exact["q"] == qi]["vec_id"])
            & set(approx[approx["q"] == qi]["vec_id"]))
        for qi in range(5)
    )
    assert hits / 50 >= 0.9, f"clustered recall {hits}/50 < 0.9"
    assert stats["probed_fraction"] <= 0.12, \
        f"probed {stats['probed_fraction']:.3f} of rows > 0.12"


def test_lsh_topk_directed_uniform_stats(emb_ds):
    """Directed probing on the uniform fixture: stats report the probed
    fraction honestly and the result stays a true-cosine subset."""
    from zeno_ray.ops.ann import brute_force_topk, lsh_topk

    ds, mat = emb_ds
    q = mat[:3].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    approx, stats = lsh_topk(ds, q, k=5, n_planes=6, probes=36,
                             return_stats=True)
    assert 0.0 < stats["probed_fraction"] <= 1.0
    hits = sum(
        len(set(exact[exact["q"] == qi]["vec_id"])
            & set(approx[approx["q"] == qi]["vec_id"]))
        for qi in range(3)
    )
    assert hits >= 10  # ≥ ~0.66 recall on the worst-case uniform fixture


def test_ivf_topk_recall(emb_ds):
    from zeno_ray.ops.ann import brute_force_topk, ivf_topk

    ds, mat = emb_ds
    q = mat[:3].astype(np.float64)
    exact = brute_force_topk(ds, q, k=5)
    # modest probing already recalls well; full probing is exact
    approx = ivf_topk(ds, q, k=5, n_lists=8, nprobe=4)
    hits = sum(
        len(set(exact[exact["q"] == qi]["vec_id"])
            & set(approx[approx["q"] == qi]["vec_id"]))
        for qi in range(3)
    )
    assert hits >= 12  # recall@5 ≥ 0.8 at nprobe=half the lists
    full = ivf_topk(ds, q, k=5, n_lists=8, nprobe=8)
    hits = sum(
        len(set(exact[exact["q"] == qi]["vec_id"])
            & set(full[full["q"] == qi]["vec_id"]))
        for qi in range(3)
    )
    assert hits == 15  # nprobe = n_lists ⇒ exact (up to ties)


def test_embedding_nn_lsh_matches_brute_force(emb_ds):
    """The LSH nearest-neighbor join (the query path) agrees with the
    broadcast brute-force verifier on ≥90% of vectors."""
    from zeno_ray.ops.dedup import embedding_near_dup, embedding_nn_lsh

    ds, _ = emb_ds
    brute = embedding_near_dup(ds, threshold=0.0).to_pandas()
    lsh = embedding_nn_lsh(ds, threshold=0.0, n_planes=4,
                           max_hamming=2).to_pandas()
    assert len(lsh) >= 0.95 * len(brute)  # nearly every vector reports
    b = brute.set_index("vec_id")["dup_of"]
    l = lsh.set_index("vec_id")["dup_of"]
    common = b.index.intersection(l.index)
    agree = (b[common] == l[common]).mean()
    assert agree >= 0.9
    # the planted near-identical pair is always found
    pairs = set(zip(lsh["vec_id"], lsh["dup_of"]))
    assert (10, 50) in pairs and (50, 10) in pairs


def test_embedding_near_dup_finds_planted_pair(emb_ds):
    from zeno_ray.ops.dedup import embedding_near_dup

    ds, _ = emb_ds
    out = embedding_near_dup(ds, threshold=0.999).to_pandas()
    pairs = set(zip(out["vec_id"], out["dup_of"]))
    assert (10, 50) in pairs and (50, 10) in pairs


def test_embedding_near_dup_adaptive_routes_through_lsh(emb_ds):
    """Forcing the broadcast bound low must route embedding_near_dup
    through the LSH scale path (VERDICT r4 item 3) and still satisfy the
    same oracle bounds: every reported sim is the true cosine of its
    pair, high true-NN agreement, planted pair found."""
    from zeno_ray.ops.dedup import embedding_near_dup

    ds, mat = emb_ds
    # 200 rows > 10 ⇒ LSH path (use the query's pinned geometry: the
    # count-adaptive default would pick more planes than 200 tiny
    # vectors need)
    out = embedding_near_dup(ds, threshold=0.0,
                             max_broadcast_rows=10).to_pandas()
    assert len(out) >= 0.95 * 200  # nearly every vector reports
    n = mat.astype(np.float64)
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    sims = n @ n.T
    np.fill_diagonal(sims, -np.inf)
    for v, d, s in zip(out["vec_id"], out["dup_of"], out["sim"]):
        assert abs(float(s) - sims[int(v), int(d)]) < 1e-4
    true_nn = sims.argmax(1)
    agree = np.mean([true_nn[int(v)] == int(d)
                     for v, d in zip(out["vec_id"], out["dup_of"])])
    assert agree >= 0.85
    pairs = set(zip(out["vec_id"], out["dup_of"]))
    assert (10, 50) in pairs and (50, 10) in pairs


def test_quality_features_match_sql_semantics(docs_ds):
    from zeno_ray.ops.text import quality_features

    out = docs_ds.map_batches(quality_features, batch_format="pandas").to_pandas()
    row = out[out["doc_id"] == 0].iloc[0]
    text = "the quick brown fox jumps over the lazy dog again and again variant 0"
    assert row["n_chars"] == len(text)
    assert row["n_tokens"] == text.count(" ") + 1
    assert 0.0 <= row["quality"] <= 1.0


def test_langid_stage():
    from zeno_ray.ops.text import LangIdStage

    stage = LangIdStage()
    df = pd.DataFrame({"text": [
        "the cat is on the mat and it is happy that the sun is out",
        "le chat est dans la maison et il est content que le soleil",
        "der Hund ist nicht mit der Katze und das ist ein Problem",
        "これは日本語のテキストですこれは日本語のテキストです",
    ]})
    out = stage(df)
    assert list(out["pred_lang"]) == ["en", "fr", "de", "ja"]


def test_token_count_stage(docs_ds):
    from zeno_ray.ops.text import TokenCountStage

    out = docs_ds.map_batches(TokenCountStage, batch_format="pandas",
                              concurrency=2).to_pandas()
    assert (out["n_tokens_ws"] > 0).all()
    assert (out["n_tokens_bpe_est"] >= out["n_tokens_ws"]).all()


def test_fingerprint_deterministic(docs_ds):
    from zeno_ray.ops.text import fingerprint

    a = docs_ds.map_batches(fingerprint, batch_format="pandas").to_pandas()
    b = docs_ds.map_batches(fingerprint, batch_format="pandas").to_pandas()
    assert dict(zip(a["doc_id"], a["fingerprint"])) == dict(
        zip(b["doc_id"], b["fingerprint"]))
    # exact dups share a fingerprint
    fp = dict(zip(a["doc_id"], a["fingerprint"]))
    assert fp[0] == fp[100]


def test_real_image_decode_known_pixels():
    """PPM and BMP decoders recover exact dimensions and true pixel
    statistics from hand-built images."""
    import struct

    from zeno_ray.ops.multimodal import (
        DecodeImageStage, decode_bmp, decode_ppm, resize_nearest)

    # 2x2 PPM: white, black, red, blue
    pix = np.array([[[255, 255, 255], [0, 0, 0]],
                    [[255, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    ppm = b"P6\n2 2\n255\n" + pix.tobytes()
    w, h, got, consumed = decode_ppm(ppm)
    assert (w, h) == (2, 2) and consumed == len(ppm)
    assert (got == pix).all()
    stage = DecodeImageStage(fake=False, target=(4, 4))
    wd, ht, luma, rluma = stage.decode(ppm)
    want_luma = (1.0 + 0.0 + 0.299 + 0.114) / 4
    assert abs(luma - want_luma) < 1e-4
    r = resize_nearest(pix, (4, 4))
    assert r.shape == (4, 4, 3) and (r[0, 0] == [255, 255, 255]).all()

    # BMP round-trip through the generator
    from zeno_ray.ops.multimodal import make_bmp

    bmp = make_bmp("seed text")
    w, h, pixels, _ = decode_bmp(bmp)
    assert pixels.shape == (h, w, 3)
    wd, ht, luma, _ = stage.decode(bmp)
    assert (wd, ht) == (w, h) and 0.0 <= luma <= 1.0


def test_real_audio_decode_wav():
    from zeno_ray.ops.multimodal import DecodeAudioStage, make_wav

    wav = make_wav("some text")
    sr, n, dur, rms = DecodeAudioStage().decode(wav)
    assert sr == 8000 and n > 0
    assert abs(dur - n / sr) < 1e-6
    # 0.5-amplitude sine + small noise → rms near 0.5/sqrt(2)
    assert 0.25 < rms < 0.45


def test_real_video_frame_sampling():
    from zeno_ray.ops.multimodal import FrameSampleStage, make_ppm_video

    video = make_ppm_video("vid", n_frames=12)
    out = FrameSampleStage(every_n=4)(pd.DataFrame(
        {"media_id": [7], "payload": [video]}))
    assert list(out["frame"]) == [0, 4, 8]
    assert (out["media_id"] == 7).all()
    assert ((out["mean_luma"] > 0) & (out["mean_luma"] < 1)).all()


def test_docs_to_media_real_kinds(docs_ds):
    from zeno_ray.ops.multimodal import (
        DecodeAudioStage, DecodeImageStage, docs_to_media)

    media = docs_ds.map_batches(docs_to_media, batch_format="pandas",
                                batch_size=32).to_pandas()
    assert set(media["kind"]) == {"image", "audio", "video"}
    imgs = media[media["kind"] == "image"]
    dec = DecodeImageStage(fake=False)(imgs)
    assert (dec["width"] >= 8).all() and (dec["height"] >= 8).all()
    aud = media[media["kind"] == "audio"]
    adec = DecodeAudioStage()(aud)
    assert (adec["sample_rate"] == 8000).all()


def test_multimodal_stub_raises_without_fake(docs_ds):
    from zeno_ray.ops.multimodal import DecodeImageStage, docs_to_fake_media

    media = docs_ds.map_batches(docs_to_fake_media, batch_format="pandas")
    stage = DecodeImageStage(fake=False)
    with pytest.raises(NotImplementedError):
        stage(media.to_pandas())


def test_multimodal_fake_decode_plumbing(docs_ds):
    from zeno_ray.ops.multimodal import DecodeImageStage, FrameSampleStage, docs_to_fake_media

    media = docs_ds.map_batches(docs_to_fake_media, batch_format="pandas")
    decoded = media.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"fake": True},
        batch_format="pandas", batch_size=16, concurrency=2,
    ).to_pandas()
    assert {"media_id", "width", "height", "mean_luma"} <= set(decoded.columns)
    assert len(decoded) == 63
    frames = media.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"fake": True, "every_n": 4},
        batch_format="pandas", batch_size=16, concurrency=2,
    ).to_pandas()
    assert (frames["frame"] % 4 == 0).all()


def test_relational_ops_smoke():
    from zeno_ray.ops.relational import (
        events_hourly_window,
        lineitem_agg,
        orders_by_segment,
        sessionize_events,
        sessionize_events_distributed,
        top_users_by_value,
    )

    sf = "/root/testdata/sf0.001"
    assert len(lineitem_agg(sf)) >= 4
    assert len(orders_by_segment(sf)) == 5
    assert len(top_users_by_value(sf, 5)) == 5
    assert len(events_hourly_window(sf)) > 10
    a = sessionize_events(sf)
    b = sessionize_events_distributed(sf)
    pd.testing.assert_frame_equal(a, b)


def test_embedding_near_dup_lsh_finds_planted_pair(emb_ds):
    from zeno_ray.ops.dedup import embedding_near_dup_lsh

    ds, _ = emb_ds
    out = embedding_near_dup_lsh(ds, threshold=0.999, n_planes=6).to_pandas()
    pairs = set(zip(out["vec_id"].astype(int), out["dup_of"].astype(int)))
    # the planted near-identical pair shares every hyperplane side, so it
    # must land in one bucket and be reported both ways
    assert (10, 50) in pairs and (50, 10) in pairs


def test_ngram_jaccard_dedup_matches_bruteforce(docs_ds):
    """The prefix-filtered distributed pipeline computes EXACT n-gram
    Jaccard — its clusters must equal an all-pairs brute-force union-find
    on the nose (candidate generation is complete, not probabilistic)."""
    from zeno_ray.ops.dedup import (_edges_to_roots, _shingles,
                                    ngram_jaccard_dedup)

    out = ngram_jaccard_dedup(docs_ds, k=5, threshold=0.8).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))

    docs = docs_ds.to_pandas()
    ids = docs["doc_id"].to_numpy()
    sets = [np.unique(_shingles(t, 5)) for t in docs["text"]]
    ea, eb = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(np.intersect1d(sets[i], sets[j],
                                       assume_unique=True))
            union = len(sets[i]) + len(sets[j]) - inter
            if inter / max(1, union) >= 0.8:
                a, b = sorted((int(ids[i]), int(ids[j])))
                ea.append(a)
                eb.append(b)
    import pandas as pd
    roots = _edges_to_roots(pd.DataFrame({"a": ea, "b": eb}))
    want = {int(d): roots.get(int(d), int(d)) for d in ids}
    assert got == want
    # sanity on the fixture: exact dups and the near-dup did cluster
    assert got[100] == got[0]
    assert got[102] == got[0]


@pytest.mark.parametrize("seed,threshold", [(1, 0.8), (2, 0.7), (3, 0.9)])
def test_ngram_jaccard_dedup_randomized(seed, threshold):
    """Randomized template-heavy corpora (the adversarial regime for the
    prefix filter + min-gram-responsibility emission): clusters must equal
    brute-force all-pairs union-find at several thresholds."""
    import random

    from zeno_ray.ops.dedup import (_edges_to_roots, _shingles,
                                    ngram_jaccard_dedup)

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(30)]
    templates = [" ".join(rng.choices(words, k=rng.randint(8, 40)))
                 for _ in range(6)]
    rows = []
    for i in range(200):
        t = rng.choice(templates)
        if rng.random() < 0.5:  # mutate: swap or append a word
            parts = t.split()
            j = rng.randrange(len(parts))
            parts[j] = rng.choice(words)
            t = " ".join(parts)
        if rng.random() < 0.2:
            t += " " + rng.choice(words)
        rows.append({"doc_id": i, "text": t})
    ds = rd.from_items(rows)

    out = ngram_jaccard_dedup(ds, k=5, threshold=threshold).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))

    sets = [np.unique(_shingles(r["text"], 5)) for r in rows]
    ea, eb = [], []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            inter = len(np.intersect1d(sets[i], sets[j],
                                       assume_unique=True))
            union = len(sets[i]) + len(sets[j]) - inter
            if inter / max(1, union) >= threshold:
                ea.append(i)
                eb.append(j)
    roots = _edges_to_roots(pd.DataFrame({"a": ea, "b": eb}))
    want = {i: roots.get(i, i) for i in range(len(rows))}
    assert got == want


def test_dedup_ops_degenerate_inputs():
    """No-edge corpora (single doc, all-identical, below-k texts) must
    label cleanly — the empty verified-edge frame has no columns."""
    from zeno_ray.ops.dedup import (minhash_dedup, ngram_jaccard_dedup,
                                    simhash_groups)

    one = rd.from_items([{"doc_id": 1, "text": "hello world tiny doc"}])
    assert ngram_jaccard_dedup(one).to_pandas().to_dict("records") == \
        [{"doc_id": 1, "cluster": 1}]
    assert minhash_dedup(one).to_pandas().to_dict("records") == \
        [{"doc_id": 1, "cluster": 1}]
    sh = rd.from_items([{"doc_id": 1, "text": "ab"},
                        {"doc_id": 2, "text": "ab"}])
    assert sorted(ngram_jaccard_dedup(sh).to_pandas()["cluster"]) == [1, 1]
    out = simhash_groups(one).to_pandas()
    assert out["cluster"].tolist() == [1]


def test_ngram_jaccard_dedup_diverse_corpus_legacy_mode():
    """Long diverse docs (big gram sets → mean prefix length over the
    responsibility cutoff) exercise the legacy emit-per-shared-gram +
    global-dedupe branch; clusters must still equal brute force."""
    import random

    from zeno_ray.ops.dedup import (_edges_to_roots, _shingles,
                                    ngram_jaccard_dedup)

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": "".join(
            rng.choices(alphabet, k=900))})
    # near-dups: copy with a small edit; exact dup
    rows.append({"doc_id": 100, "text": rows[0]["text"][:-5] + "zzzzz"})
    rows.append({"doc_id": 101, "text": rows[1]["text"]})
    ds = rd.from_items(rows)

    out = ngram_jaccard_dedup(ds, k=5, threshold=0.8).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))

    sets = {r["doc_id"]: np.unique(_shingles(r["text"], 5)) for r in rows}
    ids = sorted(sets)
    ea, eb = [], []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(np.intersect1d(sets[a], sets[b],
                                       assume_unique=True))
            union = len(sets[a]) + len(sets[b]) - inter
            if inter / max(1, union) >= 0.8:
                ea.append(a)
                eb.append(b)
    roots = _edges_to_roots(pd.DataFrame({"a": ea, "b": eb}))
    want = {d: roots.get(d, d) for d in ids}
    assert got == want
    assert got[101] == got[1]  # the exact dup clustered


# ------------------------------------------------- repetition signals


def test_repetition_features_closed_form():
    from zeno_ray.ops.text import repetition_features

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b a", "x", "", "q q q q"],
    })
    out = repetition_features(docs)
    # "x" and "" have < 2 words (string-split semantics) -> dropped
    assert out["doc_id"].tolist() == [0, 3]
    r0 = out.iloc[0]
    assert r0["n_words"] == 5
    assert r0["distinct_word_frac"] == 0.4      # {a, b} of 5
    assert r0["top_word_frac"] == 0.6           # "a" x3
    assert r0["top_bigram_frac"] == 0.5         # "a b" 2 of 4
    r3 = out.iloc[1]
    assert r3["distinct_word_frac"] == 0.25
    assert r3["top_word_frac"] == 1.0
    assert r3["top_bigram_frac"] == 1.0


def test_repetition_features_distributed_matches_counter(ray_session):
    from collections import Counter

    from zeno_ray.ops.text import repetition_features

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(20)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=rng.randint(2, 40)))}
            for i in range(200)]
    got = (rd.from_items(rows)
           .map_batches(repetition_features, batch_format="pandas",
                        batch_size=32)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 200
    for row in rows[::17]:
        words = row["text"].split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        wc, bc = Counter(words), Counter(bigrams)
        g = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert g["n_words"] == len(words)
        assert g["distinct_word_frac"] == np.floor(
            len(wc) / len(words) * 1e6 + 0.5) / 1e6
        assert g["top_word_frac"] == np.floor(
            max(wc.values()) / len(words) * 1e6 + 0.5) / 1e6
        assert g["top_bigram_frac"] == np.floor(
            max(bc.values()) / len(bigrams) * 1e6 + 0.5) / 1e6


# ------------------------------------------------- decontamination


def test_ngram_decontaminate_matches_bruteforce(ray_session):
    from zeno_ray.ops.dedup import ngram_decontaminate

    rng = np.random.RandomState(3)
    vocab = [f"t{i}" for i in range(30)]
    docs = [{"doc_id": i, "text": " ".join(rng.choice(vocab, 30))}
            for i in range(120)]
    # plant contamination: full copy of benchmark doc 29, prefix of 58
    docs[5]["text"] = docs[29]["text"]
    docs[7]["text"] = " ".join(docs[58]["text"].split(" ")[:10])

    got = ngram_decontaminate(rd.from_items(docs), n=5, bench_mod=29)

    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}

    bench = set().union(*(grams(d["text"]) for d in docs
                          if d["doc_id"] % 29 == 0))
    want = {}
    for d in docs:
        if d["doc_id"] % 29 == 0:
            continue
        shared = grams(d["text"]) & bench
        if shared:
            want[d["doc_id"]] = len(shared)
    assert dict(zip(got["doc_id"], got["n_shared"])) == want
    assert 5 in want and 7 in want  # the planted overlaps were found


def test_ngram_decontaminate_no_bench_docs(ray_session):
    """A corpus with NO benchmark docs (no doc_id % bench_mod == 0) must
    yield an empty typed result, not crash — a zero-row Dataset's
    to_pandas() drops the gram column entirely."""
    from zeno_ray.ops.dedup import ngram_decontaminate

    docs = [{"doc_id": i, "text": "a b c d e f g h"} for i in (1, 2, 3)]
    got = ngram_decontaminate(rd.from_items(docs), n=5, bench_mod=29)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "n_shared"]
    assert str(got["doc_id"].dtype) == "int64"


# ------------------------------------------------- retention cohorts


def test_events_retention_matches_pandas(ray_session):
    from zeno_ray.ops.relational import events_retention

    sf = "/root/testdata/sf0.001"
    got = events_retention(sf)
    ev = pd.read_parquet(sf + "/events.parquet", columns=["user_id", "ts"])
    pairs = pd.DataFrame({"user_id": ev["user_id"],
                          "day": ev["ts"].dt.normalize()}).drop_duplicates()
    first = pairs.groupby("user_id")["day"].transform("min")
    want = (pd.DataFrame({
                "cohort_day": first.dt.strftime("%Y-%m-%d"),
                "day_offset": (pairs["day"] - first).dt.days.astype("int64")})
            .groupby(["cohort_day", "day_offset"], as_index=False).size()
            .rename(columns={"size": "n_users"}))
    want["n_users"] = want["n_users"].astype("int64")
    want = want.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------- incremental dedup


def test_exact_dedup_incremental_matches_bruteforce(ray_session):
    from zeno_ray.ops.dedup import exact_dedup, exact_dedup_incremental

    prior_rows = [{"doc_id": i, "text": f"snapshot one doc {i // 2}"}
                  for i in range(20)]           # 10 distinct texts
    new_rows = (
        [{"doc_id": 100 + i, "text": f"snapshot one doc {i}"}
         for i in range(5)]                     # dupes of the prior corpus
        + [{"doc_id": 200 + i, "text": f"fresh doc {i // 2}"}
           for i in range(10)]                  # 5 distinct, each twice
    )
    prior_hashes = exact_dedup(rd.from_items(prior_rows))
    got = exact_dedup_incremental(rd.from_items(new_rows), prior_hashes) \
        .to_pandas().sort_values("doc_id")
    # survivors: first-id row of each fresh text; prior dupes all dropped
    assert got["doc_id"].tolist() == [200, 202, 204, 206, 208]

    # incremental(prior ∪ new) == full-corpus dedup on the union
    both = exact_dedup(rd.from_items(prior_rows + new_rows)).to_pandas()
    union_ids = set(both["doc_id"])
    assert set(got["doc_id"]) == {i for i in union_ids if i >= 100}


def test_ngram_decontaminate_shuffle_fallback_matches_broadcast(ray_session, monkeypatch):
    """Force the keyed-shuffle fallback (bench set 'too big' to
    broadcast) and assert it returns exactly the broadcast path's
    result."""
    import zeno_ray.ops.dedup as dd

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(25)]
    docs = [{"doc_id": i, "text": " ".join(rng.choice(vocab, 25))}
            for i in range(90)]
    docs[3]["text"] = docs[0]["text"]  # doc 0 is a benchmark doc
    ds = rd.from_items(docs)
    want = dd.ngram_decontaminate(ds, n=5, bench_mod=29)
    monkeypatch.setattr(dd, "NGRAM_BENCH_BROADCAST_BYTES", 0)
    got = dd.ngram_decontaminate(rd.from_items(docs), n=5, bench_mod=29)
    pd.testing.assert_frame_equal(got, want)
    assert 3 in set(got["doc_id"])


# ------------------------------------------------- unigram LM score


def test_lm_score_matches_duckdb(ray_session):
    import duckdb

    from zeno_ray.ops.text import lm_score

    path = "/root/testdata/sf0.001/documents.parquet"
    got = lm_score(rd.read_parquet(path, columns=["doc_id", "text"]))
    want = duckdb.sql(f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                     FROM read_parquet('{path}')),
        cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT SUM(c)::DOUBLE AS t FROM cnt)
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(LN(c / t)), 6) AS lm_score
        FROM tok JOIN cnt USING (token), tot
        GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert np.allclose(got["lm_score"], want["lm_score"], atol=1.1e-6)
    # scores are negative log-probs of a self-trained unigram model
    assert (got["lm_score"] < 0).all()


def test_lm_score_oov_and_vocab_cap(ray_session):
    """With the vocabulary capped below the true vocab, dropped tokens
    score as oov_count occurrences — still deterministic and finite."""
    from zeno_ray.ops.text import lm_score

    rows = [{"doc_id": i, "text": "common common rare%d" % i}
            for i in range(50)]
    out = lm_score(rd.from_items(rows), vocab_size=1, oov_count=1)
    assert len(out) == 50
    assert np.isfinite(out["lm_score"]).all()
    # every doc has the same token profile (2x top-vocab word + 1 OOV)
    assert out["lm_score"].nunique() == 1


# ------------------------------------------------- composed pipeline


def test_webtext_refine_end_to_end(ray_session, tmp_path):
    from zeno_ray.pipelines import webtext_refine
    from zeno_ray.sinks import partitioned_dataset

    out = str(tmp_path / "refined")
    stats = webtext_refine("/root/testdata/sf0.001", out, n_shards=4,
                           quality_keep_frac=0.6, lm_keep_frac=0.9)
    # monotone funnel
    assert stats["input"] >= stats["after_quality"] \
        >= stats["after_repetition"] >= stats["after_lm"] \
        >= stats["after_dedup"] >= stats["after_decontaminate"] > 0
    # every stage did something on this corpus... at minimum the LM gate
    assert stats["after_lm"] <= stats["after_repetition"]
    # the shards hold exactly the final survivors, once each
    back = partitioned_dataset(out).to_pandas()
    assert len(back) == stats["after_decontaminate"]
    assert back["doc_id"].is_unique
    # rerun resumes: all shards sealed, nothing rewritten
    stats2 = webtext_refine("/root/testdata/sf0.001", out, n_shards=4,
                            quality_keep_frac=0.6, lm_keep_frac=0.9)
    assert not stats2["shards"]["written"]
    assert sorted(stats2["shards"]["skipped"]) == sorted(
        stats["shards"]["written"])


# ------------------------------------------------- count-min sketch


def test_count_min_heavy_hitters_matches_exact(ray_session):
    from zeno_ray.ops.sketch import (count_min_heavy_hitters,
                                     count_min_sequential)

    rng = np.random.RandomState(5)
    # zipf-ish: value v appears ~ 3000/(v+1) times
    vals = np.repeat(np.arange(50), (3000 / (np.arange(50) + 1)).astype(int))
    rng.shuffle(vals)
    rows = [{"v": int(v)} for v in vals]
    got = count_min_heavy_hitters(rd.from_items(rows), "v", k=10)
    want = count_min_sequential(vals, k=10)
    assert got["v"].tolist() == want["value"].tolist()
    assert got["est_count"].tolist() == want["n"].tolist()  # exact on skew


def test_count_min_overestimates_only(ray_session):
    from zeno_ray.ops.sketch import _cms_build, _cms_query

    rng = np.random.RandomState(9)
    vals = rng.randint(0, 5000, size=20000)
    sk = _cms_build(vals, width=512, depth=4)  # tight width -> collisions
    uniq, true = np.unique(vals, return_counts=True)
    est = _cms_query(sk, uniq)
    assert (est >= true).all()  # one-sided error, always
    # and the bound is useful: mean overestimate ~ N/width
    assert (est - true).mean() <= 4 * len(vals) / 512


def test_count_min_batching_invariant(ray_session):
    from zeno_ray.ops.sketch import count_min_heavy_hitters

    rows = [{"v": i % 37} for i in range(11000)]
    a = count_min_heavy_hitters(rd.from_items(rows).repartition(2), "v", k=5)
    b = count_min_heavy_hitters(rd.from_items(rows).repartition(13), "v", k=5)
    assert a["v"].tolist() == b["v"].tolist()
    assert a["est_count"].tolist() == b["est_count"].tolist()


def test_bottom_k_sample_matches_duckdb(ray_session):
    import duckdb

    from zeno_ray.ops.text import bottom_k_sample

    path = "/root/testdata/sf0.01/documents.parquet"
    got = bottom_k_sample(
        rd.read_parquet(path, columns=["doc_id"]), k=25).to_pandas()
    want = duckdb.sql(f"""
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS prio
        FROM read_parquet('{path}') ORDER BY prio LIMIT 25
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # rerun is identical (deterministic sample)
    again = bottom_k_sample(
        rd.read_parquet(path, columns=["doc_id"]), k=25).to_pandas()
    assert again["doc_id"].tolist() == got["doc_id"].tolist()


def test_dedup_keep_best_picks_quality_not_min_id(ray_session):
    from zeno_ray.ops.dedup import dedup_keep_best, minhash_dedup
    from zeno_ray.ops.text import quality_features

    base = ("a perfectly ordinary training document about data "
            "pipelines and engines that is long enough to shingle")
    rows = [
        # cluster A: doc 0 is punct-heavy (low quality), doc 7 is clean
        {"doc_id": 0, "text": base + " !!!;;;;,,,???!!!;;;;,,,???"},
        {"doc_id": 7, "text": base + " extra words"},
        # singleton
        {"doc_id": 3, "text": "something entirely different and unrelated "
                              "to the first family of documents here"},
    ]
    ds = rd.from_items(rows)
    out = dedup_keep_best(ds, jaccard_threshold=0.5)
    assert len(out) == 3
    keep = dict(zip(out["doc_id"], out["keep"]))
    cl = dict(zip(out["doc_id"], out["cluster"]))
    assert cl[0] == cl[7] != cl[3]          # the near-dups clustered
    assert keep[7] and not keep[0]          # best quality wins, not min id
    assert keep[3]                          # singleton keeps itself
    # exactly one keeper per cluster, and flags agree with a brute pick
    q = quality_features(pd.DataFrame(rows))
    labels = minhash_dedup(rd.from_items(rows),
                           jaccard_threshold=0.5).to_pandas()
    merged = labels.merge(q[["doc_id", "quality", "n_chars"]], on="doc_id")
    for c, g in merged.groupby("cluster"):
        g = g.sort_values(["quality", "n_chars", "doc_id"],
                          ascending=[False, False, True])
        want_keep = int(g.iloc[0]["doc_id"])
        assert keep[want_keep]
        assert sum(keep[d] for d in g["doc_id"]) == 1


def test_resample_to_mixture_hits_target(ray_session):
    from zeno_ray.ops.text import resample_to_mixture

    rng = np.random.RandomState(13)
    langs = ["en"] * 6000 + ["zh"] * 1500 + ["es"] * 2500
    rows = [{"doc_id": i, "lang": l} for i, l in enumerate(langs)]
    sampled, rates = resample_to_mixture(
        rd.from_items(rows), {"en": 0.5, "zh": 0.2, "es": 0.3})
    # zh is the binding stratum: all 1500 kept, N* = 7500
    assert rates["zh"] == 1.0
    out = sampled.to_pandas()["lang"].value_counts()
    # composition within sampling noise of 50/20/30
    total = out.sum()
    assert abs(out["en"] / total - 0.5) < 0.03
    assert abs(out["zh"] / total - 0.2) < 0.03
    assert abs(out["es"] / total - 0.3) < 0.03
    # deterministic: rerun identical
    s2, r2 = resample_to_mixture(
        rd.from_items(rows), {"en": 0.5, "zh": 0.2, "es": 0.3})
    assert r2 == rates
    assert s2.to_pandas()["doc_id"].tolist() == \
        sampled.to_pandas()["doc_id"].tolist()
    # unlisted strata are dropped entirely
    rows.append({"doc_id": 99999, "lang": "xx"})
    s3, _ = resample_to_mixture(
        rd.from_items(rows), {"en": 0.5, "zh": 0.2, "es": 0.3})
    assert "xx" not in set(s3.to_pandas()["lang"])


def test_weighted_bottom_k_matches_duckdb(ray_session):
    import duckdb

    from zeno_ray.ops.text import weighted_bottom_k_sample

    path = "/root/testdata/sf0.01/documents.parquet"
    got = weighted_bottom_k_sample(
        rd.read_parquet(path, columns=["doc_id", "n_chars"]),
        k=40, weight_col="n_chars").to_pandas()
    want = duckdb.sql(f"""
        SELECT doc_id,
               -ln((hash(doc_id) + 0.5) / 18446744073709551616.0) / n_chars AS prio
        FROM read_parquet('{path}') ORDER BY prio LIMIT 40
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_weighted_bottom_k_prefers_heavy_rows(ray_session):
    from zeno_ray.ops.text import weighted_bottom_k_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=100): the heavy half
    # must dominate the sample
    rows = [{"doc_id": i, "w": 1} for i in range(500)] + \
           [{"doc_id": 1000 + i, "w": 100} for i in range(500)]
    out = weighted_bottom_k_sample(
        rd.from_items(rows), k=100, weight_col="w").to_pandas()
    heavy = (out["doc_id"] >= 1000).sum()
    assert heavy >= 90


def test_webtext_refine_semijoin_parity(ray_session, tmp_path):
    """Forcing max_broadcast_ids=0 must route the export filter through
    the hash-partitioned semi-join (the 10^9-doc path) and produce
    byte-identical stats and shard contents."""
    from zeno_ray.pipelines import webtext_refine
    from zeno_ray.sinks import partitioned_dataset

    a = str(tmp_path / "bcast")
    b = str(tmp_path / "semijoin")
    s1 = webtext_refine("/root/testdata/sf0.001", a, n_shards=4)
    s2 = webtext_refine("/root/testdata/sf0.001", b, n_shards=4,
                        max_broadcast_ids=0)
    assert {k: v for k, v in s1.items() if k != "shards"} \
        == {k: v for k, v in s2.items() if k != "shards"}
    pa_ = partitioned_dataset(a).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pb = partitioned_dataset(b).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert pa_.equals(pb)
    # no benchmark (doc_id % 29 == 0) docs may reach the training shards
    assert not (pa_["doc_id"].to_numpy() % 29 == 0).any()
