"""General relational demos over the TPC-H-ish driver tables — groupby
aggregates with partial pre-aggregation, broadcast hash join, sort/limit
top-k, tumbling-window aggregation over the events stream. These prove the
engine's generic query surface; column names match the DuckDB oracles in
``__ray_entry__`` exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)



def _finish_pandas(partials_ds, keys: list, sums: dict) -> pd.DataFrame:
    """Merge per-batch partial aggregates driver-side.

    Partial pre-aggregation bounds the data to (#groups × #blocks) rows, so
    the final merge is tiny; Ray's sort-based groupby costs ~4ms/group,
    which loses badly once groups number in the thousands. For genuinely
    unbounded key spaces (e.g. 10^9 users) swap this for
    groupby(keys).aggregate(...) — the partial stage stays identical."""
    pdf = partials_ds.to_pandas()
    return pdf.groupby(keys, as_index=False).agg(**{
        col: (col, "sum") for col in sums
    })

def lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped aggregate with per-batch partial aggregation before
    the (tiny) groupby — the combiner pattern from ray_guide 'Aggregation
    at scale'."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            revenue=df["l_extendedprice"] * (1.0 - df["l_discount"]),
            n=1,
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"),
            revenue=("revenue", "sum"),
            n=("n", "sum"),
        )
        return g

    out = (
        _finish_pandas(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["l_returnflag", "l_linestatus"],
            {"sum_qty": 1, "sum_price": 1, "revenue": 1, "n": 1},
        )
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_price"] = out["sum_price"].round(2)
    out["revenue"] = out["revenue"].round(2)
    return out


def orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer broadcast hash join (small side ray.put once, read
    in each batch task) → revenue per market segment."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Join:
        def __init__(self, ref):
            self.map = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            seg = df["o_custkey"].map(self.map)
            out = pd.DataFrame({"c_mktsegment": seg,
                                "o_totalprice": df["o_totalprice"]})
            g = out.groupby("c_mktsegment", as_index=False).agg(
                total_price=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
            return g

    out = (
        _finish_pandas(
            _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
            .map_batches(Join, fn_constructor_kwargs={"ref": cust_ref},
                         batch_format="pandas", batch_size=65536, concurrency=2),
            ["c_mktsegment"], {"total_price": 1, "n_orders": 1},
        )
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["total_price"] = out["total_price"].round(2)
    return out


def top_users_by_value(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """events: partial per-batch sums → groupby user → global top-k
    (sort + limit)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(total_value=("value", "sum"))

    out = (
        _finish_pandas(
            _read(sf_dir, "events", columns=["user_id", "value"])
            .map_batches(partial, batch_format="pandas", batch_size=65536),
            ["user_id"], {"total_value": 1},
        )
        .sort_values("total_value", ascending=False, kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    out["total_value"] = out["total_value"].round(6)
    return out


def events_hourly_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (streaming-shaped workload on
    the ordered events log): window key computed vectorized per batch, then
    pre-aggregated, then the small groupby."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].dt.floor("h")
        out = pd.DataFrame({"event_type": df["event_type"], "window_start": w,
                            "value": df["value"]})
        return out.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))

    out = (
        _finish_pandas(
            _read(sf_dir, "events", columns=["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type", "window_start"], {"n_events": 1, "sum_value": 1},
        )
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out


def events_sliding_window(sf_dir: str, size_minutes: int = 60,
                          hop_minutes: int = 30) -> pd.DataFrame:
    """Hopping (sliding) window per event_type: window size 1 h, hop 30 min
    — every event lands in size/hop windows. Vectorized per batch (one
    row per (event, window) pair), partial-aggregated, driver-merged."""
    k = size_minutes // hop_minutes

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        base = df["ts"].dt.floor(f"{hop_minutes}min")
        for i in range(k):
            w = base - pd.Timedelta(minutes=hop_minutes * i)
            frames.append(pd.DataFrame({
                "event_type": df["event_type"], "window_start": w,
                "value": df["value"]}))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))

    out = (
        _finish_pandas(
            _read(sf_dir, "events", columns=["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type", "window_start"], {"n_events": 1, "sum_value": 1},
        )
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out


def sessionize_events(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows per user (gap-based). Column-pruned distributed read,
    then fully-vectorized pandas sessionization on the (user_id, ts)
    projection — two int64 columns, so the driver-side finish is tiny even
    at bench scale. For event logs too large to project to the driver, use
    :func:`sessionize_events_distributed` (same semantics, groupby(user)
    keyed shuffle). Returns (user_id, session_start, n_events)."""
    pdf = _read(sf_dir, "events", columns=["user_id", "ts"]).to_pandas()
    pdf = pdf.sort_values(["user_id", "ts"], kind="stable")
    gaps = pdf.groupby("user_id")["ts"].diff().dt.total_seconds()
    brk = gaps.isna() | (gaps > gap_minutes * 60)
    pdf = pdf.assign(sid=brk.cumsum())
    out = pdf.groupby("sid", as_index=False).agg(
        user_id=("user_id", "first"), session_start=("ts", "first"),
        n_events=("ts", "size"))
    return (
        out[["user_id", "session_start", "n_events"]]
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def sessionize_events_distributed(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Coarse-partition sessionization — the keyed-shuffle scale path.

    The shuffle keys on ``part = user_id % n_parts`` (a few parts per
    core), NOT the raw user_id: a raw-key ``groupby(user).map_groups``
    at 10^8 users is 10^8 tiny pandas groups each paying Python
    dispatch. Every user's rows land in exactly one part; inside a part
    the MULTI-user vectorized kernel (sort by user,ts → per-user diff →
    gap-break cumsum) sessionizes the whole part in one pandas pass."""
    import ray as _ray

    n_parts = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 4) \
        if _ray.is_initialized() else 32

    def with_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["part"] = (df["user_id"].to_numpy() % n_parts).astype("int64")
        return out

    def sessions_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        brk = gaps.isna() | (gaps > gap_minutes * 60)
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("ts", "first"),
            n_events=("ts", "size"))
        return out.reset_index(drop=True)

    return (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(with_part, batch_format="pandas")
        .groupby("part")
        .map_groups(sessions_in_part, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def asof_join_events(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click") -> pd.DataFrame:
    """Distributed AS-OF join (DuckDB ``ASOF JOIN`` semantics, inner,
    backward-inclusive): for each ``left_type`` event, the most recent
    ``right_type`` event by the same user with ``ts <= left.ts``.

    Ray Data has no join, so this is the module-standard
    repartition-join specialized to the as-of case: both sides land in
    ``part = user_id % n_parts`` via ONE union'd shuffle (every user's
    rows — both roles — in exactly one part), and inside each part a
    single vectorized ``pd.merge_asof`` (sorted by ts, by=user_id)
    joins ALL the part's users at once. Same raw-key-avoidance
    discipline as sessionize above; slim 4-column projection only.
    """
    import ray as _ray

    n_parts = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 4) \
        if _ray.is_initialized() else 32

    def tag_sides(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin([left_type, right_type])
        out = df[m][["event_id", "user_id", "ts"]].copy()
        out["part"] = (out["user_id"].to_numpy() % n_parts).astype("int64")
        out["side"] = (df.loc[m, "event_type"] == right_type) \
            .to_numpy().astype(np.int8)
        return out

    def asof_in_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0].sort_values("ts", kind="stable")
        # deterministic tie-break among clicks sharing (user_id, ts):
        # keep the max event_id — merge_asof would otherwise pick the
        # last right row in read order (partitioning-dependent), and
        # DuckDB's ASOF JOIN pick among equal-ts matches is unspecified;
        # the oracle SQL pre-dedupes clicks the same way
        right = (
            g[g["side"] == 1]
            .sort_values(["user_id", "ts", "event_id"], kind="stable")
            .drop_duplicates(["user_id", "ts"], keep="last")
            .sort_values("ts", kind="stable")
        )
        if left.empty or right.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "click_event_id": pd.Series([], dtype="int64"),
                "click_ts": pd.Series([], dtype="datetime64[us]")})
        # merge_asof drops the right side's on-key — carry the right
        # event id and ts as payload columns instead
        r2 = right[["user_id", "ts"]].copy()
        r2["click_event_id"] = right["event_id"].to_numpy()
        r2["click_ts"] = right["ts"].to_numpy()
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]], r2,
            on="ts", by="user_id", direction="backward",
            allow_exact_matches=True)
        m = m[m["click_event_id"].notna()]  # inner (ASOF JOIN) semantics
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "ts": m["ts"],
            "click_event_id": m["click_event_id"].astype("int64"),
            "click_ts": m["click_ts"]})

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])
        .map_batches(tag_sides, batch_format="pandas")
        .groupby("part")
        .map_groups(asof_in_part, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def revenue_by_segment_priority(sf_dir: str) -> pd.DataFrame:
    """Big-big repartition equi-join: lineitem ⋈ orders on orderkey —
    the fact-fact join class (neither side fits a broadcast at real
    scale) — then a broadcast customer-dim lookup and a tiny aggregate.

    Shape: (1) lineitem revenue is pre-aggregated PER ORDERKEY inside
    each batch (the combiner: ≤ |orders| partial rows per block leave
    the scan, not |lineitem|); (2) both sides land in ``part =
    orderkey % n_parts`` via one union'd shuffle; (3) inside each part
    a single vectorized merge joins all the part's orders, the
    customer→segment map (small side, ``ray.put`` once) resolves the
    dim lookup, and a local groupby emits (segment, priority) partials;
    (4) the driver merges ≤ groups×parts rows.
    """
    n_parts = max(32, int(ray.cluster_resources().get("CPU", 8)) * 4) \
        if ray.is_initialized() else 32

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(pd.Series(cust["c_mktsegment"].to_numpy(object),
                                index=cust["c_custkey"].to_numpy()))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = pd.DataFrame({"okey": df["l_orderkey"], "revenue": rev}) \
            .groupby("okey", as_index=False) \
            .agg(revenue=("revenue", "sum"), n=("revenue", "size"))
        return pd.DataFrame({
            "part": (g["okey"].to_numpy() % n_parts).astype("int64"),
            "okey": g["okey"], "revenue": g["revenue"],
            "n": g["n"].astype("int64"),
            "custkey": np.zeros(len(g), dtype="int64"),
            "priority": np.full(len(g), "", dtype=object),
            "side": np.zeros(len(g), dtype=np.int8)})

    def ord_tagged(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": (df["o_orderkey"].to_numpy() % n_parts).astype("int64"),
            "okey": df["o_orderkey"],
            "revenue": np.zeros(len(df), dtype="float64"),
            "n": np.zeros(len(df), dtype="int64"),
            "custkey": df["o_custkey"].astype("int64"),
            "priority": df["o_orderpriority"].to_numpy(object),
            "side": np.ones(len(df), dtype=np.int8)})

    def join_in_part(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0][["okey", "revenue", "n"]]
        od = g[g["side"] == 1][["okey", "custkey", "priority"]]
        m = li.merge(od, on="okey", how="inner")
        if m.empty:
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype=object),
                "o_orderpriority": pd.Series([], dtype=object),
                "revenue": pd.Series([], dtype="float64"),
                "n": pd.Series([], dtype="int64")})
        seg = ray.get(seg_ref)
        m["c_mktsegment"] = seg.reindex(m["custkey"].to_numpy()).to_numpy()
        m = m.sort_values(["c_mktsegment", "priority"], kind="stable")
        return m.groupby(["c_mktsegment", "priority"], as_index=False) \
            .agg(revenue=("revenue", "sum"), n=("n", "sum")) \
            .rename(columns={"priority": "o_orderpriority"})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pandas", batch_size=65536)
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderpriority"]) \
        .map_batches(ord_tagged, batch_format="pandas", batch_size=65536)

    pdf = (
        li.union(od)
        .groupby("part")
        .map_groups(join_in_part, batch_format="pandas")
        .to_pandas()
    )
    out = pdf.groupby(["c_mktsegment", "o_orderpriority"], as_index=False) \
        .agg(revenue=("revenue", "sum"), n=("n", "sum"))
    out["revenue"] = out["revenue"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["c_mktsegment", "o_orderpriority"]) \
        .reset_index(drop=True)


def suppliers_by_region(sf_dir: str) -> pd.DataFrame:
    """Dimension-chain broadcast join: supplier ⋈ nation ⋈ region —
    both dims are tiny, so they ride as ``ray.put`` lookup maps inside
    ONE map_batches over supplier (no shuffle at all); the aggregate is
    a per-batch partial + driver merge."""
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(nat.set_index("n_nationkey")[["n_name", "r_name"]])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        m = df.join(lk, on="s_nationkey")
        return m.groupby(["r_name", "n_name"], as_index=False).agg(
            n_suppliers=("s_suppkey", "size"),
            total_acctbal=("s_acctbal", "sum"))

    pdf = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey", "s_acctbal"]) \
        .map_batches(partial, batch_format="pandas", batch_size=65536) \
        .to_pandas()
    out = pdf.groupby(["r_name", "n_name"], as_index=False).agg(
        n_suppliers=("n_suppliers", "sum"),
        total_acctbal=("total_acctbal", "sum"))
    out["total_acctbal"] = out["total_acctbal"].round(2)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Single-table aggregate over part with the combiner pattern."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_brand", as_index=False).agg(
            n_parts=("p_partkey", "size"),
            total_price=("p_retailprice", "sum"),
            max_size=("p_size", "max"))

    pdf = _read(sf_dir, "part",
                columns=["p_partkey", "p_brand", "p_retailprice",
                         "p_size"]) \
        .map_batches(partial, batch_format="pandas", batch_size=65536) \
        .to_pandas()
    out = pdf.groupby("p_brand", as_index=False).agg(
        n_parts=("n_parts", "sum"), total_price=("total_price", "sum"),
        max_size=("max_size", "max"))
    out["total_price"] = out["total_price"].round(2)
    out["n_parts"] = out["n_parts"].astype("int64")
    out["max_size"] = out["max_size"].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


def dataset_quantiles_disc(ds, col: str, qs) -> tuple[list[float], int]:
    """EXACT global order statistics of an unbounded column via the
    distributed sort — ``quantile_disc`` semantics (the element at index
    ceil(q·n)−1 of the global order). Returns ``([values...], n)``.

    This is the range-partitioned all-to-all sort operator class: the
    slim projection is sorted once, per-block row counts stream back
    (blocks × 1 rows), and each target rank is read with
    ``split_at_indices`` + ``take(1)`` — only the block containing the
    rank is touched, so driver traffic is O(blocks + len(qs)), never
    the data. This is the funnel-cutoff mechanism webtext_refine uses
    in place of collecting per-doc scores to the driver."""
    sorted_ds = ds.sort(col).materialize()
    n = sorted_ds.count()
    if n == 0:
        return [float("nan") for _ in qs], 0
    vals = []
    for q in qs:
        r = max(1, int(np.ceil(q * n))) - 1
        if r == 0:
            val = sorted_ds.take(1)[0][col]
        else:
            val = sorted_ds.split_at_indices([r])[1].take(1)[0][col]
        vals.append(float(val))
    return vals, n


def value_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """EXACT global order statistics of events.value (see
    :func:`dataset_quantiles_disc` for the mechanism). Complements
    ops.text.group_quantiles, whose histogram trick is exact only for
    bounded ints."""
    vals, n = dataset_quantiles_disc(
        _read(sf_dir, "events", columns=["value"]), "value", qs)
    row = {"n": n}
    for q, v in zip(qs, vals):
        row[f"q{int(q * 100)}"] = round(v, 6)
    return pd.DataFrame([row])[["n"] + [f"q{int(q*100)}" for q in qs]]


def events_funnel(sf_dir: str,
                  stages=("signup", "click", "purchase")) -> pd.DataFrame:
    """Ordered conversion funnel: users who did stage 1, then stage 2
    STRICTLY AFTER their first stage-1 event, then stage 3 strictly
    after that — the sequential-milestone analytics operator (not
    expressible as independent per-stage mins).

    Distributed shape: slim (user, ts, type) projection, coarse
    ``user_id % n_parts`` shuffle (every user wholly in one part), then
    a fully vectorized per-part kernel: first-stage-1 per user via
    groupby-min, then each later stage is a filter + merge + groupby-min
    chain (no per-user Python). Each part emits one count row; the
    driver sums n_parts rows."""
    import ray as _ray

    n_parts = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 4) \
        if _ray.is_initialized() else 32

    def with_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["event_type"].isin(stages)][
            ["user_id", "ts", "event_type"]].copy()
        out["part"] = (out["user_id"].to_numpy() % n_parts).astype("int64")
        return out

    def funnel_in_part(g: pd.DataFrame) -> pd.DataFrame:
        cur = g[g["event_type"] == stages[0]] \
            .groupby("user_id", as_index=False).agg(t=("ts", "min"))
        counts = [len(cur)]
        for st in stages[1:]:
            ev = g[g["event_type"] == st][["user_id", "ts"]] \
                .merge(cur, on="user_id", how="inner")
            ev = ev[ev["ts"] > ev["t"]]
            cur = ev.groupby("user_id", as_index=False).agg(t=("ts", "min"))
            counts.append(len(cur))
        return pd.DataFrame([counts],
                            columns=[f"n_{st}" for st in stages])

    pdf = (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        .map_batches(with_part, batch_format="pandas")
        .groupby("part")
        .map_groups(funnel_in_part, batch_format="pandas")
        .to_pandas()
    )
    out = pd.DataFrame([pdf.sum(axis=0)])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by their first active day
    (the cohort), counting distinct users active at each day offset —
    the classic training-telemetry / product-analytics wide aggregate.

    Shape: (1) per batch, rows collapse to DISTINCT (user, day) pairs
    (the combiner — at 100 TB an active user's thousands of same-day
    events leave the scan as one row per block); (2) pairs land in
    ``part = user_id % n_parts`` via one keyed shuffle, so EVERY pair of
    a user co-locates and the within-part min day IS the global cohort
    day; (3) one vectorized kernel per part computes cohort + offset and
    emits exact (cohort_day, day_offset, n_users) counts — exact, not
    partial, because users never span parts; (4) the driver sums the
    ≤ cohorts×offsets×parts partial rows.

    Oracle: __ray_entry__.oracle_sql['events_retention'] (MIN(CAST(ts AS
    DATE)) per user joined back to distinct activity days)."""
    n_parts = max(32, int(ray.cluster_resources().get("CPU", 8)) * 4) \
        if ray.is_initialized() else 32

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": df["ts"].dt.normalize(),
        }).drop_duplicates()
        out["part"] = (out["user_id"].to_numpy() % n_parts).astype("int64")
        return out

    def cohort_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame({
            "cohort_day": first.dt.strftime("%Y-%m-%d"),
            "day_offset": (g["day"] - first).dt.days.astype("int64"),
        })
        r = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return r.rename(columns={"size": "n_users"})

    pdf = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(day_partial, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(cohort_in_part, batch_format="pandas")
        .to_pandas()
    )
    out = pdf.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
