"""Relational operators over the TPC-H-ish testdata tables.

These cover the SURVEY.md §2 relational surface the crawl pipeline itself
doesn't exercise: grouped aggregation with partial pre-aggregation (A3) up
through ROLLUP and decomposable moments, broadcast hash / star joins
(J1/J3), big x big bucketed hash AND anti-joins (J4), sort + top-k /
windowed rank / window frames (O5), distinct and exact distinct-per-group
(D-family), deterministic + stratified sampling, exact histogram quantiles
(global and grouped), the events-stream window family (§2.9 analog:
tumbling/hopping, sessions, as-of and trailing-window range joins, lag,
running sums, moving averages), PageRank power iteration, and the
broadcast semi-join allow-list gate (M5, ``SharePointClient.cs:272-275``).
All per-key window ops ride the coarse ``key % 64`` bucket shuffle with
the per-key work vectorized inside each bucket.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .io import read_pruned


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _from_pandas(df) -> pa.Table:
    # strip the pandas schema-metadata dict: it makes Arrow schemas
    # unhashable and floods Ray's schema-dedup log (see engine.ops.io)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def q1_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style grouped aggregate with partial pre-aggregation.

    Pattern (ray_guide 'Aggregation at scale'): combine per batch inside
    map_batches (one row per key per batch), then a tiny groupby over the
    partials — the full-table shuffle moves only partial rows.
    """
    ds = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combine (VERDICT r3 "wrong" #5): no pandas round-trip
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        g = (
            batch.append_column("disc_price", disc)
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("l_quantity", "sum"), ("l_extendedprice", "sum"),
                 ("disc_price", "sum"), ("l_quantity", "count")]
            )
        )
        return g.select(
            ["l_returnflag", "l_linestatus", "l_quantity_sum",
             "l_extendedprice_sum", "disc_price_sum", "l_quantity_count"]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "n_rows"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum

    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(0)
    out["sum_base_price"] = out["sum_base_price"].round(0)
    out["sum_disc_price"] = out["sum_disc_price"].round(0)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def mktsegment_revenue(sf_dir: str) -> pd.DataFrame:
    """orders x customer broadcast hash join -> revenue per market segment.

    customer is the small side: ``ray.put`` once, dict-lookup per batch — no
    shuffle (the reference's allow-list broadcast pattern, J1).
    """
    import pyarrow.parquet as pq

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), cust["c_mktsegment"].combine_chunks())
    )

    ds = read_pruned(_t(sf_dir, "orders"), ["o_custkey", "o_totalprice"])

    def join_partial(batch: pa.Table) -> pa.Table:
        # Arrow-native broadcast lookup: index_in + take against the shared
        # customer arrays, then an Arrow group_by — no pandas round-trip
        keys, segs = ray.get(lookup_ref)
        seg = pc.take(segs, pc.index_in(batch["o_custkey"], value_set=keys))
        g = (
            pa.table({"c_mktsegment": seg, "o_totalprice": batch["o_totalprice"]})
            .group_by("c_mktsegment")
            .aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        )
        return g.select(
            ["c_mktsegment", "o_totalprice_sum", "o_totalprice_count"]
        ).rename_columns(["c_mktsegment", "revenue", "n_orders"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(join_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(0)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def top_orders(sf_dir: str, n: int = 10) -> pd.DataFrame:
    """Global top-n orders by totalprice, deterministic tiebreak on orderkey.

    Partial top-n per batch -> driver merge of <= n * n_blocks rows.  A global
    ``ds.sort`` would shuffle every row to rank 10 of them; the partial
    pattern moves only candidates (top-k is a pre-aggregable statistic).
    """
    ds = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        return _from_pandas(df.head(n))

    cands = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = cands.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(n)
    return out[["o_orderkey", "o_totalprice"]].reset_index(drop=True)


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling one-hour event-time windows per event_type (count only:
    exact).  Partials shuffle on the coarse ``hour % 64`` int bucket and
    combine vectorized per bucket (a direct Ray groupby on the composite
    (type, window) key pays per-distinct-key sort-aggregate overhead —
    measured ~5x on the cents histogram, same shape)."""
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "hour_us": pc.cast(
                    pc.floor_temporal(batch["ts"], unit="hour"), pa.int64()
                ).to_pandas(),
            }
        )
        g = df.groupby(["event_type", "hour_us"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["bucket"] = (g["hour_us"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _H_SCHEMA = pa.schema(
        [("event_type", pa.string()), ("hour_us", pa.int64()), ("n", pa.int64())]
    )

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["event_type", "hour_us"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            s, schema=_H_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out["hour"] = pd.to_datetime(out["hour_us"], unit="us")
    out["n"] = out["n"].astype("int64")
    return (
        out[["event_type", "hour", "n"]]
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )


def events_hourly_dense(sf_dir: str) -> pd.DataFrame:
    """(event_type, hour, n) — events_hourly with the calendar DENSIFIED:
    every (present event_type) × (hour in the global [min, max] hour span)
    cell appears, zero-filled where no events landed.  The gap-filling
    shape monitoring dashboards need (a silent hour is a SIGNAL — the
    sparse groupby simply omits it) and the one shape the window family
    lacked: dimension GENERATION + left join, not aggregation.

    Scale shape: the distributed work is exactly events_hourly's
    (per-batch combined partials, one coarse hour-bucket exchange); the
    densify step runs on the DRIVER over the bounded sparse result — the
    grid is |types| × |hours| (a bounded enum × a time-span count that
    grows with calendar time, not event volume), never event-sized.  The
    type universe is the types present in the data (same discovery stance
    as event_type_correlations' map-only distinct partial).
    """
    sparse = events_hourly(sf_dir)
    hours = pd.date_range(sparse["hour"].min(), sparse["hour"].max(),
                          freq="h")
    types = sorted(sparse["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, hours], names=["event_type", "hour"]).to_frame(index=False)
    out = grid.merge(sparse, on=["event_type", "hour"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return (out.sort_values(["event_type", "hour"])
            .reset_index(drop=True))


N_KEY_BUCKETS = 64  # coarse shuffle width for all per-user window ops


def _bucket_by(col: str):
    """map_batches fn adding ``bucket = key % N_KEY_BUCKETS`` (the coarse-
    bucket shuffle idiom: one shuffle moves each key's rows to ONE group,
    the per-key work then runs vectorized in pandas inside the bucket —
    avoids the measured ~1 ms/group map_groups overhead at 10^8 keys)."""

    def add(t: pa.Table) -> pa.Table:
        keys = t[col].to_numpy()
        return t.append_column(
            "bucket", pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32())
        )

    return add


def _sessionize_events_ds(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user as a DATASET (scale consumers count/write it;
    the query-contract wrapper collects): a new session starts after a >gap
    idle period.

    Shuffle on the coarse ``user_id % 64`` bucket (same-user rows land in the
    same bucket), then sessionize EVERY user in the bucket in one vectorized
    pandas pass: sort by (user, ts, id), session boundary = user change OR
    idle gap, cumsum -> session label, one groupby(label) agg.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts", "event_id"])

    gap = pd.Timedelta(minutes=gap_minutes)
    _SESSIONS_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("session_start", pa.int64()), ("n_events", pa.int64())]
    )

    def sessions(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        sess = (new_user | (g["ts"].diff() > gap)).cumsum()
        agg = g.groupby(sess).agg(
            user_id=("user_id", "first"),
            session_start=("event_id", "min"),
            n_events=("event_id", "size"),
        )
        return pa.Table.from_pandas(
            agg.reset_index(drop=True), schema=_SESSIONS_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(_bucket_by("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def sessionize_events(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    out = _sessionize_events_ds(sf_dir, gap_minutes).to_pandas()
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)


def _events_asof_join_ds(sf_dir: str):
    """As-of join as a DATASET (the query-contract wrapper collects): for
    each signup event, the value of the user's most recent prior (ts <=)
    error event.  Coarse-bucket shuffle on ``user_id % 64``, then ONE
    ``pd.merge_asof(..., by="user_id")`` handles every user in the bucket
    vectorized (merge_asof's ``by=`` scopes the backward search to the
    same user).  Rows with no prior error are dropped (inner as-of).

    Only signup/error rows matter, so the batch stage FILTERS before the
    shuffle (3/5 of the stream never enters the exchange at uniform type
    mix) and ships the type as an int8 flag instead of the string.
    """
    ds = read_pruned(
        _t(sf_dir, "events"), ["event_id", "user_id", "ts", "event_type", "value"]
    )
    _TYPES = pa.array(["signup", "error"], pa.string())

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_TYPES))
        keys = t["user_id"].to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "is_signup": pc.cast(pc.equal(t["event_type"], "signup"), pa.int8()),
                "value": t["value"],
                "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    _ASOF_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("last_error_value", pa.float64())]
    )

    def asof(g: pd.DataFrame):
        s = g[g["is_signup"] == 1].sort_values(["ts", "event_id"], kind="mergesort")
        err = g[g["is_signup"] == 0].sort_values(["ts", "event_id"], kind="mergesort")
        if s.empty or err.empty:
            return _ASOF_SCHEMA.empty_table()
        out = pd.merge_asof(
            s[["event_id", "user_id", "ts"]],
            err[["user_id", "ts", "value"]].rename(columns={"value": "last_error_value"}),
            on="ts",
            by="user_id",
            direction="backward",
        ).dropna(subset=["last_error_value"])
        return pa.Table.from_pandas(
            out[["event_id", "user_id", "last_error_value"]],
            schema=_ASOF_SCHEMA, preserve_index=False,
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
    )


def events_asof_join(sf_dir: str) -> pd.DataFrame:
    out = _events_asof_join_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _events_running_sum_ds(sf_dir: str):
    """Running per-user cumulative sum of value in (ts, event_id) order,
    as a DATASET (the query-contract wrapper collects).

    The window-function analog on the coarse-bucket idiom: shuffle on
    ``user_id % 64``, sort the whole bucket by (user, ts, id) once, then a
    single vectorized ``groupby(user_id).cumsum()`` covers every user in
    the bucket.  Rounded to 2 decimals so the comparison is robust to
    last-bit accumulation differences.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "user_id", "ts", "value"])

    _RUN_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("running_value", pa.float64())]
    )

    def run(g: pd.DataFrame):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
        g["running_value"] = g.groupby("user_id")["value"].cumsum().round(2)
        return pa.Table.from_pandas(
            g[["event_id", "user_id", "running_value"]],
            schema=_RUN_SCHEMA, preserve_index=False,
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(_bucket_by("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(run, batch_format="pandas")
    )


def events_running_sum(sf_dir: str) -> pd.DataFrame:
    out = _events_running_sum_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def allowlist_filter(sf_dir: str, allowed=("src1", "src3")) -> pd.DataFrame:
    """Broadcast semi-join gate: keep documents whose source is allow-listed.

    The engine analog of the title allow-list (``SharePointClient.cs:272-275``):
    the allow set lives in the task closure; the membership test is a
    vectorized ``pc.is_in`` mask.
    """
    allowed_arr = pa.array(list(allowed), pa.string())
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "source", "n_chars"])
    out = (
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t["source"], value_set=allowed_arr)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def distinct_sources(sf_dir: str) -> pd.DataFrame:
    ds = read_pruned(_t(sf_dir, "documents"), ["source"])
    vals = sorted(ds.unique("source"))
    return pd.DataFrame({"source": vals})


def nation_region_join(sf_dir: str) -> pd.DataFrame:
    """Two-level broadcast dimension join: customers per region."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    ds = read_pruned(_t(sf_dir, "customer"), ["c_nationkey"])

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        df = batch.to_pandas()
        df["r_name"] = df["c_nationkey"].map(lookup)
        g = df.groupby("r_name", as_index=False).agg(n_customers=("c_nationkey", "size"))
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


def events_hopping(sf_dir: str, window_min: int = 60, hop_min: int = 15) -> pd.DataFrame:
    """Hopping (sliding) event-time windows: 1h windows advancing every 15m.

    Each event belongs to window_min/hop_min consecutive windows.  The batch
    stage first combines per (event_type, hop-bucket) — the hop-partial table
    is <= |types| x |hops| rows regardless of event count — and only THEN
    expands each hop-partial into its k window starts, so the explode runs
    over partials, not raw events (k x fewer exploded rows).  The shuffle
    moves only (event_type, window_start, n) partials.  Exact counts; the
    DuckDB oracle runs the same explode via unnest(range(...)).
    """
    assert window_min % hop_min == 0
    k_wins = window_min // hop_min
    hop_us = hop_min * 60 * 1_000_000
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch["ts"], multiple=hop_min, unit="minute")
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "base_us": pc.cast(base, pa.int64()).to_numpy(),
            }
        )
        hp = df.groupby(["event_type", "base_us"], as_index=False).size().rename(
            columns={"size": "n"}
        )  # combine FIRST: one row per (type, hop) per batch
        frames = [
            pd.DataFrame(
                {
                    "event_type": hp["event_type"],
                    "win_us": hp["base_us"] - j * hop_us,
                    "n": hp["n"],
                }
            )
            for j in range(k_wins)
        ]
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["event_type", "win_us"], as_index=False)["n"].sum()
        g["bucket"] = (g["win_us"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _HOP_SCHEMA = pa.schema(
        [("event_type", pa.string()), ("win_us", pa.int64()), ("n", pa.int64())]
    )

    def combine(g: pd.DataFrame) -> pa.Table:
        # coarse int-bucket shuffle + vectorized combine (see events_hourly)
        s = g.groupby(["event_type", "win_us"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            s, schema=_HOP_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out["window_start"] = pd.to_datetime(out["win_us"], unit="us")
    out["n"] = out["n"].astype("int64")
    return (
        out[["event_type", "window_start", "n"]]
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """BIG x BIG bucketed hash join (no broadcast side): orders x lineitem
    on orderkey -> revenue per order priority.

    Neither side fits a broadcast at 100 TB, so both shuffle ONCE on the
    same key-bucket: lineitem first combines per batch to (orderkey, rev)
    partials (the combiner halves the exchanged rows), both sides union
    with a side tag, one groupby(bucket) co-locates matching keys, and the
    in-group pandas merge + priority rollup emits tiny partials for a final
    priority sum.  Join key buckets reuse THE partitioning idiom of the
    crawl's fetch join.
    """
    N_BUCKETS = 32
    _JOIN_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("prio", pa.string()), ("rev", pa.float64()), ("bucket", pa.int32())]
    )

    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_orderpriority"])
    items = read_pruned(
        _t(sf_dir, "lineitem"), ["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
                "prio": t["o_orderpriority"],
                "rev": pa.array(np.zeros(len(keys)), pa.float64()),
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32()),
            },
            schema=_JOIN_SCHEMA,
        )

    def item_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": t["l_orderkey"].to_numpy(),
                "rev": t["l_extendedprice"].to_numpy()
                * (1.0 - t["l_discount"].to_numpy()),
            }
        )
        g = df.groupby("key", as_index=False)["rev"].sum()  # per-batch combiner
        keys = g["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
                "prio": pa.array([None] * len(keys), pa.string()),
                "rev": pa.array(g["rev"].to_numpy(), pa.float64()),
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32()),
            },
            schema=_JOIN_SCHEMA,
        )

    _OUT_SCHEMA = pa.schema([("o_orderpriority", pa.string()), ("revenue", pa.float64())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "prio"]]
        right = g[g["side"] == 1].groupby("key", as_index=False)["rev"].sum()
        m = left.merge(right, on="key", how="inner")
        out = m.groupby("prio", as_index=False)["rev"].sum().rename(
            columns={"prio": "o_orderpriority", "rev": "revenue"}
        )
        return pa.Table.from_pandas(
            out, schema=_OUT_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        items.map_batches(item_partials, batch_format="pyarrow", batch_size=65536)
    )
    out = (
        both.groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(0)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SAMPLE_MULT = 2654435761  # Knuth multiplicative constant, shared with the oracle


def sample_documents(sf_dir: str, pct: int = 10) -> pd.DataFrame:
    """Deterministic arithmetic sampling gate: keep doc_id rows whose
    multiplicative hash lands under pct% — the unbiased distributed-sample
    primitive (no RNG state; same rows at any parallelism), expressible in
    SQL so the oracle runs the identical arithmetic."""
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "source", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        mask = (ids * SAMPLE_MULT) % 100 < pct
        return t.filter(pa.array(mask))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def top_order_per_customer(sf_dir: str) -> pd.DataFrame:
    """Per-group top-1 (the windowed-rank shape): each customer's highest-
    value order, deterministic tiebreak on orderkey.

    groupby(custkey) directly would invoke the group fn once per customer
    (~1 ms/group of pure overhead at 10^5+ groups — the measured map_groups
    pathology); instead the shuffle key is a COARSE key-bucket and the
    per-customer rank runs vectorized in pandas inside each of the 64
    groups.  Same idiom as the salted politeness tree.
    """
    N_BUCKETS = 64
    ds = read_pruned(_t(sf_dir, "orders"), ["o_custkey", "o_orderkey", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy()
        return t.append_column(
            "bucket", pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())
        )

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
         ("o_totalprice", pa.float64())]
    )

    def best_per_customer(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = g.drop_duplicates("o_custkey", keep="first")
        return pa.Table.from_pandas(
            out[["o_custkey", "o_orderkey", "o_totalprice"]],
            schema=_OUT, preserve_index=False,
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(best_per_customer, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


def _events_lag_delta_ds(sf_dir: str):
    """Per-event gap to the same user's previous event, in microseconds,
    as a DATASET (scale consumers count/write it; the query wrapper collects).

    The window-function ``lag()`` analog (SURVEY.md §2.9) on the coarse
    ``user_id % 64`` bucket shuffle: sort the whole bucket by
    (user, ts, event_id) once, shift, and mask user boundaries — every user
    in the bucket handled by one vectorized pass.  Timestamps are cast to
    int64 epoch-microseconds INSIDE the bucket stage (matching DuckDB's
    ``epoch_us``), so the output is integer-exact.  Events with no
    predecessor are dropped (the lag() NULL rows).
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "t_us": pc.cast(t["ts"], pa.int64()),
                "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    _LAG_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("delta_us", pa.int64())]
    )

    def lag(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "t_us", "event_id"], kind="mergesort")
        same_user = g["user_id"].eq(g["user_id"].shift())
        delta = g["t_us"] - g["t_us"].shift()
        keep = same_user.to_numpy()
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy()[keep], pa.int64()),
                "user_id": pa.array(g["user_id"].to_numpy()[keep], pa.int64()),
                "delta_us": pa.array(
                    delta.to_numpy()[keep].astype(np.int64), pa.int64()
                ),
            },
            schema=_LAG_SCHEMA,
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag, batch_format="pandas")
    )


def events_lag_delta(sf_dir: str) -> pd.DataFrame:
    out = _events_lag_delta_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _events_range_join_ds(sf_dir: str, window_min: int = 60):
    """Trailing-window range join as a DATASET (the query wrapper collects):
    for each signup event, the count and
    value-sum of the SAME user's click events with ts in (signup_ts - window,
    signup_ts].

    A range join is an all-pairs predicate, but over a trailing window it
    factors into two as-of lookups against per-user cumulative statistics:
    F(t) = #clicks <= t, so n = F(ts) - F(ts - window) (and likewise for the
    value cumsum).  Shuffle once on the coarse ``user_id % 64`` bucket, then
    per bucket: cumulative count/sum over the sorted click side, TWO
    ``pd.merge_asof(..., by="user_id")`` probes (upper bound at ts, lower at
    ts - window, both inclusive-backward => half-open window), and a
    vectorized difference.  Signups with zero clicks are kept (n=0) — left
    range-join semantics.  Sums round to 2 decimals (cumsum-difference vs
    direct-sum last-bit noise).
    """
    ds = read_pruned(
        _t(sf_dir, "events"), ["event_id", "user_id", "ts", "event_type", "value"]
    )
    win_us = window_min * 60 * 1_000_000
    _TYPES = pa.array(["signup", "click"], pa.string())

    def add_bucket(t: pa.Table) -> pa.Table:
        # only signup/click rows matter: filter BEFORE the shuffle and ship
        # the type as an int8 flag (3/5 of the stream never enters the
        # exchange at uniform type mix)
        t = t.filter(pc.is_in(t["event_type"], value_set=_TYPES))
        keys = t["user_id"].to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "t_us": pc.cast(t["ts"], pa.int64()),  # epoch us, integer-exact
                "is_signup": pc.cast(pc.equal(t["event_type"], "signup"), pa.int8()),
                "value": t["value"],
                "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    _RJ_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("n_clicks", pa.int64()), ("sum_value", pa.float64())]
    )

    def range_join(g: pd.DataFrame) -> pa.Table:
        s = g.loc[g["is_signup"] == 1, ["event_id", "user_id", "t_us"]]
        if s.empty:
            return _RJ_SCHEMA.empty_table()
        c = g.loc[g["is_signup"] == 0, ["user_id", "t_us", "value"]].sort_values(
            ["user_id", "t_us"], kind="mergesort"
        )
        if c.empty:
            out = s.sort_values("event_id")
            n = np.zeros(len(out), dtype=np.int64)
            v = np.zeros(len(out), dtype=np.float64)
        else:
            c = c.assign(
                cum_n=c.groupby("user_id").cumcount() + 1,
                cum_v=c.groupby("user_id")["value"].cumsum(),
            ).sort_values("t_us", kind="mergesort")
            probe_cols = c[["user_id", "t_us", "cum_n", "cum_v"]]
            hi = pd.merge_asof(
                s.sort_values("t_us", kind="mergesort"), probe_cols,
                on="t_us", by="user_id", direction="backward",
            )
            lo_keys = s.assign(t_us=s["t_us"] - win_us).sort_values(
                "t_us", kind="mergesort"
            )
            lo = pd.merge_asof(
                lo_keys, probe_cols, on="t_us", by="user_id", direction="backward",
            )
            hi = hi.sort_values("event_id")
            lo = lo.sort_values("event_id")
            n = (
                hi["cum_n"].fillna(0).to_numpy() - lo["cum_n"].fillna(0).to_numpy()
            ).astype(np.int64)
            v = hi["cum_v"].fillna(0.0).to_numpy() - lo["cum_v"].fillna(0.0).to_numpy()
            out = hi
        return pa.table(
            {
                "event_id": pa.array(out["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "n_clicks": pa.array(n, pa.int64()),
                "sum_value": pa.array(np.round(v, 2), pa.float64()),
            },
            schema=_RJ_SCHEMA,
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(range_join, batch_format="pandas")
    )


def events_range_join(sf_dir: str, window_min: int = 60) -> pd.DataFrame:
    out = _events_range_join_ds(sf_dir, window_min).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles of document length (p50/p90/p99/max).

    Quantiles don't decompose, but a VALUE HISTOGRAM does: each batch emits
    (n_chars, count) partials, a tiny groupby sums them, and the exact
    discrete quantile (0-based index ceil(q*n)-1, DuckDB's ``quantile_disc``)
    falls out of the cumulative histogram on the driver — only
    O(distinct lengths) rows ever leave the cluster, never the corpus.
    """
    ds = read_pruned(os.path.join(sf_dir, "documents.parquet"), ["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        vc = t["n_chars"].to_pandas().value_counts()
        return pa.table(
            {
                "n_chars": pa.array(vc.index.to_numpy(), pa.int64()),
                "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_chars")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("n_chars")
    )
    import math

    cum = hist["n"].cumsum().to_numpy()
    vals = hist["n_chars"].to_numpy()
    total = int(cum[-1])

    def q_disc(q: float) -> int:
        idx = math.ceil(q * total) - 1  # 0-based rank, DuckDB quantile_disc
        return int(vals[np.searchsorted(cum, idx + 1)])

    return pd.DataFrame(
        {
            "n_docs": [total],
            "p50": [q_disc(0.5)],
            "p90": [q_disc(0.9)],
            "p99": [q_disc(0.99)],
            "max_chars": [int(vals[-1])],
        }
    )


def brand_nation_profit(sf_dir: str) -> pd.DataFrame:
    """Multi-dimension broadcast star join (TPC-H Q9 shape): lineitem fact x
    part-brand x supplier->nation, revenue per (brand, supplier nation).

    Both dimension sides are small at any scale (parts/suppliers are
    bounded catalogs while lineitem grows): ``ray.put`` each lookup once,
    per-batch dict ``.map`` + groupby combine, then a tiny two-key groupby
    over partials — the fact table never shuffles at full width.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    supp = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    brand_ref = ray.put(dict(zip(part["p_partkey"].to_pylist(), part["p_brand"].to_pylist())))
    snation_ref = ray.put(
        {k: n_name[v] for k, v in zip(supp["s_suppkey"].to_pylist(),
                                      supp["s_nationkey"].to_pylist())}
    )

    ds = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def join_partial(batch: pa.Table) -> pa.Table:
        brand = ray.get(brand_ref)
        snation = ray.get(snation_ref)
        df = batch.to_pandas()
        df["p_brand"] = df["l_partkey"].map(brand)
        df["n_name"] = df["l_suppkey"].map(snation)
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["p_brand", "n_name"], as_index=False).agg(
            revenue=("rev", "sum"), n_lines=("rev", "size")
        )
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(join_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["p_brand", "n_name"])
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_lines", alias_name="n_lines"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(0)
    out["n_lines"] = out["n_lines"].astype("int64")
    return out.sort_values(["p_brand", "n_name"]).reset_index(drop=True)


def revenue_filter_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: filtered scan -> scalar aggregate, with the filter
    pushed INTO the parquet read (row-group stats prune at the source; only
    4 of 11 lineitem columns ever leave storage).  Per-batch partial sums,
    one tiny final combine.
    """
    import datetime

    import pyarrow.dataset as pads

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    flt = (
        (pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=flt,
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(batch["l_extendedprice"], batch["l_discount"]))
        return pa.table(
            {
                "revenue": pa.array([rev.as_py() or 0.0], pa.float64()),
                "n_rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=262144).to_pandas()
    return pd.DataFrame(
        {
            "revenue": [round(float(parts["revenue"].sum()), 0)],
            "n_rows": [int(parts["n_rows"].sum())],
        }
    )


def stratified_sample(sf_dir: str, rates=(("en", 10), ("de", 50))) -> pd.DataFrame:
    """Per-stratum deterministic sampling: different keep-rates per language
    (the training-data mix knob — e.g. downsample the dominant language,
    keep most of a rare one).  Same multiplicative-hash gate as
    ``sample_documents`` so the oracle runs the identical arithmetic; strata
    not named in ``rates`` are dropped.  Map-only, no shuffle, and the same
    rows are kept at any parallelism."""
    rate_map = dict(rates)
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        pcts = np.array([rate_map.get(la, 0) for la in langs], dtype=np.int64)
        mask = (ids * SAMPLE_MULT) % 100 < pcts
        return t.filter(pa.array(mask))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type — the exact-distinct
    shape (the approximate twin is the HLL sketch in ops.text).

    Three-stage, duplicate-heavy-input safe: (1) per-batch drop_duplicates
    combiner (the stream shrinks before the exchange), (2) shuffle on the
    coarse ``user_id % 64`` bucket so each (type, user) pair lands in ONE
    group, dedupe + per-type partial counts vectorized inside the bucket,
    (3) a tiny final Sum over <= 64 x |types| partials.  The full pair set
    never co-locates anywhere.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "user_id"])

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        keys = df["user_id"].to_numpy()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"].tolist(), pa.string()),
                "user_id": pa.array(keys, pa.int64()),
                "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    _PARTIAL = pa.schema([("event_type", pa.string()), ("n", pa.int64())])

    def count_distinct(g: pd.DataFrame) -> pa.Table:
        n = (
            g.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", sort=False)
            .size()
        )
        return pa.Table.from_pandas(
            pd.DataFrame({"event_type": n.index, "n": n.to_numpy()}),
            schema=_PARTIAL, preserve_index=False,
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(count_distinct, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def pagerank_docs(sf_dir: str, n_iter: int = 5, d: float = 0.85) -> pd.DataFrame:
    """PageRank power iteration over a deterministic synthetic link graph —
    the iterative-numeric pattern (link analysis) on Ray Data.

    Graph: every doc links to ((doc_id*31 + s) % n) for s in 1..3 (pure in
    doc_id, so both sides of the oracle build the identical edge set).  Each
    iteration is ONE coarse-bucket shuffle: every rank row emits its three
    d*r/3 contributions keyed by target (plus a zero carrier row for itself,
    so nodes without in-edges survive), a per-batch pandas combine shrinks
    collisions before the exchange, and the in-bucket vectorized sum +
    (1-d)/n base forms the next rank Dataset.  Five iterations chain lazily;
    the driver never holds ranks.  Final ranks round to 9 decimals (the
    oracle unrolls the same 5 iterations in SQL; summation-order noise is
    ~1e-14).
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    n = ds.count()
    base = (1 - d) / n

    ranks = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "rank": pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())}
        ),
        batch_format="pyarrow",
    )

    _RANK_SCHEMA = pa.schema([("doc_id", pa.int64()), ("rank", pa.float64())])

    def contribs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        r = t["rank"].to_numpy()
        share = d * r / 3.0
        node = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)] + [ids])
        val = np.concatenate([share, share, share, np.zeros(len(ids))])
        g = pd.DataFrame({"node": node, "val": val}).groupby("node", as_index=False)[
            "val"
        ].sum()  # per-batch combine before the shuffle
        keys = g["node"].to_numpy()
        return pa.table(
            {
                "node": pa.array(keys, pa.int64()),
                "val": pa.array(g["val"].to_numpy(), pa.float64()),
                "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32()),
            }
        )

    def new_rank(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)["val"].sum()
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": s["node"], "rank": base + s["val"]}),
            schema=_RANK_SCHEMA, preserve_index=False,
        ).replace_schema_metadata(None)

    for _ in range(n_iter):
        ranks = (
            ranks.map_batches(contribs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(new_rank, batch_format="pandas")
        )

    out = ranks.to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("doc_id").reset_index(drop=True)


def personalized_pagerank(sf_dir: str, n_iter: int = 4, d: float = 0.85,
                          seed_mod: int = 97) -> pd.DataFrame:
    """Topic-sensitive (personalized) PageRank: the random surfer teleports
    only to the SEED set (doc_id % seed_mod == 0) instead of uniformly —
    the "crawl relevance from a trusted seed list" verb (Haveliwala 2002 /
    TrustRank), next to the global pagerank_docs.

    Same scale shape as pagerank_docs over the shared hash-derived edge set
    ((doc_id*31+s) % n, s in 1..3): each iteration is ONE coarse-bucket
    shuffle of per-batch-combined d*r/3 contributions plus a zero carrier
    row per node; the personalization base (1-d)/|S| lands vectorized
    inside the bucket group via the node-id predicate, so the driver holds
    only the two scalars n and |S|.  Ranks round to 9 decimals; the oracle
    unrolls the same iterations in SQL with the identical float expressions.
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    n = ds.count()
    # |S| as a distributed count partial (not a contiguity assumption)
    nseeds = int(ds.map_batches(
        lambda t: pa.table({"c": pa.array(
            [int((t["doc_id"].to_numpy() % seed_mod == 0).sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()["c"].sum())
    seed_base = (1 - d) / nseeds
    init = 1.0 / nseeds

    _RANK_SCHEMA = pa.schema([("doc_id", pa.int64()), ("rank", pa.float64())])

    ranks = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "rank": pa.array(
                 np.where(t["doc_id"].to_numpy() % seed_mod == 0, init, 0.0),
                 pa.float64())}),
        batch_format="pyarrow",
    )

    def contribs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        r = t["rank"].to_numpy()
        share = d * r / 3.0
        node = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)] + [ids])
        val = np.concatenate([share, share, share, np.zeros(len(ids))])
        g = (pd.DataFrame({"node": node, "val": val})
             .groupby("node", as_index=False)["val"].sum())
        keys = g["node"].to_numpy()
        return pa.table(
            {"node": pa.array(keys, pa.int64()),
             "val": pa.array(g["val"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    def new_rank(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)["val"].sum()
        node = s["node"].to_numpy()
        base = np.where(node % seed_mod == 0, seed_base, 0.0)
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": node, "rank": base + s["val"].to_numpy()}),
            schema=_RANK_SCHEMA, preserve_index=False,
        ).replace_schema_metadata(None)

    for _ in range(n_iter):
        ranks = (
            ranks.map_batches(contribs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(new_rank, batch_format="pandas")
        )

    out = ranks.to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("doc_id").reset_index(drop=True)


def orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    """BIG x BIG bucketed ANTI-join: orders with no lineitem rows.

    The negative-membership shape (the crawl's seen-set anti-join,
    relationally): neither side broadcasts at 100 TB, so both take ONE
    shuffle on the shared key bucket — the lineitem side first combines to
    per-batch DISTINCT orderkeys (duplicate line rows never enter the
    exchange) — and the in-group vectorized ``isin`` mask keeps orders whose
    key never appears.
    """
    N_BUCKETS = 32
    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])
    lineitem = read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey"])

    _U_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("o_totalprice", pa.float64()), ("bucket", pa.int32())]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
                "o_totalprice": t["o_totalprice"],
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32()),
            },
            schema=_U_SCHEMA,
        )

    def line_keys(t: pa.Table) -> pa.Table:
        keys = np.unique(t["l_orderkey"].to_numpy())  # per-batch combiner
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
                "o_totalprice": pa.array(np.zeros(len(keys)), pa.float64()),
                "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32()),
            },
            schema=_U_SCHEMA,
        )

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("o_totalprice", pa.float64())])

    def anti(g: pd.DataFrame) -> pa.Table:
        have = g.loc[g["side"] == 1, "key"].unique()
        o = g[g["side"] == 0]
        o = o[~o["key"].isin(have)]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"o_orderkey": o["key"].to_numpy(),
                 "o_totalprice": o["o_totalprice"].to_numpy()}
            ),
            schema=_OUT, preserve_index=False,
        ).replace_schema_metadata(None)

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        lineitem.map_batches(line_keys, batch_format="pyarrow")
    )
    out = both.groupby("bucket").map_groups(anti, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def value_quantiles_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped exact quantiles at cent resolution: p50/p90/p99 of the event
    value per event_type.

    The grouped twin of ``doc_length_quantiles``: continuous doubles don't
    histogram, so values are first fixed to integer cents (an EXACT contract,
    not an approximation — the oracle applies the identical rounding), then
    each batch emits (type, cents, n) partials keyed by the coarse
    ``cents % 64`` bucket, one int-key shuffle co-locates each cent's
    partials, a vectorized in-bucket combine collapses them, and the
    per-type discrete quantiles (0-based rank ceil(q*n)-1) fall out of
    cumulative sums over the O(|types| x distinct cents) combined rows —
    the event stream itself never co-locates.  (A direct Ray groupby on
    the composite (type, cents) key measured ~9 s at sf0.1 — the sort
    aggregate pays per-distinct-key overhead on ~10^5 string-keyed groups;
    the bucket shuffle + pandas combine runs the same exchange on one
    int32 key.)
    """
    import math

    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "cents": np.round(t["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "cents"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["bucket"] = (g["cents"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _HIST_SCHEMA = pa.schema(
        [("event_type", pa.string()), ("cents", pa.int64()), ("n", pa.int64())]
    )

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            s, schema=_HIST_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "cents"])
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        cum = g["n"].cumsum().to_numpy()
        vals = g["cents"].to_numpy()
        total = int(cum[-1])

        def q_disc(q: float) -> int:
            return int(vals[np.searchsorted(cum, math.ceil(q * total) - 1 + 1)])

        rows.append(
            {"event_type": etype, "n_events": total,
             "p50_cents": q_disc(0.5), "p90_cents": q_disc(0.9),
             "p99_cents": q_disc(0.99)}
        )
    return pd.DataFrame(rows)


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): leaf totals plus the
    per-priority and grand-total levels — the hierarchical-aggregate shape.

    Only the LEAF aggregation touches the fact table (per-batch combine +
    one tiny groupby, the q1 idiom); the coarser rollup levels re-aggregate
    the leaf PARTIALS on the driver (a frame of |priorities| x |statuses|
    rows), so the rollup costs one shuffle total at any scale.  NULL-label
    convention matches SQL ROLLUP; revenue rounds to 0 decimals.
    """
    ds = read_pruned(
        _t(sf_dir, "orders"), ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["o_orderpriority", "o_orderstatus"])
            .aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        )
        return g.select(
            ["o_orderpriority", "o_orderstatus", "o_totalprice_sum",
             "o_totalprice_count"]
        ).rename_columns(["o_orderpriority", "o_orderstatus", "revenue", "n_orders"])

    from ray.data.aggregate import Sum

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    lvl1 = leaf.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum"), n_orders=("n_orders", "sum")
    )
    lvl1["o_orderstatus"] = None
    total = pd.DataFrame(
        {"o_orderpriority": [None], "o_orderstatus": [None],
         "revenue": [leaf["revenue"].sum()], "n_orders": [leaf["n_orders"].sum()]}
    )
    out = pd.concat(
        [leaf, lvl1[leaf.columns], total[leaf.columns]], ignore_index=True
    )
    out["revenue"] = out["revenue"].round(0)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(
        ["o_orderpriority", "o_orderstatus"], na_position="first"
    ).reset_index(drop=True)


def value_stats_per_type(sf_dir: str) -> pd.DataFrame:
    """Algebraic moments per group: count / sum / sample-stddev of value per
    event_type, from (n, sum, sumsq) partials — the textbook decomposable-
    aggregate shape (everything combines with +, the driver sees |types|
    rows).  Stddev rounds to 4 decimals: the two-pass-free formula and
    DuckDB's streaming algorithm differ only in last-bit accumulation.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(),
             "v": t["value"].to_numpy()}
        )
        df["v2"] = df["v"] * df["v"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    m = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("s2", alias_name="s2"))
        .to_pandas()
    )
    n = m["n"].to_numpy().astype(np.float64)
    s = m["s"].to_numpy()
    s2 = m["s2"].to_numpy()
    var = np.maximum(s2 - s * s / n, 0.0) / np.maximum(n - 1, 1.0)
    return (
        pd.DataFrame(
            {
                "event_type": m["event_type"],
                "n_events": m["n"].astype("int64"),
                "sum_value": np.round(s, 2),
                "stddev_value": np.round(np.sqrt(var), 4),
            }
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def _events_moving_avg_ds(sf_dir: str, frame: int = 3):
    """Per-user moving average of value over the last ``frame`` events
    (ROWS frame-1 PRECEDING) as a DATASET — the window-FRAME shape, on the
    coarse ``user_id % 64`` bucket with one vectorized pandas ``rolling``
    pass per bucket (user boundaries respected via groupby; min_periods=1
    matches SQL's shrinking leading frame).  Rounded to 4 decimals.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "user_id", "ts", "value"])

    _MA_SCHEMA = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("moving_avg", pa.float64())]
    )

    def mavg(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ma = (
            g.groupby("user_id", sort=False)["value"]
            .rolling(frame, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "moving_avg": pa.array(np.round(ma.to_numpy(), 4), pa.float64()),
            },
            schema=_MA_SCHEMA,
        )

    return (
        ds.map_batches(_bucket_by("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mavg, batch_format="pandas")
    )


def events_moving_avg(sf_dir: str, frame: int = 3) -> pd.DataFrame:
    out = _events_moving_avg_ds(sf_dir, frame).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi-join — the broadcast-small-STRUCTURE join pattern
# (a bloom over the build side's keys replaces shuffling probe rows that
# cannot possibly match).  The crawl's seen-set check is this same shape.
# ---------------------------------------------------------------------------

_BLOOM_K = 7  # hash functions; with ~10 bits/key the FP rate is ~0.8%


def _bloom_mix(x: np.ndarray, c1: int, c2: int) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(c1)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(c2)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K) bit positions via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""
    k64 = keys.astype(np.uint64)
    h1 = _bloom_mix(k64, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
    h2 = _bloom_mix(k64, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def orders_with_lineitems_bloom(sf_dir: str) -> pd.DataFrame:
    """Semi-join (orders that HAVE lineitem rows) with a bloom-filter
    prefilter on the probe side — exact output (the bloom only PRUNES;
    candidates are verified in the same bucketed exchange the anti-join
    uses, so false positives cannot leak).

    Scale shape: the build side streams per-block bloom PARTIALS (constant
    m/8 bytes each, OR-merged on the driver — the HLL-register idiom, never
    the keys themselves); the merged filter ships once via ``ray.put`` and
    every probe batch tests membership vectorized.  Probe rows that cannot
    match never enter the verify exchange — on mostly-non-matching probes
    (the crawl seen-set shape) that is almost the whole probe side; here
    (TPC-H-ish, ~98% of orders match) the bloom documents the pattern while
    the bucketed verify carries the correctness.  m scales with the build
    side's distinct keys (10 bits/key); past ~10^10 keys you shard the
    filter by key range — documented assumption, not implemented.
    """
    import pyarrow.parquet as _pqm

    import ray as _ray

    N_BUCKETS = 32
    n_build = _pqm.ParquetFile(_t(sf_dir, "lineitem")).metadata.num_rows
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n_build) * 10))))

    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])
    lineitem = read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey"])

    def bloom_partial(t: pa.Table) -> pa.Table:
        keys = np.unique(t["l_orderkey"].to_numpy())
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _bloom_positions(keys, m_bits).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = lineitem.map_batches(
        bloom_partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for blob in parts["bits"]:
        merged |= np.frombuffer(blob, dtype=np.uint8)
    bloom_ref = _ray.put(merged)

    _U_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("o_totalprice", pa.float64()), ("bucket", pa.int32())]
    )

    def probe_rows(t: pa.Table) -> pa.Table:
        bits = _ray.get(bloom_ref)
        keys = t["o_orderkey"].to_numpy()
        pos = _bloom_positions(keys, m_bits)
        hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        keys = keys[hit]
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "o_totalprice": pa.array(
                 t["o_totalprice"].to_numpy()[hit], pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_U_SCHEMA,
        )

    def line_keys(t: pa.Table) -> pa.Table:
        keys = np.unique(t["l_orderkey"].to_numpy())
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "o_totalprice": pa.array(np.zeros(len(keys)), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_U_SCHEMA,
        )

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("o_totalprice", pa.float64())])

    def semi(g: pd.DataFrame) -> pa.Table:
        have = g.loc[g["side"] == 1, "key"].unique()
        o = g[g["side"] == 0]
        o = o[o["key"].isin(have)]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"o_orderkey": o["key"].to_numpy(),
                 "o_totalprice": o["o_totalprice"].to_numpy()}
            ),
            schema=_OUT, preserve_index=False,
        ).replace_schema_metadata(None)

    both = orders.map_batches(probe_rows, batch_format="pyarrow").union(
        lineitem.map_batches(line_keys, batch_format="pyarrow")
    )
    out = both.groupby("bucket").map_groups(semi, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def events_funnel(sf_dir: str, window_hours: int = 24,
                  stages: tuple = ("signup", "purchase", "click")) -> pd.DataFrame:
    """(stage, event_type, n_users) — windowed conversion funnel
    signup -> purchase -> click: a user converts stage s+1 only with an
    event STRICTLY after their stage-s time and within ``window_hours`` of
    it; each stage time is the user's EARLIEST qualifying event.  The
    sequential-pattern shape the window family (lag/sessions/as-of) lacks.

    Scale shape: rows are pre-filtered to the three funnel types and
    narrowed to (user_id, event_type, ts) BEFORE the one user-bucket
    all-to-all (per-user logic is bucket-local); each group resolves its
    users' cascade with three vectorized merge+min passes and emits ONE
    3-row count partial; the driver sums |buckets| x 3 rows.
    """
    N_BUCKETS = 64
    STAGES = tuple(stages)
    ev = read_pruned(_t(sf_dir, "events"), ["user_id", "event_type", "ts"])
    stage_arr = pa.array(STAGES, pa.string())

    def rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=stage_arr))
        u = t["user_id"].to_numpy()
        return pa.table(
            {"user_id": t["user_id"], "event_type": t["event_type"],
             "ts": t["ts"],
             "bucket": pa.array((u % N_BUCKETS).astype(np.int32), pa.int32())}
        )

    _OUT = pa.schema(
        [("stage", pa.int64()), ("event_type", pa.string()),
         ("n_users", pa.int64())]
    )

    def funnel_group(g: pd.DataFrame) -> pa.Table:
        w = np.timedelta64(window_hours * 3600 * 1_000_000, "us")
        prev = (g[g["event_type"] == STAGES[0]]
                .groupby("user_id", as_index=False)["ts"].min()
                .rename(columns={"ts": "tprev"}))
        counts = [len(prev)]
        for st in STAGES[1:]:
            s = g[g["event_type"] == st].merge(prev, on="user_id")
            s = s[(s["ts"] > s["tprev"]) & (s["ts"] <= s["tprev"] + w)]
            prev = (s.groupby("user_id", as_index=False)["ts"].min()
                    .rename(columns={"ts": "tprev"}))
            counts.append(len(prev))
        return pa.table(
            {"stage": pa.array(range(1, len(STAGES) + 1), pa.int64()),
             "event_type": pa.array(list(STAGES), pa.string()),
             "n_users": pa.array(counts, pa.int64())},
            schema=_OUT,
        )

    parts = (
        ev.map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel_group, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["stage", "event_type"], as_index=False)["n_users"].sum()
    return out.sort_values("stage").reset_index(drop=True)


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#13") -> pd.DataFrame:
    """(n_rows, sum_cents) — TPC-H Q17 shape: revenue from small-quantity
    orders of one brand's parts, where "small" is each part's own 0.2×avg
    quantity — the classic CORRELATED-subquery pattern, decorrelated into a
    pre-aggregate + rejoin.

    Scale shape: the brand's partkeys broadcast once (``ray.put``, the
    small-dimension side); pass 1 computes per-part (sum_qty, cnt) partials
    over only the matching lineitems (per-batch Arrow ``group_by`` combine,
    tiny final groupby); the resulting per-part thresholds broadcast back
    (bounded by the brand's part count, 1/25 of parts); pass 2 filters
    ``l_quantity < thr[pk]`` vectorized and reduces count + cents partials.
    No lineitem all-to-all at any point.  The threshold is the same IEEE
    double expression (0.2 * (sum/cnt)) the oracle's ``0.2*avg`` computes —
    quantities are integral so the sums are exact in any order — and
    revenue is summed in exact integer cents.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = part.filter(pc.equal(part["p_brand"], brand))["p_partkey"].combine_chunks()
    keys_ref = ray.put(keys)

    li = read_pruned(_t(sf_dir, "lineitem"),
                     ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_in(t["l_partkey"], value_set=ray.get(keys_ref)))
        g = sel.group_by("l_partkey").aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")])
        return g.rename_columns(["l_partkey", "sum_qty", "cnt"])

    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(qty_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    thr = 0.2 * (agg["sum_qty"].to_numpy() / agg["cnt"].to_numpy())
    thr_ref = ray.put(
        (pa.array(agg["l_partkey"].to_numpy(), pa.int64()),
         pa.array(thr, pa.float64()))
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        pk, th = ray.get(thr_ref)
        idx = pc.index_in(t["l_partkey"], value_set=pk)
        row_thr = pc.take(th, idx)  # null where part not in the brand
        keep = pc.less(t["l_quantity"], row_thr)  # null-safe: null -> null -> dropped
        sel = t.filter(pc.fill_null(keep, False))
        cents = np.round(sel["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"n_rows": pa.array([len(sel)], pa.int64()),
             "sum_cents": pa.array([int(cents.sum())], pa.int64())}
        )

    parts = li.map_batches(rev_partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    return pd.DataFrame(
        {"n_rows": [int(parts["n_rows"].sum())],
         "sum_cents": [int(parts["sum_cents"].sum())]}
    )


def hits_docs(sf_dir: str, n_iter: int = 3) -> pd.DataFrame:
    """(doc_id, hub, authority) — HITS (Kleinberg 1999) over the same
    hash-derived link graph as :func:`pagerank_docs`, L1-normalized each
    half-step.  The new distributed shape vs PageRank: each half-iteration
    needs a GLOBAL normalizer, computed as a Dataset scalar reduce and
    folded into the next lazy map — the per-iteration all-reduce pattern of
    iterative ML, with no driver-held vectors.

    Per iteration: the authority step is one coarse-bucket shuffle of hub
    contributions (per-batch combine first, zero carriers keep isolated
    nodes alive); the hub step gathers each node's three targets' authority
    via value+request rows meeting in one bucket shuffle (the repo's attach
    idiom), then a second narrow shuffle sums per source.  Scores round to
    9 decimals (the oracle unrolls the same iterations in SQL;
    summation-order noise is ~1e-15).
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    n = ds.count()

    state = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "val": pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())}
        ),
        batch_format="pyarrow",
    )

    _V_SCHEMA = pa.schema([("doc_id", pa.int64()), ("val", pa.float64())])
    _R_SCHEMA = pa.schema(
        [("key", pa.int64()), ("src", pa.int64()), ("val", pa.float64()),
         ("bucket", pa.int32())]
    )

    def contribs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        v = t["val"].to_numpy()
        node = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)] + [ids])
        val = np.concatenate([v, v, v, np.zeros(len(ids))])
        g = pd.DataFrame({"node": node, "val": val}).groupby(
            "node", as_index=False)["val"].sum()
        keys = g["node"].to_numpy()
        return pa.table(
            {"node": pa.array(keys, pa.int64()),
             "val": pa.array(g["val"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32())}
        )

    def bucket_sum(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)["val"].sum()
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": s["node"], "val": s["val"]}),
            schema=_V_SCHEMA, preserve_index=False,
        ).replace_schema_metadata(None)

    def normalized(dset):
        dset = dset.materialize()          # consumed twice: reduce + divide
        total = dset.sum("val")
        return dset.map_batches(
            lambda t, tot=total: pa.table(
                {"doc_id": t["doc_id"],
                 "val": pc.divide(t["val"], pa.scalar(tot, pa.float64()))}
            ),
            batch_format="pyarrow",
        )

    def attach_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        v = t["val"].to_numpy()
        key = np.concatenate([ids] + [(ids * 31 + s) % n for s in (1, 2, 3)])
        src = np.concatenate([np.full(len(ids), -1)] + [ids] * 3)
        val = np.concatenate([v, np.zeros(3 * len(ids))])
        return pa.table(
            {"key": pa.array(key, pa.int64()),
             "src": pa.array(src, pa.int64()),
             "val": pa.array(val, pa.float64()),
             "bucket": pa.array((key % N_KEY_BUCKETS).astype(np.int32), pa.int32())},
            schema=_R_SCHEMA,
        )

    def attach_group(g: pd.DataFrame) -> pa.Table:
        vals = g[g["src"] < 0][["key", "val"]].rename(columns={"val": "a"})
        reqs = g[g["src"] >= 0][["key", "src"]].merge(vals, on="key")
        agg = reqs.groupby("src", as_index=False)["a"].sum()  # in-bucket combine
        keys = agg["src"].to_numpy()
        return pa.table(
            {"node": pa.array(keys, pa.int64()),
             "val": pa.array(agg["a"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32), pa.int32())}
        )

    auth = None
    for _ in range(n_iter):
        auth = normalized(
            state.map_batches(contribs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_sum, batch_format="pandas")
        )
        auth = auth.materialize()          # feeds both the hub step and output
        state = normalized(
            auth.map_batches(attach_rows, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(attach_group, batch_format="pandas")
            .groupby("bucket")
            .map_groups(bucket_sum, batch_format="pandas")
        )

    h = state.to_pandas().rename(columns={"val": "hub"})
    a = auth.to_pandas().rename(columns={"val": "authority"})
    out = h.merge(a, on="doc_id")
    out["hub"] = out["hub"].round(9)
    out["authority"] = out["authority"].round(9)
    return out.sort_values("doc_id").reset_index(drop=True)


def sole_return_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_suppkey, s_name, numwait) — the TPC-H Q21 decorrelation SHAPE
    (correlated EXISTS + NOT EXISTS against the same fact table) adapted to
    this schema: for each supplier, count the MULTI-supplier orders on
    which it was the ONLY supplier with a returned ('R') line.

    Scale shape: ONE orderkey-bucket all-to-all of narrow rows — each batch
    first combines to DISTINCT (orderkey, suppkey, any_R) triples so
    duplicate line rows never enter the exchange; the in-group resolution
    (distinct suppliers per order > 1, distinct R-suppliers == 1) is
    vectorized pandas; groups emit per-supplier partial counts, which
    reduce to a supplier-sized table on the driver before the broadcast
    name attach (supplier is the small side everywhere in this repo —
    mktsegment_revenue's trade).  Both EXISTS subqueries of the SQL form
    collapse into per-order aggregates: the decorrelation a distributed
    engine must do, since correlated per-row re-scans of a 100 TB fact
    table are not a plan.
    """
    N_BUCKETS = 64
    li = read_pruned(_t(sf_dir, "lineitem"),
                     ["l_orderkey", "l_suppkey", "l_returnflag"])

    _ROW = pa.schema([("key", pa.int64()), ("skey", pa.int64()),
                      ("r", pa.int8()), ("bucket", pa.int32())])

    def distinct_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": t["l_orderkey"].to_numpy(),
            "skey": t["l_suppkey"].to_numpy(),
            "r": pc.equal(t["l_returnflag"], "R").to_numpy(
                zero_copy_only=False).astype(np.int8),
        })
        g = df.groupby(["key", "skey"], as_index=False)["r"].max()
        return pa.Table.from_pandas(
            g.assign(bucket=(g["key"].to_numpy() % N_BUCKETS).astype(np.int32)),
            schema=_ROW, preserve_index=False,
        ).replace_schema_metadata(None)

    _PART = pa.schema([("skey", pa.int64()), ("n", pa.int64())])

    def resolve(g: pd.DataFrame) -> pa.Table:
        # batch partials may split an order: re-combine, then resolve
        gg = g.groupby(["key", "skey"], as_index=False)["r"].max()
        per_order = gg.groupby("key").agg(n_supp=("skey", "size"),
                                          n_r=("r", "sum"))
        ok = per_order[(per_order["n_supp"] > 1) & (per_order["n_r"] == 1)]
        hits = gg[(gg["r"] == 1) & gg["key"].isin(ok.index)]
        cnt = hits.groupby("skey", as_index=False).size()
        return pa.Table.from_pandas(
            pd.DataFrame({"skey": cnt["skey"].to_numpy(dtype=np.int64),
                          "n": cnt["size"].to_numpy(dtype=np.int64)}),
            schema=_PART, preserve_index=False,
        ).replace_schema_metadata(None)

    parts = (
        li.map_batches(distinct_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("skey", as_index=False)["n"].sum()
    sup = read_pruned(_t(sf_dir, "supplier"),
                      ["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(sup, left_on="skey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "n"]].rename(columns={"n": "numwait"})
    return (out.sort_values("s_suppkey").reset_index(drop=True)
            .astype({"s_suppkey": "int64", "numwait": "int64"}))


def triangle_count(sf_dir: str) -> pd.DataFrame:
    """(n_nodes, n_edges, n_triangles) — triangle counting on the synthetic
    doc link graph (the same pure-in-doc_id edge set PageRank/HITS iterate:
    doc -> (doc*31+s) % n, s in 1..3, undirected + deduped).  The classic
    graph statistic (clustering-coefficient numerator) as a two-round
    wedge-check: every triangle is counted once per apex, so n_triangles =
    closed_wedges / 3 — exact integers throughout.

    Scale shape: shuffle 1 groups edges by incident node (both directions,
    narrow int pairs) and emits each node's wedge rows (neighbor pairs,
    canonicalized v<w) keyed by the CLOSING edge's bucket, with a per-group
    combine; shuffle 2 co-locates wedges with the edge set and counts
    matches vectorized (pandas merge per bucket).  Constant-size count
    partials reduce on the driver.  On skewed graphs the standard
    refinement is degree-orientation (wedges only from each edge's
    lower-(degree, id) endpoint, bounding wedge work by arboricity) — this
    graph is degree-bounded (~6) by construction, so the simpler apex form
    is the honest choice; the note is the partitioning assumption.
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    N_BUCKETS = 64

    _E = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("bucket", pa.int32())])

    def edge_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        a = np.concatenate([ids, ids, ids])
        b = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)])
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        df = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
        # both directions so the next groupby sees full adjacency per node
        u = np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])
        v = np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()])
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "bucket": pa.array((u % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_E)

    _W = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    ("side", pa.int8()), ("wbucket", pa.int32())])

    def wedges(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["u", "v"]).sort_values(["u", "v"])
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        # per-node neighbor runs (u-sorted): all C(deg,2) neighbor pairs
        _, starts, counts = np.unique(u, return_index=True, return_counts=True)
        pa_list, pb_list = [], []
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            nb = v[s:s + c]
            ii, jj = np.triu_indices(c, 1)
            pa_list.append(nb[ii])
            pb_list.append(nb[jj])
        if pa_list:
            wa = np.concatenate(pa_list)
            wb = np.concatenate(pb_list)
            lo, hi = np.minimum(wa, wb), np.maximum(wa, wb)
        else:
            lo = hi = np.zeros(0, np.int64)
        # wedge rows (side 0) + this bucket's canonical edges (side 1)
        half = g[g["u"] < g["v"]]
        ea, eb = half["u"].to_numpy(), half["v"].to_numpy()
        a = np.concatenate([lo, ea])
        b = np.concatenate([hi, eb])
        side = np.concatenate([np.zeros(len(lo), np.int8),
                               np.ones(len(ea), np.int8)])
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
             "side": pa.array(side, pa.int8()),
             "wbucket": pa.array(((a * 1000003 + b) % N_BUCKETS).astype(np.int32),
                                 pa.int32())},
            schema=_W)

    _C = pa.schema([("closed", pa.int64())])

    def close(g: pd.DataFrame) -> pa.Table:
        e = g[g["side"] == 1][["a", "b"]].drop_duplicates()
        w = g[g["side"] == 0]
        m = w.merge(e, on=["a", "b"], how="inner")
        return pa.table({"closed": pa.array([len(m)], pa.int64())}, schema=_C)

    closed = (
        ds.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .groupby("wbucket")
        .map_groups(close, batch_format="pandas")
        .to_pandas()["closed"].sum()
    )
    # exact edge count: a canonical (u<v) pair is counted only in bucket
    # u % N_BUCKETS, deduped IN-GROUP (mutual links a->b, b->a generate the
    # same canonical pair from two source docs — per-batch dedup alone
    # would double-count across batches)
    def count_edges(g: pd.DataFrame) -> pa.Table:
        half = g[g["u"] < g["v"]].drop_duplicates(["u", "v"])
        return pa.table({"n": pa.array([len(half)], pa.int64())})

    edges = (
        ds.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_edges, batch_format="pandas")
        .to_pandas()["n"].sum()
    )
    return pd.DataFrame({"n_nodes": [int(n)], "n_edges": [int(edges)],
                         "n_triangles": [int(closed) // 3]})


def min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """(p_partkey, s_suppkey, s_name, min_cents) — the TPC-H Q2 SHAPE
    (correlated MIN subquery + join-back to the row achieving it) adapted
    to this schema: for every part, the cheapest lineitem price ever
    charged (exact integer cents) and the supplier who charged it, ties
    broken to the smallest s_suppkey on both sides.

    Scale shape: the argmin DECORRELATION — one partkey-bucket all-to-all
    of per-batch argmin partials.  Each batch first resolves its own
    (part -> min cents, min suppkey among achievers) so only one narrow
    row per (part, batch) enters the exchange; the in-group resolution
    re-applies the same two-level rule (global min cents, then min suppkey
    among partial rows AT that min — correct because any batch containing
    a global-min line emits a partial at exactly that cents value).  The
    supplier name attach is a driver-side merge against the small
    dimension table (mktsegment_revenue's trade); output is part-sized.
    Ref parity: the reference's per-key "best row" selections are in-UDF
    sorts (SURVEY §2 O1-O4); this is the distributed form.
    """
    N_BUCKETS = 64
    li = read_pruned(_t(sf_dir, "lineitem"),
                     ["l_partkey", "l_suppkey", "l_extendedprice"])

    _ROW = pa.schema([("pk", pa.int64()), ("cents", pa.int64()),
                      ("sk", pa.int64()), ("bucket", pa.int32())])

    def _argmin(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("pk")["cents"].transform("min")
        best = (df[df["cents"] == m]
                .groupby("pk", as_index=False)
                .agg(cents=("cents", "first"), sk=("sk", "min")))
        return best

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": t["l_partkey"].to_numpy(),
            "cents": np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64),
            "sk": t["l_suppkey"].to_numpy(),
        })
        best = _argmin(df)
        return pa.Table.from_pandas(
            best.assign(bucket=(best["pk"].to_numpy() % N_BUCKETS).astype(np.int32)),
            schema=_ROW, preserve_index=False,
        ).replace_schema_metadata(None)

    _OUT = pa.schema([("pk", pa.int64()), ("cents", pa.int64()), ("sk", pa.int64())])

    def resolve(g: pd.DataFrame) -> pa.Table:
        best = _argmin(g[["pk", "cents", "sk"]])
        return pa.Table.from_pandas(
            best[["pk", "cents", "sk"]], schema=_OUT, preserve_index=False,
        ).replace_schema_metadata(None)

    won = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    sup = read_pruned(_t(sf_dir, "supplier"), ["s_suppkey", "s_name"]).to_pandas()
    out = won.merge(sup, left_on="sk", right_on="s_suppkey")
    out = out.rename(columns={"pk": "p_partkey", "cents": "min_cents"})
    out = out[["p_partkey", "s_suppkey", "s_name", "min_cents"]]
    return (out.sort_values("p_partkey").reset_index(drop=True)
            .astype({"p_partkey": "int64", "s_suppkey": "int64",
                     "min_cents": "int64"}))


def degree_distribution(sf_dir: str) -> pd.DataFrame:
    """(in_degree, n_nodes) — in-degree histogram of a synthetic doc link
    graph.  The base edges are the pure-in-doc_id set PageRank/HITS/
    triangle_count share (doc -> (doc*31+s) % n, s in 1..3 — a bijection
    per s, so alone they'd give everyone in-degree 3); a fourth QUADRATIC
    edge doc -> (doc*doc + 1) % n lands on quadratic residues only, giving
    the skewed histogram a real web graph shows.  Self-loops dropped.  The
    first thing anyone plots about a crawled web graph.

    Scale shape: one coarse node-bucket all-to-all of per-batch in-degree
    partials (zero carrier rows keep sink-less nodes in the histogram —
    the pagerank idiom); each bucket resolves exact per-node degrees
    vectorized and emits only its BOUNDED (in_degree, count) histogram
    partial; the driver reduce is histogram-sized.
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    N_BUCKETS = 64

    _ROW = pa.schema([("node", pa.int64()), ("c", pa.int64()),
                      ("bucket", pa.int32())])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        src = np.concatenate([ids, ids, ids, ids])
        dst = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)]
                             + [(ids * ids + 1) % n])
        dst = dst[src != dst]
        node, cnt = np.unique(dst, return_counts=True)
        node = np.concatenate([node, ids])                  # zero carriers
        cnt = np.concatenate([cnt.astype(np.int64), np.zeros(len(ids), np.int64)])
        return pa.table(
            {"node": pa.array(node, pa.int64()), "c": pa.array(cnt, pa.int64()),
             "bucket": pa.array((node % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    _H = pa.schema([("in_degree", pa.int64()), ("n_nodes", pa.int64())])

    def hist(g: pd.DataFrame) -> pa.Table:
        per_node = g.groupby("node")["c"].sum()
        deg, cnt = np.unique(per_node.to_numpy(), return_counts=True)
        return pa.table(
            {"in_degree": pa.array(deg, pa.int64()),
             "n_nodes": pa.array(cnt.astype(np.int64), pa.int64())}, schema=_H)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(hist, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("in_degree", as_index=False)["n_nodes"].sum()
    return (out.sort_values("in_degree").reset_index(drop=True)
            .astype({"in_degree": "int64", "n_nodes": "int64"}))


def parts_abc_classification(sf_dir: str) -> pd.DataFrame:
    """(abc_class, n_parts, revenue_cents) — Pareto/ABC inventory analysis:
    parts ranked by revenue (desc, partkey tiebreak), class A while the
    INCLUSIVE cumulative share is <= 80% of total, B to 95%, else C — all
    integer-exact (``cum*100 <= total*80`` compares, no float shares).

    Scale shape: the global cumulative-over-a-sort WITHOUT a global sort —
    the events_global_seq two-phase prefix idiom on an ordered RANGE key:
    (1) per-part revenue via per-batch combine + one part-bucket exchange;
    (2) each part lands in the monotone range bucket ``rev // 2^20`` (equal
    revenues share a bucket, so in-bucket (rev desc, p) ordering is
    globally consistent); per-bucket revenue sums give the driver a
    bounded frame whose DESCENDING exclusive prefix is each bucket's
    cumulative offset; (3) one rb-keyed exchange: each group sorts its own
    rows, adds its offset, labels vectorized, and emits <= 3 class
    partials.  ``cum*100`` stays inside int64 to ~9e16 total cents.
    """
    RB_SHIFT = 20
    ds = read_pruned(_t(sf_dir, "lineitem"), ["l_partkey", "l_extendedprice"])

    _R = pa.schema([("p", pa.int64()), ("r", pa.int64()),
                    ("bucket", pa.int32())])

    def rev_partial(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy()
        cents = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"p": p, "r": cents}).groupby("p", as_index=False)[
            "r"].sum()
        keys = g["p"].to_numpy()
        return pa.table(
            {"p": pa.array(keys, pa.int64()),
             "r": pa.array(g["r"].to_numpy(), pa.int64()),
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())}, schema=_R)

    _REV = pa.schema([("p", pa.int64()), ("r", pa.int64()),
                      ("rb", pa.int64())])

    def fold_rev(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("p", as_index=False)["r"].sum()
        r = s["r"].to_numpy()
        return pa.table(
            {"p": pa.array(s["p"].to_numpy(), pa.int64()),
             "r": pa.array(r, pa.int64()),
             "rb": pa.array(r >> RB_SHIFT, pa.int64())}, schema=_REV)

    rev = (ds.map_batches(rev_partial, batch_format="pyarrow",
                          batch_size=262144)
           .groupby("bucket").map_groups(fold_rev, batch_format="pandas")
           .materialize())

    def rb_sums(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"rb": t["rb"].to_numpy(),
                          "r": t["r"].to_numpy()}).groupby(
            "rb", as_index=False)["r"].sum()
        return pa.Table.from_pandas(g, preserve_index=False
                                    ).replace_schema_metadata(None)

    frame = (rev.map_batches(rb_sums, batch_format="pyarrow").to_pandas()
             .groupby("rb", as_index=False)["r"].sum()
             .sort_values("rb", ascending=False))
    total = int(frame["r"].sum())
    offs = dict(zip(frame["rb"].to_numpy(),
                    np.concatenate([[0], frame["r"].cumsum().to_numpy()[:-1]])))

    _S = pa.schema([("abc_class", pa.string()), ("n_parts", pa.int64()),
                    ("revenue_cents", pa.int64())])

    def label_group(g: pd.DataFrame) -> pa.Table:
        gs = g.sort_values(["r", "p"], ascending=[False, True],
                           kind="mergesort")
        base = int(offs[int(gs["rb"].iloc[0])])
        cum = base + gs["r"].cumsum().to_numpy()
        cls = np.where(cum * 100 <= total * 80, "A",
                       np.where(cum * 100 <= total * 95, "B", "C"))
        out = (pd.DataFrame({"abc_class": cls, "r": gs["r"].to_numpy()})
               .groupby("abc_class", as_index=False)
               .agg(n_parts=("r", "size"), revenue_cents=("r", "sum")))
        return pa.Table.from_pandas(out, schema=_S, preserve_index=False
                                    ).replace_schema_metadata(None)

    parts = (rev.groupby("rb").map_groups(label_group, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("abc_class", as_index=False)[
        ["n_parts", "revenue_cents"]].sum().sort_values("abc_class"))
    return (out.reset_index(drop=True)
            .astype({"n_parts": "int64", "revenue_cents": "int64"}))


_FK_EDGES = [
    # (fk_name, child_table, child_col, parent_table, parent_col, broadcast)
    ("customer.c_nationkey", "customer", "c_nationkey", "nation",
     "n_nationkey", True),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders",
     "o_orderkey", False),
    ("lineitem.l_partkey", "lineitem", "l_partkey", "part",
     "p_partkey", False),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier",
     "s_suppkey", False),
    ("nation.n_regionkey", "nation", "n_regionkey", "region",
     "r_regionkey", True),
    ("orders.o_custkey", "orders", "o_custkey", "customer",
     "c_custkey", False),
    ("supplier.s_nationkey", "supplier", "s_nationkey", "nation",
     "n_nationkey", True),
]


def fk_integrity_report(sf_dir: str) -> pd.DataFrame:
    """(fk_name, n_child, n_orphans) — referential-integrity audit of every
    foreign-key edge in the star schema: child rows whose key has no parent
    (the data-quality gate a lakehouse runs after every load, and the crawl
    engine's seen-set anti-join expressed as a schema-wide report).

    Scale shape: per edge, (a) TINY parents (nation/region) broadcast via
    ``ray.put`` of the key array — the child side is a map-only masked
    count; (b) big parents take ONE shared key-bucket all-to-all — the
    child ships (key, cnt) per-batch-combined partials, the parent ships
    marker keys, each group counts unmatched child rows vectorized.  The
    driver folds |edges| x |buckets| count rows; no table is collected.
    """
    N_BUCKETS = 32
    rows = []
    for fk_name, ct, cc, pt, pc_, broadcast in _FK_EDGES:
        child = read_pruned(_t(sf_dir, ct), [cc])
        if broadcast:
            import pyarrow.parquet as _pq

            pkeys = ray.put(
                _pq.read_table(_t(sf_dir, pt), columns=[pc_])[pc_]
                .combine_chunks())

            def check(t: pa.Table, cc=cc, pkeys=pkeys) -> pa.Table:
                keys = ray.get(pkeys)
                miss = pc.is_null(pc.index_in(t[cc], value_set=keys))
                return pa.table(
                    {"n_child": pa.array([t.num_rows], pa.int64()),
                     "n_orphans": pa.array(
                         [int(pc.sum(pc.cast(miss, pa.int64())).as_py() or 0)],
                         pa.int64())})

            parts = child.map_batches(check, batch_format="pyarrow",
                                      batch_size=262144).to_pandas()
        else:
            parent = read_pruned(_t(sf_dir, pt), [pc_])

            _R = pa.schema([("key", pa.int64()), ("cnt", pa.int64()),
                            ("is_parent", pa.int8()), ("bucket", pa.int32())])

            def child_rows(t: pa.Table, cc=cc) -> pa.Table:
                k, c = np.unique(t[cc].to_numpy(), return_counts=True)
                return pa.table(
                    {"key": pa.array(k, pa.int64()),
                     "cnt": pa.array(c.astype(np.int64), pa.int64()),
                     "is_parent": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                     "bucket": pa.array((k % N_BUCKETS).astype(np.int32),
                                        pa.int32())}, schema=_R)

            def parent_rows(t: pa.Table, pc_=pc_) -> pa.Table:
                k = np.unique(t[pc_].to_numpy())
                return pa.table(
                    {"key": pa.array(k, pa.int64()),
                     "cnt": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                     "is_parent": pa.array(np.ones(len(k), np.int8), pa.int8()),
                     "bucket": pa.array((k % N_BUCKETS).astype(np.int32),
                                        pa.int32())}, schema=_R)

            def count_orphans(g: pd.DataFrame) -> pa.Table:
                pk = set(g.loc[g["is_parent"] == 1, "key"].to_numpy())
                ch = g[g["is_parent"] == 0]
                miss = ~ch["key"].isin(pk)
                return pa.table(
                    {"n_child": pa.array([int(ch["cnt"].sum())], pa.int64()),
                     "n_orphans": pa.array(
                         [int(ch.loc[miss, "cnt"].sum())], pa.int64())})

            parts = (child.map_batches(child_rows, batch_format="pyarrow",
                                       batch_size=262144)
                     .union(parent.map_batches(parent_rows,
                                               batch_format="pyarrow",
                                               batch_size=262144))
                     .groupby("bucket")
                     .map_groups(count_orphans, batch_format="pandas")
                     .to_pandas())
        rows.append({"fk_name": fk_name,
                     "n_child": int(parts["n_child"].sum()),
                     "n_orphans": int(parts["n_orphans"].sum())})
    out = pd.DataFrame(rows).astype({"n_child": "int64", "n_orphans": "int64"})
    return out.sort_values("fk_name").reset_index(drop=True)


def value_mode_per_type(sf_dir: str) -> pd.DataFrame:
    """(event_type, mode_cents, n_occurrences) — the exact statistical MODE
    of the cent-quantized value per event type, ties broken to the LOWEST
    value (a total order, unlike SQL ``mode()``'s unspecified tie).  The
    most-common-value statistic a catalog/profiler collects next to
    min/max/ndv (catalog_stats_collect).

    Scale shape: per-batch (type, cents) count partials (bounded by
    distinct cents per batch) -> ONE type-keyed groupby; each group folds
    partials vectorized and emits one (mode, count) row.  The driver sees
    |types| rows.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "value"])

    _P = pa.schema([("event_type", pa.string()), ("cents", pa.int64()),
                    ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "cents": np.round(t["value"].to_numpy() * 100).astype(np.int64)})
        g = (df.groupby(["event_type", "cents"], sort=False)
             .size().reset_index(name="c"))
        return pa.Table.from_pandas(g, schema=_P, preserve_index=False
                                    ).replace_schema_metadata(None)

    _S = pa.schema([("event_type", pa.string()), ("mode_cents", pa.int64()),
                    ("n_occurrences", pa.int64())])

    def mode_group(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("cents")["c"].sum()
        best = s.sort_index().idxmax()  # idxmax on sorted index = lowest tie
        return pa.table(
            {"event_type": pa.array([g["event_type"].iloc[0]], pa.string()),
             "mode_cents": pa.array([int(best)], pa.int64()),
             "n_occurrences": pa.array([int(s[best])], pa.int64())}, schema=_S)

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
           .groupby("event_type")
           .map_groups(mode_group, batch_format="pandas").to_pandas())
    return out.sort_values("event_type").reset_index(drop=True)


def events_percent_rank(sf_dir: str) -> pd.DataFrame:
    """(event_id, event_type, pct) — SQL PERCENT_RANK() per event within
    its type partition ordered by value: (min_rank - 1) / (n_part - 1),
    ties sharing the min rank.  The relative-standing window verb next to
    the deciles/quantiles family — per-ROW output, not a summary.

    Scale shape: ONE event_type-keyed all-to-all (the window partition IS
    the shuffle key); each group ranks vectorized (pandas min-rank over
    the value column) and emits its rows.  Both sides compute the same
    small-int division in IEEE double, so the floats are bit-identical.
    The driver collect here is the QUERY wrapper; the smoke consumes the
    Dataset form (_events_percent_rank_ds) as a streaming count.
    """
    out = _events_percent_rank_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _events_percent_rank_ds(sf_dir: str):
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "event_type", "value"])

    _S = pa.schema([("event_id", pa.int64()), ("event_type", pa.string()),
                    ("pct", pa.float64())])

    def rank_group(g: pd.DataFrame) -> pa.Table:
        n = len(g)
        r = g["value"].rank(method="min").to_numpy()
        pct = (r - 1.0) / (n - 1.0) if n > 1 else np.zeros(n)
        return pa.table(
            {"event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
             "event_type": pa.array(g["event_type"].to_numpy(), pa.string()),
             "pct": pa.array(pct, pa.float64())}, schema=_S)

    return ds.groupby("event_type").map_groups(rank_group,
                                               batch_format="pandas")


def orders_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """(status, n_rows, sum_cents) — CDC-style reconciliation between two
    snapshots of orders: the base table vs a deterministically perturbed
    twin (orderkey%41==0 rows deleted, %37==0 get totalprice+1.00, 100
    rows with negative keys inserted at 1000.50).  Statuses:
    unchanged / updated / deleted / inserted, with exact integer row
    counts and cent sums of the NEW side (old side for deletes) — the
    snapshot-diff audit a lakehouse runs after every backfill.

    Scale shape: both snapshots ship narrow (key, cents, side) rows into
    ONE shared orderkey-bucket all-to-all; each group diffs vectorized via
    an indexed join and emits 4 bounded count/sum partials.  Neither
    snapshot is ever collected; the driver folds |buckets| x 4 rows.
    """
    N_BUCKETS = 32
    ds = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])

    _R = pa.schema([("key", pa.int64()), ("cents", pa.int64()),
                    ("side", pa.int8()), ("bucket", pa.int32())])

    def both_sides(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        # old side: every row
        new_keep = key % 41 != 0                       # deletes
        nk = key[new_keep]
        nc = cents[new_keep] + np.where(nk % 37 == 0, 100, 0)  # +1.00 updates
        k2 = np.concatenate([key, nk])
        c2 = np.concatenate([cents, nc])
        s2 = np.concatenate([np.zeros(len(key), np.int8),
                             np.ones(len(nk), np.int8)])
        return pa.table(
            {"key": pa.array(k2, pa.int64()), "cents": pa.array(c2, pa.int64()),
             "side": pa.array(s2, pa.int8()),
             "bucket": pa.array((k2 % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_R)

    _S = pa.schema([("status", pa.string()), ("n_rows", pa.int64()),
                    ("sum_cents", pa.int64())])

    def diff_group(g: pd.DataFrame) -> pa.Table:
        old = g[g["side"] == 0].set_index("key")["cents"]
        new = g[g["side"] == 1].set_index("key")["cents"]
        j = old.to_frame("o").join(new.to_frame("n"), how="outer")
        ins = j["o"].isna()
        dele = j["n"].isna()
        upd = (~ins) & (~dele) & (j["o"] != j["n"])
        unch = (~ins) & (~dele) & (j["o"] == j["n"])
        rows = [
            ("deleted", int(dele.sum()), int(j.loc[dele, "o"].sum())),
            ("inserted", int(ins.sum()), int(j.loc[ins, "n"].sum())),
            ("unchanged", int(unch.sum()), int(j.loc[unch, "n"].sum())),
            ("updated", int(upd.sum()), int(j.loc[upd, "n"].sum())),
        ]
        return pa.table(
            {"status": pa.array([r[0] for r in rows], pa.string()),
             "n_rows": pa.array([r[1] for r in rows], pa.int64()),
             "sum_cents": pa.array([r[2] for r in rows], pa.int64())},
            schema=_S)

    # inserted keys are NEGATIVE (-(k+1)) — orderkeys are positive and
    # sparse, so negatives are disjoint by construction at any scale
    inserts = pa.table(
        {"key": pa.array([-(k + 1) for k in range(100)], pa.int64()),
         "cents": pa.array([100_050] * 100, pa.int64()),
         "side": pa.array([1] * 100, pa.int8()),
         "bucket": pa.array([(-(k + 1)) % N_BUCKETS for k in range(100)],
                            pa.int32())}, schema=_R)
    import ray.data as _rd

    rows = ds.map_batches(both_sides, batch_format="pyarrow",
                          batch_size=262144).union(
        _rd.from_arrow(inserts))
    parts = (rows.groupby("bucket")
             .map_groups(diff_group, batch_format="pandas").to_pandas())
    out = (parts.groupby("status", as_index=False)[["n_rows", "sum_cents"]]
           .sum().sort_values("status").reset_index(drop=True))
    return out.astype({"n_rows": "int64", "sum_cents": "int64"})


def part_affinity_pairs(sf_dir: str, k: int = 30) -> pd.DataFrame:
    """(p1, p2, n_orders) — top-k part pairs by basket co-occurrence: how
    many orders contain BOTH parts (p1 < p2).  The A-priori support pass of
    market-basket mining — the self-join-explosion verb whose blow-up is
    bounded by the GROUP size (an order's distinct parts), never the table.

    Scale shape: (1) one orderkey-bucket all-to-all co-locates each order's
    lineitems; the in-group pandas self-merge explodes <= |order|^2/2 pairs
    per order and pre-counts pairs within the bucket.  (2) one pair-bucket
    all-to-all sums pair counts exactly; each group emits only its LOCAL
    top-k candidates (cnt desc, p1, p2 — a pre-aggregable statistic), so
    the driver merges <= k x |buckets| rows.  The full pair table never
    reaches the driver.
    """
    N_BUCKETS = 32
    ds = read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey", "l_partkey"])

    _P = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                    ("cnt", pa.int64()), ("pb", pa.int32())])

    def keyed(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        return t.append_column(
            "bucket", pa.array((ok % N_BUCKETS).astype(np.int32), pa.int32()))

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        m = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        j = m.merge(m, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        c = (j.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
             .size().reset_index(name="cnt"))
        p1 = c["l_partkey_a"].to_numpy()
        p2 = c["l_partkey_b"].to_numpy()
        return pa.table(
            {"p1": pa.array(p1, pa.int64()), "p2": pa.array(p2, pa.int64()),
             "cnt": pa.array(c["cnt"].to_numpy(), pa.int64()),
             "pb": pa.array(((p1 * 131 + p2) % N_BUCKETS).astype(np.int32),
                            pa.int32())}, schema=_P)

    _T = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                    ("n_orders", pa.int64())])

    def topk_in_group(g: pd.DataFrame) -> pa.Table:
        s = (g.groupby(["p1", "p2"], as_index=False)["cnt"].sum()
             .sort_values(["cnt", "p1", "p2"], ascending=[False, True, True],
                          kind="mergesort").head(k))
        return pa.Table.from_pandas(
            s.rename(columns={"cnt": "n_orders"}), schema=_T,
            preserve_index=False).replace_schema_metadata(None)

    cands = (
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pb").map_groups(topk_in_group, batch_format="pandas")
        .to_pandas()
    )
    out = (cands.sort_values(["n_orders", "p1", "p2"],
                             ascending=[False, True, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    return out[["p1", "p2", "n_orders"]].astype(
        {"p1": "int64", "p2": "int64", "n_orders": "int64"})


def link_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """(n_edges, sum_x, sum_y, sum_xx, sum_yy, sum_xy, num) — exact integer
    Pearson moments of (in-degree(src), in-degree(dst)) over every edge of
    the shared skewed link graph (degree_distribution's 3 bijective + 1
    quadratic edges, self-loops dropped).  ``num = m*Sxy - Sx*Sy`` is the
    assortativity numerator: its sign says whether hubs link to hubs
    (Newman 2002) — the structural audit a crawl corpus gets before
    sampling strategies that assume degree mixing.  All columns are exact
    integers, so the reduction is order-free and hash-exact.

    Scale shape: TWO coarse node-bucket all-to-alls.  (1) the
    degree_distribution partial builds exact per-node in-degrees inside
    each bucket; (2) each (node u, deg x) row re-derives u's 4 out-edges
    and ships (dst, x) keyed by dst plus one marker row (u, x) — each
    group joins edge rows to markers vectorized and emits ONE 6-sum
    integer partial.  The driver folds |buckets| rows and derives num as
    a Python int (HUGEINT-safe at any scale).
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    N_BUCKETS = 64

    _ROW = pa.schema([("node", pa.int64()), ("c", pa.int64()),
                      ("bucket", pa.int32())])

    def indeg_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        src = np.concatenate([ids, ids, ids, ids])
        dst = np.concatenate([(ids * 31 + s) % n for s in (1, 2, 3)]
                             + [(ids * ids + 1) % n])
        dst = dst[src != dst]
        node, cnt = np.unique(dst, return_counts=True)
        node = np.concatenate([node, ids])                  # zero carriers
        cnt = np.concatenate([cnt.astype(np.int64),
                              np.zeros(len(ids), np.int64)])
        return pa.table(
            {"node": pa.array(node, pa.int64()),
             "c": pa.array(cnt, pa.int64()),
             "bucket": pa.array((node % N_BUCKETS).astype(np.int32),
                                pa.int32())}, schema=_ROW)

    _DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def resolve_deg(g: pd.DataFrame) -> pa.Table:
        per_node = g.groupby("node")["c"].sum()
        return pa.table(
            {"node": pa.array(per_node.index.to_numpy(), pa.int64()),
             "deg": pa.array(per_node.to_numpy(), pa.int64())}, schema=_DEG)

    degs = (ds.map_batches(indeg_partial, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").map_groups(resolve_deg, batch_format="pandas"))

    _E = pa.schema([("v", pa.int64()), ("x", pa.int64()),
                    ("is_marker", pa.int8()), ("bucket", pa.int32())])

    def edge_rows(t: pa.Table) -> pa.Table:
        u = t["node"].to_numpy()
        x = t["deg"].to_numpy()
        vs = np.concatenate([(u * 31 + s) % n for s in (1, 2, 3)]
                            + [(u * u + 1) % n])
        xs = np.concatenate([x, x, x, x])
        keep = np.concatenate([u, u, u, u]) != vs
        v = np.concatenate([vs[keep], u])
        xx = np.concatenate([xs[keep], x])
        marker = np.concatenate([np.zeros(int(keep.sum()), np.int8),
                                 np.ones(len(u), np.int8)])
        return pa.table(
            {"v": pa.array(v, pa.int64()), "x": pa.array(xx, pa.int64()),
             "is_marker": pa.array(marker, pa.int8()),
             "bucket": pa.array((v % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_E)

    _S = pa.schema([(c, pa.int64()) for c in
                    ("n_edges", "sum_x", "sum_y", "sum_xx", "sum_yy",
                     "sum_xy")])

    def moments(g: pd.DataFrame) -> pa.Table:
        mk = (g[g["is_marker"] == 1].drop_duplicates("v")
              .set_index("v")["x"])
        e = g[g["is_marker"] == 0]
        # every dst has a marker row; astype raises loudly if one is missing
        y = mk.reindex(e["v"]).to_numpy().astype(np.int64)
        x = e["x"].to_numpy()
        vals = {"n_edges": len(e), "sum_x": int(x.sum()),
                "sum_y": int(y.sum()), "sum_xx": int((x * x).sum()),
                "sum_yy": int((y * y).sum()), "sum_xy": int((x * y).sum())}
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in vals.items()}, schema=_S)

    parts = (degs.map_batches(edge_rows, batch_format="pyarrow")
             .groupby("bucket").map_groups(moments, batch_format="pandas")
             .to_pandas())
    sums = {c: int(parts[c].sum()) for c in _S.names}
    sums["num"] = (sums["n_edges"] * sums["sum_xy"]
                   - sums["sum_x"] * sums["sum_y"])
    return pd.DataFrame({k: pd.Series([v], dtype="int64")
                         for k, v in sums.items()})


def anchor_text_topk(sf_dir: str) -> pd.DataFrame:
    """(doc_id, anchor_token, cnt) — anchor-text consolidation over the
    deterministic doc link graph (doc -> (doc*31+s) % n, s in 1..3, the
    PageRank/HITS edge set): each link carries the SOURCE doc's first two
    tokens as anchor text; per target, the most frequent anchor token wins
    (ties to the lexicographically smaller token).  The classic web-corpus
    enrichment step — anchor text is the strongest external description of
    a page (it's how search engines title pages that have none).

    Scale shape: one narrow all-to-all.  map_batches emits per-batch
    (target, token, cnt) COMBINED partials (<= 6 anchor rows per source doc
    before the combine), coarse-bucketed by target; each bucket group sums
    counts and picks its targets' argmax vectorized.  Text never shuffles —
    only (int64, short token, int64) rows move.  Self-edges are kept (a
    doc's own first tokens may describe it; both sides of the oracle agree
    by construction).
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "text"])
    N_BUCKETS = 64

    _ROW = pa.schema([("node", pa.int64()), ("w", pa.string()),
                      ("c", pa.int64()), ("bucket", pa.int32())])

    def anchor_partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        # first two tokens only — split(None, 2) stops early
        anchors = [s.lower().split(None, 2)[:2] for s in t["text"].to_pylist()]
        n_anc = np.array([len(a) for a in anchors], dtype=np.int64)
        if int(n_anc.sum()) == 0:
            return _ROW.empty_table()
        src_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_anc)
        words = np.asarray([w for a in anchors for w in a], dtype=object)
        src = ids[src_idx]
        # 3 out-edges per source; each carries every anchor token once
        node = np.concatenate([(src * 31 + s) % n for s in (1, 2, 3)])
        w = np.concatenate([words, words, words])
        g = (
            pd.DataFrame({"node": node, "w": w})
            .groupby(["node", "w"], sort=False).size().reset_index(name="c")
        )
        return pa.table(
            {"node": pa.array(g["node"].to_numpy(), pa.int64()),
             "w": pa.array(g["w"], pa.string()),
             "c": pa.array(g["c"].to_numpy(), pa.int64()),
             "bucket": pa.array(
                 (g["node"].to_numpy() % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    _OUT = pa.schema([("doc_id", pa.int64()), ("anchor_token", pa.string()),
                      ("cnt", pa.int64())])

    def pick_top(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["node", "w"], as_index=False)["c"].sum()
        s = s.sort_values(["node", "c", "w"],
                          ascending=[True, False, True], kind="mergesort")
        top = s.groupby("node", as_index=False).first()
        return pa.table(
            {"doc_id": pa.array(top["node"].to_numpy(), pa.int64()),
             "anchor_token": pa.array(top["w"], pa.string()),
             "cnt": pa.array(top["c"].to_numpy(), pa.int64())},
            schema=_OUT)

    out = (
        ds.map_batches(anchor_partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick_top, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "anchor_token": pd.Series([], dtype="str"),
                             "cnt": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def user_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """(cohort_day, day_offset, n_users) — classic cohort retention: users
    cohorted by their FIRST event's day, counted once per (cohort, day
    offset) they were active on.  The product-analytics staple the events
    window family lacked (it needs a per-user GLOBAL min, not a frame).

    Scale shape: each user's history lives wholly in one coarse
    ``user_id % 64`` bucket, so ONE all-to-all of per-batch-distinct
    (user, day) rows suffices: the in-bucket resolution re-dedups, takes
    each user's min day vectorized (groupby transform), and emits bounded
    (cohort, offset, count) partials — exact distinct-user counts without
    a second exchange.  Days are integer microseconds until the final
    driver-side cast.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts"])
    US_DAY = 86_400_000_000

    _ROW = pa.schema([("user_id", pa.int64()), ("day_us", pa.int64()),
                      ("bucket", pa.int32())])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "day_us": pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                              pa.int64()).to_numpy(),
        }).drop_duplicates()
        return pa.Table.from_pandas(
            df.assign(bucket=(df["user_id"].to_numpy() % N_KEY_BUCKETS)
                      .astype(np.int32)),
            schema=_ROW, preserve_index=False,
        ).replace_schema_metadata(None)

    _PART = pa.schema([("cohort_us", pa.int64()), ("day_offset", pa.int64()),
                       ("n", pa.int64())])

    def resolve(g: pd.DataFrame) -> pa.Table:
        g = g[["user_id", "day_us"]].drop_duplicates()
        cohort = g.groupby("user_id")["day_us"].transform("min")
        off = (g["day_us"].to_numpy() - cohort.to_numpy()) // US_DAY
        cnt = (pd.DataFrame({"cohort_us": cohort.to_numpy(), "day_offset": off})
               .groupby(["cohort_us", "day_offset"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(
            cnt, schema=_PART, preserve_index=False,
        ).replace_schema_metadata(None)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["cohort_us", "day_offset"], as_index=False)["n"].sum()
    out["cohort_day"] = pd.to_datetime(out["cohort_us"], unit="us")
    out = out.rename(columns={"n": "n_users"})
    out = out[["cohort_day", "day_offset", "n_users"]]
    return (out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
            .astype({"day_offset": "int64", "n_users": "int64"}))


def customer_order_distribution(sf_dir: str) -> pd.DataFrame:
    """(c_count, custdist) — TPC-H Q13 shape: the distribution of order
    counts per customer INCLUDING the zero-order customers (the outer-join
    histogram; a plain groupby over orders silently drops them).

    Scale shape: one coarse custkey-bucket all-to-all carrying per-batch
    order-count partials PLUS zero carrier rows from the customer table
    (degree_distribution's idiom — the distributed form of the LEFT JOIN);
    each bucket resolves exact per-customer counts vectorized and emits
    only its bounded (c_count, custdist) histogram partial.
    """
    N_BUCKETS = 64
    orders = read_pruned(_t(sf_dir, "orders"), ["o_custkey"])
    cust = read_pruned(_t(sf_dir, "customer"), ["c_custkey"])

    _ROW = pa.schema([("ck", pa.int64()), ("c", pa.int64()), ("bucket", pa.int32())])

    def order_partial(t: pa.Table) -> pa.Table:
        ck, cnt = np.unique(t["o_custkey"].to_numpy(), return_counts=True)
        return pa.table(
            {"ck": pa.array(ck, pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64()),
             "bucket": pa.array((ck % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    def cust_carrier(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {"ck": pa.array(ck, pa.int64()),
             "c": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
             "bucket": pa.array((ck % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    _H = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])

    def hist(g: pd.DataFrame) -> pa.Table:
        per = g.groupby("ck")["c"].sum()
        deg, cnt = np.unique(per.to_numpy(), return_counts=True)
        return pa.table(
            {"c_count": pa.array(deg, pa.int64()),
             "custdist": pa.array(cnt.astype(np.int64), pa.int64())}, schema=_H)

    rows = (
        orders.map_batches(order_partial, batch_format="pyarrow", batch_size=262144)
        .union(cust.map_batches(cust_carrier, batch_format="pyarrow",
                                batch_size=262144))
        .groupby("bucket")
        .map_groups(hist, batch_format="pandas")
        .to_pandas()
    )
    out = rows.groupby("c_count", as_index=False)["custdist"].sum()
    return (out.sort_values("c_count").reset_index(drop=True)
            .astype({"c_count": "int64", "custdist": "int64"}))


def idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """(c_nationkey, numcust, total_cents) — TPC-H Q22 shape: LAPSED rich
    customers — balance beats the positive-balance AVERAGE but no order
    since 2000-01-01 (every synth customer has SOME order, so the pure
    never-ordered form is vacuous; the dated predicate keeps the correlated
    NOT EXISTS non-trivial), grouped by nation.  Two classic decorrelations
    in one: the scalar-AVG subquery becomes a broadcast, the NOT EXISTS an
    anti-join — and the date predicate pushes down INTO the orders read
    (row-filtered scan: recent orders are a sliver of a 100 TB history).

    Exactness: balances are integer cents, and the average test
    ``cents > sum/n`` is evaluated by integer CROSS-MULTIPLICATION
    (``cents * n > sum``) on both sides — no float threshold anywhere, so
    the oracle hash-matches regardless of summation order.

    Scale shape: the scalar reduce streams constant-size (sum, n) partials;
    the anti-join is one custkey-bucket all-to-all of eligible-customer
    rows unioned with per-batch-DISTINCT order custkeys (the
    orders_without_lineitems idiom); each bucket resolves vectorized and
    emits bounded per-nation partials.
    """
    N_BUCKETS = 64
    CUTOFF = np.datetime64("2000-01-01", "us")
    cust = read_pruned(_t(sf_dir, "customer"),
                       ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = read_pruned(_t(sf_dir, "orders"), ["o_custkey", "o_orderdate"],
                         filter=(pc.field("o_orderdate") >= pa.scalar(
                             CUTOFF.item(), pa.timestamp("us"))))

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    tot = cust.map_batches(bal_partial, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    s, n = int(tot["s"].sum()), int(tot["n"].sum())

    _ROW = pa.schema([("ck", pa.int64()), ("nk", pa.int32()),
                      ("cents", pa.int64()), ("side", pa.int8()),
                      ("bucket", pa.int32())])

    def elig(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = cents * n > s          # integer cross-multiplied avg test
        ck = t["c_custkey"].to_numpy()[keep]
        return pa.table(
            {"ck": pa.array(ck, pa.int64()),
             "nk": pa.array(t["c_nationkey"].to_numpy()[keep], pa.int32()),
             "cents": pa.array(cents[keep], pa.int64()),
             "side": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
             "bucket": pa.array((ck % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    def ordkeys(t: pa.Table) -> pa.Table:
        # the filter already ran at the scan; re-assert for exactness
        recent = t.filter(pc.greater_equal(
            t["o_orderdate"], pa.scalar(CUTOFF.item(), pa.timestamp("us"))))
        ck = np.unique(recent["o_custkey"].to_numpy())
        return pa.table(
            {"ck": pa.array(ck, pa.int64()),
             "nk": pa.array(np.zeros(len(ck), np.int32), pa.int32()),
             "cents": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
             "side": pa.array(np.ones(len(ck), np.int8), pa.int8()),
             "bucket": pa.array((ck % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    _PART = pa.schema([("c_nationkey", pa.int32()), ("numcust", pa.int64()),
                       ("total_cents", pa.int64())])

    def anti(g: pd.DataFrame) -> pa.Table:
        has_ord = set(g.loc[g["side"] == 1, "ck"])
        c = g[(g["side"] == 0) & ~g["ck"].isin(has_ord)]
        agg = c.groupby("nk").agg(numcust=("ck", "size"), total_cents=("cents", "sum"))
        return pa.table(
            {"c_nationkey": pa.array(agg.index.to_numpy().astype(np.int32), pa.int32()),
             "numcust": pa.array(agg["numcust"].to_numpy().astype(np.int64), pa.int64()),
             "total_cents": pa.array(agg["total_cents"].to_numpy().astype(np.int64),
                                     pa.int64())}, schema=_PART)

    parts = (
        cust.map_batches(elig, batch_format="pyarrow", batch_size=262144)
        .union(orders.map_batches(ordkeys, batch_format="pyarrow",
                                  batch_size=262144))
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:   # an all-ordering corpus: typed empty frame
        parts = pd.DataFrame({"c_nationkey": pd.Series([], dtype="int32"),
                              "numcust": pd.Series([], dtype="int64"),
                              "total_cents": pd.Series([], dtype="int64")})
    out = parts.groupby("c_nationkey", as_index=False).agg(
        numcust=("numcust", "sum"), total_cents=("total_cents", "sum"))
    return (out.sort_values("c_nationkey").reset_index(drop=True)
            .astype({"c_nationkey": "int32", "numcust": "int64",
                     "total_cents": "int64"}))


def events_hourly_anomalies(sf_dir: str) -> pd.DataFrame:
    """(event_type, hour, n_events) — hours whose event count sits more
    than 3 standard deviations from that type's own mean hourly count: the
    monitoring-dashboard anomaly staple, done with EXACT INTEGER math.
    The 3-sigma test ``(c - s/n)^2 > 9*(ss/n - (s/n)^2)`` cross-multiplies
    to ``(n*c - s)^2 > 9*(n*ss - s*s)`` — no float ever forms, so the
    DuckDB oracle hash-matches bit-for-bit.  Moments are over OBSERVED
    hours for the type (the hourly table's own rows).

    Scale shape: hourly counts form exactly as events_hourly (per-batch
    combine, one coarse hour-bucket all-to-all); the anomaly pass is a
    SECOND narrow shuffle of the (type x hour)-sized count rows keyed by
    type, where each group computes its (s, ss, n) moments and flags
    vectorized — the hourly table is already ~1e6x smaller than the events
    stream, so both exchanges after the first are bounded by calendar
    hours, not data volume.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "hour_us": pc.cast(pc.floor_temporal(batch["ts"], unit="hour"),
                               pa.int64()).to_pandas(),
        })
        g = df.groupby(["event_type", "hour_us"], as_index=False).size().rename(
            columns={"size": "c"})
        g["bucket"] = (g["hour_us"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _H = pa.schema([("event_type", pa.string()), ("hour_us", pa.int64()),
                    ("c", pa.int64()), ("tbucket", pa.int32())])

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["event_type", "hour_us"], as_index=False)["c"].sum()
        tb = pd.util.hash_pandas_object(s["event_type"], index=False).to_numpy()
        s["tbucket"] = (tb % N_KEY_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(
            s, schema=_H, preserve_index=False).replace_schema_metadata(None)

    _OUT = pa.schema([("event_type", pa.string()), ("hour_us", pa.int64()),
                      ("n_events", pa.int64())])

    def flag(g: pd.DataFrame) -> pa.Table:
        mom = g.groupby("event_type").agg(
            s=("c", "sum"), n=("c", "size"),
            ss=("c", lambda x: int((x.to_numpy() ** 2).sum())))
        m = g.merge(mom, left_on="event_type", right_index=True)
        lhs = (m["n"].to_numpy() * m["c"].to_numpy() - m["s"].to_numpy()) ** 2
        rhs = 9 * (m["n"].to_numpy() * m["ss"].to_numpy()
                   - m["s"].to_numpy() ** 2)
        sel = m[lhs > rhs]
        return pa.table(
            {"event_type": pa.array(sel["event_type"], pa.string()),
             "hour_us": pa.array(sel["hour_us"].to_numpy(), pa.int64()),
             "n_events": pa.array(sel["c"].to_numpy(), pa.int64())},
            schema=_OUT)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .groupby("tbucket")
        .map_groups(flag, batch_format="pandas")
        .to_pandas()
    )
    out["hour"] = pd.to_datetime(out["hour_us"], unit="us")
    out = out[["event_type", "hour", "n_events"]]
    return (out.sort_values(["event_type", "hour"]).reset_index(drop=True)
            .astype({"event_type": "str", "n_events": "int64"}))


# deterministic campaign calendar shared by engine and oracle: campaign k
# runs [2024-01-01 + k*60h, +36h) — non-overlapping, covering the events
# stream's 30-day span with gaps (events in a gap attribute to nothing)
CAMPAIGN_N = 12
CAMPAIGN_EPOCH_DAYS = 19723         # 2024-01-01 in days since unix epoch
CAMPAIGN_STRIDE_HOURS = 60
CAMPAIGN_LEN_HOURS = 36


def campaign_attribution(sf_dir: str,
                         epoch_days: int = CAMPAIGN_EPOCH_DAYS) -> pd.DataFrame:
    """(campaign_id, n_events, n_users) — attribute events to the campaign
    interval containing their timestamp: the broadcast SMALL-SIDE interval
    join (the other half of the range-join family — events_range_join is
    the big x big trailing window; this is the dimension-calendar lookup a
    shuffle join would be absurd for).

    Scale shape: the 12-interval calendar is module constants (broadcast by
    closure capture — nothing ships per batch); each batch attaches
    campaign ids with ONE vectorized searchsorted + end-bound check.
    Event counts reduce as constant-size per-campaign partials with no
    shuffle; exact DISTINCT user counts ride one coarse user-bucket
    all-to-all of per-batch-distinct (campaign, user) rows (each user's
    rows co-locate, so per-bucket distinct counts sum exactly —
    user_retention_cohorts' idiom).
    """
    US_HOUR = 3_600_000_000
    starts = (epoch_days * 24
              + np.arange(CAMPAIGN_N, dtype=np.int64) * CAMPAIGN_STRIDE_HOURS) * US_HOUR
    ends = starts + CAMPAIGN_LEN_HOURS * US_HOUR

    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts"])

    def attach(t: pa.Table):
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        idx = np.searchsorted(starts, ts, side="right") - 1
        ok = (idx >= 0) & (ts < ends[np.clip(idx, 0, CAMPAIGN_N - 1)])
        return idx[ok], t["user_id"].to_numpy()[ok]

    _CNT = pa.schema([("campaign_id", pa.int64()), ("n", pa.int64())])

    def count_partial(t: pa.Table) -> pa.Table:
        idx, _ = attach(t)
        cid, cnt = np.unique(idx, return_counts=True)
        return pa.table({"campaign_id": pa.array(cid, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())},
                        schema=_CNT)

    _UROW = pa.schema([("campaign_id", pa.int64()), ("user_id", pa.int64()),
                       ("bucket", pa.int32())])

    def user_rows(t: pa.Table) -> pa.Table:
        idx, users = attach(t)
        df = pd.DataFrame({"campaign_id": idx, "user_id": users}).drop_duplicates()
        return pa.Table.from_pandas(
            df.assign(bucket=(df["user_id"].to_numpy() % N_KEY_BUCKETS)
                      .astype(np.int32)),
            schema=_UROW, preserve_index=False).replace_schema_metadata(None)

    _UCNT = pa.schema([("campaign_id", pa.int64()), ("u", pa.int64())])

    def distinct_users(g: pd.DataFrame) -> pa.Table:
        d = g[["campaign_id", "user_id"]].drop_duplicates()
        cnt = d.groupby("campaign_id").size()
        return pa.table({"campaign_id": pa.array(cnt.index.to_numpy(), pa.int64()),
                         "u": pa.array(cnt.to_numpy().astype(np.int64), pa.int64())},
                        schema=_UCNT)

    counts = (ds.map_batches(count_partial, batch_format="pyarrow",
                             batch_size=262144).to_pandas()
              .groupby("campaign_id", as_index=False)["n"].sum())
    users = (
        ds.map_batches(user_rows, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(distinct_users, batch_format="pandas")
        .to_pandas()
        .groupby("campaign_id", as_index=False)["u"].sum()
    )
    out = counts.merge(users, on="campaign_id")
    out = out.rename(columns={"n": "n_events", "u": "n_users"})
    return (out.sort_values("campaign_id").reset_index(drop=True)
            .astype({"campaign_id": "int64", "n_events": "int64",
                     "n_users": "int64"}))


def props_json_stats(sf_dir: str) -> pd.DataFrame:
    """(event_type, n, sum_k, min_k, max_k) — grouped integer stats of the
    ``k`` field extracted from the events table's JSON ``props`` column:
    the semi-structured-payload scalar family (SURVEY §2.8's JSON entry)
    over the one column no other query touches.

    Scale shape: extraction is ONE vectorized Arrow RE2 kernel per batch
    (``pc.extract_regex`` — no per-row json.loads; the payloads are flat
    single-key objects, exactly the case where regex extraction is the
    vectorized plan); per-batch Arrow group_by partials reduce through a
    tiny final groupby, decomposable min/max/sum only.  Rows whose props
    lack an integer ``k`` are dropped on both sides (the oracle's
    json_extract returns NULL there).
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        tbl = pa.table({"event_type": t["event_type"], "k": k}).filter(
            pc.is_valid(k))
        g = tbl.group_by("event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")])
        return g.rename_columns(["event_type", "n", "sum_k", "min_k", "max_k"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_k=("sum_k", "sum"),
        min_k=("min_k", "min"), max_k=("max_k", "max"))
    return (out.sort_values("event_type").reset_index(drop=True)
            .astype({"event_type": "str", "n": "int64", "sum_k": "int64",
                     "min_k": "int64", "max_k": "int64"}))


def events_sliding_distinct_users(sf_dir: str,
                                  window_hours: int = 24) -> pd.DataFrame:
    """(window_end, n_users) — for every observed hour h, the EXACT count
    of distinct users active in the trailing window (h-24h, h]: the
    sliding-window COUNT DISTINCT the rest of the window family dodges
    (sums/avgs decompose over frames; distinct does not — this is the one
    that needs per-user information at every window).

    Scale shape: per-batch-distinct (user, hour) rows take ONE user-bucket
    all-to-all (each user's activity co-locates); inside a bucket, a
    SWEEP-LINE replaces the naive W-fold window explode — each user's
    covered windows form a union of intervals (sorted activity runs with
    gap <= W merge), and only (start, +1) / (end+1, -1) BOUNDARY rows
    leave the group, grouped so the exchange is bounded by calendar hours,
    not activity.  The driver's job is a calendar-sized prefix sum read at
    the observed hours.  (The explode form measured 229 s at 50M events;
    the sweep is bounded by activity runs instead of runs x W.)  The
    approximate path at much larger windows is per-hour HLL registers
    merged over the frame (hll_distinct_tokens' sketch), noted as the
    trade.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts"])
    US_HOUR = 3_600_000_000

    _ROW = pa.schema([("user_id", pa.int64()), ("hour_us", pa.int64()),
                      ("bucket", pa.int32())])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "hour_us": pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                               pa.int64()).to_numpy(),
        }).drop_duplicates()
        return pa.Table.from_pandas(
            df.assign(bucket=(df["user_id"].to_numpy() % N_KEY_BUCKETS)
                      .astype(np.int32)),
            schema=_ROW, preserve_index=False).replace_schema_metadata(None)

    _CNT = pa.schema([("w", pa.int64()), ("d", pa.int64())])

    def diffs(g: pd.DataFrame) -> pa.Table:
        # sweep-line: a user active at hour h covers windows [h, h+W-1];
        # merge each user's overlapping coverage intervals (sorted runs
        # with gap <= W) and emit (start, +1) / (end+1, -1) boundary rows —
        # per-run constants instead of the W-fold window explode (which
        # measured 229 s at 50M events; this form is bounded by activity
        # RUNS and the boundary values by calendar hours)
        d = g[["user_id", "hour_us"]].drop_duplicates().sort_values(
            ["user_id", "hour_us"])
        u = d["user_id"].to_numpy()
        h = d["hour_us"].to_numpy() // US_HOUR
        if not len(u):
            return pa.table({"w": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())}, schema=_CNT)
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (h[1:] - h[:-1] > window_hours)
        starts = h[new]
        last = h[np.append(new[1:], True)]
        w = np.concatenate([starts, last + window_hours])
        delta = np.concatenate([np.ones(len(starts), np.int64),
                                np.full(len(last), -1, np.int64)])
        cnt = pd.DataFrame({"w": w, "d": delta}).groupby("w", as_index=False).sum()
        return pa.Table.from_pandas(cnt, schema=_CNT, preserve_index=False
                                    ).replace_schema_metadata(None)

    def observed_partial(t: pa.Table) -> pa.Table:
        h = np.unique(pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                              pa.int64()).to_numpy())
        return pa.table({"hour_us": pa.array(h, pa.int64())})

    obs = set(
        ds.map_batches(observed_partial, batch_format="pyarrow",
                       batch_size=262144).to_pandas()["hour_us"].unique())

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(diffs, batch_format="pandas")
        .to_pandas()
    )
    # calendar-sized sweep on the driver: prefix-sum the boundary deltas,
    # then read the coverage count at each OBSERVED hour
    agg = parts.groupby("w", as_index=False)["d"].sum().sort_values("w")
    dw = agg["w"].to_numpy()
    run = np.cumsum(agg["d"].to_numpy())
    obs_h = np.array(sorted(obs), dtype=np.int64) // US_HOUR
    pos = np.searchsorted(dw, obs_h, side="right") - 1
    n_users = np.where(pos >= 0, run[np.maximum(pos, 0)], 0)
    out = pd.DataFrame({"window_end": pd.to_datetime(obs_h * US_HOUR, unit="us"),
                        "n_users": n_users.astype(np.int64)})
    return out.reset_index(drop=True).astype({"n_users": "int64"})


def brand_price_trend(sf_dir: str) -> pd.DataFrame:
    """(p_brand, n, slope_micro) — per-brand least-squares price trend in
    micro-cents per day: grouped LINEAR REGRESSION as a decomposable
    integer aggregate (the one aggregation family — sufficient-statistic
    regression — the moments/rollup queries don't cover).  x = days since
    1995-01-01 (keeps x*y partials deep inside int64), y = exact cents;
    the per-brand sufficient statistics (n, Σx, Σy, Σxy, Σx²) are all
    exact integers, the driver forms slope = (nΣxy - ΣxΣy)/(nΣx² - (Σx)²)
    in Python arbitrary-precision ints (the numerators exceed int64 at
    fleet scale) and emits TRUNCATED micro-slope — matching DuckDB's
    HUGEINT ``//`` (which truncates toward zero, unlike Python's floor —
    handled sign-explicitly).

    Scale shape: the part->brand map is a broadcast small-side attach
    (``pc.index_in`` over shared Arrow arrays, the mktsegment idiom);
    per-batch Arrow group_by partials; the only exchange is brand-count
    partial rows.
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].combine_chunks()
    pb = part["p_brand"].combine_chunks()
    pk_ref = ray.put((pk, pb))

    li = read_pruned(_t(sf_dir, "lineitem"),
                     ["l_partkey", "l_shipdate", "l_extendedprice"])
    BASE_DAYS = 9131  # 1995-01-01

    def partial(t: pa.Table) -> pa.Table:
        kk, bb = ray.get(pk_ref)
        idx = pc.index_in(t["l_partkey"], value_set=kk)
        brand = pc.take(bb, idx)
        x = (pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
             // 86_400_000_000) - BASE_DAYS
        y = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = pa.table({
            "p_brand": brand,
            "n": pa.array(np.ones(len(x), np.int64), pa.int64()),
            "sx": pa.array(x, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
            "sxx": pa.array(x * x, pa.int64()),
        }).group_by("p_brand").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])
        return g.rename_columns(["p_brand", "n", "sx", "sy", "sxy", "sxx"])

    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    agg = parts.groupby("p_brand", as_index=False).sum()

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slopes = []
    for _, r in agg.iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slopes.append(trunc_div(1_000_000 * num, den) if den else 0)
    out = pd.DataFrame({"p_brand": agg["p_brand"], "n": agg["n"],
                        "slope_micro": slopes})
    return (out.sort_values("p_brand").reset_index(drop=True)
            .astype({"p_brand": "str", "n": "int64", "slope_micro": "int64"}))


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """(ship_month, promo_revenue, total_revenue) — TPC-H Q14 shape: what
    share of each month's discounted revenue came from PROMO-type parts.

    Scale shape: the part catalog is the bounded small side — its
    partkey -> is-promo map broadcasts once as shared Arrow arrays
    (``pc.index_in`` attach, the mktsegment idiom); lineitem does one
    map-only pass emitting per-(month) partial sums, so the only exchange
    is calendar-month-sized partial rows.  Revenue split promo/total in
    the same pass (a CASE inside the combiner, not a second scan).
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].combine_chunks()
    promo = pc.equal(part["p_type"], "PROMO").combine_chunks()
    side_ref = ray.put((pk, promo))

    li = read_pruned(_t(sf_dir, "lineitem"),
                     ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        kk, pp = ray.get(side_ref)
        idx = pc.index_in(t["l_partkey"], value_set=kk)
        is_promo = pc.take(pp, idx).to_numpy(zero_copy_only=False)
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        d = pc.cast(t["l_shipdate"], pa.int64()).to_numpy() // 86_400_000_000
        # month key = year*12 + (month-1), computed from the epoch-day via
        # pandas' vectorized datetime accessor (exact calendar months)
        dt = pd.to_datetime(d * 86_400_000_000, unit="us")
        mkey = dt.year * 12 + (dt.month - 1)
        g = pd.DataFrame({
            "mkey": mkey,
            "promo_rev": np.where(is_promo, rev, 0.0),
            "total_rev": rev,
        }).groupby("mkey", as_index=False).sum()
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    out = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("mkey")
        .aggregate(Sum("promo_rev", alias_name="promo_revenue"),
                   Sum("total_rev", alias_name="total_revenue"))
        .to_pandas()
    )
    out["ship_month"] = pd.to_datetime(
        {"year": out["mkey"] // 12, "month": out["mkey"] % 12 + 1, "day": 1})
    out["promo_revenue"] = out["promo_revenue"].round(0)
    out["total_revenue"] = out["total_revenue"].round(0)
    return (out[["ship_month", "promo_revenue", "total_revenue"]]
            .sort_values("ship_month").reset_index(drop=True))


def returned_item_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k customers by revenue on RETURNED lineitems (TPC-H Q10 shape):
    filtered fact scan -> big x big orderkey join -> per-customer rollup ->
    global top-k with dimension attach.

    Scale shape: the returnflag filter pushes into the parquet read
    (row-group stats prune at the source); lineitem combines per batch to
    (orderkey, rev) partials; orders and the partials co-locate via ONE
    key-bucket groupby (the order_priority_revenue idiom) where the
    in-group merge re-keys revenue to custkey; a second small groupby sums
    per customer, and the top-k is a distributed sort + limit over
    customer-count rows (revenue pre-rounded to whole units so the rank
    order is summation-order-stable).  Customer names attach to only the
    k winners via one bounded-catalog lookup.
    """
    import pyarrow.dataset as pads

    N_BUCKETS = 32
    _JOIN_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("cust", pa.int64()), ("rev", pa.float64()), ("bucket", pa.int32())]
    )

    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_custkey"])
    items = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def order_rows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "cust": t["o_custkey"],
             "rev": pa.array(np.zeros(len(keys)), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    def item_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(),
             "rev": t["l_extendedprice"].to_numpy()
             * (1.0 - t["l_discount"].to_numpy())}
        )
        g = df.groupby("key", as_index=False)["rev"].sum()
        keys = g["key"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "cust": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
             "rev": pa.array(g["rev"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    _CUST_SCHEMA = pa.schema([("c_custkey", pa.int64()), ("rev", pa.float64()),
                              ("cbucket", pa.int32())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "cust"]]
        right = g[g["side"] == 1].groupby("key", as_index=False)["rev"].sum()
        m = left.merge(right, on="key", how="inner")
        out = m.groupby("cust", as_index=False)["rev"].sum().rename(
            columns={"cust": "c_custkey"})
        out["cbucket"] = (out["c_custkey"].to_numpy()
                          % N_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(
            out, schema=_CUST_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    _CSUM_SCHEMA = pa.schema([("c_custkey", pa.int64()),
                              ("rev", pa.float64())])

    def cust_sum(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("c_custkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(
            s, schema=_CSUM_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        items.map_batches(item_partials, batch_format="pyarrow", batch_size=65536)
    )
    # second reduce re-keyed by the coarse custkey bucket (customers grow
    # with SF; a direct groupby(c_custkey) pays per-distinct-key overhead)
    per_cust = (
        both.groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .groupby("cbucket")
        .map_groups(cust_sum, batch_format="pandas")
        .map_batches(
            lambda t: pa.table(
                {"c_custkey": t["c_custkey"],
                 "revenue": pc.round(t["rev"]),
                 # rank key: revenue desc, custkey asc — deterministic under ties
                 "neg_rev": pc.negate(pc.round(t["rev"]))}),
            batch_format="pyarrow",
        )
    )
    top = per_cust.sort(["neg_rev", "c_custkey"]).limit(k).to_pandas()

    import pyarrow.parquet as _pq

    cust = _pq.read_table(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_name", "c_nationkey"])
    nation = _pq.read_table(_t(sf_dir, "nation"),
                            columns=["n_nationkey", "n_name"])
    cdf = cust.to_pandas().merge(
        nation.to_pandas(), left_on="c_nationkey", right_on="n_nationkey")
    out = top.merge(cdf[["c_custkey", "c_name", "n_name"]], on="c_custkey")
    return (out[["c_custkey", "c_name", "n_name", "revenue"]]
            .sort_values(["revenue", "c_custkey"],
                         ascending=[False, True]).reset_index(drop=True))


def volume_shipping(sf_dir: str) -> pd.DataFrame:
    """(supp_nation, cust_nation, ship_year, revenue) — TPC-H Q7 shape:
    trade volume between every supplier-nation / customer-nation pair per
    ship year.

    Scale shape: supplier->nation and customer->nation are bounded-catalog
    broadcasts; the orderkey join between lineitem and orders is the ONE
    big x big exchange, done on the shared key-bucket idiom with lineitem
    pre-combined per batch to (orderkey, supp_nation, year, rev) partial
    sums (the combiner collapses same-order same-nation lines before the
    shuffle).  Order rows carry cust_nation attached map-side, so the
    in-group merge emits (supp_nation, cust_nation, year) partials and
    the final groupby is nation² x years sized.
    """
    import pyarrow.parquet as _pq

    supp = _pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    cust = _pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = _pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    snat_ref = ray.put(
        {k: n_name[v] for k, v in zip(supp["s_suppkey"].to_pylist(),
                                      supp["s_nationkey"].to_pylist())})
    cnat_ref = ray.put(
        {k: n_name[v] for k, v in zip(cust["c_custkey"].to_pylist(),
                                      cust["c_nationkey"].to_pylist())})

    N_BUCKETS = 32
    _JOIN_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()), ("nat", pa.string()),
         ("year", pa.int32()), ("rev", pa.float64()), ("bucket", pa.int32())]
    )

    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_custkey"])
    items = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def order_rows(t: pa.Table) -> pa.Table:
        cnat = ray.get(cnat_ref)
        keys = t["o_orderkey"].to_numpy()
        df = pd.DataFrame({"key": keys, "nat": t["o_custkey"].to_numpy()})
        df["nat"] = df["nat"].map(cnat)
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "nat": pa.array(df["nat"], pa.string()),
             "year": pa.array(np.zeros(len(keys), np.int32), pa.int32()),
             "rev": pa.array(np.zeros(len(keys)), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    def item_partials(t: pa.Table) -> pa.Table:
        snat = ray.get(snat_ref)
        d = pc.cast(t["l_shipdate"], pa.int64()).to_numpy() // 86_400_000_000
        year = pd.to_datetime(d * 86_400_000_000, unit="us").year.to_numpy()
        df = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(),
             "nat": pd.Series(t["l_suppkey"].to_numpy()).map(snat),
             "year": year.astype(np.int32),
             "rev": t["l_extendedprice"].to_numpy()
             * (1.0 - t["l_discount"].to_numpy())}
        )
        g = df.groupby(["key", "nat", "year"], as_index=False)["rev"].sum()
        keys = g["key"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "nat": pa.array(g["nat"], pa.string()),
             "year": pa.array(g["year"].to_numpy(), pa.int32()),
             "rev": pa.array(g["rev"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    _OUT = pa.schema([("supp_nation", pa.string()), ("cust_nation", pa.string()),
                      ("ship_year", pa.int32()), ("rev", pa.float64())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "nat"]].rename(columns={"nat": "cust_nation"})
        right = g[g["side"] == 1][["key", "nat", "year", "rev"]].rename(
            columns={"nat": "supp_nation", "year": "ship_year"})
        m = right.merge(left, on="key", how="inner")
        out = m.groupby(["supp_nation", "cust_nation", "ship_year"],
                        as_index=False)["rev"].sum()
        return pa.Table.from_pandas(
            out[["supp_nation", "cust_nation", "ship_year", "rev"]],
            schema=_OUT, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        items.map_batches(item_partials, batch_format="pyarrow", batch_size=65536)
    )
    out = (
        both.groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .groupby(["supp_nation", "cust_nation", "ship_year"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(0)
    out["ship_year"] = out["ship_year"].astype("int64")
    return (out.sort_values(["supp_nation", "cust_nation", "ship_year"])
            .reset_index(drop=True))


def large_order_customers(sf_dir: str, min_qty: float = 250.0) -> pd.DataFrame:
    """Orders whose total lineitem quantity exceeds ``min_qty`` with their
    customers (TPC-H Q18 shape): a HAVING-filtered big groupby whose
    survivors are rare, then a semi-join back to two fact/dim tables.

    Scale shape: lineitem combines per batch to (orderkey, qty) partials
    keyed by the COARSE ``orderkey % 64`` bucket (a direct Ray
    groupby(orderkey) measured 12.4 s at sf0.1 — the sort aggregate pays
    per-distinct-key overhead on ~10^5 keys; the bucket shuffle + in-group
    vectorized sum runs the same exchange on one int32 key in ~1 s);
    the ``> min_qty`` filter runs inside the bucket group so only
    SURVIVOR rows (q99+ of orders — output-sized, the point of the query)
    ever reach the driver.  The survivor set then broadcasts once, and
    orders does a map-only semi-join + attach; the bounded customer
    catalog attaches names the same way.  Neither orders nor lineitem
    ever shuffles at full width.
    """
    items = read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"key": t["l_orderkey"].to_numpy(),
                           "qty": t["l_quantity"].to_numpy()})
        g = df.groupby("key", as_index=False)["qty"].sum()
        g["bucket"] = (g["key"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _SURV_SCHEMA = pa.schema([("key", pa.int64()), ("sum_qty", pa.float64())])

    def sum_filter(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("key", as_index=False)["qty"].sum().rename(
            columns={"qty": "sum_qty"})
        s = s[s["sum_qty"] > min_qty]
        return pa.Table.from_pandas(
            s, schema=_SURV_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    survivors = (
        items.map_batches(qty_partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(sum_filter, batch_format="pandas")
        .to_pandas()  # output-sized: orders over the quantity ceiling are rare
    )
    qty_ref = ray.put(dict(zip(survivors["key"], survivors["sum_qty"])))

    orders = read_pruned(
        _t(sf_dir, "orders"), ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        qty = ray.get(qty_ref)
        df = t.to_pandas()
        df = df[df["o_orderkey"].isin(qty.keys())].copy()
        df["sum_qty"] = df["o_orderkey"].map(qty)
        return _from_pandas(df)

    hit = orders.map_batches(attach, batch_format="pyarrow").to_pandas()

    import pyarrow.parquet as _pq

    cust = _pq.read_table(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_name"]).to_pandas()
    out = hit.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]].copy()
    out["o_orderdate"] = pd.to_datetime(out["o_orderdate"])
    out["sum_qty"] = out["sum_qty"].round(0)
    return (out.sort_values(["sum_qty", "o_orderkey"],
                            ascending=[False, True]).reset_index(drop=True))


def source_cap_sample(sf_dir: str, cap: int = 20) -> pd.DataFrame:
    """Per-source document cap (the RefinedWeb/C4 per-domain quota): keep at
    most ``cap`` docs from each source, chosen by a DETERMINISTIC
    multiplicative-hash rank so any parallelism level (and the SQL oracle)
    selects the identical rows — no RNG state, no driver pass.

    Scale shape: the shuffle key is a COARSE hash(source) % 64 bucket (the
    top_order_per_customer idiom — at web scale sources are millions of
    domains, and per-domain map_groups would pay the per-group overhead
    pathology); inside a bucket the per-source rank is one vectorized
    sort + cumcount.  Only (doc_id, source) ever moves.
    """
    N_BUCKETS = 64
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "source"])

    def add_bucket(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(src.astype(object)) % N_BUCKETS).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    _OUT = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def cap_group(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["rank_key"] = (g["doc_id"].to_numpy() * SAMPLE_MULT) % 1000003
        g = g.sort_values(["source", "rank_key", "doc_id"], kind="mergesort")
        kept = g[g.groupby("source").cumcount() < cap]
        return pa.Table.from_pandas(
            kept[["doc_id", "source"]], schema=_OUT, preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cap_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def nation_market_share(sf_dir: str, nation: str = "NATION_3",
                        region: str = "EUROPE",
                        ptype: str = "ECONOMY") -> pd.DataFrame:
    """(o_year, nation_revenue, total_revenue) — TPC-H Q8 shape: within a
    region's customers and one part type, what share of each order-year's
    discounted revenue was supplied by ``nation``.

    Scale shape: three bounded-catalog broadcasts (part-type partkey set,
    supplier->is-target-nation flags, region customer set) prefilter both
    fact sides map-side; the date window pushes INTO the orders parquet
    read.  The one big x big exchange is the shared orderkey-bucket idiom
    with lineitem pre-combined per batch to (orderkey, rev_total,
    rev_nation) partial sums — the in-group merge emits year-keyed
    partials and the final groupby is years-sized.  Both revenue columns
    round to whole units (the promo_revenue_share discipline) so the
    share is computable exactly downstream without float-division drift.
    """
    import datetime

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    nat = _pq.read_table(_t(sf_dir, "nation"),
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = _pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkey = {k: v for k, v in zip(reg["r_name"].to_pylist(),
                                 reg["r_regionkey"].to_pylist())}[region]
    region_nations = {k for k, v in zip(nat["n_nationkey"].to_pylist(),
                                        nat["n_regionkey"].to_pylist()) if v == rkey}
    target_nkey = {v: k for k, v in zip(nat["n_nationkey"].to_pylist(),
                                        nat["n_name"].to_pylist())}[nation]

    part = _pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    econ = pc.filter(part["p_partkey"], pc.equal(part["p_type"], ptype))
    econ_ref = ray.put(econ.combine_chunks())

    supp = _pq.read_table(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].combine_chunks()
    s_is_nat = pc.equal(supp["s_nationkey"],
                        pa.scalar(target_nkey, pa.int32())).combine_chunks()
    supp_ref = ray.put((sk, s_is_nat))

    cust = _pq.read_table(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_nationkey"])
    region_cust = pc.filter(
        cust["c_custkey"],
        pc.is_in(cust["c_nationkey"],
                 value_set=pa.array(sorted(region_nations), pa.int32())))
    cust_ref = ray.put(region_cust.combine_chunks())

    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    orders = read_pruned(
        _t(sf_dir, "orders"), ["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    items = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    N_BUCKETS = 32
    _JOIN_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()), ("year", pa.int32()),
         ("rev", pa.float64()), ("rev_nat", pa.float64()), ("bucket", pa.int32())]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["o_custkey"], value_set=ray.get(cust_ref))
        t = t.filter(keep)
        keys = t["o_orderkey"].to_numpy()
        d = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        year = pd.to_datetime(d * 86_400_000_000, unit="us").year.to_numpy()
        z = np.zeros(len(keys))
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "year": pa.array(year.astype(np.int32), pa.int32()),
             "rev": pa.array(z, pa.float64()),
             "rev_nat": pa.array(z, pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    def item_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=ray.get(econ_ref)))
        kk, flag = ray.get(supp_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=kk)
        is_nat = pc.take(flag, idx).to_numpy(zero_copy_only=False).astype(bool)
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        g = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(), "rev": rev,
             "rev_nat": np.where(is_nat, rev, 0.0)}
        ).groupby("key", as_index=False).sum()
        keys = g["key"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "year": pa.array(np.zeros(len(keys), np.int32), pa.int32()),
             "rev": pa.array(g["rev"].to_numpy(), pa.float64()),
             "rev_nat": pa.array(g["rev_nat"].to_numpy(), pa.float64()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    _OUT = pa.schema([("o_year", pa.int32()), ("rev", pa.float64()),
                      ("rev_nat", pa.float64())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "year"]]
        right = g[g["side"] == 1][["key", "rev", "rev_nat"]]
        m = right.merge(left, on="key", how="inner")
        out = m.groupby("year", as_index=False)[["rev", "rev_nat"]].sum()
        return pa.Table.from_pandas(out[["year", "rev", "rev_nat"]].rename(
            columns={"year": "o_year"}), schema=_OUT,
            preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        items.map_batches(item_partials, batch_format="pyarrow", batch_size=65536))
    out = (
        both.groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .groupby("o_year")
        .aggregate(Sum("rev_nat", alias_name="nation_revenue"),
                   Sum("rev", alias_name="total_revenue"))
        .to_pandas()
    )
    out["nation_revenue"] = out["nation_revenue"].round(0)
    out["total_revenue"] = out["total_revenue"].round(0)
    out["o_year"] = out["o_year"].astype("int64")
    return (out[["o_year", "nation_revenue", "total_revenue"]]
            .sort_values("o_year").reset_index(drop=True))


def linestatus_priority_counts(sf_dir: str) -> pd.DataFrame:
    """(l_linestatus, high_line_count, low_line_count) — TPC-H Q12 shape:
    per lineitem status, how many lines belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest.  Pure integer counts — hash-exact.

    Scale shape: lineitem pre-combines per batch to (orderkey, status, n)
    count partials and orders ships one int8 priority flag per row; the
    orderkey-bucket exchange co-locates them, the in-group merge emits
    (status, high, low) partials, and the final groupby is status-sized.
    """
    N_BUCKETS = 32
    _JOIN_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()), ("status", pa.string()),
         ("n", pa.int64()), ("high", pa.int8()), ("bucket", pa.int32())]
    )
    _HIGH = pa.array(["1-URGENT", "2-HIGH"], pa.string())

    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_orderpriority"])
    items = read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey", "l_linestatus"])

    def order_rows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        high = pc.cast(pc.is_in(t["o_orderpriority"], value_set=_HIGH), pa.int8())
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "status": pa.array([""] * len(keys), pa.string()),
             "n": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
             "high": high,
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    def item_partials(t: pa.Table) -> pa.Table:
        g = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(),
             "status": t["l_linestatus"].to_pandas()}
        ).groupby(["key", "status"], as_index=False).size()
        keys = g["key"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "status": pa.array(g["status"], pa.string()),
             "n": pa.array(g["size"].to_numpy(), pa.int64()),
             "high": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "bucket": pa.array((keys % N_BUCKETS).astype(np.int32), pa.int32())},
            schema=_JOIN_SCHEMA,
        )

    _OUT = pa.schema([("l_linestatus", pa.string()), ("high", pa.int64()),
                      ("low", pa.int64())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "high"]].rename(columns={"high": "is_high"})
        right = g[g["side"] == 1][["key", "status", "n"]]
        m = right.merge(left, on="key", how="inner")
        m["high"] = np.where(m["is_high"] == 1, m["n"], 0)
        m["low"] = np.where(m["is_high"] == 1, 0, m["n"])
        out = m.groupby("status", as_index=False)[["high", "low"]].sum()
        return pa.Table.from_pandas(
            out.rename(columns={"status": "l_linestatus"}),
            schema=_OUT, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        items.map_batches(item_partials, batch_format="pyarrow", batch_size=65536))
    out = (
        both.groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .groupby("l_linestatus")
        .aggregate(Sum("high", alias_name="high_line_count"),
                   Sum("low", alias_name="low_line_count"))
        .to_pandas()
    )
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True)


# Q19 disjunctive brackets: (brand, max_size, qty_lo, qty_hi); sizes/brands
# chosen to be non-empty at every sf of the synthetic catalog (25 brands,
# sizes 1-50, quantities 1-50)
_BRACKETS = (("Brand#12", 15, 1.0, 15.0),
             ("Brand#3", 25, 10.0, 25.0),
             ("Brand#24", 35, 20.0, 35.0))


def bracket_discount_revenue(sf_dir: str) -> pd.DataFrame:
    """Single-row (revenue, n_lines) over an OR-of-three-AND-brackets
    predicate mixing part attributes and lineitem quantity — TPC-H Q19
    shape: a disjunction can't push into one scan filter, but the part
    side of every bracket broadcasts as one partkey -> bracket-candidate
    int8 map, so the fact pass stays map-only with the per-bracket
    quantity bands tested vectorized.  Rows matching NO bracket never
    leave the batch; the exchange is one scalar partial per block.
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(_t(sf_dir, "part"),
                          columns=["p_partkey", "p_brand", "p_size"])
    brand = part["p_brand"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy()
    cand = np.full(len(brand), -1, np.int8)
    for bi, (b, smax, _, _) in enumerate(_BRACKETS):
        cand[(brand == b) & (size >= 1) & (size <= smax)] = bi
    pk = part["p_partkey"].combine_chunks()
    side_ref = ray.put((pk, pa.array(cand, pa.int8())))

    items = read_pruned(_t(sf_dir, "lineitem"),
                        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        kk, cc = ray.get(side_ref)
        idx = pc.index_in(t["l_partkey"], value_set=kk)
        c = pc.take(cc, idx).to_numpy(zero_copy_only=False).astype(np.int8)
        qty = t["l_quantity"].to_numpy()
        mask = np.zeros(len(c), bool)
        for bi, (_, _, qlo, qhi) in enumerate(_BRACKETS):
            mask |= (c == bi) & (qty >= qlo) & (qty <= qhi)
        rev = (t["l_extendedprice"].to_numpy()[mask]
               * (1.0 - t["l_discount"].to_numpy()[mask]))
        return pa.table({"rev": pa.array([float(rev.sum())], pa.float64()),
                         "n": pa.array([int(mask.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    out = (items.map_batches(partial, batch_format="pyarrow", batch_size=262144)
           .aggregate(Sum("rev", alias_name="revenue"),
                      Sum("n", alias_name="n_lines")))
    return pd.DataFrame({"revenue": [round(out["revenue"], 0)],
                         "n_lines": [int(out["n_lines"])]})


def event_transition_counts(sf_dir: str) -> pd.DataFrame:
    """(prev_type, next_type, n) — global counts of consecutive same-user
    event-type transitions, ordered by (ts, event_id): the Markov
    transition matrix of user behavior.  Pure integer counts — hash-exact.

    Scale shape: one narrow (user, t_us, event_id, type) projection rides
    the shared ``user_id % 64`` coarse-bucket all-to-all; each bucket
    lexsorts once, masks same-user adjacency vectorized, and emits a
    BOUNDED type x type count partial (<= 25 rows) — the final groupby is
    transition-matrix sized regardless of corpus size.
    """
    ds = read_pruned(_t(sf_dir, "events"),
                     ["event_id", "user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy()
        return pa.table(
            {"user_id": t["user_id"],
             "t_us": pc.cast(t["ts"], pa.int64()),
             "event_id": t["event_id"],
             "etype": t["event_type"],
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    _OUT = pa.schema([("prev_type", pa.string()), ("next_type", pa.string()),
                      ("n", pa.int64())])

    def count_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "t_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["etype"].to_numpy()
        same = u[1:] == u[:-1]
        out = (pd.DataFrame({"prev_type": et[:-1][same],
                             "next_type": et[1:][same]})
               .groupby(["prev_type", "next_type"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(out, schema=_OUT,
                                    preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_group, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


def _bfs_known_ds(sf_dir: str, max_hops: int = 4):
    """((node, depth) Dataset, n) — multi-source BFS over the shared link
    graph (every doc links to ``(doc_id*31 + s) % n`` for s in 1..3) from
    the seed set ``doc_id % 100 == 0``, bounded at ``max_hops``: the
    minimum hop count at which each reachable node is first discovered.

    Scale shape: level-synchronous frontier expansion — each hop the
    CURRENT known (node, depth) Dataset filters to the newest level,
    expands its out-edges map-side (3 children per node, per-batch
    combined to distinct candidates), unions with known, and a COARSE
    ``node % 64`` bucket shuffle + in-group vectorized min collapses
    rediscoveries (a direct Ray groupby(node) min measured 76 s at sf0.1
    — the sort aggregate pays per-distinct-key overhead on ~10^5 keys;
    the bucket idiom runs the same exchange on one int32 key in ~4 s
    total).  ``max_hops`` narrow all-to-alls over (node, depth) int rows;
    known materializes per hop (2 ints/node — the same bounded state
    pagerank's rank Dataset carries), the driver never holds it.
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    n = ds.count()

    def seeds(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids % 100 == 0]
        return pa.table(
            {"node": pa.array(ids, pa.int64()),
             "depth": pa.array(np.zeros(len(ids), np.int64), pa.int64())})

    known = ds.map_batches(seeds, batch_format="pyarrow").materialize()

    _K_SCHEMA = pa.schema([("node", pa.int64()), ("depth", pa.int64())])

    def min_group(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)["depth"].min()
        return pa.Table.from_pandas(
            s, schema=_K_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    for h in range(1, max_hops + 1):
        lvl = h - 1

        # pass-through + children in ONE map (no Dataset.union: union
        # re-executes both input LOGICAL plans even when materialized, so
        # a self-referencing union makes each hop re-run every prior hop
        # — measured 3.5x geometric per-hop growth, 69 s by hop 4 on a
        # 3,600-row frontier)
        def expand(t: pa.Table, _lvl=lvl, _h=h) -> pa.Table:
            nodes = t["node"].to_numpy()
            depths = t["depth"].to_numpy()
            ids = nodes[depths == _lvl]
            child = np.unique(np.concatenate(
                [(ids * 31 + s) % n for s in (1, 2, 3)])) if len(ids) else (
                np.empty(0, np.int64))
            out_n = np.concatenate([nodes, child])
            out_d = np.concatenate([depths,
                                    np.full(len(child), _h, np.int64)])
            return pa.table(
                {"node": pa.array(out_n, pa.int64()),
                 "depth": pa.array(out_d, pa.int64()),
                 "bucket": pa.array((out_n % N_KEY_BUCKETS).astype(np.int32),
                                    pa.int32())})

        known = (
            known.map_batches(expand, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(min_group, batch_format="pandas")
            .materialize()
        )

    return known, n


def link_bfs_depth(sf_dir: str, max_hops: int = 4) -> pd.DataFrame:
    known, _ = _bfs_known_ds(sf_dir, max_hops)
    out = known.to_pandas().rename(columns={"node": "doc_id"})
    out = out.astype({"doc_id": "int64", "depth": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(l_returnflag, l_linestatus): leaf totals plus BOTH
    one-dimension margins and the grand total — the full grouping-sets
    lattice (ROLLUP's sibling; revenue_rollup covers the hierarchy case).

    Only the leaf aggregation touches the fact table (per-batch Arrow
    group_by combine + one tiny groupby); all three coarser grouping sets
    re-aggregate the leaf PARTIALS on the driver (|flags| x |statuses|
    rows), so the cube costs one shuffle at any scale.  NULL-label
    convention matches SQL CUBE; revenue rounds to 0 decimals.
    """
    ds = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "revenue": pa.array(rev, pa.float64()),
            "n_lines": pa.array(np.ones(len(rev), np.int64), pa.int64()),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("revenue", "sum"), ("n_lines", "sum")])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "revenue", "n_lines"])

    from ray.data.aggregate import Sum

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_lines", alias_name="n_lines"))
        .to_pandas()
    )
    m_flag = leaf.groupby("l_returnflag", as_index=False).agg(
        revenue=("revenue", "sum"), n_lines=("n_lines", "sum"))
    m_flag["l_linestatus"] = None
    m_stat = leaf.groupby("l_linestatus", as_index=False).agg(
        revenue=("revenue", "sum"), n_lines=("n_lines", "sum"))
    m_stat["l_returnflag"] = None
    total = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None],
         "revenue": [leaf["revenue"].sum()],
         "n_lines": [leaf["n_lines"].sum()]})
    out = pd.concat(
        [leaf, m_flag[leaf.columns], m_stat[leaf.columns],
         total[leaf.columns]], ignore_index=True)
    out["revenue"] = out["revenue"].round(0)
    out["n_lines"] = out["n_lines"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


def top_revenue_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_suppkey, s_name, total_revenue) — TPC-H Q15 shape: the
    supplier(s) whose discounted revenue over one ship-date quarter equals
    the GLOBAL maximum (HAVING = scalar-subquery max, ties all kept).

    Scale shape: the date window pushes into the lineitem read; per-batch
    (suppkey, rev) partials -> one supplier-count-sized groupby; revenue
    rounds to whole units BEFORE the max so the winner set is
    summation-order-stable; the argmax filter + bounded-catalog name
    attach run on the supplier-sized frame.
    """
    import datetime

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)
    items = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
        g = pd.DataFrame({"s_suppkey": t["l_suppkey"].to_numpy(), "rev": rev}
                         ).groupby("s_suppkey", as_index=False).sum()
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    per_supp = (
        items.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("s_suppkey")
        .aggregate(Sum("rev", alias_name="total_revenue"))
        .to_pandas()
    )
    per_supp["total_revenue"] = per_supp["total_revenue"].round(0)
    best = per_supp[per_supp["total_revenue"] == per_supp["total_revenue"].max()]

    supp = _pq.read_table(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(supp, on="s_suppkey")[["s_suppkey", "s_name",
                                            "total_revenue"]]
    return (out.sort_values("s_suppkey").reset_index(drop=True)
            .astype({"s_suppkey": "int64"}))


def value_histogram(sf_dir: str, n_bins: int = 20) -> pd.DataFrame:
    """(bin, lo_micro, hi_micro, n) — exact equi-width histogram of
    events.value over the observed [min, max]: global min/max reduce,
    then one map-only binning pass with integer-exact bin assignment.

    Every value micro-rounds to int64 BEFORE any arithmetic (the
    embedding_moments discipline), so both the range split and the bin
    index ``min((vi - mn) * n_bins // span, n_bins - 1)`` are pure
    integer expressions the DuckDB twin reproduces bit-for-bit — no
    float-boundary ties anywhere.  Scale shape: constant 2-value min/max
    partials per block, then constant n_bins-row count partials; nothing
    wide shuffles.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["value"])

    def minmax(t: pa.Table) -> pa.Table:
        vi = np.round(t["value"].to_numpy() * 1e6).astype(np.int64)
        if not len(vi):
            return pa.schema([("mn", pa.int64()), ("mx", pa.int64())]
                             ).empty_table()
        return pa.table({"mn": pa.array([vi.min()], pa.int64()),
                         "mx": pa.array([vi.max()], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mn = int(mm["mn"].min())
    mx = int(mm["mx"].max())
    span = max(mx - mn, 1)

    def counts(t: pa.Table) -> pa.Table:
        vi = np.round(t["value"].to_numpy() * 1e6).astype(np.int64)
        b = np.minimum((vi - mn) * n_bins // span, n_bins - 1)
        c = np.bincount(b, minlength=n_bins)
        return pa.table({"bin": pa.array(np.arange(n_bins), pa.int64()),
                         "n": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum

    red = (ds.map_batches(counts, batch_format="pyarrow", batch_size=262144)
           .groupby("bin").aggregate(Sum("n", alias_name="n")).to_pandas())
    red = red.set_index("bin").reindex(range(n_bins), fill_value=0).reset_index()
    bins = red["bin"].to_numpy()
    out = pd.DataFrame({
        "bin": bins,
        "lo_micro": mn + bins * span // n_bins,
        "hi_micro": mn + (bins + 1) * span // n_bins,
        "n": red["n"].to_numpy(),
    })
    return out.astype({c: "int64" for c in out.columns})


def value_mad_per_type(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_events, med_cents, mad_cents) — exact median and
    median-absolute-deviation of the event value per type at cent
    resolution: the robust-statistics pair the mean/stddev family
    (value_stats_per_type) can't see through outliers.

    Rides the value_quantiles_per_type machinery verbatim: (type, cents,
    n) histogram partials on the coarse ``cents % 64`` bucket, in-bucket
    vectorized combine, then BOTH statistics fall out of the same
    O(|types| x distinct cents) combined histogram — the median at
    0-based rank ceil(n/2)-1, and the MAD as the same discrete rank over
    the |cents - med| re-weighted histogram (a driver-side reindex of
    bounded rows, no second pass over the stream).
    """
    import math

    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(),
             "cents": np.round(t["value"].to_numpy() * 100).astype(np.int64)})
        g = df.groupby(["event_type", "cents"], as_index=False).size().rename(
            columns={"size": "n"})
        g["bucket"] = (g["cents"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _HIST_SCHEMA = pa.schema(
        [("event_type", pa.string()), ("cents", pa.int64()), ("n", pa.int64())])

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            s, schema=_HIST_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "cents"])
    )

    def disc_median(vals: np.ndarray, weights: np.ndarray) -> int:
        cum = weights.cumsum()
        total = int(cum[-1])
        rank = math.ceil(0.5 * total) - 1
        return int(vals[np.searchsorted(cum, rank + 1)])

    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        vals = g["cents"].to_numpy()
        w = g["n"].to_numpy()
        med = disc_median(vals, w)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        mad = disc_median(dev[order], w[order])
        rows.append({"event_type": etype, "n_events": int(w.sum()),
                     "med_cents": med, "mad_cents": mad})
    out = pd.DataFrame(rows)
    return out.astype({"n_events": "int64", "med_cents": "int64",
                       "mad_cents": "int64"})


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_day_pivot(sf_dir: str) -> pd.DataFrame:
    """(day, n_click, n_error, n_purchase, n_signup, n_view, n_total) —
    the PIVOT shape: the long (day, event_type) count table turned wide,
    one integer column per event type.  Pure counts — hash-exact.

    Scale shape: each batch emits one ALREADY-WIDE partial row per
    observed day (vectorized per-type masks; the pivot happens map-side,
    not in the exchange), so the groupby moves days x 7-int rows no
    matter how many events stream through.  The type list is the
    engine-owned ``_PIVOT_TYPES`` constant — the oracle's CASE columns
    are generated from the same tuple, so engine and SQL cannot drift.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t["ts"], pa.int64()).to_numpy() // 86_400_000_000
        et = t["event_type"].to_numpy(zero_copy_only=False)
        days, inv = np.unique(d, return_inverse=True)
        cols = {"day_epoch": pa.array(days, pa.int64())}
        total = np.zeros(len(days), np.int64)
        for ty in _PIVOT_TYPES:
            c = np.bincount(inv[et == ty], minlength=len(days)).astype(np.int64)
            cols[f"n_{ty}"] = pa.array(c, pa.int64())
            total += c
        cols["n_total"] = pa.array(total, pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    aggs = [Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in _PIVOT_TYPES]
    aggs.append(Sum("n_total", alias_name="n_total"))
    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("day_epoch")
        .aggregate(*aggs)
        .to_pandas()
    )
    out["day"] = pd.to_datetime(out["day_epoch"] * 86_400_000_000, unit="us")
    cols = ["day"] + [f"n_{ty}" for ty in _PIVOT_TYPES] + ["n_total"]
    out = out[cols].sort_values("day").reset_index(drop=True)
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out


def event_type_day_pivot_sql() -> str:
    """Generated oracle for event_type_day_pivot: CASE columns built from
    the same ``_PIVOT_TYPES`` tuple the engine pivots on."""
    cases = ",\n                   ".join(
        f"sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{ty}" for ty in _PIVOT_TYPES)
    return f"""
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   {cases},
                   count(*)::BIGINT AS n_total
            FROM events GROUP BY 1 ORDER BY 1
        """


def source_drift_ks(sf_dir: str) -> pd.DataFrame:
    """(source_a, source_b, ks_num, n_a, n_b) — exact two-sample
    Kolmogorov-Smirnov statistic between every pair of sources over the
    document-length (n_chars) distribution, as the INTEGER numerator
    ``max_v |F_a(v)*n_b - F_b(v)*n_a|`` (the KS distance times n_a*n_b —
    division-free, so the oracle hash is float-free).  Distribution-drift
    detection across corpus slices: the audit that catches one domain's
    content shifting shape between crawls.

    Scale shape: per-batch (n_chars, source, n) count partials reduce to
    a BOUNDED histogram (distinct lengths x |sources| rows — lengths are
    physically bounded); ECDF grids, pair maxima and the KS reduce all
    run on that bounded frame.  The stream never shuffles.
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["n_chars", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame(
            {"v": t["n_chars"].to_numpy(),
             "source": t["source"].to_pandas()}
        ).groupby(["v", "source"], as_index=False).size().rename(
            columns={"size": "n"})
        return _from_pandas(g)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .to_pandas()
        .groupby(["v", "source"], as_index=False)["n"].sum()
    )
    sources = sorted(hist["source"].unique())
    vals = np.sort(hist["v"].unique())
    # dense grid: cumulative counts per source at every distinct value
    wide = (hist.pivot(index="v", columns="source", values="n")
            .reindex(vals).fillna(0).cumsum())
    sz = {s: int(wide[s].iloc[-1]) for s in sources}

    rows = []
    for i, sa in enumerate(sources):
        ca = wide[sa].to_numpy(dtype=np.int64)
        for sb in sources[i + 1:]:
            cb = wide[sb].to_numpy(dtype=np.int64)
            ks = int(np.abs(ca * sz[sb] - cb * sz[sa]).max())
            rows.append({"source_a": sa, "source_b": sb, "ks_num": ks,
                         "n_a": sz[sa], "n_b": sz[sb]})
    out = pd.DataFrame(rows)
    return out.astype({"ks_num": "int64", "n_a": "int64", "n_b": "int64"})


def user_value_deciles(sf_dir: str) -> pd.DataFrame:
    """(decile, boundary_cents) — exact decile boundaries of the PER-USER
    total event value distribution (the whale-vs-minnow curve): boundary i
    is the value at ascending rank ceil(i*n/10) (1-based) among the n
    per-user integer-cent totals.

    Order statistics over a DERIVED aggregate: one user-bucket exchange
    of per-batch (user, cents) partial sums forms the per-user totals as
    a Dataset, then the distributed rank-selection idiom (sort +
    per-block row counts + fetch only the block containing each rank —
    ``text._values_at_ranks``) pulls the 10 boundaries without the driver
    ever holding the totals.  All-integer — hash-exact.
    """
    from .text import _values_at_ranks

    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(),
             "cents": np.round(t["value"].to_numpy() * 100).astype(np.int64)}
        ).groupby("user_id", as_index=False)["cents"].sum()
        g["bucket"] = (g["user_id"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _TOT_SCHEMA = pa.schema([("user_id", pa.int64()),
                             ("total_cents", pa.int64())])

    def sum_group(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("user_id", as_index=False)["cents"].sum().rename(
            columns={"cents": "total_cents"})
        return pa.Table.from_pandas(
            s, schema=_TOT_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    # coarse-bucket per-user sum (a direct Ray groupby(user_id) measured
    # 362 s at 2M distinct users — the many-distinct-key sort-aggregate
    # pathology; the bucket idiom runs the same exchange on one int32 key)
    totals = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(sum_group, batch_format="pandas")
    )
    n = totals.count()
    ranks = [(i * n + 9) // 10 - 1 for i in range(1, 11)]  # 0-based
    vals = _values_at_ranks(totals, "total_cents", ranks)
    return pd.DataFrame({"decile": pd.Series(range(1, 11), dtype="int64"),
                         "boundary_cents": pd.Series(vals, dtype="int64")})


def customer_order_gaps(sf_dir: str) -> pd.DataFrame:
    """(c_custkey, n_orders, max_gap_days) — for every customer with at
    least two orders, the LARGEST day gap between consecutive orders
    (order dates sorted, ties broken by orderkey; duplicate dates gap 0).
    The churn-risk analytic: a long max-gap customer is a lapse
    candidate — the per-key MAX-of-deltas shape the lag family
    (per-event deltas) and retention cohorts (global minima) don't cover.

    Scale shape: one narrow (custkey, epoch_day, orderkey) projection
    rides the shared ``custkey % 64`` coarse-bucket all-to-all; each
    bucket lexsorts once, diffs same-customer adjacency vectorized, and
    reduces to per-customer (count, max) with one in-group groupby —
    output rows only (multi-order customers) leave the exchange.
    Pure integers, hash-exact.
    """
    ds = read_pruned(_t(sf_dir, "orders"),
                     ["o_custkey", "o_orderdate", "o_orderkey"])

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy()
        return pa.table(
            {"cust": pa.array(keys, pa.int64()),
             "day": pa.array(pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
                             // 86_400_000_000, pa.int64()),
             "okey": t["o_orderkey"],
             "bucket": pa.array((keys % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    _OUT = pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64()),
                      ("max_gap_days", pa.int64())])

    def gaps_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cust", "day", "okey"], kind="mergesort")
        c = g["cust"].to_numpy()
        d = g["day"].to_numpy()
        same = c[1:] == c[:-1]
        gap = pd.DataFrame({"cust": c[1:][same], "gap": (d[1:] - d[:-1])[same]})
        if gap.empty:
            return _OUT.empty_table()
        agg = gap.groupby("cust", as_index=False).agg(
            n_gaps=("gap", "size"), max_gap_days=("gap", "max"))
        agg["n_orders"] = agg["n_gaps"] + 1
        return pa.Table.from_pandas(
            agg.rename(columns={"cust": "c_custkey"})[
                ["c_custkey", "n_orders", "max_gap_days"]],
            schema=_OUT, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values("c_custkey").reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def events_sliding_distinct_hll(sf_dir: str,
                                window_hours: int = 24) -> pd.DataFrame:
    """(window_end, n_users_est) — APPROXIMATE trailing-24h sliding
    distinct users per observed hour via per-hour HyperLogLog registers:
    the constant-memory scale path beside the exact op
    (``events_sliding_distinct_users``), whose per-window explode is the
    honest exact cost at large windows.

    HLL registers are max-mergeable, so the sliding union is an
    elementwise max over the trailing ``window_hours`` per-hour register
    vectors — each window costs O(m), independent of user count.  Scale
    shape: every batch emits one 4 KB register blob per hour it touches
    (constant per block x hours); the driver folds hours x 4 KB — bounded
    by the time span, never by users.  Deterministic (splitmix64 user
    hashes), so reruns are bit-identical; accuracy vs the exact op is
    pytest-locked at the HLL envelope.
    """
    from .dedup import _mix64
    from .text import HLL_P, _hll_estimate, _hll_partial

    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts"])
    m = 1 << HLL_P

    def partials(t: pa.Table) -> pa.Table:
        hrs = pc.cast(t["ts"], pa.int64()).to_numpy() // 3_600_000_000
        h = _mix64(t["user_id"].to_numpy().astype(np.uint64))
        uh, inv = np.unique(hrs, return_inverse=True)
        out_h: list = []
        out_r: list = []
        for i, hour in enumerate(uh):
            out_h.append(int(hour))
            out_r.append(_hll_partial(h[inv == i], m).tobytes())
        return pa.table({"hour": pa.array(out_h, pa.int64()),
                         "regs": pa.array(out_r, pa.binary())})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    hours = np.sort(parts["hour"].unique())
    by_hour = {int(hh): np.zeros(m, np.uint8) for hh in hours}
    for hh, blob in zip(parts["hour"], parts["regs"]):
        np.maximum(by_hour[int(hh)], np.frombuffer(blob, np.uint8),
                   out=by_hour[int(hh)])

    rows = []
    for hh in hours:
        merged = np.zeros(m, np.uint8)
        for w in hours[(hours > hh - window_hours) & (hours <= hh)]:
            np.maximum(merged, by_hour[int(w)], out=merged)
        rows.append({"window_end": pd.Timestamp(int(hh) * 3_600_000_000,
                                                unit="us"),
                     "n_users_est": int(round(_hll_estimate(merged)))})
    return pd.DataFrame(rows).astype({"n_users_est": "int64"})


def part_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt) — how many DISTINCT suppliers
    ship each surviving part profile (TPC-H Q16 shape, re-based on lineitem
    because the corpus has no partsupp table): part-attribute exclusions
    (brand/type/size) plus a NOT-IN supplier exclusion, then an exact
    count-distinct per bounded attribute group.

    Scale shape: both exclusion sets are bounded catalogs — the eligible
    partkey -> (brand, type, size) map and the excluded suppkey set each
    broadcast ONCE via ``ray.put``; lineitem then does a map-only semi-join
    + per-batch (group, suppkey) drop-duplicates partial, and the single
    all-to-all is a COARSE ``suppkey % 64`` shuffle (same (group, supp)
    pair always co-locates, so the in-group dedup is exact) emitting
    per-bucket partial counts over the bounded brand x type x size lattice;
    the driver folds 64 x |lattice| rows.  Lineitem never moves at full
    width, and no per-distinct-key sort aggregate runs.
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    elig = part[(part["p_brand"] != "Brand#1")
                & (part["p_type"] != "PROMO")
                & (part["p_size"].isin([1, 5, 9, 13, 17, 21, 25, 29]))]
    pmap = {int(k): (b, t, int(s)) for k, b, t, s in zip(
        elig["p_partkey"], elig["p_brand"], elig["p_type"], elig["p_size"])}
    supp = _pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(supp.loc[supp["s_acctbal"] < 1000.0, "s_suppkey"].astype(int))
    pmap_ref = ray.put(pmap)
    bad_ref = ray.put(bad)

    items = read_pruned(_t(sf_dir, "lineitem"), ["l_partkey", "l_suppkey"])

    _PAIR_SCHEMA = pa.schema(
        [("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int64()), ("supp", pa.int64()), ("bucket", pa.int32())]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        pm = ray.get(pmap_ref)
        excl = ray.get(bad_ref)
        df = pd.DataFrame({"pk": t["l_partkey"].to_numpy(),
                           "supp": t["l_suppkey"].to_numpy()})
        df = df[df["pk"].isin(pm.keys()) & ~df["supp"].isin(excl)]
        df = df.drop_duplicates()
        attrs = df["pk"].map(pm)
        out = pd.DataFrame({
            "p_brand": attrs.map(lambda a: a[0]),
            "p_type": attrs.map(lambda a: a[1]),
            "p_size": attrs.map(lambda a: a[2]).astype("int64"),
            "supp": df["supp"].to_numpy(),
        }).drop_duplicates()
        out["bucket"] = (out["supp"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(
            out, schema=_PAIR_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    _CNT_SCHEMA = pa.schema(
        [("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]
    )

    def count_group(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["p_brand", "p_type", "p_size", "supp"])
        c = (d.groupby(["p_brand", "p_type", "p_size"], as_index=False)
             .agg(supplier_cnt=("supp", "size")))
        return pa.Table.from_pandas(
            c, schema=_CNT_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    parts = (
        items.map_batches(pair_partial, batch_format="pyarrow",
                          batch_size=262144)
        .groupby("bucket")
        .map_groups(count_group, batch_format="pandas")
        .to_pandas()  # bounded: 64 buckets x brand/type/size lattice
    )
    out = (parts.groupby(["p_brand", "p_type", "p_size"], as_index=False)
           ["supplier_cnt"].sum())
    return (out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True))


def important_parts(sf_dir: str) -> pd.DataFrame:
    """(l_partkey, value) — parts whose total revenue exceeds 1.5x the MEAN
    per-part revenue (TPC-H Q11 shape: a HAVING clause against a scalar
    subquery over the same aggregate; a mean-multiple threshold is
    scale-free where Q11's fixed fraction must be divided by SF).

    Scale shape: one pass builds per-part revenue partials combined per
    batch, shuffled on the COARSE ``partkey % 64`` bucket; each bucket
    group emits (a) its per-part whole-unit-ROUNDED sums and (b) nothing
    else — the global total and part count are then driver folds of the
    bucket partials over already-rounded integers, so the threshold
    comparison ``value * n * 2 > total * 3`` is pure int64 arithmetic,
    bit-stable under any summation order, and matches the SQL twin
    exactly.  Survivors (the point of the query: a tiny head) are the only
    full-width rows returned.
    """
    items = read_pruned(
        _t(sf_dir, "lineitem"), ["l_partkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        rev = (t["l_extendedprice"].to_numpy()
               * (1.0 - t["l_discount"].to_numpy()))
        df = pd.DataFrame({"key": t["l_partkey"].to_numpy(), "rev": rev})
        g = df.groupby("key", as_index=False)["rev"].sum()
        g["bucket"] = (g["key"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _VAL_SCHEMA = pa.schema([("key", pa.int64()), ("value", pa.int64())])

    def round_group(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("key", as_index=False)["rev"].sum()
        s["value"] = s["rev"].round(0).astype("int64")
        return pa.Table.from_pandas(
            s[["key", "value"]], schema=_VAL_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    vals_ds = (
        items.map_batches(rev_partial, batch_format="pyarrow",
                          batch_size=262144)
        .groupby("bucket")
        .map_groups(round_group, batch_format="pandas")
    )
    # total = sum of already-rounded int64 per-part values (order-free);
    # survivors filter runs distributed so only the head reaches the driver
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    agg = vals_ds.aggregate(_Sum("value", alias_name="v"),
                            _Count(alias_name="n"))
    total, n_parts = int(agg["v"]), int(agg["n"])

    def survivors(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        return t.filter(pa.array(v * n_parts * 2 > total * 3))

    out = (vals_ds.map_batches(survivors, batch_format="pyarrow")
           .to_pandas().rename(columns={"key": "l_partkey"}))
    if "l_partkey" not in out.columns:  # no survivors in any block
        return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="int64")})
    return (out.sort_values(["value", "l_partkey"], ascending=[False, True])
            .reset_index(drop=True))


def converted_clean_users(sf_dir: str, min_value: float = 99.0) -> pd.DataFrame:
    """(user_id) — users with BOTH a high-value 'click' and a high-value
    'purchase' event and NO high-value 'error' event (value > ``min_value``
    on all three legs): the INTERSECT / EXCEPT set-operation shape, computed
    as one distributed bitmask OR-fold instead of three distinct-scans and
    two set joins.

    Scale shape: the value predicate pushes into the parquet read
    (row-group stats prune); each surviving batch ORs per-user presence
    bits (click=1, purchase=2, error=4) into at most |users-in-batch|
    partial rows via a sort + ``np.bitwise_or.reduceat``; ONE coarse
    ``user_id % 64`` shuffle co-locates partials; each group ORs to the
    final mask and filters ``mask & 3 == 3 and mask & 4 == 0`` vectorized.
    Events never move — only (user, int8) partials do — and the three-way
    set algebra costs a single exchange.
    """
    import pyarrow.dataset as pads

    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "event_type", "value"],
                     filter=(pads.field("value") > min_value))
    _BITS = {"click": 1, "purchase": 2, "error": 4}

    _M_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("mask", pa.int8()), ("bucket", pa.int32())]
    )

    def _or_by_user(users: np.ndarray, bits: np.ndarray):
        """Vectorized per-user OR: sort once, reduceat on run boundaries."""
        order = np.argsort(users, kind="stable")
        u, b = users[order], bits[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return u[starts], np.bitwise_or.reduceat(b, starts)

    def mask_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        bits = np.zeros(len(et), np.int8)
        for name, b in _BITS.items():
            bits[et == name] = b
        users = t["user_id"].to_numpy()[bits != 0]
        bits = bits[bits != 0]
        if len(users) == 0:
            return _M_SCHEMA.empty_table()
        u, m = _or_by_user(users, bits)
        return pa.table(
            {"user_id": pa.array(u, pa.int64()),
             "mask": pa.array(m, pa.int8()),
             "bucket": pa.array((u % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_M_SCHEMA)

    _OUT_SCHEMA = pa.schema([("user_id", pa.int64())])

    def fold(g: pd.DataFrame) -> pa.Table:
        u, m = _or_by_user(g["user_id"].to_numpy(),
                           g["mask"].to_numpy().astype(np.int8))
        keep = u[(m & 3 == 3) & (m & 4 == 0)]
        return pa.table({"user_id": pa.array(np.sort(keep), pa.int64())},
                        schema=_OUT_SCHEMA)

    out = (
        ds.map_batches(mask_partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
    return out.sort_values("user_id").reset_index(drop=True)


def events_late_arrivals(sf_dir: str, late_us: int = 3_600_000_000,
                         n_ranges: int = 64) -> pd.DataFrame:
    """(event_type, n_late, n_events) — out-of-order (event-time vs
    arrival-order) detection: an event is LATE when its timestamp trails
    the running maximum timestamp of everything that arrived before it
    (arrival order = event_id) by more than ``late_us``.  The watermark
    primitive every streaming window needs before it can close.

    Scale shape: a GLOBAL prefix-max scan, distributed as the classic
    two-phase scan — range-partition on event_id (contiguous ranges, so
    prefix semantics survive the split), per-range max to the driver
    (n_ranges rows), driver exclusive-scans those offsets, then one
    map-only pass re-reads each range with its carry-in watermark and
    flags stragglers vectorized (np.maximum.accumulate).  Only bounded
    (type, count) partials leave the second pass.
    """
    import pyarrow.dataset as pads

    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "ts", "event_type"])
    hi = int(ds.max("event_id")) + 1

    _R_SCHEMA = pa.schema([("rng", pa.int32()), ("mx", pa.int64())])

    def range_max(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        tsi = pc.cast(t["ts"], pa.int64()).to_numpy()
        rng = (ids * n_ranges // hi).astype(np.int32)
        df = pd.DataFrame({"rng": rng, "mx": tsi})
        g = df.groupby("rng", as_index=False)["mx"].max()
        return pa.Table.from_pandas(
            g, schema=_R_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    rmax = (ds.map_batches(range_max, batch_format="pyarrow",
                           batch_size=262144)
            .to_pandas().groupby("rng")["mx"].max())
    # -2^62 sentinel (NOT int64 min: ``prev - tsi`` must stay well-negative
    # for never-seen prefixes, and int64min - ts would wrap positive)
    _NEG = -(1 << 62)
    carry = np.full(n_ranges, _NEG, np.int64)
    run = _NEG
    for r in range(n_ranges):
        carry[r] = run
        if r in rmax.index:
            run = max(run, int(rmax.loc[r]))
    carry_ref = ray.put(carry)

    _P_SCHEMA = pa.schema(
        [("rng", pa.int32()), ("event_type", pa.string()),
         ("n_late", pa.int64()), ("n_events", pa.int64())]
    )

    def flag_group(g: pd.DataFrame) -> pa.Table:
        cr = ray.get(carry_ref)
        g = g.sort_values("event_id", kind="mergesort")
        tsi = g["tsi"].to_numpy()
        prev = np.empty(len(tsi), np.int64)
        prev[0] = cr[int(g["rng"].iloc[0])]
        if len(tsi) > 1:
            prev[1:] = np.maximum.accumulate(tsi)[:-1]
            prev[1:] = np.maximum(prev[1:], prev[0])
        late = prev - tsi > late_us
        out = (pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                             "late": late})
               .groupby("event_type", as_index=False)
               .agg(n_late=("late", "sum"), n_events=("late", "size")))
        out.insert(0, "rng", int(g["rng"].iloc[0]))
        return pa.Table.from_pandas(
            out.astype({"rng": "int32", "n_late": "int64",
                        "n_events": "int64"}),
            schema=_P_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    def add_rng(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        return pa.table({
            "event_id": t["event_id"],
            "tsi": pa.array(pc.cast(t["ts"], pa.int64()).to_numpy(), pa.int64()),
            "event_type": t["event_type"],
            "rng": pa.array((ids * n_ranges // hi).astype(np.int32), pa.int32()),
        })

    parts = (
        ds.map_batches(add_rng, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(flag_group, batch_format="pandas")
        .to_pandas()
    )
    out = (parts.groupby("event_type", as_index=False)
           [["n_late", "n_events"]].sum())
    return out.sort_values("event_type").reset_index(drop=True)


def potential_promotion_suppliers(sf_dir: str, prefix: str = "blue",
                                  min_qty: float = 400.0) -> pd.DataFrame:
    """(s_suppkey, s_name, total_qty) — suppliers who shipped more than
    ``min_qty`` total quantity of parts whose name starts with ``prefix``
    (TPC-H Q20 shape: nested IN subqueries collapsed into a semi-join
    chain + HAVING).

    Scale shape: the part-name predicate resolves against the bounded part
    catalog and broadcasts as a partkey set; lineitem does a map-only
    semi-join + per-batch (suppkey, qty) combine; ONE coarse
    ``suppkey % 64`` exchange sums per supplier and applies the HAVING
    inside the group (whole-unit-rounded so rank and filter are
    summation-order stable); winners attach names from the bounded
    supplier catalog on the driver.
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(_t(sf_dir, "part"),
                          columns=["p_partkey", "p_name"]).to_pandas()
    keys = set(part.loc[part["p_name"].str.startswith(prefix),
                        "p_partkey"].astype(int))
    keys_ref = ray.put(keys)

    items = read_pruned(_t(sf_dir, "lineitem"),
                        ["l_partkey", "l_suppkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        df = pd.DataFrame({"pk": t["l_partkey"].to_numpy(),
                           "key": t["l_suppkey"].to_numpy(),
                           "qty": t["l_quantity"].to_numpy()})
        df = df[df["pk"].isin(k)]
        g = df.groupby("key", as_index=False)["qty"].sum()
        g["bucket"] = (g["key"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _W_SCHEMA = pa.schema([("key", pa.int64()), ("total_qty", pa.int64())])

    def having(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("key", as_index=False)["qty"].sum()
        s["total_qty"] = s["qty"].round(0).astype("int64")
        s = s[s["total_qty"] > min_qty]
        return pa.Table.from_pandas(
            s[["key", "total_qty"]], schema=_W_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    winners = (
        items.map_batches(qty_partial, batch_format="pyarrow",
                          batch_size=262144)
        .groupby("bucket")
        .map_groups(having, batch_format="pandas")
        .to_pandas()
    )
    if "key" not in winners.columns:  # no supplier cleared the HAVING
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "total_qty": pd.Series([], dtype="int64")})
    supp = _pq.read_table(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, left_on="key", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "total_qty"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


def local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                           date_lo: str = "1995-01-01",
                           date_hi: str = "1999-01-01") -> pd.DataFrame:
    """(n_name, revenue_cents) — TPC-H Q5 shape: revenue from orders where
    the CUSTOMER and the shipping SUPPLIER sit in the SAME nation of one
    region, over a date window.  The same-key-on-both-sides join predicate
    (``c_nationkey = s_nationkey``) is what distinguishes Q5 from a plain
    star join.

    Scale shape: nation/region are driver-side constants; the supplier and
    customer nation maps are bounded-catalog broadcasts (``ray.put`` once,
    region non-members dropped at broadcast build time so both fact scans
    prefilter map-side).  The date window pushes into the orders parquet
    read.  The ONE big x big exchange is the orderkey-bucket union join
    (volume_shipping's idiom): order rows carry c_nat, lineitem rows carry
    (s_nat, cents) pre-combined per batch, the in-group merge keeps
    ``s_nat == c_nat`` rows only, and what leaves the groups is
    nation-sized count partials.  Revenue is per-row integer CENTS before
    any sum — order-free, hash-exact at any parallelism.
    """
    import pyarrow.parquet as _pq
    import pyarrow.dataset as pads

    nation = _pq.read_table(_t(sf_dir, "nation")).to_pandas()
    reg = _pq.read_table(_t(sf_dir, "region")).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nkeys = set(nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int))
    n_name = {int(k): v for k, v in zip(nation["n_nationkey"], nation["n_name"])}

    supp = _pq.read_table(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"]).to_pandas()
    snat = {int(k): int(v) for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
            if int(v) in nkeys}
    cust = _pq.read_table(_t(sf_dir, "customer"),
                          columns=["c_custkey", "c_nationkey"]).to_pandas()
    cnat = {int(k): int(v) for k, v in zip(cust["c_custkey"], cust["c_nationkey"])
            if int(v) in nkeys}
    snat_ref, cnat_ref = ray.put(snat), ray.put(cnat)

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)
    orders = read_pruned(
        _t(sf_dir, "orders"), ["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)))
    items = read_pruned(
        _t(sf_dir, "lineitem"),
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    NB = 32
    _J_SCHEMA = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()), ("nat", pa.int32()),
         ("cents", pa.int64()), ("bucket", pa.int32())]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        cm = ray.get(cnat_ref)
        keys = t["o_orderkey"].to_numpy()
        nat = pd.Series(t["o_custkey"].to_numpy()).map(cm)
        keep = nat.notna().to_numpy()
        keys = keys[keep]
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
             "nat": pa.array(nat.to_numpy()[keep].astype(np.int32), pa.int32()),
             "cents": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
             "bucket": pa.array((keys % NB).astype(np.int32), pa.int32())},
            schema=_J_SCHEMA)

    def item_partials(t: pa.Table) -> pa.Table:
        sm = ray.get(snat_ref)
        nat = pd.Series(t["l_suppkey"].to_numpy()).map(sm)
        keep = nat.notna().to_numpy()
        ext = t["l_extendedprice"].to_numpy()[keep]
        dis = t["l_discount"].to_numpy()[keep]
        cents = np.floor(ext * (1.0 - dis) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"key": t["l_orderkey"].to_numpy()[keep],
                           "nat": nat.to_numpy()[keep].astype(np.int32),
                           "cents": cents})
        g = df.groupby(["key", "nat"], as_index=False)["cents"].sum()
        keys = g["key"].to_numpy()
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "side": pa.array(np.ones(len(keys), np.int8), pa.int8()),
             "nat": pa.array(g["nat"].to_numpy(), pa.int32()),
             "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
             "bucket": pa.array((keys % NB).astype(np.int32), pa.int32())},
            schema=_J_SCHEMA)

    _P_SCHEMA = pa.schema([("nat", pa.int32()), ("cents", pa.int64())])

    def join_group(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0][["key", "nat"]].rename(columns={"nat": "c_nat"})
        right = g[g["side"] == 1][["key", "nat", "cents"]]
        m = right.merge(left, on="key", how="inner")
        m = m[m["nat"] == m["c_nat"]]
        out = m.groupby("nat", as_index=False)["cents"].sum()
        return pa.Table.from_pandas(
            out[["nat", "cents"]].astype({"nat": "int32", "cents": "int64"}),
            schema=_P_SCHEMA, preserve_index=False).replace_schema_metadata(None)

    parts = (
        orders.map_batches(order_rows, batch_format="pyarrow")
        .union(items.map_batches(item_partials, batch_format="pyarrow",
                                 batch_size=65536))
        .groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("nat", as_index=False)["cents"].sum()
    out["n_name"] = out["nat"].map(n_name)
    out = out.rename(columns={"cents": "revenue_cents"})
    return (out[["n_name", "revenue_cents"]]
            .sort_values(["revenue_cents", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def customer_yoy_revenue(sf_dir: str,
                         year_a: int = 1999, year_b: int = 2000) -> pd.DataFrame:
    """(c_custkey, rev_a_cents, rev_b_cents, status) — year-over-year
    customer revenue: every customer active in EITHER year, with their
    order-total cents in each and a churned / new / retained verdict —
    the FULL OUTER JOIN shape (two aggregates COALESCEd over the union of
    key sets) the join family lacked.

    Scale shape: both years come out of ONE orders scan — each batch
    vectorizes the year test into (custkey, rev_a, rev_b) integer-cent
    partials (at most one row per distinct custkey per batch per side),
    and the single all-to-all is the coarse ``custkey % 64`` exchange;
    groups sum and classify vectorized, so the FULL OUTER semantics cost
    exactly one narrow shuffle and no distinct-key sort aggregate.  Cents
    round per ROW before any sum — order-free, hash-exact.
    """
    import pyarrow.dataset as pads

    lo = pd.Timestamp(f"{year_a}-01-01")
    hi = pd.Timestamp(f"{year_b + 1}-01-01")
    mid = pd.Timestamp(f"{year_b}-01-01")
    orders = read_pruned(
        _t(sf_dir, "orders"), ["o_custkey", "o_totalprice", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)))
    mid_us = mid.value // 1000

    _P_SCHEMA = pa.schema(
        [("key", pa.int64()), ("rev_a", pa.int64()), ("rev_b", pa.int64()),
         ("bucket", pa.int32())]
    )

    def partials(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy()
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        in_b = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() >= mid_us
        df = pd.DataFrame({"key": keys,
                           "rev_a": np.where(in_b, 0, cents),
                           "rev_b": np.where(in_b, cents, 0)})
        g = df.groupby("key", as_index=False)[["rev_a", "rev_b"]].sum()
        g["bucket"] = (g["key"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(
            g, schema=_P_SCHEMA, preserve_index=False).replace_schema_metadata(None)

    _OUT_SCHEMA = pa.schema(
        [("c_custkey", pa.int64()), ("rev_a_cents", pa.int64()),
         ("rev_b_cents", pa.int64()), ("status", pa.string())]
    )

    def fold(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("key", as_index=False)[["rev_a", "rev_b"]].sum()
        a = s["rev_a"].to_numpy()
        b = s["rev_b"].to_numpy()
        status = np.where(a == 0, "new", np.where(b == 0, "churned", "retained"))
        return pa.table(
            {"c_custkey": pa.array(s["key"].to_numpy(), pa.int64()),
             "rev_a_cents": pa.array(a, pa.int64()),
             "rev_b_cents": pa.array(b, pa.int64()),
             "status": pa.array(status, pa.string())},
            schema=_OUT_SCHEMA)

    out = (
        orders.map_batches(partials, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("c_custkey").reset_index(drop=True)


def event_path_counts(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """(path, n_users) — user-journey prefixes: each user's FIRST ``k``
    events (by ts, ties by event_id) concatenated ``type>type>...``, counted
    across users — the ordered-collect (string_agg) shape reduced to a
    bounded frequency table, the funnel family's free-form sibling.

    Scale shape: the per-user first-k is a per-batch PARTIAL top-k (each
    batch keeps at most k narrow (user, ts, event_id, type) rows per user
    it sees — a vectorized groupby-head over the sorted batch), so the ONE
    coarse ``user_id % 64`` exchange carries ~k rows per user per block,
    not the event stream; groups re-sort their <= k*blocks rows per user,
    assemble path strings vectorized, and emit bounded (path, count)
    partials the driver folds.
    """
    events = read_pruned(_t(sf_dir, "events"),
                         ["event_id", "ts", "user_id", "event_type"])

    _P_SCHEMA = pa.schema(
        [("user_id", pa.int64()), ("tsi", pa.int64()), ("event_id", pa.int64()),
         ("event_type", pa.string()), ("bucket", pa.int32())]
    )

    def head_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "tsi": pc.cast(t["ts"], pa.int64()).to_numpy(),
            "event_id": t["event_id"].to_numpy(),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["user_id", "tsi", "event_id"], kind="mergesort")
        df = df.groupby("user_id", as_index=False, sort=False).head(k)
        df["bucket"] = (df["user_id"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(
            df, schema=_P_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    _C_SCHEMA = pa.schema([("path", pa.string()), ("n_users", pa.int64())])

    def fold(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "tsi", "event_id"], kind="mergesort")
        g = g.groupby("user_id", as_index=False, sort=False).head(k)
        paths = g.groupby("user_id", sort=False)["event_type"].agg(">".join)
        out = paths.value_counts().reset_index()
        out.columns = ["path", "n_users"]
        return pa.Table.from_pandas(
            out.astype({"n_users": "int64"}), schema=_C_SCHEMA,
            preserve_index=False).replace_schema_metadata(None)

    parts = (
        events.map_batches(head_partial, batch_format="pyarrow",
                           batch_size=262144)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("path", as_index=False)["n_users"].sum()
    return (out.sort_values(["n_users", "path"], ascending=[False, True])
            .reset_index(drop=True))


def _skyline_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (maximize price, minimize date).

    A row is dominated iff some other row has (price >=, date <=) with at
    least one strict inequality.  Vectorized: sort by (price desc, date
    asc); a row survives iff its date is strictly below the min date of all
    STRICTLY-higher-price rows AND equals the min date within its own price
    group (equal (price, date) duplicates all survive — neither dominates).
    """
    n = len(price)
    order = np.lexsort((date, -price))
    p_s, d_s = price[order], date[order]
    new_grp = np.r_[True, p_s[1:] != p_s[:-1]]
    grp_id = np.cumsum(new_grp) - 1
    grp_min = d_s[new_grp]                      # min date per price group
    prev_min = np.r_[np.iinfo(np.int64).max,
                     np.minimum.accumulate(grp_min)[:-1]]
    kept_sorted = (d_s < prev_min[grp_id]) & (d_s == grp_min[grp_id])
    mask = np.zeros(n, dtype=bool)
    mask[order] = kept_sorted
    return mask


def order_skyline(sf_dir: str) -> pd.DataFrame:
    """(o_orderkey, price_cents, o_orderdate) — the Pareto frontier of
    orders: no other order has totalprice >= AND orderdate <= with a strict
    inequality somewhere ("largest-earliest" orders).  The multi-criteria
    shape (skyline / maximal-vector query) the top-k family can't express —
    a different kind of extreme-point pruning than any single sort order.

    Scale shape: the skyline operator is the textbook lossless-prune
    distributed aggregate — dominance is transitive, so every block's LOCAL
    skyline is a superset of its contribution to the global one; per-batch
    vectorized skylines (sort + grouped prefix-min, no pairwise loop) cut
    each block to its frontier, and one constant-bucket map_groups resolves
    the exact global frontier over the union of the (small) local
    frontiers.  Prices compare in exact integer cents (``floor(x*100+0.5)``,
    the repo-wide discipline), dates as int64 epoch-us — no float anywhere
    in the dominance test.
    """
    ds = read_pruned(_t(sf_dir, "orders"),
                     ["o_orderkey", "o_totalprice", "o_orderdate"])

    _ROW = pa.schema([("o_orderkey", pa.int64()), ("price_cents", pa.int64()),
                      ("date_us", pa.int64()), ("bucket", pa.int32())])

    def local_skyline(t: pa.Table) -> pa.Table:
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        dus = pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
        keep = _skyline_mask(cents, dus)
        keys = t["o_orderkey"].to_numpy()[keep]
        return pa.table(
            {"o_orderkey": pa.array(keys, pa.int64()),
             "price_cents": pa.array(cents[keep], pa.int64()),
             "date_us": pa.array(dus[keep], pa.int64()),
             "bucket": pa.array(np.zeros(len(keys), np.int32), pa.int32())},
            schema=_ROW)

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("price_cents", pa.int64()),
                      ("o_orderdate", pa.timestamp("us"))])

    def global_skyline(g: pd.DataFrame) -> pa.Table:
        p = g["price_cents"].to_numpy()
        d = g["date_us"].to_numpy()
        keep = _skyline_mask(p, d)
        return pa.table(
            {"o_orderkey": pa.array(g["o_orderkey"].to_numpy()[keep], pa.int64()),
             "price_cents": pa.array(p[keep], pa.int64()),
             "o_orderdate": pa.array(
                 d[keep].astype("datetime64[us]"), pa.timestamp("us"))},
            schema=_OUT)

    out = (
        ds.map_batches(local_skyline, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(global_skyline, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["price_cents", "o_orderkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def event_type_correlations(sf_dir: str) -> pd.DataFrame:
    """(type_a, type_b, n_hours, sum_a, sum_b, sum_ab, sum_sq_a, sum_sq_b)
    — exact integer cross-moments of the per-hour event-count time series
    for every unordered pair of event types (the sufficient statistics of
    Pearson correlation; the caller can form r without the engine ever
    touching a float).  "Do purchases and clicks co-move hour by hour?" —
    the time-series co-movement question the per-type stats family can't
    answer.  The hour universe is every hour with >= 1 event of ANY type;
    a type absent from an hour counts 0 there.

    Scale shape: the event stream reduces per batch to (hour, type, count)
    partials; ONE coarse hour-bucket all-to-all co-locates each hour's
    full type vector; in-bucket the counts pivot to an (hours x types)
    integer matrix whose C.T @ C yields all pairwise products at once —
    every bucket emits exactly T(T-1)/2 bounded partial rows, and the
    driver reduce is pair-count-sized.  The (tiny, bounded) type list is
    discovered with one count groupby and broadcast in the closure.
    """
    HOUR_US = 3_600_000_000

    # type universe: per-batch distinct partial (bounded enum), NOT a full
    # groupby all-to-all — the 50M-event smoke spent half its wall there
    types = sorted(
        read_pruned(_t(sf_dir, "events"), ["event_type"])
        .map_batches(
            lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
            batch_format="pyarrow")
        .to_pandas()["event_type"].unique()
    )
    t_index = {t: i for i, t in enumerate(types)}
    T = len(types)
    ia, ib = np.triu_indices(T, k=1)

    events = read_pruned(_t(sf_dir, "events"), ["ts", "event_type"])

    _P = pa.schema([("hr", pa.int64()), ("ti", pa.int8()), ("c", pa.int64()),
                    ("bucket", pa.int32())])

    def hour_partials(t: pa.Table) -> pa.Table:
        hrs = pc.cast(t["ts"], pa.int64()).to_numpy() // HOUR_US
        ti = pd.Categorical(
            t["event_type"].to_pandas(), categories=types
        ).codes.astype(np.int8)
        key = hrs * T + ti
        uk, cnt = np.unique(key, return_counts=True)
        hr_u = uk // T
        return pa.table(
            {"hr": pa.array(hr_u, pa.int64()),
             "ti": pa.array((uk % T).astype(np.int8), pa.int8()),
             "c": pa.array(cnt.astype(np.int64), pa.int64()),
             "bucket": pa.array((hr_u % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_P)

    _X = pa.schema([("pi", pa.int32()), ("n_hours", pa.int64()),
                    ("sum_a", pa.int64()), ("sum_b", pa.int64()),
                    ("sum_ab", pa.int64()), ("sum_sq_a", pa.int64()),
                    ("sum_sq_b", pa.int64())])

    def cross_moments(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["hr", "ti"], as_index=False)["c"].sum()
        hr_codes, hr_u = pd.factorize(s["hr"].to_numpy(), sort=False)
        C = np.zeros((len(hr_u), T), dtype=np.int64)
        C[hr_codes, s["ti"].to_numpy()] = s["c"].to_numpy()
        M = C.T @ C                                     # all pairwise sums
        col = C.sum(axis=0)
        return pa.table(
            {"pi": pa.array(np.arange(len(ia), dtype=np.int32), pa.int32()),
             "n_hours": pa.array(np.full(len(ia), len(hr_u), np.int64),
                                 pa.int64()),
             "sum_a": pa.array(col[ia], pa.int64()),
             "sum_b": pa.array(col[ib], pa.int64()),
             "sum_ab": pa.array(M[ia, ib], pa.int64()),
             "sum_sq_a": pa.array(M[ia, ia], pa.int64()),
             "sum_sq_b": pa.array(M[ib, ib], pa.int64())},
            schema=_X)

    parts = (
        events.map_batches(hour_partials, batch_format="pyarrow",
                           batch_size=262144)
        .groupby("bucket")
        .map_groups(cross_moments, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("pi", as_index=False)[
        ["n_hours", "sum_a", "sum_b", "sum_ab", "sum_sq_a", "sum_sq_b"]
    ].sum()
    agg = agg.sort_values("pi").reset_index(drop=True)
    out = pd.DataFrame(
        {"type_a": [types[i] for i in ia[agg["pi"].to_numpy()]],
         "type_b": [types[i] for i in ib[agg["pi"].to_numpy()]],
         "n_hours": agg["n_hours"].to_numpy(),
         "sum_a": agg["sum_a"].to_numpy(),
         "sum_b": agg["sum_b"].to_numpy(),
         "sum_ab": agg["sum_ab"].to_numpy(),
         "sum_sq_a": agg["sum_sq_a"].to_numpy(),
         "sum_sq_b": agg["sum_sq_b"].to_numpy()})
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


SMALL_CYCLE_ROWS = 100_000  # below this the doubling runs driver-side


def redirect_cycles(sf_dir: str, n_buckets: int = 64,
                    max_rounds: int = 64) -> pd.DataFrame:
    """(doc_id, cycle_id) — cycle structure of the FUNCTIONAL redirect
    graph ``v -> (v*31 + 1) % n`` (every page redirects to exactly one
    target; the affine map is a permutation whenever gcd(31, n) = 1,
    asserted): cycle_id = the smallest doc on v's cycle.  The
    redirect-loop detector a crawler needs — a chain of 301s that returns
    to itself must be recognized as ONE group, and at web scale you cannot
    walk chains sequentially.

    Algorithm: pointer DOUBLING with running-min — state (v, p, m) where
    after round k, ``p = f^(2^k)(v)`` and ``m = min over the first 2^k
    path nodes``; each round every v fetches (p', m') from its current p
    in ONE coarse v-bucket exchange (the CC value+request attach idiom)
    and contracts ``p <- p'(p), m <- min(m, m(p))``.  Windows double, so
    the longest cycle L converges in ceil(log2 L) rounds, detected by the
    monotone-sum witness (m only ever decreases; two equal global sums =
    every window already covers its cycle — the proof is in the CC loop's
    docstring, adapted: while 2^k < L some node's window first reaches the
    cycle min that round, so the sum strictly drops).  The driver holds
    only the scalar sums; state stays a Dataset of n rows.

    Oracle: recursive-CTE forward closure (the cycle IS the reachable set
    of a permutation node) with min aggregation — exact at both sf scales.

    Below SMALL_CYCLE_ROWS the same doubling runs in numpy on the driver
    (the SMALL_FRONTIER_ROWS escape: ~10 Dataset executions of fixed
    overhead for 500 rows is all overhead); the sequential-reference test
    monkeypatches the threshold to 0 to pin the distributed path, and the
    5M-doc smoke runs it for real.
    """
    import math as _math

    import pyarrow.parquet as _pq

    from ray.data.aggregate import Sum

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    if _math.gcd(31, n) != 1:
        raise NotImplementedError("redirect map is a permutation only when "
                                  "gcd(31, n) == 1")

    if n <= SMALL_CYCLE_ROWS:
        t = read_pruned(_t(sf_dir, "documents"), ["doc_id"]).to_pandas()
        v = np.sort(t["doc_id"].to_numpy())
        assert np.array_equal(v, np.arange(n))  # the redirect map's domain
        P = (v * 31 + 1) % n
        M = np.minimum(v, P)
        prev_s = None
        while True:
            M = np.minimum(M, M[P])
            P = P[P]
            s = int(M.sum())
            if s == prev_s:
                break
            prev_s = s
        return pd.DataFrame({"doc_id": v, "cycle_id": M}).astype(
            {"doc_id": "int64", "cycle_id": "int64"})

    _ST = pa.schema([("v", pa.int64()), ("p", pa.int64()), ("m", pa.int64()),
                     ("bucket", pa.int32())])
    _ROW = pa.schema([("k", pa.int64()), ("v", pa.int64()), ("p", pa.int64()),
                      ("m", pa.int64()), ("side", pa.int8()),
                      ("bucket", pa.int32())])

    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])

    def init_state(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy()
        p = (v * 31 + 1) % n
        m = np.minimum(v, p)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "p": pa.array(p, pa.int64()),
                         "m": pa.array(m, pa.int64()),
                         "bucket": pa.array((v % n_buckets).astype(np.int32),
                                            pa.int32())}, schema=_ST)

    state = ds.map_batches(init_state, batch_format="pyarrow").materialize()

    def rows(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        p = t["p"].to_numpy()
        m = t["m"].to_numpy()
        k = np.concatenate([v, p])                    # values keyed by self,
        side = np.concatenate([np.ones(len(v), np.int8),   # requests by p
                               np.zeros(len(v), np.int8)])
        return pa.table({"k": pa.array(k, pa.int64()),
                         "v": pa.array(np.concatenate([v, v]), pa.int64()),
                         "p": pa.array(np.concatenate([p, p]), pa.int64()),
                         "m": pa.array(np.concatenate([m, m]), pa.int64()),
                         "side": pa.array(side, pa.int8()),
                         "bucket": pa.array((k % n_buckets).astype(np.int32),
                                            pa.int32())}, schema=_ROW)

    def contract(g: pd.DataFrame) -> pa.Table:
        vals = g[g["side"] == 1]
        reqs = g[g["side"] == 0]
        P = pd.Series(vals["p"].to_numpy(), index=vals["k"].to_numpy())
        M = pd.Series(vals["m"].to_numpy(), index=vals["k"].to_numpy())
        v = reqs["v"].to_numpy()
        newp = reqs["k"].map(P).to_numpy()
        newm = np.minimum(reqs["m"].to_numpy(), reqs["k"].map(M).to_numpy())
        return pa.table({"v": pa.array(v, pa.int64()),
                         "p": pa.array(newp.astype(np.int64), pa.int64()),
                         "m": pa.array(newm.astype(np.int64), pa.int64()),
                         "bucket": pa.array((v % n_buckets).astype(np.int32),
                                            pa.int32())}, schema=_ST)

    prev = None
    for _ in range(max_rounds):
        state = (state.map_batches(rows, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(contract, batch_format="pandas")
                 .materialize())
        s = int(state.aggregate(Sum("m"))["sum(m)"])
        if s == prev:
            break
        prev = s

    out = (state.map_batches(
        lambda t: pa.table({"doc_id": t["v"], "cycle_id": t["m"]}),
        batch_format="pyarrow").to_pandas())
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "cycle_id": "int64"}))


def session_length_histogram(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """(n_events, n_sessions) — the distribution of session LENGTHS (events
    per session) over the 30-minute-gap sessionization: the engagement-depth
    histogram product analytics reads next to sessionize_events' raw
    windows (the composition shape: a distributed op consumed as INPUT to a
    second aggregation without ever collecting the intermediate).

    Scale shape: session rows stream straight off _sessionize_events_ds
    (never collected); each block emits per-batch (n_events, count)
    combined partials — session lengths are small integers, so the partial
    set is bounded — and the driver sums a histogram-sized frame.
    """
    ds = _sessionize_events_ds(sf_dir, gap_minutes)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy()
        vals, cnts = np.unique(n, return_counts=True)
        return pa.table({"n_events": pa.array(vals, pa.int64()),
                         "n_sessions": pa.array(cnts.astype(np.int64), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("n_events", as_index=False)["n_sessions"].sum()
    return (out.sort_values("n_events").reset_index(drop=True)
            .astype({"n_events": "int64", "n_sessions": "int64"}))


ZORDER_BITS = 8        # per-dimension Morton resolution
ZORDER_SHARD_BITS = 4  # shards = top 4 interleaved bits (16 files)


def zorder_layout_events(sf_dir: str, out_dir: str | None = None) -> pd.DataFrame:
    """(shard, n_rows, min_user, max_user, min_hour, max_hour) — the events
    table rewritten in Z-ORDER (Morton) layout: rows cluster by the
    interleaved bits of the scaled (user_id, hour) pair, one consolidated
    parquet file per shard = the top ZORDER_SHARD_BITS Morton bits.  The
    data-layout half of "prune at the read": a single-column sort prunes
    one predicate; Z-order keeps BOTH a user-range and a time-range
    predicate selective against the same files (each shard is a quad-tree
    cell, so its [min,max] box is tight on both dimensions) — the
    clustering idiom lakehouse tables use at 100 TB.

    Bins are MONOTONE scaled ranks (``ub = user_id * 2^B // (max_user+1)``,
    ``tb = (hour - min_hour) * 2^B // n_hours``) so range predicates map to
    bin ranges and box pruning is sound.  The returned manifest is an exact
    integer function of the data — the DuckDB oracle recomputes it from the
    same generated Morton expression (oracles.zorder_manifest_sql), so the
    layout's bookkeeping is hash-checked even though the files are not SQL.

    Scale shape: one scalar min/max reduce, one map pass computing codes
    vectorized (numpy bit ops), ONE shard-keyed all-to-all moving each row
    once; each shard group writes its own file atomically (tmp + rename,
    the export-sink convention) and emits its manifest row.  The pytest
    additionally locks the pruning property: a joint (user, hour) box
    predicate touches a strict subset of shards.
    """
    import os as _os

    import pyarrow.parquet as _pq_mod

    from ray.data.aggregate import Max, Min

    B = ZORDER_BITS
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "user_id", "ts", "value"])

    def hour_col(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        hh = (h.to_numpy() // 3_600_000_000).astype(np.int64)  # hour index
        return t.append_column("hour", pa.array(hh, pa.int64()))

    withh = ds.map_batches(hour_col, batch_format="pyarrow").materialize()
    agg = withh.aggregate(Max("user_id"), Min("hour"), Max("hour"))
    max_user = int(agg["max(user_id)"])
    min_hour, max_hour = int(agg["min(hour)"]), int(agg["max(hour)"])
    n_hours = max_hour - min_hour + 1

    if out_dir is None:
        out_dir = _os.path.join("/tmp", "zorder_events",
                                _os.path.abspath(sf_dir).strip("/").replace("/", "_"))
    _os.makedirs(out_dir, exist_ok=True)

    def code(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        h = t["hour"].to_numpy()
        ub = (u * (1 << B)) // (max_user + 1)
        tb = ((h - min_hour) * (1 << B)) // n_hours
        m = np.zeros(len(u), np.int64)
        for i in range(B):
            m |= ((ub >> i) & 1) << (2 * i)
            m |= ((tb >> i) & 1) << (2 * i + 1)
        shard = (m >> (2 * B - ZORDER_SHARD_BITS)).astype(np.int32)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "value": t["value"],
                         "hour": t["hour"], "morton": pa.array(m, pa.int64()),
                         "shard": pa.array(shard, pa.int32())})

    _MAN = pa.schema([("shard", pa.int64()), ("n_rows", pa.int64()),
                      ("min_user", pa.int64()), ("max_user", pa.int64()),
                      ("min_hour", pa.int64()), ("max_hour", pa.int64())])

    def write_shard(g: pd.DataFrame) -> pa.Table:
        s = int(g["shard"].iloc[0])
        gs = g.sort_values(["morton", "event_id"], kind="mergesort")
        path = _os.path.join(out_dir, f"shard={s:02d}.parquet")
        tmp = path + ".tmp"
        _pq_mod.write_table(
            pa.Table.from_pandas(
                gs[["event_id", "user_id", "ts", "value"]],
                preserve_index=False).replace_schema_metadata(None), tmp)
        _os.replace(tmp, path)
        return pa.table(
            {"shard": pa.array([s], pa.int64()),
             "n_rows": pa.array([len(gs)], pa.int64()),
             "min_user": pa.array([int(gs["user_id"].min())], pa.int64()),
             "max_user": pa.array([int(gs["user_id"].max())], pa.int64()),
             "min_hour": pa.array([int(gs["hour"].min())], pa.int64()),
             "max_hour": pa.array([int(gs["hour"].max())], pa.int64())},
            schema=_MAN)

    out = (withh.map_batches(code, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(write_shard, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("shard").reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


JOIN_CMS_DEPTH = 4
JOIN_CMS_WIDTH = 1024


def join_size_estimate(sf_dir: str, depth: int = JOIN_CMS_DEPTH,
                       width: int = JOIN_CMS_WIDTH) -> pd.DataFrame:
    """(name, value) — the join-cardinality estimation a distributed
    planner runs BEFORE committing to a shuffle strategy: the exact
    |orders JOIN lineitem ON orderkey| next to its count-min-sketch
    INNER-PRODUCT estimate (Alon-Matias-Szegedy / Cormode-Muthukrishnan:
    join size = sum_k c_o(k) c_l(k) <= min_d sum_j A[d,j] B[d,j], an upper
    bound that never underestimates).  Both values are exact integer
    functions of the data — the sketch uses the engine's splitmix row
    hashes, so DuckDB recomputes BOTH cell matrices and the estimate
    hash-exactly (generated oracles.join_size_estimate_sql).

    Scale shape: the sketch side is two map-only passes emitting constant
    depth x width count partials per block (one 32 KB matrix per side ever
    reaches the driver — join-size estimation without moving either fact
    table); the exact side combines per-batch (key, n) counts and crosses
    them in ONE coarse orderkey-bucket exchange.
    """
    from .dedup import _mix64

    def cms_partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy().astype(np.uint64)
            cells = np.zeros((depth, width), np.int64)
            for d in range(depth):
                j = (_mix64(_mix64(k) ^ np.uint64(d + 1)) % np.uint64(width)
                     ).astype(np.int64)
                cells[d] = np.bincount(j, minlength=width)
            dd_, jj = np.nonzero(cells)
            return pa.table({"d": pa.array(dd_, pa.int64()),
                             "col": pa.array(jj, pa.int64()),
                             "n": pa.array(cells[dd_, jj], pa.int64())})
        return f

    def cms_matrix(table: str, col: str) -> np.ndarray:
        parts = (read_pruned(_t(sf_dir, table), [col])
                 .map_batches(cms_partial(col), batch_format="pyarrow")
                 .to_pandas())
        m = np.zeros((depth, width), np.int64)
        g = parts.groupby(["d", "col"])["n"].sum()
        idx = np.array([list(i) for i in g.index], dtype=np.int64)
        m[idx[:, 0], idx[:, 1]] = g.to_numpy()
        return m

    A = cms_matrix("orders", "o_orderkey")
    B = cms_matrix("lineitem", "l_orderkey")
    est = int(min(int(A[d] @ B[d]) for d in range(depth)))

    # exact: per-batch (key, n, side) combines, one coarse key-bucket cross
    def side_counts(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy()
            vals, cnts = np.unique(k, return_counts=True)
            return pa.table(
                {"k": pa.array(vals, pa.int64()),
                 "n": pa.array(cnts.astype(np.int64), pa.int64()),
                 "side": pa.array(np.full(len(vals), side, np.int8), pa.int8()),
                 "bucket": pa.array((vals % N_KEY_BUCKETS).astype(np.int32),
                                    pa.int32())})
        return f

    def cross(g: pd.DataFrame) -> pa.Table:
        o = g[g["side"] == 0].groupby("k")["n"].sum()
        l = g[g["side"] == 1].groupby("k")["n"].sum()
        j = o.to_frame("a").join(l.to_frame("b"), how="inner")
        return pa.table({"s": pa.array([int((j["a"] * j["b"]).sum())],
                                       pa.int64())})

    rows = (read_pruned(_t(sf_dir, "orders"), ["o_orderkey"])
            .map_batches(side_counts("o_orderkey", 0), batch_format="pyarrow")
            .union(read_pruned(_t(sf_dir, "lineitem"), ["l_orderkey"])
                   .map_batches(side_counts("l_orderkey", 1),
                                batch_format="pyarrow")))
    exact = int(rows.groupby("bucket")
                .map_groups(cross, batch_format="pandas")
                .to_pandas()["s"].sum())

    return pd.DataFrame({"name": ["cms_estimate", "exact_rows"],
                         "value": np.array([est, exact], np.int64)})


def value_winsorized_stats(sf_dir: str) -> pd.DataFrame:
    """(n_events, p01_cents, p99_cents, winsorized_sum_cents,
    winsorized_mean_cents_milli) — the winsorized mean of events.value:
    values clipped at the EXACT global p01/p99 cent ranks (the 0-based
    ceil(q*n)-1 convention every quantile op here shares) before summing —
    the outlier-robust aggregate monitoring uses when a tail corrupts the
    plain mean (the robust-stats member between value_stats' raw moments
    and value_mad's median world).

    Scale shape: values fix to integer cents and each batch emits (cents,
    n) combined partials through ONE coarse ``cents % 64`` bucket exchange
    (the value_quantiles machinery, ungrouped); the driver consumes the
    bounded distinct-cents histogram — ranks AND the clipped sum both fall
    out of one cumsum, the event stream never co-locates.  All integers;
    the mean is 1000 * sum // n.
    """
    import math

    ds = read_pruned(_t(sf_dir, "events"), ["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        vals, cnts = np.unique(cents, return_counts=True)
        return pa.table(
            {"cents": pa.array(vals, pa.int64()),
             "n": pa.array(cnts.astype(np.int64), pa.int64()),
             "bucket": pa.array((vals % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    _H = pa.schema([("cents", pa.int64()), ("n", pa.int64())])

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("cents", as_index=False)["n"].sum()
        return pa.Table.from_pandas(s[["cents", "n"]], schema=_H,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas")
            .to_pandas().sort_values("cents"))
    vals = hist["cents"].to_numpy()
    cnts = hist["n"].to_numpy()
    cum = cnts.cumsum()
    total = int(cum[-1])

    def q_disc(q: float) -> int:
        return int(vals[np.searchsorted(cum, math.ceil(q * total) - 1 + 1)])

    lo, hi = q_disc(0.01), q_disc(0.99)
    clipped = np.clip(vals, lo, hi)
    wsum = int((clipped * cnts).sum())
    return pd.DataFrame({
        "n_events": [total], "p01_cents": [lo], "p99_cents": [hi],
        "winsorized_sum_cents": [wsum],
        "winsorized_mean_cents_milli": [1000 * wsum // total],
    }).astype("int64")


def _events_global_seq_ds(sf_dir: str):
    """(event_id, seq) Dataset — a contiguous GLOBAL sequence number for every
    event in (ts, event_id) order: distributed zip-with-index, the surrogate
    -key / stable-global-ordering primitive (the same two-phase prefix-sum
    shape the crawl's schedule finalize and pack_sequences run internally,
    exposed as a first-class op).

    Scale shape: pass 1 streams per-batch (hour-bucket, count) partials —
    the hour index is an ORDERED bounded key, so the driver computes the
    exclusive prefix offsets of every bucket from a calendar-sized frame;
    pass 2 is ONE bucket exchange: each group sorts its own rows by
    (ts, event_id) and adds its broadcast offset.  No global sort — the
    all-to-all carries only (event_id, ts, bucket).
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "ts"])

    def hb(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        hh = (h.to_numpy() // 3_600_000_000).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "ts": t["ts"],
                         "hbucket": pa.array(hh, pa.int64())})

    withb = ds.map_batches(hb, batch_format="pyarrow").materialize()

    def counts(t: pa.Table) -> pa.Table:
        vals, cnts = np.unique(t["hbucket"].to_numpy(), return_counts=True)
        return pa.table({"hbucket": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    cdf = (withb.map_batches(counts, batch_format="pyarrow").to_pandas()
           .groupby("hbucket", as_index=False)["n"].sum()
           .sort_values("hbucket"))
    offs = dict(zip(cdf["hbucket"],
                    np.concatenate([[0], cdf["n"].cumsum().to_numpy()[:-1]])))

    _OUT = pa.schema([("event_id", pa.int64()), ("seq", pa.int64())])

    def rank(g: pd.DataFrame) -> pa.Table:
        gs = g.sort_values(["ts", "event_id"], kind="mergesort")
        base = int(offs[int(gs["hbucket"].iloc[0])])
        return pa.table(
            {"event_id": pa.array(gs["event_id"].to_numpy(), pa.int64()),
             "seq": pa.array(base + np.arange(len(gs), dtype=np.int64),
                             pa.int64())}, schema=_OUT)

    return withb.groupby("hbucket").map_groups(rank, batch_format="pandas")


def _events_global_seq_count(sf_dir: str) -> int:
    """Smoke consumer: the 50M-row assignment streams into a count — the
    sequence Dataset never collects on the driver."""
    return _events_global_seq_ds(sf_dir).count()


def events_global_seq(sf_dir: str) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`_events_global_seq_ds` — same
    columns, collected and event_id-sorted."""
    out = _events_global_seq_ds(sf_dir).to_pandas()
    return (out.sort_values("event_id").reset_index(drop=True)
            .astype({"event_id": "int64", "seq": "int64"}))


def link_weighted_paths(sf_dir: str, max_hops: int = 4) -> pd.DataFrame:
    """(doc_id, dist) — multi-source WEIGHTED shortest paths over the shared
    link graph, edge weight ``1 + (splitmix64(u*4 + s) % 9)`` (deterministic
    1..9 per edge), seeds ``doc_id % 100 == 0``, bounded at ``max_hops``
    edges: level-synchronous Bellman-Ford — the weighted relaxation shape
    BFS's unit-depth discovery can't express (a longer-hop path may be
    CHEAPER, so rounds must re-relax every known node, not just a
    frontier).

    Scale shape: per round ONE map pass emits every known (node, dist)
    plus all relaxation candidates (child, dist + w) — per-batch distinct-
    combined — and a coarse ``node % 64`` bucket exchange takes the
    vectorized min (the link_bfs_depth idiom; same no-self-union rule).
    max_hops narrow all-to-alls; the driver never holds the state.

    Oracle: max_hops unrolled relaxation CTEs over the same generated
    weight expression (oracles.weighted_paths_sql) — exact at both scales.
    """
    from .dedup import _mix64

    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])
    n = ds.count()

    def seeds(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids % 100 == 0]
        return pa.table(
            {"node": pa.array(ids, pa.int64()),
             "dist": pa.array(np.zeros(len(ids), np.int64), pa.int64())})

    known = ds.map_batches(seeds, batch_format="pyarrow").materialize()

    _K = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def min_group(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)["dist"].min()
        return pa.Table.from_pandas(
            s, schema=_K, preserve_index=False).replace_schema_metadata(None)

    def relax(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy()
        dists = t["dist"].to_numpy()
        outs = [nodes]
        ds_ = [dists]
        for s in (1, 2, 3):
            child = (nodes * 31 + s) % n
            w = 1 + (_mix64((nodes.astype(np.uint64) * np.uint64(4))
                            + np.uint64(s)) % np.uint64(9)).astype(np.int64)
            outs.append(child)
            ds_.append(dists + w)
        out_n = np.concatenate(outs)
        out_d = np.concatenate(ds_)
        # per-batch combine: keep the min per node before the exchange
        order = np.lexsort((out_d, out_n))
        out_n, out_d = out_n[order], out_d[order]
        first = np.concatenate([[True], out_n[1:] != out_n[:-1]])
        out_n, out_d = out_n[first], out_d[first]
        return pa.table(
            {"node": pa.array(out_n, pa.int64()),
             "dist": pa.array(out_d, pa.int64()),
             "bucket": pa.array((out_n % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    for _ in range(max_hops):
        known = (known.map_batches(relax, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(min_group, batch_format="pandas")
                 .materialize())

    out = known.to_pandas().rename(columns={"node": "doc_id"})
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "dist": "int64"}))


ZPRUNE_USER_HI_PCT = 50   # demo predicate: user_id <= max_user//2
ZPRUNE_HOUR_HI_PCT = 50   # and hour <= midpoint hour


def zorder_pruned_count(sf_dir: str) -> pd.DataFrame:
    """(n_shards_total, n_shards_read, n_rows) — the READ side of the
    Z-order layout: a joint (user-range x hour-range) predicate answered by
    opening ONLY the shard files whose manifest [min, max] boxes intersect
    the predicate box (manifest-driven pruning — the reason the layout
    exists), then filtering the survivors exactly.  The result is the exact
    filtered count plus the file-pruning evidence the optimizer would log.

    Scale shape: the manifest is shard-count-sized (driver frame); the
    pruned read is ``read_parquet`` over the touched files only with the
    residual filter applied vectorized per batch; count partials reduce.
    The oracle recomputes the exact count from the raw table (pruning must
    be LOSSLESS, so n_rows is oracle-checkable; the shard counters are
    exact functions of the manifest, recomputed via the same generated
    Morton SQL).
    """
    import os as _os

    import ray.data as _rd

    out_dir = _os.path.join("/tmp", "zorder_events",
                            _os.path.abspath(sf_dir).strip("/").replace("/", "_"))
    man = zorder_layout_events(sf_dir, out_dir=out_dir)

    # the demo predicate box, derived from the manifest's own extremes
    u_hi = int(man["max_user"].max()) * ZPRUNE_USER_HI_PCT // 100
    lo_h, hi_h = int(man["min_hour"].min()), int(man["max_hour"].max())
    h_hi = lo_h + (hi_h - lo_h) * ZPRUNE_HOUR_HI_PCT // 100

    touched = man[(man["min_user"] <= u_hi) & (man["min_hour"] <= h_hi)]
    files = [_os.path.join(out_dir, f"shard={int(s):02d}.parquet")
             for s in touched["shard"]]

    def count(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        h = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                    pa.int64()).to_numpy() // 3_600_000_000
        return pa.table({"n": pa.array([int(((u <= u_hi) & (h <= h_hi)).sum())],
                                       pa.int64())})

    n_rows = 0
    if files:
        n_rows = int(_rd.read_parquet(files, columns=["user_id", "ts"])
                     .map_batches(count, batch_format="pyarrow")
                     .to_pandas()["n"].sum())
    return pd.DataFrame({"n_shards_total": [len(man)],
                         "n_shards_read": [len(touched)],
                         "n_rows": [n_rows]}).astype("int64")


def _recip_edge_arrays(ids: np.ndarray, n: int):
    """Directed edges of the planted-partner hash link graph shared by
    reciprocal_links and link_prediction_ra: three splitmix64 out-edges
    ``u -> mix64(u*4+j) % n`` (j in 1..3) plus the pair-gated partner edge
    ``u <-> u XOR 1`` iff ``mix64((u>>1)*4) % 4 == 0``; self-loops
    dropped.  Returns (src, dst) int64 arrays."""
    from .dedup import _mix64

    u64 = ids.astype(np.uint64)
    hash_dst = [
        (_mix64(u64 * np.uint64(4) + np.uint64(j)) % np.uint64(n))
        .astype(np.int64)
        for j in (1, 2, 3)
    ]
    gate = (_mix64((u64 >> np.uint64(1)) * np.uint64(4))
            % np.uint64(4)) == 0
    pv = ids ^ 1
    pkeep = gate & (pv < n)
    src = np.concatenate([ids, ids, ids, ids[pkeep]])
    dst = np.concatenate(hash_dst + [pv[pkeep]])
    keep = src != dst
    return src[keep], dst[keep]


def reciprocal_links(sf_dir: str) -> pd.DataFrame:
    """(doc_a, doc_b) — RECIPROCAL link pairs over a hashed doc link graph:
    both directed edges (a -> b) and (b -> a) exist.  The mutual-link ratio
    is a standard web-graph structure statistic (mutual links signal
    navigation templates / sister pages rather than endorsements, so
    link-based ranking treats them differently).

    Graph (generated; the shared affine family has provably ~zero mutual
    edges, so this op gets the planted-signal treatment the ANN tests use):
    three splitmix64 "random" out-edges ``u -> mix64(u*4+j) % n`` (j in
    1..3 — noise, O(1) accidental mutuals) plus a PARTNER edge
    ``u <-> u XOR 1`` present for both members iff
    ``mix64((u>>1)*4) % 4 == 0`` (the gate depends only on the pair index,
    so planted pairs are mutual by construction, ~n/8 of them).  Self-loops
    dropped; the detector has no knowledge of which family an edge is from.

    Scale shape: one narrow all-to-all.  map_batches emits one normalized
    (a=min, b=max, dir) row per generated edge, coarse-bucketed by pair
    hash so BOTH orientations of a pair land in the same group; each group
    keeps pairs whose distinct orientation count is 2 (vectorized
    drop_duplicates + group size).  Only int64 triples move; the driver
    sees just the reciprocal pairs.  Oracle: generated SQL over the same
    splitmix ring (oracles.reciprocal_links_sql).
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])

    _ROW = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                      ("d", pa.int8()), ("bucket", pa.int32())])

    def edge_rows(t: pa.Table) -> pa.Table:
        src, dst = _recip_edge_arrays(t["doc_id"].to_numpy(), n)
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        d = (src > dst).astype(np.int8)  # orientation flag
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
             "d": pa.array(d, pa.int8()),
             "bucket": pa.array(
                 ((a * np.int64(1_000_003) + b) % N_KEY_BUCKETS).astype(np.int32),
                 pa.int32())},
            schema=_ROW)

    _OUT = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def mutual(g: pd.DataFrame) -> pa.Table:
        u = g.drop_duplicates(["a", "b", "d"])
        c = u.groupby(["a", "b"], as_index=False).size()
        c = c[c["size"] == 2]
        return pa.table(
            {"doc_a": pa.array(c["a"].to_numpy(), pa.int64()),
             "doc_b": pa.array(c["b"].to_numpy(), pa.int64())}, schema=_OUT)

    out = (
        ds.map_batches(edge_rows, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(mutual, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return (out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            .astype({"doc_a": "int64", "doc_b": "int64"}))


_TREND_EPOCH_HOURS = 262_968  # hours from 1970-01-01 to 2000-01-01: the
# fixed x-origin that keeps sum(x^2) partials inside int64 at smoke scale


def event_value_trend(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_events, sum_hours, sum_cents, slope_micro) — per-type
    ordinary-least-squares trend of event value (integer cents) against
    event-time (integer hours since 2000-01-01): the grouped-regression
    shape (decomposable cross-moment sums) next to value_stats_per_type's
    plain moments.  slope_micro = floor(1e6 * (n*sxy - sx*sy) /
    (n*sxx - sx*sx)), computed on the driver's |types|-row frame with
    PYTHON ints (arbitrary precision, so the 1e6-scaled numerator can't
    overflow); the oracle mirrors with HUGEINT + an explicit positive-mod
    floor adjustment so DuckDB's truncating division lands on the same
    value.  Degenerate groups (all events in one hour) emit slope 0.

    Scale shape: map-only per-batch (n, sx, sy, sxx, sxy) int64 partials
    per event_type (the decomposable-aggregate idiom), one |types|-sized
    groupby.  The 2000-01-01 x-origin keeps sxx ~ n * (2.3e5)^2 inside
    int64 up to ~1e11 rows; past that the partials would carry a base-2^62
    hi/lo split (the embedding_mahalanobis_outliers treatment).
    """
    ds = read_pruned(_t(sf_dir, "events"), ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = (pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
             .to_numpy() // 3_600_000_000) - _TREND_EPOCH_HOURS
        y = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "x": x, "y": y, "xx": x * x, "xy": x * y})
        g = df.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"))
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    m = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                   Sum("sxy", alias_name="sxy"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    slopes = []
    for _, r in m.iterrows():
        n, sx, sy, sxx, sxy = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxx"]), int(r["sxy"]))
        den = n * sxx - sx * sx
        slopes.append((1_000_000 * (n * sxy - sx * sy)) // den if den else 0)
    return pd.DataFrame(
        {"event_type": m["event_type"],
         "n_events": m["n"].astype("int64"),
         "sum_hours": m["sx"].astype("int64"),
         "sum_cents": m["sy"].astype("int64"),
         "slope_micro": pd.Series(slopes, dtype="int64")})


SCD2_OPEN = 9999  # open-interval sentinel version for current SCD2 rows


def _scd2_history(g: pd.DataFrame) -> pd.DataFrame:
    """Resolve one key-bucket group's (k, cents, op) base+CDC rows into the
    SCD2 validity history (shared by orders_scd2_merge and the AS-OF read)."""
    base = g[g["op"] == "B"][["k", "cents"]]
    upd = g[g["op"] == "U"][["k", "cents"]].rename(columns={"cents": "nc"})
    dele = g[g["op"] == "D"][["k"]]
    ins = g[g["op"] == "I"][["k", "cents"]]
    b = base.merge(upd, on="k", how="left")
    touched = b["nc"].notna() | b["k"].isin(dele["k"])
    rows = [pd.DataFrame({
        "o_orderkey": b["k"], "price_cents": b["cents"],
        "valid_from": 0,
        "valid_to": np.where(touched, 1, SCD2_OPEN),
        "is_current": np.where(touched, 0, 1)})]
    u = b[b["nc"].notna()]
    rows.append(pd.DataFrame({
        "o_orderkey": u["k"], "price_cents": u["nc"].astype(np.int64),
        "valid_from": 1, "valid_to": SCD2_OPEN, "is_current": 1}))
    rows.append(pd.DataFrame({
        "o_orderkey": ins["k"], "price_cents": ins["cents"],
        "valid_from": 1, "valid_to": SCD2_OPEN, "is_current": 1}))
    return pd.concat(rows, ignore_index=True)


def _scd2_rows_ds(sf_dir: str):
    """The bucketed base+CDC (k, cents, op) row union orders_scd2_merge and
    orders_scd2_asof both group — the MERGE INTO input exchange."""
    ds = read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])
    mx = int(ds.max("o_orderkey"))

    _ROW = pa.schema([("k", pa.int64()), ("cents", pa.int64()),
                      ("op", pa.string()), ("bucket", pa.int32())])

    def base_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"k": pa.array(k, pa.int64()), "cents": pa.array(cents, pa.int64()),
             "op": pa.array(["B"] * len(k), pa.string()),
             "bucket": pa.array((k % N_KEY_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    def cdc_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        mu, md, mi = k % 10 == 3, k % 10 == 7, k % 10 == 1
        ks = np.concatenate([k[mu], k[md], k[mi] + mx + 1])
        cs = np.concatenate([cents[mu] + 500, np.zeros(md.sum(), np.int64),
                             cents[mi] + 123])
        ops = ["U"] * int(mu.sum()) + ["D"] * int(md.sum()) + ["I"] * int(mi.sum())
        return pa.table(
            {"k": pa.array(ks, pa.int64()), "cents": pa.array(cs, pa.int64()),
             "op": pa.array(ops, pa.string()),
             "bucket": pa.array((ks % N_KEY_BUCKETS).astype(np.int32), pa.int32())},
            schema=_ROW)

    return (ds.map_batches(base_rows, batch_format="pyarrow", batch_size=262144)
            .union(ds.map_batches(cdc_rows, batch_format="pyarrow",
                                  batch_size=262144)))


def orders_scd2_merge(sf_dir: str) -> pd.DataFrame:
    """(o_orderkey, price_cents, valid_from, valid_to, is_current) — a
    lakehouse MERGE INTO applied as slowly-changing-dimension type 2: a
    deterministic CDC batch (updates for o_orderkey%10==3 at +500 cents,
    deletes for %10==7, inserts keyed past the current max for %10==1 at
    +123 cents) merged against the orders snapshot, emitting full validity
    history — untouched rows stay (0, OPEN, current), updated/deleted base
    rows close at version 1, update/insert rows open at version 1.  The
    upsert idiom every warehouse table-maintenance job runs; versions are
    integers (OPEN = 9999) so the output is hash-exact.

    Scale shape: the CDC side is derived by its own map over the snapshot
    (in production it would be a second table — the merge below never
    exploits the functional relationship); base and CDC rows union into
    ONE key-bucket all-to-all, and each bucket group resolves its keys'
    histories vectorized (left-merge + concat).  Only (key, cents, op)
    int rows move; the driver never holds the table.  The max-key for
    insert keying is a distributed single-column max.
    """
    rows_ds = _scd2_rows_ds(sf_dir)

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("price_cents", pa.int64()),
                      ("valid_from", pa.int64()), ("valid_to", pa.int64()),
                      ("is_current", pa.int64())])

    def merge_group(g: pd.DataFrame) -> pa.Table:
        out = _scd2_history(g)
        return pa.Table.from_pandas(
            out.astype({c: "int64" for c in out.columns}),
            schema=_OUT, preserve_index=False).replace_schema_metadata(None)

    out = (
        rows_ds.groupby("bucket")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["o_orderkey", "valid_from"]).reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def k_core_docs(sf_dir: str, k: int = 4, rounds: int = 6) -> pd.DataFrame:
    """(doc_id, core_degree) — bounded-round k-CORE peeling over a
    variable-degree generated doc graph: each round removes every node
    whose degree among the still-active nodes is < k, for ``rounds``
    rounds (the pagerank fixed-iteration stance — at the test scales 6
    rounds reach the fixpoint; the op is DEFINED as the bounded peel so
    engine and oracle agree at any scale).  Output: survivors with their
    degree restricted to the surviving set.  k-core is the standard
    link-graph denoising step before community detection / PageRank (it
    strips the low-degree fringe a crawler drags in).

    Graph: undirected simple graph from edges ``doc -> (doc*31+s) % n``
    for s in 1..(1 + doc%3) (VARIABLE out-degree — the shared uniform
    family has an empty peel) plus the quadratic ``doc -> (doc^2+1) % n``
    hub edge; self-loops dropped, parallel edges collapse (degree counts
    DISTINCT neighbors).

    Scale shape: peeling is node REMOVAL with degree recompute — the
    iterative shape BFS's monotone frontier growth can't express.  State
    is only the active-node Dataset; per round TWO narrow all-to-alls:
    (1) edges generated from active nodes bucket by dst to membership-test
    the far endpoint against marker rows (src is active by construction);
    survivors emit both orientations re-keyed by node; (2) per-node
    distinct-neighbor degree resolves vectorized in each node bucket and
    emits only nodes with deg >= k.  The driver never holds the node set;
    a final degree pass (with zero-carrier markers so isolated survivors
    keep degree 0) produces the output.  Oracle: `rounds` unrolled
    degree/survivor CTE pairs (oracles.k_core_sql), exact at both scales.
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows

    _EDGE = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                       ("m", pa.int8()), ("bucket", pa.int32())])
    _ORIENT = pa.schema([("node", pa.int64()), ("other", pa.int64()),
                         ("bucket2", pa.int32())])
    _NODE = pa.schema([("node", pa.int64())])
    _OUT = pa.schema([("doc_id", pa.int64()), ("core_degree", pa.int64())])

    def edges_and_markers(t: pa.Table) -> pa.Table:
        ids = t["node"].to_numpy()
        srcs, dsts = [], []
        for s in (1, 2, 3):
            sel = ids[(ids % 3) >= s - 1]
            srcs.append(sel)
            dsts.append((sel * 31 + s) % n)
        srcs.append(ids)
        dsts.append((ids * ids + 1) % n)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        src = np.concatenate([src, ids])            # marker rows: src==dst
        dst = np.concatenate([dst, ids])
        m = np.concatenate([np.zeros(keep.sum(), np.int8),
                            np.ones(len(ids), np.int8)])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
             "m": pa.array(m, pa.int8()),
             "bucket": pa.array((dst % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_EDGE)

    def make_orient(include_zero: bool):
        def orient(g: pd.DataFrame) -> pa.Table:
            mk = g["m"].to_numpy() == 1
            act = g.loc[mk, "dst"].to_numpy()
            e = g.loc[~mk]
            e = e[e["dst"].isin(act)]
            node = np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()])
            other = np.concatenate([e["dst"].to_numpy(), e["src"].to_numpy()])
            if include_zero:
                node = np.concatenate([node, act])
                other = np.concatenate([other, np.full(len(act), -1, np.int64)])
            return pa.table(
                {"node": pa.array(node, pa.int64()),
                 "other": pa.array(other, pa.int64()),
                 "bucket2": pa.array((node % N_KEY_BUCKETS).astype(np.int32),
                                     pa.int32())},
                schema=_ORIENT)
        return orient

    def survivors(g: pd.DataFrame) -> pa.Table:
        e = g.drop_duplicates(["node", "other"])
        deg = e.groupby("node").size()
        keep = deg[deg >= k].index.to_numpy()
        return pa.table({"node": pa.array(keep, pa.int64())}, schema=_NODE)

    def final_degree(g: pd.DataFrame) -> pa.Table:
        e = g[g["other"] >= 0].drop_duplicates(["node", "other"])
        nodes = np.unique(g["node"].to_numpy())
        deg = e.groupby("node").size().reindex(nodes, fill_value=0)
        return pa.table(
            {"doc_id": pa.array(nodes, pa.int64()),
             "core_degree": pa.array(deg.to_numpy().astype(np.int64),
                                     pa.int64())},
            schema=_OUT)

    def all_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"]}, schema=_NODE)

    active = (read_pruned(_t(sf_dir, "documents"), ["doc_id"])
              .map_batches(all_nodes, batch_format="pyarrow")
              .materialize())
    for _ in range(rounds):
        active = (
            active.map_batches(edges_and_markers, batch_format="pyarrow",
                               batch_size=262144)
            .groupby("bucket")
            .map_groups(make_orient(False), batch_format="pandas")
            .groupby("bucket2")
            .map_groups(survivors, batch_format="pandas")
            .materialize()
        )
        if active.count() == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "core_degree": pd.Series([], dtype="int64")})
    out = (
        active.map_batches(edges_and_markers, batch_format="pyarrow",
                           batch_size=262144)
        .groupby("bucket")
        .map_groups(make_orient(True), batch_format="pandas")
        .groupby("bucket2")
        .map_groups(final_degree, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "core_degree": "int64"}))


def butterfly_count_events(sf_dir: str) -> pd.DataFrame:
    """(type_a, type_b, n_users, n_butterflies) — bipartite BUTTERFLY
    (2x2 biclique) counting over the user x event_type graph (edge = user
    emitted that type at least once): for every type pair, the number of
    users adjacent to both, and C(n_users, 2) butterflies through that
    pair.  The butterfly is the bipartite analog of the triangle — the
    standard cohesion motif for user-item / host-resource graphs (Sanei-
    Mehri et al. 2018), counted here per wedge pair exactly.

    Scale shape: per-batch DISTINCT (user, type) partials, ONE user-bucket
    all-to-all; each bucket group re-distincts (global per-user dedup —
    all copies of a user land in one group) and self-merges its users'
    bounded type sets (type vocabulary is a small enum, so <= C(|T|,2)
    pair rows per user) into per-group (type_a, type_b, cnt) partials; the
    driver reduce is pair-count-sized.  Butterfly counts are exact
    integers — C(n,2) = n*(n-1)//2.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "event_type"])

    _ROW = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                      ("bucket", pa.int32())])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "event_type": t["event_type"].to_pandas()})
        df = df.drop_duplicates()
        u = df["user_id"].to_numpy()
        return pa.table(
            {"user_id": pa.array(u, pa.int64()),
             "event_type": pa.array(df["event_type"].to_numpy(), pa.string()),
             "bucket": pa.array((u % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_ROW)

    _P = pa.schema([("type_a", pa.string()), ("type_b", pa.string()),
                    ("cnt", pa.int64())])

    def pair_partial(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["user_id", "event_type"])
        m = g.merge(g, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        c = (m.groupby(["event_type_x", "event_type_y"], as_index=False)
             .size().rename(columns={"size": "cnt"}))
        return pa.table(
            {"type_a": pa.array(c["event_type_x"].to_numpy(), pa.string()),
             "type_b": pa.array(c["event_type_y"].to_numpy(), pa.string()),
             "cnt": pa.array(c["cnt"].to_numpy().astype(np.int64), pa.int64())},
            schema=_P)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(pair_partial, batch_format="pandas")
        .to_pandas()
    )
    if "type_a" not in parts.columns or len(parts) == 0:
        return pd.DataFrame({"type_a": pd.Series([], dtype="object"),
                             "type_b": pd.Series([], dtype="object"),
                             "n_users": pd.Series([], dtype="int64"),
                             "n_butterflies": pd.Series([], dtype="int64")})
    s = parts.groupby(["type_a", "type_b"], as_index=False)["cnt"].sum()
    n = s["cnt"].to_numpy()
    return (pd.DataFrame({"type_a": s["type_a"], "type_b": s["type_b"],
                          "n_users": n.astype(np.int64),
                          "n_butterflies": (n * (n - 1) // 2).astype(np.int64)})
            .sort_values(["type_a", "type_b"]).reset_index(drop=True))


IVM_DELTA_MOD = 20   # event_id % 20 == IVM_DELTA_RES rows form the "late
IVM_DELTA_RES = 3    # batch" the incremental maintenance pass absorbs


def _hourly_slice_partials(sf_dir: str, which: str) -> pd.DataFrame:
    """(event_type, hour_us, n) combined partials over one side of the
    deterministic base/delta split (``event_id % IVM_DELTA_MOD ==
    IVM_DELTA_RES`` is the delta) — the events_hourly pipeline with the
    slice predicate applied inside the map."""
    ds = read_pruned(_t(sf_dir, "events"), ["event_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        m = (eid % IVM_DELTA_MOD) == IVM_DELTA_RES
        if which == "base":
            m = ~m
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas()[m],
             "hour_us": pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                                pa.int64()).to_pandas()[m]})
        g = df.groupby(["event_type", "hour_us"], as_index=False).size().rename(
            columns={"size": "n"})
        g["bucket"] = (g["hour_us"].to_numpy() % N_KEY_BUCKETS).astype(np.int32)
        return _from_pandas(g)

    _H = pa.schema([("event_type", pa.string()), ("hour_us", pa.int64()),
                    ("n", pa.int64())])

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["event_type", "hour_us"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            s, schema=_H, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )


def incremental_events_hourly(sf_dir: str) -> pd.DataFrame:
    """(event_type, hour, n) — the hourly-counts aggregate maintained
    INCREMENTALLY (classic incremental view maintenance): the base slice's
    aggregate is computed once and STORED (/tmp cache keyed on the events
    file's (mtime, size), atomic rename — the materialized view); at query
    time only the DELTA slice (event_id % 20 == 3, the "late batch" —
    in production its own ingest table) is scanned and aggregated, and the
    two aggregate frames merge by +.  Counts are decomposable, so the
    merge is exact; the checked property is that maintenance reproduces
    the FULL recompute (the oracle aggregates everything from scratch).

    Scale shape: the delta aggregation is the events_hourly pipeline
    (per-batch combined partials, one coarse hour-bucket exchange); the
    stored view and the merge are aggregate-sized (|types| x |hours|),
    never event-sized.  A production run would also persist the merged
    view back — elided here so the query stays read-only and rerunnable.
    """
    import hashlib as _hl

    import pyarrow.parquet as _pq

    path = _t(sf_dir, "events")
    st = os.stat(path)
    key = _hl.md5(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|ivm_hourly_v1"
        .encode()).hexdigest()[:16]
    cache_dir = os.path.join("/tmp", "engine_ivm_cache", key)
    base_file = os.path.join(cache_dir, "base_hourly.parquet")
    if not os.path.exists(base_file):
        base = _hourly_slice_partials(sf_dir, "base")
        os.makedirs(cache_dir, exist_ok=True)
        tmp = base_file + ".tmp"
        _pq.write_table(
            pa.Table.from_pandas(base, preserve_index=False)
            .replace_schema_metadata(None), tmp)
        os.replace(tmp, base_file)
    base = pd.read_parquet(base_file)
    delta = _hourly_slice_partials(sf_dir, "delta")
    out = (pd.concat([base, delta], ignore_index=True)
           .groupby(["event_type", "hour_us"], as_index=False)["n"].sum())
    out["hour"] = pd.to_datetime(out["hour_us"], unit="us")
    out["n"] = out["n"].astype("int64")
    return (out[["event_type", "hour", "n"]]
            .sort_values(["event_type", "hour"]).reset_index(drop=True))


def daily_order_ship_balance(sf_dir: str) -> pd.DataFrame:
    """(day, n_orders, order_cents, n_ship, ship_cents) — the FULL OUTER
    join verb: orders placed per day merged against lineitems shipped per
    day.  Ship dates run past the last order date (and may miss early
    days), so both outer sides are genuinely non-empty — the
    reconciliation shape (ledger vs fulfillment) where a missing side must
    surface as an explicit zero row, which inner/left joins silently drop.

    Scale shape: each side is pre-aggregated per batch (one row per day
    per batch, exact integer cents), the two partial streams UNION tagged
    by side, and ONE coarse day-bucket all-to-all resolves the outer merge
    per bucket (all copies of a day, from either side, land in the same
    group) — neither fact table is ever joined row-to-row.  The driver
    sees only |days| rows.
    """
    orders = read_pruned(_t(sf_dir, "orders"), ["o_orderdate", "o_totalprice"])
    line = read_pruned(_t(sf_dir, "lineitem"), ["l_shipdate", "l_extendedprice"])

    _P = pa.schema([("day", pa.int64()), ("side", pa.int8()),
                    ("n", pa.int64()), ("cents", pa.int64()),
                    ("bucket", pa.int32())])
    _DAY_US = 86_400_000_000

    def _partial(date_col: str, price_col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            days = pc.cast(t[date_col], pa.int64()).to_numpy()  # midnight us
            cents = np.round(t[price_col].to_numpy() * 100).astype(np.int64)
            df = pd.DataFrame({"day": days, "cents": cents})
            g = df.groupby("day", as_index=False).agg(
                n=("cents", "size"), cents=("cents", "sum"))
            return pa.table(
                {"day": pa.array(g["day"].to_numpy(), pa.int64()),
                 "side": pa.array(np.full(len(g), side, np.int8), pa.int8()),
                 "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                 "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
                 "bucket": pa.array(
                     ((g["day"].to_numpy() // _DAY_US) % N_KEY_BUCKETS)
                     .astype(np.int32), pa.int32())},
                schema=_P)
        return fn

    _OUT = pa.schema([("day", pa.int64()),
                      ("n_orders", pa.int64()), ("order_cents", pa.int64()),
                      ("n_ship", pa.int64()), ("ship_cents", pa.int64())])

    def outer_merge(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["day", "side"], as_index=False)[["n", "cents"]].sum()
        o = s[s["side"] == 0].set_index("day")
        sh = s[s["side"] == 1].set_index("day")
        days = o.index.union(sh.index)  # the outer merge: either side keeps
        out = pd.DataFrame({
            "day": days.to_numpy().astype(np.int64),
            "n_orders": o["n"].reindex(days, fill_value=0).to_numpy(),
            "order_cents": o["cents"].reindex(days, fill_value=0).to_numpy(),
            "n_ship": sh["n"].reindex(days, fill_value=0).to_numpy(),
            "ship_cents": sh["cents"].reindex(days, fill_value=0).to_numpy(),
        })
        return pa.Table.from_pandas(
            out, schema=_OUT, preserve_index=False).replace_schema_metadata(None)

    parts = (
        orders.map_batches(_partial("o_orderdate", "o_totalprice", 0),
                           batch_format="pyarrow", batch_size=262144)
        .union(line.map_batches(_partial("l_shipdate", "l_extendedprice", 1),
                                batch_format="pyarrow", batch_size=262144))
        .groupby("bucket")
        .map_groups(outer_merge, batch_format="pandas")
        .to_pandas()
    )
    parts["day"] = pd.to_datetime(parts["day"].to_numpy().astype(np.int64),
                                  unit="us")
    for c in ("n_orders", "order_cents", "n_ship", "ship_cents"):
        parts[c] = parts[c].astype("int64")
    return parts.sort_values("day").reset_index(drop=True)


_SWEEP_CELL_US = 3_600_000_000  # hour-grid cell for the sweep-line exchange


def concurrent_sessions_peak(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """(peak_concurrency, n_sessions) — the SWEEP-LINE shape: the maximum
    number of user sessions (30-min-gap sessionization, closed intervals
    [first_ts, last_ts]) simultaneously open at any instant — the
    capacity-planning statistic (peak simultaneous connections) that no
    per-key window can express because the running sum crosses ALL keys.

    Scale shape: sessions form in the per-user-bucket groups (the
    sessionizer's own exchange) and leave as ±1 BOUNDARY rows on an hour
    grid; one boundary exchange on the coarse cell bucket lets each cell
    sort its own boundaries ((ts, +1-before--1) — closed intervals:
    a session starting exactly when another ends overlaps it) and emit
    (cell, net_delta, local_running_max, n_starts); the driver's reduce is
    cells-sized — an exclusive prefix sum of net deltas re-bases each
    cell's local max (the events_global_seq two-phase idiom applied to a
    running MAX).  No global sort, no event-sized collect.
    """
    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    _B = pa.schema([("ts", pa.int64()), ("delta", pa.int8()),
                    ("cell", pa.int64()), ("bucket", pa.int32())])

    def boundaries(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        sess = (new_user | (g["ts"].diff() > gap)).cumsum()
        agg = g.groupby(sess)["ts"].agg(["min", "max"])
        st = agg["min"].to_numpy().astype("datetime64[us]").astype(np.int64)
        en = agg["max"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ts = np.concatenate([st, en])
        delta = np.concatenate([np.ones(len(st), np.int8),
                                np.full(len(en), -1, np.int8)])
        cell = ts // _SWEEP_CELL_US
        return pa.table(
            {"ts": pa.array(ts, pa.int64()), "delta": pa.array(delta, pa.int8()),
             "cell": pa.array(cell, pa.int64()),
             "bucket": pa.array((cell % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_B)

    _C = pa.schema([("cell", pa.int64()), ("net", pa.int64()),
                    ("local_max", pa.int64()), ("n_starts", pa.int64())])

    def cell_partial(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cell", "ts", "delta"],
                          ascending=[True, True, False], kind="mergesort")
        run = g.groupby("cell")["delta"].cumsum()
        out = pd.DataFrame({
            "cell": g["cell"], "run": run, "delta": g["delta"].astype("int64")})
        agg = out.groupby("cell").agg(
            net=("delta", "sum"), local_max=("run", "max"),
            n_starts=("delta", lambda d: int((d > 0).sum())))
        return pa.Table.from_pandas(
            agg.reset_index(), schema=_C, preserve_index=False
        ).replace_schema_metadata(None)

    cells = (
        ds.map_batches(_bucket_by("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(boundaries, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cell_partial, batch_format="pandas")
        .to_pandas()
    )
    cells = cells.sort_values("cell").reset_index(drop=True)
    offsets = cells["net"].cumsum().shift(fill_value=0).to_numpy()
    peak = int((cells["local_max"].to_numpy() + offsets).max())
    return pd.DataFrame({"peak_concurrency": pd.Series([peak], dtype="int64"),
                         "n_sessions": pd.Series([int(cells["n_starts"].sum())],
                                                 dtype="int64")})


def link_prediction_ra(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """(doc_a, doc_b, ra_score) — LINK PREDICTION by the resource-allocation
    index (Zhou et al. 2009): for every NON-adjacent pair with at least one
    common neighbor, score = sum over common neighbors z of
    ``2^20 // deg(z)`` (the all-integer RA variant — exact in SQL's
    truncating division too, unlike Adamic-Adar's 1/log), top-k by
    (score DESC, doc_a, doc_b).  The "suggest missing links" primitive a
    crawl graph feeds to a recommender; runs on the shared planted-partner
    hash graph (_recip_edge_arrays).

    Scale shape: wedge enumeration is CENTER-local — one node-bucket
    all-to-all co-locates every (node, neighbor) row of a center, each
    group resolves exact degrees and explodes its wedges vectorized
    (merge-on-center), emitting per-group combined (u, v, score) partials;
    edge-marker rows union into the ONE pair-bucket exchange where
    adjacency kills candidate pairs and each group keeps only its own
    top-k (a pair's global rank can't beat its in-group rank), so the
    driver sees <= 64*k rows.  Hub centers cost deg^2 — the generated
    graph's degrees are Poisson(~6); a power-law corpus would cap or
    sample hub wedges (documented trade, same as triangle_count).
    """
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(_t(sf_dir, "documents")).metadata.num_rows
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id"])

    _NB = pa.schema([("node", pa.int64()), ("nbr", pa.int64()),
                     ("bucket", pa.int32())])

    def nbr_rows(t: pa.Table) -> pa.Table:
        src, dst = _recip_edge_arrays(t["doc_id"].to_numpy(), n)
        node = np.concatenate([src, dst])
        nbr = np.concatenate([dst, src])
        return pa.table(
            {"node": pa.array(node, pa.int64()),
             "nbr": pa.array(nbr, pa.int64()),
             "bucket": pa.array((node % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_NB)

    _PAIR = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                       ("score", pa.int64()), ("is_edge", pa.int8()),
                       ("bucket", pa.int32())])

    def _pair_bucket(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        return ((u * np.int64(1_000_003) + v) % N_KEY_BUCKETS).astype(np.int32)

    def edge_markers(t: pa.Table) -> pa.Table:
        src, dst = _recip_edge_arrays(t["doc_id"].to_numpy(), n)
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        df = pd.DataFrame({"u": a, "v": b}).drop_duplicates()
        u, v = df["u"].to_numpy(), df["v"].to_numpy()
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "score": pa.array(np.zeros(len(u), np.int64), pa.int64()),
             "is_edge": pa.array(np.ones(len(u), np.int8), pa.int8()),
             "bucket": pa.array(_pair_bucket(u, v), pa.int32())},
            schema=_PAIR)

    def wedges(g: pd.DataFrame) -> pa.Table:
        nb = g.drop_duplicates(["node", "nbr"])  # exact degree: all copies
        # of a center land here, so the distinct neighbor set is global
        deg = nb.groupby("node")["nbr"].size().rename("d")
        m = nb.merge(nb, on="node")
        m = m[m["nbr_x"] < m["nbr_y"]]
        if m.empty:
            return _PAIR.empty_table()
        sc = (np.int64(1 << 20)
              // deg.reindex(m["node"]).to_numpy().astype(np.int64))
        p = (pd.DataFrame({"u": m["nbr_x"].to_numpy(),
                           "v": m["nbr_y"].to_numpy(), "score": sc})
             .groupby(["u", "v"], as_index=False)["score"].sum())
        u, v = p["u"].to_numpy(), p["v"].to_numpy()
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "score": pa.array(p["score"].to_numpy(), pa.int64()),
             "is_edge": pa.array(np.zeros(len(u), np.int8), pa.int8()),
             "bucket": pa.array(_pair_bucket(u, v), pa.int32())},
            schema=_PAIR)

    _OUT = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                      ("ra_score", pa.int64())])

    def topk_partial(g: pd.DataFrame) -> pa.Table:
        dead = g[g["is_edge"] == 1][["u", "v"]].drop_duplicates()
        s = (g[g["is_edge"] == 0]
             .groupby(["u", "v"], as_index=False)["score"].sum()
             .merge(dead, on=["u", "v"], how="left", indicator=True))
        s = s[s["_merge"] == "left_only"]
        s = s.sort_values(["score", "u", "v"],
                          ascending=[False, True, True]).head(k)
        return pa.table(
            {"doc_a": pa.array(s["u"].to_numpy(), pa.int64()),
             "doc_b": pa.array(s["v"].to_numpy(), pa.int64()),
             "ra_score": pa.array(s["score"].to_numpy(), pa.int64())},
            schema=_OUT)

    out = (
        ds.map_batches(nbr_rows, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .union(ds.map_batches(edge_markers, batch_format="pyarrow",
                              batch_size=262144))
        .groupby("bucket")
        .map_groups(topk_partial, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["ra_score", "doc_a", "doc_b"],
                            ascending=[False, True, True])
            .head(k).reset_index(drop=True)
            .astype({"doc_a": "int64", "doc_b": "int64", "ra_score": "int64"}))


ROBOTS_S_MOD = 7    # first path segment: /s{doc_id % 7}
ROBOTS_T_MOD = 13   # second path segment: /t{doc_id % 13}
_ROBOTS_H_MASK = (1 << 60) - 1  # keep h*8+7 inside 63 bits on both sides


def _robots_rules_for(sources) -> pd.DataFrame:
    """The generated per-host robots.txt rule table (source, depth, s_val,
    t_val, allow): four rules per host derived from the host's md5-60
    hash — r in {0,1} are segment-1 rules (prefix /s{s_val}), r in {2,3}
    segment-2 rules (prefix /s{s_val}/t{t_val}); allow is bit 32 of the
    same mix.  A pure function of the source string, so every batch can
    rebuild its own sources' rules — nothing is broadcast."""
    import hashlib as _hl

    from .dedup import _mix64_int

    rows = []
    for src in sources:
        h = int(_hl.md5(str(src).encode()).hexdigest()[:16], 16) & _ROBOTS_H_MASK
        for r in range(4):
            m1 = _mix64_int(h * 8 + r)
            depth = 1 if r < 2 else 2
            t_val = (_mix64_int(h * 8 + 4 + r) % ROBOTS_T_MOD) if r >= 2 else -1
            rows.append((src, depth, m1 % ROBOTS_S_MOD, t_val,
                         (m1 >> 32) & 1))
    return pd.DataFrame(rows, columns=["source", "depth", "s_val", "t_val",
                                       "allow"])


def robots_gate(sf_dir: str) -> pd.DataFrame:
    """(source, n_allowed, n_denied) — the LONGEST-PREFIX-MATCH routing
    shape (robots.txt semantics, RFC 9309 §2.2.2: the most specific
    matching rule wins, ties break to disallow): each document's URL path
    ``/s{id%7}/t{id%13}/d{id}`` is gated by its host's generated rule
    table; segment-2 rules beat segment-1 rules regardless of allow/deny,
    unmatched paths default to allow.

    Scale shape: rules are a pure hash function of the source, so the op
    is ONE map-only pass — each batch rebuilds rules for its own distinct
    sources (bounded enum), resolves every doc's best rule vectorized
    (merge-explode by at most 4 rules, sort by (doc, depth DESC, allow),
    first row per doc), and emits per-source count partials; the driver
    reduce is |sources|-sized.  No shuffle, no broadcast.
    """
    ds = read_pruned(_t(sf_dir, "documents"), ["doc_id", "source"])

    _P = pa.schema([("source", pa.string()), ("n_allowed", pa.int64()),
                    ("n_denied", pa.int64())])

    def decide(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(),
                           "source": t["source"].to_pandas()})
        rules = _robots_rules_for(df["source"].unique())
        m = df.merge(rules, on="source")
        match = (m["s_val"].to_numpy() == m["doc_id"].to_numpy() % ROBOTS_S_MOD) & (
            (m["depth"].to_numpy() == 1)
            | (m["t_val"].to_numpy() == m["doc_id"].to_numpy() % ROBOTS_T_MOD))
        best = (m[match]
                .sort_values(["doc_id", "depth", "allow"],
                             ascending=[True, False, True], kind="mergesort")
                .drop_duplicates("doc_id")
                .set_index("doc_id")["allow"])
        df["allow"] = best.reindex(df["doc_id"]).fillna(1).to_numpy().astype(np.int64)
        g = df.groupby("source").agg(n_allowed=("allow", "sum"),
                                     n_denied=("allow", lambda a: int((a == 0).sum())))
        return pa.Table.from_pandas(
            g.reset_index(), schema=_P, preserve_index=False
        ).replace_schema_metadata(None)

    parts = ds.map_batches(decide, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    out = parts.groupby("source", as_index=False)[["n_allowed", "n_denied"]].sum()
    for c in ("n_allowed", "n_denied"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def folder_rollup_docs(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_desc, sum_chars) — HIERARCHY ROLLUP: every node of the
    implicit ternary folder tree (parent(v) = (v-1)//3, root 0) gets its
    INCLUSIVE subtree totals (descendant count incl. self, char sum) — the
    folder-size listing a SharePoint-style library shows per folder
    (SharePointClient.cs walks exactly this shape one folder at a time;
    here the whole forest resolves at once).

    Scale shape: the ancestor chain of a node is a pure function of its id
    (depth = O(log3 n)), so the explode is MAP-ONLY — each batch walks all
    its ids up the tree vectorized (one array op per level), combines
    per-batch (ancestors near the root collapse immediately), and ONE
    node-bucket exchange sums the partials.  No recursion crosses tasks,
    no frontier: the log-depth walk rides inside the map the way the
    oracle's recursive CTE rides inside one scan.
    """
    import pyarrow.parquet as _pq

    # corpora without a stored n_chars (the smoke table) weigh by text length
    has_chars = "n_chars" in _pq.read_schema(_t(sf_dir, "documents")).names
    ds = read_pruned(_t(sf_dir, "documents"),
                     ["doc_id", "n_chars" if has_chars else "text"])

    _P = pa.schema([("node", pa.int64()), ("n", pa.int64()),
                    ("w", pa.int64()), ("bucket", pa.int32())])

    def ancestors(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        if has_chars:
            w = t["n_chars"].to_numpy().astype(np.int64)
        else:
            w = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy()
        nodes, weights = [ids], [w]
        cur, cw = ids, w
        while (cur > 0).any():
            m = cur > 0
            cur = (cur[m] - 1) // 3
            cw = cw[m]
            nodes.append(cur)
            weights.append(cw)
        df = pd.DataFrame({"node": np.concatenate(nodes),
                           "w": np.concatenate(weights)})
        g = df.groupby("node", as_index=False).agg(n=("w", "size"),
                                                   w=("w", "sum"))
        return pa.table(
            {"node": pa.array(g["node"].to_numpy(), pa.int64()),
             "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
             "w": pa.array(g["w"].to_numpy(), pa.int64()),
             "bucket": pa.array(
                 (g["node"].to_numpy() % N_KEY_BUCKETS).astype(np.int32),
                 pa.int32())},
            schema=_P)

    _OUT = pa.schema([("doc_id", pa.int64()), ("n_desc", pa.int64()),
                      ("sum_chars", pa.int64())])

    def reduce(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("node", as_index=False)[["n", "w"]].sum()
        return pa.table(
            {"doc_id": pa.array(s["node"].to_numpy(), pa.int64()),
             "n_desc": pa.array(s["n"].to_numpy(), pa.int64()),
             "sum_chars": pa.array(s["w"].to_numpy(), pa.int64())},
            schema=_OUT)

    out = (
        ds.map_batches(ancestors, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(reduce, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_desc": "int64", "sum_chars": "int64"})


_SHIP_WINDOW_US = 30 * 86_400_000_000  # each shipment keeps a supplier
# "active" for 30 days — the interval whose per-supplier UNION we measure


def supplier_ship_coverage(sf_dir: str) -> pd.DataFrame:
    """(l_suppkey, n_islands, covered_days) — INTERVAL UNION / island
    detection: each lineitem opens a 30-day active window at its ship
    date; per supplier, merge the overlapping windows into maximal islands
    and report how many islands and how many days at least one shipment
    window covers — the utilization/uptime verb (SLA coverage, sensor
    on-time) that plain aggregation can't express because adjacent rows
    interact.

    Scale shape: interval union is ASSOCIATIVE on merged sets, so each
    batch pre-merges its own (supplier, window) islands vectorized (sort,
    per-supplier shifted running max of ends, island cumsum) — boilerplate
    suppliers collapse before the exchange — and ONE supplier-bucket
    all-to-all re-merges the partial islands with the same kernel.  All
    arithmetic in integer microseconds; 30-day windows start and end on
    day boundaries, so covered_days is an exact integer.
    """
    ds = read_pruned(_t(sf_dir, "lineitem"), ["l_suppkey", "l_shipdate"])

    _I = pa.schema([("s", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
                    ("bucket", pa.int32())])

    def _merge_islands(df: pd.DataFrame) -> pd.DataFrame:
        """(s, a, b) intervals -> maximal per-s islands, vectorized."""
        df = df.sort_values(["s", "a", "b"], kind="mergesort")
        prev_max = df.groupby("s")["b"].cummax().shift()
        new_s = df["s"].ne(df["s"].shift())
        isl = (new_s | (df["a"] > prev_max)).cumsum()
        g = df.groupby(isl).agg(s=("s", "first"), a=("a", "min"),
                                b=("b", "max"))
        return g.reset_index(drop=True)

    def partial(t: pa.Table) -> pa.Table:
        a = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        df = pd.DataFrame({"s": t["l_suppkey"].to_numpy(), "a": a,
                           "b": a + _SHIP_WINDOW_US})
        m = _merge_islands(df)
        return pa.table(
            {"s": pa.array(m["s"].to_numpy(), pa.int64()),
             "a": pa.array(m["a"].to_numpy(), pa.int64()),
             "b": pa.array(m["b"].to_numpy(), pa.int64()),
             "bucket": pa.array((m["s"].to_numpy() % N_KEY_BUCKETS)
                                .astype(np.int32), pa.int32())},
            schema=_I)

    _OUT = pa.schema([("l_suppkey", pa.int64()), ("n_islands", pa.int64()),
                      ("covered_days", pa.int64())])

    def finalize(g: pd.DataFrame) -> pa.Table:
        m = _merge_islands(g[["s", "a", "b"]])
        r = m.assign(d=(m["b"] - m["a"])).groupby("s", as_index=False).agg(
            n_islands=("d", "size"), covered=("d", "sum"))
        return pa.table(
            {"l_suppkey": pa.array(r["s"].to_numpy(), pa.int64()),
             "n_islands": pa.array(r["n_islands"].to_numpy().astype(np.int64),
                                   pa.int64()),
             "covered_days": pa.array(
                 (r["covered"].to_numpy() // 86_400_000_000).astype(np.int64),
                 pa.int64())},
            schema=_OUT)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("l_suppkey").reset_index(drop=True).astype(
        {"l_suppkey": "int64", "n_islands": "int64", "covered_days": "int64"})


_PATTERN_CHARS = {"click": "c", "error": "e", "purchase": "p",
                  "signup": "s", "view": "v"}
_EVENT_PATTERN = "s[cv]*p"  # signup, any clicks/views, then purchase —
# contiguous in the user's event sequence (stricter than the funnel's
# "eventually"): an intervening error breaks the run


def event_pattern_counts(sf_dir: str) -> pd.DataFrame:
    """(n_matches, n_users_matched) — MATCH_RECOGNIZE-style SEQUENCE
    PATTERN matching: non-overlapping occurrences of the contiguous regex
    ``s[cv]*p`` over each user's (ts, event_id)-ordered event-type string.
    The row-pattern verb (SQL:2016 MATCH_RECOGNIZE / CEP engines) that
    aggregates and windows can't express: the match length is data-
    dependent and an intervening non-matching event resets it.

    Scale shape: one user-bucket all-to-all (the sessionizer's exchange);
    each group materializes its users' sequences as ONE contiguous byte
    buffer sliced by offsets (no per-event Python), counts matches with a
    compiled regex per user string, and emits two int partials; the
    driver reduce is bucket-count-sized.  Matching cost is O(sequence
    bytes) per user — RE2/sre both run this pattern without backtracking
    blowup since [cv]* and the anchors are disjoint.
    """
    import re

    ds = read_pruned(_t(sf_dir, "events"), ["user_id", "ts", "event_id",
                                            "event_type"])
    pat = re.compile(_EVENT_PATTERN)

    _P = pa.schema([("n_matches", pa.int64()), ("n_users", pa.int64())])

    def count_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # Unseen event types degrade to 'v' exactly like the oracle's CASE
        # ELSE 'v' — never NaN→TypeError on non-enum inputs (ADVICE r4).
        chars = g["event_type"].map(_PATTERN_CHARS).fillna("v").to_numpy()
        buf = "".join(chars)  # one contiguous string for the whole group
        ulens = g.groupby("user_id", sort=False).size().to_numpy()
        offs = np.concatenate([[0], np.cumsum(ulens)])
        total = 0
        matched = 0
        for i in range(len(ulens)):
            n = len(pat.findall(buf[offs[i]:offs[i + 1]]))
            total += n
            matched += n > 0
        return pa.table({"n_matches": pa.array([total], pa.int64()),
                         "n_users": pa.array([matched], pa.int64())},
                        schema=_P)

    parts = (
        ds.map_batches(_bucket_by("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_group, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {"n_matches": pd.Series([int(parts["n_matches"].sum())], dtype="int64"),
         "n_users_matched": pd.Series([int(parts["n_users"].sum())],
                                      dtype="int64")})


def orders_scd2_asof(sf_dir: str) -> pd.DataFrame:
    """(version, n_rows, sum_cents) — TIME-TRAVEL (AS OF) reads over the
    SCD2 history: the orders snapshot reconstructed at version 0 (pre-
    merge) and version 1 (post-merge), each reduced to exact row count +
    integer cent sum — the lakehouse "SELECT ... FOR VERSION AS OF" verb
    that completes orders_scd2_merge's write side.

    Scale shape: the same ONE key-bucket exchange as the merge; each group
    resolves its keys' histories (shared _scd2_history kernel), applies
    the validity predicate ``valid_from <= v < valid_to`` for both
    versions, and emits <= 2 aggregate partial rows — the driver reduce is
    (buckets x versions)-sized, never table-sized.
    """
    rows_ds = _scd2_rows_ds(sf_dir)

    _P = pa.schema([("version", pa.int64()), ("n_rows", pa.int64()),
                    ("sum_cents", pa.int64())])

    def snapshot_partial(g: pd.DataFrame) -> pa.Table:
        h = _scd2_history(g)
        parts = []
        for v in (0, 1):
            live = h[(h["valid_from"] <= v) & (v < h["valid_to"])]
            parts.append((v, len(live), int(live["price_cents"].sum())))
        df = pd.DataFrame(parts, columns=["version", "n_rows", "sum_cents"])
        return pa.Table.from_pandas(
            df.astype("int64"), schema=_P, preserve_index=False
        ).replace_schema_metadata(None)

    parts = (
        rows_ds.groupby("bucket")
        .map_groups(snapshot_partial, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("version", as_index=False)[["n_rows", "sum_cents"]].sum()
    return out.sort_values("version").reset_index(drop=True).astype(
        {c: "int64" for c in out.columns})


_ATTR_WINDOW_US = 24 * 3_600_000_000  # touches inside (conv-24h, conv)


def multi_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """(kind, n, credit_micro) — LINEAR multi-touch attribution: every
    purchase distributes 10^6 micro-credits equally across its click/view
    touchpoints in the trailing 24h window (``ts >= conv-24h AND ts <
    conv``), floor-divided per type so the output is exact integers; the
    per-conversion flooring remainder is reported as its own
    'unattributed' row (n = attributed conversions) instead of being
    shoved onto an arbitrary touch.  The marketing journey-credit verb
    next to campaign_attribution's calendar lookup — credit depends on
    how many OTHER events share the window, which no per-event map can
    see.

    Scale shape: only purchase/click/view narrow rows enter ONE
    user-bucket all-to-all; each group resolves per-conversion per-type
    window counts with two merge_asof passes per type over per-user
    inclusive cumulative ranks (all vectorized), and emits 3 partial rows;
    the driver reduce is bucket-count-sized.
    """
    ds = read_pruned(_t(sf_dir, "events"),
                     ["user_id", "ts", "event_id", "event_type"])
    _TYPES = pa.array(["purchase", "click", "view"], pa.string())

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_TYPES))
        u = t["user_id"].to_numpy()
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "event_id": t["event_id"], "event_type": t["event_type"],
             "bucket": pa.array((u % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    _P = pa.schema([("kind", pa.string()), ("n", pa.int64()),
                    ("credit_micro", pa.int64())])

    def attribute(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["ts_us"] = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        conv = (g[g["event_type"] == "purchase"][["user_id", "ts_us"]]
                .sort_values("ts_us", kind="mergesort"))
        if conv.empty:
            return pa.table({"kind": pa.array(["click", "view", "unattributed"]),
                             "n": pa.array([0, 0, 0], pa.int64()),
                             "credit_micro": pa.array([0, 0, 0], pa.int64())},
                            schema=_P)
        counts = {}
        for typ in ("click", "view"):
            tt = (g[g["event_type"] == typ][["user_id", "ts_us"]]
                  .sort_values(["ts_us", "user_id"], kind="mergesort"))
            tt["r"] = tt.groupby("user_id").cumcount() + 1
            res = []
            for off in (1, _ATTR_WINDOW_US + 1):  # hi: ts < conv;
                # lo: ts <= conv - 24h - 1us is OUT of the window
                q = conv.assign(key=conv["ts_us"] - off).sort_values(
                    "key", kind="mergesort")
                if tt.empty:
                    res.append(np.zeros(len(q), np.int64))
                    continue
                m = pd.merge_asof(q, tt.rename(columns={"ts_us": "key"}),
                                  on="key", by="user_id",
                                  direction="backward")
                res.append(m["r"].fillna(0).to_numpy().astype(np.int64))
            counts[typ] = res[0] - res[1]
        nc, nv = counts["click"], counts["view"]
        n = nc + nv
        m = n > 0
        cc = int((nc[m] * 1_000_000 // n[m]).sum())
        cv = int((nv[m] * 1_000_000 // n[m]).sum())
        rem = int(m.sum()) * 1_000_000 - cc - cv
        return pa.table(
            {"kind": pa.array(["click", "view", "unattributed"]),
             "n": pa.array([int(nc.sum()), int(nv.sum()), int(m.sum())],
                           pa.int64()),
             "credit_micro": pa.array([cc, cv, rem], pa.int64())},
            schema=_P)

    parts = (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("kind", as_index=False)[["n", "credit_micro"]].sum()
    return out.sort_values("kind").reset_index(drop=True).astype(
        {"n": "int64", "credit_micro": "int64"})


def table_checksums(sf_dir: str) -> pd.DataFrame:
    """(table_name, n_rows, checksum) — ORDER-INVARIANT content checksums
    (sum of per-row md5-64 over a canonical key|value string, mod 2^63 so
    the BIGINT twin is exact): the replication/migration integrity verb —
    two copies of a table match iff (n_rows, checksum) match, regardless
    of row order, partitioning, or file layout.  Covers orders (key|cents)
    and documents (id|md5(text)).

    Scale shape: MAP-ONLY — each batch hashes its rows and emits one
    (table, count, partial-sum) row; addition is commutative so any
    partitioning reduces to the same value; the driver reduce is
    2 rows.  Hashing is hashlib-per-row (md5 has no vectorized kernel
    here) — the same honest cost fingerprint_md5 pays, and it never
    crosses the wire.
    """
    import hashlib as _hl

    MOD = 1 << 63

    def _md5_64(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:16], 16) % MOD

    _P = pa.schema([("table_name", pa.string()), ("n_rows", pa.int64()),
                    ("checksum", pa.int64())])

    def orders_part(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        acc = 0
        for a, b in zip(k.tolist(), cents.tolist()):
            acc = (acc + _md5_64(f"{a}|{b}")) % MOD
        return pa.table({"table_name": pa.array(["orders"]),
                         "n_rows": pa.array([len(k)], pa.int64()),
                         "checksum": pa.array([acc], pa.int64())}, schema=_P)

    def docs_part(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        acc = 0
        for i, s in zip(ids.tolist(), t["text"].to_pylist()):
            acc = (acc + _md5_64(f"{i}|{_hl.md5(s.encode()).hexdigest()}")) % MOD
        return pa.table({"table_name": pa.array(["documents"]),
                         "n_rows": pa.array([len(ids)], pa.int64()),
                         "checksum": pa.array([acc], pa.int64())}, schema=_P)

    parts = pd.concat([
        read_pruned(_t(sf_dir, "orders"), ["o_orderkey", "o_totalprice"])
        .map_batches(orders_part, batch_format="pyarrow",
                     batch_size=262144).to_pandas(),
        read_pruned(_t(sf_dir, "documents"), ["doc_id", "text"])
        .map_batches(docs_part, batch_format="pyarrow",
                     batch_size=262144).to_pandas(),
    ], ignore_index=True)
    rows = []
    for name, g in parts.groupby("table_name"):
        # Python-int reduce: two partials near 2^63 would overflow int64
        acc = sum(int(v) for v in g["checksum"]) % MOD
        rows.append((name, int(g["n_rows"].sum()), acc))
    return pd.DataFrame(rows, columns=["table_name", "n_rows", "checksum"]
                        ).astype({"n_rows": "int64", "checksum": "int64"}
                                 ).sort_values("table_name").reset_index(drop=True)


def conversion_delay_quantiles(sf_dir: str) -> pd.DataFrame:
    """(n_converted, p50_s, p90_s) — funnel LATENCY order statistics: per
    user, the delay in whole seconds from the FIRST signup to the first
    strictly-later purchase; exact p50/p90 at integer ranks
    ``ceil(q*n)`` (1-based — the repo's shared rank convention, integer
    formulas ``(n+1)//2`` and ``(9n+9)//10`` so no float rounding can
    straddle a rank).  The time-to-convert metric product analytics pairs
    with events_funnel's conversion counts.

    Scale shape: only signup/purchase narrow rows enter ONE user-bucket
    all-to-all; each group resolves first-signup -> first-later-purchase
    per user vectorized (groupby-min + forward merge_asof, exact-match
    excluded) and emits one int64 delay row per converted user; the exact
    ranks resolve via _values_at_ranks (sort + per-block row counts +
    fetch only the rank-holding block — the driver never holds the delay
    set).
    """
    from .text import _values_at_ranks

    ds = read_pruned(_t(sf_dir, "events"),
                     ["user_id", "ts", "event_id", "event_type"])
    _TYPES = pa.array(["signup", "purchase"], pa.string())

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_TYPES))
        u = t["user_id"].to_numpy()
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "is_signup": pc.cast(pc.equal(t["event_type"], "signup"),
                                  pa.int8()),
             "bucket": pa.array((u % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())})

    _D = pa.schema([("delay_s", pa.int64())])

    def delays(g: pd.DataFrame) -> pa.Table:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = g.assign(ts_us=ts)
        s0 = (g[g["is_signup"] == 1].groupby("user_id", as_index=False)
              ["ts_us"].min().sort_values("ts_us", kind="mergesort"))
        pp = (g[g["is_signup"] == 0][["user_id", "ts_us"]]
              .sort_values("ts_us", kind="mergesort"))
        if s0.empty or pp.empty:
            return _D.empty_table()
        m = pd.merge_asof(s0, pp.rename(columns={"ts_us": "pt"}),
                          left_on="ts_us", right_on="pt", by="user_id",
                          direction="forward", allow_exact_matches=False)
        m = m.dropna(subset=["pt"])
        d = ((m["pt"].to_numpy().astype(np.int64) - m["ts_us"].to_numpy())
             // 1_000_000)
        return pa.table({"delay_s": pa.array(d, pa.int64())}, schema=_D)

    dds = (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(delays, batch_format="pandas")
        .materialize()  # consumed twice: count + rank selection; size is
        # <= one row per converted user, not per event
    )
    n = dds.count()
    if n == 0:
        return pd.DataFrame({"n_converted": pd.Series([0], dtype="int64"),
                             "p50_s": pd.Series([0], dtype="int64"),
                             "p90_s": pd.Series([0], dtype="int64")})
    r50, r90 = (n + 1) // 2 - 1, (9 * n + 9) // 10 - 1
    v50, v90 = _values_at_ranks(dds, "delay_s", [r50, r90])
    return pd.DataFrame({"n_converted": pd.Series([n], dtype="int64"),
                         "p50_s": pd.Series([int(v50)], dtype="int64"),
                         "p90_s": pd.Series([int(v90)], dtype="int64")})


_CATALOG_COLS = [("documents", "lang"), ("documents", "source"),
                 ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
                 ("events", "event_type")]


def catalog_stats_collect(sf_dir: str) -> pd.DataFrame:
    """(table_name, column_name, n_rows, n_nulls, ndv, min_v, max_v) — the
    ANALYZE verb: planner catalog statistics for the bounded-enum string
    columns (exact row/null counts, exact distinct counts, lexicographic
    min/max) — what a cost-based optimizer collects before choosing the
    join orders the rest of this repo hand-tunes.

    Scale shape: MAP-ONLY per column — each batch emits one partial row
    per distinct value it saw ((value, n, nulls) — bounded by the enum's
    cardinality, not the batch), and the driver folds |values|-sized
    frames.  Exact NDV without a shuffle is only claimed for enum columns;
    a high-cardinality column would ride the KMV/HLL sketches instead
    (kmv_distinct_tokens / hll_distinct_tokens).
    """
    frames = []
    for tbl, col in _CATALOG_COLS:
        ds = read_pruned(_t(sf_dir, tbl), [col])

        _S = pa.schema([("v", pa.string()), ("n", pa.int64()),
                        ("nulls", pa.int64())])

        def partial(t: pa.Table, col=col) -> pa.Table:
            a = t[col]
            nulls = int(a.null_count)
            vc = pc.value_counts(pc.drop_null(a))
            if len(vc) == 0:
                return pa.table({"v": pa.array([None], pa.string()),
                                 "n": pa.array([0], pa.int64()),
                                 "nulls": pa.array([nulls], pa.int64())},
                                schema=_S)
            return pa.table(
                {"v": pc.cast(vc.field("values"), pa.string()),
                 "n": pc.cast(vc.field("counts"), pa.int64()),
                 "nulls": pa.array([nulls] + [0] * (len(vc) - 1), pa.int64())},
                schema=_S)

        p = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
        g = p.dropna(subset=["v"]).groupby("v")["n"].sum()
        # All-null column: DuckDB's min/max return SQL NULL — emit None, not
        # the str() of an empty index's nan (ADVICE r4).
        frames.append(pd.DataFrame({
            "table_name": [tbl], "column_name": [col],
            "n_rows": [int(p["n"].sum() + p["nulls"].sum())],
            "n_nulls": [int(p["nulls"].sum())],
            "ndv": [int(g.size)],
            "min_v": [str(g.index.min()) if g.size else None],
            "max_v": [str(g.index.max()) if g.size else None]}))
    out = pd.concat(frames, ignore_index=True)
    for c in ("n_rows", "n_nulls", "ndv"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["table_name", "column_name"]).reset_index(drop=True)


def link_parity_conflicts(sf_dir: str, max_hops: int = 4) -> pd.DataFrame:
    """(n_reached, n_edges_reached, n_conflicts) — BIPARTITENESS testing by
    parity BFS: over the nodes the bounded multi-source BFS reaches, count
    graph edges whose endpoints' min-depths share a parity — each is an
    odd-cycle WITNESS (a graph is bipartite iff layered BFS yields none).
    The property-verification verb next to the BFS/CC/peel family: the
    answer is a certificate count, not a labeling.

    Scale shape: rides the shared _bfs_known_ds frontier loop, then ONE
    dst-bucket all-to-all — each known node ships its 3 out-edges keyed by
    destination plus one marker row carrying its own parity; every group
    joins edge rows to marker rows vectorized and emits 3 count partials.
    The driver never holds the reached set.
    """
    known, n = _bfs_known_ds(sf_dir, max_hops)

    _R = pa.schema([("v", pa.int64()), ("pu", pa.int8()), ("is_marker", pa.int8()),
                    ("bucket", pa.int32())])

    def edge_rows(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy()
        par = (t["depth"].to_numpy() % 2).astype(np.int8)
        vs = [(nodes * 31 + s) % n for s in (1, 2, 3)]
        v = np.concatenate(vs + [nodes])
        pu = np.concatenate([par, par, par, par])
        marker = np.concatenate([np.zeros(3 * len(nodes), np.int8),
                                 np.ones(len(nodes), np.int8)])
        return pa.table(
            {"v": pa.array(v, pa.int64()), "pu": pa.array(pu, pa.int8()),
             "is_marker": pa.array(marker, pa.int8()),
             "bucket": pa.array((v % N_KEY_BUCKETS).astype(np.int32),
                                pa.int32())},
            schema=_R)

    _P = pa.schema([("n_reached", pa.int64()), ("n_edges", pa.int64()),
                    ("n_conflicts", pa.int64())])

    def resolve(g: pd.DataFrame) -> pa.Table:
        mk = (g[g["is_marker"] == 1].drop_duplicates("v")
              .set_index("v")["pu"])
        e = g[g["is_marker"] == 0]
        pv = mk.reindex(e["v"]).to_numpy()
        hit = ~pd.isna(pv)
        conflicts = int((pv[hit] == e["pu"].to_numpy()[hit]).sum())
        return pa.table({"n_reached": pa.array([int(len(mk))], pa.int64()),
                         "n_edges": pa.array([int(hit.sum())], pa.int64()),
                         "n_conflicts": pa.array([conflicts], pa.int64())},
                        schema=_P)

    parts = (
        known.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({c: pd.Series([int(parts[c].sum())], dtype="int64")
                         for c in ("n_reached", "n_edges", "n_conflicts")})
