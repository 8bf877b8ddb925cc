"""Stream-shaped operators over the events table (ordered, keyed log).

Ray Data has no event-time windows; both operators reduce them to shapes
the streaming executor handles well: tumbling windows become a
groupby(key, time_bucket) with in-batch partial aggregation, session
windows become per-key gap-walks inside hash-bucket groups.  Ordering
assumption: a key's complete history lands in one group; within the group
we sort by (ts, event_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def tumbling_window(
    ds: "ray.data.Dataset",
    key_column: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
    unit: str = "hour",
) -> "ray.data.Dataset":
    """(key, window_start, n_events, sum_value): batch-local partials then a
    small groupby over (key, bucket)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        buckets = pc.floor_temporal(batch[ts_column], unit=unit)
        agg = {}
        for k, b, v in zip(
            batch[key_column].to_pylist(), buckets.to_pylist(), batch[value_column].to_pylist()
        ):
            cur = agg.setdefault((k, b), [0, 0.0])
            cur[0] += 1
            cur[1] += v if v is not None else 0.0
        keys = list(agg)
        return pa.Table.from_pydict(
            {
                key_column: [k[0] for k in keys],
                "window_start": pa.array([k[1] for k in keys], type=pa.timestamp("us")),
                "n": [agg[k][0] for k in keys],
                "s": [agg[k][1] for k in keys],
            }
        )

    from .agg import sharded_groupby_apply

    def combine(df):
        # sharded (ops/agg.py): (key, window) count grows with the stream's
        # time extent, so a key-wise aggregate is per-group Python
        return (
            df.groupby([key_column, "window_start"], sort=False)
            .agg(n_events=("n", "sum"), sum_value=("s", "sum"))
            .reset_index()
        )

    return sharded_groupby_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_column, "window_start"],
        combine,
    )


def sliding_window(
    ds: "ray.data.Dataset",
    key_column: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
    window_minutes: int = 60,
    slide_minutes: int = 15,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Overlapping (sliding) windows: each event lands in window/slide windows.

    With ``window`` divisible by ``slide``, each event belongs to exactly
    k = window/slide windows, enumerated vectorized (int64 timestamp
    arithmetic + repeat/tile — no per-row Python), pre-aggregated per batch
    (exchange carries one row per (key, window) per block, not per event
    copy), then combined through the sharded exchange.
    Output: (key, window_start, n_events, sum_value)."""
    assert window_minutes % slide_minutes == 0
    k = window_minutes // slide_minutes
    slide_us = np.int64(slide_minutes * 60 * 1_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key_type = batch.schema.field(key_column).type  # keys keep their type
        if n == 0:
            return pa.Table.from_pydict(
                {
                    key_column: pa.array([], type=key_type),
                    "window_start": pa.array([], type=pa.timestamp("us")),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.float64()),
                }
            )
        ts = batch[ts_column].combine_chunks() if isinstance(
            batch[ts_column], pa.ChunkedArray
        ) else batch[ts_column]
        ts_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts_us // slide_us  # window index of the LATEST covering window
        offs = np.arange(k, dtype=np.int64)
        starts = ((base[:, None] - offs[None, :]) * slide_us).ravel()
        keys = np.repeat(
            np.asarray(batch[key_column].to_pylist(), dtype=object), k
        )
        vals = np.repeat(
            np.nan_to_num(
                np.asarray(batch[value_column].to_pylist(), dtype=np.float64)
            ),
            k,
        )
        df = pd.DataFrame({"k": keys, "w": starts, "v": vals})
        agg = df.groupby(["k", "w"], sort=False)["v"].agg(["count", "sum"]).reset_index()
        return pa.Table.from_pydict(
            {
                key_column: pa.array(agg["k"], type=key_type, from_pandas=True),
                "window_start": pa.array(
                    agg["w"].to_numpy(dtype=np.int64), type=pa.timestamp("us")
                ),
                "n": pa.array(agg["count"].to_numpy(dtype=np.int64), type=pa.int64()),
                "s": pa.array(agg["sum"].to_numpy(dtype=np.float64), type=pa.float64()),
            }
        )

    from .agg import sharded_groupby_apply

    def combine(df):
        return (
            df.groupby([key_column, "window_start"], sort=False)
            .agg(n_events=("n", "sum"), sum_value=("s", "sum"))
            .reset_index()
        )

    return sharded_groupby_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_column, "window_start"],
        combine,
        num_shards=num_shards,
    )


def key_quantiles(
    ds: "ray.data.Dataset",
    key_column: str = "event_type",
    value_column: str = "value",
    quantiles=(0.5, 0.9, 0.99),
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """EXACT lower-interpolation quantiles per key (p50/p90/p99 columns).

    Rides the sharded-aggregation exchange: every value of one key lands in
    one shard, so a vectorized per-key sort inside the shard yields exact
    quantiles — no sketch needed.  This is the bounded-cardinality shape
    (metrics keyed by type/tenant/model); keys whose VALUE VOLUME exceeds a
    worker's heap need a t-digest style sketch instead, which composes as a
    per-batch partial + merge in the same two phases."""
    from .agg import sharded_groupby_apply

    qs = list(quantiles)
    names = [f"p{round(q * 100):d}" for q in qs]  # round, not truncate (0.29 -> p29)

    def shard_q(df: pd.DataFrame) -> pd.DataFrame:
        # discrete quantile, SQL quantile_disc semantics: the element at
        # 1-indexed position ceil(q*n) of the sorted values (pandas'
        # interpolation="lower" uses floor(q*(n-1)) — off by one at high q)
        import numpy as np

        rows = []
        for k, v in df.groupby(key_column, sort=False)[value_column]:
            s = np.sort(v.to_numpy())
            n = len(s)
            row = {key_column: k}
            for q, name in zip(qs, names):
                # clamp BOTH ends: q=0 gives ceil(0*n)-1 = -1, which would
                # wrap to the MAX via negative indexing (quantile_disc(0)=min)
                row[name] = float(s[min(n - 1, max(0, int(np.ceil(q * n)) - 1))])
            rows.append(row)
        return pd.DataFrame(rows, columns=[key_column, *names])

    return sharded_groupby_apply(
        ds.select_columns([key_column, value_column])
        if hasattr(ds, "select_columns")
        else ds,
        [key_column],
        shard_q,
        num_shards=num_shards,
    )


def sessionize(
    ds: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    id_column: str = "event_id",
    gap_minutes: int = 30,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Session windows: a gap > ``gap_minutes`` starts a new session.

    Keys are hashed into ``num_buckets`` groups so the per-group Python call
    count is O(buckets), not O(keys) (map_groups costs ~1.5 ms per call);
    inside a bucket the gap-walk is vectorized pandas over ALL of its keys.
    Output: (key, session_id, n_events, start_ts, end_ts); session_id is
    1-based per key in time order.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .hashing import bucket_column

        return batch.append_column(
            "__bucket", bucket_column(batch[key_column], num_buckets)
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_column, ts_column, id_column])
        prev = g.groupby(key_column)[ts_column].shift()
        new_s = (g[ts_column] - prev > gap) | prev.isna()
        session_id = new_s.groupby(g[key_column]).cumsum().astype("int64")
        g = g.assign(session_id=session_id)
        out = (
            g.groupby([key_column, "session_id"], sort=False)
            .agg(
                n_events=(id_column, "count"),
                start_ts=(ts_column, "min"),
                end_ts=(ts_column, "max"),
            )
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[[key_column, "session_id", "n_events", "start_ts", "end_ts"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def funnel_counts(
    ds: "ray.data.Dataset",
    steps,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_shards: int = 32,
):
    """Ordered-funnel completion: ``(step, n_keys)`` where ``n_keys`` is
    how many keys performed ``steps[0] .. steps[i-1]`` in strict time
    order (greedy earliest-match chaining — the same semantics as the
    SQL ``MIN(ts)``-per-step chain, so a SQL mirror agrees exactly).

    One key-sharded exchange; inside each shard the chain is
    len(steps) vectorized filter + groupby-min passes (never a per-key
    Python walk).  Per-shard step partials (<= num_shards x len(steps)
    rows) fold through one tiny final exchange.
    """
    from .agg import sharded_groupby_apply

    steps = list(steps)

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        reached = None  # Series: key -> ts of last completed step
        out_steps = []
        out_counts = []
        for i, s in enumerate(steps):
            ev = df[df[type_col] == s]
            if reached is None:
                cur = ev.groupby(key, sort=False)[ts_col].min()
            else:
                prev = ev[key].map(reached)
                ev = ev[prev.notna() & (ev[ts_col] > prev)]
                cur = ev.groupby(key, sort=False)[ts_col].min()
            reached = cur
            out_steps.append(i + 1)
            out_counts.append(len(cur))
            if not len(cur):
                # later steps are all zero; emit explicitly for stable shape
                for j in range(i + 2, len(steps) + 1):
                    out_steps.append(j)
                    out_counts.append(0)
                break
        return pd.DataFrame({"step": out_steps, "n": out_counts})

    partials = sharded_groupby_apply(
        ds.select_columns([key, ts_col, type_col]), [key], chain, num_shards
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("step", sort=False, as_index=False)["n"].sum()
        return g.rename(columns={"n": "n_keys"})

    return sharded_groupby_apply(partials, ["step"], fold, min(num_shards, 4))


def ohlc_window(
    ds: "ray.data.Dataset",
    key_column: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
    unit: str = "hour",
    num_shards: int = 32,
):
    """Time-ordered downsampling (the market-data OHLC bar): per (key,
    window) the first/max/min/last value by event time plus the count —
    ``(key, window_start, open, high, low, close, n)``.

    First/last are ORDER-DEPENDENT aggregates, so the partial state per
    (key, window) is ``(ts_min, v_at_ts_min, ts_max, v_at_ts_max, min,
    max, n)`` — still a constant-size decomposable tuple: combining two
    partials keeps the value attached to the smaller/larger timestamp.
    One vectorized sort + groupby-first/last pass per batch builds the
    partials; one (key, window)-sharded exchange folds them.  Ties on
    ts resolve to the smallest ts row deterministically only when ts is
    unique per (key, window) — feeds with duplicate timestamps should
    disambiguate (the same contract as SQL ``arg_min``/``arg_max``).
    """
    import pyarrow.compute as pc

    from .agg import sharded_groupby_apply

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_column], unit=unit)
        df = pd.DataFrame(
            {
                "k": batch[key_column].to_pandas(),
                "w": win.to_pandas(),
                "ts": batch[ts_column].to_pandas(),
                "v": batch[value_column].to_pandas(),
            }
        )
        df = df.sort_values(["k", "w", "ts"], kind="stable")
        g = df.groupby(["k", "w"], sort=False)
        out = g.agg(
            ts_min=("ts", "first"), v_open=("v", "first"),
            ts_max=("ts", "last"), v_close=("v", "last"),
            lo=("v", "min"), hi=("v", "max"), n=("v", "size"),
        ).reset_index()
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "w", "ts_min"], kind="stable")
        g = df.groupby(["k", "w"], sort=False)
        first = g.agg(ts_min=("ts_min", "min"), v_open=("v_open", "first"))
        df2 = df.sort_values(["k", "w", "ts_max"], kind="stable")
        g2 = df2.groupby(["k", "w"], sort=False)
        last = g2.agg(ts_max=("ts_max", "max"), v_close=("v_close", "last"))
        rest = g.agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
        out = first.join(last).join(rest).reset_index()
        return out.rename(columns={"k": key_column, "w": "window_start"})[
            [key_column, "window_start", "v_open", "hi", "lo", "v_close", "n"]
        ].rename(columns={"v_open": "open", "hi": "high", "lo": "low",
                          "v_close": "close"})

    return sharded_groupby_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k", "w"],
        fold,
        num_shards,
    )


def retention_cohorts(
    ds: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Weekly retention-cohort matrix: users grouped by first-active week,
    counted in every later week they return.

    Output ``(cohort_week, week_offset, n_users)`` — cohort_week is the
    user's first active epoch-week (``days_since_1970 // 7``, exact
    integer arithmetic both engines), week_offset its distance from each
    active week, n_users the distinct users in that cell.

    One user-sharded exchange does all the per-user work (min week + the
    distinct (user, week) set live in the same shard), emitting per-shard
    PARTIAL cell counts; the final fold is a bounded-cardinality groupby
    (weeks x weeks cells, independent of user count) — the classic
    pre-aggregate-then-small-exchange shape.  Per-batch (user, week)
    dedup bounds the exchange volume at one row per active user-week.
    """
    from .agg import sharded_groupby_apply

    def to_user_week(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        days = pc.cast(pc.cast(batch[ts_col], pa.date32()), pa.int32())
        week = pc.cast(pc.floor(pc.divide(pc.cast(days, pa.float64()), 7.0)), pa.int64())
        t = pa.table({user_col: batch[user_col], "w": week})
        # per-batch dedup: bounds the exchange at one row per user-week
        return t.group_by([user_col, "w"]).aggregate([])

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([user_col, "w"])
        w0 = df.groupby(user_col, sort=False)["w"].transform("min")
        cells = pd.DataFrame({"cohort_week": w0, "week_offset": df["w"] - w0})
        out = cells.groupby(["cohort_week", "week_offset"], sort=False).size()
        return out.rename("n_users").reset_index()

    partials = sharded_groupby_apply(
        ds.select_columns([user_col, ts_col]).map_batches(
            to_user_week, batch_format="pyarrow"
        ),
        [user_col],
        per_shard,
        num_shards=num_shards,
    )
    out = partials.groupby(["cohort_week", "week_offset"]).sum("n_users")

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        name = "sum(n_users)" if "sum(n_users)" in batch.column_names else "n_users"
        return pa.table(
            {
                "cohort_week": pc.cast(batch["cohort_week"], pa.int64()),
                "week_offset": pc.cast(batch["week_offset"], pa.int64()),
                "n_users": pc.cast(batch[name], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")
