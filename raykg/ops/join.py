"""Join operators.

The reference has no relational join (SURVEY.md §2.4) — its only join is
the broadcast map-side semi-join of the ontology dictionary.  This module
makes the pattern an explicit, reusable operator, plus the bucketed hash
join for two large sides (the guide's portable pattern for when
``Dataset.join`` isn't suitable).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    ds: "ray.data.Dataset",
    small: "pa.Table | pd.DataFrame",
    on: str,
    how: str = "left",
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Map-side join against a small broadcast table (``ray.put`` once, a
    pandas merge per batch inside every task — no shuffle).

    ``how`` is 'left' or 'inner'.  Right-side duplicate column names get
    ``suffix``.
    """
    if isinstance(small, pa.Table):
        small_df = small.to_pandas()
    else:
        small_df = pd.DataFrame(small)
    ref = ray.put(small_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(join, batch_format="pandas")


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Broadcast semi-join (``anti=True``: anti-join): keep left rows whose
    key does (not) appear in the right side's key set.  The right side is
    the SMALL side by contract — only its distinct key array crosses the
    wire (deduped per block in flight, once more on the driver, ``ray.put``
    once); each task does one vectorized ``searchsorted`` per batch.  No
    shuffle, and unlike a broadcast inner join the left rows stream through
    unchanged (no widening, no duplication on duplicate right keys)."""
    import numpy as np

    rk = right_on or on

    def key_partial(batch: pa.Table) -> pa.Table:
        col = batch[rk]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pa.table({"k": col.unique()})

    refs = (
        right.map_batches(key_partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
    if tabs:
        keys = np.unique(
            pa.concat_tables(tabs)["k"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
    else:
        keys = np.zeros(0, dtype=np.int64)
    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        if len(ks) == 0:
            return batch if anti else batch.slice(0, 0)
        col = batch[on]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = col.to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, vals), len(ks) - 1)
        member = ks[pos] == vals
        return batch.filter(pa.array(~member if anti else member))

    return left.map_batches(filt, batch_format="pyarrow")


def _align_and_bucket(left, right, on, num_buckets, suffix="_r"):
    """Shared two-large-sides scaffolding for the partitioned joins: rename
    the right side's clashing columns (except the key), pad each side with
    typed nulls for the other's columns, bucket on ``hash(key) % B``, tag
    the side, and union into ONE shuffle input.

    Returns ``(both, own_r_cols, out_fields)``: the unioned Dataset, the
    right side's renamed own columns, and the typed output schema the
    per-bucket kernels must emit (pandas merge dtypes drift on empty /
    all-null groups, so kernels emit typed Arrow)."""
    from .hashing import bucket_column

    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    rename_map = {
        n: (n + suffix if n in l_names and n != on else n) for n in r_schema.names
    }
    l_fields = list(zip(l_schema.names, l_schema.types))
    r_fields = [
        (rename_map[n], t)
        for n, t in zip(r_schema.names, r_schema.types)
        if rename_map[n] != on
    ]
    all_fields = l_fields + [f for f in r_fields if f[0] not in l_names]
    own_r_cols = sorted(n for n, _ in r_fields)
    own_r_set = set(own_r_cols)

    def prepare(side):
        def fn(batch: pa.Table) -> pa.Table:
            if side == "r":
                batch = batch.rename_columns(
                    [rename_map[n] for n in batch.schema.names]
                )
            have = set(batch.schema.names)
            arrays, names = [], []
            for name, typ in all_fields:
                names.append(name)
                if name in have:
                    col = batch[name]
                    arrays.append(
                        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    )
                else:
                    arrays.append(pa.nulls(batch.num_rows, type=typ))
            out = pa.Table.from_arrays(arrays, names=names)
            out = out.append_column("__bucket", bucket_column(out[on], num_buckets))
            return out.append_column("__side", pa.array([side] * out.num_rows))

        return fn

    both = left.map_batches(prepare("l"), batch_format="pyarrow").union(
        right.map_batches(prepare("r"), batch_format="pyarrow")
    )
    type_of = dict(all_fields)
    out_fields = [(n, t) for n, t in all_fields if n not in own_r_set] + [
        (n, type_of[n]) for n in own_r_cols
    ]
    return both, own_r_cols, out_fields


def bucketed_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    num_buckets: int | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Two large sides: add ``bucket = crc32(key) % B`` to both, groupby the
    bucket, and merge matching buckets pairwise inside per-bucket kernels —
    an explicit partitioned hash join.  Skewed keys should be salted into
    sub-buckets by the caller (raise ``num_buckets``).  Default bucket
    count resolves RAYKG_NUM_SHARDS (multi-node knob) then 64."""
    from .agg import default_shards

    num_buckets = default_shards(num_buckets)
    both, own_r_cols, out_fields = _align_and_bucket(left, right, on, num_buckets)

    def merge(g: pd.DataFrame) -> pa.Table:
        lhs = g[g["__side"] == "l"].drop(columns=["__side", "__bucket", *own_r_cols])
        rhs = g[g["__side"] == "r"][[on, *own_r_cols]]
        m = lhs.merge(rhs, on=on, how=how)
        arrays = [
            pa.array(m[name], type=typ, from_pandas=True) for name, typ in out_fields
        ]
        return pa.Table.from_arrays(arrays, names=[n for n, _ in out_fields])

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    num_buckets: int = 64,
    suffix: str = "_r",
    tolerance=None,
) -> "ray.data.Dataset":
    """Backward as-of LEFT join: each left row picks the latest right row of
    the same ``key`` with ``right.ts <= left.ts`` (DuckDB ``ASOF LEFT JOIN``
    semantics; unmatched left rows keep typed nulls).

    Distribution: both sides bucket on ``hash(key) % B`` — ONE shuffle,
    identical to :func:`bucketed_hash_join` — and every bucket resolves with
    a single vectorized ``pandas.merge_asof`` (sorted merge over all of the
    bucket's keys at once; no per-key Python).  Time-skew is irrelevant to
    the partitioning (keys, not time ranges, are hashed), so a hot KEY is
    the only skew concern — salt by raising ``num_buckets``.  ``tolerance``
    (a ``pandas.Timedelta``) optionally bounds the lookback window.
    """
    both, own_r_cols, out_fields = _align_and_bucket(
        left, right, key, num_buckets, suffix=suffix
    )
    ts_r = ts + suffix  # right's timestamp after rename (ts clashes by construction)

    def merge(g: pd.DataFrame) -> pa.Table:
        lhs = (
            g[g["__side"] == "l"]
            .drop(columns=["__side", "__bucket", *own_r_cols])
            .sort_values(ts, kind="stable")
        )
        rhs = (
            g[g["__side"] == "r"][[key, *own_r_cols]]
            .rename(columns={ts_r: "__rts"})
            .sort_values("__rts", kind="stable")
        )
        m = pd.merge_asof(
            lhs,
            rhs,
            left_on=ts,
            right_on="__rts",
            by=key,
            direction="backward",
            tolerance=tolerance,
        ).rename(columns={"__rts": ts_r})
        arrays = [
            pa.array(m[name], type=typ, from_pandas=True) for name, typ in out_fields
        ]
        return pa.Table.from_arrays(arrays, names=[n for n, _ in out_fields])

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    start: str,
    end: str,
    num_buckets: int = 64,
    disjoint: bool = False,
) -> "ray.data.Dataset":
    """Interval (range) INNER join: left rows matched to right rows of the
    same ``key`` with ``start <= left.ts <= end``.

    Same one-shuffle bucket-by-key exchange as :func:`bucketed_hash_join`.
    Per bucket, two vectorized kernels:

    - ``disjoint=True`` (intervals per key never overlap — e.g. sessions):
      one ``merge_asof`` on the interval start (backward) plus an end-bound
      filter — O(n log n), no candidate blowup, the 100 TB path;
    - general: per-key equi-merge then interval filter — candidate volume
      is events x intervals PER KEY; acceptable when keys hold few
      intervals, salt/raise ``num_buckets`` for hot keys.
    """
    both, own_r_cols, out_fields = _align_and_bucket(left, right, key, num_buckets)
    # right-side column names after the helper's rename
    start_c = start + "_r" if start in left.schema().names and start != key else start
    end_c = end + "_r" if end in left.schema().names and end != key else end

    def merge(g: pd.DataFrame) -> pa.Table:
        lhs = g[g["__side"] == "l"].drop(columns=["__side", "__bucket", *own_r_cols])
        rhs = g[g["__side"] == "r"][[key, *own_r_cols]]
        if disjoint:
            lhs = lhs.sort_values(ts, kind="stable")
            rhs = rhs.sort_values(start_c, kind="stable")
            m = pd.merge_asof(
                lhs, rhs, left_on=ts, right_on=start_c, by=key, direction="backward"
            )
            m = m[m[end_c].notna() & (m[ts] <= m[end_c])]
        else:
            m = lhs.merge(rhs, on=key, how="inner")
            m = m[(m[start_c] <= m[ts]) & (m[ts] <= m[end_c])]
        arrays = [
            pa.array(m[name], type=typ, from_pandas=True) for name, typ in out_fields
        ]
        return pa.Table.from_arrays(arrays, names=[n for n, _ in out_fields])

    return both.groupby("__bucket").map_groups(merge, batch_format="pandas")


def attach_by_key(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: str,
    val_cols: Sequence[str],
    gate: int = 2_000_000,
) -> "ray.data.Dataset":
    """INNER-join ``small``'s ``val_cols`` onto ``big`` by the shared key
    column ``on`` (non-matching big rows drop).  Under ``gate`` small
    rows the map is sorted arrays broadcast once via ``ray.put`` + one
    vectorized ``searchsorted`` per batch; above it the plan switches to
    :func:`bucketed_hash_join` — same rows, shuffle instead of
    broadcast.  ``small`` must carry exactly ``[on, *val_cols]`` and its
    keys MUST be unique: with duplicate keys the broadcast searchsorted
    would keep only one match per key while the bucketed fallback would
    emit full multiplicity — same inputs, different row counts depending
    on the gate — so duplicates raise loudly instead.  Use
    :func:`bucketed_hash_join` directly for many-to-many attaches."""
    import numpy as np

    small = small.materialize()
    n_small = small.count()
    if n_small > gate:
        # enforce the unique-key contract on this plan too (one bounded
        # exchange over the SMALL side only) so both plans agree.
        n_keys = small.select_columns([on]).groupby(on).count().count()
        if n_keys != n_small:
            raise ValueError(
                f"attach_by_key: duplicate keys in `small` ({n_small} rows, "
                f"{n_keys} distinct); the broadcast and bucketed plans would "
                "disagree on multiplicity — dedup `small` or use "
                "bucketed_hash_join"
            )
        return bucketed_hash_join(big, small, on=on)

    def _schema_types() -> dict:
        sch = small.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        # non-Arrow-backed schema (e.g. from_pandas): coerce via pyarrow
        return {
            n: (t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in zip(sch.names, sch.types)
        }

    batches = [b for b in small.iter_batches(batch_format="pyarrow") if b.num_rows]
    if batches:
        tbl = pa.concat_tables(batches)
        stypes = {f.name: f.type for f in tbl.schema}
        keys = tbl[on].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        if len(keys) and len(np.unique(keys)) != len(keys):
            dup = keys[:-1][keys[1:] == keys[:-1]]
            raise ValueError(
                f"attach_by_key: duplicate keys in `small` (e.g. {dup[0]!r}); "
                "the broadcast and bucketed plans would disagree on "
                "multiplicity — dedup `small` or use bucketed_hash_join"
            )
        vals = []
        for c in val_cols:
            col = tbl[c].combine_chunks()
            try:
                v = col.to_numpy(zero_copy_only=False)
            except (pa.ArrowInvalid, NotImplementedError):
                v = np.asarray(col.to_pylist(), dtype=object)
            vals.append(v[order])
    else:
        keys = np.zeros(0, dtype=np.int64)
        vals = [np.zeros(0, dtype=object) for _ in val_cols]
        stypes = _schema_types()
    ref = ray.put((keys, vals))

    def attach(batch: pa.Table) -> pa.Table:
        k, vs = ray.get(ref)
        bk = batch[on].to_numpy(zero_copy_only=False)
        if len(k):
            pos = np.minimum(np.searchsorted(k, bk), len(k) - 1)
            hit = k[pos] == bk
        else:
            hit = np.zeros(len(bk), dtype=bool)
            pos = np.zeros(len(bk), dtype=np.int64)
        out = batch.filter(pa.array(hit))
        p = pos[hit]
        for c, v in zip(val_cols, vs):
            out = out.append_column(
                c, pa.array(v[p], type=stypes[c], from_pandas=True)
            )
        return out

    return big.map_batches(attach, batch_format="pyarrow")
