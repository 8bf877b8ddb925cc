"""Column profiling: one streaming pass + one tiny exchange.

Parity note: the reference plugin computes no dataset statistics; this
is an engine extra (the "describe your 100 TB table before you process
it" step every training-data pipeline runs first).

Per requested column the profile reports row count, null count, exact
distinct count, and min/max.  Scale shape:

- **count / nulls / min / max** are per-batch partials (a few scalars
  per block) tree-reduced through a tiny groupby — nothing but O(blocks)
  scalar rows move.
- **exact distinct** explodes each batch to ``(column, value-hash)``
  rows — ONE 64-bit hash per cell, deduplicated per batch first so a
  low-cardinality column ships one row per distinct value per block,
  not per cell — and counts survivors in a sharded exchange.  Hashes,
  never values, move; a 64-bit collision undercounts by at most the
  birthday bound (~n^2/2^65), the same trade the dedup family documents.

Everything is column-parallel inside one pass over the data: the
explode emits all columns' rows from the same batch read.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .agg import sharded_groupby_apply


def _value_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """64-bit hash per non-null cell (string repr — profiling only needs
    equality, and str() is total over Arrow scalar types)."""
    import zlib

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.to_pylist()
    out = np.fromiter(
        (
            zlib.crc32(str(v).encode("utf-8"))
            | (zlib.adler32(str(v).encode("utf-8")) << 32)
            for v in vals
            if v is not None
        ),
        dtype=np.uint64,
        count=-1,
    )
    return out


def profile_columns(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Profile ``columns``: one row per column with ``n_rows``,
    ``n_null``, ``n_distinct`` (exact, hash-based), ``min_str`` and
    ``max_str`` (stringified extremes of the non-null values; None for
    all-null columns)."""
    columns = list(columns)

    def scalar_partials(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_null": [], "min_str": [], "max_str": []}
        for c in columns:
            col = batch[c]
            n = len(col)
            nn = col.null_count
            # extremes are LEXICOGRAPHIC over the string rendering (uniform
            # partial schema across mixed column types; mirror in SQL as
            # MIN/MAX(CAST(col AS VARCHAR)))
            vals = [str(v) for v in col.to_pylist() if v is not None]
            rows["column"].append(c)
            rows["n_rows"].append(n)
            rows["n_null"].append(nn)
            rows["min_str"].append(min(vals) if vals else None)
            rows["max_str"].append(max(vals) if vals else None)
        return pa.table(
            {
                "column": pa.array(rows["column"]),
                "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
                "n_null": pa.array(rows["n_null"], type=pa.int64()),
                "min_str": pa.array(rows["min_str"], type=pa.string()),
                "max_str": pa.array(rows["max_str"], type=pa.string()),
            }
        )

    def _opt(fn):
        # object-dtype min/max with NaN partials (all-null blocks) raises in
        # pandas; drop the NaNs per group first
        def agg(s: pd.Series):
            s = s.dropna()
            return fn(s) if len(s) else None

        return agg

    def reduce_scalars(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)
        return pd.DataFrame(
            {
                "column": list(g.groups),
                "n_rows": g["n_rows"].sum().to_numpy(),
                "n_null": g["n_null"].sum().to_numpy(),
                "min_str": g["min_str"].agg(_opt(min)).to_numpy(),
                "max_str": g["max_str"].agg(_opt(max)).to_numpy(),
            }
        )

    scalars = sharded_groupby_apply(
        ds.map_batches(scalar_partials, batch_format="pyarrow"),
        ["column"],
        reduce_scalars,
        num_shards=1,  # O(columns x blocks) scalar rows — one reducer is the fast path
    )

    def hash_partials(batch: pa.Table) -> pa.Table:
        cols: List[str] = []
        hashes: List[np.ndarray] = []
        for c in columns:
            h = np.unique(_value_hashes(batch[c]))  # in-batch dedup before the exchange
            cols.extend([c] * len(h))
            hashes.append(h)
        return pa.table(
            {
                "column": pa.array(cols, type=pa.string()),
                "h": pa.array(
                    np.concatenate(hashes) if hashes else np.array([], dtype=np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["column", "h"]).groupby("column", sort=False)
        return pd.DataFrame(
            {"column": list(g.groups), "nd_part": g.size().to_numpy()}
        )

    # shard by (column, h): every distinct (column, hash) lands in exactly one
    # shard, so per-shard distinct counts sum to the exact global count
    distinct_parts = sharded_groupby_apply(
        ds.map_batches(hash_partials, batch_format="pyarrow"),
        ["column", "h"],
        count_distinct,
        num_shards=num_shards,
    )

    def sum_parts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)
        return pd.DataFrame(
            {"column": list(g.groups), "n_distinct": g["nd_part"].sum().to_numpy()}
        )

    distinct = sharded_groupby_apply(
        distinct_parts, ["column"], sum_parts, num_shards=1
    )

    def join_side(kind: str):
        def f(df: pd.DataFrame) -> pa.Table:
            t = {"column": pa.array(df["column"], type=pa.string())}
            if kind == "s":
                t["n_rows"] = pa.array(df["n_rows"], type=pa.int64())
                t["n_null"] = pa.array(df["n_null"], type=pa.int64())
                t["min_str"] = pa.array(df["min_str"], type=pa.string(), from_pandas=True)
                t["max_str"] = pa.array(df["max_str"], type=pa.string(), from_pandas=True)
                t["n_distinct"] = pa.nulls(len(df), type=pa.int64())
            else:
                t["n_rows"] = pa.nulls(len(df), type=pa.int64())
                t["n_null"] = pa.nulls(len(df), type=pa.int64())
                t["min_str"] = pa.nulls(len(df), type=pa.string())
                t["max_str"] = pa.nulls(len(df), type=pa.string())
                t["n_distinct"] = pa.array(df["n_distinct"], type=pa.int64())
            return pa.table(t)

        return f

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)
        return pd.DataFrame(
            {
                "column": list(g.groups),
                "n_rows": g["n_rows"].max().astype("int64").to_numpy(),
                "n_null": g["n_null"].max().astype("int64").to_numpy(),
                "n_distinct": g["n_distinct"]
                .max()
                .fillna(0)
                .astype("int64")
                .to_numpy(),
                "min_str": g["min_str"].agg(_opt(max)).to_numpy(),
                "max_str": g["max_str"].agg(_opt(max)).to_numpy(),
            }
        )

    both = scalars.map_batches(join_side("s"), batch_format="pandas").union(
        distinct.map_batches(join_side("d"), batch_format="pandas")
    )
    return sharded_groupby_apply(both, ["column"], merge, num_shards=1)


_CKSUM_P = (1 << 61) - 1  # Mersenne prime; sums stay BIGINT-safe in SQL


def table_checksum(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    null_token: str = "<null>",
) -> pd.DataFrame:
    """Order-independent content checksum: one row ``(n_rows, checksum)``
    with ``checksum = SUM(md5_60bit(c1 || '|' || c2 ...)) mod 2^61-1``.

    Addition commutes, so the result is independent of partitioning and
    row order — the cross-engine "did the copy/migration preserve every
    row" validation.  The per-row hash uses the corpus-auditability md5
    idiom from `ops/sample.py`, and every value is canonicalized as its
    string form (callers pass int/string columns; float formatting is
    engine-specific and excluded by contract), so a SQL engine computes
    the IDENTICAL scalar:

        SUM(CAST(('0x' || substr(md5(
            COALESCE(CAST(c1 AS VARCHAR), '<null>') || '|' || ...), 1, 15))
            AS BIGINT)) % 2305843009213693951

    Scale shape: per-batch scalar partials (n, sum mod p) — nothing but
    O(blocks) two-int rows ever move.
    """
    import hashlib

    cols = list(columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        parts = [
            df[c].astype(object).where(df[c].notna(), null_token).astype(str)
            for c in cols
        ]
        rows = parts[0]
        for p in parts[1:]:
            rows = rows + "|" + p
        s = 0
        for r in rows:
            s += int(hashlib.md5(r.encode("utf-8")).hexdigest()[:15], 16)
        return pd.DataFrame({"n": [len(df)], "s": [s % _CKSUM_P]})

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas"
    ).take_all()
    n = sum(int(p["n"]) for p in parts)
    s = sum(int(p["s"]) for p in parts) % _CKSUM_P
    return pd.DataFrame({"n_rows": [n], "checksum": [s]}).astype("int64")


def table_checksum_sql(
    table: str, columns: Sequence[str], null_token: str = "<null>"
) -> str:
    """DuckDB mirror of :func:`table_checksum`."""
    expr = " || '|' || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '{null_token}')" for c in columns
    )
    return f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT))
                % {_CKSUM_P} AS BIGINT) AS checksum
    FROM {table}
    """


def histogram_fixed(
    ds: "ray.data.Dataset",
    column: str,
    lo: float,
    hi: float,
    nbins: int,
) -> "ray.data.Dataset":
    """Fixed-width histogram: ``(bin, n)`` with ``bin =
    floor((x - lo) * nbins / (hi - lo))`` clamped to ``[0, nbins-1]``
    (values outside [lo, hi) land in the edge bins).  The bin expression
    is plain IEEE double arithmetic evaluated identically by numpy and a
    SQL engine (floor breaks no ties the engines disagree on for real
    data), so the SQL mirror hash-matches.

    Per-batch ``bincount`` partials (nbins ints per block) fold through
    one tiny exchange — the classic zero-shuffle profile pass."""
    from .agg import sharded_groupby_apply

    span = float(hi) - float(lo)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        b = np.floor((x - float(lo)) * nbins / span).astype(np.int64)
        b = np.clip(b, 0, nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz, type=pa.int64()),
             "n": pa.array(counts[nz], type=pa.int64())}
        )

    return sharded_groupby_apply(
        ds.select_columns([column]).map_batches(partial, batch_format="pyarrow"),
        ["bin"],
        lambda df: df.groupby("bin", sort=False, as_index=False)["n"].sum(),
        4,
    )
