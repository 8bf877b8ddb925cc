"""Changeset application (CDC merge / upsert-delete) by primary key.

``apply_changeset(snapshot, changes, key)`` produces the next snapshot:
for every key the highest-version change wins — an ``upsert`` row
replaces (or inserts) the record, a ``delete`` removes it — and keys
without changes keep their snapshot row.  This is the MERGE INTO /
table-format (Delta/Iceberg-style) upsert semantic as a pure Ray Data
transform.

Scale shape: ONE key-sharded exchange over ``snapshot ∪ changes`` —
both sides are tagged (snapshot precedence below any change) and
co-sharded by the key, then each shard resolves winners with a single
vectorized sort + keep-last pass.  No driver-side state; a key's
history never spans shards.  Ties on ``version`` within one key resolve
to the later row in input order (stable sort), so feeds should carry a
monotone version (commit LSN, timestamp).

The reference plugin is batch-only with no update semantics; this
extends the warehouse family (`ops/rollup.py`, `ops/join.py`).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .agg import sharded_groupby_apply

_SRC = "__m_src"
_VER = "__m_ver"
_OP = "__m_op"


def apply_changeset(
    snapshot: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key: str,
    op_col: str = "op",
    version_col: str = "version",
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Next snapshot after applying ``changes`` (columns = snapshot
    columns + ``op_col`` in {'upsert','delete'} + ``version_col``)."""
    data_cols = snapshot.schema().names
    if key not in data_cols:
        raise ValueError(f"key column {key!r} missing from snapshot")

    def tag_snap(df: pd.DataFrame) -> pd.DataFrame:
        df = df[data_cols].copy()
        df[_SRC] = np.int8(0)
        df[_VER] = np.float64(-np.inf)
        df[_OP] = "upsert"
        return df

    def tag_change(df: pd.DataFrame) -> pd.DataFrame:
        out = df[data_cols].copy()
        out[_SRC] = np.int8(1)
        out[_VER] = df[version_col].to_numpy().astype(np.float64)
        out[_OP] = df[op_col].to_numpy()
        return out

    tagged = snapshot.map_batches(tag_snap, batch_format="pandas").union(
        changes.map_batches(tag_change, batch_format="pandas")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, _SRC, _VER], kind="stable")
        last = df.drop_duplicates([key], keep="last")
        return last[last[_OP] != "delete"][data_cols]

    return sharded_groupby_apply(tagged, [key], resolve, num_shards)


def table_diff(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    num_shards: int = 32,
) -> "ray.data.Dataset":
    """Row-level diff of two keyed tables: ``(key, status)`` with status
    in {'only_left', 'only_right', 'changed'}; identical rows are
    omitted.  The drill-down companion to
    `ops/profile.table_checksum` — the checksum says WHETHER a copy
    drifted, the diff says WHERE.

    One key-sharded exchange of side-tagged rows; each shard compares
    with a single vectorized merge over the non-key columns (string
    form, the checksum's canonicalization contract).  Keys must be
    unique per side (primary-key tables)."""
    cols = [c for c in left.schema().names if c != key]
    if set(cols) != set(c for c in right.schema().names if c != key):
        raise ValueError("table_diff requires identical schemas")

    def canon(s: pd.Series) -> pd.Series:
        # vectorized string canonicalization (astype(str) is a C loop;
        # a per-cell .map(lambda) here measured 2x the whole diff time)
        return s.astype(object).where(s.notna(), "<null>").astype(str)

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({key: df[key]})
            body = canon(df[cols[0]])
            for c in cols[1:]:
                body = body + "|" + canon(df[c])
            out["__body"] = body
            out["__side"] = np.int8(side)
            return out

        return fn

    tagged = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def compare(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        m = l[[key, "__body"]].merge(
            r[[key, "__body"]], on=key, how="outer", suffixes=("_l", "_r"),
            indicator=True,
        )
        status = np.where(
            m["_merge"] == "left_only",
            "only_left",
            np.where(m["_merge"] == "right_only", "only_right", "changed"),
        )
        keep = (m["_merge"] != "both") | (m["__body_l"] != m["__body_r"])
        out = pd.DataFrame({key: m[key], "status": status})[keep]
        return out

    return sharded_groupby_apply(tagged, [key], compare, num_shards)
