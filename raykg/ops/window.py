"""Per-key ordered window functions — SQL's ``... OVER (PARTITION BY key
ORDER BY ts)`` family (lag / lead / row_number / running aggregates).

Scale shape: rides :func:`raykg.ops.agg.sharded_groupby_apply`, so the
only exchange is ONE shuffle on ``hash(key) % num_shards`` (O(shards)
engine groups, never a Python call per key); inside a shard every window
column is computed in a single vectorized pandas pass (``groupby.shift``
/ ``cumsum`` / ``cumcount`` are Cython kernels).  Rows of one key are
co-located by the shard hash, so per-key windows are exact regardless of
how the input was blocked.  Determinism contract: ``order_by`` must be a
total order within each key (include a unique tiebreak column such as a
row id) — the same contract SQL window functions need for reproducible
LAG/running sums.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pandas as pd

import ray.data

from .agg import sharded_groupby_apply

# (kind, src_column_or_None, out_column, param)
WindowSpec = Tuple[str, Optional[str], str, object]

_KINDS = {
    "lag", "lead", "row_number", "cumsum", "cummax", "cummin", "delta",
    "rolling_sum", "percent_rank", "ntile", "rank", "dense_rank",
}
_RANK_KINDS = {"row_number", "percent_rank", "ntile", "rank", "dense_rank"}


def window_over(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_by: Sequence[str],
    specs: Sequence[WindowSpec],
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Append window columns per ``specs`` over ``PARTITION BY keys ORDER
    BY order_by``.

    Spec kinds (param meaning):

    - ``("lag", src, out, (offset, fill))`` — value ``offset`` rows back
      within the key, ``fill`` where no such row exists (use a sentinel
      rather than None when the result feeds an engine-comparison path —
      Arrow null vs NaN round-trips differ between engines).
    - ``("lead", src, out, (offset, fill))`` — symmetric, rows ahead.
    - ``("row_number", None, out, None)`` — 1-based position in the key.
    - ``("cumsum" | "cummax" | "cummin", src, out, None)`` — running
      aggregate including the current row.
    - ``("delta", src, out, fill)`` — ``src - lag(src, 1)``; ``fill`` for
      each key's first row.
    - ``("rolling_sum", src, out, w)`` — sum of the trailing ``w``-row
      window including the current row (SQL ``ROWS BETWEEN w-1 PRECEDING
      AND CURRENT ROW``); shorter at each key's start, like SQL.
    - ``("percent_rank", None, out, None)`` — SQL PERCENT_RANK:
      ``(rank - 1) / (n - 1)``, 0.0 for single-row keys; under this
      module's total-order contract rank == row_number, and the integer
      division is the identical double on any engine.
    - ``("ntile", None, out, k)`` — SQL NTILE(k): the first ``n mod k``
      buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)``.
    """
    keys, order_by = list(keys), list(order_by)
    for kind, _src, _out, _p in specs:
        if kind not in _KINDS:
            raise ValueError(f"unknown window kind: {kind!r}")

    # Rank-only windows (percent_rank / ntile / row_number) depend only on
    # each row's position and its key's total count, never on neighbor
    # VALUES — route them to rank-by-sort (`ops/rank.with_keyed_ranks`):
    # one range-partitioned sort, no worker ever holds a whole key.  The
    # sharded path below co-locates every row of a key in ONE shard
    # worker, which dies at 100 TB for low-cardinality keys (a language,
    # a priority).  Value windows (lag / cumsum / ...) keep the sharded
    # plan: they need neighbor rows, and their keys are high-cardinality
    # in every caller (per-customer, per-conversation).
    if all(kind in _RANK_KINDS for kind, _s, _o, _p in specs):
        from .rank import with_keyed_ranks

        return with_keyed_ranks(ds, keys, order_by, specs)
    if any(kind in ("rank", "dense_rank") for kind, _s, _o, _p in specs):
        raise ValueError(
            "rank/dense_rank ride the rank-by-sort path and cannot mix "
            "with value kinds (lag/cumsum/...) in one window_over call — "
            "split the call"
        )

    def shard_windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_by, kind="stable").reset_index(drop=True)
        g = df.groupby(keys, sort=False)
        for kind, src, out, param in specs:
            if kind == "row_number":
                df[out] = g.cumcount() + 1
            elif kind == "percent_rank":
                rn = g.cumcount()
                n = g[order_by[0]].transform("size")
                import numpy as np

                df[out] = np.where(n > 1, rn / (n - 1).clip(lower=1), 0.0)
            elif kind == "ntile":
                import numpy as np

                k = int(param)
                rn = (g.cumcount() + 1).to_numpy()
                n = g[order_by[0]].transform("size").to_numpy()
                q, r = n // k, n % k
                big = (q + 1) * r  # rows covered by the larger buckets
                df[out] = np.where(
                    rn <= big,
                    (rn + q) // (q + 1),
                    np.where(q > 0, r + (rn - big + q - 1) // np.maximum(q, 1), r),
                ).astype("int64")
            elif kind in ("lag", "lead"):
                offset, fill = param if isinstance(param, tuple) else (param or 1, None)
                shifted = g[src].shift(offset if kind == "lag" else -offset)
                df[out] = shifted if fill is None else shifted.fillna(fill)
            elif kind == "delta":
                d = df[src] - g[src].shift(1)
                df[out] = d if param is None else d.fillna(param)
            elif kind == "rolling_sum":
                df[out] = (
                    g[src]
                    .rolling(int(param), min_periods=1)
                    .sum()
                    .reset_index(drop=True)
                )
            else:  # cumsum / cummax / cummin
                df[out] = getattr(g[src], kind)()
        return df

    return sharded_groupby_apply(ds, keys, shard_windows, num_shards=num_shards)
