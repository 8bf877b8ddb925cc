"""Cardinality sketching — KMV (k-minimum-values) approximate distinct
count.

The exact distinct count of a corpus-scaled key needs an all-to-all
exchange of every distinct value; the KMV sketch replaces it with a
BOUNDED summary: each block contributes its k smallest 60-bit hash
values (≤ k rows per block regardless of block size), merging is a
tiny global ``sort().limit(k)``, and the estimate comes from the k-th
smallest hash — ``(k-1) * 2^60 / h_k`` (uniform order statistics).
When fewer than k distinct hashes exist the sketch IS the distinct set
and the count is exact.  Standard error ~ 1/sqrt(k-2) (~6% at k=256).

The hash is the corpus-auditability idiom from ``ops/sample.py``: the
first 15 hex chars of ``md5(str(value))`` — cross-engine reproducible,
so a SQL engine computes the *identical* sketch and estimate (DuckDB:
``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT``).  The
estimate is integer arithmetic end-to-end: deterministic, exactly
comparable.
"""

from __future__ import annotations

import hashlib
import heapq

import numpy as np
import pandas as pd

import ray
import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import BlockAccessor

_BITS = 60  # 15 hex chars; fits int64 with headroom


def _h60(value) -> int:
    return int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)


class KmvSketch(AggregateFnV2):
    """Dataset-native KMV accumulator: each block contributes its ≤ k
    smallest distinct hashes, partials tree-combine through Ray Data's
    aggregate machinery (never through the driver), and ``finalize``
    turns the k-th order statistic into the integer estimate."""

    def __init__(self, on: str, k: int = 256):
        self._k = k
        super().__init__(
            f"kmv({on})",
            zero_factory=lambda: np.zeros(0, dtype=np.int64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = BlockAccessor.for_block(block).to_arrow()[self.get_target_column()]
        hs = {_h60(v) for v in col.to_pylist() if v is not None}
        return np.array(sorted(heapq.nsmallest(self._k, hs)), dtype=np.int64)

    def combine(self, acc: np.ndarray, new: np.ndarray) -> np.ndarray:
        return np.union1d(acc, new)[: self._k]

    def finalize(self, acc: np.ndarray) -> int:
        if len(acc) < self._k:
            return int(len(acc))
        return (self._k - 1) * (1 << _BITS) // int(acc[-1])


def kmv_distinct(
    ds: "ray.data.Dataset", column: str, k: int = 256
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) via a k-minimum-values sketch.

    Returns a one-row DataFrame ``{n_distinct_est}``.  Per-block and
    per-combine state is ≤ k ints — the sketch contract is exactly that
    nothing cardinality-sized ever moves or materializes."""
    out = ds.aggregate(KmvSketch(column, k=k))
    return pd.DataFrame([{"n_distinct_est": int(out[f"kmv({column})"])}])


def kmv_oracle_sql(table: str, column: str, k: int = 256) -> str:
    """The DuckDB mirror of :func:`kmv_distinct` — identical hash,
    identical integer estimate."""
    return f"""
    WITH h AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
               FROM {table} WHERE {column} IS NOT NULL),
    k AS (SELECT h FROM h ORDER BY h LIMIT {k})
    SELECT CAST(CASE WHEN (SELECT COUNT(*) FROM k) < {k}
                     THEN (SELECT COUNT(*) FROM k)
                     ELSE ({k - 1} * (CAST(1 AS HUGEINT) << {_BITS}))
                          // (SELECT MAX(h) FROM k)
                END AS BIGINT) AS n_distinct_est
    """


# --- Count-Min sketch ---------------------------------------------------------

def _cm_bucket(row: int, value, width: int) -> int:
    """Row-salted 60-bit md5 bucket — same cross-engine idiom as the KMV
    hash, so a SQL engine computes the identical sketch cell."""
    h = int(
        hashlib.md5(f"{row}:{value}".encode("utf-8")).hexdigest()[:15], 16
    )
    return h % width


class CountMinSketch(AggregateFnV2):
    """Dataset-native Count-Min accumulator: a fixed (depth x width) int64
    matrix per block (independent of block size), elementwise-summed
    through Ray Data's tree combine.  Point estimates upper-bound true
    frequencies; error ≤ 2N/width with prob 1 - 2^-depth.  Per-block cost
    is depth md5 calls per DISTINCT value (value_counts first), not per
    row."""

    def __init__(self, on: str, depth: int = 4, width: int = 512):
        self._d = depth
        self._w = width
        super().__init__(
            f"countmin({on})",
            zero_factory=lambda: np.zeros((depth, width), dtype=np.int64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = BlockAccessor.for_block(block).to_arrow()[self.get_target_column()]
        acc = np.zeros((self._d, self._w), dtype=np.int64)
        counts: dict = {}
        for v in col.to_pylist():
            if v is not None:
                counts[v] = counts.get(v, 0) + 1
        for v, c in counts.items():
            for i in range(self._d):
                acc[i, _cm_bucket(i, v, self._w)] += c
        return acc

    def combine(self, acc: np.ndarray, new: np.ndarray) -> np.ndarray:
        return acc + new

    def finalize(self, acc: np.ndarray) -> np.ndarray:
        return acc


def countmin_counts(
    ds: "ray.data.Dataset",
    column: str,
    probes,
    depth: int = 4,
    width: int = 512,
) -> pd.DataFrame:
    """Count-Min point estimates for ``probes``: one bounded-size sketch
    exchange (depth x width ints per block), then a driver-side probe of
    depth cells per key.  Returns (key, est) sorted by key."""
    sketch = ds.aggregate(CountMinSketch(column, depth=depth, width=width))[
        f"countmin({column})"
    ]
    rows = [
        {
            "key": str(p),
            "est": int(
                min(sketch[i, _cm_bucket(i, p, width)] for i in range(depth))
            ),
        }
        for p in probes
    ]
    return pd.DataFrame(rows).sort_values("key").reset_index(drop=True)


def countmin_oracle_sql(
    table: str, column: str, probes, depth: int = 4, width: int = 512
) -> str:
    """DuckDB mirror of :func:`countmin_counts` — identical row-salted
    hash, identical cells, identical min-over-rows estimate."""
    probe_values = ", ".join(f"('{p}')" for p in probes)
    rows = ", ".join(str(i) for i in range(depth))
    bucket = (
        "CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || "
        "CAST({v} AS VARCHAR)), 1, 15)) AS BIGINT) % {w}"
    )
    return f"""
    WITH probes(key) AS (VALUES {probe_values}),
    occ AS (SELECT i, {bucket.format(v=column, w=width)} AS b
            FROM {table}, UNNEST([{rows}]) u(i)
            WHERE {column} IS NOT NULL),
    cm AS (SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY 1, 2),
    pe AS (SELECT key, i, {bucket.format(v="key", w=width)} AS b
           FROM probes, UNNEST([{rows}]) u(i))
    SELECT key, CAST(MIN(COALESCE(cm.c, 0)) AS BIGINT) AS est
    FROM pe LEFT JOIN cm USING (i, b)
    GROUP BY key ORDER BY key
    """


# --- HyperLogLog --------------------------------------------------------------

_HLL_P = 10                      # 2^10 = 1024 registers
_HLL_WBITS = _BITS - _HLL_P      # 50-bit sub-hash word per value


def _hll_parts(values) -> "np.ndarray":
    """(idx, rho) pairs for a set of values: idx = top p bits of the
    60-bit md5 hash, rho = leading-zero rank of the remaining 50-bit
    word (w == 0 -> 51).  floor(log2(w)) is exact for w < 2^53, so a SQL
    engine computes the identical rho."""
    hs = np.array([_h60(v) for v in values], dtype=np.int64)
    idx = hs >> _HLL_WBITS
    w = hs & ((1 << _HLL_WBITS) - 1)
    rho = np.where(
        w == 0,
        _HLL_WBITS + 1,
        _HLL_WBITS - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64),
    )
    return idx, rho


class HllSketch(AggregateFnV2):
    """Dataset-native HyperLogLog accumulator: a fixed array of 2^p
    max-rank registers per block, elementwise-max through the tree
    combine.  max() is order-independent, so the register state — unlike
    a Misra-Gries/space-saving summary — is reproducible across any
    partitioning AND bit-equal to a SQL mirror (GROUP BY idx, MAX(rho)
    over the same md5-derived ranks)."""

    def __init__(self, on: str):
        super().__init__(
            f"hll({on})",
            zero_factory=lambda: np.zeros(1 << _HLL_P, dtype=np.int64),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> np.ndarray:
        col = BlockAccessor.for_block(block).to_arrow()[self.get_target_column()]
        vals = {v for v in col.to_pylist() if v is not None}
        acc = np.zeros(1 << _HLL_P, dtype=np.int64)
        if vals:
            idx, rho = _hll_parts(sorted(vals, key=str))
            np.maximum.at(acc, idx, rho)
        return acc

    def combine(self, acc: np.ndarray, new: np.ndarray) -> np.ndarray:
        return np.maximum(acc, new)

    def finalize(self, acc: np.ndarray) -> np.ndarray:
        return acc


def hll_registers(ds: "ray.data.Dataset", column: str) -> pd.DataFrame:
    """Occupied HLL registers ``(idx, rho)`` — the full sketch state,
    exactly (the float cardinality estimate lives in
    :func:`hll_estimate`; the registers are the oracle surface)."""
    regs = ds.aggregate(HllSketch(column))[f"hll({column})"]
    nz = np.nonzero(regs)[0]
    return pd.DataFrame(
        {"idx": nz.astype(np.int64), "rho": regs[nz].astype(np.int64)}
    )


def hll_estimate(registers: pd.DataFrame, p: int = _HLL_P) -> float:
    """Standard HLL harmonic-mean estimate with the small-range
    linear-counting correction (test surface; float)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    regs[registers["idx"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(est)


def hll_oracle_sql(table: str, column: str) -> str:
    """DuckDB mirror of :func:`hll_registers` — identical hash, idx, rho."""
    w_mask = (1 << _HLL_WBITS) - 1
    return f"""
    WITH h AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
               FROM {table} WHERE {column} IS NOT NULL),
    parts AS (SELECT h >> {_HLL_WBITS} AS idx,
                     h & {w_mask} AS w FROM h),
    rr AS (SELECT idx,
                  CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                       ELSE {_HLL_WBITS} - CAST(floor(log2(w)) AS BIGINT)
                  END AS rho
           FROM parts)
    SELECT idx, CAST(MAX(rho) AS BIGINT) AS rho FROM rr GROUP BY idx
    """


def histogram_quantiles(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    quantiles=(0.5, 0.9, 0.99),
    scale: int = 16,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Mergeable histogram-quantile sketch — the bounded-memory companion
    to ``ops/events.key_quantiles`` for keys whose VALUE VOLUME exceeds a
    worker's heap (that function's documented limit).

    Values are binned at ``bin = floor(value * scale)`` with ``scale`` a
    power of two (the multiply is exact in doubles — the repo's
    fixed-point idiom), per-batch partials pre-count ``(key, bin)`` pairs,
    and ONE key-sharded exchange of BIN COUNTS (volume O(distinct bins),
    not O(rows)) folds them; the reported quantile is the lower edge
    ``bin / scale`` of the first bin whose cumulative count reaches
    ``ceil(q * n)`` — within 1/scale of the exact quantile_disc, fully
    deterministic, and mirrored bit-for-bit by a SQL window cumsum (same
    double ``q * n`` both engines).

    Like ``key_quantiles`` this is the bounded-KEY-cardinality shape
    (metrics keyed by type/tenant/model) — the final per-key fold is a
    Python pass per distinct key; what the sketch removes is the bound
    on per-key VALUE volume (counts replace values on the wire).
    """
    import pyarrow as pa

    from .agg import sharded_groupby_apply

    qs = list(quantiles)
    names = [f"p{round(q * 100):d}" for q in qs]

    def partial(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        binned = pc.cast(
            pc.floor(pc.multiply(pc.cast(batch[value_column], pa.float64()),
                                 float(scale))),
            pa.int64(),
        )
        t = pa.table({key_column: batch[key_column], "bin": binned})
        return t.group_by([key_column, "bin"]).aggregate([("bin", "count")]).rename_columns(
            [key_column, "bin", "c"]
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby(key_column, sort=False):
            cnt = g.groupby("bin")["c"].sum().sort_index()
            cum = cnt.cumsum().to_numpy()
            bins = cnt.index.to_numpy()
            n = int(cum[-1])
            row = {key_column: k}
            for q, name in zip(qs, names):
                target = np.ceil(q * n)  # same IEEE multiply as the oracle
                row[name] = float(bins[np.searchsorted(cum, target)] / scale)
            rows.append(row)
        return pd.DataFrame(rows, columns=[key_column, *names])

    return sharded_groupby_apply(
        ds.select_columns([key_column, value_column]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [key_column],
        combine,
        num_shards=num_shards,
    )


def histogram_quantiles_sql(
    table: str,
    key_column: str,
    value_column: str,
    quantiles=(0.5, 0.9, 0.99),
    scale: int = 16,
) -> str:
    """DuckDB mirror of :func:`histogram_quantiles` (bit-exact)."""
    cols = ", ".join(
        f"MIN(CASE WHEN cum >= ceil({q} * CAST(n AS DOUBLE)) THEN bin END) / {scale}.0 "
        f"AS p{round(q * 100):d}"
        for q in quantiles
    )
    return f"""
    WITH b AS (SELECT {key_column}, CAST(floor({value_column} * {scale}) AS BIGINT) AS bin,
                      COUNT(*) AS c
               FROM {table} GROUP BY 1, 2),
    tot AS (SELECT {key_column}, CAST(SUM(c) AS BIGINT) AS n FROM b GROUP BY 1),
    cum AS (SELECT b.{key_column}, b.bin, n,
                   SUM(c) OVER (PARTITION BY b.{key_column} ORDER BY b.bin) AS cum
            FROM b JOIN tot USING ({key_column}))
    SELECT {key_column}, {cols} FROM cum GROUP BY {key_column}
    """


def heavy_hitters(
    ds: "ray.data.Dataset",
    column: str,
    min_count: int,
    depth: int = 4,
    width: int = 4096,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """EXACT iceberg query (``GROUP BY k HAVING count(*) >= T``) without a
    key-cardinality exchange.

    Pass 1 folds one Count-Min sketch over the whole column (bounded
    ``depth x width`` state through Ray's tree combine).  Because CM
    never underestimates, every truly-heavy key probes >= ``min_count``
    — the sketch-filtered candidate set is a SUPERSET of the answer.
    Pass 2 re-reads the column: each batch pre-counts its values, probes
    the broadcast sketch, and emits partials ONLY for candidate keys, so
    the exchange carries O(N/min_count + false positives) keys instead
    of every distinct key; the sharded fold sums exactly and applies the
    threshold.  False positives (CM overestimates light keys) survive to
    the fold and are cut by their exact sums — the result is exact.

    Returns ``(key, n)`` with the input column's dtype preserved.
    """
    from .agg import sharded_groupby_apply

    sk = ds.aggregate(CountMinSketch(column, depth=depth, width=width))[
        f"countmin({column})"
    ]
    sk_ref = ray.put(sk)

    def candidates(df: pd.DataFrame, sk_ref=sk_ref) -> pd.DataFrame:
        sketch = ray.get(sk_ref)
        vc = df[column].value_counts()
        keys, counts = [], []
        for v, c in vc.items():
            est = min(
                sketch[i, _cm_bucket(i, v, width)] for i in range(depth)
            )
            if est >= min_count:
                keys.append(v)
                counts.append(int(c))
        out = pd.DataFrame({"key": keys, "n": counts})
        out["key"] = out["key"].astype(df[column].dtype)
        return out

    partials = ds.map_batches(candidates, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", sort=False)["n"].sum().reset_index()
        return g[g["n"] >= min_count]

    return sharded_groupby_apply(partials, ["key"], fold, num_shards=num_shards)


def hll_registers_by(
    ds: "ray.data.Dataset",
    group_column: str,
    column: str,
    num_shards: int = 64,
) -> "ray.data.Dataset":
    """Per-group HyperLogLog register state ``(group, idx, rho)`` —
    approximate distinct counts for EVERY group in one pass (distinct
    users per event type, distinct docs per shard) without a
    per-group exact-distinct exchange.

    Each batch folds its rows to at most ``groups x 2^p`` register
    partials (per-batch dedup + max), so the single group-sharded
    exchange carries sketch state, never values; the fold is one more
    vectorized max.  Register semantics identical to :class:`HllSketch`
    (same md5 idx/rho split), so the SQL mirror is bit-equal per group;
    feed a group's registers to :func:`hll_estimate` for the float
    cardinality."""
    from .agg import sharded_groupby_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in df.groupby(group_column, sort=False):
            vals = {v for v in sub[column] if v is not None}
            if not vals:
                continue
            idx, rho = _hll_parts(sorted(vals, key=str))
            t = pd.DataFrame({group_column: g, "idx": idx, "rho": rho})
            outs.append(
                t.groupby([group_column, "idx"], as_index=False)["rho"].max()
            )
        if not outs:
            return pd.DataFrame(
                {group_column: pd.Series([], dtype=df[group_column].dtype),
                 "idx": pd.Series([], dtype=np.int64),
                 "rho": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    parts = ds.select_columns([group_column, column]).map_batches(
        partial, batch_format="pandas"
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([group_column, "idx"], as_index=False)["rho"].max()

    return sharded_groupby_apply(parts, [group_column], fold, num_shards)


def hll_by_oracle_sql(table: str, group_column: str, column: str) -> str:
    """DuckDB mirror of :func:`hll_registers_by` — identical hash/idx/rho
    per group."""
    w_mask = (1 << _HLL_WBITS) - 1
    return f"""
    WITH h AS (SELECT DISTINCT {group_column},
                 CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
               FROM {table} WHERE {column} IS NOT NULL),
    parts AS (SELECT {group_column}, h >> {_HLL_WBITS} AS idx,
                     h & {w_mask} AS w FROM h),
    rr AS (SELECT {group_column}, idx,
                  CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                       ELSE {_HLL_WBITS} - CAST(floor(log2(w)) AS BIGINT)
                  END AS rho
           FROM parts)
    SELECT {group_column}, idx, CAST(MAX(rho) AS BIGINT) AS rho
    FROM rr GROUP BY {group_column}, idx
    """
