"""Z-order (Morton) keys — multi-dimensional locality for partitioning.

Range queries over two dimensions (time x tenant, price x size,
lat x lon) can prune partitions only if rows near in BOTH dimensions
land in the same partition; sorting by either column alone scatters the
other.  The z-order curve interleaves the bits of the two values
(Morton 1966 — the technique behind Delta/Iceberg ``OPTIMIZE ZORDER
BY``), so one int64 sort key preserves 2-D locality and the existing
1-D machinery (sort, range partitioner, min/max pruning) gets
2-D pruning for free.

Purely a stateless per-batch map — zero exchange; the numpy kernel is
the classic shift-and-mask bit spread (5 vector ops per column, no
Python per row).  Callers pre-scale values into ``[0, 2**bits)``;
``bits <= 32`` per dimension (the pair fills an int64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def spread_bits(x: np.ndarray) -> np.ndarray:
    """Insert a zero between every bit of the low 32 bits (uint64 lanes)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & _M16
    x = (x | (x << np.uint64(8))) & _M8
    x = (x | (x << np.uint64(4))) & _M4
    x = (x | (x << np.uint64(2))) & _M2
    x = (x | (x << np.uint64(1))) & _M1
    return x


def morton_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave x (even bit positions) and y (odd positions) -> int64."""
    return (spread_bits(x) | (spread_bits(y) << np.uint64(1))).astype(
        np.int64
    )


def zorder_key(
    ds: "ray.data.Dataset",
    x_column: str,
    y_column: str,
    out_column: str = "z",
    bits: int = 16,
) -> "ray.data.Dataset":
    """Append ``out_column`` = Morton key of the two integer columns.
    Values must already lie in ``[0, 2**bits)`` — out-of-range bits
    would silently alias tiles, so they fail loudly."""
    if bits > 32:
        raise ValueError("bits > 32 per dimension overflows int64")
    lim = np.int64(1) << np.int64(bits)

    def add_z(batch: pa.Table) -> pa.Table:
        x = batch[x_column].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_column].to_numpy(zero_copy_only=False).astype(np.int64)
        if (x < 0).any() or (y < 0).any() or (x >= lim).any() or (y >= lim).any():
            raise ValueError(f"zorder inputs outside [0, 2**{bits})")
        return batch.append_column(
            out_column, pa.array(morton_key(x, y), type=pa.int64())
        )

    return ds.map_batches(add_z, batch_format="pyarrow")


def zorder_sql_expr(x_expr: str, y_expr: str, bits: int) -> str:
    """DuckDB mirror of :func:`morton_key`: the explicit bit-by-bit
    interleave as integer arithmetic (for oracle parity)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)
