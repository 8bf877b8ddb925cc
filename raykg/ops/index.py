"""Dense global row numbering (``zipWithIndex``).

KG-embedding trainers consume integer entity ids, not strings: the node
table needs a dense, deterministic ``0..N-1`` numbering before it can feed
an embedding matrix.  Ray Data has no ``zipWithIndex``; this implements it
as the standard two-phase scheme:

1. (optional) ``ds.sort(key)`` — Ray's range-partitioned sort leaves the
   materialized blocks in global key order;
2. one driver-side pass over the BLOCK METADATA ONLY (a row count per
   block — O(num_blocks), no row data) computes each block's starting
   offset, then one raw Ray task per block appends ``offset + arange(n)``.

This is the repo's documented raw-``ray.remote`` exception: the Dataset
API cannot express "my global position" because no batch knows its
block's rank.  Everything stays zero-copy — blocks are consumed and
re-emitted as Arrow via ``from_arrow_refs`` and only int64 offsets cross
the driver.

Determinism contract: with ``sort_key`` given and unique, the numbering
equals SQL ``row_number() OVER (ORDER BY key) - 1`` (binary string
collation both engines).  Without a key the numbering follows the input's
block order — stable for a deterministic upstream plan, but not an
oracle-checkable total order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _with_offset(block, offset: int, id_col: str):
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    ids = pa.array(np.arange(offset, offset + t.num_rows), type=pa.int64())
    return t.append_column(id_col, ids)


@ray.remote
def _block_key_info(block, sort_key: str):
    """(num_rows, key_null_count, first_key) — distinguishes an EMPTY
    block (droppable) from a block whose first key is null (an input
    error that must fail loudly, not silently drop the block's rows)."""
    from ray.data.block import BlockAccessor

    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0:
        return 0, 0, None
    col = t[sort_key]
    return t.num_rows, col.null_count, col[0].as_py()


def zip_with_index(
    ds: "ray.data.Dataset",
    sort_key: Optional[str] = None,
    id_col: str = "rank",
) -> "ray.data.Dataset":
    """Append a dense int64 ``id_col`` numbering rows ``0..N-1`` in
    ``sort_key`` order (or input block order if no key).

    With a key, blocks are ranked BY THEIR OWN first key values — the
    sorted blocks are range-partitioned, so first keys order them
    totally, and the executor's bundle-yield order (not a contract;
    observed to vary under load) never matters."""
    if sort_key is not None:
        try:
            m = ds.sort(sort_key).materialize()
        except Exception as err:
            # Ray's range sort surfaces null keys as an opaque TypeError
            # ("'<' not supported between NoneType and str") deep in the
            # shuffle; a null has no position in the row_number() contract
            # either way, so name the cause.
            raise ValueError(
                f"zip_with_index: sort on {sort_key!r} failed — a null or "
                "mixed-type sort key is the usual cause; filter or fill "
                "the column first"
            ) from err
    else:
        m = ds.materialize()
    refs, counts = [], []
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
    if not refs:
        return m
    if sort_key is not None:
        infos = ray.get([_block_key_info.remote(r, sort_key) for r in refs])
        if any(nulls for _n, nulls, _f in infos):
            raise ValueError(
                f"zip_with_index: sort column {sort_key!r} contains nulls; "
                "a null has no position in the row_number() contract — "
                "filter or fill the column first"
            )
        keyed = sorted(
            (
                (f, c, r)
                for (n, _nulls, f), c, r in zip(infos, counts, refs)
                if n > 0
            ),
            key=lambda t: t[0],
        )
        counts = [c for _f, c, _r in keyed]
        refs = [r for _f, _c, r in keyed]
        if not refs:
            return m
    offsets = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)])
    out = [
        _with_offset.remote(r, int(o), id_col) for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out)
