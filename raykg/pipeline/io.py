"""Partitioned, resumable Parquet output with per-partition lineage manifests.

Layout (north_rule: "resumable from checkpoint with per-partition lineage +
metrics"):

    out_dir/
      part=00017/data.parquet      # one directory per hash partition
      part=00017/manifest.json     # written AFTER the data, atomically
      _schema.json                 # output schema + column descriptions

A partition is complete iff its manifest exists and says ``complete``; both
data file and manifest are written to temp names and renamed, so a killed
run can never leave a partition that looks complete.  Re-running skips
complete partitions — and because the partition key is a deterministic
content hash of ``conv_id`` (crc32, not Python ``hash``), the same rows land
in the same partition on every run and on every cluster size.

The manifest carries lineage + metrics: row count, distinct conversations,
content hash of the data file, and the writer's config fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Set

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..ops.hashing import bucket_column, partition_of

__all__ = ["partition_of", "add_partition_column", "PartitionedWriter",
           "read_jsonl", "write_jsonl", "read_csv", "write_csv"]


def add_partition_column(
    ds: "ray.data.Dataset", key_column: str, num_partitions: int
) -> "ray.data.Dataset":
    def add(batch: pa.Table) -> pa.Table:
        # vectorized crc32-on-vocab kernel; agrees with partition_of() so
        # manifests written by older runs stay valid
        parts = bucket_column(batch[key_column], num_partitions, stable_str=True)
        return batch.append_column("part", parts)

    return ds.map_batches(add, batch_format="pyarrow")


class PartitionedWriter:
    def __init__(self, out_dir: str, num_partitions: int = 64):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        os.makedirs(out_dir, exist_ok=True)

    # -- manifests ----------------------------------------------------------

    def _part_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, f"part={part:05d}")

    def manifest_path(self, part: int) -> str:
        return os.path.join(self._part_dir(part), "manifest.json")

    def done_partitions(self, fingerprint: Optional[str] = None) -> Set[int]:
        """Partitions whose manifest says ``complete`` — and, when a
        ``fingerprint`` is given, whose manifest was written under the SAME
        config fingerprint.  A partition completed under a different config
        is NOT done: skipping it would silently mix outputs of two configs
        in one directory; the writer recomputes (and overwrites) it instead.
        """
        done = set()
        for part in range(self.num_partitions):
            p = self.manifest_path(part)
            if os.path.exists(p):
                try:
                    with open(p) as f:
                        m = json.load(f)
                except (json.JSONDecodeError, OSError):
                    continue
                if m.get("status") != "complete":
                    continue
                if fingerprint is not None and m.get("fingerprint") != fingerprint:
                    continue
                done.add(part)
        return done

    # -- write --------------------------------------------------------------

    def write(
        self,
        ds: "ray.data.Dataset",
        key_column: str = "conv_id",
        resume: bool = True,
        fingerprint: str = "",
        drop_key_column: bool = False,
    ) -> pd.DataFrame:
        """Hash-partition by ``key_column`` and write one parquet + manifest
        per partition; returns the manifest summary as a small DataFrame.

        With ``resume=True``, rows in already-complete partitions are dropped
        *before* the shuffle (and callers that can push the filter to the
        read should do so via ``done_partitions()``).  With
        ``drop_key_column=True`` the key is a ROUTING-ONLY helper column
        and is removed from the written data (callers whose partition key
        is derived, e.g. the node table's source-conv key).
        """
        num_partitions = self.num_partitions
        done = self.done_partitions(fingerprint=fingerprint) if resume else set()
        if len(done) == num_partitions:
            # full resume: every partition complete — pure metadata check,
            # the input pipeline is never executed (a skip-all re-run of a
            # finished job costs manifest scans, not a corpus pass)
            return pd.DataFrame(
                {"part": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64"),
                 "content_md5": pd.Series(dtype="object")}
            )
        with_part = add_partition_column(ds, key_column, num_partitions)
        if done:
            done_arr = sorted(done)

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.invert(pc.is_in(batch["part"], pa.array(done_arr, type=pa.int32())))
                return batch.filter(mask)

            with_part = with_part.map_batches(drop_done, batch_format="pyarrow")

        out_dir = self.out_dir
        part_dir_fmt = self._part_dir

        manifest_path_fmt = self.manifest_path

        def write_group(g: pa.Table) -> pa.Table:
            # pyarrow end-to-end: the group stays object-store-backed Arrow
            # (no whole-partition pandas copy) and is written in bounded
            # record-batch chunks through one ParquetWriter
            part = int(g["part"][0].as_py())
            pdir = part_dir_fmt(part)
            os.makedirs(pdir, exist_ok=True)
            data = g.drop_columns(
                ["part", key_column] if drop_key_column else ["part"]
            )
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            final = os.path.join(pdir, "data.parquet")
            with pq.ParquetWriter(tmp, data.schema) as writer:
                for rb in data.to_batches(max_chunksize=65536):
                    writer.write_batch(rb)
            h = hashlib.md5()
            with open(tmp, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            content_hash = h.hexdigest()
            os.replace(tmp, final)
            import pyarrow.compute as pc

            manifest = {
                "part": part,
                "status": "complete",
                "rows": int(data.num_rows),
                "n_keys": (
                    int(pc.count_distinct(data[key_column]).as_py())
                    if key_column in data.schema.names
                    else None
                ),
                "content_md5": content_hash,
                "columns": list(data.schema.names),
                "fingerprint": fingerprint,
            }
            mtmp = os.path.join(pdir, ".manifest.json.tmp")
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, manifest_path_fmt(part))
            return pa.Table.from_pydict(
                {
                    "part": pa.array([part], type=pa.int64()),
                    "rows": pa.array([manifest["rows"]], type=pa.int64()),
                    "content_md5": pa.array([content_hash], type=pa.string()),
                }
            )

        summary = with_part.groupby("part").map_groups(
            write_group, batch_format="pyarrow"
        )
        result = summary.to_pandas()  # tiny: one row per partition
        if result.empty:  # full resume: every partition already complete
            return pd.DataFrame(
                {"part": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64"),
                 "content_md5": pd.Series(dtype="object")}
            )
        schema_path = os.path.join(out_dir, "_schema.json")
        if not os.path.exists(schema_path) and len(result):
            with open(schema_path, "w") as f:
                json.dump({"num_partitions": num_partitions, "key_column": key_column}, f)
        return result.sort_values("part").reset_index(drop=True)

    def read(self, partitions: Optional[Set[int]] = None) -> "ray.data.Dataset":
        """Read back every complete partition (or only ``partitions`` —
        partition pruning at the read, no post-filter).  Partitions whose
        manifest records zero rows (emptied by an incremental refresh)
        have no data file and are skipped."""
        done = self.done_partitions()
        if partitions is not None:
            done &= {int(p) for p in partitions}
        paths = []
        for p in sorted(done):
            with open(self.manifest_path(p)) as f:
                if json.load(f).get("rows", 0) == 0:
                    continue
            paths.append(os.path.join(self._part_dir(p), "data.parquet"))
        # partitioning=None: the part=NNNNN directory name is writer
        # bookkeeping — hive inference would resurrect it as a column and
        # collide with the next stage's routing column
        return ray.data.read_parquet(paths, partitioning=None)

    # -- incremental maintenance ---------------------------------------------

    def invalidate(self, partitions) -> None:
        """Remove the manifests of ``partitions`` so the next resume-write
        recomputes exactly them.  Only the manifest goes (atomically, one
        unlink each); the stale data file stays until its replacement is
        renamed over it, so a crash between invalidate and rewrite leaves
        the partition marked incomplete — never half-new."""
        for p in partitions:
            path = self.manifest_path(int(p))
            if os.path.exists(path):
                os.remove(path)

    def refresh(
        self,
        ds: "ray.data.Dataset",
        key_column: str,
        partitions,
        fingerprint: str = "",
        drop_key_column: bool = False,
    ) -> pd.DataFrame:
        """Recompute ONLY ``partitions`` from ``ds``: invalidate them, prune
        the input to rows hashing into them (a vectorized mask BEFORE any
        exchange — at 10^12 turns an update touching 0.1% of conversations
        reads 0.1% of partitions' worth of work, not the corpus), and
        resume-write (complete partitions are skipped as usual)."""
        import pyarrow.compute as pc

        from ..ops.hashing import bucket_column

        parts = sorted(int(p) for p in partitions)
        self.invalidate(parts)
        want = pa.array(parts, type=pa.int32())
        num_partitions = self.num_partitions

        def keep(batch: pa.Table) -> pa.Table:
            pcol = bucket_column(batch[key_column], num_partitions, stable_str=True)
            return batch.filter(pc.is_in(pcol, value_set=want))

        filtered = ds.map_batches(keep, batch_format="pyarrow")
        summary = self.write(
            filtered, key_column, resume=True, fingerprint=fingerprint,
            drop_key_column=drop_key_column,
        )
        # a refreshed partition that received NO rows (all of its keys were
        # deleted upstream) still becomes COMPLETE: stale data out, a
        # zero-row manifest in — read() skips it, a later resume keeps it
        for p in parts:
            if not os.path.exists(self.manifest_path(p)):
                pdir = self._part_dir(p)
                os.makedirs(pdir, exist_ok=True)
                data_path = os.path.join(pdir, "data.parquet")
                if os.path.exists(data_path):
                    os.remove(data_path)
                mtmp = os.path.join(pdir, ".manifest.json.tmp")
                with open(mtmp, "w") as f:
                    json.dump(
                        {"part": p, "status": "complete", "rows": 0,
                         "n_keys": 0, "content_md5": None, "columns": [],
                         "fingerprint": fingerprint},
                        f,
                    )
                os.replace(mtmp, self.manifest_path(p))
        return summary


# --- JSONL source/sink -------------------------------------------------------
#
# The reference runs inside DSS's format-agnostic dataset abstraction; the
# second wire format here is newline-delimited JSON (the lingua franca of
# LLM training dumps).  Reads stream through Ray's native JSON reader (one
# task per file, Arrow blocks out); writes stream block-by-block — one
# shard file per block, so a writer task never holds more than one block.

def read_jsonl(
    paths, columns: Optional[list] = None, **kwargs
) -> "ray.data.Dataset":
    """Read newline-delimited JSON into Arrow blocks; ``columns`` prunes
    immediately after parse (JSON has no column projection at the codec
    level, so pruning happens at the first map — still before any exchange
    or materialization)."""
    ds = ray.data.read_json(paths, **kwargs)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def _encode_jsonl(batch: pa.Table) -> bytes:
    buf = "\n".join(
        json.dumps(rec, ensure_ascii=False, sort_keys=True, default=str)
        for rec in batch.to_pylist()
    )
    return (buf + "\n").encode("utf-8") if buf else b""


def _write_shards(ds: "ray.data.Dataset", out_dir: str, ext: str,
                  encode, max_in_flight: int = 64) -> int:
    """Stream the dataset's blocks to ``shard-<ordinal>-<md5>.<ext>``
    files via one Ray write task per block.

    Shard names mix a DETERMINISTIC per-run block ordinal with the
    content hash: the ordinal makes names unique even when two distinct
    blocks hold byte-identical content (a pure content-addressed name
    silently collapsed them — row count said N, disk held N-k), while
    the hash keeps a retried task overwriting its own partial file (Ray
    re-executes a failed write task with the same block and the driver
    never re-issues an ordinal).  Blocks stream through
    ``iter_internal_ref_bundles`` with ``max_in_flight`` write tasks
    outstanding, so the pipeline keeps its backpressure and the driver
    holds refs, never data."""
    import ray as _ray

    os.makedirs(out_dir, exist_ok=True)

    @_ray.remote
    def write_block(block, ordinal: int) -> int:
        tab = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        data = encode(tab)
        name = f"shard-{ordinal:06d}-{hashlib.md5(data).hexdigest()[:8]}"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, f"{name}.{ext}"))
        return tab.num_rows

    futures, rows, ordinal = [], 0, 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            futures.append(write_block.remote(ref, ordinal))
            ordinal += 1
            if len(futures) >= max_in_flight:
                # drain half the window per wait: one wait/get round-trip
                # amortizes over many tasks (a 1-at-a-time drain would put
                # ~1 ms of driver latency on EVERY block at 10^5+ blocks)
                done, futures = _ray.wait(
                    futures, num_returns=max_in_flight // 2
                )
                rows += sum(_ray.get(done))
    rows += sum(_ray.get(futures))
    return int(rows)


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> int:
    """Write one ``shard-*.jsonl`` file per block; returns row count.
    Naming/retry contract in :func:`_write_shards`."""
    return _write_shards(ds, out_dir, "jsonl", _encode_jsonl)


def read_csv(
    paths, columns: Optional[list] = None, **kwargs
) -> "ray.data.Dataset":
    """Read CSV into Arrow blocks (header row expected).  ``columns``
    projects right after parse — the Arrow CSV reader decodes whole rows,
    so pruning happens at the first map, before any exchange."""
    ds = ray.data.read_csv(paths, **kwargs)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def _encode_csv(batch: pa.Table) -> bytes:
    import io as _io

    import pyarrow.csv as pacsv

    sink = _io.BytesIO()
    pacsv.write_csv(batch, sink)
    return sink.getvalue()


def write_csv(ds: "ray.data.Dataset", out_dir: str) -> int:
    """Write one ``shard-*.csv`` file per block via Arrow's CSV writer
    (vectorized, no per-row Python); naming/retry contract in
    :func:`_write_shards`."""
    return _write_shards(ds, out_dir, "csv", _encode_csv)
