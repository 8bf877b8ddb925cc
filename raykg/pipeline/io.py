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
import zlib
from typing import Set

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def partition_of(key: str, num_partitions: int) -> int:
    """Deterministic, process-stable partition id (zlib.crc32, NOT hash())."""
    return zlib.crc32(key.encode("utf-8")) % num_partitions


def add_partition_column(
    ds: "ray.data.Dataset", key_column: str, num_partitions: int
) -> "ray.data.Dataset":
    def add(batch: pa.Table) -> pa.Table:
        parts = pa.array(
            [partition_of(k, num_partitions) for k in batch[key_column].to_pylist()],
            type=pa.int32(),
        )
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

    def done_partitions(self) -> Set[int]:
        done = set()
        for part in range(self.num_partitions):
            p = self.manifest_path(part)
            if os.path.exists(p):
                try:
                    with open(p) as f:
                        if json.load(f).get("status") == "complete":
                            done.add(part)
                except (json.JSONDecodeError, OSError):
                    continue
        return done

    # -- write --------------------------------------------------------------

    def write(
        self,
        ds: "ray.data.Dataset",
        key_column: str = "conv_id",
        resume: bool = True,
        fingerprint: str = "",
    ) -> pd.DataFrame:
        """Hash-partition by ``key_column`` and write one parquet + manifest
        per partition; returns the manifest summary as a small DataFrame.

        With ``resume=True``, rows in already-complete partitions are dropped
        *before* the shuffle (and callers that can push the filter to the
        read should do so via ``done_partitions()``).
        """
        num_partitions = self.num_partitions
        with_part = add_partition_column(ds, key_column, num_partitions)
        done = self.done_partitions() if resume else set()
        if done:
            done_arr = sorted(done)

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.invert(pc.is_in(batch["part"], pa.array(done_arr, type=pa.int32())))
                return batch.filter(mask)

            with_part = with_part.map_batches(drop_done, batch_format="pyarrow")

        out_dir = self.out_dir
        part_dir_fmt = self._part_dir

        def write_group(g: pd.DataFrame) -> pd.DataFrame:
            part = int(g["part"].iloc[0])
            pdir = part_dir_fmt(part)
            os.makedirs(pdir, exist_ok=True)
            data = g.drop(columns=["part"])
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            final = os.path.join(pdir, "data.parquet")
            table = pa.Table.from_pandas(data, preserve_index=False)
            pq.write_table(table, tmp)
            with open(tmp, "rb") as f:
                content_hash = hashlib.md5(f.read()).hexdigest()
            os.replace(tmp, final)
            manifest = {
                "part": part,
                "status": "complete",
                "rows": int(len(data)),
                "n_keys": int(data[key_column].nunique()) if key_column in data else None,
                "content_md5": content_hash,
                "columns": list(data.columns),
                "fingerprint": fingerprint,
            }
            mtmp = os.path.join(pdir, ".manifest.json.tmp")
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, self.manifest_path(part))
            return pd.DataFrame(
                [{"part": part, "rows": manifest["rows"], "content_md5": content_hash}]
            )

        summary = with_part.groupby("part").map_groups(
            write_group, batch_format="pandas"
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

    def read(self) -> "ray.data.Dataset":
        """Read back every complete partition."""
        paths = [
            os.path.join(self._part_dir(p), "data.parquet")
            for p in sorted(self.done_partitions())
        ]
        return ray.data.read_parquet(paths)
