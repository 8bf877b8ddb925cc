"""Changeset application: upsert/delete/insert semantics, version order."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.merge import apply_changeset


SNAP = pd.DataFrame(
    {"id": [1, 2, 3, 4], "val": ["a", "b", "c", "d"]}
)


def _apply(changes: pd.DataFrame, num_shards=4) -> dict:
    out = apply_changeset(
        ray.data.from_pandas(SNAP),
        ray.data.from_pandas(changes),
        key="id",
        num_shards=num_shards,
    ).to_pandas()
    return dict(zip(out["id"], out["val"]))


def test_upsert_delete_insert(ray_session):
    changes = pd.DataFrame(
        {
            "id": [2, 3, 9],
            "val": ["B", None, "i"],
            "op": ["upsert", "delete", "upsert"],
            "version": [1, 1, 1],
        }
    )
    assert _apply(changes) == {1: "a", 2: "B", 4: "d", 9: "i"}


def test_latest_version_wins(ray_session):
    changes = pd.DataFrame(
        {
            "id": [2, 2, 2, 4, 4],
            "val": ["x", "y", "z", None, "re"],
            "op": ["upsert", "upsert", "upsert", "delete", "upsert"],
            "version": [3, 1, 2, 5, 6],
        }
    )
    # id 2: version 3 wins -> x; id 4: delete v5 then upsert v6 -> re
    assert _apply(changes) == {1: "a", 2: "x", 3: "c", 4: "re"}


def test_delete_after_upsert_removes(ray_session):
    changes = pd.DataFrame(
        {
            "id": [1, 1],
            "val": ["new", None],
            "op": ["upsert", "delete"],
            "version": [1, 2],
        }
    )
    assert _apply(changes) == {2: "b", 3: "c", 4: "d"}


def test_empty_changes_identity(ray_session):
    changes = pd.DataFrame(
        {"id": pd.Series([], dtype=np.int64),
         "val": pd.Series([], dtype=object),
         "op": pd.Series([], dtype=object),
         "version": pd.Series([], dtype=np.int64)}
    )
    assert _apply(changes) == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    snap = pd.DataFrame({"id": range(200), "val": [f"v{i}" for i in range(200)]})
    ids = rng.integers(0, 250, 300)
    changes = pd.DataFrame(
        {
            "id": ids,
            "val": [f"c{i}" for i in range(300)],
            "op": rng.choice(["upsert", "delete"], 300, p=[0.8, 0.2]),
            # versions globally unique so tie-order never matters
            "version": np.arange(1, 301),
        }
    )
    outs = []
    for parts, shards in [(1, 2), (7, 8)]:
        out = apply_changeset(
            ray.data.from_pandas(snap).repartition(parts),
            ray.data.from_pandas(changes).repartition(parts),
            key="id",
            num_shards=shards,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.parametrize("seed", [2, 19, 71])
def test_matches_duckdb_merge_semantics(ray_session, seed):
    import duckdb

    rng = np.random.default_rng(seed)
    snap = pd.DataFrame(
        {"id": np.arange(80), "val": [f"s{i}" for i in range(80)]}
    )
    n = 150
    changes = pd.DataFrame(
        {
            "id": rng.integers(0, 110, n),
            "val": [f"c{i}" for i in range(n)],
            "op": rng.choice(["upsert", "delete"], n, p=[0.7, 0.3]),
            "version": rng.permutation(n),  # unique: no tie ambiguity
        }
    )
    got = (
        apply_changeset(
            ray.data.from_pandas(snap).repartition(5),
            ray.data.from_pandas(changes).repartition(3),
            key="id",
            num_shards=8,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("snap", snap)
    con.register("changes", changes)
    want = con.sql("""
        WITH last AS (
            SELECT id, val, op FROM changes
            QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY version DESC) = 1)
        SELECT s.id, s.val FROM snap s
        LEFT JOIN last l ON l.id = s.id WHERE l.id IS NULL
        UNION ALL
        SELECT id, val FROM last WHERE op = 'upsert'
        ORDER BY id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"id": "int64"}), want.astype({"id": "int64"})
    )


class TestTableDiff:
    def test_diff_categories(self, ray_session):
        from raykg.ops.merge import table_diff

        a = pd.DataFrame({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
        b = pd.DataFrame({"id": [2, 3, 4, 9], "v": ["b", "CHANGED", "d", "i"]})
        out = table_diff(
            ray.data.from_pandas(a), ray.data.from_pandas(b), key="id",
            num_shards=4,
        ).to_pandas()
        got = dict(zip(out["id"], out["status"]))
        assert got == {1: "only_left", 3: "changed", 9: "only_right"}

    def test_identical_tables_empty_diff(self, ray_session):
        from raykg.ops.merge import table_diff

        a = pd.DataFrame({"id": range(50), "v": [f"x{i}" for i in range(50)],
                          "w": [None if i % 7 == 0 else i for i in range(50)]})
        out = table_diff(
            ray.data.from_pandas(a),
            ray.data.from_pandas(a.sample(frac=1, random_state=3)),
            key="id", num_shards=4,
        ).to_pandas()
        assert len(out) == 0


class TestFusedChangesetDiff:
    def _mk(self, seed):
        rng = np.random.default_rng(seed)
        snap = pd.DataFrame(
            {"id": np.arange(120),
             "val": [f"s{i}" for i in range(120)],
             "w": [None if i % 9 == 0 else i for i in range(120)]}
        )
        n = 200
        changes = pd.DataFrame(
            {
                "id": rng.integers(0, 160, n),
                "val": [f"c{i}" for i in range(n)],
                "w": rng.integers(0, 50, n),
                "op": rng.choice(["upsert", "delete"], n, p=[0.7, 0.3]),
                "version": rng.permutation(n),
            }
        )
        return snap, changes

    @pytest.mark.parametrize("seed", [3, 41])
    def test_fused_equals_composition(self, ray_session, seed):
        from raykg.ops.merge import (
            apply_changeset, apply_changeset_diff, table_diff,
        )

        snap, changes = self._mk(seed)
        s = ray.data.from_pandas(snap).repartition(4)
        c = ray.data.from_pandas(changes).repartition(3)
        merged = apply_changeset(s, c, key="id", num_shards=8)
        want = (
            table_diff(s, merged, key="id", num_shards=8)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        got = (
            apply_changeset_diff(s, c, key="id", num_shards=8)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"id": "int64"}), want.astype({"id": "int64"})
        )

    def test_diff_statuses(self, ray_session):
        from raykg.ops.merge import apply_changeset_diff

        snap = pd.DataFrame({"id": [1, 2, 3, 4], "val": ["a", "b", "c", "d"]})
        changes = pd.DataFrame(
            {
                "id": [1, 2, 2, 9],
                "val": [None, "B", "b2", "i"],
                "op": ["delete", "upsert", "upsert", "upsert"],
                "version": [1, 2, 1, 1],
            }
        )
        out = apply_changeset_diff(
            ray.data.from_pandas(snap), ray.data.from_pandas(changes),
            key="id", num_shards=4,
        ).to_pandas()
        got = dict(zip(out["id"], out["status"]))
        assert got == {1: "only_left", 2: "changed", 9: "only_right"}


def test_version_ties_deterministic(ray_session):
    """Equal versions resolve by (op, body), never by input order: upsert
    outranks delete, then the lexicographically greatest body wins —
    stable across repartitionings/shufflings of the change feed."""
    snap = pd.DataFrame({"id": [1, 2], "val": ["a", "b"]})
    changes = pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "val": ["zz", "aa", None, "kk"],
            "op": ["upsert", "upsert", "delete", "upsert"],
            "version": [5, 5, 7, 7],
        }
    )
    outs = []
    for parts in (1, 4):
        out = apply_changeset(
            ray.data.from_pandas(snap),
            ray.data.from_pandas(changes.sample(frac=1, random_state=parts)).repartition(parts),
            key="id",
            num_shards=4,
        ).to_pandas()
        outs.append(dict(zip(out["id"], out["val"])))
    # id 1: greatest body 'zz'; id 2: upsert beats delete at equal version
    assert outs[0] == outs[1] == {1: "zz", 2: "kk"}
