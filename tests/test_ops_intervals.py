"""Interval union: vectorized sweep vs brute force, grouped dataset op."""
import numpy as np
import pyarrow as pa
import ray.data

from raykg.ops.intervals import interval_union, union_stats


def brute(starts, ends):
    ivs = sorted(zip(starts.tolist(), ends.tolist()))
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return sum(e - s for s, e in islands), len(islands)


def test_union_stats_matches_brute_force():
    rng = np.random.default_rng(3)
    for _ in range(20):
        s = rng.integers(0, 1000, 200).astype(np.int64)
        e = s + rng.integers(0, 50, 200).astype(np.int64)
        assert union_stats(s, e) == brute(s, e)


def test_touching_intervals_merge_and_zero_length():
    s = np.array([0, 10, 10, 30], dtype=np.int64)
    e = np.array([10, 20, 10, 30], dtype=np.int64)
    covered, n = union_stats(s, e)
    assert (covered, n) == (20, 2)  # [0,20) merged; [30,30) its own island
    assert union_stats(np.array([], np.int64), np.array([], np.int64)) == (0, 0)


def test_interval_union_dataset_per_key():
    tbl = pa.table(
        {
            "k": [1, 1, 1, 2, 2],
            "s": pa.array([0, 5, 20, 0, 100], type=pa.int64()),
            "e": pa.array([10, 15, 25, 1, 101], type=pa.int64()),
        }
    )
    out = (
        interval_union(ray.data.from_arrow(tbl).repartition(3), "k", "s", "e")
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert out.loc[1, "covered"] == 20 and out.loc[1, "n_islands"] == 2
    assert out.loc[2, "covered"] == 2 and out.loc[2, "n_islands"] == 2
