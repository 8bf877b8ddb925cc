"""ROLLUP aggregation: DuckDB parity, partition invariance."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from raykg.ops.rollup import rollup_sum


def _norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    df = df.copy()
    for k in keys:
        df[k] = df[k].astype(object).where(pd.notna(df[k]), None)
    df["sum"] = df["sum"].astype(np.int64)
    df["n"] = df["n"].astype(np.int64)
    return (
        df[keys + ["sum", "n"]]
        .sort_values(keys + ["sum"], na_position="first")
        .reset_index(drop=True)
    )


def _oracle(df: pd.DataFrame, keys) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    ks = ", ".join(keys)
    return con.sql(
        f"SELECT {ks}, CAST(SUM(v) AS BIGINT) AS sum,"
        f" CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY ROLLUP ({ks})"
    ).df()


def _input(seed=3, n=200):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(-5, 50, n).astype(np.int64),
        }
    )


def test_two_key_rollup_matches_duckdb(ray_session):
    df = _input()
    got = rollup_sum(
        ray.data.from_pandas(df), ["a", "b"], "v", num_shards=4
    ).to_pandas()
    want = _oracle(df, ["a", "b"])
    pd.testing.assert_frame_equal(
        _norm(got, ["a", "b"]), _norm(want, ["a", "b"])
    )
    # 3 levels present: leaf, per-a, grand
    assert got["b"].isna().sum() == 3 + 1  # 3 per-a rows + grand
    assert (got["a"].isna() & got["b"].isna()).sum() == 1


def test_single_key_rollup_matches_duckdb(ray_session):
    df = _input(seed=9)
    got = rollup_sum(
        ray.data.from_pandas(df), ["a"], "v", num_shards=4
    ).to_pandas()
    want = _oracle(df, ["a"])
    pd.testing.assert_frame_equal(_norm(got, ["a"]), _norm(want, ["a"]))


def test_partition_invariance(ray_session):
    df = _input(seed=17, n=500)
    one = rollup_sum(
        ray.data.from_pandas(df), ["a", "b"], "v", num_shards=2
    ).to_pandas()
    many = rollup_sum(
        ray.data.from_pandas(df).repartition(13), ["a", "b"], "v",
        num_shards=8,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(one, ["a", "b"]), _norm(many, ["a", "b"])
    )
