"""Welch t-test and Mann–Kendall trend: closed-form / pure-Python parity,
partition invariance, degenerate inputs."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.trend import daily_count_trend, mann_kendall
from raykg.ops.ttest import welch_ttest


def _welch_reference(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    n1, n2 = len(a), len(b)
    m1, m2 = a.mean(), b.mean()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / np.sqrt(se2)
    dof = se2 * se2 / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    return t, dof


def test_welch_matches_closed_form(ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(50, 150, 400)
    b = rng.integers(80, 260, 300)
    df = pd.DataFrame(
        {
            "g": ["a"] * len(a) + ["b"] * len(b) + ["noise"] * 50,
            "v": np.concatenate([a, b, rng.integers(0, 9, 50)]),
        }
    )
    got = welch_ttest(
        ray.data.from_pandas(df).repartition(9), "g", "v", "a", "b"
    ).to_pandas()
    t, dof = _welch_reference(a, b)
    assert got["n_a"][0] == 400 and got["n_b"][0] == 300
    assert abs(got["t_stat"][0] - t) < 1e-5
    assert abs(got["dof"][0] - dof) < 1e-4
    assert abs(got["mean_diff_x100"][0] - 100 * (a.mean() - b.mean())) < 1e-3


def test_welch_partition_invariant(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 500),
            "v": rng.integers(-50, 50, 500),
        }
    )
    outs = [
        welch_ttest(ray.data.from_pandas(df).repartition(p), "g", "v", "a", "b")
        .to_pandas()
        .iloc[0]
        for p in (1, 13)
    ]
    assert outs[0].equals(outs[1])


def _mk_reference(x):
    s = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(x[j] - x[i]))
    return s


def test_mann_kendall_s_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 12, 60)
    s, z = mann_kendall(x)
    assert s == _mk_reference(x)
    # monotone series: maximal S and strongly positive z
    s_up, z_up = mann_kendall(np.arange(40))
    assert s_up == 40 * 39 // 2 and z_up > 5


def test_mann_kendall_all_ties():
    # degenerate (var <= 0) series: z = 0.0, matching the SQL oracles'
    # CASE WHEN var <= 0 THEN 0.0 — never NaN.
    s, z = mann_kendall(np.full(10, 7))
    assert s == 0 and z == 0.0
    s1, z1 = mann_kendall(np.array([5]))
    assert s1 == 0 and z1 == 0.0


def test_daily_count_trend(ray_session):
    # three days with rising counts 1/2/3 -> S over (1,2,3) = 3
    ts = np.array(
        ["2024-01-01T05:00", "2024-01-02T01:00", "2024-01-02T02:00",
         "2024-01-03T01:00", "2024-01-03T02:00", "2024-01-03T03:00"],
        dtype="datetime64[us]",
    )
    ds = ray.data.from_pandas(pd.DataFrame({"ts": ts}))
    got = daily_count_trend(ds, "ts").to_pandas().iloc[0]
    assert got["n_buckets"] == 3 and got["n_rows"] == 6 and got["s_stat"] == 3


def test_mad_outliers_matches_reference(ray_session):
    from raykg.ops.robust import group_median_mad, mad_outliers

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "event_id": np.arange(600),
            "g": rng.choice(["a", "b"], 600),
            "v": rng.integers(0, 200, 600),
        }
    )
    # plant extreme outliers
    df.loc[5, "v"] = 10_000
    df.loc[17, "v"] = -9_000
    ds = ray.data.from_pandas(df).repartition(7)
    stats = group_median_mad(ds, "g", "v")
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        med = int(v[(len(v) - 1) // 2])
        dev = np.sort(np.abs(sub["v"].to_numpy() - med))
        mad = int(dev[(len(dev) - 1) // 2])
        assert stats[g] == (med, mad)
    got = (
        mad_outliers(ds, "g", "v", ["event_id", "g"])
        .to_pandas()
        .sort_values("event_id")
    )
    want = []
    for _, row in df.iterrows():
        med, mad = stats[row["g"]]
        if 6745 * abs(row["v"] - med) > 35000 * mad:
            want.append(row["event_id"])
    assert got["event_id"].tolist() == want
    assert {5, 17} <= set(want)


def test_mad_zero_flags_any_deviation(ray_session):
    from raykg.ops.robust import mad_outliers

    df = pd.DataFrame(
        {"event_id": range(9), "g": ["a"] * 9, "v": [5] * 8 + [6]}
    )
    got = mad_outliers(
        ray.data.from_pandas(df), "g", "v", ["event_id"]
    ).to_pandas()
    assert got["event_id"].tolist() == [8]


def test_grouped_daily_trend_matches_per_group_kernel(ray_session):
    from raykg.ops.trend import grouped_daily_trend, mann_kendall

    rng = np.random.default_rng(29)
    base = np.datetime64("2024-01-01T00:00", "us")
    rows = []
    for g, drift in (("up", 3), ("flat", 0)):
        for d in range(12):
            for _ in range(5 + drift * d + int(rng.integers(0, 3))):
                rows.append((g, base + np.timedelta64(d, "D")))
    df = pd.DataFrame(rows, columns=["g", "ts"])
    got = (
        grouped_daily_trend(
            ray.data.from_pandas(df).repartition(7), "g", "ts"
        )
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        counts = sub.groupby(sub["ts"].to_numpy().astype("datetime64[D]")).size()
        s, z = mann_kendall(counts.to_numpy(np.int64))
        assert got.loc[g, "s_stat"] == s
        assert abs(got.loc[g, "z_stat"] - round(z, 6)) < 1e-9
    assert got.loc["up", "s_stat"] > 40


def test_grouped_daily_trend_int_group_keys(ray_session):
    # non-string group keys must carry their type through (no forced cast)
    from raykg.ops.trend import grouped_daily_trend

    base = np.datetime64("2024-03-01T00:00", "us")
    rows = []
    for g in (7, 9):
        for d in range(4):
            for _ in range(1 + d * g % 5):
                rows.append((g, base + np.timedelta64(d, "D")))
    df = pd.DataFrame(rows, columns=["gid", "ts"])
    got = grouped_daily_trend(
        ray.data.from_pandas(df).repartition(3), "gid", "ts"
    ).to_pandas()
    assert sorted(got["gid"].tolist()) == [7, 9]
    assert pd.api.types.is_integer_dtype(got["gid"])
