"""Per-group z-score: pandas parity, constant groups, partition invariance."""
import numpy as np
import pandas as pd
import ray.data

from raykg.ops.feature import zscore_by_group

DF = pd.DataFrame(
    {
        "g": ["a"] * 5 + ["b"] * 3 + ["c"] * 2,
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0, 7.0, 7.0],
    }
)


def expected(df):
    out = []
    for _, grp in df.groupby("g", sort=False):
        v = grp["v"].to_numpy()
        sd = v.std()  # population
        out.extend(((v - v.mean()) / sd) if sd > 0 else np.zeros(len(v)))
    return np.array(out)


def run(nparts):
    ds = ray.data.from_pandas(DF).repartition(nparts)
    out = zscore_by_group(ds, "g", "v").to_pandas()
    # restore input order via (g, v) since repartition preserves rows
    out = out.sort_values(["g", "v"], kind="stable").reset_index(drop=True)
    want = DF.assign(z=expected(DF)).sort_values(["g", "v"], kind="stable")
    return out, want.reset_index(drop=True)


def test_matches_pandas(ray_session):
    out, want = run(1)
    np.testing.assert_allclose(out["zscore"], want["z"], atol=1e-12)


def test_constant_group_zero(ray_session):
    out, _ = run(1)
    assert (out.loc[out["g"] == "c", "zscore"] == 0.0).all()


def test_partition_invariance(ray_session):
    a, _ = run(1)
    b, _ = run(4)
    # partials sum in different orders across partitionings; z-scores agree
    np.testing.assert_allclose(a["zscore"], b["zscore"], atol=1e-9)
