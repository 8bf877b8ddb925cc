"""Global dense rank: pandas parity, ties, both directions."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.topk import dense_rank_global


def test_matches_pandas_dense_rank(ray_session):
    rng = np.random.default_rng(19)
    df = pd.DataFrame({"k": range(300), "v": rng.integers(0, 40, 300)})
    for ascending in (True, False):
        got = (
            dense_rank_global(
                ray.data.from_pandas(df).repartition(7), "v",
                ascending=ascending,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = df["v"].rank(method="dense", ascending=ascending).astype(int)
        assert got["rank"].tolist() == want.tolist()


def test_ties_share_rank_no_gaps(ray_session):
    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 10.0, 5.0, 20.0]})
    got = dense_rank_global(ray.data.from_pandas(df), "v").to_pandas()
    r = dict(zip(got["k"], got["rank"]))
    assert r == {4: 1, 1: 2, 2: 2, 3: 3}


def test_group_argmin_partition_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from raykg.ops.topk import group_argmin

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {"k": rng.integers(0, 40, 800),
         "o": rng.permutation(800),
         "payload": rng.integers(0, 1000, 800)}
    )
    want = df.sort_values(["k", "o"]).drop_duplicates("k").reset_index(drop=True)
    for parts in (1, 6):
        got = (
            group_argmin(ray.data.from_pandas(df).repartition(parts),
                         ["k"], ["o"], num_shards=4)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "o", "payload"]],
            want[["k", "o", "payload"]],
            check_dtype=False,
        )
