"""attach_by_key: broadcast and bucketed plans produce identical rows."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.join import attach_by_key


def _run(gate):
    rng = np.random.default_rng(23)
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400),
            "payload": rng.integers(0, 1000, 400),
        }
    )
    small = pd.DataFrame(
        {
            "k": np.arange(0, 40),  # keys 40..49 miss
            "name": [f"n{i}" for i in range(40)],
            "w": np.arange(0, 40, dtype=np.int64) * 7,
        }
    )
    import pyarrow as pa

    # Arrow-typed inputs: the bucketed scaffolding pads with typed nulls
    # from the dataset schema, which from_pandas (numpy dtypes) can't give
    out = attach_by_key(
        ray.data.from_arrow(pa.Table.from_pandas(big)).repartition(5),
        ray.data.from_arrow(pa.Table.from_pandas(small)).repartition(3),
        on="k",
        val_cols=["name", "w"],
        gate=gate,
    ).to_pandas()
    return out.sort_values(["k", "payload"]).reset_index(drop=True)[
        ["k", "payload", "name", "w"]
    ]


def test_broadcast_and_bucketed_plans_agree(ray_session):
    broadcast = _run(gate=1_000_000)
    bucketed = _run(gate=0)
    pd.testing.assert_frame_equal(
        broadcast, bucketed.astype(broadcast.dtypes.to_dict())
    )
    # inner semantics: misses dropped, hits carry the right values
    assert (broadcast["k"] < 40).all()
    assert (broadcast["w"] == broadcast["k"] * 7).all()


def test_empty_small_side_drops_everything(ray_session):
    big = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "x": [3, 4]}))
    small = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                      "v": pd.Series([], dtype=np.int64)})
    )
    out = attach_by_key(big, small, on="k", val_cols=["v"])
    assert out.count() == 0


def test_duplicate_small_keys_raise_on_both_plans(ray_session):
    import pyarrow as pa
    import pytest

    big = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3], "x": [10, 20, 30]})
    )
    small = ray.data.from_arrow(
        pa.table({"k": [1, 1, 2], "v": [7, 8, 9]})
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        attach_by_key(big, small, on="k", val_cols=["v"], gate=1_000).count()
    with pytest.raises(ValueError, match="duplicate keys"):
        attach_by_key(big, small, on="k", val_cols=["v"], gate=0).count()
