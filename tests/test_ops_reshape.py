"""Pivot (long -> wide, pinned schema) and melt (wide -> long)."""

import pytest

import ray
import ray.data

from raykg.ops.reshape import melt, pivot


@pytest.mark.usefixtures("ray_session")
class TestPivot:
    def _events(self):
        rows = (
            [{"u": 1, "t": "click", "v": 2.0}] * 3
            + [{"u": 1, "t": "view", "v": 1.0}]
            + [{"u": 2, "t": "view", "v": 5.0}] * 2
        )
        return ray.data.from_items(rows)

    def test_count_pivot_fills_zero(self):
        out = (
            pivot(self._events(), "u", "t", categories=["click", "view", "buy"])
            .to_pandas()
            .set_index("u")
            .sort_index()
        )
        assert out.loc[1].tolist() == [3, 1, 0]
        assert out.loc[2].tolist() == [0, 2, 0]

    def test_sum_pivot(self):
        out = (
            pivot(self._events(), "u", "t", categories=["click", "view"],
                  values_from="v", agg="sum")
            .to_pandas()
            .set_index("u")
            .sort_index()
        )
        assert out.loc[1].tolist() == [6.0, 1.0]
        assert out.loc[2].tolist() == [0.0, 10.0]

    def test_unknown_category_dropped(self):
        out = pivot(self._events(), "u", "t", categories=["click"]).to_pandas()
        assert set(out.columns) == {"u", "click"}

    def test_non_decomposable_agg_rejected(self):
        with pytest.raises(ValueError, match="sum/count/min/max"):
            pivot(self._events(), "u", "t", categories=["click"], agg="mean")


@pytest.mark.usefixtures("ray_session")
def test_melt_roundtrip_values():
    ds = ray.data.from_items([{"id": 1, "a": 10, "b": 20}, {"id": 2, "a": 30, "b": 40}])
    out = melt(ds, ["id"], ["a", "b"]).to_pandas().sort_values(["id", "variable"])
    assert out["value"].tolist() == [10, 20, 30, 40]
    assert out["variable"].tolist() == ["a", "b", "a", "b"]
    assert len(out) == 4
