"""tpch_q5's two physical plans (broadcast map vs partitioned hash joins)
must produce identical cells — the fallback is real code, exercised here by
forcing the gate to zero."""

import pytest

import raykg.pipeline.queries.relational.tpch as rel

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_q5_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q5(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_Q5_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q5(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert len(broadcast) >= 1
    assert list(broadcast.columns) == ["n_name", "revenue_c2"]


@pytest.mark.usefixtures("ray_session")
def test_q14_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q14(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_PART_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q14(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert int(broadcast["n_rows"][0]) > 0
    assert 0 < int(broadcast["promo_rev_c2"][0]) < int(broadcast["total_rev_c2"][0])


@pytest.mark.usefixtures("ray_session")
def test_q19_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q19(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_PART_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q19(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert int(broadcast["n_rows"][0]) > 0


@pytest.mark.usefixtures("ray_session")
def test_q10_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q10(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_Q10_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q10(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert 1 <= len(broadcast) <= rel.TPCH_Q10_K
    # ordered by revenue desc with custkey tiebreak
    rev = broadcast["revenue_c2"].tolist()
    assert rev == sorted(rev, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_q4_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q4(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_Q4_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q4(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert int(broadcast["n_late"].sum()) > 0


@pytest.mark.usefixtures("ray_session")
def test_q17_bucketed_fallback_equals_broadcast(monkeypatch):
    broadcast = rel.q_tpch_q17(SF).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(rel, "TPCH_PART_BROADCAST_MAX", 0)
    bucketed = rel.q_tpch_q17(SF).to_pandas().reset_index(drop=True)
    assert broadcast.equals(bucketed)
    assert int(broadcast["n_qual"][0]) >= 0
