"""Triangle counting: known graphs, brute-force parity, engine parity."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.triangles import canonical_edges, group_pairs, triangle_counts


def _counts(ds) -> dict:
    df = ds.to_pandas()
    if not len(df):
        return {}
    return dict(zip(df["node"], df["n_tri"]))


def _brute(edges) -> dict:
    """Per-node triangle counts by enumerating all node triples."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    out: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    )


def test_k4_every_node_in_three_triangles(ray_session):
    edges = list(itertools.combinations([1, 2, 3, 4], 2))
    got = _counts(triangle_counts(_ds(edges), num_shards=4))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_with_pendant_and_noise(ray_session):
    # triangle 1-2-3, pendant 3-4; duplicate/reversed/self edges ignored
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (3, 3), (1, 2)]
    got = _counts(triangle_counts(_ds(edges), num_shards=4))
    assert got == {1: 1, 2: 1, 3: 1}  # node 4 is in no triangle


def test_star_graph_has_no_triangles(ray_session):
    edges = [(0, i) for i in range(1, 30)]
    assert _counts(triangle_counts(_ds(edges), num_shards=4)) == {}


def test_random_graph_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    n = 40
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(400, 2))
    ]
    got = _counts(triangle_counts(_ds(edges), num_shards=8))
    assert got == _brute(edges)


def test_engines_agree_and_string_nodes(ray_session):
    rng = np.random.default_rng(11)
    edges = [
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in rng.integers(0, 25, size=(150, 2))
    ]
    bc = _counts(triangle_counts(_ds(edges), num_shards=4, broadcast_degrees=True))
    sh = _counts(triangle_counts(_ds(edges), num_shards=4, broadcast_degrees=False))
    assert bc == sh == _brute(edges)


def test_canonical_edges_dedup_and_order(ray_session):
    df = canonical_edges(_ds([(2, 1), (1, 2), (3, 3), (1, 3)]), num_shards=4).to_pandas()
    got = sorted(map(tuple, df[["u", "v"]].to_numpy()))
    assert got == [(1, 2), (1, 3)]


def test_group_pairs_distinct_within_group(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"g": [1, 1, 1, 1, 2, 2, 3], "x": [10, 20, 30, 10, 5, 6, 9]}
        )
    )
    df = group_pairs(ds, "g", "x", num_shards=4).to_pandas()
    got = sorted(map(tuple, df[["u", "v"]].to_numpy()))
    assert got == [(5, 6), (10, 20), (10, 30), (20, 30)]


def test_closure_engines_pinned_equal(ray_session):
    rng = np.random.default_rng(21)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(300, 2))
        if a != b
    ]
    bcast = _counts(
        triangle_counts(_ds(edges), num_shards=8, broadcast_edges=True)
    )
    shard = _counts(
        triangle_counts(_ds(edges), num_shards=8, broadcast_edges=False)
    )
    assert bcast == shard == _brute(edges)


def test_broadcast_edges_rejects_string_ids(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"u": ["a", "b"], "v": ["b", "c"]})
    )
    with pytest.raises(ValueError, match="broadcast_edges"):
        triangle_counts(ds, num_shards=2, broadcast_edges=True).materialize()
    # auto mode silently falls back to the sharded closure
    got = _counts(triangle_counts(ds, num_shards=2))
    assert got == {}


def test_clustering_coef_engines_pinned_equal(ray_session):
    from raykg.ops.triangles import clustering_coefficients

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, size=(120, 2))
        if a != b
    ]
    a = (
        clustering_coefficients(_ds(edges), num_shards=4, broadcast=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        clustering_coefficients(_ds(edges), num_shards=4, broadcast=False)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # bit-equal, not almost-equal: both engines run the same float kernel
    pd.testing.assert_frame_equal(a, b)
    # spot semantics: coef = 2*tri/(deg*(deg-1)) and 0 for triangle-free
    tri = _brute(edges)
    for _, row in a.iterrows():
        want = 2.0 * tri.get(row["node"], 0) / max(row["deg"] * (row["deg"] - 1), 1)
        assert abs(row["coef"] - round(want, 8)) < 1e-12
        assert row["n_tri"] == tri.get(row["node"], 0)


def local_ktruss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {e for e in es if len(adj[e[0]] & adj[e[1]]) < k - 2}
        if not drop:
            return es
        es -= drop


def test_ktruss_matches_local_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from raykg.ops.triangles import ktruss

    rng = np.random.default_rng(31)
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, 24, size=(160, 2))
        if a != b
    }
    df = pd.DataFrame(sorted(edges), columns=["u", "v"])
    for k in (3, 4, 5):
        want = local_ktruss(edges, k)
        got = ktruss(
            ray.data.from_pandas(df).repartition(4), k, num_shards=4
        ).to_pandas()
        assert {tuple(r) for r in got[["u", "v"]].to_numpy()} == want, k


def test_ktruss_k2_is_whole_graph_and_cap_raises(ray_session):
    import pandas as pd
    import pytest as _pytest
    import ray.data
    from raykg.ops.triangles import ktruss

    # a long peeling chain: nested triangles that unravel one per round
    edges = [(i, i + 1) for i in range(6)] + [(i, i + 2) for i in range(5)]
    df = pd.DataFrame(edges, columns=["u", "v"])
    ds = ray.data.from_pandas(df)
    assert ktruss(ds, 2, num_shards=4).count() == len(set(edges))
    with _pytest.raises(RuntimeError):
        ktruss(ds, 4, max_rounds=1, num_shards=4)
