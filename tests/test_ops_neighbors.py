"""Common-neighbor / adjacency-Jaccard scores: known graphs, brute force."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.neighbors import common_neighbor_scores


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    )


def _brute(edges, min_common=1, exclude_edges=False):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        common = len(adj[u] & adj[v])
        if common < min_common:
            continue
        is_edge = 1 if (u, v) in es else 0
        if exclude_edges and is_edge:
            continue
        jac = common / (len(adj[u]) + len(adj[v]) - common)
        out[(u, v)] = (common, jac, is_edge)
    return out


def _got(ds) -> dict:
    df = ds.to_pandas()
    return {
        (r.u, r.v): (r.common, r.jaccard, r.is_edge)
        for r in df.itertuples()
    }


def test_square_diagonals(ray_session):
    # cycle 1-2-3-4: diagonals (1,3) and (2,4) share 2 neighbors, not edges
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    got = _got(common_neighbor_scores(_ds(edges), num_shards=4, min_common=2))
    assert got == {(1, 3): (2, 1.0, 0), (2, 4): (2, 1.0, 0)}


def test_triangle_pairs_are_edges(ray_session):
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _got(common_neighbor_scores(_ds(edges), num_shards=4))
    # every pair shares exactly the third node; jaccard = 1/(2+2-1)
    assert got == {
        (1, 2): (1, pytest.approx(1 / 3), 1),
        (1, 3): (1, pytest.approx(1 / 3), 1),
        (2, 3): (1, pytest.approx(1 / 3), 1),
    }
    excl = _got(
        common_neighbor_scores(_ds(edges), num_shards=4, exclude_edges=True)
    )
    assert excl == {}


def test_random_graph_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    n = 35
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(160, 2))
        if a != b
    ]
    for min_common, exclude in [(1, False), (2, False), (1, True)]:
        want = _brute(edges, min_common, exclude)
        got = _got(
            common_neighbor_scores(
                _ds(edges),
                num_shards=8,
                min_common=min_common,
                exclude_edges=exclude,
            )
        )
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1])
            assert got[k][2] == want[k][2]


def test_max_center_degree_skips_hub(ray_session):
    # star hub 0 with leaves 1..10 plus path edges (1,2),(2,3); capping
    # below 10 drops all hub-centered leaf-leaf wedges; the surviving
    # centers are 1 and 3 (nbrs {0,2} -> pair (0,2)) and 2 (nbrs
    # {0,1,3} -> pairs (0,1),(0,3),(1,3))
    edges = [(0, i) for i in range(1, 11)] + [(1, 2), (2, 3)]
    got = _got(
        common_neighbor_scores(
            _ds(edges), num_shards=4, max_center_degree=5
        )
    )
    assert set(got) == {(0, 1), (0, 2), (0, 3), (1, 3)}
    assert got[(0, 2)][0] == 2
    full = _got(common_neighbor_scores(_ds(edges), num_shards=4))
    assert (2, 4) in full and len(full) > len(got)


def test_adamic_adar_matches_brute_force():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from raykg.ops.neighbors import common_neighbor_scores

    # small fixed graph: star + chain so degrees differ
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("d", "e"), ("e", "f"), ("c", "f")]
    t = pa.table({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    out = (
        common_neighbor_scores(
            ray.data.from_arrow(t).repartition(3), num_shards=4,
            exclude_edges=True, with_aa=True,
        )
        .to_pandas()
        .set_index(["u", "v"])
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    expect = {}
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y in adj[x]:
                continue
            shared = adj[x] & adj[y]
            if shared:
                aa = sum(1.0 / np.log(len(adj[w])) for w in shared)
                expect[(x, y)] = (len(shared), aa)
    assert set(out.index) == set(expect)
    for k, (c, aa) in expect.items():
        assert out.loc[k, "common"] == c
        assert abs(out.loc[k, "aa"] - aa) < 1e-9
