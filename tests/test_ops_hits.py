"""HITS path counts: brute-force matrix parity, known graphs."""

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.hits import hits_path_counts


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]})
    )


def _brute(edges, iters):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in edges:
        A[idx[u], idx[v]] += 1
    h = np.ones(len(nodes), dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        a = A.T @ h
        h = A @ a
    return nodes, h, a


def test_star_hub(ray_session):
    # directed star: 0 -> 1..5.  a1 = indeg, h1(0) = 5, then grows.
    edges = [(0, i) for i in range(1, 6)]
    out = hits_path_counts(_ds(edges), iters=1, num_shards=4).to_pandas()
    got = {r.node: (r.hub, r.auth) for r in out.itertuples()}
    assert got[0] == (5, 0)
    for i in range(1, 6):
        assert got[i] == (0, 1)


def test_random_matches_matrix_power(ray_session):
    rng = np.random.default_rng(47)
    edges = [
        (int(u), int(v))
        for u, v in rng.integers(0, 25, size=(80, 2))
        if u != v
    ]
    for iters in (1, 2, 3):
        nodes, h, a = _brute(edges, iters)
        out = (
            hits_path_counts(_ds(edges), iters=iters, num_shards=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert out["node"].tolist() == nodes
        assert out["hub"].tolist() == h.tolist()
        assert out["auth"].tolist() == a.tolist()


def test_parallel_edges_count_with_multiplicity(ray_session):
    edges = [(1, 2), (1, 2), (3, 2)]
    out = hits_path_counts(_ds(edges), iters=1, num_shards=2).to_pandas()
    got = {r.node: (r.hub, r.auth) for r in out.itertuples()}
    assert got[2] == (0, 3)
    assert got[1] == (6, 0)  # two parallel edges x a(2)=3
    assert got[3] == (3, 0)


def test_katz_matches_dense_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from raykg.ops.hits import katz_path_scores

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
             ("a", "b")]  # parallel edge counts with multiplicity
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in edges:
        A[idx[u], idx[v]] += 1
    ones = np.ones(len(nodes), dtype=np.int64)
    n1 = A.T @ ones
    n2 = A.T @ n1
    n3 = A.T @ n2
    want = n1 * 16 + n2 * 4 + n3
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = katz_path_scores(ds, iters=3, base=4, num_shards=4).to_pandas()
    got = dict(zip(out["node"], out["katz"]))
    assert got == {n: int(want[idx[n]]) for n in nodes}
