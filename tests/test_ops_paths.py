"""Bounded-hop weighted shortest paths: brute force + engine parity."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.paths import bounded_shortest_paths


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame(
            {"u": [e[0] for e in edges],
             "v": [e[1] for e in edges],
             "w": [float(e[2]) for e in edges]}
        )
    )


def _brute(edges, seeds, max_hops, directed=False):
    """Bellman-Ford limited to max_hops relaxation rounds."""
    adj = []
    for u, v, w in edges:
        adj.append((u, v, w))
        if not directed:
            adj.append((v, u, w))
    dist = {s: 0.0 for s in seeds}
    for _ in range(max_hops):
        nxt = dict(dist)
        for u, v, w in adj:
            if u in dist and dist[u] + w < nxt.get(v, np.inf):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["cost"]))


def test_path_vs_direct_edge(ray_session):
    # direct edge 1-3 weighs 10; path 1-2-3 weighs 3 but needs 2 hops
    edges = [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0)]
    one = _got(bounded_shortest_paths(_ds(edges), [1], src="u", dst="v",
                                      max_hops=1))
    assert one == {1: 0.0, 2: 1.0, 3: 10.0}
    two = _got(bounded_shortest_paths(_ds(edges), [1], src="u", dst="v",
                                      max_hops=2))
    assert two == {1: 0.0, 2: 1.0, 3: 3.0}


def test_directed_respects_direction(ray_session):
    edges = [(1, 2, 5.0), (3, 2, 1.0)]
    got = _got(bounded_shortest_paths(_ds(edges), [1], src="u", dst="v",
                                      max_hops=3, directed=True))
    assert got == {1: 0.0, 2: 5.0}


def test_multi_seed(ray_session):
    edges = [(1, 2, 4.0), (5, 2, 1.0), (2, 3, 1.0)]
    got = _got(bounded_shortest_paths(_ds(edges), [1, 5], src="u", dst="v",
                                      max_hops=2))
    assert got == {1: 0.0, 5: 0.0, 2: 1.0, 3: 2.0}


@pytest.mark.parametrize("engine", ["broadcast", "sharded"])
def test_random_graph_matches_brute_force(ray_session, engine):
    rng = np.random.default_rng(23)
    n = 30
    edges = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, n, size=(120, 2)), rng.integers(1, 20, size=120)
        )
        if a != b
    ]
    for hops in (1, 2, 4):
        want = _brute(edges, [0, 7], hops)
        got = _got(
            bounded_shortest_paths(
                _ds(edges), [0, 7], src="u", dst="v",
                max_hops=hops, engine=engine, num_shards=8,
            )
        )
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k])


def test_engines_pinned_equal(ray_session):
    rng = np.random.default_rng(5)
    edges = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, 25, size=(80, 2)), rng.integers(1, 9, size=80)
        )
        if a != b
    ]
    a = _got(bounded_shortest_paths(_ds(edges), [1], src="u", dst="v",
                                    max_hops=3, engine="broadcast"))
    b = _got(bounded_shortest_paths(_ds(edges), [1], src="u", dst="v",
                                    max_hops=3, engine="sharded", num_shards=4))
    assert a == b
