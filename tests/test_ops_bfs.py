"""k-hop BFS: known paths, brute-force parity, engine parity."""

from collections import deque

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.bfs import khop_min_hops


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )


def _got(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["node"], df["hops"]))


def _brute(edges, seeds, max_hops, directed) -> dict:
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    hops = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if hops[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in hops:
                hops[m] = hops[n] + 1
                q.append(m)
    return hops


def test_path_graph_hop_counts(ray_session):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _got(khop_min_hops(_ds(edges), [1], max_hops=3, directed=True))
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_undirected_and_min_hop_on_diamond(ray_session):
    # 1-2-4 and 1-3-4: node 4 is 2 hops despite two paths; 5 behind 4
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    got = _got(khop_min_hops(_ds(edges), [1], max_hops=2, directed=False))
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_multi_seed_takes_nearest(ray_session):
    edges = [(1, 2), (2, 3), (3, 4), (10, 3)]
    got = _got(khop_min_hops(_ds(edges), [1, 10], max_hops=2, directed=True))
    assert got == {1: 0, 10: 0, 2: 1, 3: 1, 4: 2}


@pytest.mark.parametrize("directed", [True, False])
def test_random_graph_matches_brute_force_both_engines(ray_session, directed):
    rng = np.random.default_rng(23)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(200, 2))
        if a != b
    ]
    seeds = [0, 1]
    want = _brute(edges, seeds, 3, directed)
    bc = _got(
        khop_min_hops(_ds(edges), seeds, max_hops=3, directed=directed,
                      engine="broadcast")
    )
    sh = _got(
        khop_min_hops(_ds(edges), seeds, max_hops=3, directed=directed,
                      engine="sharded", num_shards=4)
    )
    assert bc == want
    assert sh == want


def test_string_nodes(ray_session):
    edges = [("a", "b"), ("b", "c")]
    got = _got(khop_min_hops(_ds(edges), ["a"], max_hops=1, directed=True))
    assert got == {"a": 0, "b": 1}


def _brute_multi(edges, seeds, max_hops, directed) -> dict:
    out = {}
    for s in seeds:
        for node, h in _brute(edges, [s], max_hops, directed).items():
            out[(s, node)] = h
    return out


@pytest.mark.parametrize("directed", [True, False])
def test_multi_source_engines_match_brute(ray_session, directed):
    from raykg.ops.bfs import multi_source_hops

    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 50, size=(160, 2))
        if a != b
    ]
    seeds = [0, 1, 2]
    want = _brute_multi(edges, seeds, 3, directed)

    def got(engine):
        df = multi_source_hops(
            _ds(edges), seeds, max_hops=3, directed=directed,
            engine=engine, num_shards=4,
        ).to_pandas()
        return {(s, n): h for s, n, h in zip(df["seed"], df["node"], df["hops"])}

    bc = got("broadcast")
    sh = got("sharded")
    assert bc == want
    assert sh == want
