"""Graph statistics: assortativity exact rational, degree histogram."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raykg.ops.graphstats import degree_assortativity, degree_histogram


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    )


def _brute_r(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg: dict = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    j = np.array([deg[a] for a, b in es] + [deg[b] for a, b in es], dtype=float)
    k = np.array([deg[b] for a, b in es] + [deg[a] for a, b in es], dtype=float)
    m = len(j)
    num = m * (j * k).sum() - j.sum() * k.sum()
    den = m * (j * j).sum() - j.sum() ** 2
    return num / den


def test_star_graph_is_disassortative(ray_session):
    edges = [(0, i) for i in range(1, 8)]
    row = degree_assortativity(_ds(edges), num_shards=4).to_pandas().iloc[0]
    assert row["m"] == 14
    r = row["num"] / row["den"]
    assert r == pytest.approx(-1.0)


def test_random_graph_matches_brute(ray_session):
    rng = np.random.default_rng(13)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(150, 2))
        if a != b
    ]
    row = degree_assortativity(_ds(edges), num_shards=8).to_pandas().iloc[0]
    assert row["num"] / row["den"] == pytest.approx(_brute_r(edges))


def test_degree_histogram(ray_session):
    # star: hub deg 9 -> bucket 3; 9 leaves deg 1 -> bucket 0
    edges = [(0, i) for i in range(1, 10)]
    got = degree_histogram(_ds(edges), num_shards=4).to_pandas()
    d = dict(zip(got["bucket"], got["n"]))
    assert d == {0: 9, 3: 1}
