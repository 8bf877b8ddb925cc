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


class TestKCore:
    def _brute(self, edges, k, rounds):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        for _ in range(rounds):
            deg: dict = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nes = {e for e in es if e[0] in keep and e[1] in keep}
            if nes == es:
                break
            es = nes
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return deg

    def test_triangle_with_pendant(self, ray_session):
        from raykg.ops.graphstats import kcore_bounded

        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        out = kcore_bounded(_ds(edges), k=2, rounds=3, num_shards=4).to_pandas()
        got = dict(zip(out["node"], out["deg"]))
        assert got == {1: 2, 2: 2, 3: 2}  # pendant 4 peeled, 3's deg drops

    def test_chain_peels_iteratively(self, ray_session):
        from raykg.ops.graphstats import kcore_bounded

        # path 1-2-3-4-5: round 1 peels 1,5; round 2 peels 2,4; round 3 empty
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        for rounds in (1, 2, 3):
            out = kcore_bounded(
                _ds(edges), k=2, rounds=rounds, num_shards=4
            ).to_pandas()
            # ray's to_pandas drops columns on zero-row datasets
            got = dict(zip(out["node"], out["deg"])) if len(out) else {}
            assert got == self._brute(edges, 2, rounds), rounds

    def test_random_matches_brute(self, ray_session):
        from raykg.ops.graphstats import kcore_bounded

        rng = np.random.default_rng(37)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 30, size=(90, 2))
            if a != b
        ]
        for k, rounds in [(2, 2), (3, 3), (4, 2)]:
            out = kcore_bounded(
                _ds(edges), k=k, rounds=rounds, num_shards=8
            ).to_pandas()
            got = dict(zip(out["node"], out["deg"]))
            assert got == self._brute(edges, k, rounds), (k, rounds)
