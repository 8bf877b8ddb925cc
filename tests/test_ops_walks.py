"""Deterministic random walks: local-reference parity, invariance."""

import hashlib

import numpy as np
import pandas as pd

import ray.data

from raykg.ops.walks import random_walks


def _ds(edges):
    return ray.data.from_pandas(
        pd.DataFrame({"u": [e[0] for e in edges], "v": [e[1] for e in edges]})
    )


def _brute(edges, length):
    adj: dict = {}
    for a, b in {tuple(sorted(e)) for e in edges if e[0] != e[1]}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {n: sorted(s) for n, s in adj.items()}
    rows = []
    for start in adj:
        cur = start
        rows.append((start, 0, start))
        for s in range(1, length + 1):
            nb = adj[cur]
            h = int(hashlib.md5(f"{start}:{s}".encode()).hexdigest()[:15], 16)
            cur = nb[h % len(nb)]
            rows.append((start, s, cur))
    return sorted(rows)


def _got(ds):
    df = ds.to_pandas()
    return sorted(
        (int(r.walk_id), int(r.step), int(r.node)) for r in df.itertuples()
    )


def test_matches_local_reference(ray_session):
    rng = np.random.default_rng(53)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, size=(100, 2))
        if a != b
    ]
    for length in (1, 3):
        assert _got(random_walks(_ds(edges), length=length, num_shards=8)) \
            == _brute(edges, length)


def test_partition_invariance_and_connectivity(ray_session):
    rng = np.random.default_rng(59)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 20, size=(60, 2))
        if a != b
    ]
    a = _got(random_walks(_ds(edges), length=2, num_shards=2))
    b = _got(random_walks(_ds(edges).repartition(7), length=2, num_shards=8))
    assert a == b
    # every consecutive pair in a walk is a real edge
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    byw: dict = {}
    for w, s, n in a:
        byw.setdefault(w, {})[s] = n
    for w, steps in byw.items():
        for s in range(1, max(steps) + 1):
            assert tuple(sorted((steps[s - 1], steps[s]))) in es


def test_engines_pinned_equal(ray_session):
    rng = np.random.default_rng(61)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 25, size=(80, 2))
        if a != b
    ]
    a = _got(random_walks(_ds(edges), length=3, engine="broadcast"))
    b = _got(random_walks(_ds(edges), length=3, engine="sharded",
                          num_shards=4))
    assert a == b
