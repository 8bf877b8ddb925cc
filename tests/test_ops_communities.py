"""Synchronous majority label propagation (ops/communities)."""

from collections import Counter

import pandas as pd
import pytest

import ray

from raykg.ops.communities import label_propagation

# two triangles joined by one bridge edge: classic two-community graph
GRAPH = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]


def local_lp(pairs, rounds):
    """Pure-Python reference of the documented synchronous semantics."""
    adj: dict = {}
    for u, v in set(pairs):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(labels[m] for m in nbrs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def run(pairs, rounds=2, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["u", "v"]))
    out = label_propagation(ds, rounds=rounds, num_shards=4, **kw).to_pandas()
    return dict(zip(out["node"], out["community"]))


def test_matches_reference(ray_session):
    for rounds in (1, 2, 3):
        assert run(GRAPH, rounds=rounds) == local_lp(GRAPH, rounds)


def test_duplicate_pairs_do_not_bias_the_mode(ray_session):
    # pair sources emit one copy per co-occurrence group; multiplicities
    # must not change the neighbor-label frequencies
    assert run(GRAPH + GRAPH + [(0, 1)]) == local_lp(GRAPH, 2)


def test_two_triangles_separate(ray_session):
    # 3 synchronous rounds settle this graph into its two triangles
    got = run(GRAPH, rounds=3)
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 2


def test_bucketed_fallback_matches_broadcast(ray_session):
    # max_broadcast_nodes=0 forces the bucketed-join attach; identical output
    assert run(GRAPH, max_broadcast_nodes=0) == run(GRAPH)


def test_random_graph_matches_reference(ray_session):
    import numpy as np

    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(60):
        u, v = int(rng.integers(20)), int(rng.integers(20))
        if u != v:
            pairs.append((min(u, v), max(u, v)))
    for rounds in (1, 2):
        assert run(pairs, rounds=rounds) == local_lp(pairs, rounds)


def test_modularity_exact_small_graph(ray_session):
    """Two triangles joined by one bridge: hand-computable Q."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from raykg.ops.communities import modularity

    pairs = pd.DataFrame(
        {
            "u": [1, 1, 2, 4, 4, 5, 3],
            "v": [2, 3, 3, 5, 6, 6, 4],
        }
    )
    labels = pd.DataFrame(
        {"node": [1, 2, 3, 4, 5, 6], "community": [1, 1, 1, 4, 4, 4]}
    )
    got = modularity(
        ray.data.from_pandas(pairs).repartition(3),
        ray.data.from_pandas(labels),
    ).to_pandas().iloc[0]
    # m=7; in_1=3, deg_1=7; in_4=3, deg_4=7
    # q_num = (4*7*3 - 49) * 2 = (84-49)*2 = 70
    assert got["m_edges"] == 7 and got["n_comms"] == 2 and got["q_num"] == 70


def test_modularity_duplicate_and_reversed_pairs_dedup(ray_session):
    import pandas as pd
    import ray.data

    from raykg.ops.communities import modularity

    pairs = pd.DataFrame({"u": [1, 2, 1, 2], "v": [2, 1, 2, 3]})
    labels = pd.DataFrame({"node": [1, 2, 3], "community": [1, 1, 3]})
    got = modularity(
        ray.data.from_pandas(pairs), ray.data.from_pandas(labels)
    ).to_pandas().iloc[0]
    # distinct edges: (1,2), (2,3) -> m=2
    assert got["m_edges"] == 2
    # in_1=1 deg_1=3; in_3=0 deg_3=1 -> q_num = (8-9) + (0-1) = -2
    assert got["q_num"] == -2


def test_modularity_unlabeled_node_raises_on_both_plans(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from raykg.ops.communities import modularity

    pairs = pd.DataFrame({"u": [1, 2], "v": [2, 3]})
    labels = pd.DataFrame({"node": [1, 2], "community": [1, 1]})  # 3 missing
    # the broadcast plan's error surfaces wrapped in RayTaskError
    for kw in ({}, {"max_broadcast_nodes": 0}):
        with pytest.raises(Exception, match="missing from `labels`"):
            modularity(
                ray.data.from_pandas(pairs),
                ray.data.from_pandas(labels),
                **kw,
            )
