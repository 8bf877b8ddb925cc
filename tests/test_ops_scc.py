"""SCC: local Tarjan parity, multi-peel-round graphs, partition
invariance, loud non-convergence."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from raykg.ops.scc import strongly_connected_components


def local_scc(edges):
    """Iterative Tarjan; returns {node: min id of its SCC}."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    adj = {n: [] for n in nodes}
    for u, v in set(edges):
        adj[u].append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = min(scc)
                for w in scc:
                    comp[w] = m
            if work:
                w2, _ = work[-1]
                low[w2] = min(low[w2], low[v])

    for n in nodes:
        if n not in index:
            strongconnect(n)
    return comp


def run(edges, parts=1, **kw):
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(parts)
    out = strongly_connected_components(
        ds, num_shards=4, num_buckets=4, **kw
    ).to_pandas()
    assert len(out) == out["node"].nunique()  # each node resolved once
    return dict(zip(out["node"], out["scc_id"]))


GRAPH = [
    (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
    (3, 4), (4, 5), (5, 4),          # SCC {4,5}, bridge 3->4
    (6, 6),                          # self-loop singleton
    (7, 8),                          # two trivial SCCs
    (5, 9), (9, 10), (10, 9),        # SCC {9,10} downstream
]


def test_matches_tarjan(ray_session):
    assert run(GRAPH) == local_scc(GRAPH)


def test_descending_dag_needs_peeling(ray_session):
    # ids decrease along the chain: each peel round resolves one node
    chain = [(5, 4), (4, 3), (3, 2), (2, 1)]
    assert run(chain) == local_scc(chain)  # all singletons


def test_random_digraph_matches_tarjan(ray_session):
    rng = np.random.default_rng(11)
    edges = [
        (int(rng.integers(30)), int(rng.integers(30))) for _ in range(70)
    ]
    assert run(edges, parts=5) == local_scc(edges)


def test_distributed_engine_pinned_to_fast_path(ray_session):
    rng = np.random.default_rng(23)
    edges = [
        (int(rng.integers(25)), int(rng.integers(25))) for _ in range(60)
    ]
    fast = run(edges)  # numpy FW-BW-MIN under the gate
    slow = run(edges, small_graph_max_edges=0)  # full BSP loop
    assert fast == slow == local_scc(edges)


def test_peel_cap_raises(ray_session):
    chain = [(9, 8), (8, 7), (7, 6), (6, 5), (5, 4)]
    ds = ray.data.from_pandas(pd.DataFrame(chain, columns=["src", "dst"]))
    for gate in (8_000_000, 0):
        with pytest.raises(RuntimeError):
            strongly_connected_components(
                ds, max_peel_rounds=2, num_shards=4, num_buckets=4,
                small_graph_max_edges=gate,
            )


def test_condensation_and_dag_depth(ray_session):
    from raykg.ops.scc import condensation_edges, dag_depth

    # two cycles bridged into a 3-layer chain plus a detached root
    edges = [
        (1, 2), (2, 1),          # SCC {1,2}
        (2, 3), (3, 4), (4, 3),  # SCC {3,4}
        (4, 5),                  # singleton 5
        (9, 1),                  # root 9 above everything
    ]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    labels = strongly_connected_components(ds, num_shards=4, num_buckets=4)
    ce = condensation_edges(ds, labels, num_shards=4, num_buckets=4)
    got = sorted(map(tuple, ce.to_pandas().to_numpy()))
    assert got == [(1, 3), (3, 5), (9, 1)]
    # depth: 9 -> {1,2} -> {3,4} -> 5 = 3 edges
    assert dag_depth(ce, num_shards=4, num_buckets=4) == 3
    # distributed relaxation pinned to the numpy fast path
    assert dag_depth(ce, num_shards=4, num_buckets=4,
                     small_graph_max_edges=0) == 3


def test_dag_depth_cycle_raises(ray_session):
    from raykg.ops.scc import dag_depth

    ds = ray.data.from_pandas(
        pd.DataFrame([(1, 2), (2, 3), (3, 1)], columns=["src", "dst"])
    )
    for gate in (8_000_000, 0):
        with pytest.raises(RuntimeError):
            dag_depth(ds, max_rounds=8, num_shards=4, num_buckets=4,
                      small_graph_max_edges=gate)
