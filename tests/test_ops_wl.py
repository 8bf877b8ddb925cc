"""WL refinement: reference parity, structural discrimination, engine
pinning (broadcast label attach vs bucketed join), partition invariance."""
import hashlib

import pandas as pd
import pytest
import ray.data

from raykg.ops.wl import wl_refine


def local_wl(edges, rounds):
    es = sorted(set(edges))
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    lbl = {n: "0" for n in nodes}
    for _ in range(rounds):
        nxt = {}
        for n in nodes:
            nbr = sorted(lbl[u] for u, v in es if v == n)
            nxt[n] = hashlib.md5(
                (lbl[n] + "|" + ",".join(nbr)).encode()
            ).hexdigest()
        lbl = nxt
    return lbl


GRAPH = [
    ("a", "b"), ("b", "c"), ("c", "a"),      # 3-cycle
    ("d", "e"), ("e", "f"), ("f", "d"),      # another 3-cycle
    ("g", "h"), ("h", "g"),                  # 2-cycle
    ("i", "b"),                              # extra in-edge breaks b's symmetry
    ("a", "b"),                              # parallel edge (collapsed)
]


def run(max_broadcast_nodes=5_000_000, parts=1, rounds=2):
    ds = ray.data.from_pandas(
        pd.DataFrame(GRAPH, columns=["src", "dst"])
    ).repartition(parts)
    out = wl_refine(
        ds, rounds=rounds, num_shards=4,
        max_broadcast_nodes=max_broadcast_nodes,
    ).to_pandas()
    return dict(zip(out["node"], out["wl_color"]))


def test_matches_local_reference(ray_session):
    got = run()
    want = local_wl(GRAPH, 2)
    assert got == want


def test_structural_discrimination(ray_session):
    got = run()
    # pure in-degree-1 chains all look alike at depth 2: the untouched
    # 3-cycle, the 2-cycle, and a (whose in-neighbor c is still plain)
    assert (
        got["d"] == got["e"] == got["f"] == got["g"] == got["h"] == got["a"]
    )
    # b has in-degree 2 (c->b plus i->b): unique color
    assert got["b"] != got["a"]
    # c's in-neighbor IS b, so b's anomaly propagates one hop at round 2
    assert got["c"] != got["a"] and got["c"] != got["b"]
    # source-only node i: empty in-multiset chain, distinct from all
    assert got["i"] not in {got["a"], got["b"], got["c"]}


def test_join_engine_matches_broadcast(ray_session):
    assert run(max_broadcast_nodes=0) == run()


def test_partition_invariance(ray_session):
    assert run(parts=5) == run()


def test_random_digraph_matches_local(ray_session):
    import numpy as np

    rng = np.random.default_rng(29)
    edges = [
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in rng.integers(0, 20, size=(60, 2))
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    ).repartition(4)
    got = wl_refine(ds, rounds=3, num_shards=4).to_pandas()
    want = local_wl(edges, 3)
    assert dict(zip(got["node"], got["wl_color"])) == want
