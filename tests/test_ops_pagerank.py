"""PageRank: local-reference parity, mass conservation, partition
invariance, dangling/dedup semantics."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from raykg.ops.pagerank import pagerank


def local_pagerank(edges, damping=0.85, iters=5, weights=None):
    """Dense numpy reference with uniform dangling redistribution;
    ``weights`` maps (u, v) -> summed weight (None = unweighted distinct)."""
    if weights is None:
        weights = {e: 1.0 for e in set(edges)}
    nodes = sorted({u for u, _ in weights} | {v for _, v in weights})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for (u, _), w in weights.items():
        outdeg[idx[u]] += w
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = pr[outdeg == 0].sum()
        nxt = np.full(n, (1 - damping) / n + damping * dangling / n)
        for (u, v), w in weights.items():
            nxt[idx[v]] += damping * pr[idx[u]] * w / outdeg[idx[u]]
        pr = nxt
    return dict(zip(nodes, pr))


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "e"),  # self-loop
    ("f", "c"),              # f has in-degree 0
    ("c", "g"),              # g is dangling (no out-edges)
]


_CACHE = {}


def run(edges, iters=3, **kw):
    # memoized: several tests assert against the same base-graph ranks,
    # and each pagerank execution costs ~10 s of shuffle overhead
    key = (tuple(edges), iters, tuple(sorted(kw.items())))
    if key not in _CACHE:
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
        out = pagerank(ds, num_shards=8, iters=iters, **kw).to_pandas()
        _CACHE[key] = dict(zip(out["node"], out["pr"]))
    return _CACHE[key]


def test_matches_local_reference(ray_session):
    got = run(GRAPH)
    want = local_pagerank(GRAPH, iters=3)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node


def test_mass_conserved(ray_session):
    got = run(GRAPH)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_partition_invariance(ray_session):
    ds1 = ray.data.from_pandas(
        pd.DataFrame(GRAPH, columns=["src", "dst"])
    ).repartition(7)
    out = pagerank(ds1, num_shards=8, iters=3).to_pandas()
    got = dict(zip(out["node"], out["pr"]))
    want = run(GRAPH)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node


def test_parallel_edges_collapse(ray_session):
    doubled = GRAPH + GRAPH
    assert run(doubled) == pytest.approx(run(GRAPH))


def test_keep_parallel_edges_changes_weights(ray_session):
    skewed = GRAPH + [("a", "b")]  # a->b twice: b gains when kept
    with_dup = run(skewed, dedup_edges=False)
    without = run(skewed, dedup_edges=True)
    assert with_dup["b"] > without["b"]


def test_weighted_matches_local_reference(ray_session):
    from collections import Counter

    weighted = GRAPH + [("a", "b"), ("a", "b"), ("d", "c")]  # parallel repeats
    df = pd.DataFrame(weighted, columns=["src", "dst"])
    df["weight"] = 1.0
    ds = ray.data.from_pandas(df).repartition(3)
    out = pagerank(
        ds, num_shards=8, iters=3, weight_column="weight"
    ).to_pandas()
    got = dict(zip(out["node"], out["pr"]))
    wmap = {e: float(c) for e, c in Counter(weighted).items()}
    want = local_pagerank(weighted, iters=3, weights=wmap)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node


def test_uniform_weights_equal_unweighted(ray_session):
    # constant weights cancel: pr * c / (c * outdeg) == pr / outdeg
    df = pd.DataFrame(GRAPH, columns=["src", "dst"])
    df["weight"] = 2.5
    ds = ray.data.from_pandas(df)
    out = pagerank(ds, num_shards=8, iters=3, weight_column="weight").to_pandas()
    got = dict(zip(out["node"], out["pr"]))
    want = run(GRAPH)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node


def test_sharded_engine_matches_broadcast(ray_session):
    # max_broadcast_nodes=0 forces the fully sharded fallback; both
    # engines run the same arithmetic and must agree to the last bit
    got = run(GRAPH, max_broadcast_nodes=0)
    want = run(GRAPH)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-15), node


def test_random_graph_matches_reference(ray_session):
    # seeded random digraph: dangling nodes, self-loops, parallel edges
    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(40)]
    edges = [
        (nodes[rng.integers(40)], nodes[rng.integers(40)]) for _ in range(120)
    ]
    got = run(edges)
    want = local_pagerank(edges, iters=3)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_empty_graph(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"src": [], "dst": []}))
    assert pagerank(ds, num_shards=4).count() == 0


def local_ppr(edges, seeds, damping=0.85, iters=3):
    """Dense numpy personalized reference: reset mass (init, teleport,
    dangling) concentrates uniformly on the seeds present in the graph."""
    es = set(edges)
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in es:
        outdeg[idx[u]] += 1.0
    rv = np.zeros(n)
    present = [s for s in seeds if s in idx]
    for s in present:
        rv[idx[s]] = 1.0 / len(present)
    pr = rv.copy()
    for _ in range(iters):
        dangling = pr[outdeg == 0].sum()
        nxt = (1 - damping) * rv + damping * dangling * rv
        for u, v in es:
            nxt[idx[v]] += damping * pr[idx[u]] / outdeg[idx[u]]
        pr = nxt
    return dict(zip(nodes, pr))


def test_personalized_matches_local_reference(ray_session):
    seeds = ["a", "g", "not-in-graph"]
    got = run(GRAPH, seeds=tuple(seeds))
    want = local_ppr(GRAPH, seeds)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_sharded_matches_broadcast(ray_session):
    seeds = ("a", "g")
    got = run(GRAPH, seeds=seeds, max_broadcast_nodes=0)
    want = run(GRAPH, seeds=seeds)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-15), node


def test_personalized_no_seed_in_graph_raises(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    with pytest.raises(ValueError):
        pagerank(ds, num_shards=4, seeds=["zzz"])


def test_checkpoint_resume_bit_equal_broadcast(ray_session, tmp_path):
    import os
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    # "crashed" run: only 2 of 4 iterations complete
    pagerank(ds, num_shards=4, iters=2, checkpoint_dir=ck)
    assert os.path.exists(os.path.join(ck, "iter_0002", "_MANIFEST.json"))
    resumed = pagerank(ds, num_shards=4, iters=4, checkpoint_dir=ck).to_pandas()
    fresh = run(GRAPH, iters=4)
    got = dict(zip(resumed["node"], resumed["pr"]))
    assert got == fresh  # bit-equal, not approx
    assert os.path.exists(os.path.join(ck, "iter_0004", "_MANIFEST.json"))


def test_checkpoint_resume_bit_equal_sharded(ray_session, tmp_path):
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck,
             max_broadcast_nodes=0)
    resumed = pagerank(ds, num_shards=4, iters=3, checkpoint_dir=ck,
                       max_broadcast_nodes=0).to_pandas()
    fresh = run(GRAPH, iters=3)
    got = dict(zip(resumed["node"], resumed["pr"]))
    assert got == fresh


def test_checkpoint_signature_mismatch_raises(ray_session, tmp_path):
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck)
    with pytest.raises(ValueError):
        pagerank(ds, num_shards=4, iters=2, damping=0.5, checkpoint_dir=ck)


def test_checkpoint_incomplete_iteration_ignored(ray_session, tmp_path):
    import os
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck)
    # simulate a kill between state write and manifest rename
    os.makedirs(os.path.join(ck, "iter_0002", "state"), exist_ok=True)
    resumed = pagerank(ds, num_shards=4, iters=2, checkpoint_dir=ck).to_pandas()
    fresh = run(GRAPH, iters=2)
    assert dict(zip(resumed["node"], resumed["pr"])) == fresh


def test_checkpoint_partial_state_files_cleared_sharded(ray_session, tmp_path):
    """A kill mid-write leaves NON-EMPTY un-manifested parquet in the
    iteration dir; the rerun must clear it (write_parquet appends under
    fresh execution UUIDs) or a later resume reads stale + new rows."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck,
             max_broadcast_nodes=0)
    state_dir = os.path.join(ck, "iter_0002", "state")
    os.makedirs(state_dir, exist_ok=True)
    pq.write_table(
        pa.table({"node": ["a"], "outdeg": [1.0], "pr": [0.5]}),
        os.path.join(state_dir, "stale-partial.parquet"),
    )
    resumed = pagerank(ds, num_shards=4, iters=2, checkpoint_dir=ck,
                       max_broadcast_nodes=0).to_pandas()
    assert dict(zip(resumed["node"], resumed["pr"])) == run(GRAPH, iters=2)
    # the now-manifested iteration must be resumable without duplicates
    resumed2 = pagerank(ds, num_shards=4, iters=3, checkpoint_dir=ck,
                        max_broadcast_nodes=0).to_pandas()
    assert dict(zip(resumed2["node"], resumed2["pr"])) == run(GRAPH, iters=3)


def test_checkpoint_edge_change_same_node_count_raises(ray_session, tmp_path):
    """Adding an edge between EXISTING nodes keeps the node count but
    must invalidate the checkpoint (edge fingerprint in the signature)."""
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck)
    changed = ray.data.from_pandas(
        pd.DataFrame(GRAPH + [("d", "a")], columns=["src", "dst"])
    )
    with pytest.raises(ValueError):
        pagerank(changed, num_shards=4, iters=2, checkpoint_dir=ck)


def test_checkpoint_manifest_rows_mismatch_raises(ray_session, tmp_path):
    """A manifested state dir whose row count no longer matches the
    manifest (e.g. files appended after the fact) fails loudly."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    ds = ray.data.from_pandas(pd.DataFrame(GRAPH, columns=["src", "dst"]))
    ck = str(tmp_path / "ck")
    pagerank(ds, num_shards=4, iters=1, checkpoint_dir=ck,
             max_broadcast_nodes=0)
    state_dir = os.path.join(ck, "iter_0001", "state")
    pq.write_table(
        pa.table({"node": ["zzz"], "outdeg": [0.0], "pr": [0.25]}),
        os.path.join(state_dir, "zzz-injected.parquet"),
    )
    with pytest.raises(ValueError, match="manifest recorded"):
        pagerank(ds, num_shards=4, iters=2, checkpoint_dir=ck,
                 max_broadcast_nodes=0)
