"""Co-mention edges: reference parity, dedup of in-turn repeats,
split-turn robustness."""
import pandas as pd
import ray.data

from raykg.ops.comention import co_mention_edges

ROWS = [
    # conv, turn, tag
    ("c1", 0, "A"), ("c1", 0, "B"), ("c1", 0, "A"),   # repeat A: one A-B count
    ("c1", 1, "A"), ("c1", 1, "C"),
    ("c2", 0, "B"), ("c2", 0, "A"),                   # unsorted input
    ("c2", 1, "A"),                                   # lone tag: no pair
    ("c3", 5, "C"), ("c3", 5, "B"), ("c3", 5, "A"),   # triangle
]
WANT = {("A", "B"): 3, ("A", "C"): 2, ("B", "C"): 1}


def run(nparts):
    df = pd.DataFrame(ROWS, columns=["conv_id", "turn_idx", "tag"])
    ds = ray.data.from_pandas(df).repartition(nparts)
    out = co_mention_edges(ds, num_shards=4).to_pandas()
    return {(r.tag_a, r.tag_b): r.n_turns for r in out.itertuples()}


def test_counts(ray_session):
    assert run(1) == WANT


def test_split_turn_across_partitions(ray_session):
    # 11 rows over 11 partitions: every turn is split — the turn-sharded
    # exchange must still co-locate its tags
    assert run(11) == WANT
