"""Sequence packing + mixture replication (ops/pack.py) vs naive refs."""

import hashlib

import numpy as np
import pytest

import ray
import ray.data

from raykg.ops.pack import mix_weighted, pack_bins


def md5pct(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100


def md5shard(k, s):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % s


def naive_pack(docs, capacity, num_shards):
    streams = {}
    for d, t in docs:
        streams.setdefault(md5shard(d, num_shards), []).append((d, len(t.split())))
    out = {}
    for shard, rows in streams.items():
        fill, b = 0, 0
        first = True
        for d, n in sorted(rows):
            if not first and fill + n > capacity:
                b += 1
                fill = 0
            out[d] = (shard, b, n)
            fill += n
            first = False
    return out


@pytest.mark.usefixtures("ray_session")
class TestPackBins:
    def test_fuzz_vs_naive(self):
        rng = np.random.default_rng(3)
        docs = [
            (i, " ".join("w" for _ in range(int(rng.integers(1, 40)))))
            for i in range(120)
        ]
        got = pack_bins(
            ray.data.from_items([{"doc_id": d, "text": t} for d, t in docs]).repartition(5),
            capacity=64,
            num_shards=4,
        ).to_pandas()
        gmap = {
            int(r.doc_id): (int(r.shard), int(r.bin), int(r.n_tok))
            for r in got.itertuples()
        }
        assert gmap == naive_pack(docs, 64, 4)

    def test_oversize_doc_owns_bin(self):
        docs = [(i, " ".join("w" for _ in range(n))) for i, n in enumerate([10, 500, 10])]
        out = pack_bins(
            ray.data.from_items([{"doc_id": d, "text": t} for d, t in docs]),
            capacity=64,
            num_shards=1,
        ).to_pandas().sort_values("doc_id")
        bins = list(out["bin"])
        # the 500-token doc must not share its bin
        big_bin = bins[1]
        assert bins.count(big_bin) == 1

    def test_exact_fill_allowed(self):
        docs = [(0, "a b c d"), (1, "a b c d")]  # 4 + 4 == capacity 8
        out = pack_bins(
            ray.data.from_items([{"doc_id": d, "text": t} for d, t in docs]),
            capacity=8,
            num_shards=1,
        ).to_pandas()
        assert set(out["bin"]) == {0}

    def test_partition_invariance(self):
        docs = [(i, "w " * (i % 17 + 1)) for i in range(60)]
        items = [{"doc_id": d, "text": t} for d, t in docs]
        a = (
            pack_bins(ray.data.from_items(items).repartition(1), capacity=32, num_shards=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            pack_bins(ray.data.from_items(items).repartition(9), capacity=32, num_shards=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestMixWeighted:
    def test_counts_match_rule(self):
        rows = [{"doc_id": i, "lang": l} for i, l in enumerate(["a", "b", "c", "d"] * 25)]
        w = {"a": 2.0, "b": 0.5, "c": 1.25, "d": 0.0}
        out = mix_weighted(
            ray.data.from_items(rows).repartition(4), w
        ).to_pandas()
        for r in rows:
            lang, did = r["lang"], r["doc_id"]
            frac = int(round((w[lang] - int(w[lang])) * 100))
            want = int(w[lang]) + (1 if md5pct(did) < frac else 0)
            got = out[out["doc_id"] == did]
            assert len(got) == want, (did, lang)
            if want:
                assert sorted(got["copy"]) == list(range(1, want + 1))

    def test_unknown_group_dropped(self):
        rows = [{"doc_id": 1, "lang": "zz"}]
        assert mix_weighted(ray.data.from_items(rows), {"a": 1.0}).count() == 0
