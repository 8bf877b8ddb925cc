"""Training-data operator tests: dedup, similarity, text stats, multimodal."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from raykg.ops.dedup import (
    embedding_near_pairs,
    exact_dedup,
    exact_dedup_groups,
    jaccard_verify,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_near_pairs,
)
from raykg.ops.multimodal import MediaFeatureActor, documents_to_media, extract_media_features
from raykg.ops.similarity import IVFIndex, topk_cosine
from raykg.ops.text import add_fingerprints, add_lang_id, add_quality, add_token_counts

SF = "/root/testdata/sf0.001"


def docs_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


DUP_ROWS = [
    {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 2, "text": "completely different content here about databases"},
    {"doc_id": 3, "text": "the quick brown fox jumps over the lazy cat"},
    {"doc_id": 4, "text": "unrelated words entirely separate payload tokens"},
]


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup_groups(self):
        out = exact_dedup_groups(docs_ds(DUP_ROWS)).to_pandas()
        assert len(out) == 4  # 5 rows, one exact duplicate pair
        assert out.set_index("doc_id").loc[0, "n_dups"] == 2

    def test_exact_dedup_keeps_first(self):
        out = exact_dedup(docs_ds(DUP_ROWS)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 2, 3, 4]

    def test_minhash_lsh_finds_near_dups(self):
        out = minhash_lsh_pairs(
            docs_ds(DUP_ROWS), threshold=0.5, concurrency=1
        ).to_pandas()
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert (0, 1) in pairs  # exact dup pair must surface
        assert (0, 3) in pairs or (1, 3) in pairs  # near dup (1 word changed)
        assert not any(4 in p for p in pairs)

    def test_jaccard_verify(self):
        cands = docs_ds(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 4]}))
        out = jaccard_verify(docs_ds(DUP_ROWS), cands).to_pandas()
        j = out.set_index(["id_a", "id_b"])["jaccard"]
        assert j[(0, 1)] == 1.0
        assert j[(0, 4)] == 0.0


    def test_candidate_ids_gate_paths_pinned_equal(self, monkeypatch):
        """Above _BROADCAST_MAX_DOCS candidates the verify path must skip
        the driver-side id array entirely (ids=None, bucketed joins) and
        still produce the identical pair set."""
        import raykg.ops.dedup as dd

        kwargs = dict(threshold=0.5, concurrency=1)
        want = (
            minhash_lsh_pairs(docs_ds(DUP_ROWS), **kwargs)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        n, ids = dd._candidate_ids(
            docs_ds(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 3]}))
        )
        assert n == 3 and list(ids) == [0, 1, 3]
        monkeypatch.setattr(dd, "_BROADCAST_MAX_DOCS", 1)
        n2, ids2 = dd._candidate_ids(
            docs_ds(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 3]}))
        )
        assert n2 == 3 and ids2 is None  # distributed-only path engaged
        got = (
            minhash_lsh_pairs(docs_ds(DUP_ROWS), **kwargs)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_embedding_near_gate_paths_pinned_equal(self, monkeypatch):
        import raykg.ops.dedup as dd

        rng = np.random.default_rng(5)
        base = rng.normal(size=(6, 8))
        rows = []
        for i, v in enumerate(base):
            rows.append({"doc_id": i, "embedding": v.tolist()})
            rows.append({"doc_id": 100 + i,
                         "embedding": (v + rng.normal(scale=1e-3, size=8)).tolist()})
        want = (
            embedding_near_pairs(docs_ds(rows), id_column="doc_id", threshold=0.99)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        monkeypatch.setattr(dd, "_BROADCAST_MAX_DOCS", 1)
        got = (
            embedding_near_pairs(docs_ds(rows), id_column="doc_id", threshold=0.99)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_ngram_jaccard_pairs_exact_recall(self):
        # inverted index: every pair with jaccard >= t surfaces, none below
        out = ngram_jaccard_pairs(docs_ds(DUP_ROWS), threshold=0.2).to_pandas()
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert (0, 1) in pairs  # exact dup
        assert (0, 3) in pairs and (1, 3) in pairs  # near dups share shingles
        assert not any(4 in p for p in pairs)  # disjoint text
        assert (out["jaccard"] >= 0.2).all()
        # each pair exactly once (candidates deduped before verify)
        assert len(out) == len(pairs)

    def test_asof_join_backward(self):
        from raykg.ops.join import asof_join

        left = docs_ds(
            pd.DataFrame(
                {
                    "id": [1, 2, 3, 4],
                    "k": [7, 7, 7, 9],
                    "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                                          "2024-01-01 09:00", "2024-01-01 10:30"]),
                }
            )
        )
        right = docs_ds(
            pd.DataFrame(
                {
                    "id": [100, 101, 102],
                    "k": [7, 7, 9],
                    "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 10:45",
                                          "2024-01-01 11:00"]),
                }
            )
        )
        out = (
            asof_join(left, right, key="k", ts="ts")
            .to_pandas()
            .set_index("id")
        )
        assert out.loc[1, "id_r"] == 100  # 10:00 -> 09:30
        assert out.loc[2, "id_r"] == 101  # 11:00 -> 10:45
        assert pd.isna(out.loc[3, "id_r"])  # 09:00 -> nothing prior
        assert pd.isna(out.loc[4, "id_r"])  # key 9: right at 11:00 is later

    def test_range_join_general_and_disjoint(self):
        from raykg.ops.join import range_join

        left = docs_ds(
            pd.DataFrame(
                {
                    "id": [1, 2, 3],
                    "k": [7, 7, 7],
                    "ts": pd.to_datetime(["2024-01-01 10:15", "2024-01-01 11:30",
                                          "2024-01-01 12:30"]),
                }
            )
        )
        right = docs_ds(
            pd.DataFrame(
                {
                    "k": [7, 7],
                    "win": [10, 11],
                    "start_ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00"]),
                    "end_ts": pd.to_datetime(["2024-01-01 10:59", "2024-01-01 11:59"]),
                }
            )
        )
        for disjoint in (False, True):
            out = range_join(
                left, right, key="k", ts="ts", start="start_ts", end="end_ts",
                disjoint=disjoint,
            ).to_pandas()
            assert dict(zip(out["id"], out["win"])) == {1: 10, 2: 11}  # 3 unmatched

    def test_sharded_agg_parity(self):
        # sharded_groupby_apply == a plain pandas groupby, for random data
        # across int and string keys (exactness does not depend on sharding)
        import numpy as np

        from raykg.ops.agg import sharded_groupby_apply

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "k1": rng.randint(0, 200, size=2000),
                "k2": rng.choice(list("abcdefg"), size=2000),
                "v": rng.randint(-50, 50, size=2000),
            }
        )
        want = (
            df.groupby(["k1", "k2"], sort=False)["v"]
            .agg(["sum", "min", "count"])
            .reset_index()
            .rename(columns={"sum": "s", "min": "m", "count": "c"})
        )
        want["c"] = want["c"].astype("int64")

        def combine(g):
            out = (
                g.groupby(["k1", "k2"], sort=False)["v"]
                .agg(["sum", "min", "count"])
                .reset_index()
                .rename(columns={"sum": "s", "min": "m", "count": "c"})
            )
            out["c"] = out["c"].astype("int64")
            return out

        got = sharded_groupby_apply(docs_ds(df), ["k1", "k2"], combine, num_shards=7)
        got = got.to_pandas()
        key = ["k1", "k2"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            want.sort_values(key).reset_index(drop=True),
            check_dtype=False,
        )

    def test_group_topk(self):
        from raykg.ops.topk import group_topk

        rows = pd.DataFrame(
            {
                "k": ["a", "a", "a", "b", "b"],
                "v": [3, 1, 3, 2, 5],
                "t": ["z", "x", "y", "x", "y"],
            }
        )
        out = (
            group_topk(docs_ds(rows), ["k"], "v", k=2, tiebreak=["t"])
            .to_pandas()
            .sort_values(["k", "rank"])
            .reset_index(drop=True)
        )
        # a: ties at v=3 broken by t asc -> (3,'y') rank1, (3,'z') rank2
        assert list(out["k"]) == ["a", "a", "b", "b"]
        assert list(out["v"]) == [3, 3, 5, 2]
        assert list(out["t"]) == ["y", "z", "y", "x"]
        assert list(out["rank"]) == [1, 2, 1, 2]

    def test_connected_components_chain_and_clique(self):
        from raykg.ops.components import connected_components, dedup_survivors

        # chain 1-2-3-4 (diameter forces multiple propagation rounds),
        # clique {10,11,12}, isolated pair {20,21}
        pairs = docs_ds(
            pd.DataFrame(
                {
                    "id_a": [1, 2, 3, 10, 10, 11, 20],
                    "id_b": [2, 3, 4, 11, 12, 12, 21],
                }
            )
        )
        out = connected_components(pairs).to_pandas()
        lab = dict(zip(out["doc_id"], out["cluster_id"]))
        assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
        corpus = docs_ds(
            pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]})
        )
        kept = dedup_survivors(corpus, connected_components(pairs)).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 10, 20, 99]

    def test_connected_components_bsp_matches_fast_path(self):
        # small_graph_max_edges=0 forces the BSP min-label loop; both
        # engines must emit the identical (doc_id, min-id cluster) table —
        # seeded random graph with chains, cliques, and self-loops
        from raykg.ops.components import connected_components

        rng = np.random.RandomState(17)
        a = rng.randint(0, 60, 120)
        b = rng.randint(0, 60, 120)
        pairs = docs_ds(pd.DataFrame({"id_a": a, "id_b": b}))
        fast = (
            connected_components(pairs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            connected_components(pairs, small_graph_max_edges=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, bsp)

    def test_simhash_near_pairs(self):
        out = simhash_near_pairs(docs_ds(DUP_ROWS), max_hamming=3).to_pandas()
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert (0, 1) in pairs
        assert all(h <= 3 for h in out["hamming"])

    def test_embedding_near_pairs(self):
        rng = np.random.RandomState(0)
        base = rng.randn(4, 16)
        rows = []
        for i, v in enumerate(base):
            rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
            rows.append(
                {"vec_id": 2 * i + 1, "embedding": (v + 0.01 * rng.randn(16)).tolist()}
            )
        out = embedding_near_pairs(docs_ds(rows), threshold=0.99).to_pandas()
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert {(0, 1), (2, 3), (4, 5), (6, 7)} <= pairs

    def test_semantic_dedup_matches_bruteforce(self):
        # random vectors + planted near-dups; pin (cluster, kept) against an
        # in-Python brute force of the documented semantics (argmax-cosine
        # assignment, dominance by ANY earlier same-cluster row)
        rng = np.random.RandomState(7)
        base = rng.randn(40, 12)
        vecs = np.concatenate([base, base[:15] + 0.01 * rng.randn(15, 12)])
        ids = np.concatenate([np.arange(40), 1000 + np.arange(15)])
        seeds = base[:4]
        rows = [{"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, vecs)]
        out = (
            semantic_dedup(docs_ds(rows), seeds, threshold=0.95, num_shards=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        en = vecs / np.linalg.norm(vecs, axis=1)[:, None]
        sn = seeds / np.linalg.norm(seeds, axis=1)[:, None]
        cl = np.argmax(en @ sn.T, axis=1)
        order = np.argsort(ids)
        exp_rows = []
        for j in order:
            dominated = any(
                ids[i] < ids[j] and cl[i] == cl[j] and en[i] @ en[j] >= 0.95
                for i in order
            )
            exp_rows.append((ids[j], cl[j], 0 if dominated else 1))
        got = list(zip(out["vec_id"], out["cluster"], out["kept"]))
        assert got == exp_rows
        # every planted copy shares its source's cluster and is dropped
        planted = out[out["vec_id"] >= 1000]
        assert (planted["kept"] == 0).all()

    def test_semantic_dedup_member_cap(self):
        # above the cap only the cap-many smallest-id rows dominate: with a
        # cluster of 4 near-identical vectors and cap=2, rows 1..3 are all
        # dominated by row 0 (in the prefix); a cap that excluded the only
        # dominator would keep everything
        v = np.array([1.0, 0.0, 0.0, 0.0])
        rows = [
            {"vec_id": i, "embedding": (v + 1e-6 * np.arange(4) * i).tolist()}
            for i in range(4)
        ]
        out = semantic_dedup(
            docs_ds(rows), v[None, :], threshold=0.99, max_cluster_members=2
        ).to_pandas().sort_values("vec_id")
        assert out["kept"].tolist() == [1, 0, 0, 0]


@pytest.mark.usefixtures("ray_session")
class TestEntityResolve:
    def test_bounded_levenshtein(self):
        import itertools

        from raykg.ops.entity import bounded_levenshtein

        # pin against a plain full DP over a brute-force corpus
        def full(a, b):
            la, lb = len(a), len(b)
            d = [[0] * (lb + 1) for _ in range(la + 1)]
            for i in range(la + 1):
                d[i][0] = i
            for j in range(lb + 1):
                d[0][j] = j
            for i in range(1, la + 1):
                for j in range(1, lb + 1):
                    d[i][j] = min(
                        d[i - 1][j] + 1,
                        d[i][j - 1] + 1,
                        d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return d[la][lb]

        words = ["", "a", "ab", "abc", "acb", "abcd", "xabc", "kitten", "sitting"]
        for a, b in itertools.product(words, words):
            t = full(a, b)
            for k in range(4):
                got = bounded_levenshtein(a, b, k)
                assert got == t if t <= k else got == k + 1

    def test_resolve_entities_matches_bruteforce(self):
        from raykg.ops.entity import bounded_levenshtein, resolve_entities

        rows = [
            {"ent_id": 0, "label": "Acme Corp"},
            {"ent_id": 1, "label": "acme corp"},   # case variant of 0
            {"ent_id": 2, "label": "acme  corp"},  # 1 edit from 0
            {"ent_id": 3, "label": "Acme Group"},  # 4 edits: separate
            {"ent_id": 4, "label": "Bolt Inc"},
            {"ent_id": 5, "label": "bolt inc."},   # 1 edit from 4
            {"ent_id": 6, "label": "Bolt Inc"},    # exact dup of 4
            {"ent_id": 7, "label": "zeta"},        # singleton
            {"ent_id": 8, "label": "zeta"},        # exact dup of 7
        ]
        out = (
            resolve_entities(docs_ds(rows), num_shards=3)
            .to_pandas()
            .sort_values("ent_id")
            .reset_index(drop=True)
        )
        # brute force of the documented semantics
        import itertools

        nms = {r["ent_id"]: r["label"].lower() for r in rows}
        reps: dict = {}
        for i, nm in sorted(nms.items()):
            reps.setdefault(nm, i)
        parent = {r: r for r in reps.values()}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for (na, ra), (nb, rb) in itertools.combinations(sorted(reps.items()), 2):
            if na[:4] == nb[:4] and bounded_levenshtein(na, nb, 2) <= 2:
                x, y = find(ra), find(rb)
                if x != y:
                    parent[max(x, y)] = min(x, y)
        expected = [(i, find(reps[nm])) for i, nm in sorted(nms.items())]
        assert list(zip(out["ent_id"], out["canonical_id"])) == expected
        # the clusters the fixture was built to produce
        canon = dict(zip(out["ent_id"], out["canonical_id"]))
        assert canon[0] == canon[1] == canon[2] == 0
        assert canon[3] == 3
        assert canon[4] == canon[5] == canon[6] == 4
        assert canon[7] == canon[8] == 7

    def test_bounded_levenshtein_fuzz(self):
        from raykg.ops.entity import bounded_levenshtein

        def full(a, b):
            la, lb = len(a), len(b)
            d = list(range(lb + 1))
            for i in range(1, la + 1):
                prev, d[0] = d[0], i
                for j in range(1, lb + 1):
                    prev, d[j] = d[j], min(
                        d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                    )
            return d[lb]

        rng = np.random.RandomState(13)
        alphabet = "abc"  # tiny alphabet -> near matches are common
        for _ in range(300):
            a = "".join(rng.choice(list(alphabet), rng.randint(0, 9)))
            b = "".join(rng.choice(list(alphabet), rng.randint(0, 9)))
            t = full(a, b)
            for k in (0, 1, 2, 3):
                got = bounded_levenshtein(a, b, k)
                assert got == (t if t <= k else k + 1), (a, b, k)

    def test_resolve_entities_fuzz_vs_union_find(self):
        from raykg.ops.entity import bounded_levenshtein, resolve_entities

        rng = np.random.RandomState(5)
        alphabet = list("abXY")
        rows = [
            {
                "ent_id": i,
                "label": "".join(rng.choice(alphabet, rng.randint(4, 8))),
            }
            for i in range(80)
        ]
        out = (
            resolve_entities(docs_ds(rows), num_shards=4, block_prefix=2, max_dist=1)
            .to_pandas()
            .sort_values("ent_id")
        )
        nms = {r["ent_id"]: r["label"].lower() for r in rows}
        reps: dict = {}
        for i, nm in sorted(nms.items()):
            reps.setdefault(nm, i)
        parent = {r: r for r in reps.values()}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        import itertools

        for (na, ra), (nb, rb) in itertools.combinations(sorted(reps.items()), 2):
            if na[:2] == nb[:2] and bounded_levenshtein(na, nb, 1) <= 1:
                x, y = find(ra), find(rb)
                if x != y:
                    parent[max(x, y)] = min(x, y)
        expected = [(i, find(reps[nm])) for i, nm in sorted(nms.items())]
        assert list(zip(out["ent_id"], out["canonical_id"])) == expected
        # sanity: the tiny alphabet actually produced non-singleton clusters
        assert len(set(dict(expected).values())) < len(rows)

    def test_resolve_entities_no_pairs(self):
        from raykg.ops.entity import resolve_entities

        rows = [
            {"ent_id": 10, "label": "alpha"},
            {"ent_id": 11, "label": "bravo"},
        ]
        out = resolve_entities(docs_ds(rows), num_shards=2).to_pandas()
        assert sorted(zip(out["ent_id"], out["canonical_id"])) == [(10, 10), (11, 11)]


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    def test_pair_counts_matches_bruteforce(self):
        from collections import Counter

        from raykg.ops.bpe import pair_counts
        from raykg.ops.text import WORD_RE

        rows = [
            {"text": "low lower  lowest\tlow"},
            {"text": "new newer newest 😀😀ab"},
            {"text": ""},
            {"text": "a"},
        ]
        out = pair_counts(docs_ds(rows), num_shards=3).to_pandas()
        exp: Counter = Counter()
        for r in rows:
            for w in WORD_RE.findall(r["text"]):
                for i in range(len(w) - 1):
                    exp[(w[i], w[i + 1])] += 1
        got = {(a, b): int(c) for a, b, c in zip(out["sym_a"], out["sym_b"], out["cnt"])}
        assert got == dict(exp)

    def test_pair_counts_fuzz(self):
        from collections import Counter

        from raykg.ops.bpe import pair_counts
        from raykg.ops.text import WORD_RE

        rng = np.random.RandomState(21)
        # include unicode whitespace, emoji, and CJK in the alphabet
        alphabet = list("ab1.#") + ["😀", "界", "\t", " ", "\n", " ", "　"]
        rows = [
            {"text": "".join(rng.choice(alphabet, rng.randint(0, 60)))}
            for _ in range(40)
        ]
        out = pair_counts(docs_ds(rows), num_shards=4).to_pandas()
        exp: Counter = Counter()
        for r in rows:
            for w in WORD_RE.findall(r["text"]):
                for i in range(len(w) - 1):
                    exp[(w[i], w[i + 1])] += 1
        got = {(a, b): int(c) for a, b, c in zip(out["sym_a"], out["sym_b"], out["cnt"])}
        assert got == dict(exp)

    def test_bpe_train_matches_reference(self):
        from collections import Counter

        from raykg.ops.bpe import bpe_train
        from raykg.ops.text import WORD_RE

        texts = [
            "low low low low low",
            "lower lower newest newest",
            "newest newest newest newest widest",
            "widest widest low lower",
        ]
        rows = [{"text": t} for t in texts]
        got = bpe_train(docs_ds(rows), num_merges=6, num_shards=3)

        # pure-Python reference BPE over the word-frequency table with the
        # same deterministic tie-break (count DESC, sym_a, sym_b)
        freqs: Counter = Counter()
        for t in texts:
            freqs.update(WORD_RE.findall(t))
        vocab = {w: list(w) for w in freqs}
        exp = []
        for rank in range(6):
            pc: Counter = Counter()
            for w, f in freqs.items():
                s = vocab[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += f
            if not pc:
                break
            (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            if c < 2:
                break
            exp.append((rank, a, b, c))
            for w in vocab:
                s, out_s, i = vocab[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out_s.append(a + b)
                        i += 2
                    else:
                        out_s.append(s[i])
                        i += 1
                vocab[w] = out_s
        assert got == exp
        assert len(got) == 6  # the fixture has at least 6 productive merges


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_topk_cosine_matches_numpy(self):
        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        df = emb.to_pandas()
        m = np.array(df["embedding"].tolist(), dtype=np.float64)
        ids = df["vec_id"].to_numpy()
        q = m[:3]
        out = topk_cosine(emb, q, [0, 1, 2], k=5, concurrency=1).to_pandas()
        # oracle: full numpy
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = np.round(mn @ qn.T, 6)
        for qi in range(3):
            order = np.lexsort((ids, -sims[:, qi]))[:5]
            expect = ids[order].tolist()
            got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            assert got == expect

    def test_ivf_recall(self):
        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        df = emb.to_pandas()
        m = np.array(df["embedding"].tolist(), dtype=np.float64)
        q = m[:2]
        idx = IVFIndex(nlist=8, nprobe=8).fit(emb)  # nprobe=nlist -> exact
        assigned = idx.assign(emb)
        out = idx.search(assigned, q, [0, 1], k=3).to_pandas()
        brute = topk_cosine(emb, q, [0, 1], k=3, concurrency=1).to_pandas()
        for qi in (0, 1):
            a = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            b = brute[brute["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            assert a == b


@pytest.mark.usefixtures("ray_session")
class TestTextOps:
    ROWS = [
        {"doc_id": 0, "text": "the quick fox. #tag!"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "le la les de des et"},
    ]

    def test_token_count(self):
        out = add_token_counts(docs_ds(self.ROWS)).to_pandas()
        assert out["n_tokens"].tolist() == [7, 0, 6]

    def test_quality(self):
        out = add_quality(docs_ds(self.ROWS)).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_words"] == 4
        assert out.loc[1, "quality_score"] == 0
        assert out.loc[2, "n_distinct_words"] == 6

    def test_fingerprints(self):
        out = add_fingerprints(docs_ds(self.ROWS)).to_pandas()
        import hashlib

        assert out["text_md5"][0] == hashlib.md5(self.ROWS[0]["text"].encode()).hexdigest()
        assert (out["fingerprint"] >= 0).all()

    def test_lang_id(self):
        out = add_lang_id(docs_ds(self.ROWS), concurrency=1).to_pandas()
        assert out["pred_lang"].tolist()[0] == "en"
        assert out["pred_lang"].tolist()[2] == "fr"


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_media_pipeline(self):
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        media = docs.map_batches(documents_to_media, batch_format="pyarrow")
        feats = extract_media_features(media, concurrency=1)
        out = feats.take_batch(10, batch_format="pandas")
        assert "payload" not in out.columns
        assert len(out["features"][0]) == MediaFeatureActor.FEATURE_DIM
        imgs = out[out["media_type"] == "image"]
        assert imgs["width"].notna().all()

    def test_real_decode_raises(self):
        import pyarrow as pa

        actor = MediaFeatureActor(fake=False)
        batch = pa.Table.from_pydict(
            {"media_id": [1], "media_type": ["image"], "payload": [b"xx"],
             "mime": ["x"], "n_bytes": [2]}
        )
        with pytest.raises(NotImplementedError):
            actor(batch)

    def test_fake_features_deterministic(self):
        a = MediaFeatureActor(fake=True)
        import pyarrow as pa

        batch = pa.Table.from_pydict(
            {"media_id": [1], "media_type": ["image"], "payload": [b"hello"],
             "mime": ["x"], "n_bytes": [5]}
        )
        f1 = a(batch)["features"].to_pylist()
        f2 = MediaFeatureActor(fake=True)(batch)["features"].to_pylist()
        assert f1 == f2


@pytest.mark.usefixtures("ray_session")
class TestMultimodalStages:
    def _media(self):
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).limit(30)
        return docs.map_batches(documents_to_media, batch_format="pyarrow")

    def test_resize(self):
        from raykg.ops.multimodal import resize_images

        out = resize_images(self._media(), width=8, height=8, concurrency=1).to_pandas()
        assert (out["width"] == 8).all()
        assert out["payload"].map(len).eq(64).all()

    def test_frame_sample_fanout(self):
        from raykg.ops.multimodal import sample_frames

        media = self._media()
        n_videos = media.to_pandas()["media_type"].eq("video").sum()
        out = sample_frames(media, n_frames=3, concurrency=1).to_pandas()
        assert len(out) == 3 * n_videos
        assert set(out["frame_idx"]) == {0, 1, 2}
        assert out["frame"].map(len).eq(16).all()


class TestWeightedBernoulli:
    def test_rates_track_weights_and_sql_identical(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd

        from raykg.ops.sample import weighted_bernoulli, weighted_bernoulli_sql

        rng = np.random.default_rng(73)
        df = pd.DataFrame(
            {"id": np.arange(4000), "w": rng.integers(0, 11, 4000)}
        )
        got = (
            weighted_bernoulli(
                ray.data.from_pandas(df).repartition(5), "id", "w", 10
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        # w=0 never kept; w=10 always kept; w=5 ~half
        by_w = got.groupby("w").size()
        n_w = df.groupby("w").size()
        assert 0 not in by_w.index
        assert by_w.get(10, 0) == n_w[10]
        assert abs(by_w[5] / n_w[5] - 0.5) < 0.1
        con = duckdb.connect()
        con.register("t", df)
        want = (
            con.sql(weighted_bernoulli_sql("t", "id", "w", 10))
            .df()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert got["id"].tolist() == want["id"].tolist()
import numpy as np
import pandas as pd
import ray.data
from raykg.ops.topk import group_mode

def test_mode_with_ties_and_invariance(ray_session):
    df = pd.DataFrame(
        {"k": ["a"] * 5 + ["b"] * 4,
         "v": ["x", "y", "x", "z", "y", "q", "p", "q", "p"]}
    )
    out = group_mode(ray.data.from_pandas(df), ["k"], "v", num_shards=4).to_pandas()
    got = {r.k: (r.v, r.n) for r in out.itertuples()}
    # a: x=2, y=2 tie -> smallest value 'x'; b: p=2, q=2 -> 'p'
    assert got == {"a": ("x", 2), "b": ("p", 2)}

    rng = np.random.default_rng(79)
    big = pd.DataFrame(
        {"k": rng.integers(0, 30, 500).astype(str),
         "v": rng.choice(list("abcdef"), 500)}
    )
    a = group_mode(ray.data.from_pandas(big), ["k"], "v", num_shards=2).to_pandas()
    b = group_mode(ray.data.from_pandas(big).repartition(9), ["k"], "v",
                   num_shards=8).to_pandas()
    pa_ = a.sort_values("k").reset_index(drop=True)
    pb_ = b.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)
    # matches pandas mode with the same tie rule
    want = (
        big.groupby(["k", "v"], as_index=False).size()
        .sort_values(["k", "size", "v"], ascending=[True, False, True])
        .drop_duplicates("k")
    )
    assert pa_["v"].tolist() == want["v"].tolist()


from raykg.ops.scan import prefix_sum

def test_prefix_sum_matches_numpy_and_partition_invariant(ray_session):
    rng = np.random.default_rng(41)
    n = 2000
    df = pd.DataFrame(
        {"k": rng.permutation(n).astype(np.int64),
         "v": rng.integers(-50, 50, n).astype(np.int64)}
    )
    want = df.sort_values("k")["v"].cumsum().to_numpy()
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = prefix_sum(ds, "v", ["k"]).to_pandas().sort_values("k")
        assert (out["run_total"].to_numpy() == want).all()


from raykg.ops.bloom import BloomBuild, bloom_prefilter

def test_bloom_prefilter_no_false_negatives_and_prunes(ray_session):
    rng = np.random.default_rng(3)
    small_keys = rng.choice(100_000, 200, replace=False).astype(np.int64)
    big = pd.DataFrame({"k": rng.integers(0, 100_000, 5000).astype(np.int64),
                        "v": np.arange(5000)})
    small = ray.data.from_pandas(pd.DataFrame({"k": small_keys}))
    out = bloom_prefilter(
        ray.data.from_pandas(big).repartition(4), small, on="k",
        n_bits=1 << 14,
    ).to_pandas()
    member = np.isin(big["k"].to_numpy(), small_keys)
    # no false negatives: every true match survives
    assert set(big[member]["v"]) <= set(out["v"])
    # actually prunes: most non-members dropped at this sizing
    assert len(out) < len(big) * 0.2


def test_bloom_empty_small_side_drops_everything(ray_session):
    # empty filtered dimension side: no key can match -> empty result,
    # not a TypeError from subscripting Dataset.aggregate's None
    big = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    small = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([], dtype=np.int64)})
    )
    out = bloom_prefilter(ray.data.from_pandas(big), small, on="k")
    assert out.count() == 0
    assert out.schema().names == ["k"]


def test_bloom_tiny_filter_passes_everything_exactly_once(ray_session):
    # degenerate n_bits: all-ones filter => pure pass-through, rows intact
    big = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    small = ray.data.from_pandas(pd.DataFrame({"k": np.arange(50, dtype=np.int64)}))
    out = bloom_prefilter(ray.data.from_pandas(big), small, on="k", n_bits=8)
    assert sorted(out.to_pandas()["k"]) == sorted(big["k"])


def test_morton_key_locality_and_roundtrip():
    from raykg.ops.zorder import morton_key, spread_bits
    x = np.array([0, 1, 2, 3, 1023], dtype=np.int64)
    y = np.array([0, 1, 3, 0, 1023], dtype=np.int64)
    z = morton_key(x, y)
    # interleave identities: (x,y)=(1,1)->3, (3,0)->5, (2,3)->14
    assert list(z[:4]) == [0, 3, 14, 5]
    assert z[4] == (1 << 20) - 1
    # de-interleave roundtrip via the spread masks
    even = z.astype(np.uint64) & np.uint64(0x5555555555555555)
    assert (spread_bits(x) == even).all()


def test_readability_batch_counts_and_formula():
    import pyarrow as pa
    from raykg.ops.text import readability_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "The cat sat. It purred!",       # 5 words, 2 sents
                "Rhythm tv",                      # vowel-less words
                "",                               # dropped (0 words)
                "No punctuation here",            # sentence floor = 1
            ],
        }
    )
    out = readability_batch(t)
    assert out["doc_id"].to_pylist() == [1, 2, 4]
    r = {d: (w, s, y) for d, w, s, y in zip(
        out["doc_id"].to_pylist(), out["n_words"].to_pylist(),
        out["n_sentences"].to_pylist(), out["n_syllables"].to_pylist())}
    # "the cat sat it purred": syllables e/a/a/i/u+e = 6 vowel groups
    assert r[1] == (5, 2, 6)
    # "rhythm tv": y counts as vowel -> rhythm has 1 group; tv floors at 1
    assert r[2] == (2, 1, 2)
    assert r[4] == (3, 1, 6)
    w, s, y = r[1]
    expect = round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 6)
    assert out["flesch"].to_pylist()[0] == expect


def test_exact_dedup_best_keeps_highest_score():
    import pyarrow as pa
    import ray.data
    from raykg.ops.dedup import exact_dedup_best

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": ["aa", "aa", "aa", "bb", "bb", "cc", None],
            "score": [5, 9, 9, 3, 1, 7, 2],
        }
    )
    out = (
        exact_dedup_best(
            ray.data.from_arrow(t).repartition(4),
            text_column="text", id_column="doc_id", score_column="score",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # group "aa": score 9 tie between ids 2 and 3 -> smallest id wins
    rows = {r["doc_id"]: (r["score"], r["n_dups"]) for _, r in out.iterrows()}
    assert rows == {2: (9, 3), 4: (3, 2), 6: (7, 1), 7: (2, 1)}


def test_sharded_groupby_volume_guard(ray_session):
    """A shard over the fit-in-worker cap fails loudly, naming the hot
    key and the scale-safe alternative — never a silent OOM at 100x."""
    import pandas as pd
    import pytest
    import ray.data

    from raykg.ops.agg import sharded_groupby_apply

    df = pd.DataFrame({"k": ["hot"] * 90 + ["cold"] * 10, "v": range(100)})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(Exception, match="hot"):
        sharded_groupby_apply(
            ds, ["k"], lambda g: g.groupby("k").size().reset_index(),
            num_shards=1, row_cap=50,
        ).materialize()
    # under the cap: runs fine
    out = sharded_groupby_apply(
        ds, ["k"], lambda g: g.groupby("k", sort=False).size().rename("n").reset_index(),
        num_shards=1, row_cap=1000,
    ).to_pandas()
    assert sorted(out["n"].tolist()) == [10, 90]


def test_default_shards_env_knob(monkeypatch):
    from raykg.ops.agg import default_shards

    assert default_shards(16) == 16           # explicit wins
    assert default_shards(None) == 64         # fallback
    monkeypatch.setenv("RAYKG_NUM_SHARDS", "256")
    assert default_shards(None) == 256        # cluster-wide env
    assert default_shards(8) == 8
