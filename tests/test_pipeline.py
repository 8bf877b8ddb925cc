"""Ray Data pipeline tests: tagging stage, graph layer, partitioned IO."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from raykg.pipeline.config import PipelineConfig
from raykg.pipeline.graph import (
    build_nodes,
    concept_scores,
    extract_triples,
    triples_to_edges,
)
from raykg.pipeline.io import PartitionedWriter, partition_of
from raykg.pipeline.tag import extract_mentions, tag_dataset
from raykg.pipeline.transcripts import read_transcripts

SF = "/root/testdata/sf0.001"
ONTO = [
    ("Engine", "spark", "tech"),
    ("Window", "window", "op"),
    ("AggRow", "agg row", "pattern"),
    ("Customer", "customer", "entity"),
]
ONTO_NOCAT = [(t, k) for t, k, _ in ONTO]


def sample_transcripts(n_blocks=1):
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "My keyword is here. Nothing else.", "tool": None, "lang": "en"},
        {"conv_id": "c0", "turn_idx": 1, "role": "assistant", "text": "no matches at all", "tool": "search", "lang": "en"},
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": None, "tool": None, "lang": "en"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "keyword and keyword again", "tool": "python", "lang": "en"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@pytest.mark.usefixtures("ray_session")
class TestTagging:
    def test_one_row_per_match_keeps_unmatched_rows(self):
        cfg = PipelineConfig(language="en", concurrency=1, batch_size=2)
        out = tag_dataset(sample_transcripts(), [("T", "keyword")], cfg).to_pandas()
        # c0t0 1 match, c0t1 no match (null row), c1t0 null text, c1t1 dedup -> 1
        assert len(out) == 4
        assert out.columns.tolist()[:6] == [
            "conv_id", "turn_idx", "role", "text", "tag", "tag_keyword"
        ]  # tag cols inserted right after text
        matched = out[out["tag"].notna()]
        assert len(matched) == 2
        assert set(matched["tag_keyword"]) == {"keyword"}

    def test_category_format(self):
        cfg = PipelineConfig(
            language="en", category_column="category", concurrency=1, batch_size=2
        )
        out = tag_dataset(
            sample_transcripts(), [("T", "keyword", "catA")], cfg
        ).to_pandas()
        assert "tag_category" in out.columns
        assert set(out["tag_category"].dropna()) == {"catA"}

    def test_one_row_per_doc_json(self):
        cfg = PipelineConfig(
            language="en", output_format="one_row_per_doc_json", concurrency=1
        )
        out = tag_dataset(sample_transcripts(), [("T", "keyword")], cfg).to_pandas()
        assert len(out) == 4
        val = json.loads(out[out["conv_id"] == "c1"].iloc[1]["tag_json_full"])
        assert val["T"]["count"] == 2

    def test_nblock_equals_1block(self):
        cfg = PipelineConfig(language="en", concurrency=2, batch_size=1)
        one = tag_dataset(sample_transcripts(1), ONTO_NOCAT, cfg).to_pandas()
        many = tag_dataset(sample_transcripts(4), ONTO_NOCAT, cfg).to_pandas()
        key = ["conv_id", "turn_idx", "tag", "tag_keyword"]
        a = one.sort_values(key).reset_index(drop=True)
        b = many.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[key], b[key])

    def test_multilingual_dispatch(self):
        rows = [
            {"conv_id": "c", "turn_idx": 0, "text": "the keyword here", "lang": "en"},
            {"conv_id": "c", "turn_idx": 1, "text": "le keyword ici", "lang": "fr"},
        ]
        cfg = PipelineConfig(
            language="language_column", language_column="lang", concurrency=1
        )
        out = tag_dataset(
            ray.data.from_pandas(pd.DataFrame(rows)), [("T", "keyword")], cfg
        ).to_pandas()
        assert out["tag"].notna().sum() == 2

    def test_mentions_table(self):
        cfg = PipelineConfig(language="en", concurrency=1)
        m = extract_mentions(sample_transcripts(), [("T", "keyword")], cfg).to_pandas()
        # c0t0 has 1, c1t1 has 2 occurrences (mentions are NOT deduped)
        assert len(m) == 3
        assert set(m.columns) == {
            "conv_id", "turn_idx", "sent_idx", "match_start", "match_end",
            "keyword", "tag", "category", "sentence",
        }


@pytest.mark.usefixtures("ray_session")
class TestGraph:
    def test_triples_structural_and_tagged(self):
        cfg = PipelineConfig(language="en", concurrency=1)
        t = extract_triples(sample_transcripts(), [("T", "keyword")], cfg).to_pandas()
        utters = t[t["pred"] == "utters"]
        tools = t[t["pred"] == "used_tool"]
        tagged = t[t["pred"] == "tagged_as"]
        assert len(utters) == 4
        assert set(tools["obj"]) == {"search", "python"}
        # tagged_as deduped per turn: c0t0 1, c1t1 1
        assert len(tagged) == 2
        assert set(tagged["obj"]) == {"concept:T"}
        assert set(tagged["subj"]) == {"c0#0#keyword", "c1#1#keyword"}

    def test_nodes_and_edges(self):
        from raykg.core.ontology import clean_ontology

        cfg = PipelineConfig(language="en", concurrency=1)
        triples = extract_triples(sample_transcripts(), [("T", "keyword")], cfg)
        edges = triples_to_edges(triples).to_pandas()
        assert {"src", "dst", "rel", "weight", "conv_id"} <= set(edges.columns)
        onto_rows = clean_ontology([("T", "keyword")], has_category=False)
        nodes = build_nodes(triples, onto_rows).to_pandas()
        by_type = nodes.groupby("node_type")["node_id"].count().to_dict()
        assert by_type == {
            "conversation": 2, "turn": 4, "tool": 2, "mention": 2, "concept": 1,
        }
        assert nodes["node_id"].is_unique

    def test_concept_scores(self):
        cfg = PipelineConfig(language="en", concurrency=1)
        m = extract_mentions(sample_transcripts(), [("T", "keyword")], cfg)
        s = concept_scores(m).to_pandas()
        assert len(s) == 1
        row = s.iloc[0]
        assert row["tag"] == "T" and row["concept_id"] == "concept:T"
        assert row["n_mentions"] == 3 and row["n_convs"] == 2


@pytest.mark.usefixtures("ray_session")
class TestPartitionedIO:
    def test_write_resume_roundtrip(self, tmp_path):
        cfg = PipelineConfig(language="en", concurrency=1)
        triples = extract_triples(read_transcripts(SF), ONTO, cfg)
        out = str(tmp_path / "edges")
        w = PartitionedWriter(out, num_partitions=8)
        summary = w.write(triples, key_column="conv_id")
        assert summary["rows"].sum() == triples.count()
        assert w.done_partitions() == set(summary["part"])
        # manifests carry lineage
        mf = json.load(open(w.manifest_path(int(summary["part"].iloc[0]))))
        assert mf["status"] == "complete" and mf["rows"] > 0 and mf["content_md5"]

        # simulate a partial failure: delete one partition's manifest+data
        victim = int(summary["part"].iloc[0])
        os.remove(w.manifest_path(victim))
        os.remove(os.path.join(out, f"part={victim:05d}", "data.parquet"))
        w2 = PartitionedWriter(out, num_partitions=8)
        assert victim not in w2.done_partitions()
        summary2 = w2.write(triples, key_column="conv_id")
        # only the victim partition was rewritten
        assert summary2["part"].tolist() == [victim]
        # resumed output equals single-shot output
        total = w2.read().count()
        assert total == triples.count()

    def test_partition_of_deterministic(self):
        assert partition_of("c123", 64) == partition_of("c123", 64)
        assert 0 <= partition_of("anything", 8) < 8

    def test_resume_keyed_by_fingerprint(self, tmp_path):
        # a partition completed under config A must NOT be skipped when
        # re-running under config B (would silently mix outputs)
        cfg = PipelineConfig(language="en", concurrency=1)
        triples = extract_triples(read_transcripts(SF), ONTO, cfg)
        out = str(tmp_path / "edges")
        w = PartitionedWriter(out, num_partitions=4)
        s1 = w.write(triples, key_column="conv_id", fingerprint="cfgA")
        assert w.done_partitions(fingerprint="cfgA") == set(s1["part"])
        assert w.done_partitions(fingerprint="cfgB") == set()
        # resume under the SAME fingerprint: nothing rewritten
        s2 = w.write(triples, key_column="conv_id", fingerprint="cfgA")
        assert len(s2) == 0
        # resume under a DIFFERENT fingerprint: everything recomputed
        s3 = w.write(triples, key_column="conv_id", fingerprint="cfgB")
        assert set(s3["part"]) == set(s1["part"])
        mf = json.load(open(w.manifest_path(int(s3["part"].iloc[0]))))
        assert mf["fingerprint"] == "cfgB"


@pytest.mark.usefixtures("ray_session")
def test_job_build_graph_and_resume(tmp_path):
    from raykg.job import build_graph
    from raykg.pipeline.config import PipelineConfig

    cfg = PipelineConfig(language="en", category_column="category", concurrency=2)
    out = str(tmp_path / "kg")
    transcripts = read_transcripts(SF)
    report = build_graph(transcripts, ONTO, cfg, out, num_partitions=4)
    assert set(report["tables"]) == {"edges", "mentions", "nodes", "concept_scores"}
    assert report["tables"]["edges"]["rows"] > 0
    # full resume: second run skips everything
    report2 = build_graph(transcripts, ONTO, cfg, out, num_partitions=4)
    assert report2["tables"]["edges"]["rows"] == 0
    # but the data on disk is intact
    import ray.data as rd

    total = rd.read_parquet(
        [str(p) for p in (tmp_path / "kg" / "edges").glob("part=*/data.parquet")]
    ).count()
    assert total == report["tables"]["edges"]["rows"]


def test_job_pagerank_table(tmp_path):
    from raykg.job import build_graph
    from raykg.pipeline.config import PipelineConfig

    cfg = PipelineConfig(language="en", category_column="category", concurrency=2)
    out = str(tmp_path / "kg")
    report = build_graph(
        read_transcripts(SF), ONTO, cfg, out, num_partitions=4,
        compute_pagerank=True,
    )
    assert report["tables"]["node_ranks"]["rows"] > 0
    import ray.data as rd

    ranks = rd.read_parquet(
        [str(p) for p in (tmp_path / "kg" / "node_ranks").glob("part=*/data.parquet")]
    ).to_pandas()
    assert {"node", "pr"}.issubset(ranks.columns)  # + the writer's part key
    assert abs(ranks["pr"].sum() - 1.0) < 1e-6  # mass conserved


def test_job_entity_ids_table(tmp_path):
    from raykg.job import build_graph
    from raykg.pipeline.config import PipelineConfig

    cfg = PipelineConfig(language="en", category_column="category", concurrency=2)
    out = str(tmp_path / "kg")
    report = build_graph(
        read_transcripts(SF), ONTO, cfg, out, num_partitions=4,
        compute_entity_ids=True,
    )
    n_nodes = report["tables"]["nodes"]["rows"]
    assert report["tables"]["entity_ids"]["rows"] == n_nodes
    import ray.data as rd

    ids = rd.read_parquet(
        [str(p) for p in (tmp_path / "kg" / "entity_ids").glob("part=*/data.parquet")]
    ).to_pandas()
    # dense 0..N-1 numbering, in node_id sort order
    assert sorted(ids["entity_id"]) == list(range(n_nodes))
    by_rank = ids.sort_values("entity_id")
    assert by_rank["node_id"].tolist() == sorted(ids["node_id"].tolist())


class TestJsonlIO:
    def test_jsonl_roundtrip(self, tmp_path, ray_session):
        import pandas as pd

        from raykg.pipeline.io import read_jsonl, write_jsonl

        df = pd.DataFrame(
            {
                "doc_id": [3, 1, 2],
                "text": ["héllo wörld", 'quote " and \\ backslash', ""],
                "n": [1.5, None, -2.0],
            }
        )
        ds = ray.data.from_pandas(df).repartition(2)
        out = tmp_path / "jsonl"
        assert write_jsonl(ds, str(out)) == 3
        shards = sorted(out.glob("shard-*.jsonl"))
        assert len(shards) >= 1 and not list(out.glob(".shard-*"))
        back = (
            read_jsonl([str(p) for p in shards])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = df.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(back[["doc_id", "text", "n"]], want, check_dtype=False)

    def test_jsonl_column_prune(self, tmp_path, ray_session):
        import pandas as pd

        from raykg.pipeline.io import read_jsonl, write_jsonl

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]})
        out = tmp_path / "jsonl2"
        write_jsonl(ray.data.from_pandas(df), str(out))
        back = read_jsonl(str(out), columns=["a", "b"]).to_pandas()
        assert sorted(back.columns) == ["a", "b"]
        assert len(back) == 2


class TestCsvIO:
    def test_csv_roundtrip(self, tmp_path, ray_session):
        import pandas as pd

        from raykg.pipeline.io import read_csv, write_csv

        df = pd.DataFrame(
            {
                "doc_id": [3, 1, 2],
                "text": ["héllo wörld", 'comma, and "quote"', "plain"],
                "n": [1.5, 0.25, -2.0],
            }
        )
        ds = ray.data.from_pandas(df).repartition(2)
        out = tmp_path / "csv"
        assert write_csv(ds, str(out)) == 3
        shards = sorted(out.glob("shard-*.csv"))
        assert len(shards) >= 1 and not list(out.glob(".shard-*"))
        back = (
            read_csv([str(p) for p in shards])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = df.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            back[["doc_id", "text", "n"]], want, check_dtype=False
        )

    def test_csv_column_prune(self, tmp_path, ray_session):
        import pandas as pd

        from raykg.pipeline.io import read_csv, write_csv

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]})
        out = tmp_path / "csv2"
        write_csv(ray.data.from_pandas(df), str(out))
        back = read_csv(str(out), columns=["a", "b"]).to_pandas()
        assert sorted(back.columns) == ["a", "b"]


class TestShardNameCollisions:
    def test_identical_blocks_both_written(self, tmp_path, ray_session):
        """Two byte-identical blocks must produce two shard files and the
        full row count — a pure content-addressed shard name silently
        collapsed them (round-2 advice)."""
        import pandas as pd

        from raykg.pipeline.io import read_jsonl, write_jsonl

        df = pd.DataFrame({"doc_id": [1, 2], "text": ["same", "rows"]})
        ds = ray.data.from_pandas(df).union(ray.data.from_pandas(df))
        out = tmp_path / "dupblocks"
        assert write_jsonl(ds, str(out)) == 4
        shards = sorted(out.glob("shard-*.jsonl"))
        assert len(shards) == 2
        # ordinal prefix differs, content hash suffix identical
        assert {p.name.split("-")[2] for p in shards} == {shards[0].name.split("-")[2]}
        back = read_jsonl([str(p) for p in shards]).to_pandas()
        assert len(back) == 4

    def test_csv_identical_blocks_both_written(self, tmp_path, ray_session):
        import pandas as pd

        from raykg.pipeline.io import read_csv, write_csv

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        ds = ray.data.from_pandas(df).union(ray.data.from_pandas(df))
        out = tmp_path / "dupcsv"
        assert write_csv(ds, str(out)) == 4
        assert len(sorted(out.glob("shard-*.csv"))) == 2
        assert len(read_csv(str(out)).to_pandas()) == 4


def test_triples_from_mentions_pinned_to_extract_triples(ray_session):
    """The job's one-matcher-pass edge derivation must emit exactly the
    triple set the direct TripleActor pass emits (row-set equality)."""
    import pandas as pd

    from raykg.pipeline.graph import extract_triples, triples_from_mentions
    from raykg.pipeline.queries import ONTOLOGY, _cfg
    from raykg.pipeline.tag import extract_mentions
    from raykg.pipeline.transcripts import read_transcripts

    sf = "/root/testdata/sf0.001"
    cfg = _cfg(category_column="category")
    ds = read_transcripts(sf)
    want = (
        extract_triples(ds, ONTOLOGY, cfg)
        .to_pandas()
        .sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    mentions = extract_mentions(ds, ONTOLOGY, cfg)
    got = (
        triples_from_mentions(mentions, ds)
        .to_pandas()
        .sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_update_graph_incremental_equals_rebuild(tmp_path, ray_session):
    """Incremental maintenance: change one conversation, delete another,
    add a third — update_graph recomputes only their hash partitions and
    the final tables row-set-equal a from-scratch build on the new input."""
    import pandas as pd

    from raykg.job import build_graph, update_graph
    from raykg.pipeline.queries import ONTOLOGY, _cfg
    from raykg.pipeline.transcripts import read_transcripts

    cfg = _cfg(category_column="category")
    base = read_transcripts("/root/testdata/sf0.001").to_pandas()
    convs = sorted(base["conv_id"].unique())
    changed, deleted, added = convs[0], convs[1], "conv_brand_new"

    cur = base[base["conv_id"] != deleted].copy()
    cur.loc[cur["conv_id"] == changed, "text"] = "customer replied to customer"
    new_rows = base[base["conv_id"] == convs[2]].copy()
    new_rows["conv_id"] = added
    cur = pd.concat([cur, new_rows], ignore_index=True)

    out_inc = tmp_path / "inc"
    out_full = tmp_path / "full"
    build_graph(ray.data.from_pandas(base), ONTOLOGY, cfg, str(out_inc),
                num_partitions=8)
    rep = update_graph(ray.data.from_pandas(cur), ONTOLOGY, cfg, str(out_inc),
                       [changed, deleted, added], num_partitions=8)
    assert 1 <= len(rep["updated_partitions"]) <= 3
    build_graph(ray.data.from_pandas(cur), ONTOLOGY, cfg, str(out_full),
                num_partitions=8)

    from raykg.pipeline.io import PartitionedWriter

    for tab, parts, key in (("mentions", 8, "conv_id"), ("edges", 8, "conv_id"),
                            ("nodes", 2, "node_id"), ("concept_scores", 1, "tag")):
        a = (PartitionedWriter(str(out_inc / tab), parts).read().to_pandas())
        b = (PartitionedWriter(str(out_full / tab), parts).read().to_pandas())
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, obj=tab)


def test_refresh_recomputes_only_target_partitions(tmp_path, ray_session):
    import glob
    import json as _json

    import pandas as pd

    from raykg.ops.hashing import partition_of
    from raykg.pipeline.io import PartitionedWriter

    df = pd.DataFrame({"k": [f"key{i}" for i in range(40)],
                       "v": list(range(40))})
    w = PartitionedWriter(str(tmp_path / "t"), 4)
    w.write(ray.data.from_pandas(df), key_column="k")
    md5s = {p: _json.load(open(m))["content_md5"]
            for p, m in enumerate(sorted(glob.glob(str(tmp_path / "t/part=*/manifest.json"))))}

    # keys of partition 2 get new values; other partitions' files must not move
    target = 2
    df2 = df.copy()
    mask = df2["k"].map(lambda k: partition_of(k, 4)) == target
    assert mask.any()
    df2.loc[mask, "v"] += 1000
    w.refresh(ray.data.from_pandas(df2), "k", [target])
    for p, m in enumerate(sorted(glob.glob(str(tmp_path / "t/part=*/manifest.json")))):
        new = _json.load(open(m))["content_md5"]
        assert (new != md5s[p]) == (p == target), p
    back = w.read().to_pandas().sort_values("k").reset_index(drop=True)
    want = df2.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["k", "v"]], want, check_dtype=False)

    # delete EVERY key of partition 2: it must become complete-and-empty
    df3 = df2[~mask]
    w.refresh(ray.data.from_pandas(df3), "k", [target])
    man = _json.load(open(w.manifest_path(target)))
    assert man["status"] == "complete" and man["rows"] == 0
    assert w.read().to_pandas()["k"].map(
        lambda k: partition_of(k, 4)
    ).ne(target).all()


def test_mention_context_first_occurrence_orders_by_sentence(
    tmp_path, ray_session
):
    """q_mention_context must pick the turn's TRUE first occurrence:
    mention offsets are sentence-relative, so a later sentence with a
    smaller within-sentence offset must not win over an earlier
    sentence's match (order by (sent_idx, match_start))."""
    import pyarrow.parquet as pq

    from raykg.pipeline.queries import q_mention_context

    # doc 0 -> conv c0 turn 0; two sentences, both contain "spark":
    # sentence 0 at offset 8, sentence 1 at offset 0.
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": ["We love spark here today. spark rules the cluster."],
                "lang": ["en"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_mention_context(str(tmp_path)).to_pandas()
    row = out[out["keyword"] == "spark"]
    assert len(row) == 1
    # the ctx window is sliced from the FIRST sentence containing the
    # keyword, not the later sentence whose within-sentence offset is 0
    assert "We love spark" in row["ctx"].iloc[0]
    assert "rules" not in row["ctx"].iloc[0]


def test_prep_corpus_job_resume_and_decontam(ray_session, tmp_path):
    """The LLM prep chain as a resumable job: filter -> dedup -> decontam
    -> pack with per-stage manifests.  A finished run re-skips entirely;
    a partially-invalidated kept stage recomputes only its missing
    partitions; decontam drops exactly the planted overlap."""
    import json

    import pyarrow as pa
    import ray.data

    from raykg.job import build_prep_corpus
    from raykg.pipeline.io import PartitionedWriter
    from raykg.pipeline.transcripts import read_documents_scaled

    out = str(tmp_path / "prep")
    docs = read_documents_scaled("/root/testdata/sf0.001", 2, salt_vocab=True)
    r1 = build_prep_corpus(docs, out, num_partitions=4)
    assert r1["tables"]["kept"]["rows"] > 0
    assert 0 < r1["tables"]["canonical"]["rows"] <= r1["tables"]["kept"]["rows"]
    assert r1["tables"]["packed"]["rows"] == r1["tables"]["canonical"]["rows"]

    # full resume: identical report, no recompute
    docs2 = read_documents_scaled("/root/testdata/sf0.001", 2, salt_vocab=True)
    r2 = build_prep_corpus(docs2, out, num_partitions=4)
    assert r2["tables"] == r1["tables"]

    # partial resume of the filter stage: invalidate one partition,
    # re-run, rows must come back exactly
    w_kept = PartitionedWriter(out + "/kept", 4)
    w_kept.invalidate([1])
    docs3 = read_documents_scaled("/root/testdata/sf0.001", 2, salt_vocab=True)
    r3 = build_prep_corpus(docs3, out, num_partitions=4)
    assert r3["tables"]["kept"]["rows"] == r1["tables"]["kept"]["rows"]

    # decontam: plant a test set that shares a 13-gram with some kept doc
    kept_texts = (
        PartitionedWriter(out + "/kept", 4).read().take(5)
    )
    long_docs = [r["text"] for r in kept_texts if len(r["text"].split()) >= 13]
    if long_docs:
        testset = ray.data.from_arrow(
            pa.table({"text": [long_docs[0]]})
        )
        out2 = str(tmp_path / "prep_clean")
        docs4 = read_documents_scaled("/root/testdata/sf0.001", 2, salt_vocab=True)
        r4 = build_prep_corpus(
            docs4, out2, num_partitions=4, testset=testset
        )
        assert r4["tables"]["clean"]["rows"] < r4["tables"]["canonical"]["rows"]
        assert r4["tables"]["packed"]["rows"] == r4["tables"]["clean"]["rows"]


def test_prep_cli_end_to_end(tmp_path):
    """`python -m raykg.job --prep` as the driver would run it: a
    subprocess with its own Ray session, JSON report on stdout."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "prep_cli")
    r = subprocess.run(
        [
            sys.executable, "-m", "raykg.job", "--prep",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out, "--num-partitions", "4", "--num-cpus", "4",
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["tables"]["kept"]["rows"] > 0
    assert report["tables"]["packed"]["rows"] == report["tables"]["canonical"]["rows"]
