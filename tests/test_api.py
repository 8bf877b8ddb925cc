"""Public API surface: OntologyTagPipeline, language pre-flight, schema
writer, canonical ordering, salted conversation stats, lemma mode on Ray."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray
import ray.data

from raykg.pipeline.api import (
    OntologyTagPipeline,
    distinct_languages,
    ordered,
    write_with_schema,
)
from raykg.pipeline.config import PipelineConfig
from raykg.pipeline.graph import conversation_stats
from raykg.pipeline.tag import extract_mentions


def ds_of(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


@pytest.mark.usefixtures("ray_session")
class TestApi:
    def test_pipeline_class_and_descriptions(self):
        cfg = PipelineConfig(language="en", category_column="category", concurrency=1)
        pipe = OntologyTagPipeline(cfg, [("T", "keyword", "catA")])
        assert pipe.column_descriptions["tag"] == "Assigned tag"
        ds = ds_of(
            [{"conv_id": "c", "turn_idx": 0, "text": "a keyword", "lang": "en"}]
        )
        assert pipe.validate_input(ds) == ["en"]
        out = pipe.run(ds).to_pandas()
        assert out["tag"].tolist() == ["T"]

    def test_pipeline_doc_category_descriptions(self):
        cfg = PipelineConfig(
            language="en",
            category_column="category",
            output_format="one_row_per_doc",
            concurrency=1,
        )
        pipe = OntologyTagPipeline(cfg, [("T", "kw", "Politics")])
        assert pipe.column_descriptions["tag_list_Politics"] == "List of 'Politics' tags"

    def test_validate_missing_column(self):
        cfg = PipelineConfig(language="en", concurrency=1)
        pipe = OntologyTagPipeline(cfg, [("T", "kw")])
        with pytest.raises(ValueError, match="text column"):
            pipe.validate_input(ds_of([{"conv_id": "c", "body": "x"}]))

    def test_distinct_languages_rejects_unsupported(self):
        ds = ds_of([{"text": "x", "lang": "en"}, {"text": "y", "lang": "xx"}])
        with pytest.raises(Exception, match="xx"):
            distinct_languages(ds, "lang")

    def test_ordered(self):
        ds = ds_of(
            [
                {"conv_id": "c1", "turn_idx": 1, "text": "b"},
                {"conv_id": "c0", "turn_idx": 0, "text": "a"},
                {"conv_id": "c0", "turn_idx": 1, "text": "c"},
            ]
        )
        out = ordered(ds).to_pandas()
        assert list(zip(out["conv_id"], out["turn_idx"])) == [
            ("c0", 0), ("c0", 1), ("c1", 1),
        ]

    def test_write_with_schema(self, tmp_path):
        ds = ds_of([{"text": "x", "tag": "T"}])
        out = str(tmp_path / "out")
        write_with_schema(ds, out, {"tag": "Assigned tag"})
        import glob

        f = glob.glob(f"{out}/*.parquet")[0]
        schema = pq.read_schema(f)
        field = schema.field("tag")
        assert field.metadata[b"description"] == b"Assigned tag"

    def test_lemma_mode_on_ray(self):
        cfg = PipelineConfig(language="en", lemmatization=True, concurrency=1)
        pipe = OntologyTagPipeline(cfg, [("WORK", "worked")])
        out = pipe.run(
            ds_of([{"conv_id": "c", "turn_idx": 0, "text": "She was working late"}])
        ).to_pandas()
        assert out["tag"].tolist() == ["WORK"]
        assert out["tag_keyword"].tolist() == ["working"]


@pytest.mark.usefixtures("ray_session")
class TestConversationStats:
    def test_salted_reduce_matches_naive(self):
        # one hot conversation (many turns) + normal ones
        rows = []
        for t in range(50):
            rows.append(
                {"conv_id": "hot", "turn_idx": t, "text": "keyword here keyword"}
            )
        rows.append({"conv_id": "cold", "turn_idx": 0, "text": "a keyword"})
        cfg = PipelineConfig(language="en", concurrency=1, batch_size=16)
        m = extract_mentions(ds_of(rows), [("T", "keyword")], cfg)
        out = (
            conversation_stats(m, salt_buckets=4)
            .to_pandas()
            .set_index("conv_id")
            .sort_index()
        )
        assert out.loc["hot", "n_mentions"] == 100
        assert out.loc["hot", "n_turns"] == 50
        assert out.loc["hot", "n_tags"] == 1
        assert out.loc["cold", "n_mentions"] == 1
