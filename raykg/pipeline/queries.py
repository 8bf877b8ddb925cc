"""The engine's query surface: one callable per operator/pipeline from
SURVEY.md §2 plus the training-data ops, each taking ``sf_dir`` and paired
(where SQL-expressible) with a DuckDB oracle over the same parquet tables.

Column names match between the Ray result and the oracle SQL exactly — the
driver's correctness gate sorts columns by name and value-hashes.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count

from .config import PipelineConfig
from .graph import build_nodes, concept_scores, extract_triples, triples_to_edges
from .tag import extract_mentions, tag_dataset
from .transcripts import TRANSCRIPTS_SQL, read_transcripts
from ..core.ontology import clean_ontology
from ..ops import dedup as dedup_ops
from ..ops import multimodal as mm_ops
from ..ops import similarity as sim_ops
from ..ops import text as text_ops

# The benchmark/correctness ontology: keywords from the corpus vocabulary,
# chosen so no two keywords share a token (category longest-match == all
# matches) and no keyword self-overlaps (token-scan count == non-overlapping
# regex count, verified in tests).
ONTOLOGY = [
    ("Engine", "spark", "tech"),
    ("Windowing", "window", "op"),
    ("AggRow", "agg row", "pattern"),
    ("BigData", "big data", "buzz"),
    ("Customer", "customer", "entity"),
    ("FastMerge", "fast merge", "pattern"),
]

ONTOLOGY_SQL_VALUES = ", ".join(
    f"('{t}', '{k}', '{c}')" for t, k, c in ONTOLOGY
)
_ONTO_CTE = f"onto(tag, keyword, category) AS (VALUES {ONTOLOGY_SQL_VALUES})"
_T_CTE = f"t AS ({TRANSCRIPTS_SQL})"
# per-(turn, keyword) occurrence counts — the SQL mirror of the matcher on
# this corpus (single-sentence turns, space-separated tokens)
_OCC_CTE = (
    "occ AS (SELECT t.conv_id, t.turn_idx, onto.tag, onto.category, onto.keyword, "
    "len(regexp_extract_all(t.text, '\\b' || onto.keyword || '\\b')) AS n_matches "
    "FROM t, onto "
    "WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b'))"
)


def _cfg(**kw) -> PipelineConfig:
    defaults = dict(language="en", concurrency=None, batch_size=1024)
    defaults.update(kw)
    return PipelineConfig(**defaults)


# --- KG pipeline queries ---------------------------------------------------

def q_transcripts(sf_dir: str):
    return read_transcripts(sf_dir)


def q_tag_match(sf_dir: str):
    """one_row_per_match with categories over the derived transcripts."""
    ds = read_transcripts(sf_dir)
    return tag_dataset(ds, ONTOLOGY, _cfg(category_column="category"))


def q_tag_doc(sf_dir: str):
    ds = read_transcripts(sf_dir)
    return tag_dataset(
        ds, ONTOLOGY, _cfg(category_column="category", output_format="one_row_per_doc")
    )


def q_tag_doc_json(sf_dir: str):
    ds = read_transcripts(sf_dir)
    return tag_dataset(
        ds, ONTOLOGY,
        _cfg(category_column="category", output_format="one_row_per_doc_json"),
    )


def _mentions(sf_dir: str):
    # no-category mode: all matches (PhraseMatcher semantics)
    return extract_mentions(read_transcripts(sf_dir), ONTOLOGY, _cfg())


def q_mention_counts(sf_dir: str):
    """(conv_id, turn_idx, tag, keyword, n_matches) occurrence counts —
    computed inside the mention actor (turn-local), zero shuffle."""
    from .tag import extract_mention_counts

    return extract_mention_counts(read_transcripts(sf_dir), ONTOLOGY, _cfg())


def q_concept_scores(sf_dir: str):
    # feed the per-turn pre-counted table: the shuffle moves one row per
    # (turn, keyword) instead of one per occurrence
    from .tag import extract_mention_counts

    counts = extract_mention_counts(read_transcripts(sf_dir), ONTOLOGY, _cfg())
    return concept_scores(counts, count_column="n_matches")


def q_triples(sf_dir: str):
    return extract_triples(
        read_transcripts(sf_dir), ONTOLOGY, _cfg(category_column="category")
    )


def q_edges(sf_dir: str):
    return triples_to_edges(q_triples(sf_dir))


def q_nodes(sf_dir: str):
    onto_rows = clean_ontology(ONTOLOGY, has_category=True)
    return build_nodes(q_triples(sf_dir), onto_rows)


def q_pagerank(sf_dir: str):
    """PageRank over the KG edge table (3 fixed iterations, damping 0.85)
    — the iterative two-exchange-per-step loop in `ops/pagerank.py`;
    ranks rounded to 8 decimals for the hash compare (values are
    O(1/n_nodes), so 4 decimals would collapse them)."""
    from ..ops.pagerank import pagerank

    pr = pagerank(q_edges(sf_dir), damping=0.85, iters=3, num_shards=16)

    def round8(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"node": batch["node"], "pr": pc.round(batch["pr"], 8)})

    return pr.map_batches(round8, batch_format="pyarrow")


PPR_SEEDS = ["concept:Engine", "concept:Customer"]


def q_part_scc(sf_dir: str):
    """Strongly connected components of a directed part->supplier modular
    graph (one dense cycle cluster + singleton chains) —
    `ops/scc.strongly_connected_components`, FW-BW-MIN coloring with
    BSP min-label propagation per direction and loud peel/iteration
    caps."""
    from ..ops.scc import strongly_connected_components

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_linenumber"],
    )

    def mod_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_linenumber"] == 1]
        return pd.DataFrame(
            {
                "src": (df["l_partkey"] % 997).to_numpy(dtype=np.int64),
                "dst": (df["l_suppkey"] * 7 % 997).to_numpy(dtype=np.int64),
            }
        )

    return strongly_connected_components(
        li.map_batches(mod_edges, batch_format="pandas"),
        num_shards=16,
        num_buckets=8,
    )


def q_scc_dag_depth(sf_dir: str):
    """Layer count of the SCC condensation: collapse the part->supplier
    digraph's cycles (`ops/scc`), project edges onto SCC ids
    (`condensation_edges`, broadcast relabel under the label gate), and
    relax longest-path depth over the DAG (`dag_depth`, level-
    synchronous max+1 with a loud cycle cap)."""
    from ..ops.scc import condensation_edges, dag_depth

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_linenumber"],
    )

    def mod_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_linenumber"] == 1]
        return pd.DataFrame(
            {
                "src": (df["l_partkey"] % 997).to_numpy(dtype=np.int64),
                "dst": (df["l_suppkey"] * 7 % 997).to_numpy(dtype=np.int64),
            }
        )

    edges = li.map_batches(mod_edges, batch_format="pandas").materialize()
    labels = q_part_scc(sf_dir)
    ce = condensation_edges(edges, labels, num_shards=16, num_buckets=8)
    d = dag_depth(ce, num_shards=16, num_buckets=8)
    return pa.table({"depth": pa.array([d], type=pa.int64())})


def q_part_truss(sf_dir: str):
    """4-truss of the undirected part-supplier modular graph: the
    maximal subgraph where every edge closes >= 2 triangles — the
    cohesive-core extractor one tier above `part_kcore`.
    `ops/triangles.ktruss`: per peel round, degree-ordered wedges close
    in place against the broadcast packed edge keys, each triangle
    feeds +1 support to its three edges through one src-sharded + one
    edge-sharded exchange; strictly-decreasing edge count is the
    convergence witness."""
    from ..ops.triangles import ktruss

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_linenumber"],
    )

    def mod_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_linenumber"] == 1]
        return pd.DataFrame(
            {
                "u": (df["l_partkey"] % 997).to_numpy(dtype=np.int64),
                "v": (df["l_suppkey"] * 7 % 997).to_numpy(dtype=np.int64),
            }
        )

    return ktruss(
        li.map_batches(mod_edges, batch_format="pandas"),
        k=4,
        num_shards=16,
        max_rounds=25,
    )


def _truss_sql(rounds: int = 14, need: int = 2) -> str:
    """Unrolled truss-peel mirror: per round, each edge's support is its
    endpoints' common-neighbor count in the SURVIVING graph; fixpoint is
    reached within ``rounds`` at both test scales (engine measured <= 12
    at sf0.01), so the last unrolled step equals the engine's converged
    set."""
    parts = [
        """
    WITH e0 AS MATERIALIZED (SELECT DISTINCT
                    least(l_partkey % 997, l_suppkey * 7 % 997) AS u,
                    greatest(l_partkey % 997, l_suppkey * 7 % 997) AS v
                FROM lineitem
                WHERE l_linenumber = 1
                  AND (l_partkey % 997) <> (l_suppkey * 7 % 997))"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
    a{i} AS MATERIALIZED (SELECT u AS x, v AS y FROM e{i}
             UNION ALL SELECT v, u FROM e{i}),
    e{i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e{i} e
                 WHERE (SELECT COUNT(*) FROM a{i} p JOIN a{i} q
                        ON p.y = q.y
                        WHERE p.x = e.u AND q.x = e.v) >= {need})"""
        )
    parts.append(f"\n    SELECT u, v FROM e{rounds}")
    return "".join(parts)


KWIC_WINDOW = 24


def q_wl_classes(sf_dir: str):
    """Structural-equivalence classes from the 2-round WL colors: class
    sizes plus the candidate-pair count C(n,2) a structural entity-
    canonicalizer would verify — a bounded per-color fold over
    `ops/wl.wl_refine` (class count <= node count; pairs never
    enumerate)."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.wl import wl_refine

    colors = wl_refine(q_edges(sf_dir), rounds=2, num_shards=16)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("wl_color", sort=False).size()
        n = g.to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "wl_color": g.index.to_numpy(),
                "n_nodes": n,
                "n_pairs": n * (n - 1) // 2,
            }
        )

    out = sharded_groupby_apply(colors, ["wl_color"], fold, num_shards=16)

    def typed(df):
        return pa.table(
            {
                "wl_color": pa.array(df["wl_color"], type=pa.string()),
                "n_nodes": pa.array(df["n_nodes"].to_numpy(), type=pa.int64()),
                "n_pairs": pa.array(df["n_pairs"].to_numpy(), type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_mention_context(sf_dir: str):
    """KWIC / entity-context extraction: a +-24-char window around the
    FIRST occurrence of each (turn, keyword) — the context snippet an
    entity-linking trainer consumes.  Mention offsets are relative to the
    normalized SENTENCE (`core/ontology.py` emits per-sentence spans), so
    "first in the turn" orders by (sent_idx, match_start) — match_start
    alone would pick the smallest within-sentence offset, possibly from a
    later sentence.  The ctx window is sliced from that sentence (the
    documented semantics; the oracle's raw-text slice coincides because
    the derived corpus is single-sentence-per-turn).  Per-batch first-
    occurrence pre-agg bounds the one (conv, turn, keyword)-sharded
    exchange to distinct mention keys; the slice is a bounded per-key
    kernel."""
    from ..ops.agg import sharded_groupby_apply

    mentions = _mentions(sf_dir)
    w = KWIC_WINDOW

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sent_idx", "match_start"], kind="stable")
        return df.drop_duplicates(["conv_id", "turn_idx", "keyword"])[
            ["conv_id", "turn_idx", "keyword", "sent_idx", "match_start",
             "match_end", "sentence"]
        ]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = pre(df)
        ctx = [
            s[max(0, a - w): b + w]
            for s, a, b in zip(
                df["sentence"], df["match_start"], df["match_end"]
            )
        ]
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "turn_idx": df["turn_idx"].to_numpy().astype("int32"),
                "keyword": df["keyword"].to_numpy(),
                "ctx": ctx,
            }
        )

    return sharded_groupby_apply(
        mentions.map_batches(pre, batch_format="pandas"),
        ["conv_id", "turn_idx", "keyword"],
        fold,
        num_shards=16,
    )


def q_conv_dot(sf_dir: str):
    """KG export: one Graphviz DOT digraph per conversation (its
    distinct edges, sorted — byte-deterministic like the JSON export
    formats) — a conv-sharded string fold over the edge table; every
    edge's conversation is derivable from its src id, so no join."""
    from ..ops.agg import sharded_groupby_apply

    e = q_edges(sf_dir).select_columns(["src", "dst"])

    def with_conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"])
        df["conv_id"] = df["src"].str.split("#").str[0]
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"]).sort_values(
            ["conv_id", "src", "dst"], kind="stable"
        )
        out_conv, out_dot = [], []
        for conv, g in df.groupby("conv_id", sort=False):
            lines = "".join(
                f'  "{s}" -> "{d}";\n'
                for s, d in zip(g["src"], g["dst"])
            )
            out_conv.append(conv)
            out_dot.append("digraph {\n" + lines + "}")
        return pd.DataFrame({"conv_id": out_conv, "dot": out_dot})

    return sharded_groupby_apply(
        e.map_batches(with_conv, batch_format="pandas"),
        ["conv_id"],
        fold,
        num_shards=16,
    )


def q_kg_katz(sf_dir: str):
    """Katz centrality over the directed KG edge table as exact scaled
    integers (beta=1/4, paths up to length 3) — `ops/hits.katz_path_scores`;
    one broadcast + one node-sharded fold per length step."""
    from ..ops.hits import katz_path_scores

    e = q_edges(sf_dir).select_columns(["src", "dst"])
    return katz_path_scores(e, iters=3, base=4, num_shards=16)


def q_wl_colors(sf_dir: str):
    """Weisfeiler-Lehman color refinement (2 rounds) over the KG edge
    table: structural node signatures for entity canonicalization —
    `ops/wl.wl_refine`, one label-attach (broadcast under threshold) +
    one node-sharded sorted-multiset fold per round."""
    from ..ops.wl import wl_refine

    return wl_refine(q_edges(sf_dir), rounds=2, num_shards=16)


def q_ppr(sf_dir: str):
    """Personalized PageRank from two concept seeds over the same KG edge
    table (3 iterations, damping 0.85): teleport, dangling mass and the
    initial ranks all concentrate on the seed set, so ranks measure
    proximity to the seeds — `ops/pagerank.pagerank(seeds=...)`; the
    query-sized seed set rides in closures, never shuffled."""
    from ..ops.pagerank import pagerank

    pr = pagerank(
        q_edges(sf_dir), damping=0.85, iters=3, num_shards=16, seeds=PPR_SEEDS
    )

    def round8(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"node": batch["node"], "pr": pc.round(batch["pr"], 8)})

    return pr.map_batches(round8, batch_format="pyarrow")


def q_profile(sf_dir: str):
    """Column profile of the documents table (counts / nulls / exact
    distinct / lexicographic extremes) — `ops/profile.py`; reads only the
    profiled columns."""
    from ..ops.profile import profile_columns

    cols = ["doc_id", "lang", "source"]
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return profile_columns(ds, cols, num_shards=16)


CHUNK_SIZE, CHUNK_OVERLAP = 64, 16


def q_chunk_docs(sf_dir: str):
    """Context-window chunking of the documents table (64-token windows,
    16-token overlap) — stateless flat-map, no exchange (`ops/chunk.py`)."""
    from ..ops.chunk import chunk_documents

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(ds, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)


BM25_TERMS = ["customer", "vector", "stream"]
BM25_K = 10


def q_bm25(sf_dir: str):
    """BM25 lexical retrieval over the documents table — `ops/bm25.py`
    with the rational-idf scoring (engine-exact arithmetic; see module
    docstring)."""
    from ..ops.bm25 import bm25_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_topk(ds, BM25_TERMS, k=BM25_K, num_shards=16)


def q_co_mentions(sf_dir: str):
    """Concept-concept co-mention edges (tags sharing a turn) —
    `ops/comention.py` over the mentions long table."""
    from ..ops.comention import co_mention_edges

    return co_mention_edges(_mentions(sf_dir), num_shards=16)


def q_kg_butterflies(sf_dir: str):
    """Butterfly (2x2 biclique) count of the bipartite turn-concept
    graph — the bipartite motif behind KG density/quality audits.  Each
    concept pair co-supported by c turns contributes C(c, 2)
    butterflies, so the count folds from the co-mention pair table
    (`ops/comention.py`) with one scalar reduce: no 4-node enumeration
    ever materializes."""
    from ..ops.comention import co_mention_edges

    pairs = co_mention_edges(_mentions(sf_dir), num_shards=16)

    def choose2(batch: pa.Table) -> pa.Table:
        c = batch["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"b": pa.array(c * (c - 1) // 2, type=pa.int64())}
        )

    total = pairs.map_batches(choose2, batch_format="pyarrow").sum("b") or 0
    return pa.table({"butterflies": pa.array([int(total)], type=pa.int64())})


def q_co_mentions_adj(sf_dir: str):
    """Concept co-occurrence across SLIDING 2-turn windows: tags
    mentioned within one turn of each other count together (question in
    turn t, answer entity in t+1).  Each mention row expands to its two
    covering windows (a stateless map), then the SAME turn-local pair
    machinery (`ops/comention.py`) runs with the window id as the group
    key — no new exchange shape."""
    from ..ops.comention import co_mention_edges

    m = _mentions(sf_dir)

    def expand(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].combine_chunks()
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(
            np.int32
        )
        tag = batch["tag"].combine_chunks()
        return pa.table(
            {
                "conv_id": pa.chunked_array([conv, conv]),
                "turn_idx": pa.array(
                    np.concatenate([turn, turn - 1]), type=pa.int32()
                ),
                "tag": pa.chunked_array([tag, tag]),
            }
        )

    pairs = co_mention_edges(
        m.map_batches(expand, batch_format="pyarrow"), num_shards=16
    )
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "tag_a": b["tag_a"],
                "tag_b": b["tag_b"],
                "n_windows": b["n_turns"],
            }
        ),
        batch_format="pyarrow",
    )


def q_hub_nodes(sf_dir: str):
    """Top-10 hub nodes by out-degree over distinct KG edges — sharded
    degree count + per-block partial top-10 + one tiny final reduce
    (`ops/topk.global_topk`; no global sort of the node-degree table);
    ties broken by node id."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.setops import distinct_rows
    from ..ops.topk import global_topk

    e = distinct_rows(
        q_edges(sf_dir).select_columns(["src", "dst"]), ["src", "dst"], num_shards=16
    )

    def count_out(df):
        import pandas as pd

        g = df.groupby("src", sort=False, as_index=False).size()
        return g.rename(columns={"size": "out_degree"})

    deg = sharded_groupby_apply(e, ["src"], count_out, num_shards=16)

    def typed(df):
        return pa.table(
            {
                "src": pa.array(df["src"], type=pa.string()),
                "out_degree": pa.array(df["out_degree"], type=pa.int64()),
            }
        )

    return global_topk(
        deg.map_batches(typed, batch_format="pandas"),
        "out_degree",
        k=10,
        descending=True,
        tiebreak=["src"],
    )


def q_suppliers_by_region(sf_dir: str):
    """Star-schema rollup: suppliers enriched through two chained
    broadcast dimension joins (nation, region — the canonical pattern for
    small dims at corpus scale), per-batch pre-aggregated, then a tiny
    5-group reduce."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from ..ops.agg import sharded_groupby_apply
    from ..ops.join import broadcast_join

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).rename_columns(["s_nationkey", "n_regionkey"])
    reg = pq_mod.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).rename_columns(["n_regionkey", "r_name"])
    joined = broadcast_join(
        broadcast_join(sup, nat, on="s_nationkey", how="left"),
        reg,
        on="n_regionkey",
        how="left",
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table(
            {"r_name": batch["r_name"], "bal": batch["s_acctbal"]}
        ).to_pandas()
        g = df.groupby("r_name", sort=False).agg(
            n_suppliers=("bal", "size"), total_acctbal=("bal", "sum")
        )
        return pa.table(
            {
                "r_name": pa.array(g.index, type=pa.string()),
                "n_suppliers": pa.array(g["n_suppliers"], type=pa.int64()),
                "total_acctbal": pa.array(g["total_acctbal"], type=pa.float64()),
            }
        )

    def reduce_regions(df):
        g = df.groupby("r_name", sort=False, as_index=False).sum()
        return g

    out = sharded_groupby_apply(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["r_name"],
        reduce_regions,
        num_shards=4,
    )

    def finish(df) -> pa.Table:
        return pa.table(
            {
                "r_name": pa.array(df["r_name"], type=pa.string()),
                "n_suppliers": pa.array(df["n_suppliers"], type=pa.int64()),
                "total_acctbal": pc.round(
                    pa.array(df["total_acctbal"], type=pa.float64()), 4
                ),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def q_part_brands(sf_dir: str):
    """Per-brand part stats (count, avg retail price, max size) — pruned
    scan + per-batch pre-agg + sharded reduce; avg carried as (sum, n)
    partials so the reduce stays associative."""
    import pyarrow.compute as pc

    from ..ops.agg import sharded_groupby_apply

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_retailprice", "p_size"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # exact integer cents: float sums are order-sensitive and a value
        # on a round() boundary would diverge from the SQL mirror
        cents = pc.cast(
            pc.round(pc.multiply(batch["p_retailprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        df = batch.set_column(
            batch.schema.get_field_index("p_retailprice"), "cents", cents
        ).to_pandas()
        g = df.groupby("p_brand", sort=False).agg(
            n_parts=("cents", "size"),
            sum_cents=("cents", "sum"),
            max_size=("p_size", "max"),
        )
        return pa.table(
            {
                "p_brand": pa.array(g.index, type=pa.string()),
                "n_parts": pa.array(g["n_parts"], type=pa.int64()),
                "sum_cents": pa.array(g["sum_cents"], type=pa.int64()),
                "max_size": pa.array(g["max_size"], type=pa.int64()),
            }
        )

    def reduce_brands(df):
        return df.groupby("p_brand", sort=False, as_index=False).agg(
            n_parts=("n_parts", "sum"),
            sum_cents=("sum_cents", "sum"),
            max_size=("max_size", "max"),
        )

    out = sharded_groupby_apply(
        parts.map_batches(partial, batch_format="pyarrow"),
        ["p_brand"],
        reduce_brands,
        num_shards=8,
    )

    def finish(df) -> pa.Table:
        import numpy as np

        # integer round-half-up at 1e-4 dollars: engine round() kernels
        # disagree on the nearest double at boundary values (observed:
        # Arrow 908.1600000000001 vs DuckDB 908.16), so the rounding is
        # done in exact int64 arithmetic and divided once
        n = df["n_parts"].to_numpy(dtype=np.int64)
        s = df["sum_cents"].to_numpy(dtype=np.int64)
        scaled = (200 * s + n) // (2 * n)
        return pa.table(
            {
                "p_brand": pa.array(df["p_brand"], type=pa.string()),
                "n_parts": pa.array(df["n_parts"], type=pa.int64()),
                "avg_price": pa.array(scaled / 10000.0, type=pa.float64()),
                "max_size": pa.array(df["max_size"], type=pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def q_concept_rank(sf_dir: str):
    """Weighted PageRank over the symmetrized concept co-mention graph
    (edge weight = co-occurrence turn count) — concept centrality."""
    from ..ops.comention import co_mention_edges
    from ..ops.pagerank import pagerank

    cm = co_mention_edges(_mentions(sf_dir), num_shards=16)

    def symmetrize(df) -> pa.Table:
        import numpy as np

        a = df["tag_a"].to_numpy()
        b = df["tag_b"].to_numpy()
        w = df["n_turns"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.string()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.string()),
                "w": pa.array(np.concatenate([w, w]), type=pa.float64()),
            }
        )

    edges = cm.map_batches(symmetrize, batch_format="pandas")
    pr = pagerank(edges, weight_column="w", damping=0.85, iters=3, num_shards=8)

    def round8(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"node": batch["node"], "pr": pc.round(batch["pr"], 8)})

    return pr.map_batches(round8, batch_format="pyarrow")


def q_doc_tags(sf_dir: str):
    """Per matched turn: sorted distinct tag/keyword rollup — computed
    inside the mention actor (turn-local), zero shuffle."""
    from .tag import extract_doc_tags

    return extract_doc_tags(read_transcripts(sf_dir), ONTOLOGY, _cfg())


def q_tool_stats(sf_dir: str):
    """Per-tool usage profile over the transcripts: turn count, exact
    distinct conversations, and the exact integer turn-position sum
    (consumers derive the average without float drift) — bounded groups,
    so per-batch partials + one tiny fold; the distinct-conv leg is one
    (tool, conv) dedup exchange."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.setops import distinct_rows

    t = read_transcripts(sf_dir)

    def keep_tool(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch["tool"])).select(
            ["tool", "conv_id", "turn_idx"]
        )

    tooled = t.map_batches(keep_tool, batch_format="pyarrow").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tool", sort=False).agg(
            n_turns=("turn_idx", "size"), sum_turn=("turn_idx", "sum")
        )
        return g.reset_index()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tool", sort=False)[["n_turns", "sum_turn"]].sum()
        return g.reset_index()

    stats = sharded_groupby_apply(
        tooled.map_batches(partial, batch_format="pandas"),
        ["tool"],
        fold,
        num_shards=4,
    ).to_pandas()  # <= |tools| rows

    convs = (
        distinct_rows(
            tooled.select_columns(["tool", "conv_id"]),
            ["tool", "conv_id"],
            num_shards=4,
        )
        .to_pandas()
        .groupby("tool", sort=False)
        .size()
    )
    stats["n_convs"] = stats["tool"].map(convs).astype("int64")
    return pa.table(
        {
            "tool": pa.array(stats["tool"], type=pa.string()),
            "n_turns": pa.array(
                stats["n_turns"].to_numpy(), type=pa.int64()
            ),
            "n_convs": pa.array(
                stats["n_convs"].to_numpy(), type=pa.int64()
            ),
            "sum_turn": pa.array(
                stats["sum_turn"].to_numpy(), type=pa.int64()
            ),
        }
    )


def q_conv_splits(sf_dir: str):
    """Leakage-safe train/val/test assignment: the split keys on the
    CONVERSATION id, so every turn of one dialogue lands in the same
    split (turn-level keys would leak dialogue context across splits) —
    `ops/sample.assign_splits` on conv_id, a stateless map that keeps a
    conversation's split stable as the corpus grows."""
    from ..ops.sample import assign_splits

    t = read_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"])
    return assign_splits(t, "conv_id")


def q_topic_shifts(sf_dir: str):
    """Dialogue-structure audit: per conversation, how many times the
    tagged-concept set CHANGES between consecutive tagged turns — the
    turn-local tag rollup (zero shuffle) into one conv-sharded window
    lag (`ops/window.window_over`) and a same-shard count fold."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.window import window_over
    from .tag import extract_doc_tags

    dt = extract_doc_tags(read_transcripts(sf_dir), ONTOLOGY, _cfg())
    w = window_over(
        dt.select_columns(["conv_id", "turn_idx", "tags_sorted"]),
        keys=["conv_id"],
        order_by=["turn_idx"],
        specs=[("lag", "tags_sorted", "prev", (1, ""))],
        num_shards=16,
    )

    def count_shifts(df: pd.DataFrame) -> pd.DataFrame:
        shift = (df["prev"] != "") & (df["prev"] != df["tags_sorted"])
        g = shift.groupby(df["conv_id"]).sum()
        return pd.DataFrame(
            {
                "conv_id": g.index.to_numpy(),
                "n_shifts": g.to_numpy().astype("int64"),
            }
        )

    return sharded_groupby_apply(w, ["conv_id"], count_shifts, num_shards=16)


def q_conv_stats(sf_dir: str):
    """Per-conversation rollup via the explicitly salted two-phase reduce
    (graph.conversation_stats)."""
    from .graph import conversation_stats

    return conversation_stats(_mentions(sf_dir))


# Overlap-hardening ontology: keywords deliberately SHARE tokens (every
# "big data" occurrence collides with a "data" match, etc.), so these
# queries exercise longest-wins span filtering (core/automaton.filter_longest)
# and the general per-row matcher path end-to-end — the main ONTOLOGY is
# token-disjoint by design and never does.
OVERLAP_ONTOLOGY = [
    ("BigData", "big data", "concept"),
    ("DataWindow", "data window", "concept"),
    ("WindowMerge", "window merge", "concept"),
    ("Data", "data", "word"),
    ("Window", "window", "word"),
    ("Merge", "merge", "word"),
]


def q_tag_overlap(sf_dir: str):
    """Mention counts under an overlapping ontology in category mode:
    longest-match-wins overlap resolution, verified against a recursive-CTE
    DuckDB oracle that replays the exact greedy filter_spans algorithm."""
    from .tag import extract_mention_counts

    return extract_mention_counts(
        read_transcripts(sf_dir), OVERLAP_ONTOLOGY, _cfg(category_column="category")
    )


def q_tag_casefold(sf_dir: str):
    """ignore_case end-to-end on a NON-lowercase corpus: every third turn is
    uppercased before tagging, so matches only survive if case folding
    actually runs (the raw corpus is all-lowercase, which made ignore_case
    vacuous in the round-1 oracle matrix)."""
    from .tag import extract_mention_counts

    def upper_some(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        turn = np.asarray(batch["turn_idx"].to_pylist())
        mask = pa.array(turn % 3 == 1)
        text2 = pc.if_else(mask, pc.ascii_upper(batch["text"]), batch["text"])
        return batch.set_column(batch.schema.get_field_index("text"), "text", text2)

    ds = read_transcripts(sf_dir).map_batches(upper_some, batch_format="pyarrow")
    return extract_mention_counts(ds, ONTOLOGY, _cfg(ignore_case=True))


def q_tag_diacritics(sf_dir: str):
    """ignore_diacritics (+case) end-to-end: every 'a' becomes 'á' before
    tagging — non-ASCII text forces the general NFD-normalizing path, and
    matches only survive if accent stripping actually runs."""
    from .tag import extract_mention_counts

    def accent(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text2 = pc.replace_substring(batch["text"], "a", "á")
        return batch.set_column(batch.schema.get_field_index("text"), "text", text2)

    ds = read_transcripts(sf_dir).map_batches(accent, batch_format="pyarrow")
    return extract_mention_counts(
        ds, ONTOLOGY, _cfg(ignore_case=True, ignore_diacritics=True)
    )


def q_tag_lemma(sf_dir: str):
    """Lemmatization-mode matching end-to-end: every 'customer' token is
    replaced by an inflected form of 'work' (worked/working/works by
    turn_idx % 3) and the ontology carries only the base form 'work' —
    matches exist ONLY if the lookup lemmatizer actually maps the
    inflections back to the lemma.  The oracle needs no SQL lemmatizer:
    the injection rule determines both the match count (the original
    'customer' count) and the reported span text per turn."""
    from .tag import extract_mention_counts

    def inflect(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        turn = np.asarray(batch["turn_idx"].to_pylist())
        forms = np.array(["worked", "working", "works"])[turn % 3]
        text = batch["text"].to_pylist()
        out = [
            t.replace("customer", f) if t is not None else None
            for t, f in zip(text, forms)
        ]
        return batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pa.array(out, type=pa.string()),
        )

    ds = read_transcripts(sf_dir).map_batches(inflect, batch_format="pyarrow")
    return extract_mention_counts(
        ds,
        [("Work", "work", "action")],
        _cfg(lemmatization=True, category_column="category"),
    )


def _tag_lemma_injected(sf_dir: str, language: str, forms, keyword: str,
                        tag: str, category: str):
    """Shared harness for the non-English lemma-mode oracles: every
    'customer' token is replaced by an inflected form (by turn_idx % 3)
    and the ontology carries only the base form — matches exist ONLY if
    the language's lookup table maps the inflections back.  Same design
    as q_tag_lemma; the injection rule IS the oracle."""
    from .tag import extract_mention_counts

    forms_arr = np.array(forms)

    def inflect(batch: pa.Table) -> pa.Table:
        turn = np.asarray(batch["turn_idx"].to_pylist())
        fs = forms_arr[turn % 3]
        text = batch["text"].to_pylist()
        out = [
            t.replace("customer", f) if t is not None else None
            for t, f in zip(text, fs)
        ]
        return batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pa.array(out, type=pa.string()),
        )

    ds = read_transcripts(sf_dir).map_batches(inflect, batch_format="pyarrow")
    return extract_mention_counts(
        ds,
        [(tag, keyword, category)],
        _cfg(language=language, lemmatization=True,
             category_column="category"),
    )


def q_tag_lemma_nl(sf_dir: str):
    """Dutch lemma-mode matching: paradigm-table depth in a second
    language family (round-2 verdict item 2) — gewerkt/werkt/werkten all
    lemmatize to 'werken' through the generated nl table.  (The form
    'werkte' is deliberately NOT used: the reference's own matrix pins it
    to identity — see REFERENCE_FIXTURE_PINS.)"""
    return _tag_lemma_injected(
        sf_dir, "nl", ["gewerkt", "werkt", "werkten"], "werken", "Werk",
        "actie",
    )


def q_tag_lemma_sv(sf_dir: str):
    """Swedish lemma-mode matching through the generated sv table:
    arbetade/arbetat/arbetar -> 'arbeta'."""
    return _tag_lemma_injected(
        sf_dir, "sv", ["arbetade", "arbetat", "arbetar"], "arbeta",
        "Arbete", "handling",
    )


def q_distinct_langs(sf_dir: str):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return docs.groupby("lang").aggregate(Count(alias_name="n_docs"))


# --- training-data ops -----------------------------------------------------

def q_dedup_exact(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup_ops.exact_dedup_groups(docs)


def q_dedup_keep_first(sf_dir: str):
    """Full-row exact dedup: keep the min-doc_id row of every distinct text
    (hash-partition + per-group first)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return dedup_ops.exact_dedup(docs)


def q_top_tags(sf_dir: str):
    """Top-3 concepts by mention count — sort/limit/top-k coverage via
    `ops/topk.global_topk` (per-block partial top-3 + one tiny final
    reduce, no global sort).  Deterministic tie-break on tag."""
    from ..ops.topk import global_topk

    scores = concept_scores(_mentions(sf_dir)).select_columns(["tag", "n_mentions"])
    return global_topk(scores, "n_mentions", k=3, descending=True, tiebreak=["tag"])


def q_token_counts(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_ops.add_token_counts(docs).select_columns(["doc_id", "n_tokens"])


def q_quality(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_ops.add_quality(docs).select_columns(
        ["doc_id", "n_chars", "n_words", "n_distinct_words", "max_word_len", "quality_score"]
    )


def q_fingerprint(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_ops.add_fingerprints(docs).select_columns(["doc_id", "text_md5"])


def q_lang_id(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_ops.add_lang_id(docs, concurrency=(1, 4)).select_columns(
        ["doc_id", "pred_lang"]
    )


N_ANN_QUERIES = 4
ANN_K = 5


def q_ann_topk(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtab = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qtab = qtab[qtab["vec_id"] < N_ANN_QUERIES].sort_values("vec_id")
    q = np.array(qtab["embedding"].tolist(), dtype=np.float64)
    out = sim_ops.topk_cosine(
        emb, q, qtab["vec_id"].tolist(), k=ANN_K, concurrency=(1, 4)
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_minhash_pairs(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # concurrency=None: fixed pool sized to 3/4 of cluster CPUs (capped) —
    # Ray 2.49's autoscaling pool sticks at min size under a busy upstream,
    # and a pool >= the CPU count deadlocks the read stage
    return dedup_ops.minhash_lsh_pairs(docs, threshold=0.4)


def q_jaccard_pairs(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # inverted-index candidates: exact recall at ANY threshold (0.2 here is
    # below what MinHash banding at 16 bands would reliably recall)
    return dedup_ops.ngram_jaccard_pairs(docs, threshold=0.2)


def q_dup_clusters(sf_dir: str):
    """Duplicate clusters: connected components over the exact-Jaccard
    near-dup pair graph, labeled by min doc id."""
    from ..ops.components import connected_components

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_ops.ngram_jaccard_pairs(docs, threshold=0.2)
    return connected_components(pairs).select_columns(["doc_id", "cluster_id"])


def q_conv_top_tags(sf_dir: str):
    """Top-2 tags per conversation by mention count (ties: tag asc) — the
    per-group top-k operator over a corpus-scaled key set."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.topk import group_topk
    from .tag import extract_mention_counts

    mc = extract_mention_counts(read_transcripts(sf_dir), ONTOLOGY, _cfg())

    def per_conv(df):
        return (
            df.groupby(["conv_id", "tag"], sort=False)["n_matches"]
            .sum()
            .reset_index(name="n_mentions")
        )

    conv_tag = sharded_groupby_apply(mc, ["conv_id", "tag"], per_conv)
    return group_topk(
        conv_tag, ["conv_id"], "n_mentions", k=2, tiebreak=["tag"]
    ).select_columns(["conv_id", "tag", "n_mentions", "rank"])


def q_ann_ivf(sf_dir: str):
    """IVF ANN with nprobe = nlist (full probe): the partition/probe
    machinery runs end-to-end and the result is EXACT, so the brute-force
    oracle applies verbatim."""
    from ..ops.similarity import IVFIndex

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtab = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qtab = qtab[qtab["vec_id"] < N_ANN_QUERIES].sort_values("vec_id")
    q = np.array(qtab["embedding"].tolist(), dtype=np.float64)
    ivf = IVFIndex(nlist=16, nprobe=16).fit_distributed(emb, iters=4)
    assigned = ivf.assign(emb)
    out = ivf.search(assigned, q, qtab["vec_id"].tolist(), k=ANN_K)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_asof_clicks(sf_dir: str):
    """Each click joined to the user's most recent prior-or-same-time view
    (backward as-of join) — bucket-by-user, one merge_asof per bucket."""
    from ..ops.join import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    import pyarrow.compute as _pc

    clicks = ev.map_batches(
        lambda b: b.filter(_pc.equal(b["event_type"], "click")).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )
    views = ev.map_batches(
        lambda b: b.filter(_pc.equal(b["event_type"], "view")).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )
    return asof_join(clicks, views, key="user_id", ts="ts").select_columns(
        ["event_id", "user_id", "ts", "event_id_r", "ts_r"]
    )


def q_event_sessions(sf_dir: str):
    """Range join: every event matched into its session interval (sessions
    from the 30-minute-gap sessionizer) — the disjoint-interval merge_asof
    path, one bucket-by-user shuffle per side."""
    from ..ops.events import sessionize
    from ..ops.join import range_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    sessions = sessionize(ev)
    return range_join(
        ev, sessions, key="user_id", ts="ts", start="start_ts", end="end_ts",
        disjoint=True,
    ).select_columns(["event_id", "user_id", "ts", "session_id"])


def q_sliding_window(sf_dir: str):
    """60-minute windows sliding every 15 — each event in 4 windows."""
    from ..ops.events import sliding_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    out = sliding_window(ev, window_minutes=60, slide_minutes=15)

    def round4(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            _pc.round(batch["sum_value"], ndigits=4),
        )

    return out.map_batches(round4, batch_format="pyarrow")


def q_value_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of event value per event_type."""
    from ..ops.events import key_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return key_quantiles(ev)


def q_sample_det(sf_dir: str):
    """Deterministic 20% sample — md5-percentile keyed, reproducible in SQL."""
    from ..ops.sample import deterministic_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return deterministic_sample(docs, "doc_id", pct=20)


def q_sample_stratified(sf_dir: str):
    """Per-language rates: downsample 'en' to 25%, keep the rest whole."""
    from ..ops.sample import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_sample(docs, "doc_id", "lang", rates={"en": 25})


def q_ngram_top(sf_dir: str):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return text_ops.ngram_counts(docs, n=3, top=50)


def q_bloom_join(sf_dir: str):
    """Selective fact-dim join with Bloom shuffle pruning: per-order item
    count + integer-cents revenue for urgent finished orders only —
    `ops/bloom.bloom_prefilter` drops partnerless lineitem rows BEFORE
    the bucketed hash join's exchange (fixed-size bit array vs the
    semi-join's O(keys) array); Bloom false positives are removed by the
    exact join, so the result equals the plain SQL join."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.bloom import bloom_prefilter
    from ..ops.join import bucketed_hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )

    def keep_urgent(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.equal(batch["o_orderstatus"], pa.scalar("F")),
            pc.equal(batch["o_orderpriority"], pa.scalar("1-URGENT")),
        )
        return pa.table({"o_orderkey": batch.filter(m)["o_orderkey"]})

    small = orders.map_batches(keep_urgent, batch_format="pyarrow").materialize()

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    pref = bloom_prefilter(
        li.map_batches(cents, batch_format="pyarrow"),
        small,
        on="o_orderkey",
        n_bits=1 << 16,
    )
    joined = bucketed_hash_join(pref, small, on="o_orderkey", num_buckets=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderkey", sort=False)["cents"].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "o_orderkey": g.index.to_numpy(),
                "n_items": g["size"].to_numpy().astype("int64"),
                "sum_cents": g["sum"].to_numpy().astype("int64"),
            }
        )

    return sharded_groupby_apply(joined, ["o_orderkey"], fold, num_shards=16)


ZORDER_BITS = 10


def q_zorder_tiles(sf_dir: str):
    """Z-order curve partitioning audit: Morton-interleave (partkey,
    suppkey) mod 2^10 and count rows per coarse tile (top 6 of 20 key
    bits) — `ops/zorder.zorder_key`, a stateless zero-exchange map; the
    tile histogram shows the 2-D locality a z-sorted layout gives the
    range pruner."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.zorder import zorder_key

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    lim = 1 << ZORDER_BITS

    def mod(batch: pa.Table) -> pa.Table:
        x = batch["l_partkey"].to_numpy(zero_copy_only=False) % lim
        y = batch["l_suppkey"].to_numpy(zero_copy_only=False) % lim
        return pa.table(
            {
                "x": pa.array(x.astype(np.int64), type=pa.int64()),
                "y": pa.array(y.astype(np.int64), type=pa.int64()),
            }
        )

    z = zorder_key(
        li.map_batches(mod, batch_format="pyarrow"), "x", "y",
        bits=ZORDER_BITS,
    )

    def tile_partial(batch: pa.Table) -> pa.Table:
        t = batch["z"].to_numpy(zero_copy_only=False) >> (
            2 * ZORDER_BITS - 6
        )
        uniq, counts = np.unique(t, return_counts=True)
        return pa.table(
            {
                "tile": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tile", sort=False)["n"].sum().reset_index()

    return sharded_groupby_apply(
        z.map_batches(tile_partial, batch_format="pyarrow"),
        ["tile"],
        fold,
        num_shards=8,
    )


HH_MIN_COUNT = 200


def q_heavy_tokens(sf_dir: str):
    """Exact iceberg query over the corpus vocabulary: tokens occurring
    >= 200 times — `ops/sketch.heavy_hitters` (one Count-Min fold bounds
    every frequency from above, then a candidate-only exact-count pass;
    the exchange carries O(N/T) keys, never the whole vocabulary)."""
    from ..ops.sketch import heavy_hitters

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        import re

        rx = re.compile(r"\S+")
        out = [t for s in df["text"].fillna("") for t in rx.findall(s)]
        return pd.DataFrame({"tok": pd.Series(out, dtype=str)})

    tokens = docs.map_batches(explode, batch_format="pandas")
    hh = heavy_hitters(
        tokens, "tok", min_count=HH_MIN_COUNT, num_shards=16
    )
    return hh.map_batches(
        lambda df: pa.table(
            {
                "tok": pa.array(df["key"], type=pa.string()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        ),
        batch_format="pandas",
    )


CURRICULUM_BUCKETS = 10


def q_curriculum(sf_dir: str):
    """Curriculum bucketing: a GLOBAL NTILE(10) over documents ordered
    by length (short-to-long training schedule) — `ops/index.
    zip_with_index` provides the dense global rank (one range sort +
    block-offset tasks), then the SQL NTILE split is pure arithmetic on
    the rank; no second exchange."""
    from ..ops.index import zip_with_index

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = pc.add(
            pc.multiply(
                pc.cast(batch["n_chars"], pa.int64()),
                pa.scalar(1 << 40, type=pa.int64()),
            ),
            pc.cast(batch["doc_id"], pa.int64()),
        )
        return pa.table({"doc_id": batch["doc_id"], "k": k})

    keyed = docs.map_batches(key, batch_format="pyarrow")
    n = docs.count()
    ranked = zip_with_index(keyed, sort_key="k", id_col="rank")
    kb = CURRICULUM_BUCKETS
    q, r = n // kb, n % kb
    big = (q + 1) * r  # rows covered by the larger buckets

    def bucket(batch: pa.Table) -> pa.Table:
        rank = batch["rank"].to_numpy(zero_copy_only=False)
        b = np.where(
            rank < big,
            rank // (q + 1) + 1,
            r + (rank - big) // max(q, 1) + 1 if q else r,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(b.astype(np.int64), type=pa.int64()),
            }
        )

    return ranked.map_batches(bucket, batch_format="pyarrow")


MASK_RATE = 15  # percent of token positions


def q_mlm_pairs(sf_dir: str):
    """Masked-LM training-pair generation: every token position masks
    independently at 15% via the corpus-auditable md5 idiom
    (``md5(doc_id:pos) % 100 < 15`` — reproducible on any engine and
    stable under corpus growth, the `ops/sample.py` contract), emitting
    (doc_id, masked text, 'pos:token' labels).  Stateless per-batch map,
    zero exchange; hashing is per token position, the same cost class as
    the md5-percentile samplers."""
    import hashlib

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def mask(df: pd.DataFrame) -> pa.Table:
        import re

        rx = re.compile(r"\S+")
        out_id, out_text, out_labels = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = rx.findall(text or "")
            masked, labels = [], []
            for i, tok in enumerate(toks):
                h = int(
                    hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:15],
                    16,
                )
                if h % 100 < MASK_RATE:
                    masked.append("[MASK]")
                    labels.append(f"{i}:{tok}")
                else:
                    masked.append(tok)
            out_id.append(doc_id)
            out_text.append(" ".join(masked))
            out_labels.append(",".join(labels))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "masked": pa.array(out_text, type=pa.string()),
                "labels": pa.array(out_labels, type=pa.string()),
            }
        )

    return docs.map_batches(mask, batch_format="pandas")


PREP_MIN_QUALITY = 40


def q_prep_corpus(sf_dir: str):
    """End-to-end training-data prep: language filter -> quality filter ->
    exact-Jaccard near-dup clustering -> keep each cluster's canonical
    (min-id) doc -> token counts.  Every stage is the library operator a
    100 TB run would use; the whole chain is one streaming Dataset plan
    plus the two candidate-volume shuffles inside the near-dup step."""
    import pyarrow.compute as _pc

    from ..ops.components import connected_components, dedup_survivors

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = text_ops.add_quality(
        text_ops.add_lang_id(docs, concurrency=(1, 4))
    )
    kept = scored.map_batches(
        lambda b: b.filter(
            _pc.and_(
                _pc.equal(b["pred_lang"], "en"),
                _pc.greater_equal(b["quality_score"], PREP_MIN_QUALITY),
            )
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    ).materialize()  # consumed twice (pair gen + survivors): without this
    # the lang-id actor pool and quality stage execute twice
    pairs = dedup_ops.ngram_jaccard_pairs(kept, threshold=0.2)
    clusters = connected_components(pairs)
    canonical = dedup_survivors(kept, clusters)
    return text_ops.add_token_counts(canonical).select_columns(
        ["doc_id", "n_tokens"]
    )


def q_simhash_pairs(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup_ops.simhash_near_pairs(docs, max_hamming=8)


EMB_PLANT_OFFSET = 1_000_000
EMB_PLANT_EPS = 0.05
SEMDEDUP_K = 8  # seed count for the semantic-dedup clustering


def _with_planted(batch: pa.Table) -> pa.Table:
    """Augment an embeddings batch with DETERMINISTIC planted near-dups
    (e'[i] = e[i] + 0.05*e[(i%d)+1], vec_id + 1e6) — the raw table is random
    gaussian with max pairwise cosine ~0.51, so without planting every
    near-dup query over it is vacuous.  The derivation is SQL-expressible,
    so oracles rebuild the identical augmented table; planted pairs sit at
    cosine ~0.9987, far above the 0.9 thresholds."""
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    e = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    pert = e + EMB_PLANT_EPS * np.roll(e, -1, axis=1)
    out_ids = np.concatenate([ids, ids + EMB_PLANT_OFFSET])
    out_e = np.concatenate([e, pert])
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(out_ids, type=pa.int64()),
            "embedding": pa.array(out_e.tolist(), type=pa.list_(pa.float64())),
        }
    )


def q_embedding_near(sf_dir: str):
    """Embedding near-dup pairs over the planted-dup-augmented embeddings
    table (see _with_planted); the DuckDB oracle computes brute-force cosine
    over the identical augmented table, and multi-table LSH recall at the
    planted cosine ~0.9987 is 1 - 8.5e-10 per pair."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_with_planted, batch_format="pyarrow")
    return dedup_ops.embedding_near_pairs(emb, threshold=0.9)


def q_semdedup(sf_dir: str):
    """SemDeDup-style semantic dedup (cluster the embedding space, drop
    near-identical members within each cluster) over the same planted-dup
    augmented table as embedding_near.  Clustering is the deterministic
    spherical assignment to the first SEMDEDUP_K base vectors (row-group
    filter pushdown reads ONLY those K rows on the driver; at real scale the
    seeds would come from ops.kmeans.fit_distributed — assignment and the
    within-cluster pass are identical either way).  Each planted copy lands
    in its source's cluster at cosine ~0.9987 and is dropped as dominated;
    the oracle mirrors assignment (row_number over cosine DESC, sid) and the
    dominance rule (EXISTS earlier same-cluster row with cosine >= 0.9)
    exactly."""
    import pyarrow.parquet as pq

    seeds_tab = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", SEMDEDUP_K)],
    )
    sdf = seeds_tab.to_pandas().sort_values("vec_id")
    seeds = np.array(sdf["embedding"].tolist(), dtype=np.float64)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_with_planted, batch_format="pyarrow")
    return dedup_ops.semantic_dedup(emb, seeds, threshold=0.9)


ENT_PLANT_OFFSET = 10_000_000


def q_entity_resolve(sf_dir: str):
    """Blocked fuzzy entity resolution over part names augmented with
    DETERMINISTIC planted typos (drop the 6th character, id + 1e7 — min
    name length in the table is 7, and dropping PAST the 4-char block
    prefix keeps the typo inside its source's block).  Identical labels
    collapse through the label-distinct stage; the typo variants attach
    at Levenshtein distance 1.  The oracle mirrors every stage — lower()
    normalization, min-id label representative, prefix-4 blocking,
    levenshtein <= 2 pairs, recursive-CTE components, singleton
    fallback to own representative."""
    from raykg.ops import entity as entity_ops

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )

    def with_typos(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["p_partkey"].to_pylist(), dtype=np.int64)
        names = batch["p_name"].to_pylist()
        typos = [s[:5] + s[6:] for s in names]
        return pa.table(
            {
                "ent_id": pa.array(
                    np.concatenate([ids, ids + ENT_PLANT_OFFSET]), type=pa.int64()
                ),
                "label": pa.array(names + typos, type=pa.string()),
            }
        )

    ents = parts.map_batches(with_typos, batch_format="pyarrow")
    return entity_ops.resolve_entities(
        ents, id_column="ent_id", label_column="label", block_prefix=4, max_dist=2
    )


def q_concept_lifespan(sf_dir: str):
    """Entity lifespan: each concept's first/last mention time and total
    occurrences — the mention actor's ``ts`` passthrough (no join), then
    per-batch (min, max, sum) partials into one bounded tag-sharded
    fold."""
    from raykg.ops.agg import sharded_groupby_apply
    from .tag import extract_mention_counts

    counts = extract_mention_counts(
        read_transcripts(sf_dir), ONTOLOGY, _cfg(), extra_columns=("ts",)
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tag", sort=False).agg(
            first_ts=("ts", "min"), last_ts=("ts", "max"),
            n=("n_matches", "sum"),
        )
        return g.reset_index()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tag", sort=False).agg(
            first_ts=("first_ts", "min"), last_ts=("last_ts", "max"),
            n=("n", "sum"),
        )
        return g.reset_index()

    out = sharded_groupby_apply(
        counts.map_batches(partial, batch_format="pandas"),
        ["tag"],
        fold,
        num_shards=4,
    )

    def typed(df):
        return pa.table(
            {
                "tag": pa.array(df["tag"], type=pa.string()),
                "first_ts": pa.array(df["first_ts"], type=pa.timestamp("us")),
                "last_ts": pa.array(df["last_ts"], type=pa.timestamp("us")),
                "n": pa.array(df["n"].to_numpy(), type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


FEATURE_DIMS = 64


def q_conv_features(sf_dir: str):
    """Feature-hashing (hashing-trick, Weinberger et al. 2009)
    conversation vectors: every token maps to ``md5(tok) % 64`` with a
    ``md5('s:'+tok) % 2`` sign, summed per conversation — long-form
    ``(conv_id, dim, c)`` nonzero counts, integer-exact.  Per-batch
    distinct-token memo + (conv, dim) partials; one conv-sharded fold;
    the md5-per-distinct-token cost class of the samplers."""
    import hashlib

    from raykg.ops.agg import sharded_groupby_apply

    t = read_transcripts(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import re

        rx = re.compile(r"\S+")
        memo: dict = {}
        convs, dims, sgns = [], [], []
        for conv, text in zip(df["conv_id"], df["text"]):
            for tok in rx.findall(text or ""):
                got = memo.get(tok)
                if got is None:
                    d = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % FEATURE_DIMS
                    s = 1 if int(
                        hashlib.md5(b"s:" + tok.encode()).hexdigest()[:15], 16
                    ) % 2 == 0 else -1
                    memo[tok] = got = (d, s)
                convs.append(conv)
                dims.append(got[0])
                sgns.append(got[1])
        out = pd.DataFrame({"conv_id": convs, "dim": dims, "c": sgns})
        return out.groupby(["conv_id", "dim"], as_index=False)["c"].sum()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["conv_id", "dim"], as_index=False)["c"].sum()
        return g[g["c"] != 0]

    out = sharded_groupby_apply(
        t.select_columns(["conv_id", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["conv_id"],
        fold,
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], type=pa.string()),
                "dim": pa.array(df["dim"].to_numpy(), type=pa.int64()),
                "c": pa.array(df["c"].to_numpy(), type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_concept_trends(sf_dir: str):
    """Temporal KG: per-(concept, 10-second window) mention volumes with
    integer-exact trend flags.  The mention actor passes the turn's event
    time through (``extra_columns=("ts",)`` — no downstream join to recover
    turn metadata), a per-batch pre-aggregated (tag, window) exchange forms
    window counts, and a tiny per-tag second exchange flags each window:
    ``above_mean`` iff cnt * n_windows > total (all-integer, no float mean)
    and ``is_peak`` iff cnt equals the tag's max window count."""
    from raykg.ops.agg import sharded_groupby_apply
    from .tag import extract_mention_counts

    counts = extract_mention_counts(
        read_transcripts(sf_dir), ONTOLOGY, _cfg(), extra_columns=("ts",)
    )

    def bucket(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = us // 10_000_000  # 10-second windows, epoch-relative
        df = pd.DataFrame(
            {
                "tag": batch["tag"].to_pylist(),
                "window_id": win,
                "cnt": batch["n_matches"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["tag", "window_id"], sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def win_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["tag", "window_id"], sort=False)["cnt"].sum().reset_index()

    wins = sharded_groupby_apply(
        counts.map_batches(bucket, batch_format="pyarrow"),
        ["tag", "window_id"],
        win_sum,
        num_shards=8,
    )

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("tag", sort=False):
            total = int(g["cnt"].sum())
            n = len(g)
            mx = int(g["cnt"].max())
            out.append(
                pd.DataFrame(
                    {
                        "tag": g["tag"],
                        "window_id": g["window_id"].astype("int64"),
                        "cnt": g["cnt"].astype("int64"),
                        "above_mean": (g["cnt"] * n > total).astype("int64"),
                        "is_peak": (g["cnt"] == mx).astype("int64"),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "tag": pd.Series(dtype="object"),
                    "window_id": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                    "above_mean": pd.Series(dtype="int64"),
                    "is_peak": pd.Series(dtype="int64"),
                }
            )
        )

    return sharded_groupby_apply(wins, ["tag"], flags, num_shards=4)


def q_bpe_pairs(sf_dir: str):
    """BPE vocabulary-induction pair statistics: global adjacent-character
    pair counts over \\S+ words of the documents corpus (round 0 of BPE
    training; `ops/bpe.bpe_train` iterates merges over the word-frequency
    table, pinned by unit test).  The per-batch kernel is a vectorized
    uint32-codepoint pass; the oracle mirrors word extraction and per-word
    substr pairs exactly."""
    from raykg.ops import bpe as bpe_ops

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_ops.pair_counts(docs)


def q_media_features(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = docs.map_batches(mm_ops.documents_to_media, batch_format="pyarrow")
    return mm_ops.extract_media_features(media, concurrency=(1, 4)).select_columns(
        ["media_id", "media_type", "n_bytes", "width", "height", "duration_s"]
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream
    (SURVEY.md §2.9: event-time windows reduce to groupby(key, bucket))."""
    import pyarrow.compute as pc

    from ..ops.events import tumbling_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    out = tumbling_window(ev)

    def final(batch: pa.Table) -> pa.Table:
        rounded = pc.round(batch["sum_value"], 4)
        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            pa.field("sum_value", pa.float64()),
            rounded,
        )

    return out.map_batches(final, batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    """Session windows over the events stream (per-user 30-minute gap rule)
    — bucketed vectorized kernel, see ops/events.py."""
    from ..ops.events import sessionize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return sessionize(ev)


def q_join_broadcast(sf_dir: str):
    """Broadcast (map-side) join: orders enriched with customer attributes —
    the small side ships once via ray.put, no shuffle (ops/join.py)."""
    import pyarrow.parquet as pq_mod

    from ..ops.join import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_name", "c_mktsegment"])
    return broadcast_join(orders, cust, on="o_custkey", how="left")


def q_join_bucketed(sf_dir: str):
    """Partitioned hash join of two large sides (lineitem x orders) followed
    by an aggregate: revenue stats per order priority."""
    import pyarrow.compute as pc

    from ..ops.join import bucketed_hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_quantity"]),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = bucketed_hash_join(li, orders, on="o_orderkey", num_buckets=32)

    def partial(batch: pa.Table) -> pa.Table:
        agg: Dict[str, list] = {}
        for p, qty in zip(
            batch["o_orderpriority"].to_pylist(), batch["l_quantity"].to_pylist()
        ):
            cur = agg.setdefault(p, [0, 0.0])
            cur[0] += 1
            cur[1] += qty
        return pa.Table.from_pydict(
            {
                "o_orderpriority": list(agg),
                "n": [v[0] for v in agg.values()],
                "s": [v[1] for v in agg.values()],
            }
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_items"), Sum("s", alias_name="total_qty"))
    )

    def final(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("total_qty"),
            pa.field("total_qty", pa.float64()),
            pc.round(batch["total_qty"], 4),
        )

    return out.map_batches(final, batch_format="pyarrow")


DECONTAM_N = 4  # word-gram size: 13 in production pipelines; 4 keeps the
DECONTAM_MOD = 13  # tiny-vocabulary sf corpora non-vacuous (test set = docs
#                    with doc_id % 13 == 0, held out of the corpus side)


def q_decontam(sf_dir: str):
    """Test-set decontamination: corpus docs surviving n-gram overlap
    removal against the held-out eval slice."""
    from ..ops.decontam import decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _slice(held_out: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            m = ids % DECONTAM_MOD == 0
            return batch.filter(pa.array(m if held_out else ~m))

        return fn

    corpus = docs.map_batches(_slice(False), batch_format="pyarrow")
    testset = docs.map_batches(_slice(True), batch_format="pyarrow")
    return decontaminate(corpus, testset, n=DECONTAM_N).select_columns(["doc_id"])


def q_redact(sf_dir: str):
    """PII redaction over a deterministically PII-injected corpus (the sf
    documents carry no emails/phones, so the query plants them from doc_id
    identically on both engines, then redacts)."""
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks() if isinstance(
            batch["doc_id"], pa.ChunkedArray
        ) else batch["doc_id"]
        idstr = pc.cast(ids, pa.string())
        pad = pc.utf8_lpad(
            pc.cast(
                pa.array(ids.to_numpy(zero_copy_only=False) % 10000), pa.string()
            ),
            4,
            "0",
        )
        n = batch.num_rows
        pii = pc.binary_join_element_wise(
            pa.array(["doc "] * n), idstr, pa.array([": "] * n),
            batch["text"],
            pa.array([" contact user"] * n), idstr,
            pa.array(["@example.com or call 415-555-"] * n), pad,
            pa.array([""] * n),  # separator
        )
        return pa.table({"doc_id": ids, "text": pii})

    return text_ops.redact(
        docs.map_batches(inject, batch_format="pyarrow")
    ).select_columns(["doc_id", "text"])


def q_orders_semi(sf_dir: str):
    """Broadcast semi-join: orders of customers with acctbal > 5000."""
    from ..ops.join import semi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    rich = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).filter(expr="c_acctbal > 5000")
    return semi_join(orders, rich, on="o_custkey", right_on="c_custkey")


def q_orders_anti(sf_dir: str):
    """Broadcast anti-join: orders of customers with acctbal <= 5000."""
    from ..ops.join import semi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    rich = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).filter(expr="c_acctbal > 5000")
    return semi_join(orders, rich, on="o_custkey", right_on="c_custkey", anti=True)


def q_repetition(sf_dir: str):
    """Gopher-style repetition metrics per document."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        lambda b: text_ops.repetition_batch(b), batch_format="pyarrow"
    ).select_columns(["doc_id", "top_word_pct", "top_bigram_pct", "dup_word_pct"])


def q_tfidf_top(sf_dir: str):
    """Top-3 characteristic terms per document by tf/df (exact-rank
    TF-IDF variant; see ops/tfidf.py for why the ratio, not log-idf)."""
    from ..ops.tfidf import tfidf_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_topk(docs, k=3)


def q_approx_distinct(sf_dir: str):
    """KMV sketch estimate of the distinct customers placing orders —
    deterministic and exactly mirrored by the SQL oracle."""
    from ..ops.sketch import kmv_distinct

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    return kmv_distinct(orders, "o_custkey", k=256)


def q_doc_splits(sf_dir: str):
    """Deterministic train/val/test split assignment (80/10/10 on the
    md5 percentile of doc_id) — stateless map, reproducible across
    engines and cluster sizes."""
    from ..ops.sample import assign_splits

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return assign_splits(docs, "doc_id", bounds=(80, 90))


def q_lm_scores(sf_dir: str):
    """Corpus-bigram LM fluency score per document (mean conditional
    bigram probability under the corpus's own counts) — `ops/lm.py`;
    distributed counts + bucketed probability joins, rational arithmetic
    so the SQL oracle reproduces the scores."""
    from ..ops.lm import lm_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lm_score(docs, num_shards=16)


def q_order_zscore(sf_dir: str):
    """Per-priority z-score of order totals — `ops/feature.py` (no row
    exchange: moment partials reduce to a 5-row table broadcast back
    into a stateless map)."""
    import pyarrow.compute as pc

    from ..ops.feature import zscore_by_group

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    out = zscore_by_group(orders, "o_orderpriority", "o_totalprice")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "zscore": pc.round(batch["zscore"], 6),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


INCR_PRIOR_MAX = 300
INCR_INC_MIN = 250


def q_incr_new_docs(sf_dir: str):
    """Incremental corpus processing: keep only increment docs whose text
    content hash is UNSEEN in the prior snapshot.  The windows overlap
    (prior = doc_id < 300, increment = doc_id >= 250) so the 50
    re-delivered docs are genuinely dropped by the hash membership test —
    the anti-join is exercised, not vacuous.  Only md5 hex strings cross
    the wire, never bodies; at corpus-scale priors swap the broadcast
    semi_join for the bucketed membership path in `ops/setops.py`."""
    import hashlib as _hl

    from ..ops.join import semi_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def with_hash(batch: pa.Table) -> pa.Table:
        hs = [
            _hl.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "h": pa.array(hs, type=pa.string()),
            }
        )

    hashed = docs.map_batches(with_hash, batch_format="pyarrow")
    import pyarrow.compute as pc

    prior = hashed.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], INCR_PRIOR_MAX)),
        batch_format="pyarrow",
    )
    inc = hashed.map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], INCR_INC_MIN)),
        batch_format="pyarrow",
    )
    return semi_join(inc, prior, on="h", anti=True).select_columns(
        ["doc_id", "lang"]
    )


BASKET_MIN_SUPPORT = 3


def q_basket_pairs(sf_dir: str):
    """Frequent itemset pairs (market-basket level 2): part pairs
    co-ordered in >= 3 orders — `group_pairs` (order-sharded pair
    expansion, distinct per order) into one pair-sharded support count
    with the HAVING filter applied in-shard."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.triangles import group_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = group_pairs(li, "l_orderkey", "l_partkey", num_shards=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "v"], sort=False).size().reset_index()
        g.columns = ["u", "v", "support"]
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "v"], sort=False)["support"].sum().reset_index()
        return g[g["support"] >= BASKET_MIN_SUPPORT]

    out = sharded_groupby_apply(
        pairs.map_batches(partial, batch_format="pandas"),
        ["u", "v"],
        fold,
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "u": pa.array(df["u"].to_numpy(), type=pa.int64()),
                "v": pa.array(df["v"].to_numpy(), type=pa.int64()),
                "support": pa.array(
                    df["support"].to_numpy(), type=pa.int64()
                ),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_basket_rules(sf_dir: str):
    """Association rules u -> v from the frequent pairs: confidence =
    support(u,v) / item_support(u) >= 1/8, tested by the float-free
    cross-multiplication ``8 * sup_uv >= sup_u`` (both directions of
    each pair).  Item supports are a bounded part-sharded count
    broadcast as a lookup; the pair table streams through a stateless
    filter map."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.setops import distinct_rows

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    item = (
        distinct_rows(li, ["l_orderkey", "l_partkey"], num_shards=16)
        .map_batches(
            lambda df: df.groupby("l_partkey", sort=False)
            .size()
            .rename("n")
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    sup_item = item.groupby("l_partkey")["n"].sum().to_dict()

    pairs = q_basket_pairs(sf_dir)

    def rules(df: pd.DataFrame) -> pa.Table:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        s = df["support"].to_numpy()
        ante = np.concatenate([u, v])
        cons = np.concatenate([v, u])
        sup = np.concatenate([s, s])
        sup_a = pd.Series(ante).map(sup_item).to_numpy(dtype=np.int64)
        keep = 8 * sup >= sup_a
        return pa.table(
            {
                "ante": pa.array(ante[keep], type=pa.int64()),
                "cons": pa.array(cons[keep], type=pa.int64()),
                "sup_pair": pa.array(sup[keep], type=pa.int64()),
                "sup_ante": pa.array(sup_a[keep], type=pa.int64()),
            }
        )

    return pairs.map_batches(rules, batch_format="pandas")


def q_tri_counts(sf_dir: str):
    """Per-part triangle counts over the co-order part graph (parts
    linked when they co-occur in an order).  Graph build is one
    order-sharded pair expansion (`group_pairs`); counting is the
    degree-ordered wedge-closure engine in `ops/triangles.py` — wedge
    volume bounded O(m^1.5) regardless of hot parts."""
    from ..ops.triangles import group_pairs, triangle_counts

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = group_pairs(li, "l_orderkey", "l_partkey", num_shards=32)
    out = triangle_counts(pairs, num_shards=32)

    def typed(df):
        return pa.table(
            {
                "node": pa.array(df["node"], type=pa.int64()),
                "n_tri": pa.array(df["n_tri"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_part_hops(sf_dir: str):
    """Minimum hops from part 1 over the undirected co-order part graph
    (≤3 hops) — level-synchronous BFS in `ops/bfs.py` (broadcast-frontier
    engine; the sharded engine is pinned equal by test)."""
    from ..ops.bfs import khop_min_hops
    from ..ops.triangles import group_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = group_pairs(li, "l_orderkey", "l_partkey", num_shards=32)
    out = khop_min_hops(pairs, [1], src="u", dst="v", max_hops=3, directed=False)

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.int64()),
                "hops": pc.cast(batch["hops"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_embed_classify(sf_dir: str):
    """Nearest-centroid classification of the embedding table against its
    own class centroids — `ops/classify.py` (fit: one pass of per-class
    integer-sum partials; predict: stateless map against the broadcast
    centroid matrix).  Fixed-point arithmetic end-to-end, so this ML
    inference op has an EXACT SQL oracle."""
    from ..ops.classify import nearest_centroid_fit, nearest_centroid_predict

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    labels, cents = nearest_centroid_fit(emb)
    out = nearest_centroid_predict(emb, labels, cents)

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "label": pc.cast(batch["label"], pa.int64()),
                "pred": pc.cast(batch["pred"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_tag_assoc(sf_dir: str):
    """Association-rule confidence between co-mentioned concepts:
    directed (a -> b) with conf = n_co / n_turns(a) — composes
    `ops/comention.co_mention_edges` with a broadcast per-tag turn count
    (concept cardinality is ontology-sized, so the denominator ships
    once); exact integer division makes the SQL mirror bit-equal."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.comention import co_mention_edges

    # materialized: the mention extraction feeds BOTH the per-tag
    # denominators and the co-mention pair build
    m = _mentions(sf_dir).materialize()

    def turn_tag(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"conv_id": batch["conv_id"], "turn_idx": batch["turn_idx"],
             "tag": batch["tag"]}
        )
        return t.group_by(["conv_id", "turn_idx", "tag"]).aggregate([])

    d = m.map_batches(turn_tag, batch_format="pyarrow")

    def count_tag(df):
        g = (
            df.drop_duplicates(["conv_id", "turn_idx", "tag"])
            .groupby("tag", sort=False, as_index=False)
            .size()
        )
        return g.rename(columns={"size": "n"})

    per_tag = sharded_groupby_apply(d, ["tag"], count_tag, 8).to_pandas()
    counts = dict(zip(per_tag["tag"], per_tag["n"]))
    cref = ray.put(counts)

    pairs = co_mention_edges(m, num_shards=16)

    def directed(df):
        import pandas as pd

        cnt = ray.get(cref)
        fwd = pd.DataFrame(
            {"tag_a": df["tag_a"], "tag_b": df["tag_b"], "n_co": df["n_turns"]}
        )
        rev = pd.DataFrame(
            {"tag_a": df["tag_b"], "tag_b": df["tag_a"], "n_co": df["n_turns"]}
        )
        out = pd.concat([fwd, rev], ignore_index=True)
        na = out["tag_a"].map(cnt).to_numpy(dtype=np.int64)
        out["conf"] = out["n_co"].to_numpy(dtype=np.float64) / na
        return pa.table(
            {
                "tag_a": pa.array(out["tag_a"], type=pa.string()),
                "tag_b": pa.array(out["tag_b"], type=pa.string()),
                "n_co": pa.array(out["n_co"], type=pa.int64()),
                "conf": pa.array(np.round(out["conf"], 8), type=pa.float64()),
            }
        )

    return pairs.map_batches(directed, batch_format="pandas")


def q_clustering_coef(sf_dir: str):
    """Local clustering coefficient per part —
    `ops/triangles.clustering_coefficients`: the triangle engine composed
    with the degree table, coef = 2*n_tri / (deg*(deg-1)) rounded to 8.
    The triangle-count attach is threshold-gated like every other graph
    engine: broadcast below `broadcast_max_nodes`, bucketed LEFT hash
    join above it, pinned bit-equal by test."""
    from ..ops.triangles import clustering_coefficients

    return clustering_coefficients(_co_order_pairs(sf_dir), num_shards=32)


def q_part_walks(sf_dir: str):
    """DeepWalk-style corpus prep: one deterministic 3-step random walk
    per part over the co-order graph — `ops/walks.py` (md5-seeded
    neighbor picks over sorted adjacency; one bucketed frontier ⋈
    adjacency exchange per step, reproducible across partitionings and
    in SQL)."""
    from ..ops.walks import random_walks

    out = random_walks(_co_order_pairs(sf_dir), length=3, num_shards=32)

    def typed(df):
        return pa.table(
            {
                "walk_id": pa.array(df["walk_id"], type=pa.int64()),
                "step": pa.array(df["step"], type=pa.int64()),
                "node": pa.array(df["node"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_kg_hits(sf_dir: str):
    """HITS hub/authority scores over the directed KG edge table as
    exact 3-round alternating-path counts — `ops/hits.py` (node-state
    vectors broadcast per half-iteration, one node-sharded contribution
    fold each; integer-exact, so the unrolled SQL join chain is
    bit-equal)."""
    from ..ops.hits import hits_path_counts

    e = q_edges(sf_dir).select_columns(["src", "dst"])
    out = hits_path_counts(e, iters=3, num_shards=16)

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.string()),
                "hub": pc.cast(batch["hub"], pa.int64()),
                "auth": pc.cast(batch["auth"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_conv_json(sf_dir: str):
    """SFT chat-format builder: each conversation as the byte-exact JSON
    array [{"role": ..., "content": ...}, ...] in turn order (the
    training-example serialization step; same byte-exact JSON contract
    as tag_doc_json).  One conv-sharded exchange."""
    import json

    from ..ops.agg import sharded_groupby_apply

    t = read_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    )

    def fold(df):
        import pandas as pd

        df = df[df["text"].notna()].sort_values(
            ["conv_id", "turn_idx"], kind="stable"
        )
        rows = []
        for conv, g in df.groupby("conv_id", sort=False):
            msgs = [
                {"role": r, "content": x}
                for r, x in zip(g["role"], g["text"])
            ]
            rows.append(
                {"conv_id": conv, "n_msgs": len(msgs),
                 "messages": json.dumps(msgs, ensure_ascii=False)}
            )
        return pd.DataFrame(rows, columns=["conv_id", "n_msgs", "messages"])

    out = sharded_groupby_apply(t, ["conv_id"], fold, 16)

    def typed(df):
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], type=pa.string()),
                "n_msgs": pa.array(df["n_msgs"], type=pa.int64()),
                "messages": pa.array(df["messages"], type=pa.string()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_event_ohlc(sf_dir: str):
    """Hourly OHLC bars per event type — `ops/events.ohlc_window`
    (order-dependent first/last carried as (ts, value)-paired partials;
    one (key, window)-sharded exchange).  (event_type, ts) is unique in
    the corpus, so arg_min/arg_max semantics are well-defined."""
    from ..ops.events import ohlc_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    out = ohlc_window(ev, num_shards=16)

    def typed(df):
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "window_start": pa.array(
                    df["window_start"], type=pa.timestamp("us")
                ),
                "open": pa.array(df["open"], type=pa.float64()),
                "high": pa.array(df["high"], type=pa.float64()),
                "low": pa.array(df["low"], type=pa.float64()),
                "close": pa.array(df["close"], type=pa.float64()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_price_hist(sf_dir: str):
    """24-bin fixed-width histogram of order total price —
    `ops/profile.histogram_fixed` (per-batch bincount partials, one tiny
    bin exchange; zero shuffles of data rows)."""
    from ..ops.profile import histogram_fixed

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    return histogram_fixed(orders, "o_totalprice", lo=0.0, hi=600000.0,
                           nbins=24)


def q_cust_orders_left(sf_dir: str):
    """LEFT outer bucketed hash join: every customer against per-customer
    counts of a filtered order subset (o_orderkey % 3 == 0) — unmatched
    customers keep typed-null counts, exercising `bucketed_hash_join`'s
    outer path (one co-bucketed exchange, vectorized per-bucket merge)."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.join import bucketed_hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"custkey": batch["c_custkey"],
             "c_mktsegment": batch["c_mktsegment"]}
        )

    left = cust.map_batches(rekey, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["o_orderkey"] % 3 == 0]
        g = df.groupby("o_custkey", sort=False, as_index=False).size()
        return pa.table(
            {"custkey": pa.array(g["o_custkey"], type=pa.int64()),
             "n_orders": pa.array(g["size"], type=pa.int64())}
        )

    right = sharded_groupby_apply(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["custkey"],
        lambda df: df.groupby("custkey", sort=False, as_index=False)[
            "n_orders"
        ].sum(),
        16,
    )
    out = bucketed_hash_join(left, right, on="custkey", num_buckets=16,
                             how="left")

    def typed(df):
        return pa.table(
            {
                "custkey": pa.array(df["custkey"], type=pa.int64()),
                "c_mktsegment": pa.array(
                    df["c_mktsegment"], type=pa.string(), from_pandas=True
                ),
                "n_orders": pa.array(
                    df["n_orders"], type=pa.int64(), from_pandas=True
                ),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_part_kcore(sf_dir: str):
    """Bounded 2-round 80-core peeling of the co-order part graph —
    `ops/graphstats.kcore_bounded` (per round one degree exchange + one
    survivor-set broadcast filter; bounded iterations keep it
    SQL-mirrorable like the BFS/Bellman-Ford family)."""
    from ..ops.graphstats import kcore_bounded

    out = kcore_bounded(
        _co_order_pairs(sf_dir), k=80, rounds=2, num_shards=32
    )

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.int64()),
                "deg": pc.cast(batch["deg"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_communities(sf_dir: str):
    """Synchronous majority label propagation (2 fixed rounds,
    deterministic smallest-label tie-break) over the co-order part graph
    — `ops/communities.label_propagation`; the oracle unrolls both rounds
    as window-ranked mode CTEs."""
    from ..ops.communities import label_propagation

    return label_propagation(_co_order_pairs(sf_dir), rounds=2, num_shards=32)


def q_embed_quant(sf_dir: str):
    """Symmetric int8 embedding quantization in long form (id, i, code,
    absmax) — `ops/pca.quantize_embeddings` (stateless vectorized map,
    zero exchanges; floor arithmetic so the SQL mirror is bit-equal)."""
    from ..ops.pca import quantize_embeddings

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return quantize_embeddings(emb)


def q_part_rank(sf_dir: str):
    """Parts dense-ranked by total ordered quantity — per-part sum (one
    sharded exchange) then `ops/topk.dense_rank_global` (distinct totals
    broadcast once, ranks attached with a searchsorted; no global
    sort)."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.topk import dense_rank_global

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        df = pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "q": pc.cast(batch["l_quantity"], pa.int64()),
            }
        ).to_pandas()
        g = df.groupby("l_partkey", sort=False, as_index=False)["q"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = sharded_groupby_apply(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"],
        lambda df: df.groupby("l_partkey", sort=False, as_index=False)["q"]
        .sum()
        .rename(columns={"q": "total_qty"}),
        32,
    )
    out = dense_rank_global(totals, "total_qty", ascending=False)

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
                "total_qty": pc.cast(batch["total_qty"], pa.int64()),
                "rank": pc.cast(batch["rank"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_lineitem_checksum(sf_dir: str):
    """Order-independent content checksum of lineitem's key columns —
    `ops/profile.table_checksum` (commutative md5-sum mod 2^61-1; scalar
    partials per batch, nothing corpus-scale moves).  The cross-engine
    migration-validation primitive."""
    from ..ops.profile import table_checksum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )
    return table_checksum(li, ["l_orderkey", "l_partkey", "l_linenumber"])


def q_event_funnel(sf_dir: str):
    """view -> click -> purchase funnel completion counts per step —
    `ops/events.funnel_counts` (one user-sharded exchange; the greedy
    earliest-match chain is len(steps) vectorized filter+min passes per
    shard, matching the SQL MIN(ts)-chaining semantics exactly)."""
    from ..ops.events import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    out = funnel_counts(
        ev, ["view", "click", "purchase"], num_shards=16
    )

    def typed(df):
        return pa.table(
            {
                "step": pa.array(df["step"], type=pa.int64()),
                "n_keys": pa.array(df["n_keys"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_conv_text(sf_dir: str):
    """Conversation assembly — turns rejoined into one role-tagged
    document per conversation (the LM-training document-build step):
    `ops/reshape.collect_strings`, one conv-sharded exchange with a
    vectorized sort + grouped join per shard."""
    from ..ops.reshape import collect_strings

    t = read_transcripts(sf_dir)
    out = collect_strings(
        t, "conv_id", "text", ["turn_idx"], prefix_col="role",
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], type=pa.string()),
                "n_items": pa.array(df["n_items"], type=pa.int64()),
                "full_text": pa.array(df["full_text"], type=pa.string()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_hll_custkeys(sf_dir: str):
    """HyperLogLog register state for distinct customers in orders —
    `ops/sketch.HllSketch` (fixed 1024-register array per block,
    elementwise-max tree combine; order-independent, so the registers
    are bit-equal to the SQL mirror)."""
    from ..ops.sketch import hll_registers

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    return hll_registers(orders, "o_custkey")


def _orders_cdc(sf_dir: str):
    """(snapshot, changes) for the CDC queries: the orders snapshot in
    integer cents plus a deterministic changeset (delete keys % 7 == 0,
    restate keys % 7 == 3, insert shifted new keys from % 7 == 5)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )

    def snap(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderstatus": batch["o_orderstatus"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(batch["o_totalprice"], pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    snapshot = orders.map_batches(snap, batch_format="pyarrow")

    def changes(df):
        import pandas as pd

        k = df["o_orderkey"].to_numpy()
        c = df["cents"].to_numpy()
        out = []
        d = k % 7 == 0
        out.append(
            pd.DataFrame(
                {"o_orderkey": k[d], "o_orderstatus": None, "cents": 0,
                 "op": "delete", "version": 1}
            )
        )
        u = k % 7 == 3
        out.append(
            pd.DataFrame(
                {"o_orderkey": k[u], "o_orderstatus": "X",
                 "cents": c[u] + 100, "op": "upsert", "version": 2}
            )
        )
        i = k % 7 == 5
        out.append(
            pd.DataFrame(
                {"o_orderkey": k[i] + 10_000_000, "o_orderstatus": "N",
                 "cents": 0, "op": "upsert", "version": 1}
            )
        )
        return pd.concat(out, ignore_index=True)

    chg = snapshot.map_batches(changes, batch_format="pandas")
    return snapshot, chg


def q_orders_merge(sf_dir: str):
    """CDC merge: apply a deterministic changeset (delete keys % 7 == 0,
    restate keys % 7 == 3, insert shifted new keys from % 7 == 5) to the
    orders snapshot — `ops/merge.py`, one key-sharded exchange resolving
    last-version-wins upsert/delete semantics."""
    from ..ops.merge import apply_changeset

    snapshot, chg = _orders_cdc(sf_dir)
    out = apply_changeset(snapshot, chg, key="o_orderkey", num_shards=16)

    def typed(df):
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"], type=pa.int64()),
                "o_orderstatus": pa.array(
                    df["o_orderstatus"], type=pa.string(), from_pandas=True
                ),
                "cents": pa.array(df["cents"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_kg_report(sf_dir: str):
    """KG build report — the post-build sanity table an operator reads
    first: one row per node type and per edge relation with its count
    (kind column disambiguates).  Tiny two-sided aggregate over the
    node/edge outputs; the triples build runs ONCE (materialized) and
    both sides derive from it — unioning two independent tag-actor
    pipelines would run two fixed-size pools concurrently."""
    triples = q_triples(sf_dir).materialize()
    onto_rows = clean_ontology(ONTOLOGY, has_category=True)
    nodes = build_nodes(triples, onto_rows)
    edges = triples_to_edges(triples)

    def node_part(df):
        import pandas as pd

        g = df.groupby("node_type", sort=False, as_index=False).size()
        return pd.DataFrame(
            {"kind": "node", "name": g["node_type"], "n": g["size"]}
        )

    def edge_part(df):
        import pandas as pd

        g = df.groupby("rel", sort=False, as_index=False).size()
        return pd.DataFrame({"kind": "edge", "name": g["rel"], "n": g["size"]})

    from ..ops.agg import sharded_groupby_apply

    both = nodes.map_batches(node_part, batch_format="pandas").union(
        edges.map_batches(edge_part, batch_format="pandas")
    )
    out = sharded_groupby_apply(
        both,
        ["kind", "name"],
        lambda df: df.groupby(["kind", "name"], sort=False, as_index=False)[
            "n"
        ].sum(),
        4,
    )

    def typed(df):
        return pa.table(
            {
                "kind": pa.array(df["kind"], type=pa.string()),
                "name": pa.array(df["name"], type=pa.string()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_value_mad(sf_dir: str):
    """Median absolute deviation per event type (robust dispersion):
    two exact discrete-quantile passes — per-key medians broadcast
    between them (`ops/events.key_quantiles` composed with itself).
    Discrete quantiles pick actual data values, so both engines agree
    bit-for-bit with no rounding."""
    from ..ops.events import key_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    med = key_quantiles(ev, quantiles=(0.5,), num_shards=8).to_pandas()
    med_map = dict(zip(med["event_type"], med["p50"]))
    ref = ray.put(med_map)

    def dev(df):
        import pandas as pd

        m = ray.get(ref)
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value": (df["value"] - df["event_type"].map(m)).abs(),
            }
        )

    mad = key_quantiles(
        ev.map_batches(dev, batch_format="pandas"),
        quantiles=(0.5,),
        num_shards=8,
    )

    def typed(df):
        m = ray.get(ref)
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "med": pa.array(
                    df["event_type"].map(m), type=pa.float64()
                ),
                "mad": pa.array(df["p50"], type=pa.float64()),
            }
        )

    return mad.map_batches(typed, batch_format="pandas")


def q_region_rollup(sf_dir: str):
    """Warehouse chain end-to-end: orders enriched with region via two
    broadcast dim joins (customer -> nation -> region), then GROUP BY
    ROLLUP (region, order priority) in exact integer cents —
    `ops/join.broadcast_join` composed with `ops/rollup.rollup_sum`."""
    import pyarrow.parquet as pq_mod

    from ..ops.join import broadcast_join
    from ..ops.rollup import rollup_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )
    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).rename_columns(["o_custkey", "c_nationkey"])
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).rename_columns(["c_nationkey", "n_regionkey"])
    reg = pq_mod.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).rename_columns(["n_regionkey", "r_name"])
    joined = broadcast_join(
        broadcast_join(
            broadcast_join(orders, cust, on="o_custkey", how="left"),
            nat,
            on="c_nationkey",
            how="left",
        ),
        reg,
        on="n_regionkey",
        how="left",
    )

    def cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "r_name": batch["r_name"],
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(batch["o_totalprice"], pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    out = rollup_sum(
        joined.map_batches(cents, batch_format="pyarrow"),
        ["r_name", "o_orderpriority"],
        "cents",
        num_shards=8,
    )

    def typed(df):
        return pa.table(
            {
                "r_name": pa.array(df["r_name"], type=pa.string(),
                                   from_pandas=True),
                "o_orderpriority": pa.array(
                    df["o_orderpriority"], type=pa.string(), from_pandas=True
                ),
                "sum_cents": pa.array(df["sum"], type=pa.int64()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_event_share(sf_dir: str):
    """Ratio-to-report: each event type's share of its hour's total
    volume — hourly counts (tumbling window) + a broadcast of the
    window totals (window count is time-extent-sized, not corpus-sized);
    share is an exact integer ratio rounded to 8."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.events import tumbling_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    hourly = tumbling_window(ev, unit="hour").materialize()

    totals = sharded_groupby_apply(
        hourly.select_columns(["window_start", "n_events"]),
        ["window_start"],
        lambda df: df.groupby("window_start", sort=False, as_index=False)[
            "n_events"
        ].sum(),
        8,
    ).to_pandas()
    tot_map = dict(zip(totals["window_start"], totals["n_events"]))
    ref = ray.put(tot_map)

    def attach(df):
        tm = ray.get(ref)
        tot = df["window_start"].map(tm).to_numpy(dtype=np.float64)
        n = df["n_events"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "window_start": pa.array(
                    df["window_start"], type=pa.timestamp("us")
                ),
                "n_events": pa.array(
                    df["n_events"].astype("int64"), type=pa.int64()
                ),
                "share": pa.array(np.round(n / tot, 8), type=pa.float64()),
            }
        )

    return hourly.map_batches(attach, batch_format="pandas")


def q_lineitem_corr(sf_dir: str):
    """Exact sufficient statistics for the quantity/price correlation
    over lineitem — one row (n, sx, sy, sxx, syy, sxy) of int64 sums
    over integer-quantized values (qty as-is, price in floor dollars):
    per-batch scalar partials, driver fold; Pearson r derives exactly
    from the six integers on either engine."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "syy": pa.array([int((y * y).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow").take_all()
    agg = {
        k: sum(int(p[k]) for p in parts)
        for k in ("n", "sx", "sy", "sxx", "syy", "sxy")
    }
    return pa.table({k: pa.array([v], type=pa.int64()) for k, v in agg.items()})


def q_event_running(sf_dir: str):
    """Global running balance: per-event running sum of integer cents in
    total (ts, event_id) order — `ops/scan.prefix_sum`, one range-sort
    exchange + per-block partial sums with only O(num_blocks) int64
    scalars crossing the driver."""
    from ..ops.scan import prefix_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "event_id": batch["event_id"],
                "t_us": pc.cast(batch["ts"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch["value"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    run = prefix_sum(
        ev.map_batches(prep, batch_format="pyarrow"),
        "cents",
        sort_keys=["t_us", "event_id"],
    )
    return run.select_columns(["event_id", "run_total"])


def q_max_concurrent(sf_dir: str):
    """Interval-concurrency sweep: treat each event as a session of
    ``floor(value)`` seconds and find the maximum number of simultaneously
    open sessions — +1/-1 boundary deltas, global prefix scan, MAX fold.
    Ends sort before starts at equal timestamps (touching intervals do
    not overlap), and since only the MAX of the run is consumed the scan
    tolerates the +1/+1 ties within one timestamp."""
    from ..ops.scan import prefix_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def deltas(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dur = np.floor(
            batch["value"].to_numpy(zero_copy_only=False)
        ).astype(np.int64) * np.int64(1_000_000)
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, s + dur]), type=pa.int64()),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]
                    ),
                    type=pa.int64(),
                ),
            }
        )

    run = prefix_sum(
        ev.map_batches(deltas, batch_format="pyarrow"),
        "d",
        sort_keys=["t", "d"],
        out_column="run",
    )
    peak = run.max("run")
    return pa.table({"max_concurrent": pa.array([peak], type=pa.int64())})


def q_event_deltas(sf_dir: str):
    """Period-over-period event volume: hourly counts per type with the
    delta vs the previous hour — `ops/events.tumbling_window` composed
    with `ops/window.window_over` (the windowed aggregate is
    key+window-sized, so the second exchange is tiny)."""
    from ..ops.events import tumbling_window
    from ..ops.window import window_over

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    hourly = tumbling_window(ev, unit="hour")
    out = window_over(
        hourly,
        keys=["event_type"],
        order_by=["window_start"],
        specs=[("delta", "n_events", "delta_n", 0)],
        num_shards=8,
    )

    def typed(df):
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "window_start": pa.array(
                    df["window_start"], type=pa.timestamp("us")
                ),
                "n_events": pa.array(df["n_events"], type=pa.int64()),
                "delta_n": pa.array(
                    df["delta_n"].astype("int64"), type=pa.int64()
                ),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_tag_pivot(sf_dir: str):
    """Per-turn tag-count matrix (one column per ontology concept) —
    `ops/reshape.pivot` applied to the mention-count long table with the
    ontology's pinned category schema."""
    from ..ops.reshape import pivot

    mc = q_mention_counts(sf_dir)

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            batch["conv_id"],
            pc.cast(batch["turn_idx"], pa.string()),
            "#",
        )
        return pa.table(
            {"turn_key": key, "tag": batch["tag"],
             "n_matches": pc.cast(batch["n_matches"], pa.int64())}
        )

    tags = sorted({t for t, _k, _c in ONTOLOGY})
    out = pivot(
        mc.map_batches(keyed, batch_format="pyarrow"),
        index="turn_key",
        columns_from="tag",
        categories=tags,
        values_from="n_matches",
        agg="sum",
        num_shards=16,
    )

    def typed(df):
        cols = {"turn_key": pa.array(df["turn_key"], type=pa.string())}
        for t in tags:
            cols[t] = pa.array(df[t], type=pa.int64())
        return pa.table(cols)

    return out.map_batches(typed, batch_format="pandas")


def q_diameter_est(sf_dir: str):
    """Double-BFS diameter lower bound on the co-order part graph: BFS
    from part 1 finds the farthest node (ties -> smallest id), a second
    BFS from there gives the classic 2-sweep eccentricity estimate —
    pure composition of `ops/bfs.khop_min_hops`.  One row
    (start, far, ecc1, ecc2).  Hops bounded at 3: the dense co-order
    graph's diameter is ~2, and the bound keeps the SQL mirror's
    recursive path enumeration polynomial.

    The hop tables are node-sized, so they never reach the driver: each
    BFS folds to (eccentricity, argmin node at eccentricity) via per-batch
    partials — the driver sees O(num_blocks) rows, then two ints."""
    from ..ops.bfs import khop_min_hops

    def _ecc_argmin(hops_ds) -> tuple:
        """(max hops, min node among rows at max hops) without pulling the
        node-sized hop table: one partial row per batch, tiny driver fold."""

        def part(batch: pa.Table) -> pa.Table:
            h = batch["hops"].to_numpy(zero_copy_only=False)
            n = batch["node"].to_numpy(zero_copy_only=False)
            if len(h) == 0:
                return pa.table(
                    {"ecc": pa.array([], type=pa.int64()),
                     "node": pa.array([], type=pa.int64())}
                )
            m = h.max()
            return pa.table(
                {"ecc": pa.array([int(m)], type=pa.int64()),
                 "node": pa.array([int(n[h == m].min())], type=pa.int64())}
            )

        parts = hops_ds.map_batches(part, batch_format="pyarrow").to_pandas()
        ecc = int(parts["ecc"].max())
        return ecc, int(parts[parts["ecc"] == ecc]["node"].min())

    pairs = _co_order_pairs(sf_dir).materialize()
    h1 = khop_min_hops(pairs, [1], src="u", dst="v", max_hops=3, directed=False)
    ecc1, far = _ecc_argmin(h1)
    h2 = khop_min_hops(pairs, [far], src="u", dst="v", max_hops=3, directed=False)
    ecc2, _ = _ecc_argmin(h2)
    return pa.table(
        {
            "start": pa.array([1], type=pa.int64()),
            "far": pa.array([far], type=pa.int64()),
            "ecc1": pa.array([ecc1], type=pa.int64()),
            "ecc2": pa.array([ecc2], type=pa.int64()),
        }
    )


def q_user_top_event(sf_dir: str):
    """Most frequent event type per user (grouped mode, ties to the
    smaller value) — `ops/topk.group_mode` (per-batch pair-count
    partials, one key-sharded fold)."""
    from ..ops.topk import group_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    out = group_mode(ev, ["user_id"], "event_type", num_shards=16)

    def typed(df):
        return pa.table(
            {
                "user_id": pa.array(df["user_id"], type=pa.int64()),
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_hll_by_type(sf_dir: str):
    """Per-event-type approximate distinct users as HLL register state —
    `ops/sketch.hll_registers_by`: per-batch register partials (dedup +
    max) make the one group-sharded exchange carry sketch cells, never
    user ids; registers are bit-equal to the SQL mirror per group."""
    from ..ops.sketch import hll_registers_by

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    out = hll_registers_by(ev, "event_type", "user_id", num_shards=8)

    def typed(df):
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "idx": pa.array(df["idx"], type=pa.int64()),
                "rho": pa.array(df["rho"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_distinct_users_by_type(sf_dir: str):
    """EXACT distinct users per event type — the ground-truth companion
    to `hll_by_type`: one (type, user) dedup exchange (per-batch
    pre-dedup bounds it to distinct pairs per block), then a bounded
    per-type count fold."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.setops import distinct_rows

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    pairs = distinct_rows(ev, ["event_type", "user_id"], num_shards=8)

    def count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).size()
        return pd.DataFrame(
            {
                "event_type": g.index.to_numpy(),
                "n_users": g.to_numpy().astype("int64"),
            }
        )

    # distinct pairs are already type-sharded? no — dedup shards on the
    # PAIR; re-shard on type for the count (tiny: one row per pair)
    return sharded_groupby_apply(pairs, ["event_type"], count, num_shards=4)


def q_kg_reciprocity(sf_dir: str):
    """Reciprocity of the directed part->supplier modular graph: how
    many distinct edges have their reverse present (cycle-density audit
    of a KG layer).  Each edge maps to its canonical unordered pair +
    direction flag; ONE pair-sharded exchange counts both-direction
    pairs — no self-join of the edge table."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.setops import distinct_rows

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_linenumber"],
    )

    def mod_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_linenumber"] == 1]
        return pd.DataFrame(
            {
                "src": (df["l_partkey"] % 997).to_numpy(dtype=np.int64),
                "dst": (df["l_suppkey"] * 7 % 997).to_numpy(dtype=np.int64),
            }
        )

    e = distinct_rows(
        li.map_batches(mod_edges, batch_format="pandas"),
        ["src", "dst"],
        num_shards=16,
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy(dtype=np.int64)
        d = df["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "lo": np.minimum(s, d),
                "hi": np.maximum(s, d),
                "fwd": (s <= d).astype(np.int64),
                "rev": (s > d).astype(np.int64),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lo", "hi"], sort=False)[["fwd", "rev"]].sum()
        both = (g["fwd"] > 0) & (g["rev"] > 0)
        # self-loops (lo == hi) are their own reverse
        loops = g.index.get_level_values(0) == g.index.get_level_values(1)
        n_edges = int((g["fwd"] + g["rev"]).sum())
        n_recip = int(
            (g.loc[both & ~loops, ["fwd", "rev"]].to_numpy().sum())
            + g.loc[loops, ["fwd", "rev"]].to_numpy().sum()
        )
        return pd.DataFrame({"n_edges": [n_edges], "n_recip": [n_recip]})

    parts = sharded_groupby_apply(
        e.map_batches(canon, batch_format="pandas"),
        ["lo", "hi"],
        fold,
        num_shards=16,
    ).to_pandas()  # num_shards scalar rows
    return pa.table(
        {
            "n_edges": pa.array([int(parts["n_edges"].sum())], type=pa.int64()),
            "n_recip": pa.array([int(parts["n_recip"].sum())], type=pa.int64()),
        }
    )


def q_user_first_event(sf_dir: str):
    """Accumulating-snapshot fact: each user's FIRST event (type + time,
    (ts, event_id) total order) — `ops/topk.group_argmin`, per-batch
    per-key minima bound the exchange to one row per key per block."""
    from ..ops.topk import group_argmin

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    out = group_argmin(ev, ["user_id"], ["ts", "event_id"], num_shards=16)

    def typed(df):
        return pa.table(
            {
                "user_id": pa.array(df["user_id"], type=pa.int64()),
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "ts": pa.array(df["ts"], type=pa.timestamp("us")),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_lineitem_wsample(sf_dir: str):
    """Probability-proportional sampling of lineitem (keep prob =
    quantity / 50) — `ops/sample.weighted_bernoulli`: the integer
    comparison h * denom < w * 2^60 IS u < w/denom exactly, so the
    sampled row set is bit-equal in SQL.  Stateless filter, zero
    exchanges, retry-reproducible."""
    from ..ops.sample import weighted_bernoulli

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "k": pc.add(
                    pc.multiply(batch["l_orderkey"], pa.scalar(10)),
                    pc.cast(batch["l_linenumber"], pa.int64()),
                ),
                "w": pc.cast(batch["l_quantity"], pa.int64()),
            }
        )

    out = weighted_bernoulli(
        li.map_batches(keyed, batch_format="pyarrow"), "k", "w", 50
    )

    def typed(df):
        return pa.table(
            {
                "k": pa.array(df["k"], type=pa.int64()),
                "w": pa.array(df["w"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_order_ranks(sf_dir: str):
    """PERCENT_RANK + NTILE(4) per priority group over orders —
    `ops/window.window_over` rank kinds (one key-sharded exchange, one
    vectorized pass per shard; exact SQL NTILE bucket-size semantics)."""
    from ..ops.window import window_over

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    out = window_over(
        orders,
        keys=["o_orderpriority"],
        order_by=["o_orderkey"],
        specs=[("percent_rank", None, "pr", None), ("ntile", None, "t4", 4)],
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"], type=pa.int64()),
                "o_orderpriority": pa.array(
                    df["o_orderpriority"], type=pa.string()
                ),
                "pr": pa.array(np.round(df["pr"], 8), type=pa.float64()),
                "t4": pa.array(df["t4"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_orders_diff(sf_dir: str):
    """Row-level diff of the orders snapshot against its merged
    successor — the FUSED `ops/merge.apply_changeset_diff`: merge
    resolution and keyed diff both shard on o_orderkey, so one exchange
    does both (the unfused composition paid two all-to-alls over the
    same rows; pinned equal by test).  Deleted keys surface as
    only_left, restated keys as changed, inserted keys as only_right —
    the drill-down companion to the content checksum."""
    from ..ops.merge import apply_changeset_diff

    snapshot, chg = _orders_cdc(sf_dir)
    out = apply_changeset_diff(snapshot, chg, key="o_orderkey", num_shards=16)

    def typed(df):
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"], type=pa.int64()),
                "status": pa.array(df["status"], type=pa.string()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def _co_order_pairs(sf_dir: str):
    from ..ops.triangles import group_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return group_pairs(li, "l_orderkey", "l_partkey", num_shards=32)


def q_part_assort(sf_dir: str):
    """Newman degree assortativity of the co-order part graph as the
    exact integer rational (m, num, den) — `ops/graphstats.py` (degrees
    broadcast once, four scalar sums folded from per-batch partials)."""
    from ..ops.graphstats import degree_assortativity

    return degree_assortativity(_co_order_pairs(sf_dir), num_shards=32)


def q_degree_hist(sf_dir: str):
    """Power-of-two degree histogram of the co-order part graph —
    node-sized table, one tiny bucket exchange."""
    from ..ops.graphstats import degree_histogram

    out = degree_histogram(_co_order_pairs(sf_dir), num_shards=32)

    def typed(df):
        return pa.table(
            {
                "bucket": pa.array(df["bucket"], type=pa.int64()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_embed_cov(sf_dir: str):
    """Exact fixed-point covariance numerator over the embedding table
    (`ops/pca.py`): per-batch (n, sum, gram) moment partials tree-combine
    to a single d x d matrix — integer arithmetic over floor(x * 2^20)
    quantization so the SQL mirror is bit-equal.  The float PCA built on
    the same pass is test-verified (planted-subspace recovery)."""
    from ..ops.pca import covariance_fixedpoint

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return covariance_fixedpoint(emb, scale_bits=20)


def q_token_lift(sf_dir: str):
    """PMI-style association lift for co-occurring token pairs over the
    documents corpus — `ops/assoc.py` (df floor broadcast, doc-sharded
    pair expansion with per-shard partials, pair-sharded sum).  Lift is
    kept as the exact rational (n_docs * n_co) / (df_u * df_v) so the
    SQL mirror hash-matches (same idiom as BM25's rational idf)."""
    from ..ops.assoc import token_lift_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = token_lift_pairs(docs, min_df=50, min_co=25, num_shards=16)

    def typed(df):
        return pa.table(
            {
                "u": pa.array(df["u"], type=pa.string()),
                "v": pa.array(df["v"], type=pa.string()),
                "n_co": pa.array(df["n_co"], type=pa.int64()),
                "lift": pa.array(np.round(df["lift"], 8), type=pa.float64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP (priority, status) over orders: sum of total
    price in exact integer cents + row count at every prefix level
    (leaf, per-priority, grand) — `ops/rollup.py`, one leading-key
    exchange + a num_shards-row grand fold."""
    from ..ops.rollup import rollup_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderstatus": batch["o_orderstatus"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(batch["o_totalprice"], pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    out = rollup_sum(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        "cents",
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    df["o_orderpriority"], type=pa.string(), from_pandas=True
                ),
                "o_orderstatus": pa.array(
                    df["o_orderstatus"], type=pa.string(), from_pandas=True
                ),
                "sum_cents": pa.array(df["sum"], type=pa.int64()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_orders_cube(sf_dir: str):
    """GROUP BY CUBE (status, priority) over orders: all four grouping
    sets (leaf, per-status, per-priority, grand) with exact integer-cents
    sums — `ops/rollup.cube_sum`, map-side 2^n grouping-set expansion of
    per-batch partials + ONE full-key-tuple exchange."""
    from ..ops.rollup import cube_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(batch["o_totalprice"], pa.scalar(100.0))
                    ),
                    pa.int64(),
                ),
            }
        )

    out = cube_sum(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        "cents",
        num_shards=16,
    )

    def typed(df):
        return pa.table(
            {
                "o_orderstatus": pa.array(
                    df["o_orderstatus"], type=pa.string(), from_pandas=True
                ),
                "o_orderpriority": pa.array(
                    df["o_orderpriority"], type=pa.string(), from_pandas=True
                ),
                "sum_cents": pa.array(df["sum"], type=pa.int64()),
                "n": pa.array(df["n"], type=pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pandas")


def q_cheap_paths(sf_dir: str):
    """Bounded-hop weighted shortest paths from part 1 over the co-order
    part graph; edge weight = MIN over orders of the two line numbers'
    sum (integers, so both engines and the SQL mirror agree exactly).
    Level-synchronous Bellman-Ford in `ops/paths.py` (broadcast engine;
    sharded pinned equal by test)."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.paths import bounded_shortest_paths

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )

    def emit(df):
        import pandas as pd

        # min line number per (order, part) first: min over (i, j) of
        # (ln_i + ln_j) factorizes into min(ln_u) + min(ln_v)
        df = df.sort_values("l_linenumber", kind="stable").drop_duplicates(
            ["l_orderkey", "l_partkey"]
        )
        u_out, v_out, w_out = [], [], []
        for _, g in df.groupby("l_orderkey", sort=False):
            p = g["l_partkey"].to_numpy()
            ln = g["l_linenumber"].to_numpy()
            order = np.argsort(p, kind="stable")
            p, ln = p[order], ln[order]
            k = len(p)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            u_out.append(p[ii])
            v_out.append(p[jj])
            w_out.append(ln[ii] + ln[jj])
        if not u_out:
            return pd.DataFrame(
                {"u": pd.Series([], dtype=np.int64),
                 "v": pd.Series([], dtype=np.int64),
                 "w": pd.Series([], dtype=np.int64)}
            )
        part = pd.DataFrame(
            {"u": np.concatenate(u_out), "v": np.concatenate(v_out),
             "w": np.concatenate(w_out)}
        )
        return part.groupby(["u", "v"], sort=False, as_index=False)["w"].min()

    pairs = sharded_groupby_apply(li, ["l_orderkey"], emit, 32)

    def pair_min(df):
        return df.groupby(["u", "v"], sort=False, as_index=False)["w"].min()

    wedges = sharded_groupby_apply(pairs, ["u", "v"], pair_min, 32)
    out = bounded_shortest_paths(
        wedges, [1], src="u", dst="v", weight="w", max_hops=3
    )

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.int64()),
                "cost": pc.cast(batch["cost"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


def q_link_predict(sf_dir: str):
    """Adjacency-Jaccard link-prediction scores over the KG edge table:
    node pairs sharing a neighbor, with common count, Jaccard of the
    adjacency sets, and an is_edge flag — the wedge-expansion /
    pair-reduce engine in `ops/neighbors.py` (pair partials pre-counted
    per shard; degrees broadcast once).  Centers with degree > 64 are
    skipped (the standard hub-cap approximation — a neighbor shared by
    everyone carries no link-prediction signal), which bounds the wedge
    exchange at Θ(64 · |E|) regardless of concept/tool hub growth; the
    oracle mirrors the cap exactly."""
    from ..ops.neighbors import common_neighbor_scores

    e = q_edges(sf_dir).select_columns(["src", "dst"])
    out = common_neighbor_scores(
        e, u="src", v="dst", num_shards=16, min_common=1,
        max_center_degree=64,
    )

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "u": pc.cast(batch["u"], pa.string()),
                "v": pc.cast(batch["v"], pa.string()),
                "common": pc.cast(batch["common"], pa.int64()),
                "jaccard": pc.round(batch["jaccard"], 8),
                "is_edge": pc.cast(batch["is_edge"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_approx_counts(sf_dir: str):
    """Count-Min point estimates for the event types — bounded-size sketch
    exchange (depth x width ints per block), exactly mirrored in SQL."""
    from ..ops.sketch import countmin_counts

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return countmin_counts(ev, "event_type", probes=EVENT_TYPES, depth=4, width=512)


def q_event_pivot(sf_dir: str):
    """Per-user event-type counts as a wide table (pivot with a pinned
    category schema)."""
    from ..ops.reshape import pivot

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return pivot(events, index="user_id", columns_from="event_type",
                 categories=EVENT_TYPES)


def q_lineitem_melt(sf_dir: str):
    """Wide -> long explode of the lineitem charge columns."""
    from ..ops.reshape import melt

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"],
    )
    return melt(
        li,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="amount",
    )


def q_custs_no_orders(sf_dir: str):
    """SQL EXCEPT: customers who never placed an urgent order."""
    from ..ops.setops import except_rows

    custs = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    urgent = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .filter(expr="o_orderpriority == '1-URGENT'")
        .select_columns(["o_custkey"])
    )
    return except_rows(custs, urgent, cols=["c_custkey"])


def q_click_buyers(sf_dir: str):
    """SQL INTERSECT: users who both clicked and purchased."""
    from ..ops.setops import intersect_rows

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    clickers = ev.filter(expr="event_type == 'click'").select_columns(["user_id"])
    buyers = ev.filter(expr="event_type == 'purchase'").select_columns(["user_id"])
    return intersect_rows(clickers, buyers, cols=["user_id"])


def q_lang_sample(sf_dir: str):
    """Deterministic 5-doc sample per language (md5-ranked reservoir)."""
    from ..ops.sample import group_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return group_sample(docs, group_column="lang", key_column="doc_id", k=5)


def q_order_windows(sf_dir: str):
    """Per-customer ordered window functions over orders: row_number,
    lagged price, and a running total — SQL's OVER (PARTITION BY custkey
    ORDER BY orderdate, orderkey) family on one sharded shuffle.  The
    running total is in integer cents: float summation order is engine-
    defined, int summation is exact everywhere."""
    from ..ops.window import window_over

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def add_cents(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return batch.append_column("cents", cents)

    out = window_over(
        orders.map_batches(add_cents, batch_format="pyarrow"),
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        specs=[
            ("row_number", None, "rn", None),
            ("lag", "o_totalprice", "prev_price", (1, -1.0)),
            ("cumsum", "cents", "run_total_cents", None),
            ("rolling_sum", "cents", "roll3", 3),
        ],
    )

    def cast_roll(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch.schema.get_field_index("roll3")
        return batch.set_column(
            i, "roll3", pc.cast(batch["roll3"], pa.int64())
        )

    return out.map_batches(cast_roll, batch_format="pyarrow").select_columns(
        ["o_orderkey", "o_custkey", "rn", "prev_price", "run_total_cents", "roll3"]
    )


SUBSTR_K = 8  # window width in words: 50 tokens in Lee et al.'s production
#               setting; 8 keeps the tiny-vocabulary sf corpora non-vacuous


def q_dup_spans(sf_dir: str):
    """Within-corpus exact-substring dedup profile (Lee et al. 2021):
    per-doc count/spans/coverage of word 8-grams duplicated across >= 2
    distinct documents."""
    from ..ops.substring import duplicate_span_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return duplicate_span_stats(docs, k=SUBSTR_K)


def q_dedup_substring(sf_dir: str):
    """Corpus rebuilt with every duplicated 8-gram span removed (all
    occurrences; whitespace canonicalized)."""
    from ..ops.substring import drop_duplicate_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return drop_duplicate_spans(docs, k=SUBSTR_K)


PACK_CAPACITY = 256  # tokens per packed sequence; docs are <= ~100 tokens
PACK_SHARDS = 8
MIX_WEIGHTS = {"en": 0.5, "fr": 2.0, "de": 1.25, "es": 0.0, "zh": 1.0}


def q_pack_docs(sf_dir: str):
    """Sequence packing: greedy token-budget bin assignment per md5
    shard (deterministic, cluster-layout-invariant)."""
    from ..ops.pack import pack_bins

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pack_bins(docs, capacity=PACK_CAPACITY, num_shards=PACK_SHARDS)


def q_mix_langs(sf_dir: str):
    """Deterministic mixture resampling: replicate/downsample per-language
    slices to a target weight (es dropped, fr doubled, en halved, ...)."""
    from ..ops.pack import mix_weighted

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return mix_weighted(docs, MIX_WEIGHTS)


KG_NEG_K = 4


def q_kg_negatives(sf_dir: str):
    """Filtered corrupt-tail negative samples for KG-embedding training:
    per positive mention triple, up to K deterministic negatives drawn by
    the md5 contract from the (broadcast, ontology-sized) concept
    vocabulary — one streaming map_batches, zero shuffle
    (`ops/negatives.py`)."""
    from ..ops.negatives import corrupt_tail_negatives
    from .tag import extract_mention_counts

    mentions = extract_mention_counts(read_transcripts(sf_dir), ONTOLOGY, _cfg())
    return corrupt_tail_negatives(
        mentions, [t for t, _, _ in ONTOLOGY], k=KG_NEG_K
    )


def q_kg_eval(sf_dir: str):
    """Link-prediction eval harness over the corrupt-tail negatives: rank
    each positive concept against its negatives by the popularity
    baseline (concept in-degree desc, id asc — the standard floor any
    learned KG-embedding must beat) and fold hits@1 / hits@3 / rank-sum
    as exact integers.  Degrees are ontology-sized (driver fold of batch
    partials); beats aggregate per subject in one negative-volume
    exchange; positives with no surviving negative rank 1 by identity,
    so no positive join is needed."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.negatives import corrupt_tail_negatives
    from .tag import extract_mention_counts

    mentions = extract_mention_counts(
        read_transcripts(sf_dir), ONTOLOGY, _cfg()
    ).materialize()  # consumed thrice: degrees, positives count, negatives
    negs = corrupt_tail_negatives(
        mentions, [t for t, _, _ in ONTOLOGY], k=KG_NEG_K
    )

    deg_parts = mentions.map_batches(
        lambda df: df["tag"].value_counts().rename_axis("tag").reset_index(
            name="n"
        ),
        batch_format="pandas",
    ).to_pandas()  # <= ontology x blocks rows
    deg = {
        f"concept:{t}": int(n)
        for t, n in deg_parts.groupby("tag")["n"].sum().items()
    }

    def beat_partial(df: pd.DataFrame) -> pd.DataFrame:
        dp = df["pos_obj"].map(deg).to_numpy()
        dn = df["neg_obj"].map(deg).to_numpy()
        beats = (dn > dp) | (
            (dn == dp) & (df["neg_obj"].to_numpy() < df["pos_obj"].to_numpy())
        )
        g = pd.DataFrame({"subj": df["subj"], "b": beats.astype(np.int64)})
        return g.groupby("subj", as_index=False)["b"].sum()

    beats = sharded_groupby_apply(
        negs.map_batches(beat_partial, batch_format="pandas"),
        ["subj"],
        lambda df: df.groupby("subj", as_index=False)["b"].sum(),
        num_shards=16,
    )

    def scal(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n1": [int((df["b"] >= 1).sum())],
                "n3": [int((df["b"] >= 3).sum())],
                "sb": [int(df["b"].sum())],
            }
        )

    s = beats.map_batches(scal, batch_format="pandas").to_pandas().sum()
    n_pos = mentions.count()
    return pa.table(
        {
            "n_pos": pa.array([n_pos], type=pa.int64()),
            "hits1": pa.array([n_pos - int(s["n1"])], type=pa.int64()),
            "hits3": pa.array([n_pos - int(s["n3"])], type=pa.int64()),
            "sum_rank": pa.array([n_pos + int(s["sb"])], type=pa.int64()),
        }
    )


def q_neighbor_mean(sf_dir: str):
    """One GNN message-passing layer over the co-order part graph: per
    part, the neighbor count and exact integer floor-mean of the
    neighbors' p_size — the raw `group_pairs` stream feeds
    `dedup_pairs=True`, which dedups cross-group pair copies INSIDE the
    node-sharded aggregate exchange instead of `canonical_edges`'
    dedicated pair all-to-all: one exchange saved (`ops/gnn.py`)."""
    from ..ops.gnn import neighbor_feature_mean
    from ..ops.triangles import group_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = group_pairs(li, "l_orderkey", "l_partkey", num_shards=32)
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )

    import pyarrow.compute as pc

    def as_feat(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pc.cast(batch["p_partkey"], pa.int64()),
                "p_size": pc.cast(batch["p_size"], pa.int64()),
            }
        )

    out = neighbor_feature_mean(
        edges,
        parts.map_batches(as_feat, batch_format="pyarrow"),
        feat_col="p_size",
        dedup_pairs=True,
    )

    def typed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(batch["node"], pa.int64()),
                "n_nbrs": pc.cast(batch["n_nbrs"], pa.int64()),
                "mean_feat": pc.cast(batch["mean_feat"], pa.int64()),
            }
        )

    return out.map_batches(typed, batch_format="pyarrow")


QUALITY_GATE_Q = 0.25


def q_quality_gate(sf_dir: str):
    """Per-language quality gate: drop each language's shortest quartile
    (n_chars below the per-lang discrete p25) — exact two-pass
    quantile-threshold filter (`ops/sample.py:group_quantile_filter`)."""
    from ..ops.sample import group_quantile_filter

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return group_quantile_filter(docs, "lang", "n_chars", QUALITY_GATE_Q)


def q_retention(sf_dir: str):
    """Weekly retention-cohort matrix over the events table: one
    user-sharded exchange + a bounded (weeks x weeks) final fold
    (`ops/events.py:retention_cohorts`)."""
    from ..ops.events import retention_cohorts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return retention_cohorts(ev)


def q_doc_tree(sf_dir: str):
    """Subtree (n_leaves, total n_chars) per node of the radix-10 doc-id
    hierarchy — computable-parent rollup, flat ancestor expansion +
    one exchange (`ops/rollup.py:hierarchy_rollup`)."""
    from ..ops.rollup import hierarchy_rollup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return hierarchy_rollup(docs, "doc_id", "n_chars", base=10)


def q_node_ids(sf_dir: str):
    """Dense 0..N-1 entity numbering of the KG node table in node_id
    order — the embedding-trainer handoff (`ops/index.py:zip_with_index`,
    the documented raw-task exception: block offsets from metadata only)."""
    from ..ops.index import zip_with_index

    nodes = q_nodes(sf_dir).select_columns(["node_id", "node_type"])
    return zip_with_index(nodes, sort_key="node_id", id_col="rank")


def q_hist_quantiles(sf_dir: str):
    """Mergeable histogram-quantile sketch of event value per event_type
    (bounded-memory companion to the exact key_quantiles; bin counts, not
    values, cross the wire — `ops/sketch.py:histogram_quantiles`)."""
    from ..ops.sketch import histogram_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return histogram_quantiles(ev, "event_type", "value")


HARMONIC_SEEDS = [1, 2, 3, 4]


def q_harmonic(sf_dir: str):
    """Landmark-estimated harmonic centrality over the co-order part
    graph: per-seed BFS distances from 4 sampled landmarks
    (`ops/bfs.multi_source_hops` — one edge pass per level tracking all
    seeds), then per node the reached-landmark count and the integer
    harmonic sum Σ 6/d over d ∈ {1, 2} (6 is divisible by every bounded
    hop count, so the score is exact int64 and the SQL mirror is
    bit-equal)."""
    from ..ops.agg import sharded_groupby_apply
    from ..ops.bfs import multi_source_hops

    hops = multi_source_hops(
        _co_order_pairs(sf_dir), HARMONIC_SEEDS, src="u", dst="v", max_hops=2,
        directed=False,
    )

    def fold(df):
        import pandas as pd

        d = df[df["hops"] > 0].copy()
        d["c"] = 6 // d["hops"]
        g = d.groupby("node", sort=False).agg(
            n_seeds=("seed", "size"), h6=("c", "sum")
        )
        return pd.DataFrame(
            {
                "node": g.index.to_numpy(),
                "n_seeds": g["n_seeds"].to_numpy().astype("int64"),
                "h6": g["h6"].to_numpy().astype("int64"),
            }
        )

    return sharded_groupby_apply(hops, ["node"], fold, num_shards=16)


def q_value_buckets(sf_dir: str):
    """Equi-depth quartile bucket per event (within event_type): exact
    quantile grid broadcast as a LUT, stateless map, zero row exchange
    (`ops/feature.py:quantile_bucketize`)."""
    from ..ops.feature import quantile_bucketize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return quantile_bucketize(ev, "event_type", "value", n_buckets=4)


# --- registry --------------------------------------------------------------

QUERIES: Dict[str, Callable] = {
    "transcripts": q_transcripts,
    "orders_cube": q_orders_cube,
    "event_running": q_event_running,
    "max_concurrent": q_max_concurrent,
    "ppr_concepts": q_ppr,
    "wl_colors": q_wl_colors,
    "mention_context": q_mention_context,
    "part_scc": q_part_scc,
    "heavy_tokens": q_heavy_tokens,
    "bloom_join": q_bloom_join,
    "zorder_tiles": q_zorder_tiles,
    "user_first_event": q_user_first_event,
    "kg_katz": q_kg_katz,
    "kg_butterflies": q_kg_butterflies,
    "topic_shifts": q_topic_shifts,
    "scc_dag_depth": q_scc_dag_depth,
    "hll_by_type": q_hll_by_type,
    "tool_stats": q_tool_stats,
    "co_mentions_adj": q_co_mentions_adj,
    "mlm_pairs": q_mlm_pairs,
    "curriculum": q_curriculum,
    "distinct_users_by_type": q_distinct_users_by_type,
    "kg_reciprocity": q_kg_reciprocity,
    "concept_lifespan": q_concept_lifespan,
    "conv_features": q_conv_features,
    "part_truss": q_part_truss,
    "conv_dot": q_conv_dot,
    "wl_classes": q_wl_classes,
    "kg_eval": q_kg_eval,
    "basket_pairs": q_basket_pairs,
    "basket_rules": q_basket_rules,
    "conv_splits": q_conv_splits,
    "tag_match": q_tag_match,
    "tag_doc": q_tag_doc,
    "tag_doc_json": q_tag_doc_json,
    "mention_counts": q_mention_counts,
    "concept_scores": q_concept_scores,
    "triples": q_triples,
    "edges": q_edges,
    "nodes": q_nodes,
    "pagerank": q_pagerank,
    "profile": q_profile,
    "chunk_docs": q_chunk_docs,
    "bm25_top": q_bm25,
    "co_mentions": q_co_mentions,
    "hub_nodes": q_hub_nodes,
    "suppliers_by_region": q_suppliers_by_region,
    "part_brands": q_part_brands,
    "concept_rank": q_concept_rank,
    "approx_counts": q_approx_counts,
    "doc_splits": q_doc_splits,
    "lm_scores": q_lm_scores,
    "order_zscore": q_order_zscore,
    "incr_new_docs": q_incr_new_docs,
    "tri_counts": q_tri_counts,
    "part_hops": q_part_hops,
    "link_predict": q_link_predict,
    "cheap_paths": q_cheap_paths,
    "orders_rollup": q_orders_rollup,
    "token_lift": q_token_lift,
    "embed_cov": q_embed_cov,
    "part_assort": q_part_assort,
    "degree_hist": q_degree_hist,
    "orders_merge": q_orders_merge,
    "orders_diff": q_orders_diff,
    "order_ranks": q_order_ranks,
    "lineitem_wsample": q_lineitem_wsample,
    "user_top_event": q_user_top_event,
    "diameter_est": q_diameter_est,
    "tag_pivot": q_tag_pivot,
    "event_deltas": q_event_deltas,
    "lineitem_corr": q_lineitem_corr,
    "event_share": q_event_share,
    "region_rollup": q_region_rollup,
    "value_mad": q_value_mad,
    "kg_report": q_kg_report,
    "hll_custkeys": q_hll_custkeys,
    "conv_text": q_conv_text,
    "conv_json": q_conv_json,
    "kg_hits": q_kg_hits,
    "part_walks": q_part_walks,
    "clustering_coef": q_clustering_coef,
    "event_funnel": q_event_funnel,
    "lineitem_checksum": q_lineitem_checksum,
    "part_rank": q_part_rank,
    "embed_quant": q_embed_quant,
    "part_kcore": q_part_kcore,
    "cust_orders_left": q_cust_orders_left,
    "price_hist": q_price_hist,
    "event_ohlc": q_event_ohlc,
    "tag_assoc": q_tag_assoc,
    "embed_classify": q_embed_classify,
    "doc_tags": q_doc_tags,
    "conv_stats": q_conv_stats,
    "tag_overlap": q_tag_overlap,
    "tag_casefold": q_tag_casefold,
    "tag_lemma": q_tag_lemma,
    "tag_lemma_nl": q_tag_lemma_nl,
    "tag_lemma_sv": q_tag_lemma_sv,
    "tag_diacritics": q_tag_diacritics,
    "distinct_langs": q_distinct_langs,
    "dedup_exact": q_dedup_exact,
    "dedup_keep_first": q_dedup_keep_first,
    "top_tags": q_top_tags,
    "token_counts": q_token_counts,
    "quality": q_quality,
    "fingerprint": q_fingerprint,
    "lang_id": q_lang_id,
    "ann_topk": q_ann_topk,
    "minhash_pairs": q_minhash_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "dup_clusters": q_dup_clusters,
    "prep_corpus": q_prep_corpus,
    "conv_top_tags": q_conv_top_tags,
    "ann_ivf": q_ann_ivf,
    "asof_clicks": q_asof_clicks,
    "event_sessions": q_event_sessions,
    "value_quantiles": q_value_quantiles,
    "sliding_window": q_sliding_window,
    "sample_det": q_sample_det,
    "sample_stratified": q_sample_stratified,
    "ngram_top": q_ngram_top,
    "simhash_pairs": q_simhash_pairs,
    "embedding_near": q_embedding_near,
    "semdedup": q_semdedup,
    "entity_resolve": q_entity_resolve,
    "bpe_pairs": q_bpe_pairs,
    "concept_trends": q_concept_trends,
    "communities": q_communities,
    "media_features": q_media_features,
    "events_window": q_events_window,
    "sessionize": q_sessionize,
    "join_broadcast": q_join_broadcast,
    "join_bucketed": q_join_bucketed,
    "decontam": q_decontam,
    "redact": q_redact,
    "orders_semi": q_orders_semi,
    "orders_anti": q_orders_anti,
    "order_windows": q_order_windows,
    "repetition": q_repetition,
    "tfidf_top": q_tfidf_top,
    "approx_distinct": q_approx_distinct,
    "event_pivot": q_event_pivot,
    "lineitem_melt": q_lineitem_melt,
    "custs_no_orders": q_custs_no_orders,
    "click_buyers": q_click_buyers,
    "lang_sample": q_lang_sample,
    "dup_spans": q_dup_spans,
    "dedup_substring": q_dedup_substring,
    "pack_docs": q_pack_docs,
    "mix_langs": q_mix_langs,
    "kg_negatives": q_kg_negatives,
    "neighbor_mean": q_neighbor_mean,
    "quality_gate": q_quality_gate,
    "retention": q_retention,
    "doc_tree": q_doc_tree,
    "node_ids": q_node_ids,
    "hist_quantiles": q_hist_quantiles,
    "value_buckets": q_value_buckets,
    "harmonic": q_harmonic,
}

def _overlap_oracle_sql() -> str:
    """Exact SQL replay of ``filter_longest`` (spaCy filter_spans) for the
    overlap ontology: enumerate every token-level match per turn, rank by
    (length DESC, start ASC), then a RECURSIVE CTE walks the ranks carrying
    the kept-interval list and keeps a span iff it overlaps none kept so
    far — the same greedy the engine runs, including the chain case where a
    span survives because its dominator was itself dominated.  Spans are
    encoded as start*1000+end ints (turns are far below 1000 tokens)."""
    span_cases = []
    for tag, kw, _cat in OVERLAP_ONTOLOGY:
        toks = kw.split(" ")
        length = len(toks)
        cond = " AND ".join(f"ws[i+{j}]='{t}'" for j, t in enumerate(toks))
        span_cases.append(
            f"SELECT conv_id, turn_idx, '{tag}' AS tag, '{kw}' AS keyword, "
            f"u.i AS s, u.i + {length} AS e "
            f"FROM w, unnest(list_filter(generate_series(1, len(ws)-{length-1}), "
            f"i -> {cond})) AS u(i)"
        )
    spans_sql = " UNION ALL ".join(span_cases)
    return f"""
        WITH RECURSIVE t AS ({TRANSCRIPTS_SQL}),
        w AS (SELECT conv_id, turn_idx, str_split(text, ' ') AS ws FROM t),
        spans AS ({spans_sql}),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                                ORDER BY (e - s) DESC, s ASC, tag ASC) AS rn
                   FROM spans),
        greedy AS (
          SELECT conv_id, turn_idx, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS kept,
                 CAST(NULL AS VARCHAR) AS tag, CAST(NULL AS VARCHAR) AS keyword, FALSE AS is_kept
          FROM (SELECT DISTINCT conv_id, turn_idx FROM ranked)
          UNION ALL
          SELECT r.conv_id, r.turn_idx, r.rn,
                 CASE WHEN len(list_filter(g.kept, k -> (k // 1000) < r.e AND r.s < (k % 1000))) = 0
                      THEN list_append(g.kept, r.s * 1000 + r.e) ELSE g.kept END,
                 r.tag, r.keyword,
                 len(list_filter(g.kept, k -> (k // 1000) < r.e AND r.s < (k % 1000))) = 0
          FROM greedy g JOIN ranked r
            ON r.conv_id = g.conv_id AND r.turn_idx = g.turn_idx AND r.rn = g.rn + 1
        )
        SELECT conv_id, turn_idx, tag, keyword, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM greedy WHERE is_kept GROUP BY 1, 2, 3, 4
    """


ORACLE_SQL: Dict[str, str] = {
    "transcripts": TRANSCRIPTS_SQL,
    "tag_match": f"""
        WITH {_T_CTE}, {_ONTO_CTE},
        m AS (SELECT t.conv_id, t.turn_idx, onto.category AS tag_category,
                     onto.tag, onto.keyword AS tag_keyword, t.text AS tag_sentence
              FROM t, onto
              WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b'))
        SELECT t.conv_id, t.turn_idx, t.role, t.text,
               m.tag_category, m.tag, m.tag_keyword, m.tag_sentence,
               t.tool, t.ts, t.lang
        FROM t LEFT JOIN m USING (conv_id, turn_idx)
    """,
    "tag_doc": f"""
        WITH {_T_CTE}, {_ONTO_CTE},
        occ AS (SELECT t.conv_id, t.turn_idx, onto.tag, onto.category, onto.keyword,
                       strpos(t.text, onto.keyword) AS p
                FROM t, onto
                WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b')),
        tagpos AS (SELECT conv_id, turn_idx, category, tag, MIN(p) AS minp
                   FROM occ GROUP BY 1,2,3,4),
        cat AS (SELECT conv_id, turn_idx, category,
                       '["' || string_agg(tag, '", "' ORDER BY minp) || '"]' AS tag_json
                FROM tagpos GROUP BY 1,2,3),
        catp AS (SELECT conv_id, turn_idx,
            MAX(CASE WHEN category='tech' THEN tag_json END) AS tag_list_tech,
            MAX(CASE WHEN category='op' THEN tag_json END) AS tag_list_op,
            MAX(CASE WHEN category='pattern' THEN tag_json END) AS tag_list_pattern,
            MAX(CASE WHEN category='buzz' THEN tag_json END) AS tag_list_buzz,
            MAX(CASE WHEN category='entity' THEN tag_json END) AS tag_list_entity
            FROM cat GROUP BY 1,2),
        kwpos AS (SELECT conv_id, turn_idx, keyword, MIN(p) AS p FROM occ GROUP BY 1,2,3),
        kw AS (SELECT conv_id, turn_idx,
                      '["' || string_agg(keyword, '", "' ORDER BY p) || '"]' AS tag_keywords
               FROM kwpos GROUP BY 1,2)
        SELECT t.conv_id, t.turn_idx, t.role, t.text,
               catp.tag_list_tech, catp.tag_list_op, catp.tag_list_pattern,
               catp.tag_list_buzz, catp.tag_list_entity,
               kw.tag_keywords,
               CASE WHEN kw.tag_keywords IS NOT NULL THEN t.text || chr(10) ELSE '' END AS tag_sentences,
               t.tool, t.ts, t.lang
        FROM t LEFT JOIN catp USING (conv_id, turn_idx) LEFT JOIN kw USING (conv_id, turn_idx)
    """,
    "tag_doc_json": f"""
        WITH {_T_CTE}, {_ONTO_CTE},
        occ AS (SELECT t.conv_id, t.turn_idx, onto.tag, onto.category, onto.keyword,
                       strpos(t.text, onto.keyword) AS p, t.text,
                       len(regexp_extract_all(t.text, '\\b' || onto.keyword || '\\b')) AS n
                FROM t, onto
                WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b')),
        perkw AS (SELECT conv_id, turn_idx, category, tag, keyword,
                         MIN(p) AS kwp, CAST(SUM(n) AS BIGINT) AS n, ANY_VALUE(text) AS text
                  FROM occ GROUP BY 1,2,3,4,5),
        pertag AS (SELECT conv_id, turn_idx, category, tag, MIN(kwp) AS tagp,
                          '"' || tag || '": ' ||
                          '{{"count": ' || CAST(CAST(SUM(n) AS BIGINT) AS VARCHAR) ||
                          ', "sentences": ["' || ANY_VALUE(text) ||
                          '"], "keywords": ["' || string_agg(keyword, '", "' ORDER BY kwp) || '"]}}' AS tag_entry
                   FROM perkw GROUP BY 1,2,3,4),
        percat AS (SELECT conv_id, turn_idx, category, MIN(tagp) AS catp,
            '"' || category || '": [' || string_agg('"' || tag || '"', ', ' ORDER BY tagp) || ']' AS cat_entry,
            '"' || category || '": {{' || string_agg(tag_entry, ', ' ORDER BY tagp) || '}}' AS cat_full
            FROM pertag GROUP BY 1,2,3),
        perturn AS (SELECT conv_id, turn_idx,
            '{{' || string_agg(cat_entry, ', ' ORDER BY catp) || '}}' AS tag_json_categories,
            '{{' || string_agg(cat_full, ', ' ORDER BY catp) || '}}' AS tag_json_full
            FROM percat GROUP BY 1,2)
        SELECT t.conv_id, t.turn_idx, t.role, t.text,
               p.tag_json_categories, p.tag_json_full, t.tool, t.ts, t.lang
        FROM t LEFT JOIN perturn p USING (conv_id, turn_idx)
    """,
    "mention_counts": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT conv_id, turn_idx, tag, keyword, n_matches FROM occ
    """,
    "concept_scores": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT tag, 'concept:' || tag AS concept_id,
               CAST(SUM(n_matches) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM occ GROUP BY tag
    """,
    "triples": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT conv_id AS subj, 'utters' AS pred,
               conv_id || '#' || turn_idx AS obj, conv_id, turn_idx,
               1.0 AS weight FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, 'used_tool', tool, conv_id, turn_idx, 1.0
        FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'tagged_as',
               'concept:' || tag, conv_id, turn_idx, 1.0 FROM occ
    """,
    "edges": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT conv_id AS src, 'utters' AS rel,
               conv_id || '#' || turn_idx AS dst, conv_id, turn_idx,
               1.0 AS weight FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, 'used_tool', tool, conv_id, turn_idx, 1.0
        FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'tagged_as',
               'concept:' || tag, conv_id, turn_idx, 1.0 FROM occ
    """,
    "nodes": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT DISTINCT conv_id AS node_id, 'conversation' AS node_type,
               conv_id AS label, CAST(NULL AS VARCHAR) AS category FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, 'turn', conv_id || '#' || turn_idx, NULL FROM t
        UNION ALL
        SELECT DISTINCT 'tool:' || tool, 'tool', tool, NULL FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'mention', keyword, NULL FROM occ
        UNION ALL
        SELECT DISTINCT 'concept:' || tag, 'concept', tag, category FROM onto
    """,
    "doc_tags": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT conv_id, turn_idx,
               string_agg(DISTINCT tag, ',' ORDER BY tag) AS tags_sorted,
               string_agg(DISTINCT keyword, ',' ORDER BY keyword) AS keywords_sorted,
               CAST(COUNT(DISTINCT tag) AS BIGINT) AS n_tags
        FROM occ GROUP BY conv_id, turn_idx
    """,
    "conv_stats": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT conv_id,
               CAST(SUM(n_matches) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT turn_idx) AS BIGINT) AS n_turns,
               CAST(COUNT(DISTINCT tag) AS BIGINT) AS n_tags
        FROM occ GROUP BY conv_id
    """,
    "tag_overlap": _overlap_oracle_sql(),
    "tag_casefold": f"""
        WITH {_T_CTE}, {_ONTO_CTE},
        t2 AS (SELECT conv_id, turn_idx,
                      CASE WHEN turn_idx % 3 = 1 THEN upper(text) ELSE text END AS text
               FROM t),
        occ AS (SELECT t2.conv_id, t2.turn_idx, onto.tag, onto.keyword,
                       len(regexp_extract_all(lower(t2.text), '\\b' || onto.keyword || '\\b')) AS n_matches
                FROM t2, onto
                WHERE regexp_matches(lower(t2.text), '\\b' || onto.keyword || '\\b'))
        SELECT conv_id, turn_idx, tag, keyword, n_matches FROM occ
    """,
    "tag_lemma": f"""
        WITH {_T_CTE},
        occ AS (SELECT conv_id, turn_idx,
                       len(regexp_extract_all(text, '\\bcustomer\\b'))
                           AS n_matches
                FROM t
                WHERE regexp_matches(text, '\\bcustomer\\b'))
        SELECT conv_id, turn_idx, 'Work' AS tag,
               CASE WHEN turn_idx % 3 = 0 THEN 'worked'
                    WHEN turn_idx % 3 = 1 THEN 'working'
                    ELSE 'works' END AS keyword,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM occ
    """,
    "tag_lemma_nl": f"""
        WITH {_T_CTE},
        occ AS (SELECT conv_id, turn_idx,
                       len(regexp_extract_all(text, '\\bcustomer\\b'))
                           AS n_matches
                FROM t
                WHERE regexp_matches(text, '\\bcustomer\\b'))
        SELECT conv_id, turn_idx, 'Werk' AS tag,
               CASE WHEN turn_idx % 3 = 0 THEN 'gewerkt'
                    WHEN turn_idx % 3 = 1 THEN 'werkt'
                    ELSE 'werkten' END AS keyword,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM occ
    """,
    "tag_lemma_sv": f"""
        WITH {_T_CTE},
        occ AS (SELECT conv_id, turn_idx,
                       len(regexp_extract_all(text, '\\bcustomer\\b'))
                           AS n_matches
                FROM t
                WHERE regexp_matches(text, '\\bcustomer\\b'))
        SELECT conv_id, turn_idx, 'Arbete' AS tag,
               CASE WHEN turn_idx % 3 = 0 THEN 'arbetade'
                    WHEN turn_idx % 3 = 1 THEN 'arbetat'
                    ELSE 'arbetar' END AS keyword,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM occ
    """,
    "tag_diacritics": f"""
        WITH {_T_CTE}, {_ONTO_CTE},
        t2 AS (SELECT conv_id, turn_idx,
                      strip_accents(lower(replace(text, 'a', 'á'))) AS text
               FROM t),
        occ AS (SELECT t2.conv_id, t2.turn_idx, onto.tag, onto.keyword,
                       len(regexp_extract_all(t2.text, '\\b' || onto.keyword || '\\b')) AS n_matches
                FROM t2, onto
                WHERE regexp_matches(t2.text, '\\b' || onto.keyword || '\\b'))
        SELECT conv_id, turn_idx, tag, keyword, n_matches FROM occ
    """,
    "distinct_langs": """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    """,
    "dedup_exact": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM documents GROUP BY text
    """,
    "dedup_keep_first": """
        SELECT doc_id, text, lang FROM documents
        QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
    "top_tags": f"""
        WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
        SELECT tag, CAST(SUM(n_matches) AS BIGINT) AS n_mentions
        FROM occ GROUP BY tag
        ORDER BY n_mentions DESC, tag LIMIT 3
    """,
    "token_counts": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    "quality": r"""
        WITH w AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS words
                   FROM documents)
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
               CAST(COALESCE(list_max(list_transform(words, x -> length(x))), 0) AS BIGINT)
                   AS max_word_len,
               CAST(CASE WHEN len(words) = 0 THEN 0
                    ELSE (100 * len(list_distinct(words))) // len(words) END AS BIGINT)
                   AS quality_score
        FROM w
    """,
    "fingerprint": """
        SELECT doc_id, md5(text) AS text_md5 FROM documents
    """,
    "events_window": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               round(SUM(COALESCE(value, 0)), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "join_broadcast": """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderpriority,
               c.c_name, c.c_mktsegment
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "join_bucketed": """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               round(SUM(l.l_quantity), 4) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "sessionize": """
        WITH e AS (SELECT user_id, event_id, ts,
                          CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                               THEN 1 ELSE 0 END AS new_s
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT user_id, event_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
              FROM e)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts
        FROM s GROUP BY 1, 2
    """,
    "lang_id": """
        WITH w AS (SELECT doc_id, str_split(lower(text), ' ') AS ws FROM documents),
        profiles(lang, prio, stops) AS (VALUES
          ('en', 0, ['the','a','of','and','to','in','is','that','it','for']),
          ('fr', 1, ['le','la','les','de','des','et','un','une','est','que']),
          ('de', 2, ['der','die','das','und','ist','ein','eine','zu','den','nicht']),
          ('es', 3, ['el','la','los','de','y','un','una','es','que','en']),
          ('it', 4, ['il','la','di','e','un','una','che','per','con','del']),
          ('pt', 5, ['o','a','os','de','e','um','uma','que','em','para'])),
        s AS (SELECT w.doc_id, p.lang, p.prio,
                     len(list_filter(w.ws, x -> list_contains(p.stops, x))) AS score
              FROM w, profiles p)
        SELECT doc_id, lang AS pred_lang FROM s
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, prio) = 1
    """,
    "media_features": """
        WITH d AS (SELECT doc_id AS media_id,
            CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
            CAST(length(text) AS BIGINT) AS n_bytes,
            CAST(concat('0x', substr(md5(text),1,2)) AS INTEGER) AS d0,
            CAST(concat('0x', substr(md5(text),3,2)) AS INTEGER) AS d1,
            CAST(concat('0x', substr(md5(text),5,2)) AS INTEGER) AS d2
          FROM documents)
        SELECT media_id, media_type, n_bytes,
               CASE WHEN media_type = 'image' THEN CAST(1 + d0 % 64 AS INTEGER) END AS width,
               CASE WHEN media_type = 'image' THEN CAST(1 + d1 % 64 AS INTEGER) END AS height,
               CASE WHEN media_type IN ('audio','video') THEN round(d2 / 10.0, 1) END AS duration_s
        FROM d
    """,
    # brute-force exact word-3-gram Jaccard over all pairs — the engine's
    # LSH (num_perm=64, 16 bands) has recall ~1-1e-15 at the corpus's
    # near-dup density (all pairs >= 0.4 sit at jaccard >= 0.97), and every
    # candidate is verified exactly, so LSH output == brute force here
    "minhash_pairs": r"""
        WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                              generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                          WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                          ELSE [] END AS sh
              FROM w)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              NULLIF(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0) >= 0.4
    """,
    # same brute-force exact Jaccard, at a LOWER threshold (0.2): the
    # inverted-index candidate generator shares at least one shingle with
    # every pair of jaccard > 0, so engine output == brute force exactly,
    # with no recall caveat
    "jaccard_pairs": r"""
        WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                              generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                          WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                          ELSE [] END AS sh
              FROM w)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              NULLIF(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0) >= 0.2
    """,
    # connected components over the same exact-Jaccard pair graph via a
    # recursive CTE: reachability labels, min reachable id per node
    "dup_clusters": r"""
        WITH RECURSIVE w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN len(ws) >= 3 THEN list_distinct(list_transform(
                              generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                          WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                          ELSE [] END AS sh
              FROM w),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM s a, s b
              WHERE a.doc_id < b.doc_id
                AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                    NULLIF(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0) >= 0.2),
        e AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
        cc(node, label) AS (
            SELECT src, src FROM e
            UNION
            SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node
        )
        SELECT node AS doc_id, MIN(label) AS cluster_id
        FROM cc GROUP BY node
    """,
    # full prep chain in SQL: the lang_id + quality mirrors, the
    # brute-force Jaccard pair graph RESTRICTED to filter survivors, the
    # recursive-CTE components, then non-canonical members dropped
    "prep_corpus": r"""
        WITH RECURSIVE lw AS (SELECT doc_id, text, str_split(lower(text), ' ') AS lws,
                                     regexp_extract_all(text, '\S+') AS words
                              FROM documents),
        profiles(lang, prio, stops) AS (VALUES
          ('en', 0, ['the','a','of','and','to','in','is','that','it','for']),
          ('fr', 1, ['le','la','les','de','des','et','un','une','est','que']),
          ('de', 2, ['der','die','das','und','ist','ein','eine','zu','den','nicht']),
          ('es', 3, ['el','la','los','de','y','un','una','es','que','en']),
          ('it', 4, ['il','la','di','e','un','una','che','per','con','del']),
          ('pt', 5, ['o','a','os','de','e','um','uma','que','em','para'])),
        ls AS (SELECT lw.doc_id, p.lang, p.prio,
                      len(list_filter(lw.lws, x -> list_contains(p.stops, x))) AS score
               FROM lw, profiles p),
        pred AS (SELECT doc_id, lang AS pred_lang FROM ls
                 QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, prio) = 1),
        kept AS (SELECT lw.doc_id, lw.text, lw.words FROM lw
                 JOIN pred USING (doc_id)
                 WHERE pred.pred_lang = 'en'
                   AND (CASE WHEN len(lw.words) = 0 THEN 0
                        ELSE (100 * len(list_distinct(lw.words))) // len(lw.words) END) >= 40),
        s AS (SELECT doc_id,
                     CASE WHEN len(words) >= 3 THEN list_distinct(list_transform(
                              generate_series(1, len(words) - 2),
                              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                          WHEN len(words) > 0 THEN [array_to_string(words, ' ')]
                          ELSE [] END AS sh
              FROM kept),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM s a, s b
              WHERE a.doc_id < b.doc_id
                AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                    NULLIF(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0) >= 0.2),
        e AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
        cc(node, label) AS (
            SELECT src, src FROM e
            UNION
            SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node
        ),
        dropped AS (SELECT node FROM cc GROUP BY node HAVING node != MIN(label))
        SELECT k.doc_id,
               CAST(len(regexp_extract_all(k.text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens
        FROM kept k
        WHERE k.doc_id NOT IN (SELECT node FROM dropped)
    """,
    # full-fidelity mirror of the engine pipeline: the same md5-based
    # 64-bit SimHash per doc, the same 4x16-bit banding condition (shared
    # chunk), the same hamming cutoff — so banding recall is irrelevant to
    # the comparison
    "simhash_pairs": r"""
        WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
                   FROM documents),
        h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 16))::UBIGINT AS hv FROM w),
        bits AS (SELECT doc_id, b.b AS bit,
                        SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                 FROM h, (SELECT unnest(generate_series(0, 63)) AS b) b
                 GROUP BY doc_id, b.b),
        sh AS (SELECT doc_id,
                      SUM(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)::UBIGINT AS simhash
               FROM bits GROUP BY doc_id),
        alldocs AS (SELECT d.doc_id, COALESCE(sh.simhash, 0::UBIGINT) AS simhash
                    FROM documents d LEFT JOIN sh USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM alldocs a JOIN alldocs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
          AND (((a.simhash >> 0)  & 65535) = ((b.simhash >> 0)  & 65535)
            OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
            OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
            OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535))
    """,
    # brute-force cosine over the same deterministically-augmented table
    # the Ray query builds (see q_embedding_near); planted pairs at ~0.9987
    # vs a 0.52 random ceiling make the 0.9 threshold unambiguous
    "embedding_near": f"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        pert AS (SELECT vec_id + {EMB_PLANT_OFFSET} AS vec_id,
                        list_transform(generate_series(1, len(e)),
                                       i -> e[i] + {EMB_PLANT_EPS} * e[(i % len(e)) + 1]) AS e
                 FROM base),
        all_e AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM pert)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.e, b.e), 6) AS cosine
        FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.9
    """,
    "ann_topk": f"""
        WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < {N_ANN_QUERIES}),
        s AS (SELECT q.qid AS query_id, e.vec_id,
                     round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS score
              FROM q, embeddings e),
        r AS (SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id) AS rank
              FROM s)
        SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= {ANN_K}
    """,
}


# ann_ivf probes every list (nprobe = nlist), so IVF output is exactly the
# brute-force top-k — same oracle
ORACLE_SQL["ann_ivf"] = ORACLE_SQL["ann_topk"]

# semdedup: same augmented table as embedding_near; cluster = nearest of the
# first K base vectors by cosine (ties -> smaller sid, mirrored by the
# row_number ORDER BY); kept = no earlier same-cluster row at cosine >= 0.9.
# Assignment argmax parity is safe: seed-cosine gaps on gaussian data are
# O(0.01+) vs ~1e-15 float-summation-order noise, and the 0.9 threshold sits
# between the planted ~0.9987 and the ~0.51 random ceiling.
ORACLE_SQL["semdedup"] = f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    pert AS (SELECT vec_id + {EMB_PLANT_OFFSET} AS vec_id,
                    list_transform(generate_series(1, len(e)),
                                   i -> e[i] + {EMB_PLANT_EPS} * e[(i % len(e)) + 1]) AS e
             FROM base),
    all_e AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM pert),
    seeds AS (SELECT vec_id AS sid, e AS se FROM base WHERE vec_id < {SEMDEDUP_K}),
    scored AS (SELECT a.vec_id, a.e, s.sid,
                      row_number() OVER (PARTITION BY a.vec_id
                          ORDER BY list_cosine_similarity(a.e, s.se) DESC, s.sid) AS rn
               FROM all_e a CROSS JOIN seeds s),
    assigned AS (SELECT vec_id, e, sid AS cluster FROM scored WHERE rn = 1),
    dropped AS (SELECT DISTINCT b.vec_id
                FROM assigned a JOIN assigned b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.e, b.e) >= 0.9)
    SELECT v.vec_id, CAST(v.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM assigned v LEFT JOIN dropped d USING (vec_id)
"""

# entity_resolve: full mirror of the blocked-ER stages — planted-typo
# augmentation (drop char 6), lower() normalization, min-id label
# representative, prefix-4 block + levenshtein<=2 pairs over DISTINCT
# labels, recursive-CTE min-label components, singletons -> own rep.
ORACLE_SQL["entity_resolve"] = f"""
    WITH RECURSIVE e0 AS (
        SELECT p_partkey AS ent_id, lower(p_name) AS nm FROM part
        UNION ALL
        SELECT p_partkey + {ENT_PLANT_OFFSET},
               lower(substr(p_name, 1, 5) || substr(p_name, 7)) FROM part),
    lab AS (SELECT nm, MIN(ent_id) AS rep FROM e0 GROUP BY nm),
    p AS (SELECT LEAST(a.rep, b.rep) AS ra, GREATEST(a.rep, b.rep) AS rb
          FROM lab a JOIN lab b
            ON substr(a.nm, 1, 4) = substr(b.nm, 1, 4)
           AND a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 2),
    e AS (SELECT ra AS src, rb AS dst FROM p UNION SELECT rb, ra FROM p),
    cc(node, label) AS (
        SELECT src, src FROM e
        UNION
        SELECT e.dst, cc.label FROM cc JOIN e ON e.src = cc.node),
    rc AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node)
    SELECT e0.ent_id, CAST(COALESCE(rc.cl, lab.rep) AS BIGINT) AS canonical_id
    FROM e0 JOIN lab USING (nm) LEFT JOIN rc ON rc.node = lab.rep
"""

# bpe_pairs: per-word adjacent character pairs — identical to the engine's
# whitespace-masked codepoint-pair pass (pairs never straddle \S+ words)
ORACLE_SQL["bpe_pairs"] = r"""
    WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
               FROM documents),
    p AS (SELECT substr(word, i, 1) AS sym_a, substr(word, i + 1, 1) AS sym_b
          FROM w, unnest(generate_series(1, len(word) - 1)) AS t(i))
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS cnt
    FROM p GROUP BY 1, 2
"""

# concept_trends: the _OCC_CTE matcher mirror carrying ts, 10-second
# epoch-us windows, and the integer-exact flags (cnt*n > total; cnt == max)
ORACLE_SQL["concept_trends"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE},
    occ AS (SELECT t.ts, onto.tag,
                   len(regexp_extract_all(t.text, '\\b' || onto.keyword || '\\b'))
                       AS n_matches
            FROM t, onto
            WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b')),
    w AS (SELECT tag, epoch_us(ts) // 10000000 AS window_id,
                 CAST(SUM(n_matches) AS BIGINT) AS cnt
          FROM occ GROUP BY 1, 2),
    tot AS (SELECT tag, SUM(cnt) AS total, COUNT(*) AS n_windows,
                   MAX(cnt) AS mx
            FROM w GROUP BY tag)
    SELECT w.tag, CAST(w.window_id AS BIGINT) AS window_id, w.cnt,
           CAST(CASE WHEN w.cnt * tot.n_windows > tot.total THEN 1 ELSE 0 END
                AS BIGINT) AS above_mean,
           CAST(CASE WHEN w.cnt = tot.mx THEN 1 ELSE 0 END AS BIGINT) AS is_peak
    FROM w JOIN tot USING (tag)
"""

# native DuckDB ASOF LEFT JOIN — identical backward semantics
ORACLE_SQL["asof_clicks"] = """
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS event_id_r, r.ts AS ts_r
    FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN
         (SELECT event_id, ts, user_id FROM events WHERE event_type = 'view') r
    ON l.user_id = r.user_id AND r.ts <= l.ts
"""

# range join replay: the sessionize oracle as a CTE, then an interval join
ORACLE_SQL["event_sessions"] = f"""
    WITH sess AS ({ORACLE_SQL["sessionize"]})
    SELECT e.event_id, e.user_id, e.ts, sess.session_id
    FROM events e JOIN sess
      ON e.user_id = sess.user_id
     AND e.ts BETWEEN sess.start_ts AND sess.end_ts
"""

# each event in its 4 covering 60-min/15-min-slide windows
ORACLE_SQL["sliding_window"] = """
    WITH off AS (SELECT unnest(generate_series(0, 3)) AS j),
    w AS (SELECT e.event_type,
                 make_timestamp(((epoch_us(e.ts) // 900000000) - off.j) * 900000000)
                     AS window_start,
                 COALESCE(e.value, 0) AS v
          FROM events e, off)
    SELECT event_type, window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(SUM(v), 4) AS sum_value
    FROM w GROUP BY 1, 2
"""

# exact discrete quantiles (lower interpolation == quantile_disc)
ORACLE_SQL["value_quantiles"] = """
    SELECT event_type,
           quantile_disc(value, 0.5)  AS p50,
           quantile_disc(value, 0.9)  AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY 1
"""

# the md5-percentile keying is the documented cross-engine contract of
# ops/sample.py — the SQL below reproduces the EXACT subset
_MD5_PCT = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100)"
ORACLE_SQL["sample_det"] = f"""
    SELECT doc_id, lang FROM documents WHERE {_MD5_PCT} < 20
"""
ORACLE_SQL["sample_stratified"] = f"""
    SELECT doc_id, lang FROM documents
    WHERE {_MD5_PCT} < CASE WHEN lang = 'en' THEN 25 ELSE 100 END
"""

ORACLE_SQL["ngram_top"] = r"""
    WITH w AS (SELECT regexp_extract_all(text, '\S+') AS ws FROM documents),
    g AS (SELECT unnest(CASE WHEN len(ws) >= 3 THEN list_transform(
                     generate_series(1, len(ws) - 2),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 ELSE [] END) AS ngram
          FROM w)
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY 1 ORDER BY n DESC, ngram LIMIT 50
"""

# top-2 tags per conversation: the mention_counts oracle as a derived
# table, then SQL's own windowed top-k
ORACLE_SQL["conv_top_tags"] = f"""
    WITH mc AS ({ORACLE_SQL["mention_counts"]}),
    ct AS (SELECT conv_id, tag, CAST(SUM(n_matches) AS BIGINT) AS n_mentions
           FROM mc GROUP BY 1, 2),
    r AS (SELECT conv_id, tag, n_mentions,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY n_mentions DESC, tag) AS rank
          FROM ct)
    SELECT conv_id, tag, n_mentions, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 2
"""

# decontamination: word n-grams in SQL via list slicing (same '\S+'-split
# as Python .split()); a corpus doc is contaminated iff it shares a gram
# with the held-out doc_id % MOD == 0 slice
ORACLE_SQL["decontam"] = rf"""
    WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
               FROM documents),
    g AS (SELECT doc_id,
                 array_to_string(ws[i:i+{DECONTAM_N - 1}], ' ') AS gram
          FROM w, UNNEST(generate_series(1, len(ws) - {DECONTAM_N - 1})) t(i)
          WHERE len(ws) >= {DECONTAM_N}),
    test_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_MOD} = 0),
    dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN test_g USING (gram)
              WHERE g.doc_id % {DECONTAM_MOD} <> 0)
    SELECT doc_id FROM documents
    WHERE doc_id % {DECONTAM_MOD} <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
"""

# redaction: identical PII injection, then the SAME RE2 rules in the same
# order (both engines are RE2, so the patterns are shared verbatim)
ORACLE_SQL["redact"] = r"""
    WITH pii AS (SELECT doc_id,
                        'doc ' || CAST(doc_id AS VARCHAR) || ': ' || text ||
                        ' contact user' || CAST(doc_id AS VARCHAR) ||
                        '@example.com or call 415-555-' ||
                        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
                 FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
             '\b\d+\b', '<NUM>', 'g') AS text
    FROM pii
"""

ORACLE_SQL["orders_semi"] = """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""

ORACLE_SQL["orders_anti"] = """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""

# window functions: the running total is integer cents (float window-sum
# order is engine-defined; int sums are exact), lag is sentinel-filled
# (engines disagree on null vs NaN round-trips)
ORACLE_SQL["order_windows"] = """
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           COALESCE(LAG(o_totalprice) OVER w, -1.0) AS prev_price,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_total_cents,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS roll3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# Gopher-rule repetition metrics: same '\S+' word split as the Python op,
# integer floor-division percentages so values compare exactly
ORACLE_SQL["repetition"] = r"""
    WITH w AS (SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS ws
               FROM documents),
    g1 AS (SELECT doc_id, ws[i] AS word
           FROM w, UNNEST(generate_series(1, len(ws))) t(i)),
    wc AS (SELECT doc_id, MAX(n) AS mw, CAST(SUM(n) AS BIGINT) AS nw,
                  COUNT(*) AS nd
           FROM (SELECT doc_id, word, COUNT(*) AS n FROM g1 GROUP BY 1, 2)
           GROUP BY 1),
    g2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bigram
           FROM w, UNNEST(generate_series(1, len(ws) - 1)) t(i)
           WHERE len(ws) >= 2),
    bc AS (SELECT doc_id, MAX(n) AS mb
           FROM (SELECT doc_id, bigram, COUNT(*) AS n FROM g2 GROUP BY 1, 2)
           GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE((100 * wc.mw) // wc.nw, 0) AS BIGINT) AS top_word_pct,
           CAST(COALESCE((100 * bc.mb) // (wc.nw - 1), 0) AS BIGINT) AS top_bigram_pct,
           CAST(COALESCE((100 * (wc.nw - wc.nd)) // wc.nw, 0) AS BIGINT) AS dup_word_pct
    FROM documents d
    LEFT JOIN wc ON d.doc_id = wc.doc_id
    LEFT JOIN bc ON d.doc_id = bc.doc_id
"""

# tf/df-ranked keyword extraction (integer-exact: the score is a ratio of
# small ints, identically ordered in IEEE doubles on both engines)
ORACLE_SQL["tfidf_top"] = r"""
    WITH w AS (SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS ws
               FROM documents),
    g AS (SELECT doc_id, ws[i] AS term
          FROM w, UNNEST(generate_series(1, len(ws))) t(i)),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM g GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 ROW_NUMBER() OVER (
                     PARTITION BY tf.doc_id
                     ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term ASC
                 ) AS rank
          FROM tf JOIN df USING (term))
    SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
"""

# KMV sketch mirror: identical md5-60bit hash, identical integer estimate
from ..ops.sketch import kmv_oracle_sql as _kmv_sql  # noqa: E402

ORACLE_SQL["approx_distinct"] = _kmv_sql("orders", "o_custkey", k=256)

from ..ops.sketch import hll_oracle_sql as _hll_sql  # noqa: E402

ORACLE_SQL["hll_custkeys"] = _hll_sql("orders", "o_custkey")

ORACLE_SQL["event_pivot"] = """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
"""

ORACLE_SQL["lineitem_melt"] = """
    SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure,
           l_extendedprice AS amount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""

ORACLE_SQL["custs_no_orders"] = """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""

ORACLE_SQL["click_buyers"] = """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
"""

# deterministic per-group reservoir: identical md5-60bit rank key
ORACLE_SQL["lang_sample"] = """
    WITH h AS (SELECT doc_id, lang,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                           AS BIGINT) AS h
               FROM documents),
    r AS (SELECT doc_id, lang,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
                      AS BIGINT) AS rank
          FROM h)
    SELECT doc_id, lang, rank FROM r WHERE rank <= 5
"""

# exact-substring dedup: the gram/dup/hit chain is shared by both oracles.
# SQL groups by gram TEXT where the engine groups by 64-bit window hash —
# identical outcomes modulo ~n^2/2^64 collisions (the documented
# inverted-index trade, same stance as the decontam oracle).
_SUBSTR_HIT_CTES = rf"""
    w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
          FROM documents),
    g AS (SELECT doc_id, i,
                 array_to_string(ws[i:i+{SUBSTR_K - 1}], ' ') AS gram
          FROM w, UNNEST(generate_series(1, len(ws) - {SUBSTR_K - 1})) t(i)
          WHERE len(ws) >= {SUBSTR_K}),
    dup AS (SELECT gram FROM g GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= 2),
    hit AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram))
"""

ORACLE_SQL["dup_spans"] = f"""
    WITH {_SUBSTR_HIT_CTES},
    lagd AS (SELECT doc_id, i,
                    lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
             FROM hit)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
           CAST(SUM(CASE WHEN pi IS NULL OR i - pi > {SUBSTR_K}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST(SUM(CASE WHEN pi IS NULL THEN {SUBSTR_K}
                         ELSE LEAST(i - pi, {SUBSTR_K}) END) AS BIGINT)
             AS dup_tokens
    FROM lagd GROUP BY doc_id
"""

ORACLE_SQL["dedup_substring"] = f"""
    WITH {_SUBSTR_HIT_CTES},
    cov AS (SELECT DISTINCT doc_id, i + o AS j
            FROM hit, UNNEST(generate_series(0, {SUBSTR_K - 1})) t2(o)),
    tok AS (SELECT doc_id, j, ws[j] AS tokn
            FROM w, UNNEST(generate_series(1, len(ws))) t3(j)),
    kept AS (SELECT t.doc_id, t.j, t.tokn
             FROM tok t LEFT JOIN cov c
               ON t.doc_id = c.doc_id AND t.j = c.j
             WHERE c.doc_id IS NULL)
    SELECT d.doc_id,
           COALESCE(k.txt, '') AS clean_text
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(tokn, ' ' ORDER BY j) AS txt
               FROM kept GROUP BY doc_id) k USING (doc_id)
"""

# sequence packing: the greedy within-shard walk is a RECURSIVE CTE
# advancing every shard one doc per iteration (depth = max docs/shard)
ORACLE_SQL["pack_docs"] = rf"""
    WITH RECURSIVE
    w AS (SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % {PACK_SHARDS} AS shard
          FROM documents),
    d AS (SELECT doc_id, shard, n_tok,
                 ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
          FROM w),
    walk AS (
      SELECT doc_id, shard, n_tok, rn, CAST(0 AS BIGINT) AS bin, n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.doc_id, d.shard, d.n_tok, d.rn,
             CASE WHEN w2.fill + d.n_tok > {PACK_CAPACITY}
                  THEN w2.bin + 1 ELSE w2.bin END,
             CASE WHEN w2.fill + d.n_tok > {PACK_CAPACITY}
                  THEN d.n_tok ELSE w2.fill + d.n_tok END
      FROM d JOIN walk w2 ON d.shard = w2.shard AND d.rn = w2.rn + 1)
    SELECT doc_id, shard, bin, n_tok FROM walk
"""

_MIX_VALUES = ", ".join(
    f"('{lang}', {int(w)}, {int(round((w - int(w)) * 100))})"
    for lang, w in MIX_WEIGHTS.items()
)
ORACLE_SQL["mix_langs"] = f"""
    WITH wts(lang, whole, fpct) AS (VALUES {_MIX_VALUES}),
    b AS (SELECT doc_id, d.lang, whole, fpct,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS p
          FROM documents d JOIN wts USING (lang)),
    c AS (SELECT doc_id, lang,
                 whole + CASE WHEN p < fpct THEN 1 ELSE 0 END AS n
          FROM b)
    SELECT doc_id, lang, CAST(t.c AS BIGINT) AS copy
    FROM c, UNNEST(generate_series(1, n)) t(c)
"""


def _pagerank_sql(damping: float = 0.85, iters: int = 3, seeds=None) -> str:
    """Unrolled fixed-iteration PageRank mirror: one CTE triple
    (dangling mass, contribution sums, fold) per iteration — recursive
    CTEs cannot aggregate over the previous step in standard SQL, and
    unrolling keeps the arithmetic order-independent enough that the
    8-decimal rounding on both sides hash-matches.  With ``seeds`` the
    reset vector (init + teleport + dangling) concentrates on the seed
    nodes, mirroring the engine's personalized walk."""
    parts = [
        f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    e AS (SELECT DISTINCT src, dst FROM eraw),
    pr_nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM pr_nodes),
    od AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS od
           FROM e GROUP BY src)"""
    ]
    if seeds is None:
        parts.append(
            """,
    pr0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS pr FROM pr_nodes)"""
        )
    else:
        seed_in = ", ".join(f"'{s}'" for s in seeds)
        parts.append(
            f""",
    sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c
           FROM pr_nodes WHERE node IN ({seed_in})),
    rv AS (SELECT node,
                  CASE WHEN node IN ({seed_in})
                       THEN 1.0 / (SELECT c FROM sc) ELSE 0.0 END AS r
           FROM pr_nodes),
    pr0 AS (SELECT node, r AS pr FROM rv)"""
        )
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        if seeds is None:
            fold = f"""(1 - {damping}) / (SELECT c FROM nn)
                     + {damping} * (SELECT m FROM dang{i}) / (SELECT c FROM nn)
                     + {damping} * COALESCE(s.contrib, 0.0)"""
            from_nodes = "pr_nodes nd"
        else:
            fold = f"""(1 - {damping}) * nd.r
                     + {damping} * (SELECT m FROM dang{i}) * nd.r
                     + {damping} * COALESCE(s.contrib, 0.0)"""
            from_nodes = "rv nd"
        parts.append(
            f""",
    dang{i} AS (SELECT COALESCE(SUM(p.pr), 0.0) AS m
                FROM {p} p LEFT JOIN od o ON p.node = o.node
                WHERE o.node IS NULL),
    s{i} AS (SELECT e.dst AS node, SUM(p.pr / o.od) AS contrib
             FROM e JOIN {p} p ON e.src = p.node
                    JOIN od o ON e.src = o.node
             GROUP BY e.dst),
    pr{i} AS (SELECT nd.node,
                     {fold} AS pr
              FROM {from_nodes} LEFT JOIN s{i} s ON nd.node = s.node)"""
        )
    parts.append(f"\n    SELECT node, round(pr, 8) AS pr FROM pr{iters}")
    return "".join(parts)


ORACLE_SQL["pagerank"] = _pagerank_sql(damping=0.85, iters=3)
ORACLE_SQL["ppr_concepts"] = _pagerank_sql(
    damping=0.85, iters=3, seeds=PPR_SEEDS
)


def _wl_sql(rounds: int = 2) -> str:
    """Unrolled WL mirror: per round, a sorted ``string_agg`` of in-
    neighbor labels and ``md5(prev || '|' || agg)`` — byte-identical to
    the engine's per-node hash input."""
    parts = [
        f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    e AS (SELECT DISTINCT src, dst FROM eraw),
    wn AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    l0 AS (SELECT node, '0' AS lbl FROM wn)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    a{i} AS (SELECT e.dst AS node,
                    string_agg(p.lbl, ',' ORDER BY p.lbl) AS agg
             FROM e JOIN l{i - 1} p ON e.src = p.node
             GROUP BY e.dst),
    l{i} AS (SELECT n.node,
                    md5(n.lbl || '|' || COALESCE(a.agg, '')) AS lbl
             FROM l{i - 1} n LEFT JOIN a{i} a ON n.node = a.node)"""
        )
    parts.append(f"\n    SELECT node, lbl AS wl_color FROM l{rounds}")
    return "".join(parts)


ORACLE_SQL["wl_colors"] = _wl_sql(rounds=2)

def _zorder_tiles_sql() -> str:
    from ..ops.zorder import zorder_sql_expr

    z = zorder_sql_expr(
        f"l_partkey % {1 << ZORDER_BITS}",
        f"l_suppkey % {1 << ZORDER_BITS}",
        ZORDER_BITS,
    )
    return f"""
    SELECT ({z}) // {1 << (2 * ZORDER_BITS - 6)} AS tile,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
"""


ORACLE_SQL["zorder_tiles"] = _zorder_tiles_sql()

def _hll_by_sql():
    from ..ops.sketch import hll_by_oracle_sql

    return hll_by_oracle_sql("events", "event_type", "user_id")


ORACLE_SQL["hll_by_type"] = _hll_by_sql()

ORACLE_SQL["distinct_users_by_type"] = """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
"""

ORACLE_SQL["kg_reciprocity"] = """
    WITH e AS (SELECT DISTINCT l_partkey % 997 AS src,
                               l_suppkey * 7 % 997 AS dst
               FROM lineitem WHERE l_linenumber = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN EXISTS (
                    SELECT 1 FROM e r
                    WHERE r.src = e.dst AND r.dst = e.src)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_recip
    FROM e
"""

ORACLE_SQL["user_first_event"] = """
    SELECT user_id, event_type, ts
    FROM (SELECT user_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
"""

ORACLE_SQL["bloom_join"] = """
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey
"""

ORACLE_SQL["curriculum"] = f"""
    SELECT doc_id,
           CAST(NTILE({CURRICULUM_BUCKETS})
                OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
    FROM documents
"""

ORACLE_SQL["mlm_pairs"] = rf"""
    WITH w AS (SELECT doc_id,
                      regexp_extract_all(COALESCE(text, ''), '\S+') AS ws
               FROM documents),
    g AS (SELECT doc_id, i, ws[i] AS tok,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                       || CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 100 < {MASK_RATE} AS m
          FROM w, UNNEST(generate_series(1, len(ws))) t(i)),
    agg AS (SELECT doc_id,
                   string_agg(CASE WHEN m THEN '[MASK]' ELSE tok END,
                              ' ' ORDER BY i) AS masked,
                   string_agg(CASE WHEN m
                                   THEN CAST(i - 1 AS VARCHAR) || ':' || tok
                              END, ',' ORDER BY i) AS labels
            FROM g GROUP BY doc_id)
    SELECT w.doc_id, COALESCE(agg.masked, '') AS masked,
           COALESCE(agg.labels, '') AS labels
    FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
"""

ORACLE_SQL["heavy_tokens"] = rf"""
    WITH w AS (SELECT unnest(regexp_extract_all(COALESCE(text, ''), '\S+'))
                      AS tok
               FROM documents)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY tok HAVING COUNT(*) >= {HH_MIN_COUNT}
"""

ORACLE_SQL["part_scc"] = """
    WITH RECURSIVE
    e AS (SELECT DISTINCT l_partkey % 997 AS src,
                          l_suppkey * 7 % 997 AS dst
          FROM lineitem WHERE l_linenumber = 1),
    reach(s, d) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.s, e.dst FROM reach r JOIN e ON r.d = e.src),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    mutual AS (SELECT a.s AS u, a.d AS v
               FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s),
    allm AS (SELECT u, v FROM mutual
             UNION ALL SELECT node AS u, node AS v FROM n)
    SELECT u AS node, CAST(MIN(v) AS BIGINT) AS scc_id
    FROM allm GROUP BY u
"""

ORACLE_SQL["part_truss"] = _truss_sql(rounds=14, need=2)

ORACLE_SQL["scc_dag_depth"] = """
    WITH RECURSIVE
    e AS (SELECT DISTINCT l_partkey % 997 AS src,
                          l_suppkey * 7 % 997 AS dst
          FROM lineitem WHERE l_linenumber = 1),
    reach(s, d) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.s, e.dst FROM reach r JOIN e ON r.d = e.src),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    mutual AS (SELECT a.s AS u, a.d AS v
               FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s),
    allm AS (SELECT u, v FROM mutual
             UNION ALL SELECT node AS u, node AS v FROM n),
    scc AS (SELECT u AS node, MIN(v) AS scc_id FROM allm GROUP BY u),
    ce AS (SELECT DISTINCT a.scc_id AS src, b.scc_id AS dst
           FROM e JOIN scc a ON e.src = a.node
                  JOIN scc b ON e.dst = b.node
           WHERE a.scc_id <> b.scc_id),
    roots AS (SELECT DISTINCT src AS node FROM ce
              WHERE src NOT IN (SELECT dst FROM ce)),
    walk(node, dep) AS (
        SELECT node, 0 FROM roots
        UNION
        SELECT ce.dst, w.dep + 1 FROM walk w JOIN ce ON ce.src = w.node)
    SELECT CAST(COALESCE(MAX(dep), 0) AS BIGINT) AS depth FROM walk
"""

ORACLE_SQL["wl_classes"] = (
    _wl_sql(rounds=2)
    .replace(
        "SELECT node, lbl AS wl_color FROM l2",
        """SELECT lbl AS wl_color, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_pairs
    FROM l2 GROUP BY lbl""",
    )
)

ORACLE_SQL["mention_context"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE},
    fp AS (SELECT t.conv_id, t.turn_idx, onto.keyword, t.text,
                  length(regexp_extract(
                      t.text,
                      '^((?s:.*?))\\b' || onto.keyword || '\\b', 1)) AS s0
           FROM t, onto
           WHERE regexp_matches(t.text, '\\b' || onto.keyword || '\\b'))
    SELECT conv_id, turn_idx, keyword,
           substr(text,
                  greatest(s0 - {KWIC_WINDOW}, 0) + 1,
                  least(length(text),
                        s0 + length(keyword) + {KWIC_WINDOW})
                  - greatest(s0 - {KWIC_WINDOW}, 0)) AS ctx
    FROM fp
"""

_PROFILE_COL_SQL = """
    SELECT '{c}' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           MIN(CAST({c} AS VARCHAR)) AS min_str,
           MAX(CAST({c} AS VARCHAR)) AS max_str
    FROM documents
"""
ORACLE_SQL["profile"] = " UNION ALL ".join(
    _PROFILE_COL_SQL.format(c=c) for c in ("doc_id", "lang", "source")
)

_CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP
ORACLE_SQL["chunk_docs"] = f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '') AS toks
               FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t)
    SELECT doc_id, i AS chunk_idx, i * {_CHUNK_STRIDE} AS tok_start,
           least({CHUNK_SIZE}, n_tok - i * {_CHUNK_STRIDE}) AS tok_len,
           array_to_string(
               toks[i * {_CHUNK_STRIDE} + 1 : i * {_CHUNK_STRIDE} + {CHUNK_SIZE}],
               ' ') AS chunk
    FROM n, UNNEST(generate_series(
        0, CAST(ceil(n_tok / {_CHUNK_STRIDE}.0) AS BIGINT))) s(i)
    WHERE i * {_CHUNK_STRIDE} < n_tok
"""

_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)
ORACLE_SQL["bm25_top"] = rf"""
    WITH w AS (SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS ws
               FROM documents),
    st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(len(ws)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM w),
    g AS (SELECT doc_id, ws[i] AS term, len(ws) AS dl
          FROM w, UNNEST(generate_series(1, len(ws))) t(i)),
    tf AS (SELECT doc_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
           FROM g WHERE term IN ({_BM25_IN}) GROUP BY 1, 2, 3),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id,
                  SUM(((SELECT n FROM st) - df.df + 0.5) / (df.df + 0.5)
                      * (CAST(tf.tf AS DOUBLE) * (1.5 + 1.0))
                      / (CAST(tf.tf AS DOUBLE)
                         + 1.5 * ((1.0 - 0.75)
                                  + 0.75 * (CAST(tf.dl AS DOUBLE)
                                            / (SELECT avgdl FROM st))))) AS s
           FROM tf JOIN df USING (term) GROUP BY 1)
    SELECT doc_id, round(s, 6) AS score
    FROM sc ORDER BY round(s, 6) DESC, doc_id LIMIT 10
"""

ORACLE_SQL["co_mentions"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    d AS (SELECT DISTINCT conv_id, turn_idx, tag FROM occ)
    SELECT a.tag AS tag_a, b.tag AS tag_b,
           CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM d a JOIN d b
      ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx AND a.tag < b.tag
    GROUP BY 1, 2
"""

ORACLE_SQL["conv_features"] = rf"""
    WITH {_T_CTE},
    w AS (SELECT conv_id,
                 unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS tok
          FROM t),
    h AS (SELECT conv_id,
                 CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                 % {FEATURE_DIMS} AS dim,
                 CASE WHEN CAST(('0x' || substr(md5('s:' || tok), 1, 15))
                           AS BIGINT) % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM w)
    SELECT conv_id, dim, CAST(SUM(sgn) AS BIGINT) AS c
    FROM h GROUP BY 1, 2 HAVING SUM(sgn) <> 0
"""

ORACLE_SQL["concept_lifespan"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
    SELECT tag, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CAST(SUM(n_matches) AS BIGINT) AS n
    FROM occ JOIN t USING (conv_id, turn_idx)
    GROUP BY tag
"""

ORACLE_SQL["tool_stats"] = f"""
    WITH {_T_CTE}
    SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(SUM(turn_idx) AS BIGINT) AS sum_turn
    FROM t WHERE tool IS NOT NULL GROUP BY tool
"""

_CONV_MD5_PCT = "(('0x' || substr(md5(conv_id), 1, 8))::UBIGINT % 100)"
ORACLE_SQL["conv_splits"] = f"""
    WITH {_T_CTE}
    SELECT conv_id, turn_idx,
           CASE WHEN {_CONV_MD5_PCT} < 80 THEN 'train'
                WHEN {_CONV_MD5_PCT} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM t
"""

ORACLE_SQL["topic_shifts"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    dt AS (SELECT conv_id, turn_idx,
                  string_agg(DISTINCT tag, ',' ORDER BY tag) AS tags
           FROM occ GROUP BY 1, 2),
    w AS (SELECT conv_id, tags,
                 COALESCE(LAG(tags) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx), '') AS prev
          FROM dt)
    SELECT conv_id,
           CAST(SUM(CASE WHEN prev <> '' AND prev <> tags
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shifts
    FROM w GROUP BY conv_id
"""

ORACLE_SQL["kg_butterflies"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    d AS (SELECT DISTINCT conv_id, turn_idx, tag FROM occ),
    p AS (SELECT a.tag AS ta, b.tag AS tb, CAST(COUNT(*) AS BIGINT) AS c
          FROM d a JOIN d b
            ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
           AND a.tag < b.tag
          GROUP BY 1, 2)
    SELECT CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT)
           AS butterflies
    FROM p
"""

ORACLE_SQL["co_mentions_adj"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    d AS (SELECT DISTINCT conv_id, turn_idx, tag FROM occ),
    wd AS (SELECT DISTINCT conv_id, w, tag FROM (
               SELECT conv_id, turn_idx AS w, tag FROM d
               UNION ALL
               SELECT conv_id, turn_idx - 1 AS w, tag FROM d))
    SELECT a.tag AS tag_a, b.tag AS tag_b,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM wd a JOIN wd b
      ON a.conv_id = b.conv_id AND a.w = b.w AND a.tag < b.tag
    GROUP BY 1, 2
"""

ORACLE_SQL["hub_nodes"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    e AS (SELECT DISTINCT src, dst FROM eraw)
    SELECT src, CAST(COUNT(*) AS BIGINT) AS out_degree
    FROM e GROUP BY src
    ORDER BY out_degree DESC, src LIMIT 10
"""

ORACLE_SQL["suppliers_by_region"] = """
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           round(SUM(s.s_acctbal), 4) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
"""

ORACLE_SQL["part_brands"] = """
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST((200 * SUM(CAST(round(p_retailprice * 100.0) AS BIGINT))
                 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_price,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part GROUP BY p_brand
"""


def _pagerank_weighted_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Weighted unrolled PageRank over the symmetrized co-mention graph:
    same shape as `_pagerank_sql` with out-degree replaced by out-strength
    (SUM of weights) and contributions pr * w / strength — the same
    left-associated expression the engine evaluates."""
    parts = [
        f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    d AS (SELECT DISTINCT conv_id, turn_idx, tag FROM occ),
    cm AS (SELECT a.tag AS tag_a, b.tag AS tag_b,
                  CAST(COUNT(*) AS DOUBLE) AS w
           FROM d a JOIN d b
             ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
            AND a.tag < b.tag
           GROUP BY 1, 2),
    eraw AS (SELECT tag_a AS src, tag_b AS dst, w FROM cm
             UNION ALL SELECT tag_b, tag_a, w FROM cm),
    e AS (SELECT src, dst, SUM(w) AS w FROM eraw GROUP BY 1, 2),
    pr_nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM pr_nodes),
    od AS (SELECT src AS node, SUM(w) AS od FROM e GROUP BY src),
    pr0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS pr FROM pr_nodes)"""
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        parts.append(
            f""",
    dang{i} AS (SELECT COALESCE(SUM(p.pr), 0.0) AS m
                FROM {p} p LEFT JOIN od o ON p.node = o.node
                WHERE o.node IS NULL),
    s{i} AS (SELECT e.dst AS node, SUM(p.pr * e.w / o.od) AS contrib
             FROM e JOIN {p} p ON e.src = p.node
                    JOIN od o ON e.src = o.node
             GROUP BY e.dst),
    pr{i} AS (SELECT nd.node,
                     (1 - {damping}) / (SELECT c FROM nn)
                     + {damping} * (SELECT m FROM dang{i}) / (SELECT c FROM nn)
                     + {damping} * COALESCE(s.contrib, 0.0) AS pr
              FROM pr_nodes nd LEFT JOIN s{i} s ON nd.node = s.node)"""
        )
    parts.append(f"\n    SELECT node, round(pr, 8) AS pr FROM pr{iters}")
    return "".join(parts)


ORACLE_SQL["concept_rank"] = _pagerank_weighted_sql(damping=0.85, iters=3)

from ..ops.sketch import countmin_oracle_sql as _cm_sql  # noqa: E402

ORACLE_SQL["approx_counts"] = _cm_sql(
    "events", "event_type", probes=EVENT_TYPES, depth=4, width=512
)

ORACLE_SQL["doc_splits"] = f"""
    SELECT doc_id, lang,
           CASE WHEN {_MD5_PCT} < 80 THEN 'train'
                WHEN {_MD5_PCT} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""

ORACLE_SQL["lm_scores"] = r"""
    WITH w AS (SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS ws
               FROM documents),
    bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
           FROM w, UNNEST(generate_series(1, len(ws) - 1)) t(i)),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
    db AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
           FROM bg GROUP BY 1, 2, 3),
    s AS (SELECT db.doc_id,
                 SUM(CAST(db.n AS DOUBLE)
                     * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))) AS s,
                 SUM(CAST(db.n AS DOUBLE)) AS k
          FROM db JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
          GROUP BY 1)
    SELECT doc_id, round(s / k, 6) AS lm_score FROM s
"""

ORACLE_SQL["order_zscore"] = """
    WITH st AS (SELECT o_orderpriority AS g,
                       CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(o_totalprice) AS s,
                       SUM(o_totalprice * o_totalprice) AS ss
                FROM orders GROUP BY 1),
    mm AS (SELECT g, s / n AS m,
                  sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sd
           FROM st)
    SELECT o.o_orderkey, o.o_orderpriority,
           round(CASE WHEN mm.sd > 0.0
                      THEN (o.o_totalprice - mm.m) / mm.sd
                      ELSE 0.0 END, 6) AS zscore
    FROM orders o JOIN mm ON o.o_orderpriority = mm.g
"""

ORACLE_SQL["tri_counts"] = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM pairs e1
        JOIN pairs e2 ON e1.v = e2.u
        JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
    corner AS (SELECT a AS node FROM tri UNION ALL
               SELECT b FROM tri UNION ALL
               SELECT c FROM tri)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM corner GROUP BY node
"""

ORACLE_SQL["link_predict"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    ce AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
           FROM eraw WHERE src <> dst),
    adj AS (SELECT u AS node, v AS nbr FROM ce
            UNION ALL SELECT v, u FROM ce),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM adj GROUP BY node),
    ctr AS (SELECT a.node, a.nbr FROM adj a
            JOIN deg d ON d.node = a.node WHERE d.d <= 64),
    pairs AS (
        SELECT a.nbr AS u, b.nbr AS v, CAST(COUNT(*) AS BIGINT) AS common
        FROM ctr a JOIN ctr b ON a.node = b.node AND a.nbr < b.nbr
        GROUP BY a.nbr, b.nbr)
    SELECT p.u, p.v, p.common,
           round(CAST(p.common AS DOUBLE) / (du.d + dv.d - p.common), 8)
               AS jaccard,
           CAST(CASE WHEN ce.u IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_edge
    FROM pairs p
    JOIN deg du ON du.node = p.u
    JOIN deg dv ON dv.node = p.v
    LEFT JOIN ce ON ce.u = p.u AND ce.v = p.v
"""

ORACLE_SQL["part_hops"] = """
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e AS (SELECT u AS s, v AS d FROM pairs
          UNION ALL SELECT v, u FROM pairs),
    reach(node, h) AS (
        SELECT CAST(1 AS BIGINT), 0
        UNION ALL
        SELECT e.d, r.h + 1 FROM reach r JOIN e ON e.s = r.node
        WHERE r.h < 3),
    best AS (SELECT node, MIN(h) AS h FROM reach GROUP BY node)
    SELECT node, CAST(h AS BIGINT) AS hops FROM best
"""

ORACLE_SQL["embed_classify"] = """
    WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
    q AS (SELECT e.vec_id, e.label, idx.i,
                 CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1048576.0)
                      AS BIGINT) AS qv
          FROM embeddings e, idx),
    cent AS (SELECT label, i,
                    CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*))
                         AS BIGINT) AS c
             FROM q GROUP BY label, i),
    d AS (SELECT q.vec_id, cent.label AS cl,
                 CAST(SUM((q.qv - cent.c) * (q.qv - cent.c)) AS BIGINT)
                     AS d2
          FROM q JOIN cent ON cent.i = q.i
          GROUP BY q.vec_id, cent.label),
    best AS (SELECT vec_id, cl,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cl) AS rn
             FROM d)
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
           CAST(b.cl AS BIGINT) AS pred
    FROM embeddings e JOIN best b ON b.vec_id = e.vec_id AND b.rn = 1
"""

ORACLE_SQL["tag_assoc"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    d AS (SELECT DISTINCT conv_id, turn_idx, tag FROM occ),
    per AS (SELECT tag, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY tag),
    co AS (SELECT a.tag AS tag_a, b.tag AS tag_b,
                  CAST(COUNT(*) AS BIGINT) AS n_co
           FROM d a JOIN d b
             ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
            AND a.tag <> b.tag
           GROUP BY 1, 2)
    SELECT co.tag_a, co.tag_b, co.n_co,
           round(CAST(co.n_co AS DOUBLE) / per.n, 8) AS conf
    FROM co JOIN per ON per.tag = co.tag_a
"""

ORACLE_SQL["event_ohlc"] = """
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           arg_min(value, ts) AS open, MAX(value) AS high,
           MIN(value) AS low, arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, date_trunc('hour', ts)
"""

ORACLE_SQL["price_hist"] = """
    SELECT CAST(LEAST(GREATEST(
               floor((o_totalprice - 0.0) * 24.0 / 600000.0), 0), 23)
               AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
"""

ORACLE_SQL["cust_orders_left"] = """
    WITH cnt AS (SELECT o_custkey AS custkey,
                        CAST(COUNT(*) AS BIGINT) AS n_orders
                 FROM orders WHERE o_orderkey % 3 = 0
                 GROUP BY o_custkey)
    SELECT c.c_custkey AS custkey, c.c_mktsegment, cnt.n_orders
    FROM customer c LEFT JOIN cnt ON cnt.custkey = c.c_custkey
"""


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled bounded k-core mirror: degree CTE + survivor filter per
    round (recursive CTEs cannot re-aggregate, same as PageRank)."""
    parts = [
        """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e0 AS (SELECT u, v FROM pairs)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
    d{r} AS (SELECT node, COUNT(*) AS d FROM
             (SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r})
             GROUP BY node),
    s{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
    e{r + 1} AS (SELECT e.u, e.v FROM e{r} e
                 JOIN s{r} a ON a.node = e.u
                 JOIN s{r} b ON b.node = e.v)"""
        )
    parts.append(
        f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
    (SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
    GROUP BY node"""
    )
    return "".join(parts)


ORACLE_SQL["part_kcore"] = _kcore_sql(k=80, rounds=2)


def _label_prop_sql(rounds: int) -> str:
    """Unrolled synchronous majority label propagation over the co-order
    part graph — one window-ranked mode CTE per round, mirroring
    `ops/communities.label_propagation` (count DESC, smallest label)."""
    ctes = [
        """pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        "e AS (SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v, u FROM pairs)",
        """lp0 AS (SELECT node, node AS label FROM
                   (SELECT u AS node FROM pairs UNION SELECT v FROM pairs))""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""lp{r} AS (SELECT node, nb_label AS label FROM (
                SELECT e.d AS node, l.label AS nb_label, count(*) AS c,
                       row_number() OVER (PARTITION BY e.d
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM e JOIN lp{r - 1} l ON l.node = e.s
                GROUP BY e.d, l.label) WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f" SELECT node, CAST(label AS BIGINT) AS community FROM lp{rounds}"
    )


ORACLE_SQL["communities"] = _label_prop_sql(rounds=2)

ORACLE_SQL["embed_quant"] = """
    WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
    x AS (SELECT e.vec_id AS id, idx.i,
                 CAST(e.embedding[idx.i] AS DOUBLE) AS xv
          FROM embeddings e, idx),
    m AS (SELECT id, MAX(ABS(xv)) AS absmax FROM x GROUP BY id)
    SELECT x.id, x.i,
           CAST(CASE WHEN m.absmax = 0 THEN 0
                     ELSE floor(x.xv * 127.0 / m.absmax) END AS BIGINT)
               AS code,
           m.absmax
    FROM x JOIN m USING (id)
"""

ORACLE_SQL["part_rank"] = """
    WITH t AS (SELECT l_partkey,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                          AS total_qty
               FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, total_qty,
           CAST(DENSE_RANK() OVER (ORDER BY total_qty DESC) AS BIGINT)
               AS rank
    FROM t
"""

from ..ops.profile import table_checksum_sql as _cksum_sql  # noqa: E402

ORACLE_SQL["lineitem_checksum"] = _cksum_sql(
    "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"]
)

ORACLE_SQL["event_funnel"] = """
    WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t
           FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t
           FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM s1
    UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM s3
"""

def _walks_sql(length: int = 3) -> str:
    """Unrolled random-walk mirror: ranked sorted adjacency + the same
    md5-mod neighbor pick per step."""
    parts = [
        """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS node, v AS nbr FROM pairs
            UNION ALL SELECT v, u FROM pairs),
    ranked AS (SELECT node, nbr,
                      ROW_NUMBER() OVER (PARTITION BY node ORDER BY nbr) - 1
                          AS r,
                      COUNT(*) OVER (PARTITION BY node) AS deg
               FROM adj),
    w0 AS (SELECT DISTINCT node AS walk_id, node FROM adj)"""
    ]
    for s in range(1, length + 1):
        parts.append(
            f""",
    w{s} AS (SELECT w.walk_id, rk.nbr AS node
             FROM w{s - 1} w JOIN ranked rk ON rk.node = w.node
              AND rk.r = CAST(('0x' || substr(md5(
                      CAST(w.walk_id AS VARCHAR) || ':{s}'), 1, 15))
                      AS BIGINT) % rk.deg)"""
        )
    sel = ["SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0"]
    for s in range(1, length + 1):
        sel.append(f"SELECT walk_id, CAST({s} AS BIGINT), node FROM w{s}")
    parts.append("\n    " + "\n    UNION ALL ".join(sel))
    return "".join(parts)


ORACLE_SQL["part_walks"] = _walks_sql(length=3)


def _hits_sql(iters: int = 3) -> str:
    """Unrolled HITS path-count mirror over the KG eraw edges."""
    parts = [
        f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    n0 AS (SELECT src AS node FROM eraw UNION SELECT dst FROM eraw),
    h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM n0)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    a{k} AS (SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS a
             FROM eraw e JOIN h{k - 1} h ON h.node = e.src
             GROUP BY e.dst),
    h{k} AS (SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS h
             FROM eraw e JOIN a{k} a ON a.node = e.dst
             GROUP BY e.src)"""
        )
    parts.append(
        f"""
    SELECT n0.node, COALESCE(h{iters}.h, 0) AS hub,
           COALESCE(a{iters}.a, 0) AS auth
    FROM n0 LEFT JOIN h{iters} ON h{iters}.node = n0.node
            LEFT JOIN a{iters} ON a{iters}.node = n0.node"""
    )
    return "".join(parts)


ORACLE_SQL["kg_hits"] = _hits_sql(iters=3)


def _katz_sql(iters: int = 3, base: int = 4) -> str:
    """Unrolled Katz scaled-integer mirror over the KG eraw edges —
    ``sum_l n_l(v) * base**(iters-l)`` with n_l the length-l path counts."""
    parts = [
        f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    n0 AS (SELECT src AS node FROM eraw UNION SELECT dst FROM eraw),
    p0 AS (SELECT node, CAST(1 AS BIGINT) AS c FROM n0)"""
    ]
    for l in range(1, iters + 1):
        parts.append(
            f""",
    p{l} AS (SELECT e.dst AS node, CAST(SUM(p.c) AS BIGINT) AS c
             FROM eraw e JOIN p{l - 1} p ON p.node = e.src
             GROUP BY e.dst)"""
        )
    score = " + ".join(
        f"COALESCE(p{l}.c, 0) * {base ** (iters - l)}"
        for l in range(1, iters + 1)
    )
    joins = "".join(
        f" LEFT JOIN p{l} ON p{l}.node = n0.node"
        for l in range(1, iters + 1)
    )
    parts.append(
        f"""
    SELECT n0.node, CAST({score} AS BIGINT) AS katz FROM n0{joins}"""
    )
    return "".join(parts)


ORACLE_SQL["kg_katz"] = _katz_sql(iters=3, base=4)

ORACLE_SQL["conv_dot"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    eraw AS (
        SELECT conv_id AS src, conv_id || '#' || turn_idx AS dst FROM t
        UNION ALL
        SELECT conv_id || '#' || turn_idx, tool FROM t WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id || '#' || turn_idx || '#' || keyword, 'concept:' || tag
        FROM occ
    ),
    e AS (SELECT DISTINCT src, dst FROM eraw),
    c AS (SELECT string_split(src, '#')[1] AS conv_id, src, dst FROM e)
    SELECT conv_id,
           'digraph {{' || chr(10)
           || string_agg('  "' || src || '" -> "' || dst || '";' || chr(10),
                         '' ORDER BY src, dst)
           || '}}' AS dot
    FROM c GROUP BY conv_id
"""

ORACLE_SQL["conv_json"] = f"""
    WITH {_T_CTE}
    SELECT conv_id, CAST(COUNT(text) AS BIGINT) AS n_msgs,
           '[' || string_agg(
               '{{"role": "' || role || '", "content": "' || text || '"}}',
               ', ' ORDER BY turn_idx) || ']' AS messages
    FROM t WHERE text IS NOT NULL GROUP BY conv_id
"""

ORACLE_SQL["conv_text"] = f"""
    WITH {_T_CTE}
    SELECT conv_id, CAST(COUNT(text) AS BIGINT) AS n_items,
           string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
               AS full_text
    FROM t GROUP BY conv_id
"""

ORACLE_SQL["kg_report"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
    SELECT 'node' AS kind, 'conversation' AS name,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n FROM t
    UNION ALL SELECT 'node', 'turn', CAST(COUNT(*) AS BIGINT) FROM t
    UNION ALL SELECT 'node', 'tool',
           CAST(COUNT(DISTINCT tool) AS BIGINT) FROM t
           WHERE tool IS NOT NULL
    UNION ALL SELECT 'node', 'mention', CAST(COUNT(*) AS BIGINT) FROM occ
    UNION ALL SELECT 'node', 'concept',
           CAST(COUNT(DISTINCT tag) AS BIGINT) FROM onto
    UNION ALL SELECT 'edge', 'utters', CAST(COUNT(*) AS BIGINT) FROM t
    UNION ALL SELECT 'edge', 'used_tool', CAST(COUNT(*) AS BIGINT) FROM t
           WHERE tool IS NOT NULL
    UNION ALL SELECT 'edge', 'tagged_as', CAST(COUNT(*) AS BIGINT) FROM occ
"""

ORACLE_SQL["value_mad"] = """
    WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS med
               FROM events GROUP BY event_type),
    d AS (SELECT e.event_type, abs(e.value - m.med) AS dev
          FROM events e JOIN m USING (event_type)),
    md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
           FROM d GROUP BY event_type)
    SELECT m.event_type, m.med, md.mad FROM m JOIN md USING (event_type)
"""

ORACLE_SQL["region_rollup"] = """
    SELECT r.r_name, o.o_orderpriority,
           CAST(SUM(CAST(round(o.o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders o
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, o.o_orderpriority)
"""

ORACLE_SQL["event_share"] = """
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
                      CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2)
    SELECT event_type, window_start, n_events,
           round(CAST(n_events AS DOUBLE)
                 / SUM(n_events) OVER (PARTITION BY window_start), 8)
               AS share
    FROM h
"""

ORACLE_SQL["lineitem_corr"] = """
    WITH q AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_extendedprice) AS BIGINT) AS y
               FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(x * y) AS BIGINT) AS sxy
    FROM q
"""

ORACLE_SQL["event_deltas"] = """
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
                      CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2)
    SELECT event_type, window_start, n_events,
           CAST(n_events - COALESCE(
               LAG(n_events) OVER (PARTITION BY event_type
                                   ORDER BY window_start), n_events)
               AS BIGINT) AS delta_n
    FROM h
"""

ORACLE_SQL["tag_pivot"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE}
    SELECT conv_id || '#' || turn_idx AS turn_key,
           {", ".join(
               'CAST(SUM(CASE WHEN tag = ' + repr(t) +
               ' THEN n_matches ELSE 0 END) AS BIGINT) AS "' + t + '"'
               for t in sorted({t for t, _k, _c in ONTOLOGY})
           )}
    FROM occ GROUP BY conv_id || '#' || turn_idx
"""

ORACLE_SQL["diameter_est"] = """
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e AS (SELECT u AS s, v AS d FROM pairs
          UNION ALL SELECT v, u FROM pairs),
    r1(node, h) AS (
        SELECT CAST(1 AS BIGINT), 0
        UNION ALL
        SELECT e.d, r1.h + 1 FROM r1 JOIN e ON e.s = r1.node WHERE r1.h < 3),
    b1 AS (SELECT node, MIN(h) AS h FROM r1 GROUP BY node),
    s1 AS (SELECT MAX(h) AS ecc1 FROM b1),
    far AS (SELECT MIN(node) AS far FROM b1
            WHERE h = (SELECT ecc1 FROM s1)),
    r2(node, h) AS (
        SELECT far, 0 FROM far
        UNION ALL
        SELECT e.d, r2.h + 1 FROM r2 JOIN e ON e.s = r2.node WHERE r2.h < 3),
    b2 AS (SELECT node, MIN(h) AS h FROM r2 GROUP BY node)
    SELECT CAST(1 AS BIGINT) AS start,
           (SELECT far FROM far) AS far,
           CAST((SELECT ecc1 FROM s1) AS BIGINT) AS ecc1,
           CAST(MAX(h) AS BIGINT) AS ecc2
    FROM b2
"""

ORACLE_SQL["user_top_event"] = """
    WITH c AS (SELECT user_id, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type, n FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) = 1
"""

ORACLE_SQL["lineitem_wsample"] = """
    WITH kw AS (SELECT l_orderkey * 10 + l_linenumber AS k,
                       CAST(l_quantity AS BIGINT) AS w
                FROM lineitem)
    SELECT k, w FROM kw
    WHERE CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))
                    AS BIGINT) AS HUGEINT) * 50
          < CAST(w AS HUGEINT) * (CAST(1 AS HUGEINT) << 60)
"""

ORACLE_SQL["order_ranks"] = """
    SELECT o_orderkey, o_orderpriority,
           round(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_orderkey), 8) AS pr,
           CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderkey) AS BIGINT) AS t4
    FROM orders
"""

ORACLE_SQL["orders_diff"] = """
    SELECT o_orderkey, 'only_left' AS status FROM orders
    WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, 'changed' FROM orders WHERE o_orderkey % 7 = 3
    UNION ALL
    SELECT o_orderkey + 10000000, 'only_right' FROM orders
    WHERE o_orderkey % 7 = 5
"""

ORACLE_SQL["orders_merge"] = """
    WITH snap AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders)
    SELECT o_orderkey, o_orderstatus, cents FROM snap
    WHERE o_orderkey % 7 <> 0 AND o_orderkey % 7 <> 3
    UNION ALL
    SELECT o_orderkey, 'X', cents + 100 FROM snap WHERE o_orderkey % 7 = 3
    UNION ALL
    SELECT o_orderkey + 10000000, 'N', CAST(0 AS BIGINT)
    FROM snap WHERE o_orderkey % 7 = 5
"""

_CO_ORDER_DEG_CTES = """
    pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u AS node, v AS nbr FROM pairs
            UNION ALL SELECT v, u FROM pairs),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
            FROM adj GROUP BY node)
"""

ORACLE_SQL["clustering_coef"] = f"""
    WITH {_CO_ORDER_DEG_CTES},
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM pairs e1
        JOIN pairs e2 ON e1.v = e2.u
        JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
    corner AS (SELECT a AS node FROM tri UNION ALL
               SELECT b FROM tri UNION ALL
               SELECT c FROM tri),
    tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
           FROM corner GROUP BY node)
    SELECT deg.node, COALESCE(tc.n_tri, 0) AS n_tri, deg.d AS deg,
           round(CASE WHEN deg.d > 1
                      THEN 2.0 * COALESCE(tc.n_tri, 0)
                           / (deg.d * (deg.d - 1))
                      ELSE 0.0 END, 8) AS coef
    FROM deg LEFT JOIN tc ON tc.node = deg.node
"""

ORACLE_SQL["part_assort"] = f"""
    WITH {_CO_ORDER_DEG_CTES},
    de AS (SELECT du.d AS j, dv.d AS k
           FROM adj a JOIN deg du ON du.node = a.node
                      JOIN deg dv ON dv.node = a.nbr),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(j) AS BIGINT) AS s1,
                 CAST(SUM(j * k) AS BIGINT) AS s2,
                 CAST(SUM(j * j) AS BIGINT) AS s3
          FROM de)
    SELECT m, m * s2 - s1 * s1 AS num, m * s3 - s1 * s1 AS den FROM s
"""

ORACLE_SQL["degree_hist"] = f"""
    WITH {_CO_ORDER_DEG_CTES}
    SELECT CAST(floor(log2(d)) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM deg GROUP BY 1
"""

ORACLE_SQL["embed_cov"] = """
    WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
    q AS (SELECT e.vec_id, idx.i,
                 CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1048576.0)
                      AS BIGINT) AS qv
          FROM embeddings e, idx),
    s AS (SELECT i, CAST(SUM(qv) AS BIGINT) AS s1 FROM q GROUP BY i),
    p AS (SELECT a.i AS i, b.i AS j,
                 CAST(SUM(a.qv * b.qv) AS BIGINT) AS s2
          FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY a.i, b.i),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM embeddings)
    SELECT p.i, p.j,
           CAST((SELECT c FROM n) * p.s2 - sa.s1 * sb.s1 AS BIGINT) AS num
    FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
"""

ORACLE_SQL["token_lift"] = """
    WITH tok AS (
        SELECT DISTINCT doc_id, t.tok
        FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        WHERE t.tok <> ''),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY tok),
    voc AS (SELECT tok, c FROM df WHERE c >= 50),
    vt AS (SELECT t.doc_id, t.tok FROM tok t
           JOIN voc ON voc.tok = t.tok),
    pairs AS (
        SELECT a.tok AS u, b.tok AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM vt a JOIN vt b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
        HAVING COUNT(*) >= 25),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
    SELECT p.u, p.v, p.c AS n_co,
           round((SELECT n FROM n) * p.c / (du.c * dv.c), 8) AS lift
    FROM pairs p
    JOIN voc du ON du.tok = p.u
    JOIN voc dv ON dv.tok = p.v
"""

ORACLE_SQL["orders_rollup"] = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

ORACLE_SQL["event_running"] = """
    SELECT event_id,
           CAST(SUM(CAST(round(value * 100.0) AS BIGINT))
                OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS run_total
    FROM events
"""

ORACLE_SQL["max_concurrent"] = """
    WITH iv AS (SELECT epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(floor(value) AS BIGINT) * 1000000 AS e
                FROM events),
    d AS (SELECT s AS t, CAST(1 AS BIGINT) AS d FROM iv
          UNION ALL
          SELECT e AS t, CAST(-1 AS BIGINT) AS d FROM iv),
    r AS (SELECT SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING)
                 AS run FROM d)
    SELECT CAST(MAX(run) AS BIGINT) AS max_concurrent FROM r
"""

ORACLE_SQL["orders_cube"] = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLE_SQL["cheap_paths"] = """
    WITH RECURSIVE mp AS (
        SELECT l_orderkey AS o, l_partkey AS p,
               MIN(l_linenumber) AS ln
        FROM lineitem GROUP BY l_orderkey, l_partkey),
    pairs AS (
        SELECT a.p AS u, b.p AS v, CAST(MIN(a.ln + b.ln) AS BIGINT) AS w
        FROM mp a JOIN mp b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p),
    e AS (SELECT u AS s, v AS d, w FROM pairs
          UNION ALL SELECT v, u, w FROM pairs),
    walk(node, cost, h) AS (
        SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
        UNION ALL
        SELECT e.d, walk.cost + e.w, walk.h + 1
        FROM walk JOIN e ON e.s = walk.node WHERE walk.h < 3)
    SELECT node, CAST(MIN(cost) AS BIGINT) AS cost
    FROM walk GROUP BY node
"""

ORACLE_SQL["incr_new_docs"] = f"""
    WITH prior AS (SELECT md5(text) AS h FROM documents
                   WHERE doc_id < {INCR_PRIOR_MAX}),
    inc AS (SELECT doc_id, lang, md5(text) AS h FROM documents
            WHERE doc_id >= {INCR_INC_MIN})
    SELECT doc_id, lang FROM inc
    WHERE h NOT IN (SELECT h FROM prior)
"""

ORACLE_SQL["kg_negatives"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    concepts AS (SELECT DISTINCT tag FROM onto),
    ranked AS (SELECT tag,
                      CAST(row_number() OVER (ORDER BY tag) - 1 AS BIGINT) AS r
               FROM concepts),
    pos AS (SELECT conv_id || '#' || turn_idx || '#' || keyword AS subj,
                   'concept:' || tag AS pos_obj
            FROM occ),
    cand AS (SELECT subj, pos_obj, CAST(g.j AS BIGINT) AS j,
                    (('0x' || substr(md5(subj || '|' || CAST(g.j AS VARCHAR)),
                                     1, 15))::BIGINT
                     % (SELECT COUNT(*) FROM concepts)) AS r
             FROM pos, range(0, {KG_NEG_K}) AS g(j))
    SELECT cand.subj, 'tagged_as' AS pred, cand.pos_obj,
           'concept:' || ranked.tag AS neg_obj, cand.j
    FROM cand JOIN ranked USING (r)
    WHERE 'concept:' || ranked.tag <> cand.pos_obj
"""

ORACLE_SQL["basket_pairs"] = f"""
    WITH p AS (SELECT DISTINCT a.l_orderkey, a.l_partkey AS u,
                               b.l_partkey AS v
               FROM lineitem a JOIN lineitem b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey)
    SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support
    FROM p GROUP BY u, v HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
"""

ORACLE_SQL["basket_rules"] = f"""
    WITH p AS (SELECT DISTINCT a.l_orderkey, a.l_partkey AS u,
                               b.l_partkey AS v
               FROM lineitem a JOIN lineitem b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
    sup AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s
            FROM p GROUP BY u, v HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}),
    item AS (SELECT l_partkey,
                    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
             FROM lineitem GROUP BY l_partkey),
    both_dir AS (SELECT u AS ante, v AS cons, s FROM sup
                 UNION ALL SELECT v, u, s FROM sup)
    SELECT b.ante, b.cons, b.s AS sup_pair, i.n AS sup_ante
    FROM both_dir b JOIN item i ON i.l_partkey = b.ante
    WHERE 8 * b.s >= i.n
"""

ORACLE_SQL["kg_eval"] = f"""
    WITH {_T_CTE}, {_ONTO_CTE}, {_OCC_CTE},
    concepts AS (SELECT DISTINCT tag FROM onto),
    ranked AS (SELECT tag,
                      CAST(row_number() OVER (ORDER BY tag) - 1 AS BIGINT) AS r
               FROM concepts),
    pos AS (SELECT conv_id || '#' || turn_idx || '#' || keyword AS subj,
                   'concept:' || tag AS pos_obj
            FROM occ),
    deg AS (SELECT 'concept:' || tag AS obj,
                   CAST(COUNT(*) AS BIGINT) AS deg
            FROM occ GROUP BY 1),
    cand AS (SELECT subj, pos_obj,
                    (('0x' || substr(md5(subj || '|' || CAST(g.j AS VARCHAR)),
                                     1, 15))::BIGINT
                     % (SELECT COUNT(*) FROM concepts)) AS r
             FROM pos, range(0, {KG_NEG_K}) AS g(j)),
    negsel AS (SELECT cand.subj, cand.pos_obj,
                      'concept:' || ranked.tag AS neg_obj
               FROM cand JOIN ranked USING (r)
               WHERE 'concept:' || ranked.tag <> cand.pos_obj),
    b AS (SELECT n.subj,
                 CAST(SUM(CASE WHEN dn.deg > dp.deg
                               OR (dn.deg = dp.deg
                                   AND n.neg_obj < n.pos_obj)
                          THEN 1 ELSE 0 END) AS BIGINT) AS beats
          FROM negsel n JOIN deg dp ON dp.obj = n.pos_obj
                        JOIN deg dn ON dn.obj = n.neg_obj
          GROUP BY n.subj)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pos) AS n_pos,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pos)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM b WHERE beats >= 1)
             AS hits1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pos)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM b WHERE beats >= 3)
             AS hits3,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pos)
           + (SELECT CAST(COALESCE(SUM(beats), 0) AS BIGINT) FROM b)
             AS sum_rank
"""

ORACLE_SQL["neighbor_mean"] = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e AS (SELECT u AS s, v AS d FROM pairs
          UNION ALL SELECT v, u FROM pairs)
    SELECT e.s AS node, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
           CAST(SUM(p.p_size) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS mean_feat
    FROM e JOIN part p ON p.p_partkey = e.d
    GROUP BY e.s
"""

ORACLE_SQL["quality_gate"] = f"""
    WITH thr AS (SELECT lang, quantile_disc(n_chars, {QUALITY_GATE_Q}) AS q
                 FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN thr USING (lang)
    WHERE d.n_chars >= thr.q
"""


ORACLE_SQL["retention"] = """
    WITH uw AS (SELECT DISTINCT user_id,
                       datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
                FROM events),
    first AS (SELECT user_id, MIN(w) AS w0 FROM uw GROUP BY user_id)
    SELECT CAST(w0 AS BIGINT) AS cohort_week,
           CAST(uw.w - w0 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN first USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["doc_tree"] = """
    WITH RECURSIVE anc AS (
        SELECT doc_id AS node, n_chars FROM documents
        UNION ALL
        SELECT node // 10, n_chars FROM anc WHERE node > 0)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_leaves,
           CAST(SUM(n_chars) AS BIGINT) AS total
    FROM anc GROUP BY node
"""


ORACLE_SQL["node_ids"] = f"""
    SELECT node_id, node_type,
           CAST(row_number() OVER (ORDER BY node_id) - 1 AS BIGINT) AS "rank"
    FROM ({ORACLE_SQL["nodes"]}) AS n
"""


from ..ops.sketch import histogram_quantiles_sql as _hq_sql  # noqa: E402

ORACLE_SQL["hist_quantiles"] = _hq_sql("events", "event_type", "value")


ORACLE_SQL["harmonic"] = f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e AS (SELECT u AS s, v AS d FROM pairs
          UNION ALL SELECT v, u FROM pairs),
    seeds(sd) AS (VALUES {", ".join(f"({s})" for s in [1, 2, 3, 4])}),
    reach(seed, node, h) AS (
        SELECT CAST(sd AS BIGINT), CAST(sd AS BIGINT), 0 FROM seeds
        UNION ALL
        SELECT r.seed, e.d, r.h + 1 FROM reach r JOIN e ON e.s = r.node
        WHERE r.h < 2),
    best AS (SELECT seed, node, MIN(h) AS h FROM reach GROUP BY seed, node)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_seeds,
           CAST(SUM(6 // h) AS BIGINT) AS h6
    FROM best WHERE h > 0 GROUP BY node
"""


ORACLE_SQL["value_buckets"] = """
    WITH thr AS (SELECT event_type,
                        quantile_disc(value, 0.25) AS q1,
                        quantile_disc(value, 0.5)  AS q2,
                        quantile_disc(value, 0.75) AS q3
                 FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           CAST((CASE WHEN e.value >= q1 THEN 1 ELSE 0 END)
              + (CASE WHEN e.value >= q2 THEN 1 ELSE 0 END)
              + (CASE WHEN e.value >= q3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
    FROM events e JOIN thr USING (event_type)
"""
