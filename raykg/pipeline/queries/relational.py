"""Warehouse-style relational queries over the TPC-H-ish tables.

Split from the former pipeline/queries.py monolith; definitions are
verbatim.  Registers its queries/oracles into the shared registry.
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

from ..config import PipelineConfig
from ..graph import build_nodes, concept_scores, extract_triples, triples_to_edges
from ..tag import extract_mentions, tag_dataset
from ..transcripts import TRANSCRIPTS_SQL, read_transcripts
from ...core.ontology import clean_ontology
from ...ops import dedup as dedup_ops
from ...ops import multimodal as mm_ops
from ...ops import similarity as sim_ops
from ...ops import text as text_ops
from ._shared import (ONTOLOGY, ONTOLOGY_SQL_VALUES, _ONTO_CTE, _T_CTE, _OCC_CTE, _cfg, QUERIES, ORACLE_SQL)



def q_suppliers_by_region(sf_dir: str):
    """Star-schema rollup: suppliers enriched through two chained
    broadcast dimension joins (nation, region — the canonical pattern for
    small dims at corpus scale), per-batch pre-aggregated, then a tiny
    5-group reduce."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import broadcast_join

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

    from ...ops.agg import sharded_groupby_apply

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


def q_bloom_join(sf_dir: str):
    """Selective fact-dim join with Bloom shuffle pruning: per-order item
    count + integer-cents revenue for urgent finished orders only —
    `ops/bloom.bloom_prefilter` drops partnerless lineitem rows BEFORE
    the bucketed hash join's exchange (fixed-size bit array vs the
    semi-join's O(keys) array); Bloom false positives are removed by the
    exact join, so the result equals the plain SQL join."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.bloom import bloom_prefilter
    from ...ops.join import bucketed_hash_join

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
    from ...ops.agg import sharded_groupby_apply
    from ...ops.zorder import zorder_key

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


def q_join_broadcast(sf_dir: str):
    """Broadcast (map-side) join: orders enriched with customer attributes —
    the small side ships once via ray.put, no shuffle (ops/join.py)."""
    import pyarrow.parquet as pq_mod

    from ...ops.join import broadcast_join

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

    from ...ops.join import bucketed_hash_join

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


def q_orders_semi(sf_dir: str):
    """Broadcast semi-join: orders of customers with acctbal > 5000."""
    from ...ops.join import semi_join

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
    from ...ops.join import semi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    rich = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).filter(expr="c_acctbal > 5000")
    return semi_join(orders, rich, on="o_custkey", right_on="c_custkey", anti=True)


def q_approx_distinct(sf_dir: str):
    """KMV sketch estimate of the distinct customers placing orders —
    deterministic and exactly mirrored by the SQL oracle."""
    from ...ops.sketch import kmv_distinct

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    return kmv_distinct(orders, "o_custkey", k=256)


def q_order_zscore(sf_dir: str):
    """Per-priority z-score of order totals — `ops/feature.py` (no row
    exchange: moment partials reduce to a 5-row table broadcast back
    into a stateless map)."""
    import pyarrow.compute as pc

    from ...ops.feature import zscore_by_group

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


BASKET_MIN_SUPPORT = 3


def q_basket_pairs(sf_dir: str):
    """Frequent itemset pairs (market-basket level 2): part pairs
    co-ordered in >= 3 orders — `group_pairs` (order-sharded pair
    expansion, distinct per order) into one pair-sharded support count
    with the HAVING filter applied in-shard."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.triangles import group_pairs

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
    from ...ops.agg import sharded_groupby_apply
    from ...ops.setops import distinct_rows

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


def q_price_hist(sf_dir: str):
    """24-bin fixed-width histogram of order total price —
    `ops/profile.histogram_fixed` (per-batch bincount partials, one tiny
    bin exchange; zero shuffles of data rows)."""
    from ...ops.profile import histogram_fixed

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
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import bucketed_hash_join

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


def q_lineitem_checksum(sf_dir: str):
    """Order-independent content checksum of lineitem's key columns —
    `ops/profile.table_checksum` (commutative md5-sum mod 2^61-1; scalar
    partials per batch, nothing corpus-scale moves).  The cross-engine
    migration-validation primitive."""
    from ...ops.profile import table_checksum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )
    return table_checksum(li, ["l_orderkey", "l_partkey", "l_linenumber"])


def q_hll_custkeys(sf_dir: str):
    """HyperLogLog register state for distinct customers in orders —
    `ops/sketch.HllSketch` (fixed 1024-register array per block,
    elementwise-max tree combine; order-independent, so the registers
    are bit-equal to the SQL mirror)."""
    from ...ops.sketch import hll_registers

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
    from ...ops.merge import apply_changeset

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


def q_region_rollup(sf_dir: str):
    """Warehouse chain end-to-end: orders enriched with region via two
    broadcast dim joins (customer -> nation -> region), then GROUP BY
    ROLLUP (region, order priority) in exact integer cents —
    `ops/join.broadcast_join` composed with `ops/rollup.rollup_sum`."""
    import pyarrow.parquet as pq_mod

    from ...ops.join import broadcast_join
    from ...ops.rollup import rollup_sum

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


def q_lineitem_wsample(sf_dir: str):
    """Probability-proportional sampling of lineitem (keep prob =
    quantity / 50) — `ops/sample.weighted_bernoulli`: the integer
    comparison h * denom < w * 2^60 IS u < w/denom exactly, so the
    sampled row set is bit-equal in SQL.  Stateless filter, zero
    exchanges, retry-reproducible."""
    from ...ops.sample import weighted_bernoulli

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
    `ops/window.window_over` rank kinds, auto-routed to rank-by-sort
    (`ops/rank.with_keyed_ranks`): ONE range-partitioned sort on
    (priority, orderkey), per-key offsets from block-edge metadata.  No
    shard worker ever holds a whole priority group — with 5 distinct
    priorities the old per-key shard plan put ~20% of the table in one
    worker, a scale-killer at 100 TB.  Exact SQL NTILE bucket sizes."""
    from ...ops.window import window_over

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
    from ...ops.merge import apply_changeset_diff

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


def q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP (priority, status) over orders: sum of total
    price in exact integer cents + row count at every prefix level
    (leaf, per-priority, grand) — `ops/rollup.py`, one leading-key
    exchange + a num_shards-row grand fold."""
    from ...ops.rollup import rollup_sum

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
    from ...ops.rollup import cube_sum

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


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_approx_counts(sf_dir: str):
    """Count-Min point estimates for the event types — bounded-size sketch
    exchange (depth x width ints per block), exactly mirrored in SQL."""
    from ...ops.sketch import countmin_counts

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return countmin_counts(ev, "event_type", probes=EVENT_TYPES, depth=4, width=512)


def q_lineitem_melt(sf_dir: str):
    """Wide -> long explode of the lineitem charge columns."""
    from ...ops.reshape import melt

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
    from ...ops.setops import except_rows

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


def q_order_windows(sf_dir: str):
    """Per-customer ordered window functions over orders: row_number,
    lagged price, and a running total — SQL's OVER (PARTITION BY custkey
    ORDER BY orderdate, orderkey) family on one sharded shuffle.  The
    running total is in integer cents: float summation order is engine-
    defined, int summation is exact everywhere."""
    from ...ops.window import window_over

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
QUERIES["orders_cube"] = q_orders_cube
QUERIES["bloom_join"] = q_bloom_join
QUERIES["zorder_tiles"] = q_zorder_tiles
QUERIES["basket_pairs"] = q_basket_pairs
QUERIES["basket_rules"] = q_basket_rules
QUERIES["suppliers_by_region"] = q_suppliers_by_region
QUERIES["part_brands"] = q_part_brands
QUERIES["approx_counts"] = q_approx_counts
QUERIES["order_zscore"] = q_order_zscore
QUERIES["orders_rollup"] = q_orders_rollup
QUERIES["orders_merge"] = q_orders_merge
QUERIES["orders_diff"] = q_orders_diff
QUERIES["order_ranks"] = q_order_ranks
QUERIES["lineitem_wsample"] = q_lineitem_wsample
QUERIES["lineitem_corr"] = q_lineitem_corr
QUERIES["region_rollup"] = q_region_rollup
QUERIES["hll_custkeys"] = q_hll_custkeys
QUERIES["lineitem_checksum"] = q_lineitem_checksum
QUERIES["cust_orders_left"] = q_cust_orders_left
QUERIES["price_hist"] = q_price_hist
QUERIES["join_broadcast"] = q_join_broadcast
QUERIES["join_bucketed"] = q_join_bucketed
QUERIES["orders_semi"] = q_orders_semi
QUERIES["orders_anti"] = q_orders_anti
QUERIES["order_windows"] = q_order_windows
QUERIES["approx_distinct"] = q_approx_distinct
QUERIES["lineitem_melt"] = q_lineitem_melt
QUERIES["custs_no_orders"] = q_custs_no_orders
ORACLE_SQL["join_broadcast"] = """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderpriority,
               c.c_name, c.c_mktsegment
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """
ORACLE_SQL["join_bucketed"] = """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               round(SUM(l.l_quantity), 4) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
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

# KMV sketch mirror: identical md5-60bit hash, identical integer estimate
from ...ops.sketch import kmv_oracle_sql as _kmv_sql  # noqa: E402

ORACLE_SQL["approx_distinct"] = _kmv_sql("orders", "o_custkey", k=256)

from ...ops.sketch import hll_oracle_sql as _hll_sql  # noqa: E402

ORACLE_SQL["hll_custkeys"] = _hll_sql("orders", "o_custkey")

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

def _zorder_tiles_sql() -> str:
    from ...ops.zorder import zorder_sql_expr

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

ORACLE_SQL["bloom_join"] = """
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey
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

from ...ops.sketch import countmin_oracle_sql as _cm_sql  # noqa: E402

ORACLE_SQL["approx_counts"] = _cm_sql(
    "events", "event_type", probes=EVENT_TYPES, depth=4, width=512
)

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

from ...ops.profile import table_checksum_sql as _cksum_sql  # noqa: E402

ORACLE_SQL["lineitem_checksum"] = _cksum_sql(
    "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"]
)

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

ORACLE_SQL["orders_rollup"] = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

ORACLE_SQL["orders_cube"] = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
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


def q_part_skyline(sf_dir: str):
    """Skyline / Pareto frontier of the part table, minimizing
    (p_retailprice, p_size): parts for which no other part is both
    cheaper-or-equal AND smaller-or-equal with one strict.  Block-local
    frontier pruning (`ops/skyline.py`) shrinks each block to
    ~O((ln n)^(d-1)) candidates before a single-block final pass — the
    ICDE'01 skyline operator expressed as two map_batches rounds with
    no shuffle."""
    from ...ops.skyline import skyline

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    return skyline(parts, ["p_retailprice", "p_size"])


QUERIES["part_skyline"] = q_part_skyline
ORACLE_SQL["part_skyline"] = """
    SELECT p_partkey, p_size, p_retailprice FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
"""


def q_lineitem_spearman(sf_dir: str):
    """Spearman rank correlation of quantity vs extended price with
    tie-AVERAGED ranks via rank-by-sort (`ops/rank.with_avg_ranks`):
    one range-partitioned sort per column, block-local tie ranks with a
    driver-merged boundary fix-up, streaming moment partials
    (`ops/spearman.py`).  No joins — the value->rank table of the price
    column is near row-cardinality, so a join-back plan would ship the
    corpus twice more."""
    from ...ops.spearman import spearman

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    return spearman(li, "l_quantity", "l_extendedprice")


def q_order_gini(sf_dir: str):
    """Per-priority Gini coefficient of order value (the inequality
    index: 2*sum(i*x_(i))/(n*sum x) - (n+1)/n over ascending order
    totals) — one hash exchange via the sharded-groupby combinator, a
    single vectorized lexsort + cumcount kernel per shard
    (`ops/gini.py`)."""
    from ...ops.gini import gini_by

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return gini_by(orders, ["o_orderpriority"], "o_totalprice")


def q_order_ranksum(sf_dir: str):
    """Mann-Whitney U (rank-sum) of order value between URGENT and LOW
    priorities — tie-averaged ranks of the combined sample via
    rank-by-sort (the group column rides along through the sort),
    two-row per-batch rank-sum partials (`ops/ranktest.py`);
    U = R - n(n+1)/2."""
    from ...ops.ranktest import rank_sum_test

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return rank_sum_test(
        orders, "o_orderpriority", "o_totalprice", "1-URGENT", "5-LOW"
    )


QUERIES["lineitem_spearman"] = q_lineitem_spearman
QUERIES["order_gini"] = q_order_gini
QUERIES["order_ranksum"] = q_order_ranksum
ORACLE_SQL["order_ranksum"] = """
    WITH f AS (SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         r AS (SELECT grp, RANK() OVER (ORDER BY v)
                           + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk
               FROM f)
    SELECT grp, COUNT(*) AS n, ROUND(SUM(rk), 2) AS rank_sum,
           ROUND(SUM(rk) - COUNT(*) * (COUNT(*) + 1.0) / 2.0, 2) AS u_stat
    FROM r GROUP BY grp
"""
ORACLE_SQL["lineitem_spearman"] = """
    WITH r AS (SELECT
        RANK() OVER (ORDER BY l_quantity)
            + (COUNT(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
        RANK() OVER (ORDER BY l_extendedprice)
            + (COUNT(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
        FROM lineitem)
    SELECT ROUND(corr(rx, ry), 6) AS spearman_rho FROM r
"""
ORACLE_SQL["order_gini"] = """
    WITH r AS (SELECT o_orderpriority, o_totalprice AS v,
                      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice) AS i
               FROM orders)
    SELECT o_orderpriority,
           ROUND(2.0 * SUM(i * v) / (COUNT(*) * SUM(v))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM r GROUP BY o_orderpriority
"""


def q_order_chi2(sf_dir: str):
    """Chi-square independence test of order priority vs order status —
    observed-cells-only via the identity sum((o-e)^2/e) = sum(o^2/e) - n
    (`ops/contingency.py`); per-batch vectorized pair counts, bounded
    categorical grid, 9x3-row driver fold."""
    from ...ops.contingency import chi_square

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    return chi_square(orders, "o_orderpriority", "o_orderstatus")


def q_price_benford(sf_dir: str):
    """Benford leading-digit audit of extended price: exact integer
    digit extraction (scale to cents, vectorized integer division —
    never floor(log10), whose float error flips digits of exact powers
    of ten), 9-bin per-batch histograms, zero exchanges
    (`ops/digits.py`)."""
    from ...ops.digits import benford_digits

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    return benford_digits(li, "l_extendedprice")


QUERIES["order_chi2"] = q_order_chi2
QUERIES["price_benford"] = q_price_benford
ORACLE_SQL["order_chi2"] = """
    WITH c AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                      CAST(COUNT(*) AS DOUBLE) AS c
               FROM orders GROUP BY 1, 2),
    ta AS (SELECT a, SUM(c) AS t FROM c GROUP BY a),
    tb AS (SELECT b, SUM(c) AS t FROM c GROUP BY b),
    tn AS (SELECT SUM(c) AS n FROM c)
    SELECT ROUND(SUM(c.c * c.c / (ta.t * tb.t / tn.n)) - ANY_VALUE(tn.n), 6)
               AS chi2,
           CAST(((SELECT COUNT(*) FROM ta) - 1)
                * ((SELECT COUNT(*) FROM tb) - 1) AS BIGINT) AS dof
    FROM c JOIN ta USING (a) JOIN tb USING (b) CROSS JOIN tn
"""
ORACLE_SQL["price_benford"] = """
    WITH i AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
               FROM lineitem
               WHERE CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) > 0),
    d AS (SELECT CAST(SUBSTR(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM i),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    g AS (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS digit)
    SELECT g.digit, COALESCE(c.n, 0) AS n,
           ROUND(COALESCE(c.n, 0) / (SELECT SUM(n) FROM c), 6) AS p,
           ROUND(LN(1.0 + 1.0 / g.digit) / LN(10.0), 6) AS benford_p
    FROM g LEFT JOIN c USING (digit) ORDER BY g.digit
"""


def q_cust_kendall(sf_dir: str):
    """Exact Kendall tau-b between customer nation (bounded categorical
    side) and account balance — one sort(y) exchange, per-block sparse
    x-histograms, driver-merged cross-block y-tie groups, vectorized
    prefix-histogram C/D scan (`ops/kendall.py`).  The general inversion
    count doesn't distribute; the bounded-K contract is documented and
    enforced (loud error above 4096 distinct)."""
    from ...ops.kendall import kendall_tau

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    return kendall_tau(cust, "c_nationkey", "c_acctbal")


QUERIES["cust_kendall"] = q_cust_kendall
ORACLE_SQL["cust_kendall"] = """
    WITH p AS (SELECT a.c_nationkey AS x1, a.c_acctbal AS y1,
                      b.c_nationkey AS x2, b.c_acctbal AS y2
               FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey),
    s AS (SELECT
            SUM(CASE WHEN (x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2)
                     THEN 1 ELSE 0 END) AS c,
            SUM(CASE WHEN (x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2)
                     THEN 1 ELSE 0 END) AS d,
            SUM(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS nx,
            SUM(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS ny,
            COUNT(*) AS n0
          FROM p)
    SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           ROUND((c - d) / SQRT((n0 - nx) * (n0 - ny)), 6) AS kendall_tau
    FROM s
"""


def q_price_regression(sf_dir: str):
    """Per-returnflag OLS regression of extended price on quantity
    (slope ~ average unit price): six additive moments from per-batch
    vectorized grouped partials, zero exchanges, driver combine over
    the bounded flag set (`ops/regress.py`)."""
    from ...ops.regress import linreg_by

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return linreg_by(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


QUERIES["price_regression"] = q_price_regression
ORACLE_SQL["price_regression"] = """
    WITH m AS (SELECT l_returnflag,
                      CAST(COUNT(*) AS DOUBLE) AS n,
                      SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
                      SUM(l_quantity * l_quantity) AS sxx,
                      SUM(l_extendedprice * l_extendedprice) AS syy,
                      SUM(l_quantity * l_extendedprice) AS sxy
               FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
"""


TPCH_Q1_CUTOFF = "2000-09-02"


def q_tpch_q1(sf_dir: str):
    """TPC-H Q1 pricing summary (public benchmark semantics) in exact
    scaled integers: per (returnflag, linestatus), sums of quantity,
    base price (cents), discounted price (cents x100) and charge
    (cents x10^4), plus floor-integer averages — per-batch int64
    partials, one bounded (<= 6 cell) combine, no float summation
    anywhere, so the SQL mirror matches bit-for-bit at any scale."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    cutoff = np.datetime64(TPCH_Q1_CUTOFF).astype("datetime64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        ep = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100
        ).astype(np.int64)
        d100 = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        t100 = np.rint(
            batch["l_tax"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": pd.array(
                    batch["l_returnflag"].to_pylist()
                )[keep],
                "l_linestatus": pd.array(
                    batch["l_linestatus"].to_pylist()
                )[keep],
                "qty": qty,
                "base": ep,
                "disc": ep * (100 - d100),
                "charge": ep * (100 - d100) * (100 + t100),
                "d100": d100,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            n=("qty", "size"), sum_qty=("qty", "sum"),
            sum_base=("base", "sum"), sum_disc=("disc", "sum"),
            sum_charge=("charge", "sum"), sum_d100=("d100", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    cells = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["n", "sum_qty", "sum_base", "sum_disc", "sum_charge",
              "sum_d100"])
        .to_pandas()
        .rename(columns=lambda c: c.replace("sum(", "").rstrip(")")
                if c.startswith("sum(") else c)
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    n = cells["n"].to_numpy(np.int64)
    return pa.table(
        {
            "l_returnflag": pa.array(cells["l_returnflag"],
                                     type=pa.string()),
            "l_linestatus": pa.array(cells["l_linestatus"],
                                     type=pa.string()),
            "sum_qty": pa.array(cells["sum_qty"], type=pa.int64()),
            "sum_base_price_c": pa.array(cells["sum_base"],
                                         type=pa.int64()),
            "sum_disc_price_c2": pa.array(cells["sum_disc"],
                                          type=pa.int64()),
            "sum_charge_c4": pa.array(cells["sum_charge"],
                                      type=pa.int64()),
            "avg_qty_ppm": pa.array(
                cells["sum_qty"].to_numpy(np.int64) * 1_000_000 // n,
                type=pa.int64()),
            "avg_price_c": pa.array(
                cells["sum_base"].to_numpy(np.int64) // n,
                type=pa.int64()),
            "avg_disc_ppm": pa.array(
                cells["sum_d100"].to_numpy(np.int64) * 10_000 // n,
                type=pa.int64()),
            "count_order": pa.array(n, type=pa.int64()),
        }
    )


QUERIES["tpch_q1"] = q_tpch_q1
ORACLE_SQL["tpch_q1"] = f"""
    WITH s AS (SELECT l_returnflag, l_linestatus,
                      CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS d100,
                      CAST(ROUND(l_tax * 100) AS BIGINT) AS t100
               FROM lineitem
               WHERE l_shipdate <= TIMESTAMP '{TPCH_Q1_CUTOFF}')
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS BIGINT) AS sum_qty,
           CAST(SUM(ep) AS BIGINT) AS sum_base_price_c,
           CAST(SUM(ep * (100 - d100)) AS BIGINT) AS sum_disc_price_c2,
           CAST(SUM(ep * (100 - d100) * (100 + t100)) AS BIGINT)
               AS sum_charge_c4,
           CAST(SUM(qty) * 1000000 // COUNT(*) AS BIGINT) AS avg_qty_ppm,
           CAST(SUM(ep) // COUNT(*) AS BIGINT) AS avg_price_c,
           CAST(SUM(d100) * 10000 // COUNT(*) AS BIGINT) AS avg_disc_ppm,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM s GROUP BY 1, 2
"""


TPCH_Q3_DATE = "1998-03-15"
TPCH_Q3_SEGMENT = "BUILDING"


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shipping-priority top-10 (public benchmark semantics):
    BUILDING-segment customers' orders placed before D with lineitems
    shipping after D, ranked by open revenue.  Revenue is the exact
    scaled integer sum(ep_c * (100 - d100)).  Plan: broadcast
    semi-join orders against the filtered customer keys (small side by
    the segment filter's contract), per-batch revenue pre-agg then a
    sharded per-orderkey combine, ONE bucketed hash join back to order
    attributes, and the no-global-sort `ops/topk.global_topk` for the
    final 10 (unique orderkey tiebreak)."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import bucketed_hash_join, semi_join
    from ...ops.topk import global_topk

    d = np.datetime64(TPCH_Q3_DATE).astype("datetime64[us]")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr=f"c_mktsegment == '{TPCH_Q3_SEGMENT}'")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
    )

    def before(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(od < d))

    orders = semi_join(
        orders.map_batches(before, batch_format="pyarrow"),
        cust, on="o_custkey", right_on="c_custkey",
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship > d
        ep = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100
        ).astype(np.int64)
        d100 = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"]
                .to_numpy(zero_copy_only=False)[keep],
                "rc2": ep * (100 - d100),
            }
        )
        g = df.groupby("l_orderkey", sort=False)["rc2"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def rev_combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_orderkey", sort=False)["rc2"].sum().reset_index()
        return out.rename(columns={"rc2": "revenue_c2"})

    rev = sharded_groupby_apply(
        li.map_batches(rev_partial, batch_format="pyarrow"),
        ["l_orderkey"], rev_combine, num_shards=64,
    )

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    joined = bucketed_hash_join(
        rev, orders.map_batches(keyed, batch_format="pyarrow"),
        on="l_orderkey",
    )
    top = global_topk(joined, "revenue_c2", 10, descending=True,
                      tiebreak=["o_orderdate", "l_orderkey"])

    def typed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "revenue_c2": pc.cast(batch["revenue_c2"], pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    return top.map_batches(typed, batch_format="pyarrow")


QUERIES["tpch_q3"] = q_tpch_q3
ORACLE_SQL["tpch_q3"] = f"""
    WITH c AS (SELECT c_custkey FROM customer
               WHERE c_mktsegment = '{TPCH_Q3_SEGMENT}'),
    o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
          WHERE o_orderdate < TIMESTAMP '{TPCH_Q3_DATE}'
            AND o_custkey IN (SELECT c_custkey FROM c)),
    l AS (SELECT l_orderkey,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                     AS rc2
          FROM lineitem
          WHERE l_shipdate > TIMESTAMP '{TPCH_Q3_DATE}'),
    r AS (SELECT l_orderkey, CAST(SUM(rc2) AS BIGINT) AS revenue_c2
          FROM l GROUP BY 1)
    SELECT r.l_orderkey, r.revenue_c2, o.o_orderdate, o.o_orderpriority
    FROM r JOIN o ON o.o_orderkey = r.l_orderkey
    ORDER BY revenue_c2 DESC, o_orderdate, l_orderkey LIMIT 10
"""


TPCH_Q6_DATE = "1997-01-01"


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 forecasting-revenue-change (public benchmark
    semantics): one filtered scan, revenue = sum(ep_c * d100) in exact
    scaled integers (cents x100), zero exchanges — per-batch int64
    partials and a tiny sum."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
    )
    lo = np.datetime64(TPCH_Q6_DATE).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q6_DATE).astype("datetime64[us]") + np.timedelta64(365, "D").astype("timedelta64[us]")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        d100 = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (ship >= lo) & (ship < hi) & (d100 >= 5) & (d100 <= 7) \
            & (qty < 24)
        ep = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100
        ).astype(np.int64)
        return pa.table(
            {
                "rev": pa.array([int((ep * d100[keep]).sum())],
                                type=pa.int64()),
                "n": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow").sum(["rev", "n"])
    return pa.table(
        {
            "revenue_c2": pa.array([agg["sum(rev)"]], type=pa.int64()),
            "n_rows": pa.array([agg["sum(n)"]], type=pa.int64()),
        }
    )


QUERIES["tpch_q6"] = q_tpch_q6
ORACLE_SQL["tpch_q6"] = f"""
    WITH s AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS d100
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '{TPCH_Q6_DATE}'
                 AND l_shipdate < TIMESTAMP '{TPCH_Q6_DATE}'
                     + INTERVAL 365 DAY
                 AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
                 AND l_quantity < 24)
    SELECT CAST(COALESCE(SUM(ep * d100), 0) AS BIGINT) AS revenue_c2,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM s
"""


def _ntile_bucket(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 0-based dense ranks: first n%k buckets get one
    extra row (the q_curriculum replication, shared here)."""
    q, rem = divmod(n, k)
    big = (q + 1) * rem
    return np.where(
        rank < big,
        rank // (q + 1) + 1,
        rem + (rank - big) // max(q, 1) + 1 if q else rem,
    ).astype(np.int64)


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation (recency / frequency / monetary
    quintiles — the classic CRM scheme): per-customer order rollup via
    one sharded combine, then THREE rank-by-sort NTILE(5) passes
    (`ops/index.zip_with_index` over packed (metric, custkey) int64
    keys — no rank-table joins; quintile 1 = most recent / most orders
    / highest spend).  Packing bound: custkey < 2^20, metrics within
    their documented headroom — guarded loudly."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.index import zip_with_index

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def pre(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_custkey": batch["o_custkey"].to_numpy(
                    zero_copy_only=False),
                "last": batch["o_orderdate"].to_numpy(
                    zero_copy_only=False).astype("datetime64[us]")
                .astype(np.int64),
                "m": np.rint(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100
                ).astype(np.int64),
            }
        )
        g = df.groupby("c_custkey", sort=False).agg(
            n=("m", "size"), m_c=("m", "sum"), last=("last", "max")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("c_custkey", sort=False)
            .agg(n_orders=("n", "sum"), monetary_c=("m_c", "sum"),
                 last=("last", "max"))
            .reset_index()
        )

    cust = sharded_groupby_apply(
        orders.map_batches(pre, batch_format="pyarrow"), ["c_custkey"],
        combine, num_shards=64,
    ).materialize()

    mx = cust.max("last")
    gmax = int(mx["max(last)"]) if isinstance(mx, dict) else int(mx)
    n_cust = cust.count()

    def metrics(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        if ck.max(initial=0) >= 1 << 20:
            raise ValueError("rfm packing: custkey >= 2^20 — widen keys")
        last = batch["last"].to_numpy(zero_copy_only=False)
        r_days = (gmax - last) // 86_400_000_000
        n = batch["n_orders"].to_numpy(zero_copy_only=False)
        m = batch["monetary_c"].to_numpy(zero_copy_only=False)
        if r_days.max(initial=0) >= 1 << 30 or n.max(initial=0) >= 1 << 30 \
                or m.max(initial=0) >= 1 << 40:
            raise ValueError("rfm packing: metric exceeds headroom")
        return pa.table(
            {
                "c_custkey": pa.array(ck, type=pa.int64()),
                "r_days": pa.array(r_days, type=pa.int64()),
                "n_orders": pa.array(n, type=pa.int64()),
                "monetary_c": pa.array(m, type=pa.int64()),
                "kr": pa.array(r_days * (1 << 20) + ck, type=pa.int64()),
                "kf": pa.array(((1 << 30) - n) * (1 << 20) + ck,
                               type=pa.int64()),
                "km": pa.array(((1 << 40) - m) * (1 << 20) + ck,
                               type=pa.int64()),
            }
        )

    ds = cust.map_batches(metrics, batch_format="pyarrow")
    out_cols = ["c_custkey", "r_days", "n_orders", "monetary_c"]
    quints = {}
    for key, name in (("kr", "r_q"), ("kf", "f_q"), ("km", "m_q")):
        ds = zip_with_index(ds, sort_key=key, id_col="__rk")

        def bucketize(batch: pa.Table, _name=name) -> pa.Table:
            rk = batch["__rk"].to_numpy(zero_copy_only=False)
            return batch.drop_columns(["__rk"]).append_column(
                _name, pa.array(_ntile_bucket(rk, n_cust, 5),
                                type=pa.int64())
            )

        ds = ds.map_batches(bucketize, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in out_cols + ["r_q", "f_q", "m_q"]}
        code = (
            batch["r_q"].to_numpy(zero_copy_only=False) * 100
            + batch["f_q"].to_numpy(zero_copy_only=False) * 10
            + batch["m_q"].to_numpy(zero_copy_only=False)
        )
        cols["rfm_code"] = pa.array(code, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(finish, batch_format="pyarrow")


QUERIES["rfm_segments"] = q_rfm_segments
ORACLE_SQL["rfm_segments"] = """
    WITH m AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
                      SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS monetary_c,
                      MAX(o_orderdate) AS last
               FROM orders GROUP BY 1),
    g AS (SELECT MAX(o_orderdate) AS gmax FROM orders),
    c AS (SELECT c_custkey,
                 CAST((epoch_us(g.gmax) - epoch_us(last))
                      // 86400000000 AS BIGINT) AS r_days,
                 CAST(n_orders AS BIGINT) AS n_orders,
                 CAST(monetary_c AS BIGINT) AS monetary_c
          FROM m, g),
    q AS (SELECT c_custkey, r_days, n_orders, monetary_c,
                 NTILE(5) OVER (ORDER BY r_days, c_custkey) AS r_q,
                 NTILE(5) OVER (ORDER BY n_orders DESC, c_custkey) AS f_q,
                 NTILE(5) OVER (ORDER BY monetary_c DESC, c_custkey) AS m_q
          FROM c)
    SELECT c_custkey, r_days, n_orders, monetary_c,
           CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(100 * r_q + 10 * f_q + m_q AS BIGINT) AS rfm_code
    FROM q
"""


TPCH_Q5_REGION = "ASIA"
TPCH_Q5_DATE_LO = "1995-01-01"
TPCH_Q5_DATE_HI = "2002-01-01"
# Above this many qualifying (orderkey -> cust nation) pairs the broadcast
# map is replaced by partitioned hash joins (ops/join.bucketed_hash_join).
TPCH_Q5_BROADCAST_MAX = 2_000_000


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 local-supplier volume (public benchmark semantics): revenue
    by supplier nation for orders whose customer is in TPCH_Q5_REGION and
    shares the supplier's nation, over [DATE_LO, DATE_HI).  The date window
    spans the full synthetic range (the c_nationkey = s_nationkey constraint
    is already highly selective on random keys).

    Plan, scale notes: region/nation are driver-tiny dims; supplier
    (suppkey -> nationkey) is a broadcast dim (TPC-H keeps supplier 1/15th
    of customer).  Customers in the region stream through a column-pruned
    filter, then orders stream once to build the (o_orderkey ->
    c_nationkey) map, which is bounded by region x date selectivity and
    broadcast via ray.put.  If that map exceeds TPCH_Q5_BROADCAST_MAX the
    plan switches to two partitioned hash joins (bucketed_hash_join on
    c_custkey then l_orderkey) — same cells, shuffle instead of broadcast.
    lineitem streams exactly once either way; revenue partials are exact
    int64 cents x (100 - d100) with a <= 25-cell final reduce."""
    import pyarrow.compute as pc

    from ...ops.join import bucketed_hash_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], TPCH_Q5_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    region_nations = np.sort(nat_in["n_nationkey"].to_numpy())
    nat_names = dict(
        zip(nat_in["n_nationkey"].to_pylist(), nat_in["n_name"].to_pylist())
    )

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sup_keys = sup["s_suppkey"].to_numpy()
    sup_order = np.argsort(sup_keys, kind="stable")
    sup_keys = sup_keys[sup_order]
    sup_nats = sup["s_nationkey"].to_numpy()[sup_order]
    sup_ref = ray.put((sup_keys, sup_nats))

    lo = np.datetime64(TPCH_Q5_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q5_DATE_HI).astype("datetime64[us]")

    def cust_filter(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(region_nations, nk)
        pos[pos >= len(region_nations)] = 0
        keep = region_nations[pos] == nk
        return batch.filter(pa.array(keep))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_filter, batch_format="pyarrow")

    def orders_filter(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((od >= lo) & (od < hi))).select(
            ["o_orderkey", "o_custkey"]
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_filter, batch_format="pyarrow")

    _EMPTY_CELLS = pa.table(
        {"nat": pa.array([], type=pa.int64()),
         "revenue_c2": pa.array([], type=pa.int64())}
    )

    def _revenue_cells(batch: pa.Table, c_nat: np.ndarray,
                       hit: np.ndarray) -> pa.Table:
        """Shared tail of both plans: attach supplier nation from the
        broadcast dim, keep matching-nation rows, fold exact int64 revenue
        into per-nation cells (<= 25 rows out per batch)."""
        sk, sn = ray.get(sup_ref)
        spos = np.searchsorted(sk, batch["l_suppkey"].to_numpy(zero_copy_only=False))
        spos[spos >= len(sk)] = 0
        s_nat = sn[spos]
        keep = hit & (s_nat == c_nat)
        if not keep.any():
            return _EMPTY_CELLS
        ep = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        d100 = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        rev = ep * (100 - d100)
        nats = s_nat[keep].astype(np.int64)
        uniq, inv = np.unique(nats, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {"nat": pa.array(uniq, type=pa.int64()),
             "revenue_c2": pa.array(sums, type=pa.int64())}
        )

    def li_partial_factory(lookup_ref):
        def li_partial(batch: pa.Table) -> pa.Table:
            ok_keys, ok_nats = ray.get(lookup_ref)
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(ok_keys) == 0:
                return _EMPTY_CELLS
            pos = np.searchsorted(ok_keys, lok)
            pos[pos >= len(ok_keys)] = 0
            hit = ok_keys[pos] == lok
            if not hit.any():
                return _EMPTY_CELLS
            return _revenue_cells(batch, ok_nats[pos], hit)

        return li_partial

    # (o_orderkey -> c_nationkey): broadcast map under the gate, else a
    # partitioned hash join producing the same two columns.  One pass over
    # customer either way: materialize the (2-col, region-filtered) stream,
    # then count() reads block metadata.
    cust = cust.materialize()
    cust_tbl = pa.concat_tables(
        [b for b in cust.iter_batches(batch_format="pyarrow")]
        or [pa.table({"c_custkey": pa.array([], pa.int64()),
                      "c_nationkey": pa.array([], pa.int64())})]
    ) if cust.count() <= TPCH_Q5_BROADCAST_MAX else None
    if cust_tbl is not None:
        ck = cust_tbl["c_custkey"].to_numpy()
        corder = np.argsort(ck, kind="stable")
        ck, cn = ck[corder], cust_tbl["c_nationkey"].to_numpy()[corder]

        def orders_attach(batch: pa.Table) -> pa.Table:
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ck, oc)
            pos[pos >= len(ck)] = 0
            keep = (ck[pos] == oc) if len(ck) else np.zeros(len(oc), bool)
            return pa.table(
                {"o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                 "c_nationkey": pa.array(cn[pos][keep], type=pa.int64())}
            )

        om = pa.concat_tables(
            [b for b in orders.map_batches(orders_attach, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
            or [pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "c_nationkey": pa.array([], pa.int64())})]
        )
        ok = om["o_orderkey"].to_numpy()
        oorder = np.argsort(ok, kind="stable")
        lookup_ref = ray.put((ok[oorder], om["c_nationkey"].to_numpy()[oorder]))
        joined_li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_partial_factory(lookup_ref), batch_format="pyarrow")
    else:
        oc = orders.map_batches(
            lambda b: b.rename_columns(["o_orderkey", "c_custkey"]),
            batch_format="pyarrow",
        )
        om_ds = bucketed_hash_join(
            oc, cust.map_batches(
                lambda b: b.rename_columns(["c_custkey", "c_nationkey"]),
                batch_format="pyarrow"),
            on="c_custkey",
        ).map_batches(
            lambda b: b.select(["o_orderkey", "c_nationkey"]), batch_format="pyarrow"
        )
        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            lambda b: b.rename_columns(
                ["o_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
            batch_format="pyarrow",
        )
        big = bucketed_hash_join(li, om_ds, on="o_orderkey")

        def big_partial(batch: pa.Table) -> pa.Table:
            # the join already attached c_nationkey to every lineitem row
            if batch.num_rows == 0:
                return _EMPTY_CELLS
            c_nat = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            return _revenue_cells(batch, c_nat, np.ones(len(c_nat), bool))

        joined_li = big.map_batches(big_partial, batch_format="pyarrow")

    cells = (
        joined_li.groupby("nat").sum("revenue_c2").to_pandas()
        .rename(columns={"sum(revenue_c2)": "revenue_c2"})
    )
    cells["n_name"] = cells["nat"].map(nat_names)
    cells = cells.sort_values(
        ["revenue_c2", "n_name"], ascending=[False, True]
    )
    return pa.table(
        {"n_name": pa.array(cells["n_name"], type=pa.string()),
         "revenue_c2": pa.array(cells["revenue_c2"], type=pa.int64())}
    )


QUERIES["tpch_q5"] = q_tpch_q5
ORACLE_SQL["tpch_q5"] = f"""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c2
    FROM lineitem, orders, customer, supplier, nation, region
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = '{TPCH_Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{TPCH_Q5_DATE_LO}'
      AND o_orderdate < TIMESTAMP '{TPCH_Q5_DATE_HI}'
    GROUP BY n_name
"""


TPCH_Q18_MIN_QTY = 250


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 large-volume customers (public benchmark semantics):
    orders whose total line quantity exceeds TPCH_Q18_MIN_QTY, enriched
    with customer names, top-100 by order value.

    Plan, scale notes: the HAVING set is ~the top percentile of orders —
    per-batch int64 quantity partials, ONE groupby(l_orderkey) exchange,
    filter, and the survivors broadcast via ray.put.  orders then stream
    once through the set filter into ops/topk.global_topk (per-block
    top-100 + one O(100 x blocks) reduce — no global sort), and customer
    streams once against the <= 100 surviving custkeys.  Driver state is
    the having set + 100 rows, never a corpus-scale table."""
    from ...ops.topk import global_topk

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table(
            {"l_orderkey": pa.array(uniq, type=pa.int64()),
             "sum_qty": pa.array(sums, type=pa.int64())}
        )

    # orderkeys are scattered across the fact table (the per-batch partial
    # barely reduces), so the exchange must not be a per-distinct-key
    # groupby: shard on hash(orderkey), sum + apply the HAVING filter
    # INSIDE the shard, and only the ~top-percentile survivors leave it.
    from ...ops.agg import sharded_groupby_apply

    def shard_having(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False)["sum_qty"].sum()
        g = g[g > TPCH_Q18_MIN_QTY]
        return pd.DataFrame(
            {"l_orderkey": g.index.to_numpy(np.int64),
             "sum_qty": g.to_numpy(np.int64)}
        )

    having = sharded_groupby_apply(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_orderkey"], shard_having, num_shards=64,
    )
    hk, hq = [], []
    for b in having.iter_batches(batch_format="pyarrow"):
        hk.append(b["l_orderkey"].to_numpy())
        hq.append(b["sum_qty"].to_numpy())
    hk = np.concatenate(hk) if hk else np.array([], np.int64)
    hq = np.concatenate(hq) if hq else np.array([], np.int64)
    order = np.argsort(hk, kind="stable")
    having_ref = ray.put((hk[order], hq[order]))

    def orders_attach(batch: pa.Table) -> pa.Table:
        keys, qtys = ray.get(having_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            keep = np.zeros(len(ok), bool)
            sq = np.array([], np.int64)
        else:
            pos = np.searchsorted(keys, ok)
            pos[pos >= len(keys)] = 0
            keep = keys[pos] == ok
            sq = qtys[pos][keep]
        tp = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)[keep] * 100
        ).astype(np.int64)
        return pa.table(
            {"o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
             "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
             "o_orderdate": batch["o_orderdate"].filter(pa.array(keep)),
             "totalprice_c": pa.array(tp, type=pa.int64()),
             "sum_qty": pa.array(sq, type=pa.int64())}
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(orders_attach, batch_format="pyarrow")
    top = pa.concat_tables(
        [b for b in global_topk(
            orders, "totalprice_c", 100,
            descending=True, tiebreak=["o_orderdate", "o_orderkey"],
        ).iter_batches(batch_format="pyarrow")]
    )

    ckeys = np.sort(np.unique(top["o_custkey"].to_numpy()))
    names = {}
    if len(ckeys):
        def cust_pick(batch: pa.Table) -> pa.Table:
            ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ckeys, ck)
            pos[pos >= len(ckeys)] = 0
            keep = ckeys[pos] == ck
            return batch.filter(pa.array(keep))

        picked = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        ).map_batches(cust_pick, batch_format="pyarrow")
        for b in picked.iter_batches(batch_format="pyarrow"):
            names.update(zip(b["c_custkey"].to_pylist(), b["c_name"].to_pylist()))

    df = top.to_pandas().sort_values(
        ["totalprice_c", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True], kind="stable",
    )
    return pa.table(
        {"c_name": pa.array(
             [names.get(k) for k in df["o_custkey"]], type=pa.string()),
         "c_custkey": pa.array(df["o_custkey"].to_numpy(), type=pa.int64()),
         "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), type=pa.int64()),
         "o_orderdate": pa.array(
             df["o_orderdate"].to_numpy(), type=pa.timestamp("us")),
         "totalprice_c": pa.array(df["totalprice_c"].to_numpy(), type=pa.int64()),
         "sum_qty": pa.array(df["sum_qty"].to_numpy(), type=pa.int64())}
    )


QUERIES["tpch_q18"] = q_tpch_q18
ORACLE_SQL["tpch_q18"] = f"""
    WITH h AS (SELECT l_orderkey,
                      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                          AS sum_qty
               FROM lineitem GROUP BY 1
               HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT))
                      > {TPCH_Q18_MIN_QTY})
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_c,
           sum_qty
    FROM h
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice_c DESC, o_orderdate, o_orderkey
    LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 promo-revenue analogue (public benchmark semantics; the synthetic
# part table has p_type in {PROMO, ECONOMY, ...} instead of "PROMO%" types)
# ---------------------------------------------------------------------------

TPCH_Q14_DATE_LO = "1997-09-01"
TPCH_Q14_DATE_HI = "1997-10-01"
TPCH_PART_BROADCAST_MAX = 2_000_000


def _part_attrs(sf_dir: str, columns):
    """(sorted p_partkey, attr arrays in `columns` order, num_rows) for the
    broadcast side of a lineitem->part attach; caller gates on num_rows."""
    tbl = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", *columns])
    keys = tbl["p_partkey"].to_numpy()
    order = np.argsort(keys, kind="stable")
    return keys[order], [tbl[c].to_numpy(zero_copy_only=False)[order] for c in columns]


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 promo revenue: over one shipdate month, exact int64
    revenue cells for PROMO-typed vs all parts.

    Plan, scale notes: lineitem streams once behind a column-pruned,
    date-filtered scan; part is attached per batch from a broadcast
    (sorted p_partkey -> is_promo) pair when the part table is under
    TPCH_PART_BROADCAST_MAX rows (parquet metadata count — no data read),
    else via a partitioned bucketed hash join.  Either way the per-batch
    output is ONE 3-cell partial row (promo/total revenue in exact cents
    x (100-d100), row count) and the final reduce is a tiny sum — no
    groupby keys that scale with data."""
    from ...ops.join import bucketed_hash_join

    lo = np.datetime64(TPCH_Q14_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q14_DATE_HI).astype("datetime64[us]")

    def li_filter(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ship >= lo) & (ship < hi))).select(
            ["l_partkey", "l_extendedprice", "l_discount"]
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_filter, batch_format="pyarrow")

    def cells(ep: np.ndarray, d100: np.ndarray, promo: np.ndarray) -> pa.Table:
        rev = ep * (100 - d100)
        return pa.table(
            {
                "promo_rev_c2": pa.array([int(rev[promo].sum())], type=pa.int64()),
                "total_rev_c2": pa.array([int(rev.sum())], type=pa.int64()),
                "n_rows": pa.array([len(rev)], type=pa.int64()),
            }
        )

    n_part = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    if n_part <= TPCH_PART_BROADCAST_MAX:
        keys, (ptype,) = _part_attrs(sf_dir, ["p_type"])
        part_ref = ray.put((keys, ptype == "PROMO"))

        def partial(batch: pa.Table) -> pa.Table:
            pk, promo_flag = ray.get(part_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pk, lpk)
            pos[pos >= len(pk)] = 0
            hit = pk[pos] == lpk  # inner-join semantics: drop dangling keys
            ep = np.rint(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit] * 100
            ).astype(np.int64)
            d100 = np.rint(
                batch["l_discount"].to_numpy(zero_copy_only=False)[hit] * 100
            ).astype(np.int64)
            return cells(ep, d100, promo_flag[pos[hit]])

        joined = li.map_batches(partial, batch_format="pyarrow")
    else:
        part = ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ).map_batches(
            lambda b: b.rename_columns(["l_partkey", "p_type"]),
            batch_format="pyarrow",
        )

        def partial_joined(batch: pa.Table) -> pa.Table:
            ep = np.rint(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            d100 = np.rint(
                batch["l_discount"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            promo = (
                batch["p_type"].to_numpy(zero_copy_only=False) == "PROMO"
            )
            return cells(ep, d100, promo)

        joined = bucketed_hash_join(li, part, on="l_partkey").map_batches(
            partial_joined, batch_format="pyarrow"
        )

    agg = joined.sum(["promo_rev_c2", "total_rev_c2", "n_rows"])
    return pa.table(
        {
            "promo_rev_c2": pa.array([agg["sum(promo_rev_c2)"]], type=pa.int64()),
            "total_rev_c2": pa.array([agg["sum(total_rev_c2)"]], type=pa.int64()),
            "n_rows": pa.array([agg["sum(n_rows)"]], type=pa.int64()),
        }
    )


QUERIES["tpch_q14"] = q_tpch_q14
ORACLE_SQL["tpch_q14"] = f"""
    SELECT
      CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                 ELSE 0 END), 0) AS BIGINT) AS promo_rev_c2,
      CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))), 0)
           AS BIGINT) AS total_rev_c2,
      COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '{TPCH_Q14_DATE_LO}'
      AND l_shipdate <  TIMESTAMP '{TPCH_Q14_DATE_HI}'
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 discounted-revenue analogue: disjunctive (brand, size, quantity)
# clauses — the "OR-of-ANDs" predicate shape that defeats naive pushdown
# ---------------------------------------------------------------------------

TPCH_Q19_CLAUSES = (
    # (p_brand, size_lo, size_hi, qty_lo, qty_hi) — all bounds inclusive
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 discounted revenue (public benchmark semantics, adapted
    to the synthetic columns: brand + size ranges x quantity ranges, OR of
    three conjunctive clauses).

    Plan, scale notes: only parts matching SOME clause's (brand, size)
    can contribute, so the broadcast side is the clause-filtered part
    subset — (sorted p_partkey, clause bitmask) — gated on the FILTERED
    row count with a bucketed-join fallback.  lineitem streams once; per
    batch the clause mask resolves vectorized (bitmask AND quantity
    window) and the output is one exact int64 revenue cell."""
    from ...ops.join import bucketed_hash_join

    import pyarrow.compute as pc

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    brand = part["p_brand"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy(zero_copy_only=False)
    mask = np.zeros(len(brand), dtype=np.uint8)
    for i, (b, slo, shi, _, _) in enumerate(TPCH_Q19_CLAUSES):
        mask |= ((brand == b) & (size >= slo) & (size <= shi)).astype(np.uint8) << i
    keep = mask != 0
    pkeys = part["p_partkey"].to_numpy()[keep]
    pmask = mask[keep]
    order = np.argsort(pkeys, kind="stable")
    pkeys, pmask = pkeys[order], pmask[order]
    qty_lo = np.array([c[3] for c in TPCH_Q19_CLAUSES], dtype=np.float64)
    qty_hi = np.array([c[4] for c in TPCH_Q19_CLAUSES], dtype=np.float64)

    def cells(batch: pa.Table, m: np.ndarray, hit: np.ndarray) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ok = np.zeros(len(qty), dtype=bool)
        for i in range(len(TPCH_Q19_CLAUSES)):
            ok |= (
                ((m >> i) & 1).astype(bool)
                & (qty >= qty_lo[i])
                & (qty <= qty_hi[i])
            )
        ok &= hit
        ep = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[ok] * 100
        ).astype(np.int64)
        d100 = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[ok] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "revenue_c2": pa.array([int((ep * (100 - d100)).sum())],
                                       type=pa.int64()),
                "n_rows": pa.array([int(ok.sum())], type=pa.int64()),
            }
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
    if len(pkeys) <= TPCH_PART_BROADCAST_MAX:
        part_ref = ray.put((pkeys, pmask))

        def partial(batch: pa.Table) -> pa.Table:
            pk, pm = ray.get(part_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            if len(pk) == 0:
                return cells(batch, np.zeros(len(lpk), np.uint8),
                             np.zeros(len(lpk), bool))
            pos = np.searchsorted(pk, lpk)
            pos[pos >= len(pk)] = 0
            hit = pk[pos] == lpk
            return cells(batch, pm[pos], hit)

        scored = li.map_batches(partial, batch_format="pyarrow")
    else:
        psub = ray.data.from_arrow(
            pa.table({"l_partkey": pa.array(pkeys, type=pa.int64()),
                      "clause_mask": pa.array(pmask, type=pa.uint8())})
        )

        def partial_joined(batch: pa.Table) -> pa.Table:
            m = batch["clause_mask"].to_numpy(zero_copy_only=False)
            return cells(batch, m, np.ones(len(m), bool))

        scored = bucketed_hash_join(li, psub, on="l_partkey").map_batches(
            partial_joined, batch_format="pyarrow"
        )

    agg = scored.sum(["revenue_c2", "n_rows"])
    return pa.table(
        {
            "revenue_c2": pa.array([agg["sum(revenue_c2)"]], type=pa.int64()),
            "n_rows": pa.array([agg["sum(n_rows)"]], type=pa.int64()),
        }
    )


QUERIES["tpch_q19"] = q_tpch_q19
_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in TPCH_Q19_CLAUSES
)
ORACLE_SQL["tpch_q19"] = f"""
    SELECT
      CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))), 0)
           AS BIGINT) AS revenue_c2,
      COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_PRED}
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 returned-item reporting analogue: top-20 customers by revenue
# from returned lineitems over a half-year order window
# ---------------------------------------------------------------------------

TPCH_Q10_DATE_LO = "1996-01-01"
TPCH_Q10_DATE_HI = "1996-07-01"
TPCH_Q10_BROADCAST_MAX = 2_000_000
TPCH_Q10_K = 20


def _orders_window(sf_dir: str, lo: str, hi: str, columns):
    """Materialized date-filtered orders stream with just `columns` —
    the small side of the order-window joins; count() then reads block
    metadata so the broadcast gate costs no second scan."""
    lo64 = np.datetime64(lo).astype("datetime64[us]")
    hi64 = np.datetime64(hi).astype("datetime64[us]")

    def f(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((od >= lo64) & (od < hi64))).select(columns)

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=sorted({*columns, "o_orderdate"}),
        )
        .map_batches(f, batch_format="pyarrow")
        .materialize()
    )


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 returned-item reporting (public benchmark semantics):
    top-20 customers by exact revenue from l_returnflag='R' lineitems of
    orders in [DATE_LO, DATE_HI), with name/acctbal/nation attached.

    Plan, scale notes: the window-filtered orders map (o_orderkey ->
    o_custkey) is bounded by date selectivity — broadcast via ray.put
    under TPCH_Q10_BROADCAST_MAX, else a partitioned bucketed hash join.
    R-flagged lineitems stream once and fold to per-batch per-custkey
    int64 revenue cells; one hash(custkey) sharded combine then a
    k-per-block partial top-k (no global sort).  Customer attributes
    attach by streaming customer against the broadcast 20-key set;
    nation is a driver-tiny dim."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import bucketed_hash_join
    from ...ops.topk import global_topk

    orders = _orders_window(
        sf_dir, TPCH_Q10_DATE_LO, TPCH_Q10_DATE_HI, ["o_orderkey", "o_custkey"]
    )

    def li_filter(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch["l_returnflag"], "R")
        return batch.filter(keep).select(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(li_filter, batch_format="pyarrow")

    _EMPTY = pa.table(
        {"c_custkey": pa.array([], type=pa.int64()),
         "revenue_c2": pa.array([], type=pa.int64())}
    )

    def rev_cells(cust: np.ndarray, ep: np.ndarray, d100: np.ndarray) -> pa.Table:
        if len(cust) == 0:
            return _EMPTY
        rev = ep * (100 - d100)
        uniq, inv = np.unique(cust, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {"c_custkey": pa.array(uniq, type=pa.int64()),
             "revenue_c2": pa.array(sums, type=pa.int64())}
        )

    if orders.count() <= TPCH_Q10_BROADCAST_MAX:
        otbl = pa.concat_tables(orders.iter_batches(batch_format="pyarrow"))
        okeys = otbl["o_orderkey"].to_numpy()
        order = np.argsort(okeys, kind="stable")
        omap_ref = ray.put((okeys[order], otbl["o_custkey"].to_numpy()[order]))

        def partial(batch: pa.Table) -> pa.Table:
            ok, oc = ray.get(omap_ref)
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(ok) == 0:
                return _EMPTY
            pos = np.searchsorted(ok, lok)
            pos[pos >= len(ok)] = 0
            hit = ok[pos] == lok
            ep = np.rint(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit] * 100
            ).astype(np.int64)
            d100 = np.rint(
                batch["l_discount"].to_numpy(zero_copy_only=False)[hit] * 100
            ).astype(np.int64)
            return rev_cells(oc[pos[hit]].astype(np.int64), ep, d100)

        cells = li.map_batches(partial, batch_format="pyarrow")
    else:
        li_k = li.map_batches(
            lambda b: b.rename_columns(
                ["o_orderkey", "l_extendedprice", "l_discount"]
            ),
            batch_format="pyarrow",
        )

        def partial_joined(batch: pa.Table) -> pa.Table:
            ep = np.rint(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            d100 = np.rint(
                batch["l_discount"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            cust = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return rev_cells(cust, ep, d100)

        cells = bucketed_hash_join(li_k, orders, on="o_orderkey").map_batches(
            partial_joined, batch_format="pyarrow"
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("c_custkey", as_index=False, sort=False)["revenue_c2"].sum()
        )

    per_cust = sharded_groupby_apply(cells, ["c_custkey"], combine)
    top = global_topk(
        per_cust, "revenue_c2", TPCH_Q10_K, tiebreak=["c_custkey"]
    ).to_pandas()

    key_set = set(top["c_custkey"].tolist())
    attrs = {}
    if key_set:
        def pick(batch: pa.Table) -> pa.Table:
            ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array([int(k) in key_set for k in ck]))

        picked = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        ).map_batches(pick, batch_format="pyarrow")
        for b in picked.iter_batches(batch_format="pyarrow"):
            for k, nm, ab, nk in zip(
                b["c_custkey"].to_pylist(), b["c_name"].to_pylist(),
                b["c_acctbal"].to_pylist(), b["c_nationkey"].to_pylist(),
            ):
                attrs[k] = (nm, int(round(ab * 100)), nk)

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    rows = top.sort_values(
        ["revenue_c2", "c_custkey"], ascending=[False, True], kind="stable"
    )
    ck = rows["c_custkey"].tolist()
    return pa.table(
        {
            "c_custkey": pa.array(ck, type=pa.int64()),
            "c_name": pa.array([attrs[k][0] for k in ck], type=pa.string()),
            "acctbal_c": pa.array([attrs[k][1] for k in ck], type=pa.int64()),
            "n_name": pa.array(
                [nat_name[attrs[k][2]] for k in ck], type=pa.string()
            ),
            "revenue_c2": pa.array(rows["revenue_c2"].to_numpy(), type=pa.int64()),
        }
    )


QUERIES["tpch_q10"] = q_tpch_q10
ORACLE_SQL["tpch_q10"] = f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c,
           n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c2
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '{TPCH_Q10_DATE_LO}'
      AND o_orderdate <  TIMESTAMP '{TPCH_Q10_DATE_HI}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, acctbal_c, n_name
    ORDER BY revenue_c2 DESC, c_custkey
    LIMIT {TPCH_Q10_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 order-priority analogue: per-priority counts of window orders
# with at least one lineitem shipped > 60 days after the order date
# ---------------------------------------------------------------------------

TPCH_Q4_DATE_LO = "1996-01-01"
TPCH_Q4_DATE_HI = "1996-07-01"
TPCH_Q4_LATE_DAYS = 60
TPCH_Q4_BROADCAST_MAX = 2_000_000


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 order-priority checking (public benchmark semantics; the
    synthetic lineitem has no commit/receipt dates, so "late" is a
    shipment > TPCH_Q4_LATE_DAYS after o_orderdate — the same EXISTS
    shape).

    Plan, scale notes: the window-filtered orders map (orderkey ->
    orderdate + priority id) broadcasts under a gate, else a bucketed
    hash join ships it; lineitem streams once, resolving lateness
    vectorized and emitting per-batch UNIQUE late (orderkey, priority)
    pairs.  The EXISTS dedup is one hash(orderkey) sharded combine whose
    shards emit <= 5 priority cells each; the final groupby is over the
    5-value priority domain."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import bucketed_hash_join

    orders = _orders_window(
        sf_dir, TPCH_Q4_DATE_LO, TPCH_Q4_DATE_HI,
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    late_us = np.timedelta64(TPCH_Q4_LATE_DAYS, "D").astype("timedelta64[us]")

    _EMPTY = pa.table(
        {"o_orderkey": pa.array([], type=pa.int64()),
         "o_orderpriority": pa.array([], type=pa.string())}
    )

    def late_pairs(okey: np.ndarray, odate: np.ndarray, prio: np.ndarray,
                   ship: np.ndarray) -> pa.Table:
        late = ship > odate + late_us
        if not late.any():
            return _EMPTY
        okey, prio = okey[late], prio[late]
        uniq, idx = np.unique(okey, return_index=True)
        return pa.table(
            {"o_orderkey": pa.array(uniq, type=pa.int64()),
             "o_orderpriority": pa.array(prio[idx], type=pa.string())}
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    if orders.count() <= TPCH_Q4_BROADCAST_MAX:
        otbl = pa.concat_tables(orders.iter_batches(batch_format="pyarrow"))
        okeys = otbl["o_orderkey"].to_numpy()
        order = np.argsort(okeys, kind="stable")
        omap_ref = ray.put(
            (okeys[order],
             otbl["o_orderdate"].to_numpy()[order],
             np.asarray(otbl["o_orderpriority"].to_pylist(), dtype=object)[order])
        )

        def partial(batch: pa.Table) -> pa.Table:
            ok, od, op = ray.get(omap_ref)
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(ok) == 0:
                return _EMPTY
            pos = np.searchsorted(ok, lok)
            pos[pos >= len(ok)] = 0
            hit = ok[pos] == lok
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)[hit]
            p = pos[hit]
            return late_pairs(lok[hit], od[p], op[p], ship)

        pairs = li.map_batches(partial, batch_format="pyarrow")
    else:
        li_k = li.map_batches(
            lambda b: b.rename_columns(["o_orderkey", "l_shipdate"]),
            batch_format="pyarrow",
        )

        def partial_joined(batch: pa.Table) -> pa.Table:
            return late_pairs(
                batch["o_orderkey"].to_numpy(zero_copy_only=False),
                batch["o_orderdate"].to_numpy(zero_copy_only=False),
                np.asarray(batch["o_orderpriority"].to_pylist(), dtype=object),
                batch["l_shipdate"].to_numpy(zero_copy_only=False),
            )

        pairs = bucketed_hash_join(li_k, orders, on="o_orderkey").map_batches(
            partial_joined, batch_format="pyarrow"
        )

    def dedup_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates("o_orderkey")
        out = d.groupby("o_orderpriority", as_index=False, sort=False).size()
        return out.rename(columns={"size": "n_late"})

    shard_cells = sharded_groupby_apply(pairs, ["o_orderkey"], dedup_count)
    final = (
        shard_cells.groupby("o_orderpriority")
        .sum("n_late")
        .to_pandas()
        .rename(columns={"sum(n_late)": "n_late"})
        .sort_values("o_orderpriority")
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(final["o_orderpriority"], type=pa.string()),
            "n_late": pa.array(
                final["n_late"].to_numpy().astype(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q4"] = q_tpch_q4
ORACLE_SQL["tpch_q4"] = f"""
    SELECT o_orderpriority, COUNT(*) AS n_late
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{TPCH_Q4_DATE_LO}'
      AND o_orderdate <  TIMESTAMP '{TPCH_Q4_DATE_HI}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate
                        + INTERVAL {TPCH_Q4_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 small-quantity-order revenue analogue: a correlated aggregate
# (per-part average) answered in ONE exchange by co-locating each part's
# lineitems and resolving the comparison in-shard
# ---------------------------------------------------------------------------

TPCH_Q17_BRAND = "Brand#13"


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 small-quantity revenue (public benchmark semantics; no
    container column, so the filter is brand-only): total extendedprice
    and row count of lineitems whose quantity is strictly below 20% of
    the average quantity over all lineitems of the same part, for parts
    of TPCH_Q17_BRAND.

    Plan, scale notes: the brand-filtered part keyset (1/25 of part)
    broadcasts under the shared TPCH_PART_BROADCAST_MAX gate (bucketed
    semi-join fallback); the qualifying lineitem subset then makes ONE
    hash(partkey) exchange and the correlated comparison resolves
    inside the shard — 5*q100*n < sum_q100 in exact int64, no float
    average and no second corpus pass.  Shards emit 2-cell partials."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import bucketed_hash_join

    import pyarrow.compute as pc

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    bkeys = np.sort(
        part.filter(pc.equal(part["p_brand"], TPCH_Q17_BRAND))["p_partkey"]
        .to_numpy()
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    if len(bkeys) <= TPCH_PART_BROADCAST_MAX:
        keys_ref = ray.put(bkeys)

        def li_semi(batch: pa.Table) -> pa.Table:
            bk = ray.get(keys_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            if len(bk) == 0:
                return batch.slice(0, 0)
            pos = np.searchsorted(bk, lpk)
            pos[pos >= len(bk)] = 0
            return batch.filter(pa.array(bk[pos] == lpk))

        sub = li.map_batches(li_semi, batch_format="pyarrow")
    else:
        psub = ray.data.from_arrow(
            pa.table({"l_partkey": pa.array(bkeys, type=pa.int64()),
                      "__brand_hit": pa.array(
                          np.ones(len(bkeys), dtype=np.int8), type=pa.int8())})
        )
        sub = bucketed_hash_join(li, psub, on="l_partkey").map_batches(
            lambda b: b.drop_columns(["__brand_hit"]), batch_format="pyarrow"
        )

    def in_shard(df: pd.DataFrame) -> pd.DataFrame:
        q100 = np.rint(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        ep_c = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = df.assign(__q100=q100).groupby("l_partkey", sort=False)["__q100"]
        sum_q = g.transform("sum").to_numpy().astype(np.int64)
        n = g.transform("size").to_numpy().astype(np.int64)
        qual = 5 * q100 * n < sum_q
        return pd.DataFrame(
            {"revenue_c": [int(ep_c[qual].sum())], "n_qual": [int(qual.sum())]}
        )

    cells = sharded_groupby_apply(sub, ["l_partkey"], in_shard)
    agg = cells.sum(["revenue_c", "n_qual"])
    rev = 0 if agg is None else agg["sum(revenue_c)"]
    n_q = 0 if agg is None else agg["sum(n_qual)"]
    return pa.table(
        {"revenue_c": pa.array([rev], type=pa.int64()),
         "n_qual": pa.array([n_q], type=pa.int64())}
    )


QUERIES["tpch_q17"] = q_tpch_q17
ORACLE_SQL["tpch_q17"] = f"""
    WITH s AS (SELECT l_partkey,
                      CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                           AS BIGINT) AS sum_q100,
                      COUNT(*) AS n
               FROM lineitem
               JOIN part ON p_partkey = l_partkey
               WHERE p_brand = '{TPCH_Q17_BRAND}'
               GROUP BY l_partkey)
    SELECT
      CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)), 0)
           AS BIGINT) AS revenue_c,
      COUNT(*) AS n_qual
    FROM lineitem
    JOIN s ON s.l_partkey = lineitem.l_partkey
    WHERE 5 * CAST(ROUND(l_quantity * 100) AS BIGINT) * n < sum_q100
"""


# ---------------------------------------------------------------------------
# Correlated-subquery pattern: orders strictly above their customer's
# average order value, counted per order status
# ---------------------------------------------------------------------------


def q_orders_above_avg(sf_dir: str):
    """Orders whose totalprice strictly exceeds their own customer's mean
    order value, counted per o_orderstatus — the canonical correlated
    scalar subquery (WHERE x > (SELECT AVG(..) .. same key)).

    Plan, scale notes: ONE hash(custkey) exchange co-locates each
    customer's orders; the mean never becomes a float — the in-shard
    comparison is price_c * n > sum_c in exact int64 — and every shard
    emits at most |status domain| = 3 cells, so the final groupby is
    over a constant-size key set."""
    from ...ops.agg import sharded_groupby_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderstatus"],
    )

    def in_shard(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        d = df.assign(__price_c=price_c)
        g = d.groupby("o_custkey", sort=False)["__price_c"]
        sum_c = g.transform("sum").to_numpy().astype(np.int64)
        n = g.transform("size").to_numpy().astype(np.int64)
        above = price_c * n > sum_c
        out = (
            d.assign(__above=above.astype(np.int64))
            .groupby("o_orderstatus", as_index=False, sort=False)
            .agg(n_above=("__above", "sum"), n_orders=("__above", "size"))
        )
        return out

    cells = sharded_groupby_apply(orders, ["o_custkey"], in_shard)
    final = (
        cells.groupby("o_orderstatus")
        .sum(["n_above", "n_orders"])
        .to_pandas()
        .rename(columns={"sum(n_above)": "n_above",
                         "sum(n_orders)": "n_orders"})
        .sort_values("o_orderstatus")
    )
    return pa.table(
        {
            "o_orderstatus": pa.array(final["o_orderstatus"], type=pa.string()),
            "n_above": pa.array(
                final["n_above"].to_numpy().astype(np.int64), type=pa.int64()),
            "n_orders": pa.array(
                final["n_orders"].to_numpy().astype(np.int64), type=pa.int64()),
        }
    )


QUERIES["orders_above_avg"] = q_orders_above_avg
ORACLE_SQL["orders_above_avg"] = """
    WITH s AS (SELECT o_custkey,
                      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS sum_c,
                      COUNT(*) AS n
               FROM orders GROUP BY o_custkey)
    SELECT o_orderstatus,
           CAST(COALESCE(SUM(CASE WHEN
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) * n > sum_c
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_above,
           COUNT(*) AS n_orders
    FROM orders JOIN s USING (o_custkey)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan-row / orphan-key counts for every
# foreign-key relationship — the data-quality gate a warehouse load runs
# ---------------------------------------------------------------------------

FK_RELATIONSHIPS = (
    # (name, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
)


def q_fk_audit(sf_dir: str):
    """Foreign-key integrity audit: per relationship, child row/key totals
    and orphan row/key counts (child keys absent from the parent).

    Plan, scale notes: neither side is assumed small.  Every table is
    scanned exactly ONCE, emitting key-level cells for every relationship
    it participates in (lineitem's one scan yields child cells for both
    its FKs; orders yields its child cells AND its parent keys), tagged
    with a relationship id.  ONE hash(rel, key) sharded exchange
    co-locates each key's cells and every shard emits <= |relationships|
    4-cell partials, so the exchange carries key cells, never child
    rows, and the final groupby runs over the 3-value relationship
    domain.  No broadcast of a potentially corpus-sized parent key set
    anywhere."""
    from ...ops.agg import sharded_groupby_apply

    rel_ids = {rel: i for i, (rel, *_rest) in enumerate(FK_RELATIONSHIPS)}
    # per table: [(rel_id, column, is_child)]
    roles: dict = {}
    for rel, child, ckey, parent, pkey in FK_RELATIONSHIPS:
        roles.setdefault(child, []).append((rel_ids[rel], ckey, True))
        roles.setdefault(parent, []).append((rel_ids[rel], pkey, False))

    def cell_emitter(table_roles):
        def cells(batch: pa.Table) -> pa.Table:
            rels, keys, ns, sides = [], [], [], []
            for rid, col, is_child in table_roles:
                k = batch[col].to_numpy(zero_copy_only=False)
                uniq, counts = np.unique(k, return_counts=True)
                rels.append(np.full(len(uniq), rid, dtype=np.int8))
                keys.append(uniq)
                ns.append(counts.astype(np.int64) if is_child
                          else np.zeros(len(uniq), dtype=np.int64))
                sides.append(np.full(len(uniq), 0 if is_child else 1,
                                     dtype=np.int8))
            return pa.table(
                {"rel": pa.array(np.concatenate(rels), type=pa.int8()),
                 "k": pa.array(np.concatenate(keys), type=pa.int64()),
                 "n": pa.array(np.concatenate(ns), type=pa.int64()),
                 "side": pa.array(np.concatenate(sides), type=pa.int8())}
            )

        return cells

    # four reads union into one exchange, so cap each scan's block count
    # by bytes (32 MiB/block): Ray's default parallelism-driven split would
    # put 64 near-empty blocks per table on the wire at test scale (256
    # tiny Sort inputs = pure driver overhead), while at 100 TB the same
    # rule still yields thousands of read blocks per table.
    import os as _os

    streams = []
    for table, table_roles in roles.items():
        path = f"{sf_dir}/{table}.parquet"
        nb = int(max(1, min(512, _os.path.getsize(path) // (32 << 20))))
        ds = ray.data.read_parquet(
            path,
            columns=sorted({c for _, c, _ in table_roles}),
            override_num_blocks=nb,
        )
        streams.append(
            ds.map_batches(cell_emitter(table_roles), batch_format="pyarrow")
        )
    cells = streams[0]
    for s in streams[1:]:
        cells = cells.union(s)

    def in_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["rel", "k"], sort=False).agg(
            child_n=("n", "sum"), has_parent=("side", "max")
        ).reset_index()
        g = g[g["child_n"] > 0]
        orphan = (g["has_parent"] == 0).to_numpy()
        n = g["child_n"].to_numpy()
        out = pd.DataFrame({"rel": g["rel"], "child_n": n,
                            "orphan_rows": np.where(orphan, n, 0),
                            "orphan_keys": orphan.astype(np.int64),
                            "one": np.ones(len(g), dtype=np.int64)})
        return out.groupby("rel", as_index=False, sort=False).agg(
            n_child_rows=("child_n", "sum"), n_child_keys=("one", "sum"),
            n_orphan_rows=("orphan_rows", "sum"),
            n_orphan_keys=("orphan_keys", "sum"),
        )

    parts = sharded_groupby_apply(cells, ["rel", "k"], in_shard)
    final = (
        parts.groupby("rel")
        .sum(["n_child_rows", "n_child_keys", "n_orphan_rows",
              "n_orphan_keys"])
        .to_pandas()
        .rename(columns={f"sum({c})": c for c in
                         ("n_child_rows", "n_child_keys",
                          "n_orphan_rows", "n_orphan_keys")})
        .sort_values("rel")
    )
    names = [rel for rel, *_ in FK_RELATIONSHIPS]
    return pa.table(
        {
            "relationship": pa.array(
                [names[int(r)] for r in final["rel"]], type=pa.string()),
            "n_child_rows": pa.array(
                final["n_child_rows"].to_numpy().astype(np.int64)),
            "n_child_keys": pa.array(
                final["n_child_keys"].to_numpy().astype(np.int64)),
            "n_orphan_rows": pa.array(
                final["n_orphan_rows"].to_numpy().astype(np.int64)),
            "n_orphan_keys": pa.array(
                final["n_orphan_keys"].to_numpy().astype(np.int64)),
        }
    )


QUERIES["fk_audit"] = q_fk_audit
ORACLE_SQL["fk_audit"] = " UNION ALL ".join(
    f"""
    (WITH ck AS (SELECT {ckey} AS k, COUNT(*) AS n FROM {child} GROUP BY 1),
          pk AS (SELECT DISTINCT {pkey} AS k FROM {parent})
     SELECT '{rel}' AS relationship,
            CAST(SUM(ck.n) AS BIGINT) AS n_child_rows,
            COUNT(*) AS n_child_keys,
            CAST(COALESCE(SUM(CASE WHEN pk.k IS NULL THEN ck.n END), 0)
                 AS BIGINT) AS n_orphan_rows,
            CAST(COALESCE(SUM(CASE WHEN pk.k IS NULL THEN 1 END), 0)
                 AS BIGINT) AS n_orphan_keys
     FROM ck LEFT JOIN pk USING (k))
    """
    for rel, child, ckey, parent, pkey in FK_RELATIONSHIPS
)


# ---------------------------------------------------------------------------
# Partitioning-key skew profiler: row/distinct/max-frequency per candidate
# shuffle key — the report you read BEFORE choosing a partitioning scheme
# ---------------------------------------------------------------------------

SKEW_COLUMNS = (
    # (label, table, column)
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("events.user_id", "events", "user_id"),
)


def q_skew_report(sf_dir: str):
    """Per candidate partitioning key: exact row count, distinct-key
    count, the hottest key's row count, and its share in basis points —
    the skew profile that decides salting / bucket counts before any
    shuffle is planned.

    Plan, scale notes: same shape as the FK audit — each table scans
    once per profiled column set with byte-sized blocks, batches fold to
    (col, key, n) pre-agg cells, ONE hash(col, key) exchange co-locates
    keys, shards emit per-column 3-cell partials (sum / count / max),
    and the final groupby runs over the 4-value column domain.  The
    hot-key max composes correctly across shards because a key lives in
    exactly one shard."""
    from ...ops.agg import sharded_groupby_apply

    import os as _os

    col_ids = {label: i for i, (label, _t, _c) in enumerate(SKEW_COLUMNS)}
    by_table: dict = {}
    for label, table, column in SKEW_COLUMNS:
        by_table.setdefault(table, []).append((col_ids[label], column))

    def emitter(specs):
        def cells(batch: pa.Table) -> pa.Table:
            cols, keys, ns = [], [], []
            for cid, column in specs:
                k = batch[column].to_numpy(zero_copy_only=False)
                uniq, counts = np.unique(k, return_counts=True)
                cols.append(np.full(len(uniq), cid, dtype=np.int8))
                keys.append(uniq.astype(np.int64))
                ns.append(counts.astype(np.int64))
            return pa.table(
                {"col": pa.array(np.concatenate(cols), type=pa.int8()),
                 "k": pa.array(np.concatenate(keys), type=pa.int64()),
                 "n": pa.array(np.concatenate(ns), type=pa.int64())}
            )

        return cells

    streams = []
    for table, specs in by_table.items():
        path = f"{sf_dir}/{table}.parquet"
        nb = int(max(1, min(512, _os.path.getsize(path) // (32 << 20))))
        ds = ray.data.read_parquet(
            path, columns=sorted({c for _, c in specs}),
            override_num_blocks=nb,
        )
        streams.append(ds.map_batches(emitter(specs), batch_format="pyarrow"))
    cells = streams[0]
    for s in streams[1:]:
        cells = cells.union(s)

    def in_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["col", "k"], sort=False)["n"].sum().reset_index()
        return g.groupby("col", as_index=False, sort=False).agg(
            n_rows=("n", "sum"), n_distinct=("n", "size"), max_key_rows=("n", "max")
        )

    parts = sharded_groupby_apply(cells, ["col", "k"], in_shard)
    final = (
        parts.groupby("col")
        .aggregate(*_skew_aggs())
        .to_pandas()
        .rename(columns={"sum(n_rows)": "n_rows",
                         "sum(n_distinct)": "n_distinct",
                         "max(max_key_rows)": "max_key_rows"})
        .sort_values("col")
    )
    labels = [label for label, _t, _c in SKEW_COLUMNS]
    n_rows = final["n_rows"].to_numpy().astype(np.int64)
    mx = final["max_key_rows"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "column": pa.array([labels[int(c)] for c in final["col"]],
                               type=pa.string()),
            "n_rows": pa.array(n_rows),
            "n_distinct": pa.array(
                final["n_distinct"].to_numpy().astype(np.int64)),
            "max_key_rows": pa.array(mx),
            "top_share_bp": pa.array((10000 * mx) // n_rows, type=pa.int64()),
        }
    )


def _skew_aggs():
    from ray.data.aggregate import Max, Sum

    return [Sum("n_rows"), Sum("n_distinct"), Max("max_key_rows")]


QUERIES["skew_report"] = q_skew_report
ORACLE_SQL["skew_report"] = " UNION ALL ".join(
    f"""
    (WITH f AS (SELECT {column} AS k, COUNT(*) AS n FROM {table} GROUP BY 1)
     SELECT '{label}' AS "column",
            CAST(SUM(n) AS BIGINT) AS n_rows,
            COUNT(*) AS n_distinct,
            CAST(MAX(n) AS BIGINT) AS max_key_rows,
            CAST((10000 * MAX(n)) // SUM(n) AS BIGINT) AS top_share_bp
     FROM f)
    """
    for label, table, column in SKEW_COLUMNS
)


def q_revenue_lorenz(sf_dir: str):
    """Revenue-concentration (Lorenz) profile: customers ranked by total
    order revenue descending, cumulative revenue share at each decile
    boundary in exact integer basis points.  Per-customer cents fold in
    one hash(custkey) exchange; `ops/index.zip_with_index` ranks the
    customer-domain table with a range-partitioned sort (ties carry
    equal revenue, so every tie permutation yields the same decile
    sums — no tiebreak column needed); a final streaming pass folds ten
    masked partial sums per batch, so no row-level cumulative column
    ever materializes."""
    from ...ops.index import zip_with_index

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        c = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c)
        return pa.table(
            {
                "o_custkey": pa.array(uniq, type=pa.int64()),
                "rev_c": pa.array(sums, type=pa.int64()),
            }
        )

    rev = (
        orders.map_batches(pre, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum("rev_c")
        .map_batches(
            lambda b: pa.table(
                {
                    "rev_c": b["sum(rev_c)"],
                    "neg_rev": pa.array(
                        -b["sum(rev_c)"].to_numpy(zero_copy_only=False),
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    ranked = zip_with_index(rev, sort_key="neg_rev", id_col="rk").materialize()
    total = int(ranked.sum("rev_c") or 0)
    n = ranked.count()
    bounds = [(n * k + 9) // 10 for k in range(1, 11)]

    def partials(batch: pa.Table) -> pa.Table:
        rk = batch["rk"].to_numpy(zero_copy_only=False)
        rv = batch["rev_c"].to_numpy(zero_copy_only=False)
        sums = [int(rv[rk < b].sum()) for b in bounds]
        return pa.table(
            {
                "decile": pa.array(np.arange(1, 11, dtype=np.int64), type=pa.int64()),
                "cum_rev_c": pa.array(np.asarray(sums, dtype=np.int64), type=pa.int64()),
            }
        )

    out = (
        ranked.map_batches(partials, batch_format="pyarrow")
        .groupby("decile")
        .sum("cum_rev_c")
        .to_pandas()
        .rename(columns={"sum(cum_rev_c)": "cum_rev_c"})
        .sort_values("decile")
    )
    cum = out["cum_rev_c"].to_numpy(np.int64)
    return pa.table(
        {
            "decile": pa.array(out["decile"].to_numpy(np.int64), type=pa.int64()),
            "cum_rev_c": pa.array(cum, type=pa.int64()),
            "cum_share_bp": pa.array(
                10000 * cum // total if total else cum * 0, type=pa.int64()
            ),
        }
    )


QUERIES["revenue_lorenz"] = q_revenue_lorenz
ORACLE_SQL["revenue_lorenz"] = """
    WITH rev AS (SELECT o_custkey,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS rev_c
                 FROM orders GROUP BY 1),
    r AS (SELECT rev_c,
                 ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) - 1 AS rk
          FROM rev),
    t AS (SELECT COUNT(*) AS n, SUM(rev_c) AS total FROM rev),
    ks AS (SELECT unnest(generate_series(1, 10)) AS decile)
    SELECT CAST(ks.decile AS BIGINT) AS decile,
           CAST((SELECT SUM(r.rev_c) FROM r, t
                 WHERE r.rk < (t.n * ks.decile + 9) // 10) AS BIGINT)
               AS cum_rev_c,
           CAST(10000 * (SELECT SUM(r.rev_c) FROM r, t
                         WHERE r.rk < (t.n * ks.decile + 9) // 10)
                // (SELECT total FROM t) AS BIGINT) AS cum_share_bp
    FROM ks ORDER BY ks.decile
"""


def q_order_gaps(sf_dir: str):
    """Per-customer inter-order cadence profile: number of gaps, total
    and maximum gap in EXACT integer days between consecutive orders
    (order-date order, orderkey tie-break).  One hash(custkey) exchange
    co-locates each customer's orders; the per-shard kernel is one
    lexsort + grouped diff — no per-customer Python loop.  Customers
    with a single order drop (no gap), mirroring the LAG oracle."""
    from ...ops.agg import sharded_groupby_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        days = df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        d = pd.DataFrame(
            {"c": df["o_custkey"].to_numpy(), "k": df["o_orderkey"].to_numpy(),
             "d": days}
        ).sort_values(["c", "d", "k"], kind="stable")
        gap = d["d"].diff()
        same = d["c"].eq(d["c"].shift())
        d["gap"] = gap.where(same)
        g = d.dropna(subset=["gap"]).groupby("c", sort=False)["gap"].agg(
            ["size", "sum", "max"]
        )
        return pd.DataFrame(
            {
                "o_custkey": g.index.to_numpy(np.int64),
                "n_gaps": g["size"].to_numpy(np.int64),
                "sum_gap_days": g["sum"].to_numpy(np.int64),
                "max_gap_days": g["max"].to_numpy(np.int64),
            }
        )

    return sharded_groupby_apply(orders, ["o_custkey"], fold)


QUERIES["order_gaps"] = q_order_gaps
ORACLE_SQL["order_gaps"] = """
    WITH g AS (SELECT o_custkey,
                      DATEDIFF('day',
                               LAG(CAST(o_orderdate AS DATE)) OVER (
                                   PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
                               CAST(o_orderdate AS DATE)) AS gap
               FROM orders)
    SELECT o_custkey,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY o_custkey
"""
