"""TPC-H analogues Q7/Q8/Q9/Q12/Q13/Q21/Q22 over the synthetic tables.

Completes the relational family (Q1/3/4/5/6/10/14/17/18/19 live in
``relational.py``).  The synthetic schema has no partsupp, no
commit/receipt dates, no shipmode/phone/comment columns, so each query
keeps the PUBLIC benchmark's join/aggregate SHAPE and swaps the missing
column for a present one (documented per query).  All money math is
exact int64 cents (x100) or cents-squared (price x (100-disc)) so the
Ray result and the DuckDB oracle hash bit-equal.

Scale conventions (same as relational.py): dimension maps broadcast via
``ray.put`` under ``_ATTACH_BROADCAST_MAX`` rows and switch to
``bucketed_hash_join`` above it; every fact scan is column-pruned and
emits per-batch partial cells bounded by the group-domain size, so the
only exchanges are O(cells) reduces (plus the one hash(orderkey) shard
exchange where an EXISTS needs order co-location).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ._shared import QUERIES, ORACLE_SQL

_ATTACH_BROADCAST_MAX = 2_000_000


def _attach_by_key(big, small, on: str, val_cols, gate: int = _ATTACH_BROADCAST_MAX):
    """Shared gated broadcast-or-bucketed inner attach — see
    `ops/join.attach_by_key` (promoted there for reuse)."""
    from ...ops.join import attach_by_key

    return attach_by_key(big, small, on, val_cols, gate=gate)


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False) * 100).astype(np.int64)


def _rev_c2(batch: pa.Table, keep=None) -> np.ndarray:
    """Exact revenue cells: price_cents x (100 - disc_cents)."""
    ep = _cents(batch["l_extendedprice"])
    d = _cents(batch["l_discount"])
    rev = ep * (100 - d)
    return rev if keep is None else rev[keep]


def _year_of(ts: np.ndarray) -> np.ndarray:
    return (ts.astype("datetime64[Y]").astype(np.int64) + 1970).astype(np.int64)


def _sorted_supplier_nations(sf_dir: str):
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk, kind="stable")
    return sk[order], sup["s_nationkey"].to_numpy()[order]


# ---------------------------------------------------------------------------
# Q7 volume shipping between two nations
# ---------------------------------------------------------------------------

TPCH_Q7_NATION1 = "NATION_3"
TPCH_Q7_NATION2 = "NATION_7"
TPCH_Q7_DATE_LO = "1996-01-01"
TPCH_Q7_DATE_HI = "1998-01-01"


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 volume shipping (public benchmark semantics): revenue
    between supplier nation and customer nation for the unordered pair
    (NATION1, NATION2), by ship year, over [DATE_LO, DATE_HI).

    Plan, scale notes: nation is driver-tiny; the supplier dim restricted
    to the two nations broadcasts (sorted arrays, ray.put once).  Customer
    filters to the two nations (~2/25 of rows) and attaches to orders via
    the gated broadcast-or-bucketed map, producing (o_orderkey ->
    c_nationkey); that map attaches to the date-filtered lineitem stream
    the same way.  lineitem streams ONCE; each batch folds into at most
    2 x 2 x years exact-int cells, so the final exchange is O(cells)."""
    import pyarrow.compute as pc

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    key_of = {v: k for k, v in name_of.items()}
    n1, n2 = key_of[TPCH_Q7_NATION1], key_of[TPCH_Q7_NATION2]

    sk, sn = _sorted_supplier_nations(sf_dir)
    pair_mask = (sn == n1) | (sn == n2)
    sup_ref = ray.put((sk[pair_mask], sn[pair_mask]))

    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        .map_batches(
            lambda b, n1=n1, n2=n2: b.filter(
                pc.or_(pc.equal(b["c_nationkey"], n1), pc.equal(b["c_nationkey"], n2))
            ).rename_columns(["o_custkey", "c_nationkey"]),
            batch_format="pyarrow",
        )
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    omap = _attach_by_key(orders, cust, on="o_custkey", val_cols=["c_nationkey"]).map_batches(
        lambda b: pa.table(
            {"l_orderkey": b["o_orderkey"], "c_nationkey": b["c_nationkey"]}
        ),
        batch_format="pyarrow",
    )

    lo = np.datetime64(TPCH_Q7_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q7_DATE_HI).astype("datetime64[us]")

    def date_filter(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((sd >= lo) & (sd < hi)))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
        ],
    ).map_batches(date_filter, batch_format="pyarrow")

    _EMPTY = pa.table(
        {
            "s_nat": pa.array([], type=pa.int64()),
            "c_nat": pa.array([], type=pa.int64()),
            "l_year": pa.array([], type=pa.int64()),
            "revenue_c2": pa.array([], type=pa.int64()),
        }
    )

    def cells(batch: pa.Table) -> pa.Table:
        psk, psn = ray.get(sup_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(psk) == 0 or batch.num_rows == 0:
            return _EMPTY
        pos = np.minimum(np.searchsorted(psk, lsk), len(psk) - 1)
        s_nat = psn[pos]
        c_nat = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = (psk[pos] == lsk) & (
            ((s_nat == n1) & (c_nat == n2)) | ((s_nat == n2) & (c_nat == n1))
        )
        if not keep.any():
            return _EMPTY
        yr = _year_of(batch["l_shipdate"].to_numpy(zero_copy_only=False)[keep])
        rev = _rev_c2(batch, keep)
        s_nat, c_nat = s_nat[keep].astype(np.int64), c_nat[keep].astype(np.int64)
        code = (s_nat * 64 + (c_nat == n2).astype(np.int64)) * 8192 + yr
        uniq, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "s_nat": pa.array(uniq // (64 * 8192), type=pa.int64()),
                "c_nat": pa.array(
                    np.where((uniq // 8192) % 64 == 1, n2, n1), type=pa.int64()
                ),
                "l_year": pa.array(uniq % 8192, type=pa.int64()),
                "revenue_c2": pa.array(sums, type=pa.int64()),
            }
        )

    joined = _attach_by_key(li, omap, on="l_orderkey", val_cols=["c_nationkey"])
    out = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["s_nat", "c_nat", "l_year"])
        .sum("revenue_c2")
        .to_pandas()
        .rename(columns={"sum(revenue_c2)": "revenue_c2"})
    )
    out["supp_nation"] = out["s_nat"].map(name_of)
    out["cust_nation"] = out["c_nat"].map(name_of)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"])
    return pa.table(
        {
            "supp_nation": pa.array(out["supp_nation"], type=pa.string()),
            "cust_nation": pa.array(out["cust_nation"], type=pa.string()),
            "l_year": pa.array(out["l_year"].to_numpy(np.int64), type=pa.int64()),
            "revenue_c2": pa.array(
                out["revenue_c2"].to_numpy(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q7"] = q_tpch_q7
ORACLE_SQL["tpch_q7"] = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c2
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = '{TPCH_Q7_NATION1}' AND n2.n_name = '{TPCH_Q7_NATION2}')
           OR (n1.n_name = '{TPCH_Q7_NATION2}' AND n2.n_name = '{TPCH_Q7_NATION1}'))
      AND l_shipdate >= TIMESTAMP '{TPCH_Q7_DATE_LO}'
      AND l_shipdate <  TIMESTAMP '{TPCH_Q7_DATE_HI}'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 national market share
# ---------------------------------------------------------------------------

TPCH_Q8_REGION = "ASIA"
TPCH_Q8_NATION = "NATION_10"
TPCH_Q8_TYPE = "PROMO"
TPCH_Q8_DATE_LO = "1996-01-01"
TPCH_Q8_DATE_HI = "1998-01-01"


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 national market share (public benchmark semantics): of the
    revenue from TPCH_Q8_TYPE parts sold to customers in TPCH_Q8_REGION
    during the order-date window, the share supplied by TPCH_Q8_NATION,
    per order year.  The share is exact integer basis points
    (10000 * nation / total, floor) so the oracle hashes bit-equal.

    Plan, scale notes: region/nation tiny; supplier-nation broadcast;
    customers in the region attach to the window-filtered orders (gated
    broadcast-or-bucketed), producing (o_orderkey -> o_year); type-matched
    part keys semi-filter lineitem the same gated way.  lineitem streams
    once into per-batch (o_year, nation_rev, total_rev) cells — at most
    one cell per year per batch."""
    import pyarrow.compute as pc

    from ...ops.join import semi_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], TPCH_Q8_REGION))["r_regionkey"][0].as_py()
    region_nations = np.sort(
        nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"].to_numpy()
    )
    target_nat = nat.filter(pc.equal(nat["n_name"], TPCH_Q8_NATION))[
        "n_nationkey"
    ][0].as_py()

    sk, sn = _sorted_supplier_nations(sf_dir)
    sup_ref = ray.put((sk, sn))

    def cust_filter(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(region_nations, nk), len(region_nations) - 1)
        return batch.filter(pa.array(region_nations[pos] == nk)).select(["c_custkey"])

    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        .map_batches(cust_filter, batch_format="pyarrow")
        .map_batches(
            lambda b: b.rename_columns(["o_custkey"]), batch_format="pyarrow"
        )
    )

    lo = np.datetime64(TPCH_Q8_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q8_DATE_HI).astype("datetime64[us]")

    def orders_window(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
                "o_year": pa.array(_year_of(od[keep]), type=pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_window, batch_format="pyarrow")
    # customers in the region are the semi-filter; orders keep o_year
    orders_in = semi_join(orders, cust, on="o_custkey", right_on="o_custkey")
    omap = orders_in.map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"], "o_year": b["o_year"]}),
        batch_format="pyarrow",
    )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        )
        .filter(expr=f"p_type == '{TPCH_Q8_TYPE}'")
        .select_columns(["p_partkey"])
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = semi_join(li, parts, on="l_partkey", right_on="p_partkey")
    joined = _attach_by_key(li, omap, on="l_orderkey", val_cols=["o_year"])

    _EMPTY = pa.table(
        {
            "o_year": pa.array([], type=pa.int64()),
            "nation_rev_c2": pa.array([], type=pa.int64()),
            "total_rev_c2": pa.array([], type=pa.int64()),
        }
    )

    def cells(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        ks, ns = ray.get(sup_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, lsk), len(ks) - 1)
        s_nat = ns[pos]
        rev = _rev_c2(batch)
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(yr, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, rev)
        natl = np.zeros(len(uniq), dtype=np.int64)
        is_t = s_nat == target_nat
        if is_t.any():
            np.add.at(natl, inv[is_t], rev[is_t])
        return pa.table(
            {
                "o_year": pa.array(uniq.astype(np.int64), type=pa.int64()),
                "nation_rev_c2": pa.array(natl, type=pa.int64()),
                "total_rev_c2": pa.array(tot, type=pa.int64()),
            }
        )

    out = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby("o_year")
        .sum(["nation_rev_c2", "total_rev_c2"])
        .to_pandas()
        .rename(
            columns={
                "sum(nation_rev_c2)": "nation_rev_c2",
                "sum(total_rev_c2)": "total_rev_c2",
            }
        )
        .sort_values("o_year")
    )
    natv = out["nation_rev_c2"].to_numpy(np.int64)
    totv = out["total_rev_c2"].to_numpy(np.int64)
    return pa.table(
        {
            "o_year": pa.array(out["o_year"].to_numpy(np.int64), type=pa.int64()),
            "nation_rev_c2": pa.array(natv, type=pa.int64()),
            "total_rev_c2": pa.array(totv, type=pa.int64()),
            "mkt_share_bp": pa.array(10000 * natv // totv, type=pa.int64()),
        }
    )


QUERIES["tpch_q8"] = q_tpch_q8
ORACLE_SQL["tpch_q8"] = f"""
    WITH all_nations AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS volume_c2,
               n2.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
             region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = '{TPCH_Q8_REGION}' AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '{TPCH_Q8_DATE_LO}'
          AND o_orderdate <  TIMESTAMP '{TPCH_Q8_DATE_HI}'
          AND p_type = '{TPCH_Q8_TYPE}')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = '{TPCH_Q8_NATION}'
                         THEN volume_c2 ELSE 0 END) AS BIGINT) AS nation_rev_c2,
           CAST(SUM(volume_c2) AS BIGINT) AS total_rev_c2,
           CAST(10000 * SUM(CASE WHEN supp_nation = '{TPCH_Q8_NATION}'
                                 THEN volume_c2 ELSE 0 END)
                // SUM(volume_c2) AS BIGINT) AS mkt_share_bp
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 product-type profit
# ---------------------------------------------------------------------------

TPCH_Q9_NAME_TOKEN = "widget"


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 product-type profit (public benchmark shape; the synthetic
    schema has no partsupp, so profit is l_extendedprice*(1-l_discount)
    without the supplycost term, and the year is year(l_shipdate) — no
    orders join needed): profit by supplier nation and year for parts
    whose p_name contains TPCH_Q9_NAME_TOKEN.

    Plan, scale notes: matching part keys semi-filter lineitem through
    the gated broadcast path; supplier-nation broadcasts; lineitem
    streams once into <= 25 x years exact-int cells per batch."""
    from ...ops.join import semi_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    sk, sn = _sorted_supplier_nations(sf_dir)
    sup_ref = ray.put((sk, sn))

    def part_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.match_substring(batch["p_name"], TPCH_Q9_NAME_TOKEN)
        return batch.filter(keep).select(["p_partkey"])

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(part_filter, batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    li = semi_join(li, parts, on="l_partkey", right_on="p_partkey")

    _EMPTY = pa.table(
        {
            "nat": pa.array([], type=pa.int64()),
            "l_year": pa.array([], type=pa.int64()),
            "profit_c2": pa.array([], type=pa.int64()),
        }
    )

    def cells(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        ks, ns = ray.get(sup_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, lsk), len(ks) - 1)
        s_nat = ns[pos].astype(np.int64)
        yr = _year_of(batch["l_shipdate"].to_numpy(zero_copy_only=False))
        rev = _rev_c2(batch)
        code = s_nat * 8192 + yr
        uniq, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "nat": pa.array(uniq // 8192, type=pa.int64()),
                "l_year": pa.array(uniq % 8192, type=pa.int64()),
                "profit_c2": pa.array(sums, type=pa.int64()),
            }
        )

    out = (
        li.map_batches(cells, batch_format="pyarrow")
        .groupby(["nat", "l_year"])
        .sum("profit_c2")
        .to_pandas()
        .rename(columns={"sum(profit_c2)": "profit_c2"})
    )
    out["n_name"] = out["nat"].map(name_of)
    out = out.sort_values(["n_name", "l_year"], ascending=[True, False])
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], type=pa.string()),
            "l_year": pa.array(out["l_year"].to_numpy(np.int64), type=pa.int64()),
            "profit_c2": pa.array(out["profit_c2"].to_numpy(np.int64), type=pa.int64()),
        }
    )


QUERIES["tpch_q9"] = q_tpch_q9
ORACLE_SQL["tpch_q9"] = f"""
    SELECT n_name,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS profit_c2
    FROM part, supplier, lineitem, nation
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%{TPCH_Q9_NAME_TOKEN}%'
    GROUP BY n_name, l_year
    ORDER BY n_name, l_year DESC
"""


# ---------------------------------------------------------------------------
# Q12 shipping-priority line counts
# ---------------------------------------------------------------------------

TPCH_Q12_DATE_LO = "1997-01-01"
TPCH_Q12_DATE_HI = "1998-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shipping modes / order priority (public benchmark shape;
    no l_shipmode column, so the group key is l_linestatus): for lines
    shipped in the window, count high-priority (1-URGENT / 2-HIGH) vs
    low-priority orders per linestatus.

    Plan, scale notes: the full (o_orderkey -> o_orderpriority) map is
    corpus-scale, so the attach is the gated broadcast-or-bucketed path;
    lineitem date-filters at the read and folds into <= 2 cells per
    batch; the final exchange is over the 2-value linestatus domain."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    lo = np.datetime64(TPCH_Q12_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q12_DATE_HI).astype("datetime64[us]")

    def date_filter(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((sd >= lo) & (sd < hi))).select(
            ["l_orderkey", "l_linestatus"]
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    ).map_batches(date_filter, batch_format="pyarrow")

    joined = _attach_by_key(li, orders, on="l_orderkey", val_cols=["o_orderpriority"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "l_linestatus": pd.Series([], dtype=str),
                    "high_line_count": pd.Series([], dtype=np.int64),
                    "low_line_count": pd.Series([], dtype=np.int64),
                }
            )
        high = df["o_orderpriority"].isin(_Q12_HIGH).to_numpy().astype(np.int64)
        agg = (
            pd.DataFrame({"l_linestatus": df["l_linestatus"].to_numpy(), "h": high})
            .groupby("l_linestatus", sort=False)["h"]
            .agg(["sum", "count"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "l_linestatus": agg["l_linestatus"],
                "high_line_count": agg["sum"].to_numpy(np.int64),
                "low_line_count": (agg["count"] - agg["sum"]).to_numpy(np.int64),
            }
        )

    out = (
        joined.map_batches(cells, batch_format="pandas")
        .groupby("l_linestatus")
        .sum(["high_line_count", "low_line_count"])
        .to_pandas()
        .rename(
            columns={
                "sum(high_line_count)": "high_line_count",
                "sum(low_line_count)": "low_line_count",
            }
        )
        .sort_values("l_linestatus")
    )
    return pa.table(
        {
            "l_linestatus": pa.array(out["l_linestatus"], type=pa.string()),
            "high_line_count": pa.array(
                out["high_line_count"].to_numpy(np.int64), type=pa.int64()
            ),
            "low_line_count": pa.array(
                out["low_line_count"].to_numpy(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q12"] = q_tpch_q12
ORACLE_SQL["tpch_q12"] = f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '{TPCH_Q12_DATE_LO}'
      AND l_shipdate <  TIMESTAMP '{TPCH_Q12_DATE_HI}'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13 customer order-count distribution
# ---------------------------------------------------------------------------

TPCH_Q13_EXCLUDE = "4-NOT SPECIFIED"


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 customer distribution (public benchmark shape; no comment
    column, so the excluded-order predicate is o_orderpriority <>
    TPCH_Q13_EXCLUDE): how many customers placed 0, 1, 2, ... qualifying
    orders.

    Plan, scale notes: orders pre-aggregate (o_custkey, n) per batch, ONE
    hash(custkey) shard exchange sums them, each shard emits its local
    histogram of counts (<= max-orders-per-customer cells), and the
    zero bucket is total customers minus customers seen — a metadata
    count, no customer scan beyond it.  Relies on the FK integrity the
    fk_audit query verifies (every o_custkey exists in customer)."""
    from ...ops.agg import sharded_groupby_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).filter(expr=f"o_orderpriority != '{TPCH_Q13_EXCLUDE}'")

    def pre(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "o_custkey": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("o_custkey", sort=False)["n"].sum()
        hist = tot.value_counts()
        return pd.DataFrame(
            {
                "c_count": hist.index.to_numpy(np.int64),
                "custdist": hist.to_numpy(np.int64),
            }
        )

    hist = (
        sharded_groupby_apply(
            orders.map_batches(pre, batch_format="pyarrow"), ["o_custkey"], per_cust
        )
        .groupby("c_count")
        .sum("custdist")
        .to_pandas()
        .rename(columns={"sum(custdist)": "custdist"})
    )
    total_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    zero = total_cust - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist = hist.sort_values(["custdist", "c_count"], ascending=[False, False])
    return pa.table(
        {
            "c_count": pa.array(hist["c_count"].to_numpy(np.int64), type=pa.int64()),
            "custdist": pa.array(hist["custdist"].to_numpy(np.int64), type=pa.int64()),
        }
    )


QUERIES["tpch_q13"] = q_tpch_q13
ORACLE_SQL["tpch_q13"] = f"""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '{TPCH_Q13_EXCLUDE}'
        GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q21 suppliers who kept orders waiting
# ---------------------------------------------------------------------------

TPCH_Q21_TOPK = 100


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 suppliers who kept orders waiting (public benchmark shape;
    no commit/receipt dates, so "late" is l_returnflag = 'R'): for 'F'
    orders, count lines whose supplier is the ONLY returned-flag supplier
    on a multi-supplier order — the same EXISTS / NOT EXISTS pair as the
    benchmark, resolved by co-locating each order's lines.

    Plan, scale notes: 'F' order keys semi-filter the 3-column lineitem
    stream; ONE hash(orderkey) shard exchange co-locates orders, each
    shard resolving the exists/not-exists vectorized and emitting
    <= |suppliers-in-shard| cells; the per-supplier reduce is
    supplier-domain-sized, names attach from the broadcast supplier dim,
    and the final top-k is per-block partials + one tiny reduce (no
    global sort)."""
    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import semi_join
    from ...ops.topk import global_topk

    fkeys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
        )
        .filter(expr="o_orderstatus == 'F'")
        .select_columns(["o_orderkey"])
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )
    li = semi_join(li, fkeys, on="l_orderkey", right_on="o_orderkey")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_suppkey"])
        nsupp = d.groupby("l_orderkey", sort=False).size()
        r = df[df["l_returnflag"] == "R"]
        nr = r.drop_duplicates(["l_orderkey", "l_suppkey"]).groupby(
            "l_orderkey", sort=False
        ).size()
        eligible = nr[nr == 1].index.intersection(nsupp[nsupp >= 2].index)
        rr = r[r["l_orderkey"].isin(eligible)]
        out = rr.groupby("l_suppkey", as_index=False, sort=False).size()
        return out.rename(columns={"size": "numwait"})

    cells = sharded_groupby_apply(li, ["l_orderkey"], fold)
    per_supp = (
        cells.groupby("l_suppkey")
        .sum("numwait")
        .map_batches(
            lambda b: pa.table(
                {
                    "s_suppkey": b["l_suppkey"],
                    "numwait": b["sum(numwait)"],
                }
            ),
            batch_format="pyarrow",
        )
    )

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    name_of_ref = ray.put(
        dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    )

    def attach_name(batch: pa.Table) -> pa.Table:
        names = ray.get(name_of_ref)
        return pa.table(
            {
                "s_name": pa.array(
                    [names[k] for k in batch["s_suppkey"].to_pylist()],
                    type=pa.string(),
                ),
                "numwait": pa.array(
                    batch["numwait"].to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    named = per_supp.map_batches(attach_name, batch_format="pyarrow")
    return global_topk(
        named, "numwait", TPCH_Q21_TOPK, descending=True, tiebreak=["s_name"]
    )


QUERIES["tpch_q21"] = q_tpch_q21
ORACLE_SQL["tpch_q21"] = f"""
    WITH w AS (
        SELECT s_name
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R'))
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM w
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT {TPCH_Q21_TOPK}
"""


# ---------------------------------------------------------------------------
# Q22 global sales opportunity
# ---------------------------------------------------------------------------

TPCH_Q22_CODES = (1, 3, 5, 7, 9)
TPCH_Q22_SINCE = "2000-01-01"


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 global sales opportunity (public benchmark shape; no
    phone column, so cntrycode := c_nationkey % 10 in TPCH_Q22_CODES, and
    "never ordered" is "no order since TPCH_Q22_SINCE" so the synthetic
    corpus — where every customer has old orders — still produces a
    non-trivial answer): customers in the code set with above-average
    positive account balance and no recent orders, grouped by code.
    "Above average" is the exact integer predicate bal_c * n > sum_c —
    identical arithmetic on both sides, no float average.

    Plan, scale notes: one customer pass builds the (sum_c, n) scalar via
    per-batch partials; the no-orders test is the broadcast anti-join on
    distinct o_custkey; a second customer stream filters and folds into
    <= |codes| cells per batch."""
    from ...ops.join import semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def in_codes(batch: pa.Table) -> pa.Table:
        code = batch["c_nationkey"].to_numpy(zero_copy_only=False) % 10
        keep = np.isin(code, TPCH_Q22_CODES)
        out = batch.filter(pa.array(keep))
        bal_c = np.rint(
            out["c_acctbal"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": out["c_custkey"],
                "cntrycode": pa.array(
                    (out["c_nationkey"].to_numpy(zero_copy_only=False) % 10).astype(
                        np.int64
                    ),
                    type=pa.int64(),
                ),
                "bal_c": pa.array(bal_c, type=pa.int64()),
            }
        )

    coded = cust.map_batches(in_codes, batch_format="pyarrow").materialize()

    def pos_partial(batch: pa.Table) -> pa.Table:
        b = batch["bal_c"].to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.table(
            {
                "sum_c": pa.array([int(pos.sum())], type=pa.int64()),
                "n": pa.array([len(pos)], type=pa.int64()),
            }
        )

    stats = (
        coded.map_batches(pos_partial, batch_format="pyarrow")
        .sum(["sum_c", "n"])
    )
    if stats is None:  # empty coded set: no customer qualifies
        sum_c, n = 0, 0
    else:
        sum_c, n = int(stats["sum(sum_c)"]), int(stats["sum(n)"])

    since = np.datetime64(TPCH_Q22_SINCE).astype("datetime64[us]")

    def recent(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(od >= since)).select(["o_custkey"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent, batch_format="pyarrow")
    no_orders = semi_join(coded, orders, on="c_custkey", right_on="o_custkey", anti=True)

    def cells(batch: pa.Table) -> pa.Table:
        bal = batch["bal_c"].to_numpy(zero_copy_only=False)
        keep = bal * n > sum_c
        code = batch["cntrycode"].to_numpy(zero_copy_only=False)[keep]
        bal = bal[keep]
        uniq, inv = np.unique(code, return_inverse=True)
        nums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nums, inv, 1)
        tots = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tots, inv, bal)
        return pa.table(
            {
                "cntrycode": pa.array(uniq, type=pa.int64()),
                "numcust": pa.array(nums, type=pa.int64()),
                "totacctbal_c": pa.array(tots, type=pa.int64()),
            }
        )

    out = (
        no_orders.map_batches(cells, batch_format="pyarrow")
        .groupby("cntrycode")
        .sum(["numcust", "totacctbal_c"])
        .to_pandas()
    )
    if "cntrycode" not in out.columns:  # empty survivor set: typed empty frame
        out = pd.DataFrame(
            {
                "cntrycode": pd.Series([], dtype=np.int64),
                "numcust": pd.Series([], dtype=np.int64),
                "totacctbal_c": pd.Series([], dtype=np.int64),
            }
        )
    else:
        out = out.rename(
            columns={
                "sum(numcust)": "numcust",
                "sum(totacctbal_c)": "totacctbal_c",
            }
        ).sort_values("cntrycode")
    return pa.table(
        {
            "cntrycode": pa.array(out["cntrycode"].to_numpy(np.int64), type=pa.int64()),
            "numcust": pa.array(out["numcust"].to_numpy(np.int64), type=pa.int64()),
            "totacctbal_c": pa.array(
                out["totacctbal_c"].to_numpy(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q22"] = q_tpch_q22
_Q22_CODES_SQL = ", ".join(str(c) for c in TPCH_Q22_CODES)
ORACLE_SQL["tpch_q22"] = f"""
    WITH pos AS (
        SELECT c_custkey,
               CAST(c_nationkey % 10 AS BIGINT) AS code,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_nationkey % 10 IN ({_Q22_CODES_SQL})),
    stat AS (
        SELECT SUM(bal_c) AS sum_c, COUNT(*) AS n FROM pos WHERE bal_c > 0)
    SELECT code AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
    FROM pos, stat
    WHERE bal_c * n > sum_c
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = pos.c_custkey
                        AND o_orderdate >= TIMESTAMP '{TPCH_Q22_SINCE}')
    GROUP BY code
    ORDER BY code
"""


# ---------------------------------------------------------------------------
# Q16 parts/supplier relationship (partsupp replaced by distinct
# (l_partkey, l_suppkey) pairs from lineitem — the synthetic schema has
# no partsupp table)
# ---------------------------------------------------------------------------

TPCH_Q16_BRAND = "Brand#13"
TPCH_Q16_TYPE = "PROMO"


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 parts/supplier-relationship count (public benchmark
    shape; partsupp is the distinct (part, supplier) pairs observed in
    lineitem, and the no-complaints supplier exclusion is dropped — no
    comment column): distinct suppliers per (brand, type, size) for
    parts not of TPCH_Q16_BRAND and not of TPCH_Q16_TYPE.

    Plan, scale notes: the part dim (partkey -> brand/type/size,
    pre-filtered) attaches through the gated broadcast-or-bucketed map;
    each lineitem batch pre-dedups (brand, type, size, suppkey), ONE
    hash(brand,type,size) exchange co-locates each group, and the
    per-shard distinct-supplier count is exact."""
    from ...ops.agg import sharded_groupby_apply

    def part_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.not_equal(batch["p_brand"], TPCH_Q16_BRAND),
            pc.not_equal(batch["p_type"], TPCH_Q16_TYPE),
        )
        return batch.filter(keep).rename_columns(
            ["l_partkey", "p_brand", "p_type", "p_size"]
        )

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(part_filter, batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    tagged = _attach_by_key(
        li, parts, on="l_partkey", val_cols=["p_brand", "p_type", "p_size"]
    )

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])[
            ["p_brand", "p_type", "p_size", "l_suppkey"]
        ]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
            .groupby(["p_brand", "p_type", "p_size"], sort=False, as_index=False)
            .size()
        )
        return g.rename(columns={"size": "supplier_cnt"})

    out = (
        sharded_groupby_apply(
            tagged.map_batches(pre, batch_format="pandas"),
            ["p_brand", "p_type", "p_size"],
            fold,
        )
        .to_pandas()
        .sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
        )
    )
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"], type=pa.string()),
            "p_type": pa.array(out["p_type"], type=pa.string()),
            "p_size": pa.array(out["p_size"].to_numpy(np.int64), type=pa.int64()),
            "supplier_cnt": pa.array(
                out["supplier_cnt"].to_numpy(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q16"] = q_tpch_q16
ORACLE_SQL["tpch_q16"] = f"""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> '{TPCH_Q16_BRAND}' AND p_type <> '{TPCH_Q16_TYPE}'
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q11 important stock (partsupp value replaced by shipped lineitem value)
# ---------------------------------------------------------------------------

# keep parts above 5/4 of the average per-part value: the TPC-H fraction
# is SF-scaled (0.0001/SF); tying the cut to the average makes the
# predicate scale-free and it still ships as pure integers
TPCH_Q11_NUM, TPCH_Q11_DEN = 4, 5


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 important stock (public benchmark shape; no partsupp, so
    a part's "stock value" is its total shipped extendedprice): parts
    whose exact integer-cent value exceeds DEN/NUM x the per-part
    average — the threshold ships as the pure integer predicate
    value_c * n_parts * NUM > total_c * DEN, no float fraction and no
    SF-dependent constant.

    Plan, scale notes: per-batch (partkey, cents) partials, ONE
    hash(partkey) exchange sums them; the grand total folds from the
    part-domain-sized table (a second tiny pass over cells, not over
    lineitem) and broadcasts as a scalar into the filter."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        c = _cents(batch["l_extendedprice"])
        uniq, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c)
        return pa.table(
            {
                "l_partkey": pa.array(uniq, type=pa.int64()),
                "value_c": pa.array(sums, type=pa.int64()),
            }
        )

    per_part = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby("l_partkey")
        .sum("value_c")
        .map_batches(
            lambda b: pa.table(
                {"l_partkey": b["l_partkey"], "value_c": b["sum(value_c)"]}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    total = per_part.sum("value_c") or 0
    n_parts = per_part.count()

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["value_c"].to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(v * n_parts * TPCH_Q11_NUM > total * TPCH_Q11_DEN)
        )

    out = per_part.map_batches(keep, batch_format="pyarrow").to_pandas()
    if "value_c" not in out.columns:  # empty survivor set
        out = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "value_c": pd.Series([], dtype=np.int64),
            }
        )
    out = out.sort_values(["value_c", "l_partkey"], ascending=[False, True])
    return pa.table(
        {
            "l_partkey": pa.array(out["l_partkey"].to_numpy(np.int64), type=pa.int64()),
            "value_c": pa.array(out["value_c"].to_numpy(np.int64), type=pa.int64()),
        }
    )


QUERIES["tpch_q11"] = q_tpch_q11
ORACLE_SQL["tpch_q11"] = f"""
    WITH v AS (SELECT l_partkey,
                      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                           AS BIGINT) AS value_c
               FROM lineitem GROUP BY 1),
    t AS (SELECT SUM(value_c) AS total_c, COUNT(*) AS n FROM v)
    SELECT v.l_partkey, v.value_c
    FROM v, t
    WHERE v.value_c * t.n * {TPCH_Q11_NUM} > t.total_c * {TPCH_Q11_DEN}
    ORDER BY v.value_c DESC, v.l_partkey
"""


# ---------------------------------------------------------------------------
# Q15 top supplier (quarterly revenue view + max)
# ---------------------------------------------------------------------------

TPCH_Q15_DATE_LO = "1997-01-01"
TPCH_Q15_DATE_HI = "1997-04-01"


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 top supplier (public benchmark semantics): the
    supplier(s) with maximum revenue over the quarterly ship-date
    window, exact int64 cents² revenue.

    Plan, scale notes: lineitem date-filters at the read and folds into
    per-batch (suppkey, revenue) cells; the only exchange is the
    supplier-domain-sized reduce, the max + tie filter is a driver fold
    over that bounded table, and names attach from the supplier dim."""
    lo = np.datetime64(TPCH_Q15_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q15_DATE_HI).astype("datetime64[us]")

    def cells(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        rev = _rev_c2(batch, keep)
        uniq, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "s_suppkey": pa.array(uniq, type=pa.int64()),
                "total_rev_c2": pa.array(sums, type=pa.int64()),
            }
        )

    per_supp = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(cells, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("total_rev_c2")
        .to_pandas()
        .rename(columns={"sum(total_rev_c2)": "total_rev_c2"})
    )
    best = per_supp[per_supp["total_rev_c2"] == per_supp["total_rev_c2"].max()]
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    best = best.sort_values("s_suppkey")
    return pa.table(
        {
            "s_suppkey": pa.array(best["s_suppkey"].to_numpy(np.int64), type=pa.int64()),
            "s_name": pa.array(
                [names[k] for k in best["s_suppkey"]], type=pa.string()
            ),
            "total_rev_c2": pa.array(
                best["total_rev_c2"].to_numpy(np.int64), type=pa.int64()
            ),
        }
    )


QUERIES["tpch_q15"] = q_tpch_q15
ORACLE_SQL["tpch_q15"] = f"""
    WITH revenue AS (
        SELECT l_suppkey AS s_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS total_rev_c2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{TPCH_Q15_DATE_LO}'
          AND l_shipdate <  TIMESTAMP '{TPCH_Q15_DATE_HI}'
        GROUP BY 1)
    SELECT r.s_suppkey, s.s_name, r.total_rev_c2
    FROM revenue r, supplier s
    WHERE r.s_suppkey = s.s_suppkey
      AND r.total_rev_c2 = (SELECT MAX(total_rev_c2) FROM revenue)
    ORDER BY r.s_suppkey
"""


# ---------------------------------------------------------------------------
# Q2 minimum-cost supplier (partsupp cost replaced by cheapest observed
# shipment; region-restricted)
# ---------------------------------------------------------------------------

TPCH_Q2_REGION = "EUROPE"
TPCH_Q2_MAX_SIZE = 10


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 minimum-cost supplier (public benchmark shape; no
    partsupp, so a supplier's "cost" for a part is its cheapest observed
    single-shipment extendedprice in cents): for parts with p_size <=
    TPCH_Q2_MAX_SIZE, the TPCH_Q2_REGION supplier with the minimum cost
    (ties -> smallest suppkey), with name and nation attached.

    Plan, scale notes: region suppliers broadcast (tiny); qualifying
    part keys semi-filter lineitem through the gated broadcast path;
    per-batch (part, supp, min-cents) partials make the ONE
    hash(partkey) exchange carry at most |parts x region suppliers|
    rows; the per-part argmin is a vectorized per-shard fold."""
    import pyarrow.compute as pc

    from ...ops.agg import sharded_groupby_apply
    from ...ops.join import semi_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], TPCH_Q2_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nation_name = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    region_nations = set(nat_in["n_nationkey"].to_pylist())

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    sup_region = {
        k: (n, nk)
        for k, n, nk in zip(
            sup["s_suppkey"].to_pylist(),
            sup["s_name"].to_pylist(),
            sup["s_nationkey"].to_pylist(),
        )
        if nk in region_nations
    }
    sup_keys = np.sort(np.array(list(sup_region), dtype=np.int64))
    sup_ref = ray.put(sup_keys)

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
        )
        .filter(expr=f"p_size <= {TPCH_Q2_MAX_SIZE}")
        .select_columns(["p_partkey"])
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    li = semi_join(li, parts, on="l_partkey", right_on="p_partkey")

    def pre(batch: pa.Table) -> pa.Table:
        sk = ray.get(sup_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, lsk), len(sk) - 1)
            keep = sk[pos] == lsk
        else:
            keep = np.zeros(len(lsk), dtype=bool)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        spk = lsk[keep]
        cost = _cents(batch["l_extendedprice"])[keep]
        df = pd.DataFrame({"l_partkey": pk, "l_suppkey": spk, "cost_c": cost})
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False, sort=False)[
            "cost_c"
        ].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False, sort=False)[
            "cost_c"
        ].min()
        g = g.sort_values(
            ["l_partkey", "cost_c", "l_suppkey"], kind="stable"
        ).drop_duplicates("l_partkey")
        return g

    out = (
        sharded_groupby_apply(
            li.map_batches(pre, batch_format="pyarrow"), ["l_partkey"], argmin
        )
        .to_pandas()
        .sort_values("l_partkey")
    )
    names = [sup_region[k][0] for k in out["l_suppkey"]]
    nations = [nation_name[sup_region[k][1]] for k in out["l_suppkey"]]
    return pa.table(
        {
            "p_partkey": pa.array(out["l_partkey"].to_numpy(np.int64), type=pa.int64()),
            "s_suppkey": pa.array(out["l_suppkey"].to_numpy(np.int64), type=pa.int64()),
            "cost_c": pa.array(out["cost_c"].to_numpy(np.int64), type=pa.int64()),
            "s_name": pa.array(names, type=pa.string()),
            "n_name": pa.array(nations, type=pa.string()),
        }
    )


QUERIES["tpch_q2"] = q_tpch_q2
ORACLE_SQL["tpch_q2"] = f"""
    WITH cost AS (
        SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
               CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cost_c
        FROM lineitem, part, supplier, nation, region
        WHERE l_partkey = p_partkey AND p_size <= {TPCH_Q2_MAX_SIZE}
          AND l_suppkey = supplier.s_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = '{TPCH_Q2_REGION}'
        GROUP BY 1, 2),
    best AS (SELECT p_partkey, s_suppkey, cost_c,
                    ROW_NUMBER() OVER (PARTITION BY p_partkey
                                       ORDER BY cost_c, s_suppkey) AS rn
             FROM cost)
    SELECT b.p_partkey, b.s_suppkey, b.cost_c, s.s_name, n.n_name
    FROM best b, supplier s, nation n
    WHERE b.rn = 1 AND b.s_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    ORDER BY b.p_partkey
"""


# ---------------------------------------------------------------------------
# Q20 excess suppliers (availqty replaced by a scale-free concentration
# threshold over shipped quantity)
# ---------------------------------------------------------------------------

TPCH_Q20_NAME_TOKEN = "bolt"
TPCH_Q20_DATE_LO = "1997-01-01"
TPCH_Q20_DATE_HI = "1998-01-01"


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 potential part promotion (public benchmark shape; no
    partsupp availqty, so the "excess" test is scale-free shipped-
    quantity concentration): suppliers whose total shipped quantity of
    TPCH_Q20_NAME_TOKEN parts in the window exceeds the per-supplier
    average — the pure integer predicate q_s * n_supp > total_q.

    Plan, scale notes: matching part keys semi-filter lineitem through
    the gated broadcast path; per-batch (supp, qty) cells make the only
    exchange supplier-domain-sized; the average folds from that bounded
    table and names attach from the supplier dim."""
    from ...ops.join import semi_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    sup_info = {
        k: (n, nk)
        for k, n, nk in zip(
            sup["s_suppkey"].to_pylist(),
            sup["s_name"].to_pylist(),
            sup["s_nationkey"].to_pylist(),
        )
    }

    def part_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.match_substring(batch["p_name"], TPCH_Q20_NAME_TOKEN)
        return batch.filter(keep).select(["p_partkey"])

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(part_filter, batch_format="pyarrow")

    lo = np.datetime64(TPCH_Q20_DATE_LO).astype("datetime64[us]")
    hi = np.datetime64(TPCH_Q20_DATE_HI).astype("datetime64[us]")

    def cells(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        q = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]).astype(
            np.int64
        )
        uniq, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table(
            {
                "s_suppkey": pa.array(uniq, type=pa.int64()),
                "qty": pa.array(sums, type=pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    li = semi_join(li, parts, on="l_partkey", right_on="p_partkey")
    per_supp = (
        li.map_batches(cells, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("qty")
        .to_pandas()
        .rename(columns={"sum(qty)": "qty"})
    )
    n_supp = len(per_supp)
    total_q = int(per_supp["qty"].sum())
    best = per_supp[per_supp["qty"] * n_supp > total_q].sort_values("s_suppkey")
    return pa.table(
        {
            "s_suppkey": pa.array(best["s_suppkey"].to_numpy(np.int64), type=pa.int64()),
            "s_name": pa.array(
                [sup_info[k][0] for k in best["s_suppkey"]], type=pa.string()
            ),
            "n_name": pa.array(
                [nation_name[sup_info[k][1]] for k in best["s_suppkey"]],
                type=pa.string(),
            ),
            "qty": pa.array(best["qty"].to_numpy(np.int64), type=pa.int64()),
        }
    )


QUERIES["tpch_q20"] = q_tpch_q20
ORACLE_SQL["tpch_q20"] = f"""
    WITH q AS (
        SELECT l_suppkey AS s_suppkey,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND p_name LIKE '%{TPCH_Q20_NAME_TOKEN}%'
          AND l_shipdate >= TIMESTAMP '{TPCH_Q20_DATE_LO}'
          AND l_shipdate <  TIMESTAMP '{TPCH_Q20_DATE_HI}'
        GROUP BY 1),
    t AS (SELECT SUM(qty) AS total_q, COUNT(*) AS n FROM q)
    SELECT q.s_suppkey, s.s_name, n.n_name, q.qty
    FROM q, t, supplier s, nation n
    WHERE q.qty * t.n > t.total_q
      AND q.s_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    ORDER BY q.s_suppkey
"""
