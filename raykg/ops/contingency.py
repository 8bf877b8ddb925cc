"""Chi-square test of independence over a two-way contingency table.

Uses the algebraic identity  Σ_cells (o-e)²/e = Σ_observed o²/e − n
(the zero-observed cells contribute exactly their expectation, which the
identity absorbs), so only OBSERVED (a, b) pair counts are ever needed —
no dense grid materialization.

Distribution: per-batch vectorized pair counts (cell cardinality is
bounded — categorical × categorical is the operator's contract, like
every contingency test), folded with one tiny pandas groupby on the
driver over O(batches × cells) partial rows.  Marginals and the
statistic are arithmetic over the folded table.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _observed_cells(ds, a: str, b: str) -> pd.DataFrame:
    """Observed (a, b) pair counts: per-batch vectorized partials folded
    with one tiny pandas groupby — O(batches x cells) rows ever move."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([a, b]).to_pandas()
        g = df.groupby([a, b], sort=False).size().rename("__c")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return (
        ds.select_columns([a, b])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby([a, b])["__c"]
        .sum()
        .reset_index()
    )


def mutual_info(ds, a: str, b: str) -> pa.Table:
    """One row {mi_nats, cramers_v, n, r, s}: mutual information (nats)
    and Cramér's V between categorical columns `a` and `b`.

    MI = Σ_observed (o/n)·ln(o·n/(r_a·c_b)) — zero cells contribute 0,
    so only observed cells are needed; V = sqrt(χ²/(n·(min(r,s)−1)))
    with χ² from the same Σ o²·n/(r_a·c_b) − n identity as
    :func:`chi_square`.  Both are 6-digit-rounded scalars over a
    bounded cell table."""
    cells = _observed_cells(ds, a, b)
    n = float(cells["__c"].sum())
    ta = cells.groupby(a)["__c"].sum()
    tb = cells.groupby(b)["__c"].sum()
    o = cells["__c"].to_numpy(dtype=np.float64)
    ra = ta.loc[cells[a]].to_numpy(dtype=np.float64)
    cb = tb.loc[cells[b]].to_numpy(dtype=np.float64)
    mi = float(((o / n) * np.log(o * n / (ra * cb))).sum())
    chi2 = float((o * o * n / (ra * cb)).sum() - n)
    r, s = len(ta), len(tb)
    denom = n * (min(r, s) - 1)
    v = float(np.sqrt(chi2 / denom)) if denom > 0 else float("nan")
    return pa.table(
        {
            "mi_nats": pa.array([round(mi, 6)], type=pa.float64()),
            "cramers_v": pa.array([round(v, 6)], type=pa.float64()),
            "n": pa.array([int(n)], type=pa.int64()),
            "r": pa.array([r], type=pa.int64()),
            "s": pa.array([s], type=pa.int64()),
        }
    )


def chi_square(ds, a: str, b: str) -> pa.Table:
    """One row {chi2 (6 digits), dof} for independence of categorical
    columns `a` and `b`."""
    cells = _observed_cells(ds, a, b)
    n = float(cells["__c"].sum())
    ta = cells.groupby(a)["__c"].sum()
    tb = cells.groupby(b)["__c"].sum()
    o = cells["__c"].to_numpy(dtype=np.float64)
    e = (
        ta.loc[cells[a]].to_numpy(dtype=np.float64)
        * tb.loc[cells[b]].to_numpy(dtype=np.float64)
        / n
    )
    chi2 = float((o * o / e).sum() - n)
    dof = (len(ta) - 1) * (len(tb) - 1)
    return pa.table(
        {
            "chi2": pa.array([round(chi2, 6)], type=pa.float64()),
            "dof": pa.array([dof], type=pa.int64()),
        }
    )
