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


def chi_square(ds, a: str, b: str) -> pa.Table:
    """One row {chi2 (6 digits), dof} for independence of categorical
    columns `a` and `b`."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([a, b]).to_pandas()
        g = df.groupby([a, b], sort=False).size().rename("__c")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    cells = (
        ds.select_columns([a, b])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby([a, b])["__c"]
        .sum()
        .reset_index()
    )
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
