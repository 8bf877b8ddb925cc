"""Fixed-size token-window chunking with overlap (context-length prep).

Parity note: not in the reference plugin — this is the training-data
step that splits each document into model-context-sized windows
(size ``k`` tokens, stride ``k - overlap``), the stage feeding sequence
packing (`ops/pack.py`) and tokenization.

Scale shape: a stateless per-batch flat-map — each output chunk derives
only from its own document, so there is NO exchange at all; the op
streams and fans out row counts by ~n_tok/stride.  Chunk text is the
space-rejoin of the whitespace tokens (both the op and its SQL oracle
define tokens as maximal non-whitespace runs, so the rejoin is the
canonical rendering, not the original spacing).  Documents with zero
tokens emit zero chunks.
"""
from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data


def chunk_documents(
    ds: "ray.data.Dataset",
    size: int,
    overlap: int = 0,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Split each document into token windows of ``size`` with ``overlap``
    tokens shared between consecutive windows.

    Output columns: ``id_column``, ``chunk_idx``, ``tok_start``,
    ``tok_len``, ``chunk`` — every window starts at ``chunk_idx *
    (size - overlap)`` and the final window may be short.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        ids: List = []
        idxs: List[int] = []
        starts: List[int] = []
        lens: List[int] = []
        texts: List[str] = []
        for doc_id, text in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            toks = (text or "").split()
            n = len(toks)
            for i, start in enumerate(range(0, n, stride)):
                win = toks[start : start + size]
                ids.append(doc_id)
                idxs.append(i)
                starts.append(start)
                lens.append(len(win))
                texts.append(" ".join(win))
        return pa.table(
            {
                id_column: pa.array(ids, type=batch[id_column].type),
                "chunk_idx": pa.array(idxs, type=pa.int64()),
                "tok_start": pa.array(starts, type=pa.int64()),
                "tok_len": pa.array(lens, type=pa.int64()),
                "chunk": pa.array(texts, type=pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")
