"""BPE encode (merge application) and Procrustes alignment — the
test-pinned, no-SQL-mirror-by-design ops (iterative / SVD floats)."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from raykg.ops.bpe import bpe_encode, bpe_train
from raykg.ops.procrustes import procrustes_apply, procrustes_fit


def ref_encode(text, merges):
    ranked = [(m[1], m[2]) for m in sorted(merges, key=lambda m: m[0])]
    out = []
    for w in text.split():
        syms = list(w)
        for a, b in ranked:
            i, nxt = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
    # NOTE: reference applies each merge greedily left-to-right, like
    # the engine's _merge_seq
        out.extend(syms)
    return out


def test_bpe_encode_matches_reference_and_is_partition_invariant(ray_session):
    texts = [
        "low lower lowest low",
        "new newer newest new new",
        "wider wide widest",
        "",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    merges = bpe_train(ds, num_merges=6, min_count=1, num_shards=4)
    assert len(merges) == 6
    for parts in (1, 3):
        enc = (
            bpe_encode(ray.data.from_pandas(df).repartition(parts), merges)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        for _, row in enc.iterrows():
            want = ref_encode(texts[int(row["doc_id"])], merges)
            assert row["tokens"].split() == want if want else row["tokens"] == ""
            assert row["n_tokens"] == len(want)


def _random_orthogonal(d, rng):
    q, r = np.linalg.qr(rng.normal(size=(d, d)))
    return q * np.sign(np.diag(r))


def test_procrustes_recovers_planted_rotation(ray_session):
    rng = np.random.default_rng(17)
    d, n = 8, 400
    a = rng.normal(size=(n, d))
    r = _random_orthogonal(d, rng)
    b = a @ r
    df = pd.DataFrame({"a": list(map(list, a)), "b": list(map(list, b))})
    for parts in (1, 5):
        w = procrustes_fit(ray.data.from_pandas(df).repartition(parts))
        assert np.abs(w - r).max() < 1e-8, parts
    # apply: aligned A matches B
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, a))})
    )
    out = procrustes_apply(ds, w, "embedding").to_pandas()
    got = np.asarray(out.sort_values("vec_id")["aligned"].tolist())
    assert np.abs(got - b).max() < 1e-8


def test_procrustes_empty_raises(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"a": [], "b": []}))
    with pytest.raises(ValueError):
        procrustes_fit(ds)
