"""TF-IDF top terms: parity with a per-document Python reference across
multiple blocks, deterministic tie-breaks, k > vocab, degenerate inputs."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.tfidf import (
    document_frequencies,
    top_tfidf_terms,
)


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _docs_ds(texts, n_blocks=1):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _reference(texts, k):
    n = len(texts)
    df = Counter()
    for x in texts:
        df.update(set(x.split()))
    out = []
    for i, x in enumerate(texts):
        tf = Counter(x.split())
        scored = [(int(math.floor(c * math.log(n / df[t]) * 1e9)), t, c)
                  for t, c in tf.items()]
        scored.sort(key=lambda r: (-r[0], r[1]))
        for qs, t, c in scored[:k]:
            out.append((i, t, c, df[t], c * math.log(n / df[t])))
    return out


TEXTS = [
    "apple apple banana cherry",
    "banana banana cherry",
    "cherry date date date",
    "apple date",
    "unique",
]


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_reference_parity(_ray, n_blocks):
    ds = _docs_ds(TEXTS, n_blocks)
    got = top_tfidf_terms(ds, k=2).to_pandas()
    got = got.sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = pd.DataFrame(_reference(TEXTS, 2),
                        columns=["doc_id", "term", "tf", "df_docs", "tfidf"])
    want = want.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert got["df_docs"].tolist() == want["df_docs"].tolist()
    np.testing.assert_allclose(got["tfidf"], want["tfidf"], rtol=1e-12)


def test_document_frequencies_multi_block(_ray):
    ds = _docs_ds(TEXTS, 4)
    df = document_frequencies(ds)
    want = Counter()
    for x in TEXTS:
        want.update(set(x.split()))
    assert dict(zip(df["token"], df["df"])) == want


def test_k_exceeds_vocab(_ray):
    got = top_tfidf_terms(_docs_ds(["a b", "a"]), k=10).to_pandas()
    assert len(got[got["doc_id"] == 0]) == 2
    assert len(got[got["doc_id"] == 1]) == 1


def test_tokenless_docs_emit_nothing(_ray):
    got = top_tfidf_terms(_docs_ds(["a b c", "", "  "]), k=2).to_pandas()
    assert set(got["doc_id"]) == {0}


def test_empty_corpus(_ray):
    got = top_tfidf_terms(_docs_ds([]), k=2).to_pandas()
    assert len(got) == 0


def test_min_df_prunes_broadcast_and_skips_rare_terms(_ray):
    """High-vocab corpus: min_df bounds the broadcast DF table and rare
    terms are simply not keyword candidates (no missing-token raise)."""
    import ray.data

    from cardinalityestimation_ray.pipelines.tfidf import (
        document_frequencies,
        top_tfidf_terms,
    )

    texts = [f"common shared unique{i}a unique{i}b" for i in range(30)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts}))
    df_table = document_frequencies(ds)
    kept = df_table[df_table["df"] >= 2]
    assert set(kept["token"]) == {"common", "shared"}
    # broadcast bound: <= total (doc, term) pairs / min_df
    assert len(kept) <= df_table["df"].sum() // 2

    got = top_tfidf_terms(ds, k=4, min_df=2).to_pandas()
    assert set(got["term"]) == {"common", "shared"}
    assert (got.groupby("doc_id").size() == 2).all()


def test_max_df_frac_drops_stopwords(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.tfidf import top_tfidf_terms

    texts = ["the alpha", "the beta", "the gamma", "the delta"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts}))
    got = top_tfidf_terms(ds, k=2, max_df_frac=0.5).to_pandas()
    assert "the" not in set(got["term"])
    assert set(got["term"]) == {"alpha", "beta", "gamma", "delta"}


def test_fully_pruned_df_table_yields_empty_result(_ray):
    """Degenerate bound: pruning that empties the DF table must return an
    empty result, not crash on the empty broadcast arrays."""
    import ray.data

    from cardinalityestimation_ray.pipelines.tfidf import top_tfidf_terms

    texts = ["the the", "the cat"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts}))
    got = top_tfidf_terms(ds, k=2, min_df=99).to_pandas()
    assert len(got) == 0
