"""Unigram LM scoring: parity with a per-document Python reference,
cross-corpus OOV behavior, loud-miss contract, empty/degenerate inputs."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.lm_score import (
    doc_unigram_nll,
    unigram_counts,
)


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


TEXTS = ["the cat sat", "the the the", "cat cat dog", "", "  ", "solo"]


def _reference_nll(texts):
    all_toks = [t for x in texts for t in x.split()]
    cnt = Counter(all_toks)
    total = sum(cnt.values())
    out = {}
    for i, x in enumerate(texts):
        toks = x.split()
        if not toks:
            continue
        out[i] = (-sum(math.log(cnt[t] / total) for t in toks) / len(toks),
                  len(toks))
    return out


def _docs_ds(texts):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts}))


def test_counts_and_nll_match_reference(_ray):
    ds = _docs_ds(TEXTS)
    counts = unigram_counts(ds)
    want_counts = Counter(t for x in TEXTS for t in x.split())
    assert dict(zip(counts["token"], counts["cnt"])) == want_counts

    got = doc_unigram_nll(ds).to_pandas().set_index("doc_id")
    want = _reference_nll(TEXTS)
    assert set(got.index) == set(want)
    for i, (nll, n) in want.items():
        assert got.loc[i, "n_tokens"] == n
        assert got.loc[i, "avg_nll"] == pytest.approx(nll)


def test_cross_corpus_oov(_ray):
    train = _docs_ds(["a a b"])
    counts = unigram_counts(train)
    score = _docs_ds(["a zzz"])
    got = doc_unigram_nll(score, counts, oov_logprob=-20.0).to_pandas()
    want = -(math.log(2 / 3) + (-20.0)) / 2
    assert got["avg_nll"].iloc[0] == pytest.approx(want)


def test_unseen_token_raises_without_floor(_ray):
    counts = unigram_counts(_docs_ds(["a a b"]))
    with pytest.raises(Exception, match="oov_logprob"):
        doc_unigram_nll(_docs_ds(["zzz"]), counts).to_pandas()


def test_empty_and_tokenless_docs_dropped(_ray):
    got = doc_unigram_nll(_docs_ds(["x y", "", "   "])).to_pandas()
    assert got["doc_id"].tolist() == [0]


def test_empty_corpus(_ray):
    got = doc_unigram_nll(_docs_ds([])).to_pandas()
    assert len(got) == 0
