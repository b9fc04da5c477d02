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


def test_prune_vocab_bounds_and_mass():
    from cardinalityestimation_ray.pipelines.lm_score import prune_vocab

    counts = pd.DataFrame({"token": [f"t{i}" for i in range(100)],
                           "cnt": np.r_[np.full(10, 50),
                                        np.ones(90, dtype=int)]})
    kept, dropped = prune_vocab(counts, min_count=2)
    assert len(kept) == 10 and dropped == 90
    # hard cap, deterministic tie-break (cnt desc, token asc)
    kept2, dropped2 = prune_vocab(counts, max_vocab=5)
    assert list(kept2["token"]) == ["t0", "t1", "t2", "t3", "t4"]
    assert dropped2 == 5 * 50 + 90
    # min_count alone bounds size by total/min_count
    total = counts["cnt"].sum()
    kept3, _ = prune_vocab(counts, min_count=3)
    assert len(kept3) <= total // 3


def test_nll_bounded_broadcast_high_vocab_corpus(_ray):
    """Synthetic high-vocab corpus: every doc contributes unique gibberish
    plus common glue words. min_count prunes the broadcast table to the
    glue vocabulary (pinned size bound) and the pruned mass becomes the
    OOV bucket; scores match a per-document Python reference of the SAME
    folded model."""
    from cardinalityestimation_ray.pipelines.lm_score import prune_vocab

    rng = np.random.default_rng(5)
    n_docs = 60
    texts = []
    for i in range(n_docs):
        gib = " ".join(f"xq{i}_{j}" for j in range(int(rng.integers(2, 6))))
        texts.append(f"the quick {gib} fox")
    ds = _docs_ds(texts)
    counts = unigram_counts(ds)
    min_count = 5
    kept, dropped = prune_vocab(counts, min_count=min_count)
    # the size bound the docstring promises
    assert len(kept) <= counts["cnt"].sum() // min_count
    assert set(kept["token"]) == {"the", "quick", "fox"}

    got = (doc_unigram_nll(ds, min_count=min_count).to_pandas()
           .set_index("doc_id"))
    total = counts["cnt"].sum()
    n_pruned = len(counts) - len(kept)
    lp = {t: math.log(c / total) for t, c in zip(kept["token"], kept["cnt"])}
    # per-TYPE OOV mass (uniform over pruned types): each OOV token must
    # score LESS probable than every kept token, or the quality filter
    # inverts (review finding)
    oov = math.log(dropped / n_pruned / total)
    assert oov < min(lp.values())
    for i, x in enumerate(texts):
        toks = x.split()
        want = -sum(lp.get(t, oov) for t in toks) / len(toks)
        assert got.loc[i, "avg_nll"] == pytest.approx(want)
    # gibberish-heavy docs must score a HIGHER avg_nll than a pure
    # common-word doc would under the same model
    common_nll = -sum(lp[t] for t in ("the", "quick", "fox")) / 3
    assert got["avg_nll"].min() > common_nll


def test_nll_pruning_that_drops_nothing_keeps_loud_contract(_ray):
    """min_count that prunes zero types must not silently disable the
    unseen-token raise for foreign-corpus scoring (review finding)."""
    train = _docs_ds(["aa aa bb bb"])  # every token has count 2
    counts = unigram_counts(train)
    foreign = _docs_ds(["aa zz"])
    with pytest.raises(Exception, match="not in the unigram table"):
        doc_unigram_nll(foreign, counts=counts, min_count=2).to_pandas()


def test_nll_max_vocab_and_explicit_oov(_ray):
    ds = _docs_ds(TEXTS)
    got = (doc_unigram_nll(ds, max_vocab=2, oov_logprob=-10.0)
           .to_pandas().set_index("doc_id"))
    counts = unigram_counts(ds)
    from cardinalityestimation_ray.pipelines.lm_score import prune_vocab
    kept, _ = prune_vocab(counts, max_vocab=2)
    total = counts["cnt"].sum()
    lp = {t: math.log(c / total) for t, c in zip(kept["token"], kept["cnt"])}
    for i, x in enumerate(TEXTS):
        toks = x.split()
        if not toks:
            continue
        want = -sum(lp.get(t, -10.0) for t in toks) / len(toks)
        assert got.loc[i, "avg_nll"] == pytest.approx(want)
