"""Eval-set n-gram decontamination."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def corpus_df():
    # doc 0: fully inside the eval text; doc 1: shares one trigram;
    # doc 2: clean; doc 3: too short for any trigram
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox jumps",
            "xx yy the quick brown zz",
            "completely different words here",
            "two tokens",
        ],
    })


EVAL = ["the quick brown fox jumps over the lazy dog"]


def test_decontaminate_report(ray_session, corpus_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.decontamination import (
        decontaminate,
    )

    ds = ray.data.from_pandas(corpus_df).repartition(2)
    out = decontaminate(ds, EVAL, n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_grams"].tolist() == [3, 4, 2, 0]
    # doc0: all 3 trigrams in eval; doc1: only "the quick brown"
    assert out["n_matched"].tolist() == [3, 1, 0, 0]
    assert out["contaminated"].tolist() == [True, True, False, False]


def test_decontaminated_corpus_drops_flagged(ray_session, corpus_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.decontamination import (
        decontaminated_corpus,
    )

    ds = ray.data.from_pandas(corpus_df).repartition(2)
    clean = decontaminated_corpus(ds, EVAL, n=3).to_pandas()
    assert sorted(clean["doc_id"]) == [2, 3]


def test_empty_eval_and_empty_corpus(ray_session, corpus_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.decontamination import (
        decontaminate,
        eval_gram_set,
    )

    assert len(eval_gram_set([], 3)) == 0
    ds = ray.data.from_pandas(corpus_df)
    out = decontaminate(ds, [], n=3).to_pandas()
    assert (~out["contaminated"]).all()
    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object")}))
    assert len(decontaminate(empty, EVAL, n=3).to_pandas()) == 0


def test_duplicate_grams_count_once_per_doc(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.decontamination import (
        decontaminate,
    )

    df = pd.DataFrame({
        "doc_id": [7],
        "text": ["a b c a b c a b c"],  # trigram "a b c" occurs 3 times
    })
    out = decontaminate(ray.data.from_pandas(df), ["a b c"], n=3).to_pandas()
    # distinct trigrams of the doc: a b c / b c a / c a b -> 3 sliding
    # windows worth of DISTINCT grams, each counted once
    assert out["n_grams"].iloc[0] == 3
    assert out["n_matched"].iloc[0] == 1
