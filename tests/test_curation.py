"""End-to-end curation chain: planted duplicates deduped, eval docs and
their near-matches decontaminated, band filter applied on the DEDUPED
corpus, survivors get a valid shuffle permutation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cardinalityestimation_ray.pipelines.curation import curate_corpus


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _make_docs():
    # 40 docs: ids 0..39. Pairs (i, i+20) for i in 0..4 share identical
    # text (dedup must keep the smaller id). Doc 10 IS the eval text.
    # Doc 11 shares a trigram with it (contaminated). Docs 30..34 are
    # one-word docs (very short -> below the length band).
    texts = {}
    for i in range(40):
        texts[i] = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
    for i in range(5):
        texts[20 + i] = texts[i]
    texts[10] = "secret eval trigram here now please keep away"
    texts[11] = "prefix words then secret eval trigram tail tokens"
    for i in range(30, 35):
        texts[i] = "tiny"
    return texts


def test_curation_chain(_ray):
    import ray.data

    texts = _make_docs()
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [texts[i] for i in range(40)],
        "n_chars": [len(texts[i]) for i in range(40)],
    })

    def docs():
        return ray.data.from_pandas(df).repartition(3)

    out = (curate_corpus(docs(), eval_texts=[texts[10]], q_low=0.2,
                         q_high=1.0, ngram=3, seed=3, n_shards=4)
           .to_pandas().sort_values("doc_id"))
    kept = set(out["doc_id"])

    assert not kept & {20, 21, 22, 23, 24}  # duplicate pair: larger id out
    assert {0, 1, 2, 3, 4} <= kept          # ...smaller id survives
    assert 10 not in kept                   # eval doc itself dropped
    assert 11 not in kept                   # shared-trigram doc dropped
    assert not kept & set(range(30, 35))    # short docs below the band
    assert sorted(out["shuffle_pos"]) == list(range(len(out)))
    assert set(out["shard"]) <= {0, 1, 2, 3}


def test_curation_empty_eval_set(_ray):
    import ray.data

    df = pd.DataFrame({
        "doc_id": np.arange(6),
        "text": [f"w{i} x{i} y{i} z{i}" for i in range(6)],
        "n_chars": [15] * 6,
    })

    def docs():
        return ray.data.from_pandas(df)

    out = curate_corpus(docs(), eval_texts=[], q_low=0.0, q_high=1.0,
                        seed=0).to_pandas()
    assert sorted(out["doc_id"]) == list(range(6))


def test_curate_and_write_resumable(_ray, tmp_path):
    import os

    import ray.data

    from cardinalityestimation_ray.pipelines.curation import (
        curate_and_write,
    )

    texts = _make_docs()
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [texts[i] for i in range(40)],
        "n_chars": [len(texts[i]) for i in range(40)],
    })

    def docs():
        return ray.data.from_pandas(df)

    out = str(tmp_path / "curated")
    manifest = curate_and_write(docs(), [texts[10]], out, q_low=0.2,
                                q_high=1.0, ngram=3, seed=3, n_shards=4)
    assert manifest["n_files"] >= 1
    shards = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert shards  # hive-style shard directories
    back = ray.data.read_parquet(out).to_pandas()
    want = (curate_corpus(docs(), [texts[10]], q_low=0.2, q_high=1.0,
                          ngram=3, seed=3, n_shards=4)
            .to_pandas())
    assert sorted(back["doc_id"]) == sorted(want["doc_id"])

    # rerun: complete output is skipped (manifest returned unchanged)
    again = curate_and_write(docs(), [texts[10]], out, q_low=0.2,
                             q_high=1.0, ngram=3, seed=3, n_shards=4)
    assert again == manifest


def test_curate_and_write_param_mismatch_raises(_ray, tmp_path):
    import ray.data

    from cardinalityestimation_ray.pipelines.curation import (
        curate_and_write,
    )

    texts = _make_docs()
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [texts[i] for i in range(40)],
        "n_chars": [len(texts[i]) for i in range(40)],
    })

    def docs():
        return ray.data.from_pandas(df)

    out = str(tmp_path / "curated2")
    curate_and_write(docs(), [], out, q_low=0.0, q_high=1.0, ngram=3,
                     seed=3, n_shards=4)
    # same params -> skip (no error)
    curate_and_write(docs(), [], out, q_low=0.0, q_high=1.0, ngram=3,
                     seed=3, n_shards=4)
    # changed seed -> loud refusal, not stale reuse (review fix)
    with pytest.raises(ValueError, match="DIFFERENT curation parameters"):
        curate_and_write(docs(), [], out, q_low=0.0, q_high=1.0, ngram=3,
                         seed=4, n_shards=4)
    # changed eval set -> same refusal
    with pytest.raises(ValueError, match="DIFFERENT curation parameters"):
        curate_and_write(docs(), [texts[10]], out, q_low=0.0, q_high=1.0,
                         ngram=3, seed=3, n_shards=4)


def test_curation_funnel_counts(_ray):
    import ray.data

    from cardinalityestimation_ray.pipelines.curation import curation_funnel

    texts = _make_docs()
    df = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [texts[i] for i in range(40)],
        "n_chars": [len(texts[i]) for i in range(40)],
    })
    got = curation_funnel(ray.data.from_pandas(df), [texts[10]],
                          q_low=0.2, q_high=1.0, ngram=3)
    counts = dict(zip(got["stage"], got["n_docs"]))
    assert counts["input"] == 40
    # 5 planted duplicate pairs + the five identical "tiny" docs (4 extra
    # copies) collapse: 40 - 5 - 4 = 31
    assert counts["dedup"] == 31
    assert counts["length_band"] < counts["dedup"]  # short docs cut
    assert counts["decontaminated"] == counts["length_band"] - 2  # 10, 11
    assert got["stage"].tolist() == ["input", "dedup", "length_band",
                                     "decontaminated"]


def test_fingerprint_normalizes_defaults():
    """A rerun that spells out default values fingerprints identically to
    one that omitted them (advisor fix), and unknown knobs raise."""
    from cardinalityestimation_ray.pipelines.curation import (
        _curation_params_fingerprint,
    )

    implicit = _curation_params_fingerprint(["ev"], {})
    explicit = _curation_params_fingerprint(
        ["ev"], {"ngram": 13, "seed": 0, "n_shards": 8, "q_low": 0.05,
                 "q_high": 0.95, "text_column": "text",
                 "id_column": "doc_id", "length_column": "n_chars"})
    assert implicit == explicit

    changed = _curation_params_fingerprint(["ev"], {"ngram": 7})
    assert changed != implicit

    import pytest as _pytest
    with _pytest.raises(TypeError, match="unknown curation parameter"):
        _curation_params_fingerprint(["ev"], {"ngarm": 13})


def test_old_format_params_record_still_resumes(_ray, tmp_path):
    """_PARAMS.json written before defaults-normalization recorded only the
    explicit kwargs; an identical rerun must upgrade it, not raise
    'DIFFERENT curation parameters' (review finding #4)."""
    import json
    import os

    import ray.data

    from cardinalityestimation_ray.pipelines.curation import curate_and_write

    texts = [f"doc number {i} words here" for i in range(30)]
    docs = lambda: ray.data.from_pandas(pd.DataFrame({  # noqa: E731
        "doc_id": np.arange(len(texts)), "text": texts,
        "n_chars": [len(t) for t in texts]}))
    out = str(tmp_path / "old_params")
    curate_and_write(docs(), [], out, ngram=3, n_shards=2)
    # rewrite _PARAMS.json in the OLD format (explicit kwargs only)
    p = os.path.join(out, "_PARAMS.json")
    with open(p) as f:
        full = json.load(f)
    old = {"ngram": 3, "n_shards": 2,
           "eval_set_hash": full["eval_set_hash"],
           "n_eval_texts": full["n_eval_texts"]}
    with open(p, "w") as f:
        json.dump(old, f)
    # identical rerun (defaults spelled or not) must resume, not raise
    manifest = curate_and_write(docs(), [], out, ngram=3, n_shards=2)
    assert manifest is not None
    # a DIFFERENT parameterization must still raise
    import pytest as _pytest
    with _pytest.raises(ValueError, match="DIFFERENT curation"):
        curate_and_write(docs(), [], out, ngram=5, n_shards=2)
