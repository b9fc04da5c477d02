"""Distributed keyed prefix sums + sequence packing."""

import numpy as np
import pandas as pd
import pytest


def _ref_pack(df, L):
    out = []
    for key, grp in df.groupby("source", sort=False):
        grp = grp.sort_values("doc_id")
        cum_prev = np.r_[0, grp["n_tok"].to_numpy().cumsum()[:-1]]
        out.append(grp.assign(seq_id=cum_prev // L, seq_offset=cum_prev % L))
    return (pd.concat(out).sort_values(["source", "doc_id"])
            .reset_index(drop=True))


@pytest.fixture
def skewed_df():
    rng = np.random.default_rng(5)
    n = 5000
    # sparse, shuffled ids; heavy key skew (90% one source)
    ids = rng.choice(10_000_000, size=n, replace=False)
    return pd.DataFrame({
        "doc_id": ids.astype(np.int64),
        "n_tok": rng.integers(1, 900, size=n).astype(np.int64),
        "source": np.where(rng.random(n) < 0.9, "big", "small"),
    })


def test_prefix_sums_match_pandas_cumsum(ray_session, skewed_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import keyed_prefix_sums

    ds = ray.data.from_pandas(skewed_df.sample(frac=1, random_state=1)) \
        .repartition(8)
    # small bucket_width forces many buckets per key (cross-bucket offsets)
    out = keyed_prefix_sums(ds, key_column="source", id_column="doc_id",
                            value_column="n_tok", bucket_width=100_000) \
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref = _ref_pack(skewed_df, 512)[["source", "doc_id", "n_tok"]].assign(
        cum_prev=lambda d: d.groupby("source")["n_tok"].cumsum() - d["n_tok"])
    ref = ref.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert (out["cum_prev"].to_numpy() == ref["cum_prev"].to_numpy()).all()


def test_pack_sequences_matches_reference(ray_session, skewed_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import pack_sequences

    ds = ray.data.from_pandas(skewed_df.sample(frac=1, random_state=2)) \
        .repartition(4)
    out = pack_sequences(ds, max_tokens=512, key_column="source",
                         id_column="doc_id", count_column="n_tok") \
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref = _ref_pack(skewed_df, 512)
    for c in ("seq_id", "seq_offset"):
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c
    # a doc longer than max_tokens occupies several sequences; the NEXT
    # doc's seq_id must account for every spanned token
    big = skewed_df[skewed_df["n_tok"] > 512]
    assert len(big) > 0  # the fixture plants n_tok up to 899


def test_select_token_budget(ray_session, skewed_df):
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import (
        select_token_budget,
    )

    ds = ray.data.from_pandas(skewed_df.sample(frac=1, random_state=3)) \
        .repartition(4)
    out = select_token_budget(
        ds, {"big": 10_000, "small": None}, default_budget=0,
        bucket_width=50_000).to_pandas()
    # reference: keep while tokens-before < budget; None = keep all
    ref = _ref_pack(skewed_df, 512)
    ref["cum_prev"] = ref.groupby("source")["n_tok"].cumsum() - ref["n_tok"]
    keep_big = ref[(ref["source"] == "big") & (ref["cum_prev"] < 10_000)]
    keep_small = ref[ref["source"] == "small"]
    assert set(out[out["source"] == "big"]["doc_id"]) == \
        set(keep_big["doc_id"])
    assert set(out[out["source"] == "small"]["doc_id"]) == \
        set(keep_small["doc_id"])
    # budget cuts mid-document: kept tokens may overshoot by at most the
    # straddler, never undershoot while docs remain
    got_big = out[out["source"] == "big"]["n_tok"].sum()
    assert got_big >= 10_000
    assert got_big - keep_big["n_tok"].iloc[-1] < 10_000


def test_pack_sequences_validation_and_empty(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import pack_sequences

    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_tok": pd.Series([], dtype="int64"),
        "source": pd.Series([], dtype="object")}))
    assert pack_sequences(empty, max_tokens=16).to_pandas().empty
    with pytest.raises(ValueError):
        pack_sequences(empty, max_tokens=0)
    strs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b"], "n_tok": [1, 2], "source": ["s", "s"]}))
    with pytest.raises(Exception, match="integral"):
        pack_sequences(strs, max_tokens=16).to_pandas()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 120),
    n_keys=st.integers(1, 4),
    bucket_width=st.sampled_from([1, 7, 64, 1 << 20]),
    id_scale=st.sampled_from([1, 13, 1000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_prefix_sums_property(ray_session, n, n_keys, bucket_width,
                              id_scale, seed):
    """Property: for ANY unique-id frame, bucket width (down to one id per
    bucket), and partitioning, cum_prev equals the pandas groupby-cumsum
    ground truth."""
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import keyed_prefix_sums

    rng = np.random.default_rng(seed)
    ids = rng.choice(n * id_scale + 1, size=n, replace=False).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": ids,
        "n_tok": rng.integers(0, 50, size=n).astype(np.int64),
        "source": rng.choice([f"k{i}" for i in range(n_keys)], size=n),
    })
    ds = ray.data.from_pandas(df.sample(frac=1, random_state=1)) \
        .repartition(min(4, n))
    out = keyed_prefix_sums(ds, key_column="source", id_column="doc_id",
                            value_column="n_tok",
                            bucket_width=bucket_width) \
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref = df.sort_values(["source", "doc_id"]).reset_index(drop=True)
    ref["cum_prev"] = ref.groupby("source")["n_tok"].cumsum() - ref["n_tok"]
    assert (out["cum_prev"].to_numpy() == ref["cum_prev"].to_numpy()).all()


def test_prefix_sums_null_keys_dropped(ray_session):
    """Null key/id rows drop (keyed-stage convention) instead of
    KeyError-ing the offset lookup (review fix)."""
    import ray.data

    from cardinalityestimation_ray.pipelines.packing import keyed_prefix_sums

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, None, 4], dtype="Int64"),
        "n_tok": [10, 20, 30, 40],
        "source": ["a", None, "a", "a"],
    })
    out = keyed_prefix_sums(ray.data.from_pandas(df), key_column="source",
                            id_column="doc_id", value_column="n_tok") \
        .to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 4]
    assert out["cum_prev"].tolist() == [0, 10]
