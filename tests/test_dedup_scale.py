"""Degenerate-LSH-bucket bounds (round-2 VERDICT item #1).

Mass duplication is the norm in web crawl — boilerplate pages and mirrors
pile into one LSH bucket. These tests assert the verify stage stays bounded
(identical-signature collapse + star pairs + sorted-window cap) while
union-find chaining preserves full cluster recall.
"""

import time

import numpy as np
import pandas as pd

from cardinalityestimation_ray.pipelines.dedup import (
    _union_find_clusters,
    _verify_minhash_bucket,
    _verify_simhash_bucket,
)
from cardinalityestimation_ray.stages.dedup import (
    collapse_identical_rows,
    hamming_distance_u64,
    pairwise_candidates_est,
    pairwise_candidates_hamming,
    windowed_candidates_est,
    windowed_candidates_hamming,
)


def _brute_pairs_est(sigs, min_est):
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if np.mean(sigs[i] == sigs[j]) >= min_est:
                out.add((i, j))
    return out


def test_collapse_identical_rows_groups_and_reps():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**63, size=(3, 4), dtype=np.uint64)
    mat = np.vstack([base[0], base[1], base[0], base[2], base[0]])
    order, starts, counts = collapse_identical_rows(mat)
    groups = {tuple(sorted(order[s:s + c])) for s, c in zip(starts, counts)}
    assert groups == {(0, 2, 4), (1,), (3,)}
    # representative = first (lowest original index) member of each group
    reps = {int(order[s]) for s in starts}
    assert reps == {0, 1, 3}


def test_pairwise_candidates_est_matches_brute():
    rng = np.random.default_rng(1)
    # 40 sigs in 8 near-dup clusters of 5 (each cluster shares 75% of slots)
    p = 16
    sigs = []
    for c in range(8):
        proto = rng.integers(0, 2**63, size=p, dtype=np.uint64)
        for _ in range(5):
            s = proto.copy()
            flip = rng.choice(p, size=4, replace=False)
            s[flip] = rng.integers(0, 2**63, size=4, dtype=np.uint64)
            sigs.append(s)
    U = np.stack(sigs)
    ii, jj, est = pairwise_candidates_est(U, 0.5, row_chunk=7)
    got = set(zip(ii.tolist(), jj.tolist()))
    assert got == _brute_pairs_est(U, 0.5)
    assert np.all(est >= 0.5)
    assert np.all(ii < jj)


def test_windowed_candidates_est_bounded_and_recalls_identical_prefix():
    rng = np.random.default_rng(2)
    p = 8
    m = 500
    # pairs of near-identical sigs share slot 0 -> sort-adjacent
    U = rng.integers(0, 2**63, size=(m, p), dtype=np.uint64)
    U[1::2] = U[0::2]
    U[1::2, -1] += 1  # near-identical: 7/8 slots agree
    ii, jj, est = windowed_candidates_est(U, 0.8, window=4)
    got = {(min(a, b), max(a, b)) for a, b in zip(ii.tolist(), jj.tolist())}
    expect = {(2 * k, 2 * k + 1) for k in range(m // 2)}
    assert expect <= got
    # output bounded by m * window, not m^2
    assert len(ii) <= m * 4


def test_pairwise_candidates_hamming_matches_brute():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, size=60, dtype=np.uint64)
    h[1::3] = h[0::3][: len(h[1::3])] ^ np.uint64(0b101)  # distance 2
    ii, jj, d = pairwise_candidates_hamming(h, 3, row_chunk=17)
    got = set(zip(ii.tolist(), jj.tolist()))
    brute = set()
    for i in range(len(h)):
        dd = hamming_distance_u64(np.full(len(h) - i - 1, h[i]), h[i + 1:])
        for off, dist in enumerate(dd):
            if dist <= 3:
                brute.add((i, i + 1 + off))
    assert got == brute
    assert np.all(d <= 3)


def test_windowed_candidates_hamming_finds_close_sorted_neighbors():
    rng = np.random.default_rng(4)
    h = rng.integers(0, 2**62, size=300, dtype=np.uint64)
    h[1::2] = h[0::2] ^ np.uint64(1)  # distance 1, numerically adjacent
    ii, jj, d = windowed_candidates_hamming(h, 2, window=3)
    got = {(min(a, b), max(a, b)) for a, b in zip(ii.tolist(), jj.tolist())}
    assert {(2 * k, 2 * k + 1) for k in range(150)} <= got


def test_minhash_bucket_identical_pile_is_star_and_bounded():
    """10^5 identical signatures: verify must emit O(n) star pairs (not
    O(n^2)) in bounded time, and union-find must recover ONE cluster."""
    n = 100_000
    p = 16
    rng = np.random.default_rng(5)
    sig = rng.integers(0, 2**63, size=p, dtype=np.uint64)
    sigs = np.broadcast_to(sig, (n, p)).copy()
    ids = np.arange(10, 10 + n, dtype=np.int64)
    t0 = time.monotonic()
    out = _verify_minhash_bucket(
        ids, sigs, None, threshold=0.7, verify="signature",
        max_bucket=512, window=64, identical_cap=64)
    elapsed = time.monotonic() - t0
    assert elapsed < 10.0  # was O(n^2) = 5e9 pair iterations before the cap
    assert len(out) == n - 1  # star: min-id rep vs every other member
    labels = _union_find_clusters(out)
    roots = {labels[i] for i in ids.tolist()}
    assert roots == {10}


def test_minhash_bucket_small_identical_group_keeps_all_pairs():
    """Groups <= identical_cap keep exact all-pairs semantics (the
    exact_dup_pairs oracle relies on the full self-join pair set)."""
    p = 8
    rng = np.random.default_rng(6)
    sig = rng.integers(0, 2**63, size=p, dtype=np.uint64)
    sigs = np.broadcast_to(sig, (4, p)).copy()
    ids = np.array([3, 7, 11, 20], dtype=np.int64)
    out = _verify_minhash_bucket(
        ids, sigs, None, threshold=0.9, verify="signature",
        max_bucket=512, window=64, identical_cap=64)
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(3, 7), (3, 11), (3, 20), (7, 11), (7, 20), (11, 20)}
    assert (out["similarity"] == 1.0).all()


def test_minhash_bucket_matches_brute_on_mixed_bucket():
    """New vectorized verify == old O(k^2) semantics on a mixed bucket
    (unique signatures, below every cap)."""
    rng = np.random.default_rng(7)
    p = 16
    k = 30
    sigs = rng.integers(0, 2**63, size=(k, p), dtype=np.uint64)
    for j in range(0, k, 3):  # make near-dups
        if j + 1 < k:
            sigs[j + 1] = sigs[j]
            sigs[j + 1, :3] = rng.integers(0, 2**63, size=3, dtype=np.uint64)
    ids = np.arange(k, dtype=np.int64) * 7
    out = _verify_minhash_bucket(
        ids, sigs, None, threshold=0.7, verify="signature",
        max_bucket=512, window=64, identical_cap=64)
    got = set(zip(out["id_a"], out["id_b"]))
    brute = set()
    for i in range(k):
        for j in range(i + 1, k):
            if np.mean(sigs[i] == sigs[j]) >= 0.7:
                brute.add((int(ids[i]), int(ids[j])))
    assert got == brute


def test_minhash_bucket_windowed_cap_preserves_near_dup_recall():
    """Above max_bucket unique signatures the windowed path still finds
    sort-adjacent near-dups."""
    rng = np.random.default_rng(8)
    p = 8
    m = 2000  # > max_bucket=512
    sigs = rng.integers(0, 2**63, size=(m, p), dtype=np.uint64)
    sigs[1::2] = sigs[0::2]
    sigs[1::2, -1] = rng.integers(0, 2**63, size=m // 2, dtype=np.uint64)
    ids = np.arange(m, dtype=np.int64)
    t0 = time.monotonic()
    out = _verify_minhash_bucket(
        ids, sigs, None, threshold=0.8, verify="signature",
        max_bucket=512, window=8, identical_cap=64)
    assert time.monotonic() - t0 < 5.0
    got = set(zip(out["id_a"], out["id_b"]))
    expect = {(2 * k, 2 * k + 1) for k in range(m // 2)}
    assert expect <= got


def test_simhash_bucket_identical_pile_star_and_cross():
    n = 50_000
    rng = np.random.default_rng(9)
    base = rng.integers(0, 2**62, size=1, dtype=np.uint64)[0]
    hashes = np.full(n, base, dtype=np.uint64)
    hashes[-1] = base ^ np.uint64(0b11)  # one distance-2 outlier
    ids = np.arange(n, dtype=np.int64)
    t0 = time.monotonic()
    out = _verify_simhash_bucket(
        ids, hashes, max_hamming=3, max_bucket=2048, window=64,
        identical_cap=64)
    assert time.monotonic() - t0 < 10.0
    assert len(out) == (n - 2) + 1  # star over the pile + rep-vs-outlier
    labels = _union_find_clusters(out)
    assert {labels[i] for i in range(n)} == {0}


def test_minhash_dedup_end_to_end_identical_pile(ray_session):
    """End-to-end Ray run: 10^5 identical docs complete the pair stage in
    bounded time and all cluster to the min doc_id (VERDICT done-criterion)."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        minhash_dedup_keep,
    )

    n = 100_000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["the same boilerplate page body repeated everywhere " * 3] * n,
    })
    ds = ray.data.from_pandas(df).repartition(8)
    t0 = time.monotonic()
    keep = minhash_dedup_keep(ds, num_perm=16, num_bands=4, threshold=0.7)
    elapsed = time.monotonic() - t0
    assert elapsed < 120.0
    assert len(keep) == n
    assert (keep["cluster_id"] == 0).all()
    assert keep["keep"].sum() == 1
    assert bool(keep.loc[keep["doc_id"] == 0, "keep"].iloc[0])


def test_connected_components_matches_union_find(ray_session):
    """Distributed min-label propagation == driver union-find on a random
    pair graph with chains, stars, and singleton pairs."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        connected_components,
    )

    rng = np.random.default_rng(11)
    pairs = []
    # chains (worst case for propagation, exercises pointer jumping)
    base = 0
    for chain_len in (2, 5, 37, 101):
        for i in range(chain_len - 1):
            pairs.append((base + i, base + i + 1))
        base += chain_len + 3
    # stars
    for center in (1000, 2000):
        for i in range(1, 40):
            pairs.append((center, center + i))
    # random extra edges within a block (merges some clusters)
    nodes = rng.integers(3000, 3200, size=150)
    for a, b in zip(nodes[::2], nodes[1::2]):
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"]).astype("int64")

    labels = connected_components(
        ray.data.from_pandas(df).repartition(4)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))

    uf = _union_find_clusters(df)
    all_nodes = set(df["id_a"]) | set(df["id_b"])
    expect = {n: uf.get(n, n) for n in all_nodes}
    assert got == expect


def test_minhash_keep_distributed_equals_union_find(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        minhash_dedup_keep,
        minhash_dedup_keep_distributed,
    )

    rng = np.random.default_rng(0)
    vocab = [f"word{i}" for i in range(500)]
    docs, ids = [], []
    for i in range(120):
        docs.append(" ".join(rng.choice(vocab, size=60)))
        ids.append(i)
    for j in range(10):  # exact dup clusters of 3
        docs.append(docs[j]); ids.append(1000 + j)
        docs.append(docs[j]); ids.append(2000 + j)
    df = pd.DataFrame({"doc_id": ids, "text": docs})

    def make():
        return ray.data.from_pandas(df).repartition(4)

    uf = minhash_dedup_keep(make(), threshold=0.6)
    dist = minhash_dedup_keep_distributed(make(), threshold=0.6)
    uf_s = uf.sort_values("doc_id").reset_index(drop=True)
    di_s = dist.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(uf_s, di_s, check_dtype=False)


def test_connected_components_empty(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        connected_components,
    )

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    labels = connected_components(ray.data.from_pandas(empty)).to_pandas()
    assert len(labels) == 0


def test_pairs_to_clusters_generic_and_mode_wrappers(ray_session):
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        pairs_to_clusters,
        simhash_dedup_keep,
    )

    # generic: custom pair frame with two clusters
    pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    out = pairs_to_clusters(pairs)
    assert dict(zip(out["doc_id"], out["cluster_id"])) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert out[out["keep"]]["doc_id"].tolist() == [1, 10]
    # empty
    empty = pairs_to_clusters(pd.DataFrame({"id_a": [], "id_b": []}))
    assert len(empty) == 0

    # simhash wrapper end-to-end on planted exact dups
    rng = np.random.default_rng(3)
    vocab = [f"word{i}" for i in range(300)]
    docs = [" ".join(rng.choice(vocab, size=50)) for _ in range(60)]
    ids = list(range(60))
    for j in range(4):
        docs.append(docs[j]); ids.append(100 + j)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": docs})).repartition(4)
    keep = simhash_dedup_keep(ds, max_hamming=3)
    dup = keep[keep["doc_id"] >= 100]
    assert len(dup) == 4
    assert (~dup["keep"]).all()


def test_cc_label_invariant_raises_on_corruption():
    """A corrupted/partial label partition (an edge endpoint with no label
    row in its bucket) must raise, not fabricate a neighbor's label via a
    clipped index (round-3 verdict fix #6)."""
    import numpy as np
    import pytest

    from cardinalityestimation_ray.pipelines.dedup import (
        _bucket_label_lookup,
    )

    lnodes = np.array([1, 3, 5], dtype=np.int64)
    lvals = np.array([1, 1, 5], dtype=np.int64)

    # healthy bucket: every endpoint has its label row
    got = _bucket_label_lookup(lnodes, lvals, np.array([3, 1, 5]), 0)
    assert got.tolist() == [1, 1, 5]

    # endpoint 4 missing (mid-range), endpoint 9 missing (past the end)
    for bad in ([4], [9], [1, 9]):
        with pytest.raises(ValueError, match="label invariant violated"):
            _bucket_label_lookup(lnodes, lvals,
                                 np.array(bad, dtype=np.int64), 7)

    # empty label partition with edges present
    with pytest.raises(ValueError, match="label invariant violated"):
        _bucket_label_lookup(np.array([], dtype=np.int64),
                             np.array([], dtype=np.int64),
                             np.array([2], dtype=np.int64), 3)


def _rand_texts(rng, n, *, vocab=("aa", "bb", "cc", "dd", "word", "x")):
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 12))
        out.append(" ".join(rng.choice(vocab, size=k)) if k else
                   ["", "  ", "\t"][int(rng.integers(0, 3))])
    return out


def test_batched_jaccard_matches_scalar_kernels():
    """doc_distinct_grams + batched_pair_jaccard == the scalar per-pair
    kernels on ascii text, across char/word modes, including empty,
    whitespace-only, and shorter-than-shingle docs (the max(1,...) whole-
    text fallback)."""
    from cardinalityestimation_ray.pipelines.dedup import _text_sim
    from cardinalityestimation_ray.stages.dedup import (
        batched_pair_jaccard,
        doc_distinct_grams,
    )

    rng = np.random.default_rng(7)
    texts = _rand_texts(rng, 40) + [
        "", " ", "ab", "abcdefgh", "abcdefgh", "one two three four five",
        "one two three four five", "one two", "one two",
    ]
    n = len(texts)
    ii, jj = np.triu_indices(n, k=1)
    for verify, ngram in [("char_ngram", 8), ("char_ngram", 3),
                          ("word_ngram", 8)]:
        grams, indptr = doc_distinct_grams(texts, verify=verify, ngram=ngram)
        got = batched_pair_jaccard(grams, indptr, ii, jj)
        want = np.array([_text_sim(texts[a], texts[b], verify, ngram)
                         for a, b in zip(ii, jj)])
        np.testing.assert_allclose(got, want, atol=0, rtol=0,
                                   err_msg=f"{verify} ngram={ngram}")


def test_batched_jaccard_empty_pairs_and_repeated_docs():
    from cardinalityestimation_ray.stages.dedup import (
        batched_pair_jaccard,
        doc_distinct_grams,
    )

    grams, indptr = doc_distinct_grams(["abcdefghij", "abcdefghij", "zzz"],
                                       verify="char_ngram", ngram=4)
    assert len(batched_pair_jaccard(grams, indptr, np.array([], int),
                                    np.array([], int))) == 0
    # the same doc appearing in many pairs
    sim = batched_pair_jaccard(grams, indptr,
                               np.array([0, 0, 1]), np.array([1, 2, 2]))
    assert sim[0] == 1.0 and sim[1] == 0.0 and sim[2] == 0.0


def test_minhash_verify_stage_is_batched_and_fast():
    """10^4-candidate bucket: the exact-text verify must run vectorized —
    a per-pair Python loop at this size takes multiple seconds; the batched
    kernel should stay well under one (generous bound for the noisy box)."""
    rng = np.random.default_rng(3)
    base = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], size=40))
    n = 144  # ~10^4 candidate pairs after banding collapse
    texts = np.array([base + f" tail{i % 3}" for i in range(n)], dtype=object)
    ids = np.arange(n, dtype=np.int64)
    sigs = np.zeros((n, 16), dtype=np.uint64)
    sigs[:, 0] = np.arange(n)  # all unique -> C(144,2) ~ 10^4 cross pairs
    # warm-up: this box page-faults for SECONDS on first large allocations
    # (NOTES.md environment quirk) — and its per-core speed oscillates ~30x
    # on minute timescales, so interleave the scalar calibration AROUND the
    # batched runs and compare best-of-3 batched vs the SLOWER scalar
    # sample: a throttle phase that hits only one side can't invert the
    # bound.
    from cardinalityestimation_ray.pipelines.dedup import _text_sim
    n_pairs = 144 * 143 // 2

    def scalar_slice_est():
        t0 = time.perf_counter()
        for k in range(200):
            _text_sim(texts[k % n], texts[(k * 7 + 1) % n], "char_ngram", 8)
        return (time.perf_counter() - t0) / 200 * n_pairs

    est_before = scalar_slice_est()
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = _verify_minhash_bucket(
            ids, sigs, texts, threshold=0.5, verify="char_ngram", ngram=8,
            max_bucket=4096, window=64, identical_cap=4096)
        dts.append(time.perf_counter() - t0)
    est_after = scalar_slice_est()
    dt = min(dts)
    scalar_est = max(est_before, est_after)
    assert res is not None and len(res) > 5000
    assert dt < max(scalar_est / 3, 1.0), \
        f"batched verify {dt:.2f}s vs scalar-loop estimate {scalar_est:.2f}s"


def test_batched_jaccard_matches_scalar_on_non_ascii():
    """Char mode counts CHARACTERS like the scalar kernel (non-ascii docs
    take the per-doc char-space path; ascii grams shared across paths
    still hash-match), and word mode splits on Unicode whitespace like
    str.split() (review findings #1/#2)."""
    from cardinalityestimation_ray.pipelines.dedup import _text_sim
    from cardinalityestimation_ray.stages.dedup import (
        batched_pair_jaccard,
        doc_distinct_grams,
    )

    texts = [
        "日本語テキス",              # 6 chars / 18 bytes
        "日本語テキト",              # the review finding's pair
        "日本語テキストですです",     # long enough for char 8-grams
        "日本語テキストですですが",
        "a\xa0b c d",               # NBSP: str.split treats as whitespace
        "a b c d",
        "café latte au lait grande",  # combining accent
        "cafe latte au lait grande",
        "ascii only text here",
        "",
        "短い",                      # short non-ascii
        "短い",
    ]
    n = len(texts)
    ii, jj = np.triu_indices(n, k=1)
    for verify, ngram in [("char_ngram", 8), ("char_ngram", 3),
                          ("word_ngram", 3)]:
        grams, indptr = doc_distinct_grams(texts, verify=verify, ngram=ngram)
        got = batched_pair_jaccard(grams, indptr, ii, jj)
        want = np.array([_text_sim(texts[a], texts[b], verify, ngram)
                         for a, b in zip(ii, jj)])
        np.testing.assert_allclose(got, want, atol=0, rtol=0,
                                   err_msg=f"{verify} ngram={ngram}")


def test_doc_distinct_grams_rejects_null_text():
    """Null texts must raise loudly (the scalar path raised TypeError);
    silently stringifying None made null docs dedup against the literal
    string 'None' (review finding #5)."""
    import pytest

    from cardinalityestimation_ray.stages.dedup import doc_distinct_grams

    with pytest.raises(TypeError, match="null|strings"):
        doc_distinct_grams(["ok", None], verify="char_ngram", ngram=4)
    import pyarrow as pa
    with pytest.raises(TypeError, match="null"):
        doc_distinct_grams(pa.array(["ok", None]), verify="word_ngram")


def test_minhash_char_verify_end_to_end_cjk(ray_session):
    """End-to-end non-ascii pipeline: planted CJK near-dup pairs survive the
    signature prefilter AND the exact char-ngram text verify (the verify
    runs in character space — the byte-gram regression the round-4 review
    caught would mis-score these)."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import minhash_dedup_pairs
    from cardinalityestimation_ray.stages.dedup import (
        exact_jaccard_char_ngrams,
    )

    rng = np.random.default_rng(17)
    cjk = [chr(0x4E00 + i) for i in range(200)]
    base = ["".join(rng.choice(cjk, 300)) for _ in range(20)]
    texts = []
    for t in base:
        texts.append(t)
        texts.append(t[:-3] + "".join(rng.choice(cjk, 3)))  # near-dup twin
    # unrelated fillers
    texts += ["".join(rng.choice(cjk, 300)) for _ in range(20)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    pairs = minhash_dedup_pairs(ray.data.from_pandas(df).repartition(4),
                                threshold=0.8, verify="char_ngram",
                                num_perm=64, num_bands=16)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(2 * k, 2 * k + 1) for k in range(20)}
    # LSH recall on 64 perms at jaccard ~0.97 is ~certain
    assert planted <= got
    # similarity values equal the scalar char-space kernel exactly
    for _, row in pairs.iterrows():
        want = exact_jaccard_char_ngrams(texts[int(row["id_a"])],
                                         texts[int(row["id_b"])], 8)
        assert row["similarity"] == want


def test_minhash_pairs_invariant_to_block_layout(ray_session):
    """The pair set and similarity values must not depend on how the input
    is partitioned into blocks (distributed-correctness property: the
    banding shuffle re-co-locates rows regardless of source layout)."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import minhash_dedup_pairs

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(50)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(15)]
    texts = []
    for t in base:
        texts.append(t)
        texts.append(t.rsplit(" ", 2)[0] + " zz yy")  # near-dup twin
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    results = []
    for n_blocks in (1, 3, 8):
        ds = ray.data.from_pandas(df)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        pairs = minhash_dedup_pairs(ds, threshold=0.6, verify="word_ngram")
        results.append(pairs.reset_index(drop=True))
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other)
    assert len(results[0]) >= 15  # the planted twins are found


def test_embedding_identical_pile_star_band0_and_cross(ray_session):
    """Round-4 session-9 parity with the minhash/simhash bounds: a
    mass-duplicated embedding corpus (one bit-identical cluster well above
    ``identical_cap``) must emit its within-cluster pairs ONCE (min-id star
    from band 0, cosine exactly 1.0 — not C(c,2) × num_bands GEMM pairs),
    while near-duplicate DISTINCT vectors still pair through the
    representative compare."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        embedding_dedup_pairs,
    )

    rng = np.random.default_rng(21)
    c = 5_000
    base = rng.standard_normal(16).astype(np.float32)
    pile = np.tile(base, (c, 1))  # bit-identical cluster
    near = base + 1e-4 * rng.standard_normal(16).astype(np.float32)
    other = rng.standard_normal((40, 16)).astype(np.float32)
    vecs = np.vstack([pile, near[None, :], other])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(4)

    t0 = time.monotonic()
    pairs = embedding_dedup_pairs(ds, threshold=0.99, identical_cap=64)
    elapsed = time.monotonic() - t0
    assert elapsed < 60.0

    within = pairs[(pairs["id_a"] < c) & (pairs["id_b"] < c)]
    # min-id star: exactly c-1 pairs, all anchored at vec 0, cosine 1.0
    assert len(within) == c - 1
    assert (within["id_a"] == 0).all()
    assert set(within["id_b"]) == set(range(1, c))
    assert (within["cosine"] == 1.0).all()
    # the near-dup DISTINCT vector pairs with the cluster representative
    cross = pairs[pairs["id_b"] == c]
    assert list(cross["id_a"]) == [0]
    assert (cross["cosine"] >= 0.99).all()
    # no false positives into the unrelated vectors
    assert int((pairs["id_b"] > c).sum()) == 0


def test_embedding_small_identical_groups_keep_all_pairs(ray_session):
    """Identical groups at or below ``identical_cap`` keep exact all-pairs
    semantics (the planted-control contract), emitted once despite
    colliding in every band."""
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        embedding_dedup_pairs,
    )

    rng = np.random.default_rng(22)
    v0 = rng.standard_normal(16).astype(np.float32)
    v1 = rng.standard_normal(16).astype(np.float32)
    vecs = np.vstack([v0, v0, v0, v1, v1])
    df = pd.DataFrame({"vec_id": np.arange(5, dtype=np.int64),
                       "embedding": list(vecs)})
    pairs = embedding_dedup_pairs(
        ray.data.from_pandas(df).repartition(2), threshold=0.999)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    assert (pairs["cosine"] == 1.0).all()


def test_short_doc_signatures_batch_layout_invariant():
    """Round-4 session-9 review: an ALL-short batch early-returned before
    the whole-text fallback, leaving the all-MAX64 sentinel — every distinct
    short doc became a mutual duplicate, and a doc's signature depended on
    whether its batch happened to contain a long doc."""
    import pyarrow as pa

    from cardinalityestimation_ray.stages.dedup import (
        minhash_signatures,
        simhash64,
    )

    short = pa.array(["a", "zzz", "", "Q9"])
    sig = minhash_signatures(short, num_perm=16, ngram=8)
    assert len({tuple(r) for r in sig}) == 4  # distinct docs, distinct sigs
    sh = simhash64(short, ngram=4)
    assert len(set(sh.tolist())) == 4
    assert not (sh == 0).any()

    # identical short docs still collide exactly
    sh2 = simhash64(pa.array(["ab", "ab", "xy"]), ngram=4)
    assert sh2[0] == sh2[1] != sh2[2]

    # mixed batch == all-short batch for the same doc (layout invariance)
    mixed = pa.array(["a", "a long enough document body for shingles"])
    s_mixed = minhash_signatures(mixed, num_perm=16, ngram=8)
    s_alone = minhash_signatures(pa.array(["a"]), num_perm=16, ngram=8)
    assert (s_mixed[0] == s_alone[0]).all()
    assert simhash64(mixed, ngram=4)[0] == \
        simhash64(pa.array(["a"]), ngram=4)[0]


def test_keep_and_pairs_dataset_paths_on_1e5_pair_corpus(ray_session):
    """Round-4 VERDICT item #4: the Dataset-native keep/pair outputs on a
    corpus whose VERIFIED pair set is ~10^5 rows (82 clusters x 50
    identical docs -> 82 * C(50,2) = 100,450 pairs; 50 < identical_cap=64
    so the all-pairs regime, not the star collapse, is exercised). The
    pair set and the keep table stay Datasets end to end; the driver only
    consumes them via iter_batches/to_pandas at the edge."""
    import pyarrow as pa
    import ray.data

    from cardinalityestimation_ray.pipelines.dedup import (
        minhash_dedup_keep_ds,
        minhash_dedup_pairs_ds,
    )

    M, PER = 82, 50
    n = M * PER

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        res = ids % M
        texts = {}
        for r in np.unique(res):
            g = np.random.default_rng(55_000 + int(r))
            texts[int(r)] = " ".join(
                "".join(chr(97 + c) for c in g.integers(0, 26, size=6))
                for _ in range(25))
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array([texts[int(r)] for r in res])})

    docs = ray.data.range(n).map_batches(
        lambda b: pa.table({"doc_id": b["id"]}), batch_format="pyarrow") \
        .map_batches(synth, batch_format="pyarrow")

    pairs_ds = minhash_dedup_pairs_ds(docs, threshold=0.9)
    n_pairs = pairs_ds.count()  # consumed as a Dataset, never a frame
    assert n_pairs == M * PER * (PER - 1) // 2  # 100_450

    keep_ds = minhash_dedup_keep_ds(docs, threshold=0.9)
    # stream-consume: per-batch invariant checks, no global frame
    total = kept = 0
    for batch in keep_ds.iter_batches(batch_format="pyarrow"):
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        c = batch["cluster_id"].to_numpy(zero_copy_only=False)
        k = batch["keep"].to_numpy(zero_copy_only=False)
        assert np.array_equal(c, d % M)  # cluster = min id = residue
        assert np.array_equal(k, d == c)
        total += len(d)
        kept += int(k.sum())
    assert total == n and kept == M
