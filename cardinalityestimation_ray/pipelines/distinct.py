"""Distinct-count pipelines (the flagship: EP1/EP2 lifted onto Ray Data).

Every pipeline is: tokens Dataset -> stateless vectorized partial-sketch
map_batches -> tiny merge stage. The raw corpus is never shuffled; only
KB-scale sketch partials move (SURVEY.md §7.3)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..sketches import hashing
from ..sketches.hll import HyperLogLog
from ..stages.sketch_stages import (
    HllColumnPartials,
    HllTokenPartials,
    hll_merge_aggregate,
    tree_merge_keyed_partials,
)


def _keyed_result_frame(merged: dict, key_column: str, estimate_name: str,
                        count_name: str) -> pd.DataFrame:
    keys = sorted(merged)
    return pd.DataFrame(
        {
            key_column: keys,
            estimate_name: [merged[k][0].estimate() for k in keys],
            count_name: [merged[k][1] for k in keys],
        }
    )


def global_distinct_tokens(tokens_ds, b: int = 14,
                           hash_name: str = hashing.DEFAULT_HASH,
                           fanout: int = 64,
                           concurrency=None,
                           batch_size: int | None = None) -> dict:
    """Estimate distinct token ids across the corpus.

    Returns {"distinct_tokens": int, "total_tokens": int, "sketch": HyperLogLog}.
    Partial rows (one <=2^b-byte sketch per input batch) reduce through the
    combiner tree, so the driver folds a bounded number of rows no matter how
    many blocks the corpus has.

    ``batch_size=None`` (default, round-3 measurement) feeds whole blocks to
    the partial stage — with reads already sized to CPU slots, re-slicing to
    a fixed row count only adds coalesce/copy overhead (by-source: 1.10 s ->
    0.79 s); cache residency inside a large batch is handled by the stage's
    own 8k-element CHUNK loop, not by the batch size.

    ``concurrency``: None runs the scan as stateless tasks (cheap, elastic —
    right for this stage's trivial per-actor state); an int or (min, max)
    runs it as an ACTOR POOL (``map_batches(HllTokenPartials, concurrency=…)``),
    the pattern for stages with real per-actor setup cost. Both produce
    identical results (tested).
    """
    from ..stages.sketch_stages import tree_merge_partials

    if concurrency is None:
        partials = tokens_ds.map_batches(
            HllTokenPartials(b=b, hash_name=hash_name), batch_format="pyarrow",
            batch_size=batch_size)
    else:
        partials = tokens_ds.map_batches(
            HllTokenPartials, batch_format="pyarrow",
            fn_constructor_kwargs={"b": b, "hash_name": hash_name},
            concurrency=concurrency, num_cpus=1, batch_size=batch_size)
    sketch, total = tree_merge_partials(partials, "hll", fanout=fanout)
    if sketch is None:
        sketch = HyperLogLog(b=b, hash_name=hash_name)
    return {
        "distinct_tokens": sketch.estimate(),
        "total_tokens": total,
        "sketch": sketch,
    }


def distinct_tokens_by_source(tokens_ds, b: int = 14,
                              hash_name: str = hashing.DEFAULT_HASH,
                              strategy: str = "tree",
                              batch_size: int | None = None) -> pd.DataFrame:
    """Per-source distinct-token estimate + exact token count.

    The merge runs over partial-sketch rows (a few per source per batch), so
    nothing heavier than KB-scale sketches ever moves; skewed sources cost
    nothing extra because each input batch contributes at most one partial per
    source (the salted two-level merge collapsed to its limit — the per-batch
    partial IS the salt). ``strategy="tree"`` (default, low-cardinality keys)
    avoids the all-to-all entirely; ``"groupby"`` hash-partitions the merge
    for high-cardinality keys.
    """
    partials = tokens_ds.map_batches(
        HllTokenPartials(b=b, key_column="source", hash_name=hash_name),
        batch_format="pyarrow", batch_size=batch_size,
    )
    if strategy == "tree":
        merged = tree_merge_keyed_partials(partials, "source", hash_name=hash_name)
        return _keyed_result_frame(merged, "source", "distinct_tokens",
                                   "total_tokens")
    from ray.data.aggregate import Sum

    return partials.groupby("source").aggregate(
        hll_merge_aggregate(b=b, hash_name=hash_name),
        Sum("n_added", alias_name="total_tokens"),
    ).rename_columns({"estimate": "distinct_tokens"}).to_pandas()


def distinct_column_by_key(ds, value_column: str, key_column: str,
                           b: int = 14, *,
                           estimate_name: str = "distinct_values",
                           count_name: str = "n_rows",
                           hash_name: str = hashing.DEFAULT_HASH,
                           strategy: str = "tree") -> pd.DataFrame:
    """Per-key approximate COUNT(DISTINCT value_column) + exact COUNT(*).

    Exact (direct-count mode) whenever a key's distinct count is <= 100 —
    the reference's exact regime (HllConstants.cs:42)."""
    partials = ds.map_batches(
        HllColumnPartials(value_column, b=b, key_column=key_column,
                          hash_name=hash_name),
        batch_format="pyarrow",
    )
    if strategy == "tree":
        merged = tree_merge_keyed_partials(partials, key_column,
                                           hash_name=hash_name)
        return _keyed_result_frame(merged, key_column, estimate_name, count_name)
    from ray.data.aggregate import Sum

    return partials.groupby(key_column).aggregate(
        hll_merge_aggregate(b=b, hash_name=hash_name),
        Sum("n_added", alias_name=count_name),
    ).rename_columns({"estimate": estimate_name}).to_pandas()


def distinct_docs_by_source(tokens_ds, b: int = 14,
                            hash_name: str = hashing.DEFAULT_HASH):
    """Per-source distinct doc_id estimate (exact when <=100 via direct mode)."""
    return distinct_column_by_key(
        tokens_ds, "doc_id", "source", b=b,
        estimate_name="distinct_docs", count_name="n_docs",
        hash_name=hash_name,
    )


def flagship_summary(tokens_ds, b: int = 14,
                     hash_name: str = hashing.DEFAULT_HASH) -> pd.DataFrame:
    """The entry() pipeline: global + per-source distinct counts, one frame.

    ONE corpus scan: the per-source keyed partials tree-merge to one sketch
    per source, and the register-max union of those sketches IS the global
    sketch (lossless union) — so the global row costs a driver-side merge of
    a few KB sketches, not a second scan (round-2 review fix)."""
    partials = tokens_ds.map_batches(
        HllTokenPartials(b=b, key_column="source", hash_name=hash_name),
        batch_format="pyarrow", batch_size=None)
    merged = tree_merge_keyed_partials(partials, "source",
                                       hash_name=hash_name)
    per_source = _keyed_result_frame(merged, "source", "distinct_tokens",
                                     "total_tokens")
    glob = HyperLogLog.merge_many(sk.copy() for sk, _ in merged.values())
    if glob is None:
        glob = HyperLogLog(b=b, hash_name=hash_name)
    glob_row = pd.DataFrame(
        {
            "source": ["__all__"],
            "distinct_tokens": [glob.estimate()],
            "total_tokens": [sum(n for _, n in merged.values())],
        }
    )
    out = pd.concat([glob_row, per_source], ignore_index=True)
    return out.sort_values("source").reset_index(drop=True)


def set_ops_distinct(ds, value_column: str, key_column: str,
                     key_a: str, key_b: str, *, b: int = 14,
                     hash_name: str = hashing.DEFAULT_HASH) -> pd.DataFrame:
    """Sketch set operations between two key slices in ONE scan.

    Builds per-key sketches (keyed partials -> tree merge) for the two keys
    and reports |A|, |B|, |A∪B| (lossless: register max IS the union
    sketch) and |A∩B| by inclusion–exclusion (reference limitation: HLL
    cannot sketch intersections, SURVEY.md §2.7 — exact whenever both
    slices are in the ≤100 direct-count regime, which is what the driver
    oracle checks).
    """
    import pyarrow.compute as pc

    def only_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key_column],
                                     value_set=pa.array([key_a, key_b])))

    partials = ds.map_batches(only_keys, batch_format="pyarrow").map_batches(
        HllColumnPartials(value_column, b=b, key_column=key_column,
                          hash_name=hash_name),
        batch_format="pyarrow")
    merged = tree_merge_keyed_partials(partials, key_column,
                                       hash_name=hash_name)
    empty = HyperLogLog(b=b, hash_name=hash_name)
    sk_a = merged.get(key_a, (empty, 0))[0]
    sk_b = merged.get(key_b, (empty, 0))[0]
    return pd.DataFrame({
        "n_distinct_a": [sk_a.estimate()],
        "n_distinct_b": [sk_b.estimate()],
        "n_union": [HyperLogLog.union_estimate(sk_a, sk_b)],
        "n_intersection": [HyperLogLog.intersection_estimate(sk_a, sk_b)],
    })


def theta_set_ops_tokens(tokens_ds, key_column: str, key_a: str, key_b: str,
                         *, k: int = 4096,
                         token_column: str = "tokens") -> pd.DataFrame:
    """Theta-sketch set expressions between two keys' TOKEN sets, one scan.

    Unlike the HLL inclusion–exclusion path, the KMV/theta sketch estimates
    |A ∩ B| and |A \\ B| DIRECTLY from its hash samples (bounded relative
    error ~1/sqrt(k)); while both slices stay under k distinct values the
    sketch is exact (sketches/theta.py). Partials per batch per key ->
    combiner tree; only <=k-hash sample rows move.
    """
    import pyarrow.compute as pc

    from ..sketches.theta import ThetaSketch
    from ..stages.sketch_stages import (
        GenericSketchPartials,
        tree_merge_keyed_partials_generic,
    )

    def only_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key_column],
                                     value_set=pa.array([key_a, key_b])))

    partials = tokens_ds.map_batches(only_keys, batch_format="pyarrow") \
        .map_batches(
            GenericSketchPartials("theta", {"k": k}, token_column,
                                  explode_list=True, key_column=key_column),
            batch_format="pyarrow")
    merged = tree_merge_keyed_partials_generic(partials, key_column, "theta")
    empty = ThetaSketch(k=k)
    sk_a = merged.get(key_a, (empty, 0))[0]
    sk_b = merged.get(key_b, (empty, 0))[0]
    return pd.DataFrame({
        "n_distinct_a": [sk_a.estimate()],
        "n_distinct_b": [sk_b.estimate()],
        "n_union": [ThetaSketch.union_estimate(sk_a, sk_b)],
        "n_intersection": [ThetaSketch.intersection_estimate(sk_a, sk_b)],
        "n_a_minus_b": [ThetaSketch.difference_estimate(sk_a, sk_b)],
    })


def pairwise_overlap_matrix(tokens_ds, key_column: str, *, k: int = 4096,
                            token_column: str = "tokens") -> pd.DataFrame:
    """Pairwise token-set overlap between ALL keys (source-similarity
    matrix): one scan builds a keyed theta sketch per key, the driver
    reads off every pair's intersection/jaccard DIRECTLY from the hash
    samples — |keys| x k driver state, no pairwise corpus scans, no
    shuffle beyond the <=k-hash partial rows.

    Exact while each key's distinct-token count stays under k (theta=1);
    above k the estimates carry the ~1/sqrt(k) KMV error. Returns
    (key_a, key_b, n_a, n_b, n_intersection, jaccard) for key_a < key_b.

    **Key-cardinality bound** (documented contract): driver memory is
    |keys| x k x 8 bytes and the pair loop is O(|keys|^2 x k) driver
    compute — sized for GROUPING keys (sources, languages, shards:
    10-10^3 keys -> <=4 GiB and seconds of driver work at k=4096), NOT
    for per-document keys. Above ~10^4 keys, compute the matrix
    distributedly instead: emit (key, hash) sample rows from the keyed
    partials and self-join on hash (a bucketed groupby), which this
    module deliberately does not do until a real workload needs it.
    """
    from ..sketches.theta import ThetaSketch
    from ..stages.sketch_stages import (
        GenericSketchPartials,
        tree_merge_keyed_partials_generic,
    )

    partials = tokens_ds.map_batches(
        GenericSketchPartials("theta", {"k": k}, token_column,
                              explode_list=True, key_column=key_column),
        batch_format="pyarrow")
    merged = tree_merge_keyed_partials_generic(partials, key_column, "theta")
    keys = sorted(merged)
    estimates = {k: int(merged[k][0].estimate()) for k in keys}
    rows = []
    for i, ka in enumerate(keys):
        sk_a = merged[ka][0]
        for kb in keys[i + 1:]:
            sk_b = merged[kb][0]
            inter = ThetaSketch.intersection_estimate(sk_a, sk_b)
            # the direct sample-ratio estimator (theta.py) — consistent
            # with the sketch layer and cheaper than a per-pair
            # union-merge; identical to inter/union in the exact regime
            jac = ThetaSketch.jaccard_estimate(sk_a, sk_b)
            rows.append({
                "key_a": ka, "key_b": kb,
                "n_a": estimates[ka], "n_b": estimates[kb],
                "n_intersection": int(inter),
                "jaccard": float(jac),
            })
    if not rows:
        return pd.DataFrame({
            "key_a": pd.Series([], dtype="object"),
            "key_b": pd.Series([], dtype="object"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "n_intersection": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        })
    # rows are generated in sorted (key_a, key_b) order from sorted(merged)
    return pd.DataFrame(rows)
