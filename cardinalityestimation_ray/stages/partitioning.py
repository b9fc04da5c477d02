"""Partitioning utilities — the reference's PartitionStrategy family
(RoundRobin / Chunked / Hash element->shard assignment,
/root/reference/CardinalityEstimation/CardinalityEstimatorExtensions.cs:
295-369) re-expressed for Ray Data, plus the explicit salted two-level
merge for skewed keys required by the north rule.

For HLL-family sketches partitioning is correctness-free (register-max merge
is placement-independent, CardinalityEstimator.cs:606-609); these utilities
exist for LOAD BALANCE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches import hashing
from .sketch_stages import HllTokenPartials, hll_merge_aggregate


def create_sketches(n: int, kind: str = "hll", params: dict | None = None) -> list:
    """Reference CreateMultiple (CardinalityEstimatorExtensions.cs:184-196):
    n identically-configured sketches for sharded processing. In Ray this is
    usually implicit (each map task builds its own from the same spec); the
    explicit helper exists for driver-side sharding."""
    from .sketch_stages import build_sketch

    return [build_sketch(kind, dict(params or {})) for _ in range(n)]


def round_robin(ds, n: int):
    """Reference RoundRobin (i % n): Ray's repartition without shuffle —
    block splitting/coalescing, no data movement by key."""
    return ds.repartition(n)


def chunked(ds, n: int):
    """Reference Chunked (contiguous i/chunk): Ray's default block layout
    already is contiguous ranges of the input; repartition(n) keeps it."""
    return ds.repartition(n)


def add_hash_bucket(ds, column: str, num_buckets: int,
                    bucket_column: str = "bucket"):
    """Reference Hash strategy (GetHashCode % n): append a deterministic
    bucket column; downstream ``groupby(bucket_column)`` (or a bucketed
    two-sided join) co-locates equal keys."""

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        # null-SAFE: a numeric column with one null converts to float64 and
        # every element would hash via the wrong byte image, scattering the
        # SAME key across different buckets batch-to-batch. Nulls fill with
        # a sentinel BEFORE conversion (dtype preserved); null keys land in
        # one deterministic bucket and join/group logic already treats them
        # as matching nothing.
        if pa.types.is_string(t) or pa.types.is_large_string(t) or \
                pa.types.is_binary(t) or pa.types.is_large_binary(t):
            if col.null_count:
                col = pc.fill_null(col, "")
            h = hashing.hash_arrow_binary(col, hashing.DEFAULT_HASH)
        else:
            if col.null_count:
                col = pc.fill_null(col, pa.scalar(0, type=t))
            h = hashing.hash_fixed_batch(
                col.to_numpy(zero_copy_only=False), hashing.DEFAULT_HASH)
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column(bucket_column, pa.array(bucket))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def _salted_two_level_merge(partials, key_column: str, *, b: int,
                            num_salts: int, hash_name: str,
                            estimate_name: str, count_name: str):
    """Shared salted two-level merge over partial-sketch rows (the single
    owner of the salt derivation + aggregate wiring — round-3 review fix:
    the token and scalar variants each carried a verbatim copy).

    Salt assignment is deterministic: the partial row's sketch-blob hash.
    Level 1 groups on (key, salt) so a hot key's merge fans across
    ``num_salts`` reducers; level 2 folds the <= num_salts salted sketches
    per key. Register-max commutativity makes the result IDENTICAL to the
    unsalted merge (asserted in tests).
    """
    from ray.data.aggregate import Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        col = batch["sketch"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hashing.hash_arrow_binary(col, hashing.DEFAULT_HASH)
        salt = (h % np.uint64(num_salts)).astype(np.int32)
        return batch.append_column("salt", pa.array(salt))

    salted = partials.map_batches(add_salt, batch_format="pyarrow")
    lvl1 = salted.groupby([key_column, "salt"]).aggregate(
        hll_merge_aggregate(b=b, hash_name=hash_name, finalize_to="sketch"),
        Sum("n_added", alias_name="n_added"),
    )
    lvl2 = lvl1.groupby(key_column).aggregate(
        hll_merge_aggregate(b=b, hash_name=hash_name, blob_column="hll"),
        Sum("n_added", alias_name=count_name),
    )
    return lvl2.rename_columns({"estimate": estimate_name})


def salted_distinct_tokens_by_key(tokens_ds, key_column: str = "source", *,
                                  b: int = 14, num_salts: int = 16,
                                  hash_name: str = hashing.DEFAULT_HASH):
    """Per-key distinct tokens with EXPLICIT salted two-level merge.

    Even with per-batch partial sketches, a heavily skewed key funnels all
    its partials into one reducer in ``groupby(key).aggregate``. See
    :func:`_salted_two_level_merge` for the salting scheme.
    Returns a Dataset (key, distinct_tokens, total_tokens).
    """
    partials = tokens_ds.map_batches(
        HllTokenPartials(b=b, key_column=key_column, hash_name=hash_name),
        batch_format="pyarrow",
    )
    return _salted_two_level_merge(
        partials, key_column, b=b, num_salts=num_salts, hash_name=hash_name,
        estimate_name="distinct_tokens", count_name="total_tokens")


def salted_distinct_column_by_key(ds, value_column: str, key_column: str, *,
                                  b: int = 14, num_salts: int = 16,
                                  hash_name: str = hashing.DEFAULT_HASH,
                                  estimate_name: str = "distinct_values",
                                  count_name: str = "n_rows"):
    """Scalar-column variant of :func:`salted_distinct_tokens_by_key`
    (e.g. distinct doc_ids per source): same two-level salted merge,
    partials built by HllColumnPartials instead of the token-list explode.
    """
    from .sketch_stages import HllColumnPartials

    partials = ds.map_batches(
        HllColumnPartials(value_column, b=b, key_column=key_column,
                          hash_name=hash_name),
        batch_format="pyarrow",
    )
    return _salted_two_level_merge(
        partials, key_column, b=b, num_salts=num_salts, hash_name=hash_name,
        estimate_name=estimate_name, count_name=count_name)
