"""Deterministic, seeded global shuffle for training-data ordering: every
row gets a reproducible ``shuffle_pos`` (its position in the shuffled
epoch order) and a ``shard`` assignment — the standard "shuffle once,
shard into N output files" pretraining step, computed WITHOUT a global
sort or random state.

The shuffle order is pure arithmetic (Knuth multiplicative hashing), so
two runs — or a resumed run — produce the identical permutation, and the
whole operator is oracle-checkable in ANSI SQL::

    ORDER BY ((id + seed) * 2654435761) % 2147483648, id

Ray-Data shape: ranks are an exclusive prefix COUNT over rows ordered by
the composite key ``(shuffle_key << 32) | id``, delegated to the packing
module's distributed range-bucketed prefix sum (`packing.py`): per-bucket
counts -> driver exclusive scan over ~4k scalars -> broadcast offsets ->
one vectorized pass per bucket. No row-scale driver state; per-task work
is one key-range bucket. The multiplicative hash spreads ids uniformly
over key space, so buckets stay balanced even for clustered id ranges.

Constraints (documented, enforced): ids must be unique, non-negative and
< 2^31, and ``id + seed < 2^31`` — the composite rank key must fit int64
and the SQL oracle's BIGINT product must not overflow. For a 100 TB corpus
with wider ids, shuffle per id-partition (the permutation is
seed-parameterized, so per-partition seeds compose).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .packing import keyed_prefix_sums

KNUTH_A = 2654435761  # 2^32 / golden ratio, Knuth TAOCP vol. 3 §6.4
_KEY_MOD = np.int64(1) << 31


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """The 31-bit multiplicative shuffle key, int64."""
    ids = ids.astype(np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() + seed >= _KEY_MOD):
        raise ValueError(
            f"ids + seed must lie in [0, 2^31) for the SQL-parity shuffle "
            f"key, got range [{ids.min()}, {ids.max()}] with seed {seed}")
    return ((ids + np.int64(seed)) * np.int64(KNUTH_A)) % _KEY_MOD


def deterministic_shuffle(ds, *, id_column: str = "doc_id", seed: int = 0,
                          n_shards: int = 8):
    """Assign each row its seeded-shuffle position and output shard.

    Returns a Dataset of (id, shuffle_pos, shard): ``shuffle_pos`` is the
    row's 0-based rank under ``ORDER BY shuffle_key, id`` and ``shard =
    shuffle_pos % n_shards`` (round-robin over the shuffled order, so
    shards are equal-sized ±1 and each is itself a uniform sample).

    Rows with a NULL id are DROPPED (a null id has no well-defined rank;
    same convention as the keyed sketch stages and stated in the SQL
    oracle, which ORDER BYs over non-null ids only). Ids must be UNIQUE —
    duplicates would make shuffle_pos nondeterministic between the copies,
    so the rank pass detects them (equal ids always co-locate in one
    prefix-sum bucket) and raises ValueError.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    def add_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[id_column]
        if col.null_count:
            batch = batch.filter(pc.is_valid(col))
            col = batch[id_column]
        ids = col.to_numpy(zero_copy_only=False)
        if len(ids) and not np.issubdtype(ids.dtype, np.integer):
            raise TypeError(f"{id_column} must be integral, got {ids.dtype}")
        skey = shuffle_key(np.asarray(ids), seed)
        rank_key = (skey << np.int64(32)) | ids.astype(np.int64)
        return pa.table({
            id_column: col,
            "_g": pa.array(np.zeros(len(batch), dtype=np.int8)),
            "_rank_key": pa.array(rank_key),
            "_one": pa.array(np.ones(len(batch), dtype=np.int64)),
        })

    keyed = ds.map_batches(add_keys, batch_format="pyarrow")
    # composite keys span [0, 2^63); 2^51-wide buckets -> <= 4096 buckets
    # _rank_key is unique iff ids are unique (skey is a pure function of
    # id), so unique_ids doubles as the global duplicate-id detector
    ranked = keyed_prefix_sums(keyed, key_column="_g",
                               id_column="_rank_key", value_column="_one",
                               bucket_width=1 << 51, unique_ids=True)

    def finish(batch: pa.Table) -> pa.Table:
        pos = batch["cum_prev"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_column: batch[id_column],
            "shuffle_pos": pa.array(pos.astype(np.int64)),
            "shard": pa.array((pos % n_shards).astype(np.int64)),
        })

    return ranked.map_batches(finish, batch_format="pyarrow")
